package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.hadoop.fs.Path
import graft.sources.{GraftTable, InMemoryLockProvider}
import java.net.URI
import java.nio.file.Files

/** An object-store stand-in: a real Hadoop FileSystem whose
  * `create(p, overwrite=false)` is check-then-act (RawLocalFileSystem's
  * actual behavior), registered under its own scheme so the commit
  * protocol cannot take the kernel-O_EXCL or NameNode-atomic paths.
  */
class MockNonAtomicFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: URI = URI.create("mock:///")
}

/** Object-store OCC: without a lock provider, commits on a scheme with
  * no atomic create-if-absent must fail LOUDLY; with one, racing
  * writers serialize through the provider's CAS even though the
  * filesystem's own create is non-atomic.
  */
class LockProviderSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.mock.impl", classOf[MockNonAtomicFs].getName)

  private def mockPath(prefix: String): String =
    "mock:" + Files.createTempDirectory(prefix).toString + "/t"

  test("a scheme with no atomic create-if-absent fails loudly without a provider") {
    GraftTable.setLockProvider(None)
    val path = mockPath("graft_lock_loud")
    val ex = intercept[UnsupportedOperationException] {
      GraftTable.create(Seq((1L, 1)).toDF("k", "x"), path, Seq("k"), nbuckets = 2)
    }
    ex.getMessage should include("no atomic create-if-absent")
    ex.getMessage should include("setLockProvider")
    // the refusal happened BEFORE any state landed: nothing to clean up
    GraftTable.exists(path) shouldBe false
  }

  test("with a provider, the full table protocol runs on the non-atomic scheme") {
    GraftTable.setLockProvider(Some(new InMemoryLockProvider(Set("mock"))))
    try {
      val path = mockPath("graft_lock_e2e")
      GraftTable.create(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), path, Seq("k"), nbuckets = 2)
      GraftTable.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "s"))
      GraftTable.read(spark, path).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))) shouldBe
        Array((1L, "a"), (2L, "b2"), (3L, "c"))
      // a second create is refused (visible table: the existence guard
      // fires; a RACING create would lose the provider-arbitrated lock)
      intercept[IllegalArgumentException] {
        GraftTable.create(Seq((9L, "z")).toDF("k", "s"), path, Seq("k"))
      }.getMessage should include("already exists")
    } finally GraftTable.setLockProvider(None)
  }

  test("racing writers can't all commit the same version: provider CAS decides") {
    GraftTable.setLockProvider(Some(new InMemoryLockProvider(Set("mock"))))
    try {
      val path = mockPath("graft_lock_race")
      GraftTable.create(spark.range(0, 100).toDF("k")
        .withColumn("x", org.apache.spark.sql.functions.col("k")), path, Seq("k"), nbuckets = 4)
      // 4 writers race raw upserts (no auto-retry). Timing decides how
      // many read a fresh-enough head to commit, but the invariant the
      // lock must enforce is: every commit is a DISTINCT version —
      // winners == versions minted — and each winner's batch is applied.
      import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
      val n = 4
      val pool = Executors.newFixedThreadPool(n)
      val go = new CountDownLatch(1)
      val futures = (0 until n).map { i =>
        pool.submit(new java.util.concurrent.Callable[Option[Int]] {
          def call(): Option[Int] = {
            go.await()
            try { GraftTable.upsert(spark, path, Seq((i.toLong, -1L - i)).toDF("k", "x")); Some(i) }
            catch { case _: java.util.ConcurrentModificationException => None }
          }
        })
      }
      go.countDown()
      val winners = futures.flatMap(f => f.get(180, TimeUnit.SECONDS))
      pool.shutdown()
      winners.size should be >= 1
      GraftTable.latestVersion(path) shouldBe winners.size
      val negatives = GraftTable.read(spark, path)
        .filter(org.apache.spark.sql.functions.col("x") < 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      negatives shouldBe winners.map(i => (i.toLong, -1L - i)).toSet
    } finally GraftTable.setLockProvider(None)
  }

  test("provider put-if-absent is linearizable per path under heavy contention") {
    val lp = new InMemoryLockProvider(Set("mock"))
    val dir = Files.createTempDirectory("graft_lock_cas")
    val p = new Path("mock:" + dir.toString + "/marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(q: Path) = fs.exists(q)
    def write(q: Path, s: String): Unit = {
      val out = fs.create(q, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(16)
    val go = new CountDownLatch(1)
    val futures = (0 until 32).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { go.await(); lp.putIfAbsent(p, s"writer-$i", exists, write) }
      })
    }
    go.countDown()
    val wins = futures.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    wins.count(identity) shouldBe 1
    // and a pre-existing file (committed before the provider ran) also refuses
    val lp2 = new InMemoryLockProvider(Set("mock"))
    lp2.putIfAbsent(p, "late", exists, write) shouldBe false
  }

  test("a failed write releases the claim: the table is not wedged forever") {
    val lp = new InMemoryLockProvider(Set("mock"))
    val dir = Files.createTempDirectory("graft_lock_fail")
    val p = new Path("mock:" + dir.toString + "/marker")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(q: Path) = fs.exists(q)
    def goodWrite(q: Path, s: String): Unit = {
      val out = fs.create(q, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    // first attempt wins the CAS but its write dies with NOTHING landed
    intercept[RuntimeException] {
      lp.putIfAbsent(p, "v1", exists,
        (_, _) => throw new RuntimeException("store outage"))
    }
    // the claim must have been released — a retry can still commit
    lp.putIfAbsent(p, "v1-retry", exists, goodWrite) shouldBe true
    // …exactly once
    lp.putIfAbsent(p, "v1-again", exists, goodWrite) shouldBe false

    // ambiguous failure (write threw but the marker EXISTS) keeps the
    // claim: no second writer may sneak into a maybe-committed version
    val p2 = new Path("mock:" + dir.toString + "/marker2")
    intercept[RuntimeException] {
      lp.putIfAbsent(p2, "v2", exists, (q, s) => {
        goodWrite(q, s); throw new RuntimeException("ack lost after land")
      })
    }
    lp.putIfAbsent(p2, "v2-steal", exists, goodWrite) shouldBe false
  }
}
