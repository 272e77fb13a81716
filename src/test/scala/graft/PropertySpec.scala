package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, Upsert}

import scala.util.Random

/** Randomized-property checks: the distributed operators agree with
  * naive single-threaded reference implementations across seeded
  * random inputs (deterministic — fixed seeds).
  */
class PropertySpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("AsOfJoin agrees with the naive per-row definition (20 random cases)") {
    for (seed <- 1 to 20) {
      val rnd = new Random(seed)
      val left = Seq.fill(1 + rnd.nextInt(15))(
        (1L + rnd.nextInt(3), rnd.nextInt(40).toLong))
      // unique (k,ts) on the right: same-key-same-ts right rows have no
      // defined winner in either implementation
      val right = Seq.fill(rnd.nextInt(15))(
        (1L + rnd.nextInt(3), rnd.nextInt(40).toLong, (1 + rnd.nextInt(999)).toDouble))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val l = left.zipWithIndex.map { case ((k, ts), i) => (k, ts, i.toLong) }

      val got = AsOfJoin.join(
          l.toDF("k", "ts", "lid"), right.toDF("k", "ts", "v"), Seq("k"), "ts", "ts")
        .select(col("lid"), col("asof.v"))
        .collect().map(row => row.getLong(0) -> Option(row.get(1))).toMap
      val want = l.map { case (k, ts, lid) =>
        lid -> right.filter(t => t._1 == k && t._2 <= ts)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      withClue(s"seed=$seed: ") { got shouldBe want }
    }
  }

  test("Upsert.merge: one row per key, update keys win, partition-independent") {
    for (seed <- 1 to 15) {
      val rnd = new Random(seed)
      val base = Seq.fill(rnd.nextInt(12))((1L + rnd.nextInt(8), rnd.nextInt(100)))
        .groupBy(_._1).map(_._2.head).toSeq
      val ups = Seq.fill(rnd.nextInt(12))((1L + rnd.nextInt(8), rnd.nextInt(100)))
      if (base.nonEmpty || ups.nonEmpty) {
        val got = Upsert.merge(base.toDF("k", "v"), ups.toDF("k", "v"), Seq("k"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
        withClue(s"seed=$seed: ") {
          got.map(_._1).distinct.length shouldBe got.length
          got.map(_._1).toSet shouldBe (base.map(_._1) ++ ups.map(_._1)).toSet
          val upKeys = ups.map(_._1).toSet
          got.filter(t => upKeys(t._1)).foreach { case (k, v) =>
            ups.filter(_._1 == k).map(_._2) should contain(v)
          }
          // determinism under different physical layouts of the same updates
          val again = Upsert.merge(base.toDF("k", "v"),
              ups.toDF("k", "v").repartition(3), Seq("k"))
            .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
          again shouldBe got
        }
      }
    }
  }

  test("IntervalJoin agrees with the naive range join (15 random cases)") {
    import graft.operators.IntervalJoin
    for (seed <- 1 to 15) {
      val rnd = new Random(seed)
      val left = Seq.fill(1 + rnd.nextInt(12))(
        (1L + rnd.nextInt(3), rnd.nextInt(300).toLong, rnd.nextLong()))
      val right = Seq.fill(rnd.nextInt(12))(
        (1L + rnd.nextInt(3), rnd.nextInt(300).toLong, rnd.nextLong()))
      val (lo, hi) = (-60L * 1000000L, 15L * 1000000L) // [-60 s, +15 s]
      val l = left.toDF("k", "sec", "lid")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("lid"))
      val r = right.toDF("k", "sec", "rid")
        .select(col("k"), timestamp_seconds(col("sec")).as("rts"), col("rid"))
      val got = IntervalJoin.join(l, r, Seq("k"), "ts", "rts", lo, hi)
        .select("lid", "rid").collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = (for {
        (lk, lsec, lid) <- left
        (rk, rsec, rid) <- right
        if lk == rk
        if rsec * 1000000L >= lsec * 1000000L + lo &&
           rsec * 1000000L <= lsec * 1000000L + hi
      } yield (lid, rid)).toSet
      withClue(s"seed=$seed: ") { got shouldBe want }
    }
  }

  test("connectedComponents agrees with naive union-find (10 random graphs)") {
    import graft.operators.Dedup
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(15)
      val nodes = (1L to n.toLong).toSeq
      val pairs = Seq.fill(rnd.nextInt(12))(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).filter(p => p._1 != p._2)
      // naive union-find
      val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(x => x -> find(x)).toMap
      val got = Dedup.connectedComponents(
          nodes.toDF("n"), "n", pairs.toDF("i", "j"), "i", "j")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
      withClue(s"seed=$seed: ") { got shouldBe want }
    }
  }

  test("dupSpans agrees with a naive span construction (10 random corpora)") {
    import graft.operators.TextAnalysis
    val n = 3
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      // small vocab forces cross-doc n-gram collisions
      val docs = (0L until (4 + rnd.nextInt(6)).toLong).map { id =>
        (id, Seq.fill(n + rnd.nextInt(25))(s"w${rnd.nextInt(8)}").mkString(" "))
      }
      val minDocs = 2
      val got = TextAnalysis.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          n, minDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      // naive reference: flag windows by distinct-doc count, merge runs
      val wins = docs.map { case (id, t) =>
        id -> t.toLowerCase.split(" ").toSeq.sliding(n).map(_.mkString(" ")).toSeq
      }.toMap
      val flagged = wins.toSeq.flatMap { case (id, ws) => ws.distinct.map(g => (g, id)) }
        .groupBy(_._1).filter(_._2.size >= minDocs).keySet
      val want = wins.toSeq.flatMap { case (id, ws) =>
        val starts = ws.zipWithIndex.collect { case (g, i) if flagged(g) => i }
        val groups = starts.foldLeft(List.empty[List[Int]]) {
          case (acc, s) if acc.nonEmpty && s <= acc.head.head + n => (s :: acc.head) :: acc.tail
          case (acc, s) => List(s) :: acc
        }.reverse.map(_.reverse)
        groups.zipWithIndex.map { case (g, gi) =>
          (id, (gi + 1).toLong, g.head.toLong, (g.last + n).toLong, g.size.toLong)
        }
      }.toSet
      withClue(s"seed=$seed: ") { got shouldBe want }
    }
  }

  test("shingles UDF agrees with a naive k-gram set (20 random docs)") {
    val words = Array("a", "b", "c", "dd", "ee")
    val rnd = new Random(99)
    val texts = Seq.fill(20)(Seq.fill(rnd.nextInt(10))(words(rnd.nextInt(words.length)))
      .mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = df.select(col("id"), Dedup.shingles(col("t"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val toks = t.toLowerCase.split(" ", -1).toSeq
      val want =
        if (toks.length < 3) Set.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSet
      withClue(s"doc=$i '$t': ") { got(i.toLong) shouldBe want }
    }
  }
}
