package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.sources.GraftTable
import java.nio.file.Files

/** Model-based check of the lakehouse: random op sequences
  * (upsert / delete / compact / restore) run against both the table
  * and a trivial in-memory Map model, asserting after EVERY commit:
  *   1. snapshot read == model,
  *   2. every historical version still time-travels to its recorded
  *      model state,
  *   3. folding the change feed version-by-version over the initial
  *      image reproduces the final state (CDC completeness: every
  *      transition is representable as upserts + _deleted rows).
  * Randomness is seeded — failures replay deterministically.
  */
class GraftTableModelSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  test("random upsert/delete/compact/restore sequences match the model at every version") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 2) {
      val path = Files.createTempDirectory(s"graft_model$trial").toString + "/t"
      val init = Seq.tabulate(12)(i => i.toLong -> rnd.nextInt(1000)).toMap
      GraftTable.create(init.toSeq.toDF("k", "x"), path, Seq("k"), nbuckets = 4)

      var model = init
      var history = Map(0 -> model)

      def readState(version: Int = -1): Map[Long, Int] =
        GraftTable.read(spark, path, version).collect()
          .map(r => r.getAs[Long]("k") -> r.getAs[Int]("x")).toMap

      for (_ <- 1 to 12) {
        rnd.nextInt(7) match {
          case 0 | 1 => // upsert a random batch (distinct keys)
            val batch = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(30).toLong -> rnd.nextInt(1000)).toMap
            GraftTable.upsert(spark, path, batch.toSeq.toDF("k", "x"))
            model ++= batch
          case 2 | 3 => // delete random keys (some may not exist)
            val keys = Seq.fill(rnd.nextInt(4) + 1)(rnd.nextInt(30).toLong).distinct
            GraftTable.delete(spark, path, keys.toDF("k"))
            model --= keys
          case 4 => // compact: content-preserving rewrite
            GraftTable.compact(spark, path)
          case 5 => // restore to a random recorded version
            val v = history.keys.toSeq(rnd.nextInt(history.size))
            GraftTable.restoreTo(path, v)
            model = history(v)
          case 6 => // rebucket: content-preserving layout evolution;
            // subsequent writes must follow the new head's count
            GraftTable.rebucket(spark, path, 1 + rnd.nextInt(8))
        }
        val head = GraftTable.latestVersion(path)
        history += (head -> model)
        readState() shouldBe model // invariant 1
      }

      // invariant 2: every version still time-travels to its model state
      history.foreach { case (v, m) => readState(v) shouldBe m }

      // invariant 3: CDC replay — fold per-version change batches over
      // the version-0 image and land exactly on the final state
      val head = GraftTable.latestVersion(path)
      var replay = history(0)
      for (v <- 1 to head) {
        GraftTable.changes(spark, path, v - 1, v).collect().foreach { r =>
          val k = r.getAs[Long]("k")
          if (r.getAs[Boolean]("_deleted")) replay -= k
          else replay += k -> r.getAs[Int]("x")
        }
      }
      replay shouldBe model
    }
  }
}
