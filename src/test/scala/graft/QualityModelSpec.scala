package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** Quality-classifier spec: the student must actually LEARN the
  * separable structure (held-out accuracy on synthetic clean/garbled
  * corpora), the teacher labels must match their stated thresholds,
  * and the serving path must stay a zero-shuffle scan.
  */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthetic separable corpus: clean prose (stopword-bearing, long)
    * vs punctuation-garbled strings. Deterministic generator.
    */
  private def corpus(n: Int): org.apache.spark.sql.DataFrame = {
    val fill = Seq("fast", "stream", "window", "merge", "table", "rows")
    val docs = (0 until n).map { i =>
      if (i % 2 == 0) {
        val words = (0 until 20).map(j => if (j % 3 == 0) "the" else fill((i + j) % fill.length))
        (i.toLong, words.mkString(" "))
      } else {
        val junk = (0 until 12).map(j => s"@#$$%^&${(i * 7 + j) % 97}!!")
        (i.toLong, junk.mkString(" "))
      }
    }
    docs.toDF("doc_id", "text").withColumn("source", lit("syn"))
  }

  test("weak label matches its stated thresholds") {
    val df = Seq(
      (1L, ("the cat sat on the mat and then the dog sat on " +
        "the log in the sun today")), // ≥15 toks, stopwordy, clean → 1
      (2L, "short text"), // too short → 0
      (3L, (1 to 20).map(i => s"!!!$i@@@").mkString(" ")) // punct-heavy → 0
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        QualityModel.weakLabel(col("text")).as("l"))
      .orderBy("doc_id").collect().map(_.getDouble(1)).toSeq
    assert(got === Seq(1.0, 0.0, 0.0))
  }

  test("learns the clean/garbled split: held-out accuracy ≥ 0.95") {
    val docs = corpus(400)
    val model = QualityModel.train(docs, "doc_id", "text", sampleRate = 0.5)
    val held = docs.filter(!QualityModel.md5Sample(col("doc_id"), 0.5))
    val scored = QualityModel.score(held, "text", model)
      .withColumn("weak", QualityModel.weakLabel(col("text")).cast("long"))
    val (n, agree) = {
      val r = scored.agg(count(lit(1)),
        sum(when(col("weak") === col("q_pred"), 1L).otherwise(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(n > 100)
    assert(agree.toDouble / n >= 0.95, s"accuracy ${agree.toDouble / n}")
  }

  test("scoring plan is a zero-shuffle scan (no Exchange)") {
    val docs = corpus(50)
    val model = QualityModel.train(docs, "doc_id", "text", maxIter = 5)
    val plan = QualityModel.score(docs, "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("agreement report: exact integer cells, holdout only") {
    val docs = corpus(200)
    val model = QualityModel.train(docs, "doc_id", "text", sampleRate = 0.5)
    val rep = QualityModel.agreementReport(docs, "doc_id", "text", model)
      .collect()
    assert(rep.length === 1) // one source
    val r = rep.head
    val n = r.getAs[Long]("n_docs")
    val heldN = docs.filter(!QualityModel.md5Sample(col("doc_id"), 0.5)).count()
    assert(n === heldN) // report covers exactly the held-out half
    assert(r.getAs[Long]("n_agree") <= n)
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === r.getAs[Long]("n_weak_good"))
  }

  test("md5 sample is deterministic and roughly balanced") {
    val ids = (1L to 1000L).toDF("id")
    val a = ids.filter(QualityModel.md5Sample(col("id"), 0.5)).count()
    val b = ids.filter(QualityModel.md5Sample(col("id"), 0.5)).count()
    assert(a === b)
    assert(a > 350 && a < 650)
  }
}
