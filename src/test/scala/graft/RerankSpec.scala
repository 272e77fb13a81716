package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Rerank

/** Rerank seam spec: stub-scorer semantics, batching observability,
  * per-partition model lifecycle, and the external-process scorer
  * end to end (a /bin/sh worker speaking the line protocol).
  */
class RerankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stub scorer counts distinct query-token overlap") {
    val s = new Rerank.StubScorer
    val got = s.scoreBatch(
      Array("table scan value", "table scan value", "table scan value", null),
      Array("the table has a table scan", "nothing here", "Value TABLE", "x"))
    assert(got.toSeq === Seq(2.0, 0.0, 2.0, 0.0))
  }

  test("rerank adds ce_score and keeps every input row") {
    val cands = Seq(
      (1L, "a table scan runs"),
      (2L, "no overlap at all"),
      (3L, "value value value")).toDF("doc_id", "text")
    val got = Rerank.rerank(cands, "table scan value", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 2.0), (2L, 0.0), (3L, 1.0)))
  }

  test("batching: ceil(rows/batchSize) scorer calls per partition") {
    val cands = (1L to 10L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(1)
    val counter = spark.sparkContext.longAccumulator("batches")
    Rerank.rerank(cands, "q", "text", batchSize = 4,
      batchCounter = Some(counter)).count()
    assert(counter.value === 3L) // 4+4+2
  }

  test("process scorer: a shell worker speaking the protocol, scores flow back") {
    // worker: for each pair line, emit the byte length of the b64 doc
    // field as the "score" — deterministic and order-preserving
    val script =
      """while read n; do
        |  i=0
        |  while [ $i -lt $n ]; do
        |    read line
        |    doc=${line#*	}
        |    echo ${#doc}
        |    i=$((i+1))
        |  done
        |done""".stripMargin
    val cands = Seq((1L, "ab"), (2L, "abcdef")).toDF("doc_id", "text")
      .repartition(1)
    val got = Rerank.rerank(cands, "q", "text",
        scorerFactory = Some(() => new Rerank.ProcessScorer(
          Seq("/bin/sh", "-c", script))))
      .orderBy("doc_id").collect().map(_.getDouble(2)).toSeq
    // base64("ab") = "YWI=" (4 chars), base64("abcdef") = "YWJjZGVm" (8)
    assert(got === Seq(4.0, 8.0))
  }

  test("end-to-end precision cut: overlap reorders the rrf candidates") {
    val cands = Seq(
      (10L, 90L, "irrelevant filler text"),
      (20L, 80L, "the table scan produced a value"),
      (30L, 70L, "one table mentioned")).toDF("doc_id", "rrf_q", "text")
    val top = Rerank.rerank(cands, "table scan value", "text")
      .select(col("doc_id"), col("ce_score").cast("long").as("ce"), col("rrf_q"))
      .orderBy(col("ce").desc, col("rrf_q").desc, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    // 20 (overlap 3) beats 30 (overlap 1) beats 10 (overlap 0, higher rrf)
    assert(top === Seq(20L, 30L, 10L))
  }
}
