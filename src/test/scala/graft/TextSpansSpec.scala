package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.operators.TextAnalysis

/** Maximal duplicated-span extraction: merging, boundaries, and the
  * trim-ready contract (0-based start, exclusive end).
  */
class TextSpansSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private def spans(docs: Seq[(Long, String)], minDocs: Int = 2) =
    TextAnalysis.dupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, minDocs = minDocs)
      .orderBy("doc_id", "span_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("overlapping and adjacent duplicated windows merge into one span; gaps split") {
    // "a b c d" appears in both docs → windows "a b c" and "b c d"
    // (overlapping) merge into one span [0, 4). Doc 1 repeats the
    // phrase later with unique filler between → a SECOND span.
    val docs = Seq(
      (1L, "a b c d u1 u2 u3 u4 a b c d"),
      (2L, "a b c d v1 v2 v3 v4"))
    val got = spans(docs)
    got.filter(_._1 == 1L) shouldBe Seq(
      (1L, 1L, 0L, 4L, 2L),   // tokens 0..3, two windows (starts 0, 1)
      (1L, 2L, 8L, 12L, 2L))  // the repeat at tokens 8..11
    got.filter(_._1 == 2L) shouldBe Seq((2L, 1L, 0L, 4L, 2L))
  }

  test("exactly-adjacent windows (no uncovered token) merge; one-token gap splits") {
    // shared phrase of 6 tokens: windows at starts 0..3 chain-merge
    // (each within n of the previous) into [0, 6)
    val phrase = "p q r s t u"
    val docs = Seq((1L, s"$phrase x y z"), (2L, s"m n $phrase"))
    val got = spans(docs)
    got.filter(_._1 == 1L) shouldBe Seq((1L, 1L, 0L, 6L, 4L))
    got.filter(_._1 == 2L) shouldBe Seq((2L, 1L, 2L, 8L, 4L))
  }

  test("docs with no duplicated windows emit nothing") {
    spans(Seq((1L, "all unique tokens here now"), (2L, "other words entirely")),
      minDocs = 2) shouldBe empty
  }

  test("trimDupSpans cuts exactly the span tokens and keeps everything else") {
    import org.apache.spark.sql.functions.{col, md5, lit}
    val docs = Seq(
      (1L, "a b c d u1 u2 u3 u4"), // span [0,4) → kept "u1 u2 u3 u4"
      (2L, "m n a b c d"),         // span [2,6) → kept "m n"
      (3L, "a b c d"),             // fully duplicated → kept ""
      (4L, "totally unique words only")) // no spans → kept whole
    val got = TextAnalysis.trimDupSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def h(s: String): String =
      spark.range(1).select(md5(lit(s).cast("binary"))).head().getString(0)
    got shouldBe Seq(
      (1L, 4L, h("u1 u2 u3 u4")),
      (2L, 2L, h("m n")),
      (3L, 0L, h("")),
      (4L, 4L, h("totally unique words only")))
  }

  test("lineDedup drops cross-doc repeated lines, keeps order, empties all-boilerplate docs") {
    // span=2 lines; "hdr txt" repeats in docs 1..3 (boilerplate), each
    // doc's body lines are unique; doc 3 is NOTHING BUT the header →
    // survives with clean_text = ''. Trailing partial line ("solo") is
    // a legitimate line.
    val docs = Seq(
      (1L, "hdr txt aa bb cc dd"),
      (2L, "hdr txt ee ff solo"),
      (3L, "hdr txt"),
      (4L, "gg hh ii jj"))
    val got = TextAnalysis.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        span = 2, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    got shouldBe Seq(
      (1L, "aa bb cc dd", 2L, 1L),
      (2L, "ee ff solo", 2L, 1L),
      (3L, "", 0L, 1L),
      (4L, "gg hh ii jj", 2L, 0L))
  }

  test("lineDedup with no cross-doc repeats is the identity rewrite") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i"))
    val got = TextAnalysis.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        span = 3, minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    got shouldBe Seq((1L, "a b c d e", 0L), (2L, "f g h i", 0L))
  }

  test("lineStats counts distinct docs and total occurrences per line") {
    // "x y" appears twice in doc 1 and once in doc 2: n_docs=2, n_occ=3
    val docs = Seq((1L, "x y x y"), (2L, "x y z w"))
    val got = TextAnalysis.lineStats(docs.toDF("doc_id", "text"), "doc_id", "text", span = 2)
      .filter($"n_docs" >= 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    got shouldBe Seq(("x y", 2L, 3L))
  }
}
