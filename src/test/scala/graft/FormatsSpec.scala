package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.sources.Formats
import java.nio.file.Files

class FormatsSpec extends AnyFunSuite with Matchers {
  import TestSpark.{spark, sf0001}

  private def canon(df: org.apache.spark.sql.DataFrame): Array[Seq[Any]] =
    df.select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().map(_.toSeq)

  test("documents survive a round trip through every supported format") {
    val docs = Tables.documents(spark, sf0001)
    val want = canon(docs)
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      val path = Files.createTempDirectory(s"fmt_$fmt").toString + "/t"
      Formats.write(docs, path, fmt)
      val back = Formats.read(spark, path, fmt, Some(docs.schema))
      withClue(s"format=$fmt: ") { canon(back) shouldBe want }
    }
  }

  test("partitioned write prunes on read") {
    val docs = Tables.documents(spark, sf0001)
    val path = Files.createTempDirectory("fmt_part").toString + "/t"
    Formats.write(docs, path, "parquet", partitionBy = Seq("lang"))
    val read = Formats.read(spark, path, "parquet").filter(col("lang") === "en")
    read.count() shouldBe docs.filter(col("lang") === "en").count()
    read.queryExecution.executedPlan.toString should include("PartitionFilters")
  }

  test("text formats refuse schema-less reads (inference = extra scan at scale)") {
    an[IllegalArgumentException] should be thrownBy
      Formats.read(spark, "/tmp/nope", "json")
  }

  test("inferSchemaOnce infers from a bounded text sample (csv/json) or footers (parquet)") {
    val docs = Tables.documents(spark, sf0001)
    for (fmt <- Seq("csv", "json", "parquet")) {
      val path = Files.createTempDirectory(s"fmt_infer_$fmt").toString + "/t"
      Formats.write(docs, path, fmt)
      val schema = Formats.inferSchemaOnce(spark, path, fmt, sampleRows = 50)
      withClue(s"format=$fmt: ") {
        schema.fieldNames.toSet shouldBe docs.schema.fieldNames.toSet
      }
    }
  }
}
