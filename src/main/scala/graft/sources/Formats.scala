package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic ingest/egress. The reference reads its lakehouse
  * table plus ad-hoc files; this gives the same pluggable read/write
  * over the formats Spark ships (parquet, orc, csv, json) with the
  * schema pinned explicitly for the text formats — schema inference
  * over 100 TB of JSON is a full extra scan, so production reads must
  * supply one.
  */
object Formats {

  private val known = Set("parquet", "orc", "csv", "json")

  /** Read `path` as `format`; text formats require an explicit schema
    * (pass one from a catalog or a sampled `inferSchemaOnce`).
    */
  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    require(known(format), s"unknown format $format (use ${known.mkString("/")})")
    val r = spark.read.format(format)
    val withSchema = schema.fold {
      require(format == "parquet" || format == "orc",
        s"$format needs an explicit schema (inference = extra full scan at scale)")
      r
    }(r.schema(_))
    val withOpts = if (format == "csv") withSchema.option("header", "true") else withSchema
    withOpts.load(path)
  }

  /** One bounded inference pass for exploratory use — the bound is
    * enforced by reading at most `sampleRows` LINES as text and
    * inferring from that in-memory sample, so the cost is a partial
    * read of the first file(s), not an inference scan over the whole
    * path. (Passing limit() AFTER load() would not bound anything:
    * csv/json inference runs eagerly inside load().) parquet/orc
    * schemas come from file footers — no data scan at all.
    */
  def inferSchemaOnce(spark: SparkSession, path: String, format: String,
                      sampleRows: Int = 10000): StructType = {
    require(known(format), s"unknown format $format (use ${known.mkString("/")})")
    format match {
      case "parquet" | "orc" => spark.read.format(format).load(path).schema
      case "json" =>
        import spark.implicits._
        spark.read.json(spark.read.text(path).limit(sampleRows).as[String]).schema
      case "csv" =>
        import spark.implicits._
        spark.read.option("inferSchema", "true").option("header", "true")
          .csv(spark.read.text(path).limit(sampleRows).as[String]).schema
    }
  }

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil, mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(known(format), s"unknown format $format")
    val w = df.write.format(format).mode(mode)
    val withOpts = if (format == "csv") w.option("header", "true") else w
    (if (partitionBy.nonEmpty) withOpts.partitionBy(partitionBy: _*) else withOpts)
      .save(path)
  }
}
