package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see TESTDATA.md).
  *
  * Each loader is a plain parquet scan so Catalyst owns column pruning
  * and predicate pushdown — callers filter/select and the pushed
  * predicates reach the file scan (`PushedFilters` in explain).
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.parquet has shipped with two different physical `ts` types
    * across data regenerations: TIMESTAMP(MICROS) (reads natively as
    * TimestampType) and TIMESTAMP(NANOS) (which Spark 4's reader
    * rejects unless `nanosAsLong` maps it to LongType). The loader
    * adapts on the OBSERVED type instead of assuming either, so a
    * regenerated file never breaks the event-family queries again:
    *   - TimestampType / TimestampNTZType → pass through unchanged;
    *   - LongType (nanos-as-long)        → rebuild µs-precision
    *     TimestampType via `timestamp_micros(ts div 1000)` — lossless
    *     here, every generated value is µs-aligned.
    *
    * Session-wide side effect, deliberate: nanosAsLong must hold at
    * EXECUTION time of the (lazy) frame, so it cannot be set/restored
    * around this call. Blast radius is confined to other
    * TIMESTAMP(NANOS) columns — which Spark would otherwise refuse to
    * read at all — every µs/ms timestamp reads unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }

  /** Normalize an events frame's `ts` column to µs TimestampType,
    * whatever physical type the parquet writer chose (see [[events]]).
    * Shared with the streaming reader so batch and stream agree.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported type $other (expected timestamp or nanos-as-long)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
