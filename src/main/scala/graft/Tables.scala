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
  /** events.parquet stores TIMESTAMP(NANOS), which Spark 4's reader
    * rejects. Read nanos as long and rebuild a (µs-precision)
    * TimestampType column — lossless here, every value is µs-aligned.
    *
    * Session-wide side effect, deliberate: nanosAsLong must hold at
    * EXECUTION time of the (lazy) frame, so it cannot be set/restored
    * around this call. Blast radius is confined to other
    * TIMESTAMP(NANOS) columns — which Spark would otherwise refuse to
    * read at all — every µs/ms timestamp reads unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
