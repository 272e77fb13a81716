package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional file pruning.
  *
  * Sorting a table by one column gives min/max file statistics that
  * prune scans filtered on THAT column only; a filter on any other
  * column touches every file. Z-ordering interleaves the bits of two
  * (or more) rank-normalized keys so files cover compact rectangles
  * in key space — parquet min/max stats then prune filters on EITHER
  * dimension. This is the clustering primitive behind Delta/Iceberg
  * OPTIMIZE ZORDER, expressed as plain Spark: a codegen'd bit-
  * interleave expression + repartitionByRange + sortWithinPartitions.
  */
object Layout {

  /** z-value column interleaving `bits` low bits of a and b (a in even
    * positions). Inputs must already be non-negative ints in
    * [0, 2^bits); use [[normalized]] for arbitrary ranges.
    */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Min/max-normalize a numeric column into [0, 2^bits). The (min,
    * max) pair comes from one lightweight agg pass at write time.
    */
  def normalized(df: DataFrame, c: Column, bits: Int): Column = {
    val r = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    val span = if (hi > lo) hi - lo else 1.0
    least(floor((c.cast("double") - lo) / span * ((1L << bits) - 1)), lit((1L << bits) - 1))
      .cast("long")
  }

  /** Re-cluster `df` on the z-order of (a, b) into `numFiles` range
    * partitions, each internally sorted — ready to write.
    */
  def zorder(df: DataFrame, a: String, b: String, numFiles: Int,
             bits: Int = 16): DataFrame = {
    val z = zvalue(normalized(df, col(a), bits), normalized(df, col(b), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
