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
    // widen to long BEFORE shifting: the interleave reaches bit 2*bits+1,
    // which for int inputs past bit 15 hits the sign bit (z goes negative,
    // wrecking sort locality) or wraps entirely via Java's shift-mod-32
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Min/max-normalize into [0, 2^bits) given precomputed stats. */
  private def normWith(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1.0
    least(floor((c.cast("double") - lo) / span * ((1L << bits) - 1)), lit((1L << bits) - 1))
      .cast("long")
  }

  /** Min/max-normalize a numeric column into [0, 2^bits). The (min,
    * max) pair comes from one lightweight agg pass at write time.
    * An empty frame / all-null column normalizes to the constant 0
    * bucket (there is nothing to spread).
    */
  def normalized(df: DataFrame, c: Column, bits: Int): Column = {
    val r = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    if (r.isNullAt(0)) lit(0L)
    else normWith(c, r.getDouble(0), r.getDouble(1), bits)
  }

  /** The rank-normalized z-value column for (a, b) over `df`'s value
    * ranges — None when the frame is empty or a dimension is all-null
    * (nothing to spread). ONE lightweight stats scan; the returned
    * expression is pure codegen (no further jobs).
    */
  def zcolumn(df: DataFrame, a: String, b: String, bits: Int = 16): Option[Column] = {
    val r = df.agg(min(col(a)).cast("double"), max(col(a)).cast("double"),
                   min(col(b)).cast("double"), max(col(b)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) None
    else Some(zvalue(normWith(col(a), r.getDouble(0), r.getDouble(1), bits),
                     normWith(col(b), r.getDouble(2), r.getDouble(3), bits), bits))
  }

  /** Re-cluster `df` on the z-order of (a, b) into `numFiles` range
    * partitions, each internally sorted — ready to write. Stats for
    * both dimensions come from ONE agg scan.
    */
  def zorder(df: DataFrame, a: String, b: String, numFiles: Int,
             bits: Int = 16): DataFrame =
    zcolumn(df, a, b, bits) match {
      case None => df // empty/all-null: nothing to cluster
      case Some(z) =>
        df.withColumn("__z", z)
          .repartitionByRange(numFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
    }
}
