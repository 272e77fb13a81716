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

  /** N-way z-value column: bit i of dimension j lands at position
    * i·n + j (round-robin interleave — dimension 0 in the lowest
    * positions, the natural generalization of the two-way even/odd
    * split). Inputs must already be non-negative ints in [0, 2^bits);
    * use [[normalized]] for arbitrary ranges. n·bits must fit the 63
    * non-sign bits of a long — real tables prune on 3-4 layout
    * dimensions (ts, tenant, region…), well inside the budget at the
    * default resolution.
    */
  def zvalueN(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 1, "need at least one dimension")
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    require(n.toLong * bits <= 63,
      s"z-value needs n*bits <= 63 to stay a non-negative long, got $n*$bits — " +
        "lower bits (resolution halves per extra dimension anyway)")
    // widen to long BEFORE shifting: the interleave reaches bit n*bits-1,
    // which for int inputs past bit 15 hits the sign bit (z goes negative,
    // wrecking sort locality) or wraps entirely via Java's shift-mod-32
    val longs = cols.map(_.cast("long"))
    (for { i <- 0 until bits; (c, j) <- longs.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      .reduce(_.bitwiseOR(_))
  }

  /** Two-way z-value (a in even positions) — [[zvalueN]] at n = 2. */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column =
    zvalueN(Seq(a, b), bits)

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

  /** The rank-normalized N-way z-value column over `df`'s value ranges.
    * ONE lightweight stats scan for ALL dimensions; the returned
    * expression is pure codegen (no further jobs). All-null dimensions
    * drop out (nothing to spread); None when every dimension is
    * all-null or the frame is empty. `bits = 0` picks the widest
    * per-dimension resolution the long budget allows (capped at 16 —
    * 65k rank buckets per dimension out-resolves any file count).
    */
  /** Time types have no double cast — rank-normalize them through their
    * epoch view (micros / days); everything else casts directly.
    */
  private def numericView(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType    => unix_micros(col(c))
      case TimestampNTZType => unix_micros(col(c).cast("timestamp"))
      case DateType         => unix_date(col(c))
      case _                => col(c)
    }
  }

  def zcolumnN(df: DataFrame, cols: Seq[String], bits: Int = 0): Option[Column] = {
    require(cols.nonEmpty, "need at least one z-order column")
    val n = cols.length
    val b = if (bits > 0) bits else math.min(16, 63 / n)
    val views = cols.map(c => numericView(df, c))
    val aggs = views.flatMap(v => Seq(min(v).cast("double"), max(v).cast("double")))
    val r = df.agg(aggs.head, aggs.drop(1): _*).head()
    val live = views.zipWithIndex.filter { case (_, i) => !r.isNullAt(2 * i) }
    if (live.isEmpty) None
    else Some(zvalueN(live.map { case (v, i) =>
      normWith(v, r.getDouble(2 * i), r.getDouble(2 * i + 1), b) }, b))
  }

  /** Two-way [[zcolumnN]] — kept as the common-case signature. */
  def zcolumn(df: DataFrame, a: String, b: String, bits: Int = 16): Option[Column] =
    zcolumnN(df, Seq(a, b), bits)

  /** [[zcolumnN]]'s HILBERT twin: same one-pass rank normalization,
    * but the curve is continuous — consecutive cells differ by one
    * step in ONE dimension, so a contiguous per-file range of h-values
    * is a connected blob with per-dimension span ~(cells)^(1/n),
    * instead of the z-curve's rollover-straddling files whose min/max
    * smear across lower-interleaved dimensions (measured: z's median
    * file date-span ~24 % of range on 3-dim orders; see
    * [[graft.functions.Hilbert]]). Same all-null-dimension drop; a
    * single live dimension degenerates to the identity (linear) curve
    * in both variants.
    */
  def hcolumnN(df: DataFrame, cols: Seq[String], bits: Int = 0): Option[Column] = {
    require(cols.nonEmpty, "need at least one cluster column")
    val n = cols.length
    val b = if (bits > 0) bits else math.min(16, 63 / n)
    val views = cols.map(c => numericView(df, c))
    val aggs = views.flatMap(v => Seq(min(v).cast("double"), max(v).cast("double")))
    val r = df.agg(aggs.head, aggs.drop(1): _*).head()
    val live = views.zipWithIndex.filter { case (_, i) => !r.isNullAt(2 * i) }
    if (live.isEmpty) None
    else {
      val coords = live.map { case (v, i) =>
        normWith(v, r.getDouble(2 * i), r.getDouble(2 * i + 1), b) }
      Some(org.apache.spark.sql.graftshim.Bridge.column(
        graft.functions.HilbertIndex(
          org.apache.spark.sql.graftshim.Bridge.expression(array(coords: _*)), b)))
    }
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
