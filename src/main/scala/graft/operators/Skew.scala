package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe joins. AQE's skew-join split handles sort-merge skew at
  * runtime; explicit salting is for the cases AQE can't rescue (e.g. a
  * hot key whose rows must co-group for a window/aggregate after the
  * join). Salting only changes *partitioning*, never the result set.
  */
object Skew {

  /** Join `fact` (large, possibly skewed on `keys`) with `dim` (small
    * enough to replicate `buckets`×): fact rows get a deterministic salt
    * derived from a row-identifying column, dim rows are exploded across
    * all salt values, and the join key becomes (keys..., salt) — a hot
    * key's rows now spread over `buckets` reducers.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val expandedDim = dim.withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted.join(expandedDim, keys :+ "__salt").drop("__salt")
  }
}
