package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (time-range) join: pair left rows with right rows of the
  * same key whose timestamp falls in `[leftTs + lower, leftTs + upper]`
  * — the batch twin of Spark's stream-stream interval join (clicks ⋈
  * purchases within the last hour, impressions ⋈ conversions, …).
  *
  * Spark-first design: a naive `l.join(r, keys && rts between …)` is an
  * equi-join on keys with a range residual — fine when keys are
  * selective, catastrophic when a key is hot (the per-key cross product
  * is O(|L_k|·|R_k|)). This operator adds a TIME BUCKET to the join
  * key: with bucket width W = upper − lower, a left row's admissible
  * window spans at most two W-buckets, so the left side is exploded
  * into ≤ 2 rows and joined on `(keys, bucket)` — per-task work is
  * bounded by rows per (key, W-window), the same bound streaming state
  * has under a watermark, and hot keys spread across time buckets.
  * The exact range predicate then filters within the matched buckets.
  */
object IntervalJoin {

  /** Inner interval join; timestamps are compared as microseconds.
    * `lowerUs`/`upperUs` are offsets added to the LEFT timestamp
    * (e.g. lower = -3600s, upper = 0 ⇒ right within the hour BEFORE
    * each left row). Non-key column names must not collide across the
    * two sides — disambiguate before calling; key columns come back
    * once, from the left side.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           lowerUs: Long, upperUs: Long): DataFrame = {
    require(upperUs > lowerUs, "empty interval")
    val w = upperUs - lowerUs
    // left row admits right ts in [lus+lower, lus+upper] — at most two
    // W-wide buckets; array_distinct collapses them when the window
    // happens to fit in one
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__b", explode(array_distinct(array(
        floor((col("__lus") + lit(lowerUs)) / lit(w)),
        floor((col("__lus") + lit(upperUs)) / lit(w))))))
    val rRenamed = keys.foldLeft(
        right.withColumn("__rus", unix_micros(col(rightTs)))
          .withColumn("__rb", floor(col("__rus") / lit(w)))) {
      (df, k) => df.withColumnRenamed(k, s"__rk_$k")
    }
    val cond = keys.map(k => col(k) === col(s"__rk_$k")).reduce(_ && _) &&
      col("__b") === col("__rb")
    val joined = l.join(rRenamed, cond)
      .filter(col("__rus") >= col("__lus") + lit(lowerUs) &&
        col("__rus") <= col("__lus") + lit(upperUs))
    keys.foldLeft(joined)((df, k) => df.drop(s"__rk_$k"))
      .drop("__lus", "__rus", "__b", "__rb")
  }
}
