package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for every left row, the latest right
  * row with the same key and `rightTs <= leftTs`. The workhorse of
  * training-data assembly (join features/events to the state that was
  * true at example time; leakage-free by construction) that Spark has
  * no native operator for.
  *
  * Spark-first design: NOT an inequality join (a range theta-join
  * explodes to O(|L|·|R|) per key and cannot sort-merge). Both sides
  * union on the key, sort by (ts, side) within each key, and a
  * running `last(right_row, ignoreNulls)` window carries the most
  * recent right row forward onto each left row. One shuffle on the
  * key, O(|L|+|R|) total work, AQE-skew-splittable — the same plan
  * shape at 100 TB.
  */
object AsOfJoin {

  /** Left as-of join. Right columns come back nested in `asofPrefix`
    * struct fields (null when no right row precedes the left row).
    * Ties (`rightTs == leftTs`) match, per standard as-of semantics.
    *
    * `rightTieBreak`: right-side columns that order DUPLICATE
    * (key, rightTs) rows — the row with the GREATEST tie-break value
    * wins. Without it, which duplicate is carried is partition-order-
    * dependent (nondeterministic across runs); pass a unique right
    * column (an event id) whenever duplicates are possible.
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, asofPrefix: String = "asof",
           rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val keyCols = keys.map(col)
    val leftStruct = struct(left.columns.map(col): _*)
    val rightStruct = struct(right.columns.map(col): _*)
    val lType = left.select(leftStruct.as("s")).schema("s").dataType.catalogString
    val rType = right.select(rightStruct.as("s")).schema("s").dataType.catalogString
    val l = left.select(
      keyCols :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        leftStruct.as("__l") :+ lit(null).cast(rType).as("__r"): _*)
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    // equal-timestamp right row is visible to the left row
    val r = right.select(
      keyCols :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(lType).as("__l") :+ rightStruct.as("__r"): _*)

    // tie-break columns sort right-row duplicates at equal (key, ts);
    // they are null on left rows (side 1), which sort after side-0
    // rights anyway, so the extra keys never reorder left vs right
    val tb = rightTieBreak.map(c => col(s"__r.$c").asc)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts").asc +: col("__side").asc +: tb: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as(asofPrefix))
  }
}
