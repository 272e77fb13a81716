package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-key upsert merge — the semantics of the reference's Hudi
  * ingest (demo.ipynb cell 8: `recordkey.field=job_id`,
  * `operation=upsert`, COPY_ON_WRITE with DefaultSparkRecordMerger =
  * last-writer-wins per key).
  *
  * Spark-first shape: tag each side with a version ordinal, union, keep
  * `row_number() = 1` per key ordered by version desc. One shuffle on
  * the record key (unavoidable for a keyed merge); AQE handles skewed
  * keys. At 100 TB the upsert cost is bounded by the updated partitions
  * when used through [[graft.sources.GraftTable]], which applies this
  * merge per write.
  */
object Upsert {

  /** Last-wins merge: rows in `updates` replace same-key rows in `base`;
    * new keys are inserted. Both sides must share a schema (any column
    * order — the union is by name).
    *
    * If `updates` itself repeats a key, the winner is chosen by
    * `precombine` descending (Hudi's precombine-field semantics); with
    * no precombine given, the full non-key row struct breaks the tie,
    * so the result is deterministic for any input (never
    * partitioning-dependent).
    */
  def merge(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
            precombine: Seq[Column] = Nil): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val unioned = base.withColumn("__v", lit(0)).unionByName(updates.withColumn("__v", lit(1)))
    val nonKey = base.columns.filterNot(keyCols.contains)
    val tieBreak: Seq[Column] =
      if (precombine.nonEmpty) precombine
      else if (nonKey.nonEmpty) Seq(struct(nonKey.map(col): _*))
      else Nil
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__v").desc +: tieBreak.map(_.desc): _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__v", "__rn")
  }

  /** Delete-aware variant: updates rows where `deleteFlag` is true drop
    * the key entirely (Hudi `_hoodie_is_deleted` semantics).
    */
  def mergeWithDeletes(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                       deleteFlag: Column): DataFrame = {
    val tagged = updates.withColumn("__del", deleteFlag)
    val merged = merge(base.withColumn("__del", lit(false)), tagged, keyCols)
    merged.filter(!col("__del")).drop("__del")
  }
}
