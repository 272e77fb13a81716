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
    * new keys are inserted. Both sides must share a schema.
    */
  def merge(base: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"schema mismatch: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val unioned = base.withColumn("__v", lit(0)).unionByName(updates.withColumn("__v", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__v").desc)
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
