package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.IvfIndex

/** A vector index that lives WITH its [[GraftTable]] — the analog of the
  * reference serving `hudi_vector_search('{TABLE_PATH}', …)` from an
  * index Hudi/Lance keeps in sync with the table (demo.ipynb cell 11).
  *
  * Layout, under the table's own directory:
  * {{{
  *   table/_index/<name>/meta        vecCol, keys, metric, nlist,
  *                                   indexedVersion (the table snapshot
  *                                   the index reflects)
  *   table/_index/<name>/centroids   nlist coarse centroids (parquet)
  *   table/_index/<name>/data        the IVF layout: FULL table rows,
  *                                   partitioned by cluster_id
  * }}}
  *
  * The index stores full rows (Lance-style: table and index share a
  * layout), so probes return payload columns without a join back.
  *
  * Freshness is a recorded fact, not a hope: `meta.indexedVersion` pins
  * the table version the index reflects, and [[probe]] FAILS LOUDLY
  * when the table has moved past it (`allowStale = true` opts into
  * serving the indexed snapshot) — a silent stale index is the bug this
  * class exists to kill.
  *
  * [[refresh]] applies the table's own change feed
  * ([[GraftTable.changes]], upserts AND deletes) by COW cell rewrite:
  * only the cells holding changed keys' old rows or receiving new rows
  * are rewritten (dynamic partition overwrite); emptied cells are
  * dropped. Cost is O(affected cells), the index twin of the table's
  * O(touched buckets) upserts. Refresh is crash-safe in the
  * at-least-once sense: `indexedVersion` advances only after the data
  * lands, and re-applying a change batch is idempotent (replace-by-key).
  * Exactness after refresh is oracle-pinned by the
  * `graft_index_exhaustive` CORRECTNESS row and GraftIndexSpec.
  */
object GraftIndex {

  final case class IndexMeta(name: String, vecCol: String, keyCols: Seq[String],
                             metric: String, nlist: Int, indexedVersion: Int)

  private def root(tablePath: String, name: String) = s"$tablePath/_index/$name"
  private def dataPath(tablePath: String, name: String) = s"${root(tablePath, name)}/data"
  private def centroidsPath(tablePath: String, name: String) = s"${root(tablePath, name)}/centroids"
  private def metaPath(tablePath: String, name: String) = new Path(root(tablePath, name), "meta")

  def exists(tablePath: String, name: String = "vec"): Boolean =
    GraftTable.MetaIO.exists(metaPath(tablePath, name))

  def meta(tablePath: String, name: String = "vec"): IndexMeta = {
    val p = metaPath(tablePath, name)
    require(GraftTable.MetaIO.exists(p), s"no index '$name' at $tablePath")
    val kv = GraftTable.MetaIO.readString(p).split("\n")
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    IndexMeta(name, kv("vecCol"), kv("keyCols").split(",").toSeq,
      kv("metric"), kv("nlist").toInt, kv("indexedVersion").toInt)
  }

  private def writeMeta(tablePath: String, m: IndexMeta): Unit =
    GraftTable.MetaIO.replaceString(metaPath(tablePath, m.name),
      s"vecCol=${m.vecCol}\nkeyCols=${m.keyCols.mkString(",")}\n" +
        s"metric=${m.metric}\nnlist=${m.nlist}\nindexedVersion=${m.indexedVersion}")

  /** Build the index from the table's CURRENT snapshot and record that
    * version. Rows with a null vector are not indexed (they reappear if
    * a later upsert fills the vector in).
    */
  def create(spark: SparkSession, tablePath: String, vecCol: String, nlist: Int,
             metric: String = "cosine", name: String = "vec",
             fitSampleFraction: Option[Double] = None): Unit = {
    val v = GraftTable.latestVersion(tablePath)
    require(v >= 0, s"no table at $tablePath")
    require(!exists(tablePath, name), s"index '$name' already exists at $tablePath")
    val keys = GraftTable.keyColumns(tablePath)
    val snap = GraftTable.read(spark, tablePath, v).filter(col(vecCol).isNotNull)
    val model = IvfIndex.build(snap, vecCol, nlist, dataPath(tablePath, name),
      metric, fitSampleFraction = fitSampleFraction)
    import spark.implicits._
    model.centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster_id", "centroid")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(centroidsPath(tablePath, name))
    writeMeta(tablePath, IndexMeta(name, vecCol, keys, metric, nlist, v))
  }

  /** Reconstruct the probe-able model from the persisted layout. */
  def open(spark: SparkSession, tablePath: String,
           name: String = "vec"): (IndexMeta, IvfIndex.Model) = {
    val m = meta(tablePath, name)
    val cents = spark.read.parquet(centroidsPath(tablePath, name))
      .orderBy("cluster_id").collect()
      .map(_.getSeq[Float](1).toArray)
    (m, IvfIndex.Model(dataPath(tablePath, name), cents, m.metric))
  }

  /** Catch the index up to the table head by COW cell rewrite. Returns
    * the (fromVersion, toVersion] range applied, or None when already
    * fresh. Affected cells = cells holding changed keys' OLD vectors
    * (recomputed from the previously indexed snapshot — still readable,
    * COW never mutates it) ∪ cells the NEW vectors land in; only those
    * partitions are rewritten.
    */
  def refresh(spark: SparkSession, tablePath: String,
              name: String = "vec"): Option[(Int, Int)] = {
    val (m, model) = open(spark, tablePath, name)
    val head = GraftTable.latestVersion(tablePath)
    if (head <= m.indexedVersion) return None
    val cell = IvfIndex.cellUdf(spark, model)
    val batch = GraftTable.changes(spark, tablePath, m.indexedVersion, head)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val changedKeys = batch.select(m.keyCols.map(col): _*).distinct()
      val oldCells = GraftTable.read(spark, tablePath, m.indexedVersion)
        .join(changedKeys, m.keyCols, "left_semi")
        .filter(col(m.vecCol).isNotNull)
        .select(cell(col(m.vecCol)).as("c")).distinct().collect().map(_.getInt(0))
      val additions = batch.filter(!col("_deleted")).drop("_deleted")
        .filter(col(m.vecCol).isNotNull)
        .withColumn("cluster_id", cell(col(m.vecCol)))
      val newCells = additions.select("cluster_id").distinct().collect().map(_.getInt(0))
      val affected = (oldCells ++ newCells).distinct.toSeq
      if (affected.nonEmpty) {
        val idx = spark.read.parquet(model.path)
          .filter(col("cluster_id").isin(affected: _*)) // partition-pruned
        val kept = idx.join(changedKeys, m.keyCols, "left_anti")
        // allowMissingColumns: additive table evolution — older index
        // rows read the new columns as null, like the table itself.
        // localCheckpoint materializes the rewrite BEFORE overwriting
        // the partitions it was computed from.
        val out = kept.unionByName(additions, allowMissingColumns = true)
          .localCheckpoint(true)
        val present = out.select("cluster_id").distinct().collect().map(_.getInt(0)).toSet
        out.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cluster_id").parquet(model.path)
        // a cell whose rows were all deleted writes no partition: drop it
        affected.filterNot(present).foreach { c =>
          GraftTable.MetaIO.delete(new Path(model.path, s"cluster_id=$c"))
        }
      }
      writeMeta(tablePath, m.copy(indexedVersion = head))
      Some((m.indexedVersion, head))
    } finally {
      batch.unpersist(blocking = false)
      ()
    }
  }

  /** Top-k against the table-attached index (exact inside probed cells;
    * nprobe = nlist ⇒ exact, full stop). Fails loudly when the index
    * lags the table unless `allowStale` — see class docs. `pred` is
    * pushed into the pruned scan like [[IvfIndex.probe]].
    */
  def probe(spark: SparkSession, tablePath: String, query: Seq[Float], k: Int,
            nprobe: Int, name: String = "vec", pred: Option[Column] = None,
            allowStale: Boolean = false): DataFrame = {
    val (m, model) = open(spark, tablePath, name)
    val head = GraftTable.latestVersion(tablePath)
    if (!allowStale && head != m.indexedVersion)
      throw new IllegalStateException(
        s"index '$name' on $tablePath is STALE: it reflects table version " +
          s"${m.indexedVersion} but the table is at $head — run " +
          "GraftIndex.refresh, or probe(allowStale = true) to serve the indexed snapshot")
    IvfIndex.probe(spark, model, m.keyCols.head, m.vecCol, query, k, nprobe, pred)
      .drop("cluster_id")
  }
}
