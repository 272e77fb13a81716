package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, PqIndex}

/** A vector index that lives WITH its [[GraftTable]] — the analog of the
  * reference serving `hudi_vector_search('{TABLE_PATH}', …)` from an
  * index Hudi/Lance keeps in sync with the table (demo.ipynb cell 11;
  * the reference table's declared index type is Lance's IVF_PQ, and
  * both kinds are supported here: `kind = "ivf"` (IVF-Flat, exact
  * inside probed cells) and `kind = "ivfpq"` (PQ codes + ADC probe +
  * exact re-rank, optionally OPQ-rotated).
  *
  * Layout, under the table's own directory:
  * {{{
  *   table/_index/<name>/meta    kind, vecCol, keys, metric, nlist,
  *                               indexedVersion (the table snapshot the
  *                               index reflects)
  *   table/_index/<name>/model   coarse centroids (+ PQ codebooks and
  *                               the optional OPQ rotation), parquet
  *   table/_index/<name>/data    the IVF layout: FULL table rows
  *                               (+ pq_code for ivfpq), partitioned by
  *                               cluster_id
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
  * `graft_index_exhaustive` / `vs_sql_index_tvf` CORRECTNESS rows and
  * GraftIndexSpec.
  */
object GraftIndex {

  final case class IndexMeta(name: String, kind: String, vecCol: String,
                             keyCols: Seq[String], metric: String, nlist: Int,
                             indexedVersion: Int)

  private def root(tablePath: String, name: String) = s"$tablePath/_index/$name"
  private def dataPath(tablePath: String, name: String) = s"${root(tablePath, name)}/data"
  private def modelPath(tablePath: String, name: String) = s"${root(tablePath, name)}/model"
  private def metaPath(tablePath: String, name: String) = new Path(root(tablePath, name), "meta")

  def exists(tablePath: String, name: String = "vec"): Boolean =
    GraftTable.MetaIO.exists(metaPath(tablePath, name))

  def meta(tablePath: String, name: String = "vec"): IndexMeta = {
    val p = metaPath(tablePath, name)
    require(GraftTable.MetaIO.exists(p), s"no index '$name' at $tablePath")
    val kv = GraftTable.MetaIO.readString(p).split("\n")
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v }.toMap
    IndexMeta(name, kv.getOrElse("kind", "ivf"), kv("vecCol"),
      kv("keyCols").split(",").toSeq, kv("metric"), kv("nlist").toInt,
      kv("indexedVersion").toInt)
  }

  private def writeMeta(tablePath: String, m: IndexMeta): Unit =
    GraftTable.MetaIO.replaceString(metaPath(tablePath, m.name),
      s"kind=${m.kind}\nvecCol=${m.vecCol}\nkeyCols=${m.keyCols.mkString(",")}\n" +
        s"metric=${m.metric}\nnlist=${m.nlist}\nindexedVersion=${m.indexedVersion}")

  // ---- model persistence: (part, i, j, vec) rows -------------------------

  private def saveModel(spark: SparkSession, tablePath: String, name: String,
                        coarse: Array[Array[Float]],
                        codebooks: Option[Array[Array[Array[Float]]]],
                        rot: Option[Array[Array[Float]]]): Unit = {
    import spark.implicits._
    val rows: Seq[(String, Int, Int, Seq[Float])] =
      coarse.zipWithIndex.map { case (c, i) => ("coarse", i, 0, c.toSeq) }.toSeq ++
      codebooks.toSeq.flatMap(_.zipWithIndex.toSeq.flatMap { case (book, mi) =>
        book.zipWithIndex.toSeq.map { case (c, ci) => ("book", mi, ci, c.toSeq) } }) ++
      rot.toSeq.flatMap(_.zipWithIndex.toSeq.map { case (r, i) => ("rot", i, 0, r.toSeq) })
    rows.toDF("part", "i", "j", "vec").repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(modelPath(tablePath, name))
  }

  /** Explicit layout schema: the table's manifest-recorded snapshot
    * schema (at the INDEXED version) + the layout's own columns, so
    * probes and refreshes resolve additively-evolved columns without a
    * whole-layout mergeSchema footer pass (older cell files pad the new
    * columns as null, like the table itself). None when the table
    * predates schema recording (or the indexed manifest was vacuumed —
    * the head manifest still exists for a fresh index, so only
    * allowStale probes can hit that) — plain inference then.
    */
  private def layoutSchema(tablePath: String, m: IndexMeta)
      : Option[org.apache.spark.sql.types.StructType] =
    scala.util.Try(GraftTable.snapshotSchema(tablePath, m.indexedVersion)).toOption
      .flatten.map { ts =>
        val extra =
          (if (m.kind == "ivfpq")
            Seq(org.apache.spark.sql.types.StructField("pq_code",
              org.apache.spark.sql.types.BinaryType))
          else Nil) :+
          org.apache.spark.sql.types.StructField("cluster_id",
            org.apache.spark.sql.types.IntegerType)
        org.apache.spark.sql.types.StructType(ts.fields ++ extra)
      }

  private def loadModel(spark: SparkSession, tablePath: String, m: IndexMeta)
      : Either[IvfIndex.Model, PqIndex.Model] = {
    val rows = spark.read.parquet(modelPath(tablePath, m.name))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getSeq[Float](3).toArray))
    val coarse = rows.filter(_._1 == "coarse").sortBy(_._2).map(_._4)
    val data = dataPath(tablePath, m.name)
    val sc = layoutSchema(tablePath, m)
    if (m.kind == "ivf") Left(IvfIndex.Model(data, coarse, m.metric, sc))
    else {
      val books = rows.filter(_._1 == "book").groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, bs) => bs.sortBy(_._3).map(_._4) }.toArray
      val rotRows = rows.filter(_._1 == "rot").sortBy(_._2).map(_._4)
      val rot = if (rotRows.isEmpty) None else Some(rotRows)
      val dsub = books(0)(0).length
      Right(PqIndex.Model(data, coarse, books, books.length, dsub, m.metric, rot, sc))
    }
  }

  private def open(spark: SparkSession, tablePath: String, name: String)
      : (IndexMeta, Either[IvfIndex.Model, PqIndex.Model]) = {
    val m = meta(tablePath, name)
    (m, loadModel(spark, tablePath, m))
  }

  /** Build the index from the table's CURRENT snapshot and record that
    * version. `kind = "ivf"` (default) or `"ivfpq"` (`m` subspaces,
    * `opq` for the learned rotation). Rows with a null vector are not
    * indexed (they reappear if a later upsert fills the vector in).
    */
  def create(spark: SparkSession, tablePath: String, vecCol: String, nlist: Int,
             metric: String = "cosine", name: String = "vec",
             kind: String = "ivf", m: Int = 8, opq: Boolean = false,
             fitSampleFraction: Option[Double] = None): Unit = {
    require(kind == "ivf" || kind == "ivfpq", s"unknown index kind '$kind'")
    val v = GraftTable.latestVersion(tablePath)
    require(v >= 0, s"no table at $tablePath")
    require(!exists(tablePath, name), s"index '$name' already exists at $tablePath")
    val keys = GraftTable.keyColumns(tablePath)
    val snap = GraftTable.read(spark, tablePath, v).filter(col(vecCol).isNotNull)
    if (kind == "ivf") {
      val model = IvfIndex.build(snap, vecCol, nlist, dataPath(tablePath, name),
        metric, fitSampleFraction = fitSampleFraction)
      saveModel(spark, tablePath, name, model.centroids, None, None)
    } else {
      val model = PqIndex.build(snap, keys.head, vecCol, nlist, m,
        dataPath(tablePath, name), metric, opq = opq)
      saveModel(spark, tablePath, name, model.coarse, Some(model.codebooks), model.rot)
    }
    writeMeta(tablePath, IndexMeta(name, kind, vecCol, keys, metric, nlist, v))
  }

  /** Catch the index up to the table head by COW cell rewrite. Returns
    * the (fromVersion, toVersion] range applied, or None when already
    * fresh. Affected cells = cells holding changed keys' OLD vectors
    * (recomputed from the previously indexed snapshot — still readable,
    * COW never mutates it) ∪ cells the NEW vectors land in; only those
    * partitions are rewritten. For ivfpq, additions are PQ-encoded with
    * the EXISTING codebooks (the append discipline: no refit; periodic
    * rebuild handles distribution drift).
    *
    * Run ONE refresher per index (the [[ChangeFeed]] one-cursor-per-
    * consumer discipline): refresh is idempotent against crashes and
    * replays, but two CONCURRENT refreshers would race the dynamic
    * partition overwrite with no arbitration. [[streamRefresh]] gives
    * the single-refresher loop a lifecycle.
    */
  def refresh(spark: SparkSession, tablePath: String,
              name: String = "vec"): Option[(Int, Int)] = {
    val (m, model) = open(spark, tablePath, name)
    val head = GraftTable.latestVersion(tablePath)
    if (head <= m.indexedVersion) return None
    val cell = model.fold(IvfIndex.cellUdf(spark, _), PqIndex.cellUdf(spark, _))
    val layoutPath = model.fold(_.path, _.path)
    val batch = GraftTable.changes(spark, tablePath, m.indexedVersion, head)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val changedKeys = batch.select(m.keyCols.map(col): _*).distinct()
      val oldCells = GraftTable.read(spark, tablePath, m.indexedVersion)
        .join(changedKeys, m.keyCols, "left_semi")
        .filter(col(m.vecCol).isNotNull)
        .select(cell(col(m.vecCol)).as("c")).distinct().collect().map(_.getInt(0))
      val newRows = batch.filter(!col("_deleted")).drop("_deleted")
        .filter(col(m.vecCol).isNotNull)
      val additions = model.fold(
        _ => newRows.withColumn("cluster_id", cell(col(m.vecCol))),
        pq => PqIndex.encodeBatch(pq, newRows, m.vecCol))
      val newCells = additions.select("cluster_id").distinct().collect().map(_.getInt(0))
      val affected = (oldCells ++ newCells).distinct.toSeq
      if (affected.nonEmpty) {
        // a layout whose every cell was deleted (empty table) has no
        // partition dirs — parquet can't infer a schema from it, and
        // there is nothing to keep anyway: rebuild from additions only
        val layoutEmpty = !GraftTable.MetaIO.list(new Path(layoutPath))
          .exists(_.getPath.getName.startsWith("cluster_id="))
        // scan with the CURRENT (head) snapshot schema so the rewrite
        // pads evolved columns for kept rows instead of dropping them
        val headSchema = layoutSchema(tablePath, m.copy(indexedVersion = head))
        val kept =
          if (layoutEmpty) additions.limit(0)
          else headSchema.fold(spark.read)(spark.read.schema(_)).parquet(layoutPath)
            .filter(col("cluster_id").isin(affected: _*)) // partition-pruned
            .join(changedKeys, m.keyCols, "left_anti")
        // allowMissingColumns: additive table evolution — older index
        // rows read the new columns as null, like the table itself.
        // localCheckpoint materializes the rewrite BEFORE overwriting
        // the partitions it was computed from.
        val out = kept.unionByName(additions, allowMissingColumns = true)
          .localCheckpoint(true)
        val present = out.select("cluster_id").distinct().collect().map(_.getInt(0)).toSet
        out.write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cluster_id").parquet(layoutPath)
        // a cell whose rows were all deleted writes no partition: drop it
        affected.filterNot(present).foreach { c =>
          GraftTable.MetaIO.delete(new Path(layoutPath, s"cluster_id=$c"))
        }
      }
      writeMeta(tablePath, m.copy(indexedVersion = head))
      Some((m.indexedVersion, head))
    } finally {
      batch.unpersist(blocking = false)
      ()
    }
  }

  /** Continuous maintenance: a Structured Streaming ticker drives
    * [[refresh]] per micro-batch, so the index FOLLOWS the table —
    * upserts/deletes/streamed writes land, the next tick folds them in —
    * with start/stop/trigger lifecycle and no manual refresh calls. The
    * composition twin of [[ChangeFeed.streamInto]]; position is owned by
    * `meta.indexedVersion` (restart-safe without a checkpoint, replays
    * idempotent per the refresh contract).
    */
  def streamRefresh(spark: SparkSession, tablePath: String, name: String = "vec",
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("rate").option("rowsPerSecond", "1").load()
      .writeStream
      .foreachBatch { (_: DataFrame, _: Long) => refresh(spark, tablePath, name); () }
      .trigger(trigger)
      .start()

  /** Top-k against the table-attached index (ivf: exact inside probed
    * cells; ivfpq: ADC + exact re-rank of `rerankFactor`·k survivors —
    * nprobe = nlist with a corpus-covering rerankFactor ⇒ exact, full
    * stop). Fails loudly when the index lags the table unless
    * `allowStale` — see class docs. `pred` is pushed into the pruned
    * scan like [[IvfIndex.probe]]/[[PqIndex.probe]].
    */
  def probe(spark: SparkSession, tablePath: String, query: Seq[Float], k: Int,
            nprobe: Int, name: String = "vec", pred: Option[Column] = None,
            allowStale: Boolean = false, rerankFactor: Int = 4): DataFrame = {
    val (m, model) = open(spark, tablePath, name)
    val head = GraftTable.latestVersion(tablePath)
    if (!allowStale && head != m.indexedVersion)
      throw new IllegalStateException(
        s"index '$name' on $tablePath is STALE: it reflects table version " +
          s"${m.indexedVersion} but the table is at $head — run " +
          "GraftIndex.refresh, or probe(allowStale = true) to serve the indexed snapshot")
    // an index over an EMPTY table (every cell dropped) is valid state:
    // zero rows, shaped like any other probe (table columns minus the
    // vector, plus score) — not a parquet schema-inference crash
    val layoutPath = model.fold(_.path, _.path)
    if (!GraftTable.MetaIO.list(new Path(layoutPath))
        .exists(_.getPath.getName.startsWith("cluster_id=")))
      return GraftTable.read(spark, tablePath, m.indexedVersion).limit(0)
        .withColumn("score", lit(0.0)).drop(m.vecCol)
    model.fold(
      ivf => IvfIndex.probe(spark, ivf, m.keyCols.head, m.vecCol, query, k, nprobe, pred)
        .drop("cluster_id"),
      pq => PqIndex.probe(spark, pq, m.keyCols.head, m.vecCol, query, k, nprobe,
        rerankFactor, pred))
  }
}
