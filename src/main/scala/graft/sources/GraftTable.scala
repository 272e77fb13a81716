package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A minimal copy-on-write versioned lakehouse table — the Spark-native
  * analog of the reference's Hudi table (demo.ipynb cell 8: record-key
  * upserts, COPY_ON_WRITE): keyed last-wins upserts, snapshot reads,
  * time travel.
  *
  * Layout (manifest-based, iceberg-lite):
  * {{{
  *   path/_keys              key columns + bucket count
  *   path/_commits           one committed version per line (atomic append)
  *   path/manifests/v<N>     bucket → data-dir lines for snapshot N
  *   path/data/v<N>-<token>/__bucket=<b>/  (parquet files; token is
  *     unique per write attempt so racing writers never share a dir)
  * }}}
  *
  * Rows hash into `nbuckets` buckets on the record key. An upsert
  * rewrites ONLY the buckets its updates touch; the new manifest points
  * untouched buckets at their existing files. That makes upsert cost
  * O(touched buckets), not O(table) — the same file-group-level write
  * amplification Hudi COW has, and the property that matters at 100 TB
  * (a 0.1 % update batch rewrites ~0.1 % of a well-bucketed table, not
  * the whole snapshot). Readers pin a manifest via the commit-log head,
  * so concurrent readers never see a half-written snapshot; old
  * versions stay readable (time travel) because their files are never
  * mutated.
  */
object GraftTable {
  private val BUCKET = "__bucket"

  private def commitsPath(path: String) = Paths.get(path, "_commits")
  private def keysPath(path: String) = Paths.get(path, "_keys")
  private def manifestPath(path: String, v: Int) = Paths.get(path, "manifests", s"v$v")

  def exists(path: String): Boolean = Files.exists(commitsPath(path))

  /** latest committed version, or -1 */
  def latestVersion(path: String): Int =
    if (!exists(path)) -1
    else Files.readAllLines(commitsPath(path)).asScala.lastOption
      .map(_.trim.split("\t")(0).toInt).getOrElse(-1)

  /** committed (version, wall-clock millis) pairs, commit order. */
  def commitLog(path: String): Seq[(Int, Long)] =
    if (!exists(path)) Seq.empty
    else Files.readAllLines(commitsPath(path)).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val parts = line.trim.split("\t")
      (parts(0).toInt, if (parts.length > 1) parts(1).toLong else 0L)
    }

  private def meta(path: String): (Seq[String], Int) = {
    val Array(k, n) = Files.readString(keysPath(path)).split("\\|")
    (k.split(",").toSeq, n.toInt)
  }

  private def bucketCol(keyCols: Seq[String], nbuckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(nbuckets)).cast("int")

  def create(df: DataFrame, path: String, keyCols: Seq[String], nbuckets: Int = 16): Unit = {
    require(!exists(path), s"table already exists at $path")
    Files.createDirectories(Paths.get(path, "manifests"))
    // CREATE_NEW: two racing creates — exactly one wins the keys file
    try Files.writeString(keysPath(path), keyCols.mkString(",") + "|" + nbuckets,
      StandardOpenOption.CREATE_NEW)
    catch { case _: FileAlreadyExistsException =>
      throw new java.util.ConcurrentModificationException(
        s"concurrent create already initialized the table at $path")
    }
    writeVersion(df, path, keyCols, nbuckets, v = 0, carryOver = Map.empty)
  }

  /** Upsert = merge into the touched buckets only; untouched buckets are
    * carried over by manifest reference (no rewrite, no read).
    *
    * Additive schema evolution (the Hudi behavior): updates may carry
    * NEW columns — existing rows read them as null — and may omit
    * existing non-key columns — the updated rows' omitted columns
    * become null (whole-row replace semantics, not column-level patch).
    * Key columns are always required.
    */
  /** `precombine`: Hudi's precombine-field semantics — when the update
    * batch itself repeats a key, the row with the GREATEST precombine
    * value wins (default: deterministic full-row tie-break).
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             precombine: Seq[String] = Nil): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, nbuckets) = meta(path)
    keys.foreach(k => require(updates.columns.contains(k), s"updates missing key column $k"))
    val current = manifest(path, v)
    val touched = updates.select(bucketCol(keys, nbuckets).as(BUCKET))
      .distinct().collect().map(_.getInt(0)).toSet
    val baseDirs = current.filter { case (b, _) => touched(b) }.values.toSeq
    val base =
      if (baseDirs.isEmpty) updates.limit(0)
      else spark.read.option("mergeSchema", "true")
        .parquet(baseDirs.map(d => s"$path/$d"): _*)
    val (base2, updates2) = alignSchemas(base, updates)
    val merged = Upsert.merge(base2, updates2, keys, precombine.map(col))
    val carryOver = current.filter { case (b, _) => !touched(b) }
    writeVersion(merged, path, keys, nbuckets, v + 1, carryOver)
  }

  /** pad each side with the other's missing columns as typed nulls */
  private def alignSchemas(a: DataFrame, b: DataFrame): (DataFrame, DataFrame) = {
    val aCols = a.columns.toSet
    val bCols = b.columns.toSet
    val a2 = b.schema.fields.filterNot(f => aCols(f.name))
      .foldLeft(a)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
    val b2 = a.schema.fields.filterNot(f => bCols(f.name))
      .foldLeft(b)((df, f) => df.withColumn(f.name, lit(null).cast(f.dataType)))
    (a2, b2)
  }

  /** Snapshot read; `version` for time travel. mergeSchema unions the
    * per-dir schemas, so rows written before an additive evolution read
    * the new columns as null.
    */
  def read(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else latestVersion(path)
    require(v >= 0, s"no table at $path")
    val dirs = manifest(path, v).values.map(d => s"$path/$d").toSeq
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Time travel by wall clock: the snapshot committed at or before
    * `tsMillis` (commit times are recorded in the commit log).
    */
  def readAsOf(spark: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val eligible = commitLog(path).filter(_._2 <= tsMillis)
    require(eligible.nonEmpty, s"no commit at or before $tsMillis in $path")
    read(spark, path, eligible.last._1)
  }

  /** bucket → relative data dir for snapshot v */
  def manifest(path: String, v: Int): Map[Int, String] =
    Files.readAllLines(manifestPath(path, v)).asScala.filter(_.nonEmpty).map { line =>
      val Array(b, d) = line.split("\t")
      b.toInt -> d
    }.toMap

  /** Major compaction: rewrite the current snapshot as a fresh version
    * with exactly one file per bucket. Bucket-level COW accretes files
    * (every upsert adds a dir for each touched bucket, and task
    * parallelism splits dirs into many small parquet files) — the
    * classic small-files problem; at 100 TB scan throughput dies on
    * file-open overhead long before bytes. The repartition pins each
    * bucket to one task so each dir is one well-sized file. Runs
    * through the same optimistic-commit path as upsert (a racing
    * writer fails cleanly); follow with [[vacuum]] to reclaim the old
    * dirs.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, nbuckets) = meta(path)
    val snapshot = read(spark, path, v)
      .repartition(nbuckets, bucketCol(keys, nbuckets))
    writeVersion(snapshot, path, keys, nbuckets, v + 1, carryOver = Map.empty)
  }

  /** Change feed: rows ADDED or UPDATED in versions (fromVersion,
    * toVersion] — each emitted once, with its latest (toVersion) image.
    * The reference's Hudi incremental-query surface, cheap under
    * bucket-level COW: only buckets whose manifest entry changed can
    * hold changes, so the diff reads those buckets' dirs at the two
    * versions and emits `to EXCEPT ALL from` (full-row compare — an
    * unchanged row carried through a rewrite is NOT a change). The
    * table is upsert-only, so deletes don't arise.
    */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val mFrom = manifest(path, fromVersion)
    val mTo = manifest(path, toVersion)
    val touched = mTo.filter { case (b, d) => !mFrom.get(b).contains(d) }
    if (touched.isEmpty) return read(spark, path, toVersion).limit(0)
    val newSide = spark.read.option("mergeSchema", "true")
      .parquet(touched.values.map(d => s"$path/$d").toSeq: _*)
    val oldDirs = touched.keys.flatMap(mFrom.get).map(d => s"$path/$d").toSeq
    if (oldDirs.isEmpty) newSide
    else {
      // schema may have evolved between the versions — align both sides
      // (padding with typed nulls) so the full-row EXCEPT is well-typed
      val oldSide = spark.read.option("mergeSchema", "true").parquet(oldDirs: _*)
      val (n2, o2) = alignSchemas(newSide, oldSide)
      val cols = n2.columns.sorted.map(col)
      n2.select(cols: _*).exceptAll(o2.select(cols: _*))
    }
  }

  /** Drop snapshots older than the last `keepVersions`: delete data
    * dirs no surviving manifest references, plus their manifests.
    * Time travel past the horizon is gone (standard lakehouse vacuum
    * semantics); the commit log keeps its full history for audit.
    * Long-lived tables need this — bucket-level COW leaks one dir per
    * touched bucket per commit otherwise.
    */
  def vacuum(path: String, keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val v = latestVersion(path)
    val keep = (math.max(0, v - keepVersions + 1) to v).toSeq
    val referenced = keep.flatMap(manifest(path, _).values).toSet
    val dataRoot = Paths.get(path, "data")
    val versions = Files.list(dataRoot)
    try versions.iterator().asScala.toSeq.foreach { vDir =>
      val buckets = Files.list(vDir)
      try buckets.iterator().asScala.toSeq.foreach { bDir =>
        val rel = s"data/${vDir.getFileName}/${bDir.getFileName}"
        if (!referenced(rel)) deleteRecursively(bDir)
      } finally buckets.close()
      val remaining = Files.list(vDir)
      try { if (!remaining.iterator().hasNext) Files.delete(vDir) }
      finally remaining.close()
    } finally versions.close()
    (0 until keep.head).foreach(old => Files.deleteIfExists(manifestPath(path, old)))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toSeq.foreach(deleteRecursively) finally s.close()
    }
    Files.delete(p)
  }

  /** Write snapshot v: data dir → manifest → commit-log append.
    *
    * Optimistic concurrency control: the manifest for v is created with
    * CREATE_NEW, so of two writers that both read version v−1 and race
    * to commit v, exactly one wins; the loser throws
    * ConcurrentModificationException WITHOUT touching any shared state
    * (its data dir carries a unique suffix, so it never clobbers the
    * winner's files, and vacuum reclaims the orphan). This is the same
    * manifest-level atomic-rename/put-if-absent protocol the lakehouse
    * formats use; the caller retries the upsert against the new head.
    */
  private def writeVersion(df: DataFrame, path: String, keyCols: Seq[String],
                           nbuckets: Int, v: Int, carryOver: Map[Int, String]): Unit = {
    // unique per-attempt dir: racing writers must not share a data path
    val dataRel = s"data/v$v-${java.util.UUID.randomUUID.toString.take(8)}"
    df.withColumn(BUCKET, bucketCol(keyCols, nbuckets))
      .write.mode(SaveMode.Overwrite).partitionBy(BUCKET)
      .parquet(s"$path/$dataRel")
    // manifest = freshly written bucket dirs + carried-over references
    val listing = Files.list(Paths.get(path).resolve(dataRel))
    val written =
      try listing.iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith(s"$BUCKET="))
        .map(d => d.stripPrefix(s"$BUCKET=").toInt -> s"$dataRel/$d").toMap
      finally listing.close()
    val lines = (carryOver ++ written).toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b\t$d" }.mkString("\n")
    // CREATE_NEW = the commit lock: first manifest for v wins
    try Files.writeString(manifestPath(path, v), lines, StandardOpenOption.CREATE_NEW)
    catch { case _: FileAlreadyExistsException =>
      throw new java.util.ConcurrentModificationException(
        s"concurrent writer committed v$v first at $path; re-read and retry the upsert")
    }
    // commit last: readers only see fully-written manifests; the commit
    // time enables wall-clock time travel (readAsOf)
    Files.writeString(commitsPath(path), s"$v\t${System.currentTimeMillis()}\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
