package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, types}
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import java.nio.charset.StandardCharsets

/** A minimal copy-on-write versioned lakehouse table — the Spark-native
  * analog of the reference's Hudi table (demo.ipynb cell 8: record-key
  * upserts, COPY_ON_WRITE): keyed last-wins upserts, snapshot reads,
  * time travel.
  *
  * Layout (manifest-based, iceberg-lite):
  * {{{
  *   path/_keys              key columns + bucket count
  *   path/_commits/v<N>      commit marker for snapshot N (content =
  *     wall-clock millis). One small file per commit — no appends, so
  *     the log works on HDFS and object stores, where append either
  *     doesn't exist or isn't atomic.
  *   path/manifests/v<N>     bucket → data-dir lines for snapshot N
  *   path/data/v<N>-<token>/__bucket=<b>/  (parquet files; token is
  *     unique per write attempt so racing writers never share a dir)
  * }}}
  *
  * ALL metadata IO (keys file, manifests, commit markers, vacuum
  * listings) goes through the Hadoop [[FileSystem]] API resolved from
  * the active session's Hadoop configuration, so the table lives
  * wherever its data lives: `file:`, `hdfs:`, `s3a:`, any configured
  * FileSystem — the same reach as the parquet data files, which always
  * went through `spark.read`/`write`. See [[MetaIO.putIfAbsent]] for
  * the one primitive whose atomicity is storage-dependent.
  *
  * Rows hash into `nbuckets` buckets on the record key. An upsert
  * rewrites ONLY the buckets its updates touch; the new manifest points
  * untouched buckets at their existing files. That makes upsert cost
  * O(touched buckets), not O(table) — the same file-group-level write
  * amplification Hudi COW has, and the property that matters at 100 TB
  * (a 0.1 % update batch rewrites ~0.1 % of a well-bucketed table, not
  * the whole snapshot). Readers pin a manifest via the commit markers,
  * so concurrent readers never see a half-written snapshot; old
  * versions stay readable (time travel) because their files are never
  * mutated.
  */
object GraftTable {
  private val BUCKET = "__bucket"
  private val VersionFile = "v(\\d+)".r

  /** Commit-lock provider for stores without atomic create-if-absent
    * (see [[GraftLockProvider]]). None (default) = native atomicity on
    * file/hdfs, loud failure elsewhere. JVM-global because the commit
    * lock must be: two writers in one driver using different providers
    * for the same store would not serialize against each other.
    */
  @volatile private var lockProvider: Option[GraftLockProvider] = None
  def setLockProvider(p: Option[GraftLockProvider]): Unit = { lockProvider = p }

  /** Metadata IO, routed through the Hadoop FileSystem of each path. */
  private[sources] object MetaIO {
    def conf: Configuration =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new Configuration())

    private def fs(p: Path): FileSystem = p.getFileSystem(conf)

    def exists(p: Path): Boolean = fs(p).exists(p)

    def readString(p: Path): String = {
      val in = fs(p).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }

    def writeString(p: Path, s: String): Unit = {
      val out = fs(p).create(p, true) // creates parent dirs; overwrite ok
      try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
    }

    /** Schemes whose `create(p, overwrite=false)` is genuinely atomic
      * (arbitrated by a metadata service, not check-then-act).
      */
    private val AtomicCreateSchemes = Set("hdfs", "viewfs")

    /** Atomic put-if-absent — THE commit-lock primitive (table create
      * lock and per-version manifest lock both sit on it). Returns
      * false when the file already exists, i.e. the race was lost.
      *
      * Storage-dependent atomicity, handled per scheme:
      *  - Local `file:`: Hadoop's RawLocalFileSystem.create is
      *    check-then-act (exists() + open), NOT atomic under
      *    contention, so we go through the platform filesystem's
      *    O_CREAT|O_EXCL instead — the kernel arbitrates the race.
      *  - HDFS/viewfs: `create(p, overwrite=false)` is atomic at the
      *    NameNode — two racing creates, one wins.
      *  - Everything else (s3a and friends): NO native create-if-absent
      *    exists, so commits require a configured [[GraftLockProvider]]
      *    (conditional PUT, external lock service — the same providers
      *    Hudi ships for S3). Without one the write FAILS LOUDLY here
      *    rather than letting two racing writers both "win" a
      *    check-then-act emulation.
      */
    def putIfAbsent(p: Path, s: String): Boolean = {
      val filesystem = fs(p)
      val scheme = Option(filesystem.getScheme).getOrElse("").toLowerCase
      GraftTable.lockProvider match {
        case Some(lp) if lp.handles(scheme) =>
          lp.putIfAbsent(p, s, exists, writeString)
        case _ if scheme == "file" =>
          import java.nio.file.{Files, Paths, FileAlreadyExistsException, StandardOpenOption}
          val local = Paths.get(p.toUri.getPath)
          Files.createDirectories(local.getParent)
          try { Files.writeString(local, s, StandardOpenOption.CREATE_NEW); true }
          catch { case _: FileAlreadyExistsException => false }
        case _ if AtomicCreateSchemes(scheme) =>
          try {
            val out = filesystem.create(p, false)
            try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
            true
          } catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => false }
        case _ =>
          throw new UnsupportedOperationException(
            s"scheme '$scheme' has no atomic create-if-absent, so optimistic commits " +
              "would be silently unsafe (two racing writers could both win a " +
              "check-then-act emulation). Configure GraftTable.setLockProvider with a " +
              "provider for this store — e.g. a conditional-PUT or external-lock " +
              "implementation of GraftLockProvider — before writing.")
      }
    }

    /** Atomic content swap: write to a sibling tmp file, rename over
      * `p`. POSIX rename replaces the target in one step; on FSs whose
      * rename refuses an existing target (HDFS), the delete+rename
      * fallback leaves only a missing-file window — readers see old
      * content, new content, or absence, NEVER a torn/empty read.
      */
    def replaceString(p: Path, s: String): Unit = {
      val tmp = new Path(p.getParent, p.getName + ".tmp")
      writeString(tmp, s)
      val f = fs(p)
      if (!f.rename(tmp, p)) {
        f.delete(p, false)
        if (!f.rename(tmp, p))
          throw new java.io.IOException(s"atomic replace failed for $p")
      }
    }

    def list(p: Path): Seq[FileStatus] =
      if (!exists(p)) Seq.empty else fs(p).listStatus(p).toSeq

    def delete(p: Path): Unit = {
      val f = fs(p)
      if (f.exists(p)) f.delete(p, true)
      ()
    }
  }

  private def commitsDir(path: String) = new Path(path, "_commits")
  private def commitMarker(path: String, v: Int) = new Path(commitsDir(path), s"v$v")
  private def keysPath(path: String) = new Path(path, "_keys")
  private def manifestPath(path: String, v: Int) = new Path(new Path(path, "manifests"), s"v$v")

  /** committed versions, ascending (= commit order: versions are minted
    * sequentially under the manifest lock)
    */
  private def commitVersions(path: String): Seq[Int] =
    MetaIO.list(commitsDir(path)).map(_.getPath.getName)
      .collect { case VersionFile(v) => v.toInt }.sorted

  def exists(path: String): Boolean = commitVersions(path).nonEmpty

  /** latest committed version, or -1 */
  def latestVersion(path: String): Int = commitVersions(path).lastOption.getOrElse(-1)

  /** committed (version, wall-clock millis) pairs, commit order.
    *
    * Cost note: discovery is a directory LISTING (same as Delta's
    * _delta_log) and reading the timestamps is one small GET per
    * marker — O(commits), paid only by wall-clock time travel
    * ([[readAsOf]]); version reads and [[latestVersion]] never open
    * markers. One-file-per-commit is deliberate: the alternative
    * single-file log needs atomic append, which object stores do not
    * have. Long-lived tables bound the listing with [[vacuum]]-style
    * retention on the _commits dir if it ever matters (markers are
    * ~13 bytes each; millions list fine).
    */
  def commitLog(path: String): Seq[(Int, Long)] =
    MetaIO.list(commitsDir(path)).flatMap { st =>
      st.getPath.getName match {
        case VersionFile(v) =>
          // markers are written atomically (replaceString), but a legacy
          // torn marker degrades to the file's mtime, not an exception
          val ts = scala.util.Try(MetaIO.readString(st.getPath).trim.toLong)
            .getOrElse(st.getModificationTime)
          Some(v.toInt -> ts)
        case _ => None // in-flight .tmp siblings from the atomic swap
      }
    }.sortBy(_._1)

  /** (key columns, bucket count, key DDL types). The types field was
    * added after v1 tables existed, so it is optional on read; absent,
    * [[alignKeyTypes]] falls back to reading the snapshot schema.
    */
  private def meta(path: String): (Seq[String], Int, Option[Seq[types.DataType]]) = {
    val fields = MetaIO.readString(keysPath(path)).split("\\|")
    val keyTypes =
      if (fields.length >= 3 && fields(2).nonEmpty)
        scala.util.Try(fields(2).split(";").toSeq.map(types.DataType.fromDDL)).toOption
      else None
    (fields(0).split(",").toSeq, fields(1).toInt, keyTypes)
  }

  private def bucketCol(keyCols: Seq[String], nbuckets: Int) =
    pmod(xxhash64(keyCols.map(col): _*), lit(nbuckets)).cast("int")

  def create(df: DataFrame, path: String, keyCols: Seq[String], nbuckets: Int = 16): Unit = {
    require(!exists(path), s"table already exists at $path")
    // key TYPES are recorded so later writes can align a batch's key
    // columns without re-reading the snapshot schema (ddl strings,
    // ';'-separated — ',' appears inside decimal(p,s))
    val keyDdl = keyCols.map(k => df.schema(k).dataType.sql).mkString(";")
    // put-if-absent: two racing creates — exactly one wins the keys file
    if (!MetaIO.putIfAbsent(keysPath(path), keyCols.mkString(",") + "|" + nbuckets + "|" + keyDdl))
      throw new java.util.ConcurrentModificationException(
        s"concurrent create already initialized the table at $path")
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
  /** [[upsert]] with optimistic-concurrency retry: a writer that loses
    * the commit race re-reads the new head and re-applies its batch
    * (the merge is keyed last-wins, so re-application against the
    * winner's snapshot is exactly the serial order the lock chose).
    * This is the Hudi-style auto-retry loop; the raw [[upsert]] stays
    * available for callers that want to handle conflicts themselves.
    */
  def upsertRetry(spark: SparkSession, path: String, updates: DataFrame,
                  precombine: Seq[String] = Nil, maxRetries: Int = 5): Unit =
    occRetry(maxRetries) { upsert(spark, path, updates, precombine) }

  /** [[delete]] with the same optimistic-concurrency retry loop as
    * [[upsertRetry]] (deleting a key is idempotent, so re-application
    * against the race winner's head is always safe).
    */
  def deleteRetry(spark: SparkSession, path: String, keysDf: DataFrame,
                  maxRetries: Int = 5): Unit =
    occRetry(maxRetries) { delete(spark, path, keysDf) }

  private def occRetry(maxRetries: Int)(body: => Unit): Unit = {
    var attempt = 0
    while (true) {
      try { body; return }
      catch {
        case e: java.util.ConcurrentModificationException =>
          attempt += 1
          if (attempt > maxRetries) throw e
      }
    }
  }

  /** Cast `df`'s key columns to the table's stored key types: the
    * bucket is xxhash64 over the key VALUES AS TYPED, so an
    * Int-typed key batch against a Long-keyed table would hash into
    * the wrong bucket and silently miss its rows. Lossless for the
    * sane widenings (int→long etc.); a truly incompatible cast fails
    * in Spark's analyzer rather than corrupting placement.
    *
    * Key types come from the `_keys` file (recorded at create — O(1));
    * tables created before the field existed fall back to one snapshot
    * schema read.
    */
  private def alignKeyTypes(spark: SparkSession, path: String, v: Int,
                            keys: Seq[String], keyTypes: Option[Seq[types.DataType]],
                            df: DataFrame): DataFrame = {
    val stored: Map[String, types.DataType] = keyTypes match {
      case Some(ts) => keys.zip(ts).toMap
      case None => read(spark, path, v).schema.fields
        .map(f => f.name -> f.dataType).toMap
    }
    keys.foldLeft(df) { (d, k) =>
      stored.get(k) match {
        case Some(t) if d.schema(k).dataType != t => d.withColumn(k, col(k).cast(t))
        case _ => d
      }
    }
  }

  def upsert(spark: SparkSession, path: String, updates0: DataFrame,
             precombine: Seq[String] = Nil): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, defaultBuckets, keyTypes) = meta(path)
    val nbuckets = bucketsAt(path, v, defaultBuckets)
    keys.foreach(k => require(updates0.columns.contains(k), s"updates missing key column $k"))
    val updates = alignKeyTypes(spark, path, v, keys, keyTypes, updates0)
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

  /** Delete by key: drop every row whose key appears in `keysDf` (extra
    * columns are ignored). Same touched-bucket COW path as upsert — only
    * the buckets the keys hash into are read and rewritten (anti-join
    * against the key set, broadcast when small), untouched buckets carry
    * over by manifest reference, so cost is O(touched buckets), not
    * O(table). Hudi's `operation=delete` (demo.ipynb cell 8 API family).
    * A bucket whose rows are all deleted drops out of the manifest;
    * [[changes]] reports the removals with `_deleted = true`.
    */
  def delete(spark: SparkSession, path: String, keysDf: DataFrame): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, defaultBuckets, keyTypes) = meta(path)
    val nbuckets = bucketsAt(path, v, defaultBuckets)
    keys.foreach(k => require(keysDf.columns.contains(k), s"delete batch missing key column $k"))
    val keyOnly = alignKeyTypes(spark, path, v, keys, keyTypes, keysDf)
      .select(keys.map(col): _*).distinct()
    val current = manifest(path, v)
    val touched = keyOnly.select(bucketCol(keys, nbuckets).as(BUCKET))
      .distinct().collect().map(_.getInt(0)).toSet
    val baseDirs = current.filter { case (b, _) => touched(b) }.values.toSeq
    if (baseDirs.isEmpty) return // no stored bucket can hold these keys
    val base = spark.read.option("mergeSchema", "true")
      .parquet(baseDirs.map(d => s"$path/$d"): _*)
    val remaining = base.join(keyOnly, keys, "left_anti")
    val carryOver = current.filter { case (b, _) => !touched(b) }
    writeVersion(remaining, path, keys, nbuckets, v + 1, carryOver)
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

  /** The table's record-key columns (create-time order). */
  def keyColumns(path: String): Seq[String] = meta(path)._1

  /** The bucket a fully-specified key tuple hashes into under snapshot
    * `version`'s layout — evaluated with the SAME typed xxhash64
    * expression the writers use (literals cast to the stored key types
    * first, exactly like a write batch), so the answer is the dir the
    * row lives in, not a reimplementation that could drift. One
    * driver-local 1-row job.
    */
  def bucketFor(spark: SparkSession, path: String, version: Int,
                keyValues: Map[String, Any]): Int = {
    val v = if (version >= 0) version else latestVersion(path)
    val (keys, defaultBuckets, keyTypes) = meta(path)
    require(keys.forall(keyValues.contains), s"bucketFor needs all key columns $keys")
    val nbuckets = bucketsAt(path, v, defaultBuckets)
    val oneRow = keys.foldLeft(spark.range(1).toDF()) { (d, k) =>
      d.withColumn(k, lit(keyValues(k)))
    }
    alignKeyTypes(spark, path, v, keys, keyTypes, oneRow)
      .select(bucketCol(keys, nbuckets).as("b")).head().getInt(0)
  }

  /** Snapshot restricted to the manifest dirs of `buckets` — the
    * point-lookup path: a key-equality read opens ONE bucket's files
    * (file-group pruning, Hudi's bucket-index lookup), not the table.
    * The frame is padded to the full snapshot schema, so reads of an
    * old un-rewritten bucket after additive evolution still line up.
    */
  def readBuckets(spark: SparkSession, path: String, version: Int,
                  buckets: Set[Int]): DataFrame = {
    val v = if (version >= 0) version else latestVersion(path)
    require(v >= 0, s"no table at $path")
    val full = read(spark, path, v)
    val dirs = manifest(path, v).filter { case (b, _) => buckets(b) }
      .values.map(d => s"$path/$d").toSeq
    if (dirs.isEmpty) return full.limit(0)
    val sub = spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    val padded = full.schema.fields.filterNot(f => sub.columns.contains(f.name))
      .foldLeft(sub)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
    padded.select(full.columns.map(col).toIndexedSeq: _*)
  }

  /** Time travel by wall clock: the snapshot committed at or before
    * `tsMillis` (commit times are recorded in the commit markers).
    */
  def readAsOf(spark: SparkSession, path: String, tsMillis: Long): DataFrame = {
    val eligible = commitLog(path).filter(_._2 <= tsMillis)
    require(eligible.nonEmpty, s"no commit at or before $tsMillis in $path")
    read(spark, path, eligible.last._1)
  }

  /** Manifest text for snapshot `v`, with the clear failure modes a
    * lakehouse owes its users instead of a raw filesystem error:
    *  - version committed but manifest reclaimed → "vacuumed", naming
    *    the earliest still-readable version (the commit markers keep
    *    full history for audit, so this case is precisely detectable);
    *  - version never committed → "no committed version", naming the
    *    latest. Every snapshot read, time travel, restore, and change
    *    feed routes through here.
    */
  private def manifestText(path: String, v: Int): String = {
    val p = manifestPath(path, v)
    if (!MetaIO.exists(p)) {
      val readable = MetaIO.list(new Path(path, "manifests")).map(_.getPath.getName)
        .collect { case VersionFile(n) => n.toInt }
      if (MetaIO.exists(commitMarker(path, v)))
        throw new IllegalStateException(
          s"version $v of $path was vacuumed" +
            (if (readable.nonEmpty) s"; earliest readable version is ${readable.min}"
             else "") +
            " — snapshot reads, time travel, restore, and change feeds cannot cross the vacuum horizon")
      else
        throw new IllegalArgumentException(
          s"no committed version $v at $path (latest is ${latestVersion(path)})")
    }
    MetaIO.readString(p)
  }

  /** bucket → relative data dir for snapshot v (header lines skipped) */
  def manifest(path: String, v: Int): Map[Int, String] =
    manifestText(path, v).split("\n").toSeq
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(b, d) = line.split("\t")
        b.toInt -> d
      }.toMap

  /** The bucket count snapshot `v` was written with, from the manifest's
    * `#nbuckets=` header. The count is PER-SNAPSHOT (not table-global)
    * so [[rebucket]] can evolve the layout: writers bucket new data by
    * the CURRENT head's count, and the OCC manifest lock serializes a
    * racing upsert against a rebucket (the loser re-reads the new head —
    * and with it the new count). Manifests written before the header
    * existed fall back to the `_keys` create-time count.
    */
  def manifestBuckets(path: String, v: Int): Option[Int] =
    manifestText(path, v).split("\n")
      .collectFirst { case l if l.startsWith("#nbuckets=") =>
        l.stripPrefix("#nbuckets=").trim.toInt }

  private def bucketsAt(path: String, v: Int, default: Int): Int =
    manifestBuckets(path, v).getOrElse(default)

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
  /** `clusterBy = Some((a, b))` additionally Z-ORDERS each bucket's
    * file on the two columns (Delta/Iceberg OPTIMIZE ZORDER, bucket-
    * scoped): rows keep their key-hash bucket — the manifest invariant
    * — but within a file they are sorted by the interleaved-bit
    * z-value, so parquet row-group min/max stats prune scans filtered
    * on EITHER dimension. At 100 TB this is the difference between a
    * time-range query reading one row group per file and reading the
    * whole table; the stats pass is one extra lightweight agg scan.
    */
  def compact(spark: SparkSession, path: String,
              clusterBy: Option[(String, String)] = None): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, defaultBuckets, _) = meta(path)
    val nbuckets = bucketsAt(path, v, defaultBuckets)
    val snap = read(spark, path, v)
    clusterBy match {
      case None =>
        writeVersion(snap.repartition(nbuckets, bucketCol(keys, nbuckets)),
          path, keys, nbuckets, v + 1, carryOver = Map.empty)
      case Some((a, b)) =>
        graft.operators.Layout.zcolumn(snap, a, b) match {
          case None => // empty/all-null dimension: plain compaction
            writeVersion(snap.repartition(nbuckets, bucketCol(keys, nbuckets)),
              path, keys, nbuckets, v + 1, carryOver = Map.empty)
          case Some(z) =>
            writeVersion(snap.withColumn("__zc", z), path, keys, nbuckets,
              v + 1, carryOver = Map.empty, sortWithin = Seq("__zc"))
        }
    }
  }

  /** Bucket-count evolution (Hudi clustering / Iceberg partition-spec
    * evolution, restricted to the hash-bucket layout): rewrite the
    * current snapshot under `newBuckets` and commit it as a new
    * version whose manifest header records the new count. A table's
    * create-time bucket count always becomes too small — a 100 TB
    * table bucketed for 1 TB has 100× oversized file groups and 100×
    * the upsert write amplification — and COW makes the fix a plain
    * versioned rewrite: old versions stay readable under their own
    * layout (each manifest pins its own `#nbuckets`), time travel and
    * [[changes]] across the boundary work unchanged (the bucket diff
    * sees every bucket changed — a full-rewrite diff, same as
    * compaction — and full-row EXCEPT still reports only real
    * changes). A writer racing the rebucket loses the OCC lock,
    * re-reads the new head, and buckets its batch by the new count.
    */
  def rebucket(spark: SparkSession, path: String, newBuckets: Int): Unit = {
    require(newBuckets >= 1, "need at least one bucket")
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val (keys, _, _) = meta(path)
    val snapshot = read(spark, path, v)
      .repartition(newBuckets, bucketCol(keys, newBuckets))
    writeVersion(snapshot, path, keys, newBuckets, v + 1, carryOver = Map.empty)
  }

  /** The full snapshot at `version`, shaped as a change-feed batch
    * (table columns sorted by name + `_deleted = false`) — the CDC
    * bootstrap image. Single source of truth for the change-feed
    * schema's column order; [[changes]], [[ChangeFeed.pollOnce]], and
    * the streaming source all align to it.
    */
  def initialImage(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val snap = read(spark, path, version)
    snap.select(snap.columns.sorted.map(col).toIndexedSeq: _*)
      .withColumn("_deleted", lit(false))
  }

  /** Change feed: rows ADDED, UPDATED, or DELETED in versions
    * (fromVersion, toVersion] — each key emitted at most once. Schema =
    * the table's columns (sorted by name) plus a trailing `_deleted`
    * boolean: adds/updates carry their latest (toVersion) image with
    * `_deleted = false`; deletes carry the last stored (fromVersion)
    * image with `_deleted = true` — Hudi's incremental-query surface
    * extended with delete capture, Debezium-style before-image.
    *
    * Cheap under bucket-level COW: only buckets whose manifest entry
    * differs between the versions can hold changes, so the diff reads
    * just those buckets' dirs. Upserts = `to EXCEPT ALL from`
    * (full-row compare — an unchanged row carried through a
    * rewrite/compaction is NOT a change); deletes = `from` rows whose
    * key vanished from the changed buckets (keys never move buckets —
    * the bucket is a pure hash of the key — so a key absent from its
    * own bucket is absent from the table).
    */
  def changes(spark: SparkSession, path: String, fromVersion: Int,
              toVersion: Int): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val (keys, _, _) = meta(path)
    val mFrom = manifest(path, fromVersion)
    val mTo = manifest(path, toVersion)
    // changed in EITHER direction — a bucket missing from mTo was
    // entirely deleted, a bucket missing from mFrom is entirely new
    val changed = (mFrom.keySet ++ mTo.keySet).filter(b => mFrom.get(b) != mTo.get(b))
    val newDirs = changed.toSeq.flatMap(mTo.get).map(d => s"$path/$d")
    val oldDirs = changed.toSeq.flatMap(mFrom.get).map(d => s"$path/$d")
    def rd(dirs: Seq[String]) =
      spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    def sortedCols(df: DataFrame) = df.columns.sorted.map(col).toSeq
    if (newDirs.isEmpty && oldDirs.isEmpty) {
      val snap = read(spark, path, toVersion)
      snap.select(sortedCols(snap): _*).limit(0).withColumn("_deleted", lit(false))
    } else if (oldDirs.isEmpty) {
      val n = rd(newDirs)
      n.select(sortedCols(n): _*).withColumn("_deleted", lit(false))
    } else if (newDirs.isEmpty) {
      val o = rd(oldDirs)
      o.select(sortedCols(o): _*).withColumn("_deleted", lit(true))
    } else {
      // schema may have evolved between the versions — align both sides
      // (padding with typed nulls) so the full-row EXCEPT is well-typed
      val (n2, o2) = alignSchemas(rd(newDirs), rd(oldDirs))
      val cols = sortedCols(n2)
      val upserts = n2.select(cols: _*).exceptAll(o2.select(cols: _*))
        .withColumn("_deleted", lit(false))
      val deletes = o2.select(cols: _*)
        .join(n2.select(keys.map(col): _*).distinct(), keys, "left_anti")
        .withColumn("_deleted", lit(true))
      upserts.unionByName(deletes)
    }
  }

  /** Roll the table back to `version`: commit a NEW head whose manifest
    * is a copy of the old one (Hudi's savepoint/restore, Delta's
    * RESTORE). Nothing is rewritten — the new manifest points at the
    * old version's files, which COW never mutated — so restore is an
    * O(manifest) metadata operation at any table size. History after
    * the restored version stays readable (time travel) until vacuumed;
    * the restore itself goes through the same optimistic-commit lock as
    * any writer, and [[changes]] across the restore correctly reports
    * the rolled-back rows (upserts undone → old images reappear as
    * updates; inserts undone → `_deleted`).
    */
  def restoreTo(path: String, version: Int): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    require(version >= 0 && version <= v, s"version $version out of range [0, $v]")
    if (version == v) return
    // carry the restored snapshot's bucket count: its dirs ARE that
    // layout, so writers on top of the restore must bucket by it
    val (_, defaultBuckets, _) = meta(path)
    val header = s"#nbuckets=${bucketsAt(path, version, defaultBuckets)}\n"
    val lines = header + (manifest(path, version).toSeq.sortBy(_._1))
      .map { case (b, d) => s"$b\t$d" }.mkString("\n")
    if (!MetaIO.putIfAbsent(manifestPath(path, v + 1), lines))
      throw new java.util.ConcurrentModificationException(
        s"concurrent writer committed v${v + 1} first at $path; re-read and retry the restore")
    // atomic swap: the marker appears WITH its content — a concurrent
    // commitLog never reads a created-but-unwritten (empty) marker
    MetaIO.replaceString(commitMarker(path, v + 1), System.currentTimeMillis().toString)
  }

  /** Drop snapshots older than the last `keepVersions`: delete data
    * dirs no surviving manifest references, plus their manifests.
    * Time travel past the horizon is gone (standard lakehouse vacuum
    * semantics); the commit markers keep their full history for audit.
    * Long-lived tables need this — bucket-level COW leaks one dir per
    * touched bucket per commit otherwise.
    *
    * A dir referenced by NO manifest at all is either an aborted
    * writer's leftovers or an IN-FLIGHT write racing this vacuum
    * (writeVersion writes data before it commits the manifest).
    * Deleting the latter would corrupt the version that writer then
    * commits, so never-referenced dirs are reclaimed only after
    * `orphanGraceMs` of inactivity — the same grace-period discipline
    * Delta's VACUUM retention check and Hudi's cleaner apply.
    * Committed-but-expired dirs (referenced by a manifest outside the
    * keep horizon) are deleted immediately: their writer is done by
    * definition.
    */
  def vacuum(path: String, keepVersions: Int = 1,
             orphanGraceMs: Long = 24L * 3600 * 1000): Unit = {
    require(keepVersions >= 1, "must keep at least the current version")
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val keep = (math.max(0, v - keepVersions + 1) to v).toSeq
    val referenced = keep.flatMap(manifest(path, _).values).toSet
    // every dir ANY surviving manifest file references (incl. those
    // past the horizon): membership distinguishes expired-committed
    // dirs (safe to drop now) from never-committed ones (grace-guarded)
    val referencedAny = MetaIO.list(new Path(path, "manifests"))
      .map(_.getPath.getName)
      .collect { case VersionFile(n) => n.toInt }
      .flatMap(m => manifest(path, m).values).toSet
    val now = System.currentTimeMillis()
    MetaIO.list(new Path(path, "data")).filter(_.isDirectory).foreach { vDir =>
      val vName = vDir.getPath.getName
      MetaIO.list(vDir.getPath)
        .filter(_.getPath.getName.startsWith(s"$BUCKET="))
        .foreach { bDir =>
          val rel = s"data/$vName/${bDir.getPath.getName}"
          if (!referenced(rel) &&
              (referencedAny(rel) || now - bDir.getModificationTime > orphanGraceMs))
            MetaIO.delete(bDir.getPath)
        }
      // nothing referenced left in this attempt dir → reclaim it whole
      // (removes the _SUCCESS marker and any stray committer files too).
      // Grace-guarded as well: a JUST-STARTED writer's attempt dir holds
      // only _temporary staging — no bucket dirs yet — and must survive
      if (!MetaIO.list(vDir.getPath).exists(_.getPath.getName.startsWith(s"$BUCKET=")) &&
          now - vDir.getModificationTime > orphanGraceMs)
        MetaIO.delete(vDir.getPath)
    }
    (0 until keep.head).foreach(old => MetaIO.delete(manifestPath(path, old)))
  }

  /** Write snapshot v: data dir → manifest → commit marker.
    *
    * Optimistic concurrency control: the manifest for v is created with
    * put-if-absent ([[MetaIO.putIfAbsent]]), so of two writers that
    * both read version v−1 and race to commit v, exactly one wins; the
    * loser throws ConcurrentModificationException WITHOUT touching any
    * shared state (its data dir carries a unique suffix, so it never
    * clobbers the winner's files, and vacuum reclaims the orphan). This
    * is the same manifest-level atomic-rename/put-if-absent protocol
    * the lakehouse formats use; the caller retries the upsert against
    * the new head.
    */
  private def writeVersion(df: DataFrame, path: String, keyCols: Seq[String],
                           nbuckets: Int, v: Int, carryOver: Map[Int, String],
                           sortWithin: Seq[String] = Nil): Unit = {
    // unique per-attempt dir: racing writers must not share a data path
    val dataRel = s"data/v$v-${java.util.UUID.randomUUID.toString.take(8)}"
    val bucketed = df.withColumn(BUCKET, bucketCol(keyCols, nbuckets))
    // sortWithin: transient cluster-sort columns (e.g. compact's
    // z-value) — each task's rows arrive sorted by (bucket, sortCols),
    // which satisfies the writer's required partition-column ordering,
    // so NO re-sort happens inside the write and the cluster order
    // reaches the parquet file; the transient columns are projected
    // away (projection preserves per-partition row order)
    val prepared =
      if (sortWithin.isEmpty) bucketed
      else bucketed.repartition(nbuckets, col(BUCKET))
        .sortWithinPartitions((BUCKET +: sortWithin).map(col): _*)
        .drop(sortWithin: _*)
    prepared.write.mode(SaveMode.Overwrite).partitionBy(BUCKET)
      .parquet(s"$path/$dataRel")
    // manifest = freshly written bucket dirs + carried-over references
    var written = MetaIO.list(new Path(path, dataRel))
      .map(_.getPath.getName).filter(_.startsWith(s"$BUCKET="))
      .map(d => d.stripPrefix(s"$BUCKET=").toInt -> s"$dataRel/$d").toMap
    if (written.isEmpty && carryOver.isEmpty) {
      // empty snapshot (e.g. a delete removed every row): partitionBy
      // emits no dirs for zero rows, but the table must stay readable
      // with its schema — write one empty, schema-bearing bucket file.
      // Taken from `prepared` (minus the bucket column), not `df`: the
      // sortWithin path's transient cluster-sort columns must not leak
      // into the table schema through this fallback.
      prepared.drop(BUCKET).limit(0)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$dataRel/$BUCKET=0")
      written = Map(0 -> s"$dataRel/$BUCKET=0")
    }
    val lines = s"#nbuckets=$nbuckets\n" + (carryOver ++ written).toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b\t$d" }.mkString("\n")
    // put-if-absent = the commit lock: first manifest for v wins
    if (!MetaIO.putIfAbsent(manifestPath(path, v), lines))
      throw new java.util.ConcurrentModificationException(
        s"concurrent writer committed v$v first at $path; re-read and retry the upsert")
    // marker last: readers only see fully-written manifests; the commit
    // time enables wall-clock time travel (readAsOf). Atomic swap, so a
    // concurrent commitLog never sees a created-but-empty marker.
    MetaIO.replaceString(commitMarker(path, v), System.currentTimeMillis().toString)
  }
}
