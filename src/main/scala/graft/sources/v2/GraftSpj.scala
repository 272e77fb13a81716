package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GraftTable

/** STORAGE-PARTITIONED JOINS for GraftTable — the DSv2 read path that
  * teaches Spark the table's physical bucketing, so two tables
  * co-bucketed on their record keys JOIN WITH ZERO SHUFFLE (Spark's
  * SPJ machinery, the same contract Iceberg's bucket transform uses):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  *   spark.table("graft.`/data/orders`")
  *     .join(spark.table("graft.`/data/returns`"), "o_orderkey")
  *   // == SortMergeJoin over per-bucket partitions, NO Exchange
  * }}}
  *
  * Why this matters at 100 TB: the shuffle of a fact ⋈ fact join IS
  * the dominant cost; both tables already live hash-bucketed on the
  * join key (GraftTable's write layout), and this scan surfaces that
  * layout as a [[KeyGroupedPartitioning]] over the `bucket(n, keys…)`
  * transform — one input partition per bucket, `partitionKey` = the
  * bucket id — so Catalyst aligns bucket i with bucket i instead of
  * re-hashing 100 TB. The bucket function the catalog exports
  * evaluates the IDENTICAL `pmod(xxhash64(keys), n)` expression the
  * write path places rows with ([[Bridge.bucketExprEval]]).
  *
  * Scope, stated loudly: batch READ of the head snapshot (or a
  * `VERSION AS OF` / `TIMESTAMP AS OF` pinned one), and
  * only while NO MOR log is outstanding — deltas/DVs change row
  * visibility in ways a per-bucket file scan must merge, so the scan
  * REFUSES (compact first, or read through [[GraftTable.read]], which
  * handles the full log). Writes keep going through the GraftTable
  * API. Column pruning is pushed into the parquet read; rows are
  * decoded by Spark's own `ParquetFileFormat` reader closure — the
  * exact machinery FileSourceScanExec ships to executors.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString("/")

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (GraftTable.latestVersion(path) < 0)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftV2Table(path)
  }

  /** SQL time travel — `SELECT … FROM graft.`path` VERSION AS OF 3`:
    * pins the named commit version, the same snapshot
    * `GraftTable.read(spark, path, 3)` (and the `graft_table` TVF)
    * serves. The pinned table is read-only: DML against the past
    * refuses loudly.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    val v = version.toIntOption.getOrElse(throw new IllegalArgumentException(
      s"graft VERSION AS OF takes an integer commit version, got '$version'"))
    val committed = GraftTable.commitLog(path).map(_._1)
    if (!committed.contains(v))
      throw new IllegalArgumentException(
        s"$path has no committed version $v (committed: ${committed.mkString(", ")})")
    new GraftV2Table(path, pinned = Some(v))
  }

  /** `TIMESTAMP AS OF` — Spark hands the instant in MICROseconds; the
    * snapshot is the last commit at or before it ([[GraftTable
    * .readAsOf]]'s wall-clock rule, against the commit markers'
    * recorded times).
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = pathOf(ident)
    val tsMillis = Math.floorDiv(timestampMicros, 1000L)
    val eligible = GraftTable.commitLog(path).filter(_._2 <= tsMillis)
    if (eligible.isEmpty)
      throw new IllegalArgumentException(
        s"$path has no commit at or before epoch-millis $tsMillis " +
          s"(earliest: ${GraftTable.commitLog(path).headOption.map(_._2).getOrElse(-1L)})")
    new GraftV2Table(path, pinned = Some(eligible.last._1))
  }

  override def tableExists(ident: Identifier): Boolean =
    GraftTable.latestVersion(pathOf(ident)) >= 0

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty // path-addressed catalog: enumeration is not meaningful

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are created through GraftTable.create (bucketed, versioned)")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("use the GraftTable API")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("use the GraftTable API")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("use the GraftTable API")

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

/** The catalog's `bucket(n, keys…)` — bound per key-type signature;
  * `canonicalName` is what SPJ compares across the two join sides to
  * prove the layouts agree.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, keys...): graft's pmod(xxhash64(keys), n) placement hash"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2 &&
      inputType.fields.head.dataType == IntegerType,
      s"bucket(n, keys...): got ${inputType.catalogString}")
    new BoundBucket(inputType.fields.drop(1).map(_.dataType).toSeq)
  }
}

class BoundBucket(keyTypes: Seq[DataType]) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = (IntegerType +: keyTypes).toArray
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  /** Key TYPES are part of the identity: the placement hash is
    * xxhash64 over the key's Catalyst representation, so `bucket` over
    * an int key and over a long key send the same VALUE to different
    * buckets. Two join sides may only be deemed layout-compatible when
    * their canonical names — types included — agree (Iceberg encodes
    * the SQL type into its transform canonicalName for the same
    * reason); a type-blind name would let SPJ align bucket i with a
    * bucket i holding DIFFERENT key values and silently drop matches.
    */
  override def canonicalName(): String =
    s"graft.bucket(${keyTypes.map(_.catalogString).mkString(",")})"
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val row = InternalRow.fromSeq(
      keyTypes.indices.map(i => input.get(i + 1, keyTypes(i))))
    BoundBucket.evaluator(keyTypes, n)(row)
  }
}

object BoundBucket {
  /** One evaluator construction per (keyTypes, n) — `produceResult` may
    * be mapped over ROWS (e.g. partially-clustered SPJ evaluating the
    * transform on data), and rebuilding the BoundReference/XxHash64/
    * Pmod tree per call would pay object construction per row. n is a
    * query constant, so the map stays tiny.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Seq[DataType], Int), InternalRow => Int]()
  private[v2] def evaluator(keyTypes: Seq[DataType], n: Int): InternalRow => Int =
    cache.computeIfAbsent((keyTypes, n),
      { case (kt, nb) => Bridge.bucketExprEval(kt, nb) })
}

class GraftV2Table(val path: String, val pinned: Option[Int] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  private[v2] val snapVersion = pinned.getOrElse(GraftTable.latestVersion(path))
  private def refuseTimeTravelWrite(): Unit = pinned.foreach { v =>
    throw new UnsupportedOperationException(
      s"$path VERSION AS OF $v is a read-only historical snapshot — " +
        "writes/DML go to the head table (use restoreTo to make a version current)")
  }
  private[v2] val tableSchema: StructType =
    GraftTable.snapshotSchema(path, snapVersion).getOrElse(
      throw new IllegalStateException(
        s"$path: no recorded snapshot schema (legacy manifest) — " +
          "read via GraftTable.read, or commit once to upgrade"))
  private[v2] val keys: Seq[String] = GraftTable.keyColumns(path)
  private[v2] val nbuckets: Int =
    GraftTable.manifestBuckets(path, snapVersion).getOrElse(16)

  /** Bucket count REPORTED to Spark — `spark.sql.graft.spj.coalesceBuckets=m`
    * lets a table bucketed at a MULTIPLE of m present the m-bucket
    * layout by merging dir groups, which makes SPJ work across bucket-
    * count evolution (after `rebucket` doubles one side of a join pair,
    * n and 2n layouts are incompatible to Spark's key-grouped matcher,
    * so the join would pay a FULL shuffle). Exactness: placement is
    * `pmod(xxhash64(k), n)`, and `pmod(h, c·m) ≡ pmod(h, m) (mod m)` —
    * every row in physical bucket b belongs to coalesced bucket
    * `b mod m` under the m-bucket hash, bit-for-bit. A table whose
    * count m does not divide keeps its natural layout (the join then
    * shuffles — correct, just not aligned; check `.explain`).
    */
  private[v2] val reportedBuckets: Int =
    SparkSession.active.conf.getOption("spark.sql.graft.spj.coalesceBuckets")
      .flatMap(_.toIntOption)
      .filter(m => m >= 1 && nbuckets % m == 0)
      .getOrElse(nbuckets)

  override def name(): String = s"graft.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(reportedBuckets, keys: _*))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path, snapVersion, tableSchema, keys, nbuckets,
      reportedBuckets)

  /** `INSERT INTO graft.`path`` — V1Write fallback routing the batch
    * into the table's KEYED UPSERT (last-wins on the record key, the
    * table's one write semantic; constraints, stats, OCC all apply).
    * INSERT OVERWRITE refuses: truncate-and-replace has no keyed
    * meaning here.
    */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    refuseTimeTravelWrite()
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
            (df: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              if (overwrite) throw new UnsupportedOperationException(
                "INSERT OVERWRITE is not supported: graft writes are keyed upserts " +
                  "(use deleteWhere + insert, or the GraftTable API)")
              GraftTable.upsertRetry(df.sparkSession, path, df)
            }
        }
    }
  }

  /** `DELETE FROM graft.`path` WHERE …` — Spark hands the condition as
    * DSv1 filters (only when FULLY translatable; otherwise the command
    * itself fails, never a partial delete); they convert to one Column
    * and run through the stats-pruned touched-bucket COW delete.
    */
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    refuseTimeTravelWrite()
    val cond = filters.map(GraftV2Table.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    GraftTable.deleteWhereRetry(SparkSession.active, path, cond)
    ()
  }
}

object GraftV2Table {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.{sources => f}

  /** DSv1 Filter → Column (the delete path's condition rebuild).
    * Unknown filter types fail LOUDLY — deleting with a silently
    * dropped conjunct would delete the wrong rows.
    */
  private[v2] def filterToColumn(flt: f.Filter): Column = flt match {
    case f.EqualTo(a, v) => col(a) === lit(v)
    case f.EqualNullSafe(a, v) => col(a) <=> lit(v)
    case f.GreaterThan(a, v) => col(a) > lit(v)
    case f.GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case f.LessThan(a, v) => col(a) < lit(v)
    case f.LessThanOrEqual(a, v) => col(a) <= lit(v)
    case f.In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
    case f.IsNull(a) => col(a).isNull
    case f.IsNotNull(a) => col(a).isNotNull
    case f.StringStartsWith(a, v) => col(a).startsWith(v)
    case f.StringEndsWith(a, v) => col(a).endsWith(v)
    case f.StringContains(a, v) => col(a).contains(v)
    case f.And(l, r) => filterToColumn(l) && filterToColumn(r)
    case f.Or(l, r) => filterToColumn(l) || filterToColumn(r)
    case f.Not(c) => not(filterToColumn(c))
    case f.AlwaysTrue() => lit(true)
    case f.AlwaysFalse() => lit(false)
    case other => throw new UnsupportedOperationException(
      s"DELETE condition filter $other has no column form — " +
        "use GraftTable.deleteWhere with an explicit Column")
  }
}

class GraftScanBuilder(path: String, version: Int, full: StructType,
                       keys: Seq[String], nbuckets: Int,
                       reportedBuckets: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Filters are USED (stats-segment file skipping inside each bucket
    * partition + parquet row-group pruning in the reader) but not
    * GUARANTEED — every filter is returned as residual, so Spark
    * re-applies it post-scan and conservative skipping stays safe.
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan =
    new GraftScan(path, version, full, required, keys, nbuckets, pushed.toSeq,
      reportedBuckets)
}

class GraftScan(path: String, version: Int, dataSchema: StructType,
                requiredSchema: StructType, keys: Seq[String], nbuckets: Int,
                filters: Seq[org.apache.spark.sql.sources.Filter] = Nil,
                reportedBuckets0: Int = -1)
    extends Scan with Batch with SupportsReportPartitioning {
  // -1 (direct construction in tests) = report the physical layout
  private val reportedBuckets =
    if (reportedBuckets0 > 0) reportedBuckets0 else nbuckets

  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan($path v$version, ${nbuckets}-bucketed on ${keys.mkString(",")}" +
      (if (reportedBuckets != nbuckets) s", coalesced to $reportedBuckets" else "") +
      (if (filters.nonEmpty) s", pushed: [${filters.mkString(", ")}]" else "") + ")"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(reportedBuckets, keys: _*)), reportedBuckets)

  override def planInputPartitions(): Array[InputPartition] = {
    // MOR log entries change row visibility beyond the bucket files —
    // refuse rather than silently return stale rows (loud-or-safe)
    if (GraftTable.dvEntries(path, version).nonEmpty ||
        GraftTable.deltaEntries(path, version).nonEmpty)
      throw new IllegalStateException(
        s"$path has outstanding MOR log entries (deltas/deletion vectors): " +
          "the storage-partitioned scan reads bucket files directly and cannot " +
          "merge the log. GraftTable.compact(...) first, or read via GraftTable.read")
    val dirs = GraftTable.manifest(path, version)
    // pushed filters skip whole files from the stats segments alone —
    // the same may-match metadata pruning the DSv1 paths use, kept
    // INSIDE the bucket structure (None = no stats, keep everything)
    val keep = GraftTable.fileKeepPredicate(path, version, filters)
      .getOrElse((_: String) => true)
    // Planning is METADATA-ONLY for stats-bearing snapshots: the
    // manifest's per-file stats lines name every (file, byte-length) in
    // each dir, so the file list comes straight from them — zero
    // driver-side filesystem listing per query (at 100 TB file counts
    // a per-bucket LIST per query is the planning bottleneck; on
    // object stores it's a LIST storm). A dir with no stats coverage
    // (legacy write, failed stats job, or pre-byte-length lines) falls
    // back to listing JUST that dir — never a wrong file list. Files
    // with zero rows carry no stats line and are correctly absent.
    val stats = GraftTable.manifestFileStats(path, version)
    // EVERY reported bucket id gets a partition (possibly file-less),
    // so the two sides of a join always expose identical partition-
    // value sets. Coalesced layouts (reportedBuckets < nbuckets) merge
    // the physical dirs whose id ≡ p (mod reportedBuckets) — exact by
    // the pmod nesting property (see GraftV2Table.reportedBuckets).
    (0 until reportedBuckets).map { p =>
      val physical = (p until nbuckets by reportedBuckets)
      val files = physical.flatMap(b => dirs.get(b).toSeq).flatMap { rel =>
        val covered = stats.collect {
          case (f, st) if f.startsWith(rel + "/") => (f, st.bytes)
        }.toSeq
        if (covered.nonEmpty && covered.forall(_._2 >= 0L))
          covered.filter { case (f, _) => keep(f) }
            .map { case (f, len) => (s"$path/$f", len) }
            .sortBy(_._1)
        else
          GraftTable.MetaIO.list(new Path(s"$path/$rel"))
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
            .filter(f => keep(s"$rel/${f.getPath.getName}"))
            .map(f => (f.getPath.toString, f.getLen))
      }
      GraftInputPartition(p, files.toArray): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    // filters reach the parquet reader too → row-group pruning
    GraftReaderFactory(
      Bridge.parquetReaderFactory(spark, dataSchema, requiredSchema, filters))
  }
}

final case class GraftInputPartition(bucket: Int, files: Array[(String, Long)])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

final case class GraftReaderFactory(
    readFile: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new PartitionReader[InternalRow] {
      // the parquet closure may yield ColumnarBatch disguised as
      // InternalRow (FileScanRDD's contract) — unwrap both shapes
      private val it: Iterator[InternalRow] = p.files.iterator
        .flatMap { case (f, len) => readFile(Bridge.partitionedFile(f, len)) }
        .asInstanceOf[Iterator[Any]]
        .flatMap {
          case b: org.apache.spark.sql.vectorized.ColumnarBatch => b.rowIterator().asScala
          case r: InternalRow => Iterator.single(r)
        }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
