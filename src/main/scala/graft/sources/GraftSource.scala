package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `format("graft")` — the DataFrame reader/writer surface of the
  * lakehouse table, mirroring how the reference ingests its table
  * (demo.ipynb cell 8: `df.write.format("hudi")` with
  * `recordkey.field`, `operation=upsert`):
  *
  * {{{
  *   df.write.format("graft").option("recordkey", "k")
  *     .mode(SaveMode.Append).save(path)          // upsert (create if new)
  *   spark.read.format("graft").load(path)        // latest snapshot
  *   spark.read.format("graft").option("version", "0").load(path)
  * }}}
  *
  * Reads go through a PrunedFilteredScan that re-applies the requested
  * columns and a translated subset of filters onto the underlying
  * snapshot DataFrame — both reach the parquet scans (column pruning +
  * PushedFilters), so `format("graft")` reads are as prunable as raw
  * parquet. Untranslated filters are simply left for Spark to apply
  * above the scan (DSv1 re-evaluates unhandled filters — correctness
  * never depends on the translation).
  */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with SchemaRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new GraftRelation(sqlContext, pathOf(parameters),
      parameters.get("version").map(_.toInt).getOrElse(-1))

  override def createRelation(sqlContext: SQLContext, parameters: Map[String, String],
                              schema: StructType): BaseRelation =
    createRelation(sqlContext, parameters) // schema is always table-defined

  /** Write path: SaveMode.Append = upsert (create on first write) —
    * the reference's `operation=upsert`; with
    * `option("operation", "delete")` the batch's key columns name rows
    * to remove (Hudi's `operation=delete`, same cell-8 API family);
    * ErrorIfExists = create-only; Ignore = create if absent. Overwrite
    * is rejected: a versioned table's "overwrite" should be an explicit
    * upsert/vacuum decision, not a silent history wipe.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    lazy val keys = parameters.getOrElse("recordkey",
        throw new IllegalArgumentException(
          "graft source requires option(\"recordkey\", \"k1[,k2…]\") to create a table"))
      .split(",").map(_.trim).toSeq
    val nbuckets = parameters.get("nbuckets").map(_.toInt).getOrElse(16)
    // Hudi's precombine.field: winner among same-key rows in one batch
    val precombine = parameters.get("precombine")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
    val operation = parameters.getOrElse("operation", "upsert")
    require(operation == "upsert" || operation == "delete",
      s"graft: unknown operation '$operation' (expected upsert or delete)")
    require(operation == "upsert" || mode == SaveMode.Append,
      "graft: operation=delete requires SaveMode.Append")
    mode match {
      case SaveMode.Append if operation == "delete" =>
        require(GraftTable.exists(path), s"graft: cannot delete from missing table $path")
        GraftTable.delete(spark, path, data)
      case SaveMode.Append =>
        if (GraftTable.exists(path)) GraftTable.upsert(spark, path, data, precombine)
        else GraftTable.create(data, path, keys, nbuckets)
      case SaveMode.ErrorIfExists =>
        GraftTable.create(data, path, keys, nbuckets)
      case SaveMode.Ignore =>
        if (!GraftTable.exists(path)) GraftTable.create(data, path, keys, nbuckets)
      case SaveMode.Overwrite =>
        throw new UnsupportedOperationException(
          "graft: Overwrite would wipe table history; upsert with mode=Append, or vacuum explicitly")
    }
    createRelation(sqlContext, parameters)
  }
}

private[sources] class GraftRelation(val sqlContext: SQLContext, path: String,
                                     version: Int)
    extends BaseRelation with PrunedFilteredScan {

  private lazy val snapshot: DataFrame =
    GraftTable.read(sqlContext.sparkSession, path, version)

  override def schema: StructType = snapshot.schema

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val filtered = filters.flatMap(translate).foldLeft(snapshot)(_.filter(_))
    val pruned =
      if (requiredColumns.isEmpty) filtered.select(col(snapshot.columns.head))
      else filtered.select(requiredColumns.map(col).toSeq: _*)
    pruned.rdd
  }

  /** best-effort Filter → Column translation; None = let Spark apply it */
  private def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === v)
    case GreaterThan(a, v)        => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v)           => Some(col(a) < v)
    case LessThanOrEqual(a, v)    => Some(col(a) <= v)
    case In(a, vs)                => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case And(l, r)                => for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case Or(l, r)                 => for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case Not(c)                   => translate(c).map(!_)
    case _                        => None
  }
}
