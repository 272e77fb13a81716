package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.Upsert
import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** A minimal copy-on-write versioned lakehouse table — the Spark-native
  * analog of the reference's Hudi table (demo.ipynb cell 8): record-key
  * upserts, snapshot reads, time travel. Each commit writes a full new
  * parquet snapshot dir `v<N>/` plus a tiny `_commits` log; readers pin
  * a version by reading the log head (atomic append), so concurrent
  * readers never see a half-written snapshot.
  *
  * 100 TB note: a full-snapshot COW rewrite is the same write
  * amplification Hudi COW has per touched file group; the merge itself
  * is one key shuffle (see [[Upsert.merge]]). Snapshots are plain
  * parquet, so reads get pushdown/pruning like any other scan.
  */
object GraftTable {
  private def logPath(path: String) = Paths.get(path, "_commits")

  def exists(path: String): Boolean = Files.exists(logPath(path))

  /** latest committed version, or -1 */
  def latestVersion(path: String): Int =
    if (!exists(path)) -1
    else Files.readAllLines(logPath(path)).asScala.lastOption.map(_.trim.toInt).getOrElse(-1)

  def create(df: DataFrame, path: String, keyCols: Seq[String]): Unit = {
    require(!exists(path), s"table already exists at $path")
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, "_keys"), keyCols.mkString(","))
    commit(df, path, 0)
  }

  /** Upsert = read latest snapshot, last-wins merge, commit next version. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame): Unit = {
    val v = latestVersion(path)
    require(v >= 0, s"no table at $path")
    val keys = Files.readString(Paths.get(path, "_keys")).split(",").toSeq
    val merged = Upsert.merge(read(spark, path), updates, keys)
    commit(merged, path, v + 1)
  }

  /** Snapshot read; `version` for time travel. */
  def read(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val v = if (version >= 0) version else latestVersion(path)
    require(v >= 0, s"no table at $path")
    spark.read.parquet(s"$path/v$v")
  }

  private def commit(df: DataFrame, path: String, v: Int): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/v$v")
    Files.writeString(logPath(path), s"$v\n",
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
