package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus shard export — the OUTPUT stage of a curation pipeline: write
  * the released corpus as N deterministic shards plus an integrity
  * manifest a consumer (or a re-run) can verify without trusting the
  * writer. Training jobs address shards individually (per-worker
  * assignment, resumable downloads), so shard membership must be a
  * pure function of the record — not of partitioning, task order, or
  * cluster size.
  *
  * Design:
  *  - shard(id) = md5-bucket of the record key: deterministic,
  *    uniform (no hot shards whatever the id distribution), and
  *    engine-agreed — DuckDB recomputes the exact assignment, so the
  *    manifest is oracle-checkable end to end.
  *  - manifest checksum = bit_xor of a 60-bit md5 prefix of each
  *    document's text: ORDER-INDEPENDENT and mergeable, so it
  *    aggregates map-side and never needs a per-shard sort or an
  *    ordered string_agg of the whole shard (the md5-chain
  *    alternative is O(shard) driver-side state at 100 TB; xor-fold
  *    is one long per task). Any single-bit content change flips the
  *    checksum; collisions need a crafted 60-bit md5-prefix match.
  *  - the write is one shuffle on the shard id (uniform by
  *    construction) followed by parallel per-shard parquet writers;
  *    `partitionBy(shard)` makes per-shard reads partition-pruned.
  */
object ShardExport {

  /** Deterministic shard assignment: md5-bucket of the key, engine-
    * agreed (DuckDB: `CAST(('0x'||substr(md5(CAST(id AS VARCHAR)),1,8))
    * AS BIGINT) % n`).
    */
  def shardId(idCol: Column, nShards: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong))

  /** 60-bit content hash (15 md5 hex chars — stays inside a signed
    * long in both engines' hex-to-int conversion).
    */
  def contentHash60(textCol: Column): Column =
    conv(substring(md5(textCol.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded EPOCH SHUFFLE — the training-loader contract: a
    * deterministic pseudo-random permutation of the corpus, different
    * per seed, WITHOUT a global sort. Each record gets
    * `(shard, pos)`: shard = md5-bucket of `seed:id` (so reshuffling
    * an epoch re-deals shard membership too, not just order), pos =
    * the record's rank inside its shard under the same md5 key.
    *
    * Scale shape: ONE hash shuffle on the shard id (uniform by md5
    * construction — no hot shards) and a per-shard sort; a 100 TB
    * epoch shuffle never range-partitions or globally sorts anything.
    * `nShards` sizes per-shard memory: pick corpus / nShards ≈ a few
    * GB and the sort spills nowhere. Engine-agreed: DuckDB recomputes
    * the identical (shard, pos) from the same md5 arithmetic, so the
    * permutation is oracle-checkable end to end.
    */
  def epochShuffle(docs: DataFrame, idCol: String, seed: Long,
                   nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ek = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))
      .cast("binary"))
    val withKey = docs.withColumn("__ek", ek)
      .withColumn("shard",
        pmod(conv(substring(col("__ek"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
    withKey
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("__ek"), col(idCol)))
          .cast("long"))
      .drop("__ek")
  }

  /** CURRICULUM ordering (Bengio et al. 2009 applied to corpus
    * serving): the training read order goes easy→hard by a
    * difficulty band — here document LENGTH, the classic text
    * curriculum — while order WITHIN a band stays a seeded
    * pseudo-random shuffle (a band read in corpus order would correlate
    * batches with crawl layout). Same distributed shape as
    * [[epochShuffle]]: shard membership from the hash (uniform), and
    * within each shard `pos` orders by (band, hash, id) — one hash
    * shuffle + per-shard sorts, never a global sort. A loader reading
    * shards by `pos` sees each shard's documents banded easy→hard;
    * re-seeding re-deals the within-band order but never the banding.
    * All md5/integer arithmetic — the oracle replays the exact
    * permutation.
    */
  def curriculum(docs: DataFrame, idCol: String, textCol: String, seed: Long,
                 nShards: Int, bandWidth: Int = 200, maxBand: Int = 4): DataFrame = {
    require(bandWidth >= 1 && maxBand >= 1, s"bad banding: width=$bandWidth max=$maxBand")
    import org.apache.spark.sql.expressions.Window
    val ek = md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))
      .cast("binary"))
    docs
      .withColumn("band",
        least(lit(maxBand.toLong), floor(length(col(textCol)) / bandWidth).cast("long")))
      .withColumn("__ek", ek)
      .withColumn("shard",
        pmod(conv(substring(col("__ek"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .withColumn("pos",
        row_number().over(
          Window.partitionBy("shard").orderBy(col("band"), col("__ek"), col(idCol)))
          .cast("long"))
      .drop("__ek")
  }

  /** The integrity manifest: per-shard doc count, byte mass, and the
    * xor-folded content checksum. One exact aggregation, map-side
    * combinable, no ordered state.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               nShards: Int): DataFrame =
    docs
      .withColumn("shard", shardId(col(idCol), nShards))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).cast("long").as("sum_chars"),
        expr(s"bit_xor(${checksumSql(textCol)})").as("checksum"))
      .orderBy("shard")

  private def checksumSql(textCol: String): String =
    s"CAST(conv(substring(md5(CAST($textCol AS BINARY)), 1, 15), 16, 10) AS BIGINT)"

  /** Write the corpus as `nShards` partition-pruned parquet shards under
    * `path/shard=K/`, plus `_manifest.json` (one JSON line per shard,
    * shard order) recording the verification triple. Returns the
    * manifest as a DataFrame.
    */
  def export(docs: DataFrame, idCol: String, textCol: String,
             path: String, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    val sharded = docs.withColumn("shard", shardId(col(idCol), nShards))
    sharded
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val m = manifest(docs, idCol, textCol, nShards).collect()
    val json = m.map { r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
        s""""sum_chars":${r.getLong(2)},"checksum":${r.getLong(3)}}"""
    }.mkString("", "\n", "\n")
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    manifest(docs, idCol, textCol, nShards)
  }

  /** Verify an exported corpus against its manifest: recompute the
    * triple from the shard files and diff. Returns per-shard rows with
    * an `ok` flag — empty `filter(!ok)` is the acceptance check.
    */
  def verify(spark: SparkSession, path: String, idCol: String,
             textCol: String): DataFrame = {
    val data = spark.read.parquet(path)
    val recomputed = data
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs_got"),
        sum(length(col(textCol))).cast("long").as("sum_chars_got"),
        expr(s"bit_xor(${checksumSql(textCol)})").as("checksum_got"))
    val p = new org.apache.hadoop.fs.Path(path, "_manifest.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    import spark.implicits._
    val want = spark.read.json(txt.linesIterator.toSeq.toDS())
      .select(col("shard").cast("long").as("shard"),
        col("n_docs").cast("long").as("n_docs"),
        col("sum_chars").cast("long").as("sum_chars"),
        col("checksum").cast("long").as("checksum"))
    want.join(recomputed, Seq("shard"), "full_outer")
      .withColumn("ok",
        col("n_docs") === col("n_docs_got") &&
          col("sum_chars") === col("sum_chars_got") &&
          col("checksum") === col("checksum_got"))
      .orderBy("shard")
  }
}
