package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.ShardExport

/** Shard-export spec: assignment determinism/uniformity, manifest
  * exactness (xor-fold checksum vs a driver recompute), the write →
  * verify round trip, tamper detection, and per-shard partition
  * pruning on the exported layout.
  */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_shard_$tag").toString
    new java.io.File(p).deleteOnExit(); p
  }

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, s"doc number $i with body ${"x" * (i % 17)}"))
      .toDF("doc_id", "text")

  test("shard assignment is deterministic and covers 0..n-1 uniformly-ish") {
    val docs = corpus(1000)
    val counts = docs.select(ShardExport.shardId(col("doc_id"), 8).as("s"))
      .groupBy("s").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts.keySet === (0L until 8L).toSet)
    // md5 buckets: each shard within ±50% of the mean
    counts.values.foreach(c => assert(c > 62 && c < 188, counts))
    val again = docs.select(ShardExport.shardId(col("doc_id"), 8).as("s"))
      .groupBy("s").count().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts === again)
  }

  test("manifest checksum equals a driver-side xor of md5-prefix hashes") {
    val docs = corpus(200)
    val m = ShardExport.manifest(docs, "doc_id", "text", 4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val driver = docs.collect().map { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val mdId = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val shard = java.lang.Long.parseLong(mdId.take(8), 16) % 4
      val mdTx = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (shard, text.length.toLong, java.lang.Long.parseLong(mdTx.take(15), 16))
    }.groupBy(_._1).map { case (s, xs) =>
      (s, (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).reduce(_ ^ _)))
    }
    assert(m === driver)
  }

  test("export → verify round trip: every shard ok, corpus reproduced") {
    val docs = corpus(300)
    val path = tmp("rt")
    ShardExport.export(docs, "doc_id", "text", path, 4)
    val v = ShardExport.verify(spark, path, "doc_id", "text")
    assert(v.filter(!col("ok")).count() === 0)
    assert(v.count() === 4)
    val back = spark.read.parquet(path).select("doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back === docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("verify detects a tampered shard") {
    val docs = corpus(120)
    val path = tmp("tamper")
    ShardExport.export(docs, "doc_id", "text", path, 3)
    // tamper: rewrite shard 1's files with one doc's text flipped
    val s1 = spark.read.parquet(path).filter(col("shard") === 1)
    val minId = s1.agg(min("doc_id")).head().getLong(0)
    val tampered = s1.withColumn("text",
      when(col("doc_id") === minId, lit("TAMPERED")).otherwise(col("text")))
      .drop("shard").cache()
    tampered.count()
    tampered.write.mode("overwrite").parquet(s"$path/shard=1")
    val bad = ShardExport.verify(spark, path, "doc_id", "text")
      .filter(!col("ok")).collect()
    assert(bad.length === 1 && bad.head.getAs[Long]("shard") === 1L)
    tampered.unpersist()
  }

  test("reading one shard prunes the others (partition filter reaches the scan)") {
    val docs = corpus(200)
    val path = tmp("prune")
    ShardExport.export(docs, "doc_id", "text", path, 4)
    val one = spark.read.parquet(path).filter(col("shard") === 2)
    val scan = one.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("shard"), scan)
    val expect = docs.filter(ShardExport.shardId(col("doc_id"), 4) === 2).count()
    assert(one.count() === expect)
  }

  test("manifest totals add up to the corpus") {
    val docs = corpus(500)
    val m = ShardExport.manifest(docs, "doc_id", "text", 8)
    val r = m.agg(sum("n_docs"), sum("sum_chars")).head()
    val want = docs.agg(count(lit(1)), sum(length(col("text")))).head()
    assert(r.getLong(0) === want.getLong(0))
    assert(r.getLong(1) === want.getLong(1))
  }

  test("curriculum: shards read easy-to-hard; re-seeding re-deals only within bands") {
    val docs = corpus(400)
    val c1 = ShardExport.curriculum(docs, "doc_id", "text", seed = 7L, nShards = 4)
      .select("doc_id", "band", "shard", "pos").collect()
    // every document present exactly once
    assert(c1.map(_.getLong(0)).toSet.size === 400)
    // within a shard, band is NON-DECREASING in read order — the
    // curriculum contract
    c1.groupBy(_.getLong(2)).foreach { case (_, rows) =>
      val bands = rows.sortBy(_.getLong(3)).map(_.getLong(1))
      assert(bands.sameElements(bands.sorted))
    }
    val c2 = ShardExport.curriculum(docs, "doc_id", "text", seed = 8L, nShards = 4)
      .select("doc_id", "band", "shard", "pos").collect()
    // bands are seed-independent (difficulty is a property of the doc)
    val b1 = c1.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = c2.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === b2)
    // but the permutation itself re-deals
    val p1 = c1.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val p2 = c2.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(p1 !== p2)
    // and the same seed replays bit-identically
    val c1b = ShardExport.curriculum(docs, "doc_id", "text", seed = 7L, nShards = 4)
      .select("doc_id", "band", "shard", "pos").collect()
    assert(c1.map(_.toSeq).toSet === c1b.map(_.toSeq).toSet)
  }
}
