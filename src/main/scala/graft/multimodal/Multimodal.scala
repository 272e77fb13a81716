package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns as opaque binary + typed metadata — image/audio/
  * video payloads travel through the pipeline as `binary` with their
  * metadata in plain columns, exactly how a 100 TB training-data store
  * holds them (the decode libraries live at the edges, not the engine).
  *
  * The decode step is a DETERMINISTIC FAKE (this container has no
  * image/audio codecs): `decodeMeta` derives pseudo width/height/
  * channels from payload bytes. Everything around it — the binary
  * schema, per-partition batched iteration, the typed operator
  * signature, frame slicing — is real Spark plumbing, and is what a
  * production codec would plug into (swap `fakeDecode` for the codec
  * call; nothing else changes).
  */
object Multimodal {

  /** Wrap a text corpus as a binary-payload table: (id, payload,
    * n_bytes, content_type, sha256). This is the ingest shape for any
    * modality; here the payload is the utf-8 document bytes.
    */
  def asBinaryTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      to_binary(col(textCol), lit("utf-8")).as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("content_type", lit("application/octet-stream"))
      .withColumn("sha256", sha2(col("payload"), 256))

  final case class DecodedMeta(doc_id: Long, n_bytes: Long, width: Int,
                               height: Int, channels: Int)

  /** STUBBED decode — deterministic fake standing in for an image
    * codec. Real plumbing: typed mapPartitions so a codec could batch
    * per partition (open once, decode many), primitive-friendly row
    * shape, no driver collect.
    */
  def decodeMeta(binTable: DataFrame): DataFrame = {
    val enc = Encoders.product[DecodedMeta]
    binTable.select("doc_id", "payload").mapPartitions { it =>
      // a real implementation would initialize the codec here, once per partition
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        fakeDecode(id, bytes)
      }
    }(enc).toDF()
  }

  /** Deterministic fake: dimensions derived from payload content. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): DecodedMeta = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
    DecodedMeta(id, bytes.length.toLong, 16 + (b0 % 16) * 16, 16 + (b1 % 16) * 16, 3)
  }

  /** Per-frame feature extraction — the stubbed image/audio EMBEDDING
    * step: each frame yields a fixed-dim feature vector. The stub
    * derives deterministic features from the frame's md5 (so the
    * output is engine-neutral and oracle-checkable); a real model
    * replaces the projection while the shape — one `array` feature
    * column per frame row, computed scan-parallel with zero shuffle —
    * stays. Composes with [[frameSample]]:
    * `frameFeatures(frameSample(binTable, 32))`.
    */
  def frameFeatures(frames: DataFrame, dim: Int = 4): DataFrame = {
    val feats = (0 until dim).map { d =>
      // 8 hex chars per feature → uint32-range LONG, deterministic
      conv(substring(col("frame_md5"), d * 8 + 1, 8), 16, 10).cast("long").as(s"f$d")
    }
    frames.select(col("doc_id") +: col("frame_idx") +: feats: _*)
  }

  /** Frame/byte-range sampling: slice the payload into `stride`-byte
    * frames (posexplode — one output row per frame). For video this is
    * the frame-sample primitive; for audio, fixed-size windows. Pure
    * codegen'd expressions, parallel per input row.
    */
  def frameSample(binTable: DataFrame, stride: Int): DataFrame =
    binTable
      .select(col("doc_id"), col("payload"),
        // empty payload → zero frames (sequence(0,-1) would yield [0,-1])
        posexplode(expr(
          s"case when octet_length(payload) = 0 then array() " +
          s"else transform(sequence(0, cast(floor((octet_length(payload) - 1) / $stride) as int)), " +
          s"f -> substring(payload, f * $stride + 1, $stride)) end")).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
}
