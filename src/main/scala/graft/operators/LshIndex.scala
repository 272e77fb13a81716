package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.vectors._

import scala.util.Random

/** Random-hyperplane (sign) LSH for cosine ANN — the bucketed
  * alternative to [[IvfIndex]] when an unsupervised build (no KMeans
  * pass) is preferred.
  *
  * nbits fixed hyperplanes (deterministic seed) map every vector to a
  * packed long signature; rows whose signature is within `maxHamming`
  * of the query's form the candidate set, which is exactly re-ranked.
  * The signature is nbits codegen'd dot products — whole-stage-
  * compiled, no UDF. At scale the table is written bucketed/partitioned
  * by signature so a 0-radius probe is partition-pruned; the hamming
  * filter itself is a scan of one long column (bit_count(sig XOR q)),
  * ~8 bytes/row — 100 TB of 384-dim floats carries only ~50 GB of
  * signatures.
  */
object LshIndex {

  final case class Planes(planes: Array[Array[Float]]) {
    def nbits: Int = planes.length
  }

  /** Deterministic gaussian hyperplanes. */
  def fitPlanes(dim: Int, nbits: Int, seed: Long = 42L): Planes = {
    require(nbits >= 1 && nbits <= 63, "1..63 sign bits pack into a long")
    val rnd = new Random(seed)
    Planes(Array.fill(nbits, dim)(rnd.nextGaussian().toFloat))
  }

  /** Packed sign-bit signature column: bit b = [vec · plane_b ≥ 0]. */
  def signature(vec: Column, planes: Planes): Column =
    planes.planes.zipWithIndex.map { case (p, b) =>
      when(dot_product(vec, typedlit(p.toSeq)) >= 0d, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Driver-side signature of one query vector. */
  def signatureOf(query: Seq[Float], planes: Planes): Long = {
    var sig = 0L
    var b = 0
    while (b < planes.nbits) {
      val p = planes.planes(b)
      var d = 0.0; var i = 0
      while (i < p.length) { d += p(i).toDouble * query(i).toDouble; i += 1 }
      if (d >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Add the signature column (one pass; persist/write-bucketed at scale). */
  def index(data: DataFrame, vecCol: String, planes: Planes): DataFrame =
    data.withColumn("sig", signature(col(vecCol), planes))

  /** ANN top-k: hamming-ball candidate filter on the signature column,
    * exact re-rank of survivors. maxHamming trades recall for scan
    * selectivity (bucket-join at radius 0). `pred` is applied alongside
    * the hamming filter — on a signature-bucketed layout both reach the
    * scan together, so filtered probes read less, never more.
    */
  def probe(indexed: DataFrame, idCol: String, vecCol: String,
            query: Seq[Float], planes: Planes, k: Int, maxHamming: Int,
            metric: String = "cosine",
            pred: Option[Column] = None): DataFrame = {
    val qsig = signatureOf(query, planes)
    val cand = indexed.filter(bit_count(col("sig").bitwiseXOR(lit(qsig))) <= maxHamming)
    val filtered = pred.fold(cand)(cand.filter)
    VectorSearch.topK(filtered, vecCol, idCol, query, k, metric).drop("sig")
  }
}
