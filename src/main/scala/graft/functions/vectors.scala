package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{Bridge => ExpressionUtils}

/** Column-API surface for the vector kernels — the Spark-side analog of
  * the distance metrics the reference exposes through
  * `hudi_vector_search(..., 'cosine' | 'l2' | 'dot')`.
  */
object vectors {
  private def lift2(f: (org.apache.spark.sql.catalyst.expressions.Expression,
                        org.apache.spark.sql.catalyst.expressions.Expression) =>
                       org.apache.spark.sql.catalyst.expressions.Expression)
                   (a: Column, b: Column): Column =
    ExpressionUtils.column(f(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Cosine similarity in [-1, 1]; reference's score = 1 - _distance. */
  def cosine_similarity(a: Column, b: Column): Column = lift2(CosineSimilarity.apply)(a, b)

  def dot_product(a: Column, b: Column): Column = lift2(DotProduct.apply)(a, b)

  def l2_distance(a: Column, b: Column): Column = lift2(L2Distance.apply)(a, b)

  def vector_norm(a: Column): Column =
    ExpressionUtils.column(VectorNorm(ExpressionUtils.expression(a)))

  /** 1-bit sign quantization: array<float|double> → packed array<long>
    * (bit per dimension, 32× smaller than float32 — see [[SignPack]]).
    */
  def sign_pack(a: Column): Column =
    ExpressionUtils.column(SignPack(ExpressionUtils.expression(a)))

  /** XOR+POPCNT distance over two [[sign_pack]] outputs = count of
    * sign-disagreeing dimensions.
    */
  def hamming_distance(a: Column, b: Column): Column = lift2(HammingDistance.apply)(a, b)

  /** Asymmetric sign-bit score ⟨q, sign(v)⟩: float query × packed
    * [[sign_pack]] column — 1 bit/dim scan bytes at near-dot ranking
    * fidelity (see [[AdcDot]]).
    */
  def adc_dot(query: Column, packed: Column): Column = lift2(AdcDot.apply)(query, packed)
}
