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
}
