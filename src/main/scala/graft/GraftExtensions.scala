package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, DotProduct, L2Distance, VectorNorm}

/** SQL surface for the vector kernels — the Spark-native analog of the
  * reference exposing search through SQL (`hudi_vector_search(...)`,
  * demo.ipynb cell 11). With these registered, the reference's query
  * pattern is plain Spark SQL:
  *
  * {{{
  *   SELECT vec_id, cosine_similarity(embedding, (SELECT embedding FROM q)) AS score
  *   FROM embeddings ORDER BY score DESC LIMIT 10
  * }}}
  *
  * Two entry points:
  *  - config-time: `--conf spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def binary(f: (Expression, Expression) => Expression)(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"expected 2 arguments, got ${args.length}")
    f(args(0), args(1))
  }

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      info("cosine_similarity", "cosine_similarity(a, b) - cosine similarity of two float/double arrays"),
      binary(CosineSimilarity.apply) _),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - inner product of two float/double arrays"),
      binary(DotProduct.apply) _),
    ("l2_distance",
      info("l2_distance", "l2_distance(a, b) - euclidean distance of two float/double arrays"),
      binary(L2Distance.apply) _),
    ("vector_norm",
      info("vector_norm", "vector_norm(a) - euclidean norm of a float/double array"),
      { args: Seq[Expression] =>
        require(args.length == 1, s"expected 1 argument, got ${args.length}")
        VectorNorm(args.head)
      })
  )

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
