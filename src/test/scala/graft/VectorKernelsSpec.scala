package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.vectors._

import scala.util.Random

/** The codegen distance kernels vs straightforward double-accumulation
  * references, including the DuckDB-form cosine (dot / (sqrt·sqrt))
  * the oracles rely on.
  */
class VectorKernelsSpec extends AnyFunSuite with Matchers {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(7)
  private val vecs: Seq[(Seq[Float], Seq[Float])] =
    Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() * 2 - 1), Seq.fill(64)(rnd.nextFloat() * 2 - 1)))

  private def refDot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
  private def refNorm(a: Seq[Float]): Double =
    math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
  private def refCos(a: Seq[Float], b: Seq[Float]): Double =
    refDot(a, b) / (refNorm(a) * refNorm(b))
  private def refL2(a: Seq[Float], b: Seq[Float]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum)

  private lazy val df = vecs.toDF("a", "b")
    .select(cosine_similarity($"a", $"b").as("cos"), dot_product($"a", $"b").as("dot"),
      l2_distance($"a", $"b").as("l2"), vector_norm($"a").as("na"))

  test("kernels match double-accumulation references") {
    val rows = df.collect()
    rows.zip(vecs).foreach { case (r, (a, b)) =>
      r.getDouble(0) shouldBe refCos(a, b) +- 1e-12
      r.getDouble(1) shouldBe refDot(a, b) +- 1e-12
      r.getDouble(2) shouldBe refL2(a, b) +- 1e-12
      r.getDouble(3) shouldBe refNorm(a) +- 1e-12
    }
  }

  test("null inputs propagate null, not crash") {
    val one = Seq((Some(Seq(1f, 2f)), Option.empty[Seq[Float]])).toDF("a", "b")
    one.select(cosine_similarity($"a", $"b")).collect()(0).isNullAt(0) shouldBe true
  }

  test("mismatched dimensions fail loudly on both codegen and eval paths") {
    val bad = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
    // codegen path
    val e1 = intercept[Exception] {
      bad.select(cosine_similarity($"a", $"b")).collect()
    }
    e1.getMessage should include("mismatched vector dimensions")
    // interpreted path
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val e2 = intercept[Exception] {
        bad.select(l2_distance($"a", $"b")).collect()
      }
      e2.getMessage should include("mismatched vector dimensions")
    }
  }

  test("kernels survive interpreted (non-codegen) path too") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
        .select(cosine_similarity($"a", $"b"), dot_product($"a", $"b")).collect()(0)
      r.getDouble(0) shouldBe 0.0 +- 1e-15
      r.getDouble(1) shouldBe 0.0 +- 1e-15
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
