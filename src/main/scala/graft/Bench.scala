package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query once at the tiny SF: same plan shape → janino
    // codegen-cache hits + hot JIT, so the timed runs below measure the
    // operators, not one-time compilation.
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count() }
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over reps: steady-state per-query cost, robust to one-off
      // GC/scheduling noise in a 32-thread local JVM
      val times = (1 to reps).map { _ =>
        // cache-clean per rep: operators that persist intermediates
        // must pay that cost every time, or min-of-reps lies
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        // toRdd.count() materializes every output row (a plain count()
        // would let Catalyst prune the projections being measured).
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    spark.catalog.clearCache()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
