package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64L * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Queries that cache intermediates (ML feature frames, GraphX vertex/
    // edge RDDs) must not bleed memory pressure into later queries: drop
    // all cached state between runs.
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // (Measured: an explicit System.gc() here costs ~30s across the run
      // and does not improve the high-variance outliers — don't add one.)
    }
    // Unmeasured warmup pass (SPARK_GRAFT_WARMUP=0 disables): each query's
    // generated code is unique, so first execution pays catalyst analysis +
    // codegen + C2 compilation (measured 3-8× the steady state). A service
    // answers queries warm; measure that.
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0")
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
        clearCaches()
      }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      clearCaches()
      // A failed query reports -1, never a normal-looking elapsed time.
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
