package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.SimilarityOps

/** Scratch diagnostic: measured recall@k of the ANN probes against the
  * exact ranking, per scale factor — the numbers behind
  * `SimilarityOps.RecallFloor`. Usage: runMain graft.tools.RecallProbe [sfDir ...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- sfs) {
      val exact = SimilarityOps.cosineTopK(spark, sf).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      def recall(ids: Array[Long]): Double = ids.count(exact).toDouble / exact.size
      val lsh = SimilarityOps.annTopK(spark, sf).select("vec_id").collect().map(_.getLong(0))
      val ivf = SimilarityOps.ivfTopK(spark, sf).select("vec_id").collect().map(_.getLong(0))
      println(f"[recall] $sf lsh=${recall(lsh)}%.2f ivf=${recall(ivf)}%.2f")
    }
    spark.stop()
  }
}
