package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 7 (late): the PQ production forms after the native
  * PqAssign expression replaced the interpreted HOF assignment. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    graft.sources.Tables.region(spark, sfDir).count()
    graft.operators.Similarity.quantizePqProd(spark, sfDir).count()

    var i = 0
    while (i < 3) {
      time("sim_quantize_pq (prod)")(
        graft.operators.Similarity.quantizePqProd(spark, sfDir).count())
      spark.catalog.clearCache()
      time("sim_ann_ivfpq (prod)")(
        graft.operators.Similarity.annIvfPqProd(spark, sfDir).count())
      spark.catalog.clearCache()
      i += 1
    }
    spark.stop()
  }
}
