package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 7 (late): dedup_clusters — the slowest bench row at
  * sf0.1 — against its candidate-pair machinery alone
  * (dedup_minhash_lsh) to see what the union-find + assignment add. */
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
    graft.operators.Dedup.minhashLsh(spark, sfDir).count()
    spark.catalog.clearCache()

    var i = 0
    while (i < 3) {
      time("dedup_minhash_lsh")(
        graft.operators.Dedup.minhashLsh(spark, sfDir).count())
      spark.catalog.clearCache()
      time("dedup_clusters")(
        graft.operators.Dedup.clusterAssign(spark, sfDir).count())
      spark.catalog.clearCache()
      time("dedup_semantic")(
        graft.operators.Similarity.semanticDedup(spark, sfDir).count())
      spark.catalog.clearCache()
      i += 1
    }
    spark.stop()
  }
}
