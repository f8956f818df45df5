package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 7: where does `text_decontaminate_bloom`'s ~1.8 s constant
  * go — the bloom BUILD job (test-shingle distinct + bit_or collect), the
  * 16 K-long array-literal probe, or the exact-confirm join? */
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

    // warmup
    graft.sources.Tables.region(spark, sfDir).count()
    graft.operators.TextAnalysis.decontaminateBloom(spark, sfDir).count()
    spark.catalog.clearCache()

    import graft.operators.TextAnalysis._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))

    // stage 1: test-shingle distinct (persisted in the real query)
    val sh = contaminationShingled(docs)
    val testShingles = testShinglesOf(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("1 test-shingle distinct (persist+count)")(testShingles.count())

    // stage 2: bloom bitmask build (bit_or groupBy + collect)
    var words: Array[Long] = null
    time("2 bloom build (bit_or + collect)") {
      words = bloomWordsOf(testShingles); words.length.toLong
    }

    // stage 3: probe only — native array-level bloom filter on the scan
    def probed = sh.filter(col("bucket") < 90)
      .select(col("doc_id"),
        graft.functions.SketchScalarFunctions
          .bloom_shingle_filter(col("sh"), words).as("sh_pass"))
      .select(col("doc_id"), explode(col("sh_pass")).as("sh"))
    time("3 probe only (native array bloom filter)")(probed.count())

    // stage 4: probe + exact-confirm join + agg (warm persisted shingles)
    time("4 probe+confirm+agg (warm)") {
      probed
        .join(testShingles, Seq("sh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .count()
    }
    testShingles.unpersist()
    spark.catalog.clearCache()

    // end-to-end, cold (what Bench times)
    time("5 full decontaminateBloom (cold)")(
      graft.operators.TextAnalysis.decontaminateBloom(spark, sfDir).count())
    spark.catalog.clearCache()
    time("6 full decontaminate exact (cold)")(
      graft.operators.TextAnalysis.decontaminate(spark, sfDir).count())
    spark.catalog.clearCache()
    time("7 full decontaminateBloom again (cold)")(
      graft.operators.TextAnalysis.decontaminateBloom(spark, sfDir).count())

    spark.stop()
  }
}
