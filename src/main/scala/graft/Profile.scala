package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup LSH bench hogs (temporary). Mirrors the
  * CURRENT Dedup stages (materialized token arrays), so stage times add up
  * to the real pipeline cost. */
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

    // --- current Dedup stages, replicated ---------------------------------
    def shinglesOf(ws: Column): Column =
      graft.functions.StringFunctions.word_shingles(ws, 3)

    def withShingles(df: DataFrame): DataFrame =
      df.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), shinglesOf(col("ws")).as("sh"))

    val d = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val ws = col("ws")
    val truncLen = floor((size(ws) * lit(9)).cast("double") / lit(10.0)).cast("int")
    val withNear = d.unionAll(d.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), truncLen)).as("text")))

    time("withNearDups")(withNear.count())
    val shingled = withShingles(withNear)
    time("shingle arrays")(shingled.count())
    val bands = shingled.select(col("doc_id"),
      graft.functions.SketchScalarFunctions
        .minhash_bands_of(col("sh"), 64, 16).as("bands"))
    time("scalar minhash bands")(bands.count())
    val banded = bands.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band", "bandHash")))
    time("banded rows (no persist)")(banded.count())
    time("full minhashLsh")(graft.operators.Dedup.minhashLsh(spark, sfDir).count())
    spark.catalog.clearCache()
    time("full minhashLsh (cache cleared)")(
      graft.operators.Dedup.minhashLsh(spark, sfDir).count())

    // --- simhash stages ----------------------------------------------------
    val sbands = shingled.select(col("doc_id"),
      graft.functions.SketchScalarFunctions.simhash_bands_of(col("sh")).as("b4"))
    time("scalar simhash bands")(sbands.count())
    time("full simhash")(graft.operators.Dedup.simhashPairs(spark, sfDir).count())
    spark.catalog.clearCache()
    time("full simhash (cache cleared)")(
      graft.operators.Dedup.simhashPairs(spark, sfDir).count())

    // --- cluster assignment ------------------------------------------------
    time("full clusterAssign")(
      graft.operators.Dedup.clusterAssign(spark, sfDir).count())
    spark.catalog.clearCache()
    time("full clusterAssign (cache cleared)")(
      graft.operators.Dedup.clusterAssign(spark, sfDir).count())

    spark.stop()
  }
}
