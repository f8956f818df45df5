package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup_minhash_lsh bench hog (temporary). */
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
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    // warmup
    graft.sources.Tables.region(spark, sfDir).count()

    if (args.contains("--ab")) {
      val d = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val toksInline = split(col("text"), " ")
      def shOf(ws: org.apache.spark.sql.Column) = when(size(ws) >= 3,
        array_distinct(
          transform(sequence(lit(1), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2)))))
        .otherwise(typedlit(Seq.empty[String]))
      val inline = d.select(col("doc_id"), explode(shOf(toksInline)).as("sh"))
      val mat = d.select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(shOf(col("ws"))).as("sh"))
      // warm both paths once, then time
      inline.count(); mat.count()
      time("A inline explode")(inline.count())
      time("B materialized explode")(mat.count())
      time("A inline explode 2")(inline.count())
      time("B materialized explode 2")(mat.count())
      println("=== inline plan ===")
      inline.explain("formatted")
      println("=== materialized plan ===")
      mat.explain("formatted")
      spark.stop()
      return
    }

    if (args.contains("--cold")) {
      time("COLD full minhashLsh")(graft.operators.Dedup.minhashLsh(spark, sfDir).count())
      time("COLD full simhash")(graft.operators.Dedup.simhashPairs(spark, sfDir).count())
      time("WARM full minhashLsh")(graft.operators.Dedup.minhashLsh(spark, sfDir).count())
      spark.stop()
      return
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
    time("documents.count")(docs.count())

    val toks = split(col("text"), " ")
    val shingles = when(size(toks) >= 3,
      array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))))
      .otherwise(typedlit(Seq.empty[String]))

    val d = docs.select(col("doc_id"), col("text"))
    val withNear = d.unionAll(d.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1),
          floor((size(toks) * lit(9)).cast("double") / lit(10.0)).cast("int"))).as("text")))

    time("withNearDups.count")(withNear.count())
    time("explode shingles count")(
      withNear.select(col("doc_id"), explode(shingles).as("sh")).count())
    time("explode+xxhash64 count")(
      withNear.select(col("doc_id"), explode(shingles).as("sh"))
        .withColumn("h", xxhash64(col("sh"))).count())

    val sigs = withNear.select(col("doc_id"), explode(shingles).as("sh"))
      .withColumn("h", xxhash64(col("sh")))
      .groupBy(col("doc_id"))
      .agg(graft.functions.SketchFunctions.minhash_sketch(col("h"), 64).as("sig"))
    time("sigs (sketch agg) count")(sigs.count())
    time("sigs again (no cache) count")(sigs.count())

    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until 16).map(b =>
        xxhash64(lit(b), slice(col("sig"), b * 4 + 1, 4))): _*))
      .as(Seq("band", "bandHash")))
    time("bands count")(bands.count())

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bandHash") === col("y.bandHash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    time("cand count")(cand.count())

    time("full minhashLsh")(graft.operators.Dedup.minhashLsh(spark, sfDir).count())
    time("full simhash")(graft.operators.Dedup.simhashPairs(spark, sfDir).count())

    spark.stop()
  }
}
