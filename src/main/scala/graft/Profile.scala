package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 14: `dedup_semantic` showed the steepest non-ANN 10×
  * wall ratio of the round-13 full-registry session (8.4× on 10× rows —
  * sub-quadratic but worth decomposing before it compounds). The query
  * is two stages: LSH-bucketed near-dup PAIR GENERATION
  * ([[graft.operators.Similarity.nearDupLshProd]] — bucket join, PQ
  * prefilter, exact confirm) followed by CONNECTED COMPONENTS over the
  * pair set (driver union-find under `spark.graft.cc.driverMaxPairs` =
  * 2²⁰ pairs, distributed min-label propagation past it). Protocol, at
  * 1× (sf0.1) and at the 10× corpus (args: <sfDir> <scaledDir>):
  *   - time the pair stage alone (nearDupLshProd.count) and record the
  *     PAIR COUNT — which side of the union-find threshold the corpus
  *     actually sits on at each scale;
  *   - time the full query under the default conf (driver union-find
  *     engaged if pairs ≤ 2²⁰) and again with
  *     `spark.graft.cc.driverMaxPairs=0` (forced distributed loop) —
  *     the difference to the pair stage isolates each CC strategy's
  *     cost, and comparing the two answers whether the threshold is
  *     pinned where the measurement says it should be.
  * Each point min-of-2, cache cleared per run (the bench discipline).
  * Round-9 JIT-ramp protocol (dedup_simhash) retired with its finding —
  * see git history. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val scaledDir = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopKPlanning.register(spark)

    def time(name: String)(f: => Long): (Double, Long) = {
      val runs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, n) = runs.minBy(_._1)
      println(f"PROFILE $name: $sec%.2f s (rows=$n)")
      (sec, n)
    }

    graft.sources.Tables.region(spark, sfDir).count() // JVM/codegen warmup

    for ((dir, label) <- Seq(sfDir -> "1x") ++
        scaledDir.map(_ -> "10x").toSeq) {
      println(s"--- $label ($dir) ---")
      val nVec = graft.sources.Tables.embeddings(spark, dir).count()
      // the timing run already computed the pair count — at the scaled
      // point the pair stage IS the expensive part, so never pay a
      // third full run just to re-read a number time() had in hand
      val (tPairs, pairCount) = time(s"$label pairs (nearDupLshProd)")(
        graft.operators.Similarity.nearDupLshProd(spark, dir).count())
      val (tDefault, _) = time(s"$label semantic_dedup (default cc)")(
        graft.operators.Similarity.semanticDedupProd(spark, dir).count())
      spark.conf.set("spark.graft.cc.driverMaxPairs", "0")
      val (tDist, _) =
        try time(s"$label semantic_dedup (forced distributed cc)")(
          graft.operators.Similarity.semanticDedupProd(spark, dir).count())
        finally spark.conf.unset("spark.graft.cc.driverMaxPairs")
      println(f"PROFILE $label summary: n=$nVec pairs=$pairCount " +
        f"(threshold=${1L << 20}) pair_stage=$tPairs%.2f s " +
        f"cc_driver≈${tDefault - tPairs}%.2f s " +
        f"cc_distributed≈${tDist - tPairs}%.2f s")
    }
    spark.stop()
  }
}
