package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 9: dedup_simhash regressed 0.60 → 1.61 s r7→r8 with a
  * TIGHT spread (all three bench iterations slow — not min-of-3 noise)
  * and no round-8 commits to Dedup.scala. Hypothesis, by analogy with
  * the round-8 mm_video_mjpeg finding: the bench runs alphabetically, so
  * seven other dedup-family queries execute first in the same session,
  * all funnelling through the shared shingle/hash scalar expressions —
  * the JIT profile of those shared paths degrades (megamorphic call
  * sites, deopt/recompile) before dedup_simhash ever runs. Protocol:
  * time dedup_simhash alone on a fresh JVM (iteration curve → JIT ramp
  * vs steady state), then run the alphabetically-preceding dedup family
  * once each, then time dedup_simhash again — a jump in the second set
  * isolates the shared-path JIT interaction from plain query cost. */
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
    graft.plans.TopKPlanning.register(spark)

    def time(name: String)(f: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }

    graft.sources.Tables.region(spark, sfDir).count()
    // arg mode: time the named production queries, 4 iterations each, in
    // this fresh JVM — for isolating a flagged bench row from session
    // effects (run order, shared-path JIT, heap history)
    if (args.nonEmpty) {
      val registry = SparkEntry.benchQueries
      args.foreach { name =>
        var j = 0
        while (j < 4) {
          time(name)(registry(name)(spark, sfDir).count())
          j += 1
        }
      }
      spark.stop()
      return
    }
    var i = 0
    while (i < 6) {
      time("dedup_simhash (fresh-JVM curve)")(
        graft.operators.Dedup.simhashPairs(spark, sfDir).count())
      i += 1
    }
    // the bench's alphabetical predecessors from the same family — the
    // queries sharing the shingle/hash expression paths
    val preceding = Seq("dedup_clusters", "dedup_cross_source",
      "dedup_dup_spans", "dedup_exact", "dedup_incremental",
      "dedup_minhash_lsh", "dedup_semantic")
    val registry = SparkEntry.benchQueries
    preceding.foreach(n => time(s"$n (once)")(registry(n)(spark, sfDir).count()))
    i = 0
    while (i < 4) {
      time("dedup_simhash (post-family)")(
        graft.operators.Dedup.simhashPairs(spark, sfDir).count())
      i += 1
    }
    spark.stop()
  }
}
