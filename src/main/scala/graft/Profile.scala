package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 15: `sim_ann_index_delta` — the slowest bench row (6.7 s
  * min-merged) and the only one that drifted in round 14 (+12.9% while
  * its lifecycle siblings stayed flat). The row is ingest-priced by
  * design (build-on-base + delta append + query, all inside the timed
  * region so DuckDB can replay the artifact), so decompose it the way
  * `dedup_semantic` was in round 14 — time each phase alone, at 1×
  * (sf0.1) and the 10× corpus (args: <sfDir> [scaledDir]):
  *   - BUILD: `buildIvfPqIndexProdOn` on the base split (vec_id % 8 ≠ 7)
  *     into a fresh root — the frozen-quantizer training + postings
  *     write;
  *   - APPEND: `appendToIvfPqIndexProd` of the 12% delta against the
  *     fresh artifact (fresh root + unique batch id per run, so the
  *     commit-log protocol — lease mint, staging, renames, marker — is
  *     paid in full every run, never skipped via an existing marker);
  *   - QUERY: the standard indexed query over the full corpus against
  *     the warm artifact.
  * The phase sum vs the registry row's own wall isolates any harness
  * cost the phases don't see (e.g. writer-lease create-once retries
  * under session composition). Each point min-of-2, cache cleared per
  * run (the bench discipline). Round-14 protocol (dedup_semantic pair
  * stage vs CC strategy) retired with its finding — see git history. */
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

    def timeMin2(name: String)(f: Int => Unit): Double = {
      val runs = (1 to 2).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f(i)
        (System.nanoTime() - t0) / 1e9
      }
      val sec = runs.min
      println(f"PROFILE $name: $sec%.2f s")
      sec
    }

    graft.sources.Tables.region(spark, sfDir).count() // JVM/codegen warmup

    for ((dir, label) <- Seq(sfDir -> "1x") ++
        scaledDir.map(_ -> "10x").toSeq) {
      println(s"--- $label ($dir) ---")
      val e = graft.sources.Tables.embeddings(spark, dir)
      val base = e.filter(col("vec_id") % 8 =!= 7)
      val delta = e.filter(col("vec_id") % 8 === 7)
      val stamp = System.nanoTime()
      def freshRoot(tag: String): String =
        s"${System.getProperty("java.io.tmpdir")}/graft_profile_${stamp}_$tag"
      // BUILD phase: fresh root per run so the second run re-pays the
      // full training + postings write, not an overwrite shortcut
      val tBuild = timeMin2(s"$label build(base)") { i =>
        graft.operators.Similarity.buildIvfPqIndexProdOn(
          spark, base, freshRoot(s"b$i"))
      }
      // APPEND phase: against a PRE-BUILT artifact not timed here;
      // fresh root + unique batch id per run → full commit-log cost
      val appendRoots = (1 to 2).map { i =>
        val r = freshRoot(s"a$i")
        graft.operators.Similarity.buildIvfPqIndexProdOn(spark, base, r)
        r
      }
      val tAppend = timeMin2(s"$label append(delta)") { i =>
        graft.operators.Similarity.appendToIvfPqIndexProd(
          spark, delta, appendRoots(i - 1), s"profile-delta-$stamp-$i")
      }
      // QUERY phase: warm artifact (the first append root, now complete)
      val tQuery = timeMin2(s"$label query(full)") { _ =>
        graft.operators.Similarity.annIvfPqIndexed(
          spark, dir, appendRoots(0)).count()
      }
      // the registry row itself — its own roots, the bench wall
      val fn = SparkEntry.benchQueries("sim_ann_index_delta")
      val tFull = timeMin2(s"$label sim_ann_index_delta (registry row)") {
        _ => fn(spark, dir).count()
      }
      println(f"PROFILE $label summary: build=$tBuild%.2f s " +
        f"append=$tAppend%.2f s query=$tQuery%.2f s " +
        f"phase_sum=${tBuild + tAppend + tQuery}%.2f s " +
        f"registry_row=$tFull%.2f s " +
        f"harness_residual=${tFull - tBuild - tAppend - tQuery}%.2f s")
    }
    spark.stop()
  }
}
