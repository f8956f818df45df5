package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // production planning: ranked-window top-k runs on the bounded-heap
    // TopKPerKeyExec (same rows, no per-group sort — spec-pinned and
    // Verify runs the oracle gate through the same rewrite)
    graft.plans.TopKPlanning.register(spark)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // Warmup: JVM/codegen/scan initialization otherwise lands on whichever
    // query runs first (~3 s of noise on its number).
    try graft.sources.Tables.region(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Times the PRODUCTION registry (no oracle canonicalization sort) for
    // the scale-path set only; the O(n²) oracle baselines
    // (SparkEntry.baselineOnly) are correctness-gated by Verify, not timed.
    // Each query runs 3 times and reports the MIN — a single-shot run at
    // local[32] carries ±0.5 s of JIT/GC noise that reads as phantom
    // regressions. The DataFrame cache is cleared before every iteration,
    // so queries that persist an intermediate (the LSH dedups) pay their
    // full cache-build cost in every timed run — min-of-3 discounts JIT
    // warm-up, never a warm cache. A query that throws is recorded as -1.0
    // with its error message — a crash must never masquerade as a fast
    // timing.
    val Iterations = 3
    // Rows whose min-of-3 still lands anywhere on the C2 JIT ramp (the
    // r10 same-commit artifacts swung 3-4x on them in opposite
    // directions — dedup_simhash 0.46 vs 1.40s, mm_video_mjpeg 0.41 vs
    // 1.67s — with no code change): run them 5x so the reported min is
    // the steady state, not a ramp sample. They are all sub-2s rows, so
    // the extra iterations cost ~15s of bench wall total.
    val JitSensitive = Set(
      "dedup_simhash", "text_lang_id", "dedup_incremental",
      "text_top_quality_by_lang", "mm_video_mjpeg",
      "mm_video_mjpeg_features", "mm_decode_jpeg", "mm_decode_jpeg_prog",
      "mm_decode_jpeg_color", "text_quality_rules", "text_quality_score",
      "text_pii_mask", "events_zorder_key")
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val iters = if (JitSensitive(name)) 5 else Iterations
      val runs = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable =>
                    Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val firstErr = runs.collectFirst { case (_, Some(e)) => e }
      val times = runs.map(_._1).sorted
      (name, if (firstErr.isEmpty) times.head else -1.0, times, firstErr)
    }
    val qs = results.map { case (k, v, _, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // Per-run [min, median, max]: the r7 official artifact diverged 6-12x
    // from a builder re-run of the same commit on the mm family — pure
    // environment contention. With the spread in the artifact, a noisy
    // query shows max >> min and can't be misread as a plan regression.
    val spread = results.map { case (k, _, t, _) =>
      jstr(k) + s":[${t.head},${t(t.length / 2)},${t.last}]"
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, None) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"sf":"$sfDir","agg":"min-of-$Iterations (5 on JIT-sensitive rows) per query, cache cleared per run; spread=[min,median,max]","registry":"production (no canonicalization sort)"}"""
    println(line)
    // also write the summary to a file: the driver's stdout tail-capture
    // truncated the r6 artifact mid-line, losing the total — the file is
    // the canonical copy (BENCH_OUT env overrides the path)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // AND archive the run under bench_runs/: single-session min-of-N
    // still carries a machine-load noise floor the trend gate trips on
    // (the r10 same-commit artifacts disagreed 3.5x per row), so
    // tools/bench_trend.py min-MERGES every archived session when given
    // the directory — a FLAG then means code again, not load.
    try {
      val runsDir = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "bench_runs"))
      java.nio.file.Files.createDirectories(runsDir)
      java.nio.file.Files.writeString(
        runsDir.resolve(s"run-${System.currentTimeMillis()}.json"), line + "\n")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not archive run: ${e.getMessage}") }
    spark.stop()
  }
}
