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
    val results = SparkEntry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to Iterations).map { _ =>
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
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"sf":"$sfDir","agg":"min-of-$Iterations per query, cache cleared per run; spread=[min,median,max]","registry":"production (no canonicalization sort)"}"""
    println(line)
    // also write the summary to a file: the driver's stdout tail-capture
    // truncated the r6 artifact mid-line, losing the total — the file is
    // the canonical copy (BENCH_OUT env overrides the path)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
