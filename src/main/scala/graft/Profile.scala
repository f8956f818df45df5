package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch profiler (measurement-only main — excluded from the bench
  * build fingerprint; repointed per round at the current bench hog).
  *
  * Round 17 (optimization round): three modes.
  *
  *   runMain graft.Profile rows <sfDir> [substr,substr,...]
  *     Per-registry-row empirical shape: wall (min-of-2 after one
  *     untimed warm-up), #jobs, #stages, #tasks, Σtask-time,
  *     shuffle-write bytes — the fixed-overhead diagnosis. A row whose
  *     wall >> Σtask/cores is scheduling/driver-bound, not compute-
  *     bound; a row with many stages pays per-stage latency.
  *
  *   runMain graft.Profile stages <sfDir> <rowName>
  *     One row's per-stage decomposition (second run, warm): stage id,
  *     wall, task count, Σtask, shuffle read/write, first line of the
  *     stage's name/callsite — sorted by wall desc.
  *
  *   runMain graft.Profile delta <sfDir> [scaledDir]
  *     The round-15 sim_ann_index_delta build/append/query phase split
  *     (see git history for rationale).
  */
object Profile {

  private final class StageAgg extends org.apache.spark.scheduler.SparkListener {
    case class S(name: String, wall: Double, tasks: Int, taskSum: Double,
      shufRead: Long, shufWrite: Long, input: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[S]
    var jobs = 0
    override def onJobStart(
        j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
      synchronized { jobs += 1 }
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      synchronized {
        val i = sc.stageInfo
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(0.0)
        val m = i.taskMetrics
        stages += S(i.name, wall, i.numTasks, m.executorRunTime / 1e3,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
      }
    def reset(): Unit = synchronized { stages.clear(); jobs = 0 }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("rows")
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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

    mode match {
      case "rows" =>
        val filt = args.lift(2).map(_.split(',').toSeq).getOrElse(Seq(""))
        val rows = SparkEntry.benchQueries.toSeq.sortBy(_._1)
          .filter { case (n, _) => filt.exists(n.contains) }
        val agg = new StageAgg
        spark.sparkContext.addSparkListener(agg)
        // full-registry-style warm-up over the SELECTED rows
        rows.foreach { case (_, fn) =>
          spark.catalog.clearCache()
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
        }
        println(f"${"row"}%-42s ${"wall"}%7s ${"jobs"}%5s ${"stg"}%5s " +
          f"${"tasks"}%6s ${"Σtask"}%8s ${"shufW"}%9s")
        rows.foreach { case (name, fn) =>
          val walls = (1 to 2).map { _ =>
            spark.catalog.clearCache()
            agg.reset()
            val t0 = System.nanoTime()
            try fn(spark, sfDir).count() catch { case e: Throwable =>
              println(s"ERR $name: ${e.getMessage.take(120)}") }
            (System.nanoTime() - t0) / 1e9
          }
          // listener state reflects the LAST run; walls.min is the wall
          Thread.sleep(50) // let listener bus drain
          val (j, st, tk, ts, sw) = agg.synchronized {
            (agg.jobs, agg.stages.length, agg.stages.map(_.tasks).sum,
              agg.stages.map(_.taskSum).sum, agg.stages.map(_.shufWrite).sum)
          }
          println(f"$name%-42s ${walls.min}%7.2f $j%5d $st%5d $tk%6d " +
            f"$ts%8.2f ${sw / 1024}%8dK")
        }
      case "stages" =>
        val rowName = args.lift(2).getOrElse("sim_ann_index_delta")
        val fn = SparkEntry.benchQueries(rowName)
        val agg = new StageAgg
        spark.sparkContext.addSparkListener(agg)
        spark.catalog.clearCache()
        fn(spark, sfDir).count() // warm-up
        spark.catalog.clearCache()
        agg.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"TOTAL $rowName wall=$wall%.2f s jobs=${agg.jobs} " +
          f"stages=${agg.stages.length}")
        agg.stages.sortBy(-_.wall).take(40).foreach { s =>
          println(f"${s.wall}%7.3f s tasks=${s.tasks}%-4d Σtask=${s.taskSum}%7.2f " +
            f"in=${s.input / 1024}%6dK sr=${s.shufRead / 1024}%6dK " +
            f"sw=${s.shufWrite / 1024}%6dK  ${s.name.linesIterator.next().take(110)}")
        }
      case "explain" =>
        // dump explain("formatted") of selected rows to plans/<outDir>/
        val outDir = args.lift(2).getOrElse("plans/r17")
        val suffix = args.lift(3).getOrElse("before")
        val filt = args.lift(4).map(_.split(',').toSeq).getOrElse(Seq(""))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        SparkEntry.benchQueries.toSeq.sortBy(_._1)
          .filter { case (n, _) => filt.exists(n.contains) }
          .foreach { case (name, fn) =>
            try {
              val df = fn(spark, sfDir)
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              java.nio.file.Files.writeString(
                java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
              println(s"WROTE $outDir/${name}_$suffix.txt")
            } catch { case e: Throwable =>
              println(s"ERR $name: ${e.getMessage.take(160)}") }
          }
      case "delta" =>
        val scaledDir = args.lift(2)
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
    }
    spark.stop()
  }
}
