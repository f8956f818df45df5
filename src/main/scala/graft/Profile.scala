package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 8: mm_video_mjpeg regressed 2.6× vs the round-7 builder
  * artifact right after the JPEG decoder was generalized to 1-or-3
  * components. Hypothesis: the tiny-frame MJPEG hot loop (190 k 16×16
  * frame decodes at sf0.1) was monomorphic before; running the color
  * query in the same session makes the shared decode path bimorphic and
  * the JIT profile degrades. Protocol: time MJPEG alone (fresh JVM →
  * monomorphic), then run the color decode once, then time MJPEG again
  * — a jump in the second set isolates the JIT-profile interaction from
  * plain per-call overhead. */
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
    var i = 0
    while (i < 4) {
      time("mm_video_mjpeg (pre-color)")(
        graft.operators.Multimodal.videoMjpeg(spark, sfDir).count())
      i += 1
    }
    time("mm_decode_jpeg_color (once)")(
      graft.operators.Multimodal.decodeJpegColor(spark, sfDir).count())
    i = 0
    while (i < 4) {
      time("mm_video_mjpeg (post-color)")(
        graft.operators.Multimodal.videoMjpeg(spark, sfDir).count())
      i += 1
    }
    spark.stop()
  }
}
