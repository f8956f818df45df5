package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (temporary; repointed per round at the current bench
  * hog). Round 7 (late): the new JPEG/MJPEG multimodal queries at sf0.1 —
  * per-row codec work is the cost, so confirm the partition-parallel
  * wall-clock stays in family with the other mm_ rows. */
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

    // warmup: scan + codegen + the mapPartitions encoder path JIT
    graft.sources.Tables.region(spark, sfDir).count()
    graft.operators.Multimodal.decodePng(spark, sfDir).count()

    var i = 0
    while (i < 3) {
      time("mm_decode_png")(
        graft.operators.Multimodal.decodePng(spark, sfDir).count())
      time("mm_decode_gif")(
        graft.operators.Multimodal.decodeGif(spark, sfDir).count())
      time("mm_decode_jpeg")(
        graft.operators.Multimodal.decodeJpeg(spark, sfDir).count())
      time("mm_video_frames")(
        graft.operators.Multimodal.videoFrames(spark, sfDir).count())
      time("mm_video_mjpeg")(
        graft.operators.Multimodal.videoMjpeg(spark, sfDir).count())
      i += 1
    }
    spark.stop()
  }
}
