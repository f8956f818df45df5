package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all ScalaTest suites (JVM-wide —
  * suites run in the same forked test JVM, so `getOrCreate` reuses it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val builder = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val s = builder.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.001"
}
