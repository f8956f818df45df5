package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared teardown for the streaming replay helpers (ADVICE round 5):
  * each helper stages the fixture behind a temp dir of hard links and
  * collects through a UUID-named memory-sink table — both of which
  * otherwise outlive the call, leaking disk and driver memory across a
  * long session (Verify runs 56 queries in one session).
  *
  * [[cleanupOnConsume]] materializes the sink's rows into a
  * driver-local DataFrame (these helpers are gate/demo surfaces over
  * fixture-scale results — bounded by construction), then drops the
  * sink table and deletes the staging dir eagerly. */
object StreamingStaging {

  def cleanupOnConsume(spark: SparkSession, sink: String,
      streamDir: java.nio.file.Path): DataFrame = {
    import scala.jdk.CollectionConverters._
    val sunk = spark.table(sink)
    val local = spark.createDataFrame(
      sunk.collect().toList.asJava, sunk.schema)
    spark.catalog.dropTempView(sink)
    deleteRecursively(streamDir)
    local
  }

  def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    import java.nio.file.Files
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
  }
}
