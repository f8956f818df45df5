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

  /** Stage `dir/table.parquet` behind a fresh temp dir and open it as a
    * file-source stream (the streaming source wants a DIRECTORY to
    * watch; the fixture is a single file). Hard link when the
    * filesystem allows it, copy otherwise — the copy fallback matters
    * when the temp dir and the fixture live on different filesystems.
    * Every replay helper stages through here, so none can fork the
    * weaker no-fallback variant again. Returns (streaming frame, staging
    * dir for the [[runAndConsume]] teardown, raw batch schema — already
    * read to type the stream, and needed again by the sentinel-feeding
    * replays, so returning it saves those a second footer read). */
  def stageParquetStream(spark: SparkSession, dir: String, table: String,
      prefix: String)
      : (DataFrame, java.nio.file.Path, org.apache.spark.sql.types.StructType) = {
    val path = s"$dir/$table.parquet"
    val streamDir = java.nio.file.Files.createTempDirectory(prefix)
    val staged = streamDir.resolve(s"$table.parquet")
    try java.nio.file.Files.createLink(staged, java.nio.file.Paths.get(path))
    catch { case _: Exception =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(path), staged)
    }
    val schema = spark.read.parquet(path).schema
    (spark.readStream.schema(schema).parquet(streamDir.toString), streamDir,
      schema)
  }

  /** Run a staged replay to completion and consume its memory sink,
    * cleaning up BOTH the sink view and the staging dir even when the
    * query — or the static-side build evaluated lazily inside `start` —
    * throws. Without the failure path, a crashed replay leaks the temp
    * dir and the sink view for the rest of the session. `start` is
    * by-name so the whole query construction is covered. */
  def runAndConsume(spark: SparkSession, sink: String,
      streamDir: java.nio.file.Path)(
      start: => org.apache.spark.sql.streaming.StreamingQuery): DataFrame =
    runAndDrive(spark, sink, streamDir)(start)(_.processAllAvailable())

  /** [[runAndConsume]] with a custom drive step — for replays that feed
    * the source mid-run (e.g. the watermark sentinel batch). */
  def runAndDrive(spark: SparkSession, sink: String,
      streamDir: java.nio.file.Path)(
      start: => org.apache.spark.sql.streaming.StreamingQuery)(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit): DataFrame = {
    try {
      val query = start
      try drive(query) finally query.stop()
      cleanupOnConsume(spark, sink, streamDir)
    } catch { case e: Throwable =>
      try spark.catalog.dropTempView(sink) catch { case _: Throwable => () }
      try deleteRecursively(streamDir) catch { case _: Throwable => () }
      throw e
    }
  }

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

  /** A far-future `ts` value (30 days past the fixture's max event
    * time) IN THE RAW SCHEMA'S OWN TYPE, for the sentinel batches the
    * watermark-advancing replays append — long nanoseconds for the
    * INT64 TIMESTAMP(NANOS) fixture generation, a timestamp object for
    * the native-timestamp generation (see
    * [[graft.sources.Tables.normalizeEventTs]]). */
  def sentinelTs(spark: SparkSession, path: String): Any = {
    import org.apache.spark.sql.functions.{col, max}
    spark.read.parquet(path).agg(max(col("ts"))).head().get(0) match {
      case ns: java.lang.Long =>
        java.lang.Long.valueOf(ns + 30L * 24 * 3600 * 1000000000L)
      case t: java.time.LocalDateTime => t.plusDays(30)
      case t: java.sql.Timestamp =>
        java.sql.Timestamp.from(t.toInstant.plus(java.time.Duration.ofDays(30)))
      case t: java.time.Instant => t.plus(java.time.Duration.ofDays(30))
      case other => throw new IllegalArgumentException(
        s"unexpected raw ts type ${other.getClass.getName}")
    }
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
