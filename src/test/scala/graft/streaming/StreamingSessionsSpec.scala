package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom-state (`flatMapGroupsWithState`) sessionizer must produce
  * exactly the batch `session_window` sessions — same boundaries, counts,
  * and bit-identical decimal-exact value sums. */
class StreamingSessionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private val key = (r: org.apache.spark.sql.Row) =>
    (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))

  test("flatMapGroupsWithState sessionization equals batch session_window") {
    val batch = StreamingEvents.sessionAggBatch(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    val custom = StreamingSessions.sessionizeCustomState(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(batch.nonEmpty)
    assert(custom == batch)
  }

  test("native parquet file sink equals the memory-sink twin and the batch query") {
    val batch = StreamingEvents.sessionAggBatch(spark, dir).collect()
      .map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
    val outDir = java.nio.file.Files.createTempDirectory("graft_sess_out")
    try {
      val sunk = StreamingSessions
        .sessionizeCustomStateToParquet(spark, dir, outDir.toString)
        .select("user_id", "session_start", "session_end", "n_events",
          "total_value")
        .collect().map(r => key(r) -> (r.getLong(3), r.getDouble(4))).toMap
      assert(batch.nonEmpty)
      assert(sunk == batch)
      // exactly-once manifest present: batch readers see committed files only
      assert(java.nio.file.Files.exists(outDir.resolve("_spark_metadata")))
    } finally StreamingStaging.deleteRecursively(outDir)
  }
}
