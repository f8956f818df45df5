package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming carry-last-click-forward as-of join must produce exactly
  * the batch union+window form's rows (which in turn hash-match the
  * DuckDB replay oracle) — bit-equal timestamps, ids and values. */
class StreamingAsofSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def keyed(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
    r.getLong(0) -> (r.getLong(1), r.getTimestamp(2), r.getLong(3),
      r.getTimestamp(4), r.getDouble(5))
  }.toMap

  test("streaming as-of join equals the batch union+window form") {
    val batch = keyed(graft.operators.Events.asofJoin(spark, dir).collect())
    val streamed = keyed(StreamingAsof.asofJoinStreaming(spark, dir)
      .select("purchase_id", "user_id", "purchase_ts", "click_id",
        "click_ts", "click_value").collect())
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("native parquet file sink equals the memory-sink twin and the batch query") {
    val batch = keyed(graft.operators.Events.asofJoin(spark, dir).collect())
    val outDir = java.nio.file.Files.createTempDirectory("graft_asof_out")
    try {
      val sunk = keyed(StreamingAsof
        .asofJoinStreamingToParquet(spark, dir, outDir.toString)
        .select("purchase_id", "user_id", "purchase_ts", "click_id",
          "click_ts", "click_value").collect())
      assert(batch.nonEmpty)
      assert(sunk == batch)
      assert(java.nio.file.Files.exists(outDir.resolve("_spark_metadata")))
    } finally StreamingStaging.deleteRecursively(outDir)
  }
}
