package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming dedup forms must match the batch exact-dedup results:
  * the md5-keyed aggregate bit-for-bit, and keep-first `dropDuplicates`
  * on the surviving key set (arrival order decides WHICH row survives, so
  * only the set is deterministic). */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming md5 dedup aggregate equals the batch aggregate exactly") {
    val batch = StreamingDedup.exactAggBatch(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val streamed = StreamingDedup.exactAggStreaming(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // planted duplicates actually dedup: every 10th doc has 2 copies
    assert(batch.values.exists(_._2 == 2L))
  }

  test("streaming dropDuplicates keeps exactly one row per distinct text") {
    val batchKeys = StreamingDedup.exactAggBatch(spark, dir).collect()
      .map(_.getString(0)).toSet
    val streamed = StreamingDedup.dropDupStreaming(spark, dir).collect()
    assert(streamed.length == batchKeys.size)
    assert(streamed.map(_.getString(2)).toSet == batchKeys)
  }
}
