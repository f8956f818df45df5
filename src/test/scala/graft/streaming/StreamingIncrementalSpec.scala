package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming incremental dedup (delta stream vs static history band
  * index, stream-static joins) must reproduce the batch operator's
  * verdicts bit-for-bit on the finite replay — Jaccard doubles included
  * (both sides divide the same int sizes). */
class StreamingIncrementalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming incremental dedup equals the batch verdicts exactly") {
    val batch = graft.operators.Dedup.incremental(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val streamed = StreamingIncremental.incrementalStreaming(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(batch.nonEmpty, "fixture must plant cross-duplicates")
    assert(streamed == batch)
    // every verdict is a planted copy resolving to a history doc no
    // later than its own original (min over matches — the original
    // itself, or an even-earlier doc the original near-duplicates)
    batch.foreach { case (deltaId, (dupOf, _, _)) =>
      assert(deltaId >= 100000L && dupOf <= deltaId - 100000L)
    }
  }

  test("foreachBatch parquet sink equals the memory-sink twin exactly") {
    // the production path: executors write the pair snapshot straight to
    // parquet, the driver never materializes a row — verdicts read back
    // from the files must match the memory-sink (and batch) form
    val outDir = java.nio.file.Files.createTempDirectory("graft_inc_pq")
    val pairsDir = outDir.resolve("pairs").toString
    try {
      val viaParquet = StreamingIncremental
        .incrementalStreamingToParquet(spark, dir, pairsDir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      val viaMemory = StreamingIncremental.incrementalStreaming(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(viaParquet.nonEmpty)
      assert(viaParquet == viaMemory)
    } finally StreamingStaging.deleteRecursively(outDir)
  }
}
