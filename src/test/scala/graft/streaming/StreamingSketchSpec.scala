package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming Count-Min sketch must equal the batch sketch exactly on
  * a finite replay: integer counters merging by addition have no order
  * sensitivity, and both sides share the same Column expressions. */
class StreamingSketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming CMS sketch equals the batch sketch bit-for-bit") {
    val batch = graft.operators.TextAnalysis.cmsSketchOf(
        graft.operators.TextAnalysis.cmsTokensOf(
          graft.sources.Tables.documents(spark, dir)))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = StreamingSketch.cmsSketchStreaming(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
    // the 100 TB claim: state can never exceed d*W rows
    assert(streamed.size <= 4 * 256)
  }

  test("streaming HLL estimates equal the batch production form bit-for-bit") {
    // max-merged registers have no order sensitivity either; the
    // estimate tail is shared Column code, so even the fp estimate
    // matches exactly
    val batch = graft.operators.TextAnalysis.distinctHllProd(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    val streamed = StreamingSketch.hllSketchStreaming(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming HLL parquet sink equals memory sink and batch (production path)") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_hll_pq")
    try {
      val viaParquet = StreamingSketch.hllSketchStreamingToParquet(
          spark, dir, outDir.resolve("regs").toString)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      val batch = graft.operators.TextAnalysis.distinctHllProd(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(batch.nonEmpty)
      assert(viaParquet == batch)
    } finally StreamingStaging.deleteRecursively(outDir)
  }
}
