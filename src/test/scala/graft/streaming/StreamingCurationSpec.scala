package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composed streaming curation must agree with its batch twin on
  * everything arrival order cannot change: the set of distinct kept
  * contents (norm hashes) and the per-content invariant columns
  * (norm_text, split — both functions of the content). Which doc_id
  * survives a duplicate set IS arrival-dependent, so it is excluded. */
class StreamingCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming curation equals batch on content keys, splits, masks") {
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(6) ->
        (r.getString(4), r.getString(5), r.getString(3))).toMap
    // columns: doc_id, lang, source, masked_text, norm_text, split, norm_hash
    val batch = keyed(StreamingCuration.curatedBatch(spark, dir).collect())
    val streamed = keyed(StreamingCuration.curatedStreaming(spark, dir).collect())
    assert(batch.nonEmpty)
    assert(streamed.keySet == batch.keySet)
    for ((h, (norm, split, _)) <- streamed) {
      assert(batch(h)._1 == norm, s"norm_text drift at $h")
      assert(batch(h)._2 == split, s"split drift at $h")
    }
    // the gate actually gates: curated strictly smaller than the corpus
    val total = graft.sources.Tables.documents(spark, dir).count()
    assert(batch.size < total)
  }

  test("native parquet file sink equals the memory-sink twin and the batch query") {
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getString(6) ->
        (r.getString(4), r.getString(5), r.getString(3))).toMap
    val batch = keyed(StreamingCuration.curatedBatch(spark, dir).collect())
    val outDir = java.nio.file.Files.createTempDirectory("graft_cur_out")
    try {
      val sunk = keyed(StreamingCuration
        .curatedStreamingToParquet(spark, dir, outDir.toString)
        .select("doc_id", "lang", "source", "masked_text", "norm_text",
          "split", "norm_hash").collect())
      assert(batch.nonEmpty)
      assert(sunk.keySet == batch.keySet)
      // as in the memory-sink test: only arrival-order-INDEPENDENT columns
      // compare (which doc survives a duplicate set is arrival-dependent,
      // and masked_text is a function of the surviving doc's raw text)
      for ((h, (norm, split, _)) <- sunk) {
        assert(batch(h)._1 == norm, s"norm_text drift at $h")
        assert(batch(h)._2 == split, s"split drift at $h")
      }
      assert(java.nio.file.Files.exists(outDir.resolve("_spark_metadata")))
    } finally StreamingStaging.deleteRecursively(outDir)
  }

  test("streaming curation agrees with PipelineRun's quality gate and split") {
    // the composed batch CLI pipeline and the streaming composition share
    // the same gate/split expressions; cross-check on a sample of doc_ids
    // both keep (PipelineRun additionally drops near-dup cluster members,
    // so its kept set is a subset)
    val pipeline = graft.PipelineRun.curated(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamed = StreamingCuration.curatedBatch(spark, dir)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val common = pipeline.keySet intersect streamed.keySet
    assert(common.nonEmpty)
    for (id <- common) assert(pipeline(id) == streamed(id), s"split drift at doc $id")
  }
}
