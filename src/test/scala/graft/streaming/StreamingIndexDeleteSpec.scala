package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** The streamed takedown queue must converge to exactly the state one
  * monolithic batch delete produces, and a re-delivered micro-batch
  * must be a no-op — the erasure twin of `StreamingIndexAppendSpec`. */
class StreamingIndexDeleteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def resultRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("streamed deletes equal one batch delete of the union; retry no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_sidx_del")
    val control = java.nio.file.Files.createTempDirectory("graft_sidx_delc")
    try {
      val streamed = resultRows(StreamingIndexDelete.indexDeleteStreaming(
        spark, dir, root.toString))
      assert(streamed.nonEmpty)
      // every erased id (vec_id % 8 == 5 across the two micro-batches)
      // is gone from both sides of the result
      assert(streamed.forall(r => r._1 % 8 != 5 && r._2 % 8 != 5))
      // and some survivors still answer — the delete didn't over-reach
      assert(streamed.exists(r => r._2 % 16 == 1))
      // control: the SAME index build, one monolithic delete of the union
      val e = graft.sources.Tables.embeddings(spark, dir)
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark, e,
        control.toString)
      graft.operators.Similarity.deleteFromIvfPqIndex(spark,
        e.filter(col("vec_id") % 8 === 5).select(col("vec_id")),
        control.toString, "union")
      val batch = resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, control.toString))
      assert(streamed == batch)
      // at-least-once redelivery: re-applying a committed micro-batch
      // changes nothing (the commit-log marker guards it)
      StreamingIndexDelete.deleteBatch(spark, root.toString)(
        e.filter(col("vec_id") % 16 === 5).select(col("vec_id")), 0L)
      assert(resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, root.toString)) == streamed)
    } finally {
      StreamingStaging.deleteRecursively(root)
      StreamingStaging.deleteRecursively(control)
    }
  }
}
