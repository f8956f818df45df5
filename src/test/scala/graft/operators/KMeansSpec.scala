package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The deterministic k-means utility: the spherical objective (mean
  * max-cosine to the nearest centroid) must be non-decreasing across
  * Lloyd iterations, and repeated runs must be bit-identical (no RNG
  * anywhere). */
class KMeansSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def vectors: DataFrame =
    graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("ev"))

  /** Spherical-k-means objective: mean over vectors of the max cosine to
    * any centroid. */
  private def objective(cent: DataFrame): Double = {
    val v = vectors
    v.crossJoin(broadcast(cent))
      .select(col("vec_id"),
        graft.functions.VectorFunctions
          .cosine_similarity(col("ev"), col("cv")).as("c"))
      .groupBy(col("vec_id")).agg(max(col("c")).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)
  }

  test("objective is non-decreasing over Lloyd iterations") {
    val k = 16
    val objs = (0 to 3).map(i =>
      objective(Similarity.kmeans(vectors, k, iters = i)))
    info(objs.map(o => f"$o%.4f").mkString("objective by iter: ", " -> ", ""))
    for (Seq(a, b) <- objs.sliding(2))
      assert(b >= a - 1e-12, s"objective decreased: $objs")
    // the first refinement actually moves the needle on the raw seeds
    assert(objs(1) > objs(0))
  }

  test("k-means is deterministic: two runs produce bit-equal centroids") {
    def run() = Similarity.kmeans(vectors, k = 8, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val a = run(); val b = run()
    assert(a.length == b.length && a.nonEmpty)
    for (((ida, va), (idb, vb)) <- a.zip(b)) {
      assert(ida == idb)
      assert(va == vb) // bit-equal doubles, not approximate
    }
  }
}
