package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** The advised maintenance loop, round 16: `maintainIndexAlias` asks
  * `adviseLiveIndex` what the live artifact's OWN measurements say and
  * executes the verdict — including routing a rebuild to the OTHER
  * family behind the same alias when the measured frontier out-votes
  * the live one. The round-15 advisor could only say "refamily";
  * `retrainIfDrifted` still rebuilt the same family on a raw drift
  * threshold. This spec closes the loop end to end. */
class IndexRefamilySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def queries(n: Int) =
    graft.sources.Tables.embeddings(spark, dir).limit(n)
      .select((col("vec_id") + 900000L).as("query_id"),
        col("embedding").cast("array<double>").as("qev"))

  test("refamily: a drifted clustered-built artifact ends as a deployed LSH index behind the same alias") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam")
    try {
      // v1: IVF-PQ trained on the CLUSTERED shape (build concentration
      // ≈ 0.8), then DRIFTED by an isotropic append the frozen
      // quantizer no longer fits — after it, the artifact's own stats
      // read n=2000, vector-weighted concentration below the 0.73
      // clustered bound, newest committed drift far below -0.05
      val base = graft.StressScale.synthEmbeddingsClustered(spark, 1000L)
      Similarity.buildIvfPqIndexProdOn(spark, base, s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      val delta = graft.StressScale.synthEmbeddings(spark, 1000L)
        .select((col("vec_id") + 40000000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfPqIndexProd(spark, delta, s"$alias/v1",
        "ood-batch")
      // under a latency-pinned workload at that measured operating
      // point the frontier routes to LSH (the measured 1x niche) —
      // refamily out-votes the retrain the drift alone would trigger,
      // and the maintenance verb must EXECUTE it, not just report it
      val shipped = Similarity.maintainIndexAlias(spark, alias.toString,
        dir, AnnWorkload(latencyPinned = true), "v2")
      assert(shipped.contains(("v2", "lsh-index")), s"shipped=$shipped")
      val live = Similarity.resolveIndexAlias(spark, alias.toString)
      assert(live == s"$alias/v2", live)
      assert(Similarity.indexFamilyOf(spark, live) == "lsh-index")
      // the reader migrates families with no URL change: the same alias
      // search now serves off the LSH artifact
      val res = Similarity.searchIndexAlias(spark, queries(5), dir,
        alias.toString).collect()
      assert(res.nonEmpty)
      val top1 = res.filter(_.getAs[Long]("rnk") == 1L)
        .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
        .toMap
      // each query IS a corpus vector (id + 900000): its top neighbor
      // must be its own source vector — the served index is real
      top1.foreach { case (q, nb) =>
        assert(nb == q - 900000L, s"query $q served top-1 $nb")
      }
      // idempotent after the re-family: the LSH artifact records no
      // _stats (rebuild-per-corpus-version is its cadence), so a second
      // maintenance pass ships nothing instead of crashing
      assert(Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(latencyPinned = true), "v3").isEmpty)
      assert(Similarity.resolveIndexAlias(spark, alias.toString)
        == s"$alias/v2")
    } finally graft.streaming.StreamingStaging.deleteRecursively(alias)
  }

  test("retrain: when the stats keep the family, the advised verb rebuilds IVF-PQ") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam_rt")
    try {
      val base = graft.StressScale.synthEmbeddingsClustered(spark, 1000L)
      Similarity.buildIvfPqIndexProdOn(spark, base, s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      val delta = graft.StressScale.synthEmbeddings(spark, 1000L)
        .select((col("vec_id") + 40000000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfPqIndexProd(spark, delta, s"$alias/v1",
        "ood-batch")
      // same drifted artifact, but a continuous-ingest workload is
      // structurally pinned to the IVF-PQ lifecycle — the verdict is
      // retrain, and the rebuild stays in-family
      val shipped = Similarity.maintainIndexAlias(spark, alias.toString,
        dir, AnnWorkload(continuousIngest = true), "v2")
      assert(shipped.contains(("v2", "ivf-pq-index")), s"shipped=$shipped")
      val live = Similarity.resolveIndexAlias(spark, alias.toString)
      assert(live == s"$alias/v2")
      assert(Similarity.indexFamilyOf(spark, live) == "ivf-pq-index")
      assert(Similarity.searchIndexAlias(spark, queries(3), dir,
        alias.toString).count() > 0)
      // the fresh quantizer has no appends: the next pass is a stay
      assert(Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(continuousIngest = true), "v3").isEmpty)
    } finally graft.streaming.StreamingStaging.deleteRecursively(alias)
  }

  test("stay: a healthy artifact ships nothing and the alias does not move") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam_st")
    try {
      Similarity.buildIvfPqIndexProdOn(spark,
        graft.sources.Tables.embeddings(spark, dir), s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      assert(Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(continuousIngest = true), "v2").isEmpty)
      assert(Similarity.resolveIndexAlias(spark, alias.toString)
        == s"$alias/v1")
    } finally graft.streaming.StreamingStaging.deleteRecursively(alias)
  }
}
