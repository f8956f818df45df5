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
      // idempotent after the re-family — and no longer blind (round
      // 17): the LSH version carries the corpus measurement its verdict
      // was made on in its own _stats/build.parquet, so the second pass
      // is a measured STAY (the frontier keeps LSH for this workload at
      // this operating point), not a family-guard short-circuit
      assert(Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(latencyPinned = true), "v3").isEmpty)
      assert(Similarity.resolveIndexAlias(spark, alias.toString)
        == s"$alias/v2")
    } finally graft.streaming.StreamingStaging.deleteRecursively(alias)
  }

  test("way back: a deployed LSH version advises from its carried stats and re-families to IVF-PQ on a workload shift") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam_wb")
    try {
      // same drifted-clustered fixture whose latency-pinned verdict
      // ships LSH behind the alias
      val base = graft.StressScale.synthEmbeddingsClustered(spark, 1000L)
      Similarity.buildIvfPqIndexProdOn(spark, base, s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      val delta = graft.StressScale.synthEmbeddings(spark, 1000L)
        .select((col("vec_id") + 40000000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfPqIndexProd(spark, delta, s"$alias/v1",
        "ood-batch")
      assert(Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(latencyPinned = true), "v2")
        .contains(("v2", "lsh-index")))
      // the shipped LSH version carries its measurement: n_vectors plus
      // the concentration the verdict was made on (round 16 stamped no
      // _stats here, leaving the alias advice-blind — the one-way door)
      val stats = spark.read.parquet(s"$alias/v2/_stats/build.parquet")
        .collect()
      assert(stats.length == 1 && stats(0).getAs[Long]("n_vectors") > 0)
      assert(!stats(0).isNullAt(stats(0).fieldIndex("mean_cos")),
        "the re-family build must carry the measured concentration")
      // workload shift: continuous ingest is structurally pinned to the
      // IVF-PQ lifecycle — the SAME maintenance verb routes the alias
      // back, from the LSH version's own stats
      val back = Similarity.maintainIndexAlias(spark, alias.toString, dir,
        AnnWorkload(continuousIngest = true), "v3")
      assert(back.contains(("v3", "ivf-pq-index")), s"back=$back")
      val live = Similarity.resolveIndexAlias(spark, alias.toString)
      assert(live == s"$alias/v3")
      assert(Similarity.indexFamilyOf(spark, live) == "ivf-pq-index")
      assert(Similarity.searchIndexAlias(spark, queries(3), dir,
        alias.toString).count() > 0)
    } finally graft.streaming.StreamingStaging.deleteRecursively(alias)
  }

  test("searchIndexAliasFiltered dispatches by family, row-equal to the direct family calls") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam_fl")
    try {
      val allowed = graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("neighbor_id"), col("rnk"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(identity[(Long, Long, Long)])
      // IVF-PQ live: the alias-routed filtered search ≡ the direct call
      Similarity.buildIvfPqIndexProdOn(spark,
        graft.sources.Tables.embeddings(spark, dir), s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      assert(rows(Similarity.searchIndexAliasFiltered(spark, queries(5),
          dir, alias.toString, allowed))
        sameElements rows(Similarity.searchIvfPqIndexFiltered(spark,
          queries(5), dir, s"$alias/v1", allowed)))
      // LSH live (rotated behind the same alias): same equivalence —
      // filtered workloads migrate families with the alias instead of
      // hard-coding one (they are exactly the dimension the re-family
      // verdict weighs)
      Similarity.buildLshIndexProd(spark, dir, s"$alias/v2",
        "graft_test_aliasflt_v2")
      Similarity.publishIndexVersion(spark, alias.toString, "v2")
      assert(rows(Similarity.searchIndexAliasFiltered(spark, queries(5),
          dir, alias.toString, allowed))
        sameElements rows(Similarity.searchLshIndexFiltered(spark,
          queries(5), dir, "graft_test_aliasflt_v2", allowed)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_aliasflt_v2")
      graft.streaming.StreamingStaging.deleteRecursively(alias)
    }
  }

  test("an LSH-live alias survives a catalog wipe: the reader re-registers the bucketed postings table (new-JVM read path)") {
    val alias = java.nio.file.Files.createTempDirectory("graft_refam_xs")
    try {
      Similarity.buildLshIndexProd(spark, dir, s"$alias/v1",
        "graft_test_xsession_tbl")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("neighbor_id"), col("rnk"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(identity[(Long, Long, Long)])
      val before = rows(Similarity.searchIndexAlias(spark, queries(5),
        dir, alias.toString))
      // saveAsTable registered the postings in THIS session's in-memory
      // catalog only — dropping it is exactly what a fresh JVM sees
      spark.sql("DROP TABLE graft_test_xsession_tbl")
      assert(!spark.catalog.tableExists("graft_test_xsession_tbl"))
      val after = rows(Similarity.searchIndexAlias(spark, queries(5),
        dir, alias.toString))
      assert(before sameElements after,
        "the re-registered table must serve identically")
      // the recovered registration carries the build's bucket spec (the
      // reads stay exchange-free, not a silently-shuffling plain scan)
      val nb = spark.sql("DESCRIBE FORMATTED graft_test_xsession_tbl")
        .filter(col("col_name") === "Num Buckets").head().getString(1)
      assert(nb.trim == "32", s"Num Buckets=$nb")
      // the filtered alias read recovers through the same path
      spark.sql("DROP TABLE graft_test_xsession_tbl")
      val allowed = graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      assert(Similarity.searchIndexAliasFiltered(spark, queries(3), dir,
        alias.toString, allowed).count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_xsession_tbl")
      graft.streaming.StreamingStaging.deleteRecursively(alias)
    }
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
