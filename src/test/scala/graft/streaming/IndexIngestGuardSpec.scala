package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark
import graft.operators.{AnnWorkload, Similarity}

/** The refamily door, guarded from BOTH sides (round 17): an automated
  * re-family ([[graft.operators.Similarity.maintainIndexAlias]]) routes
  * an alias to the LSH family — which has no append protocol — while a
  * streaming ingest ([[StreamingIndexAppend.appendBatchAliased]]) may be
  * attached to the same alias. Round 16 left that door swinging: the
  * verdict executed unconditionally and the ingest appended into
  * whatever the alias resolved to, so the automation could crash its own
  * stream mid-batch inside an append-less artifact.
  *
  * This spec runs the real thing end to end: a foreachBatch ingest whose
  * maintenance cadence fires a refamily verdict MID-STREAM and pins
  *   (1) the DEFERRAL — the verdict is held while the alias shows recent
  *       `_ingest_log` claims, and the stream keeps appending to IVF-PQ;
  *   (2) the LOUD, REMEDIED FAILURE — once the re-family has shipped
  *       (quiet window elapsed), a routed append fails with the re-route
  *       remedy instead of crashing inside the LSH artifact, and
  *       releases its routing claim so the retry can re-resolve;
  *   (3) the NO-OP maintenance turn — [[StreamingIndexAppend
  *       .maintainAfterBatch]] pointed at the LSH version dir returns
  *       without touching anything instead of throwing on the missing
  *       centroids/_stats;
  *   (4) the WAY BACK — the deployed LSH version advises from its own
  *       carried stats, a continuous-ingest workload routes the alias
  *       back to IVF-PQ, and the retried batch lands there. */
class IndexIngestGuardSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("streaming ingest across an automated refamily: deferral while claims are fresh, loud remedied failure after, and the way back") {
    val alias = java.nio.file.Files.createTempDirectory("graft_guard")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_guard_in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_guard_ck")
    try {
      // v1: IVF-PQ trained on the clustered shape, then drifted by an
      // isotropic append — the fixture whose latency-pinned verdict is
      // refamily→LSH (IndexRefamilySpec). Sizing keeps the artifact's
      // measured n AT OR BELOW the frontier's 1× niche point (n=2000)
      // through both streamed batches: the isotropic LSH curve rises
      // steeply past it, so a larger fixture would interpolate to an
      // IVF verdict and the test would stop exercising the refamily
      // path at all.
      val base = graft.StressScale.synthEmbeddingsClustered(spark, 1000L)
      Similarity.buildIvfPqIndexProdOn(spark, base, s"$alias/v1")
      Similarity.publishIndexVersion(spark, alias.toString, "v1")
      val ood = graft.StressScale.synthEmbeddings(spark, 600L)
        .select((col("vec_id") + 40000000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfPqIndexProd(spark, ood, s"$alias/v1",
        "ood-batch")
      // two micro-batches of fresh crawl on a file-source stream
      def delta(shift: Long) = graft.StressScale.synthEmbeddings(spark, 200L)
        .select((col("vec_id") + shift).as("vec_id"), col("embedding"))
      val d0 = delta(50000000L)
      val d1 = delta(51000000L)
      val d2 = delta(52000000L)
      Seq(d0, d1).foreach(_.coalesce(1)
        .write.mode("append").parquet(streamDir.toString))
      // the maintenance cadence fires INSIDE the stream, right after
      // batch 0 commits — the automation racing its own ingest
      @volatile var midStreamVerdict: Option[(String, String)] =
        Some(("sentinel", "sentinel"))
      val stream = spark.readStream.schema(d0.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      val query = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingIndexAppend.appendBatchAliased(spark,
            alias.toString)(b, id)
          if (id == 0L)
            midStreamVerdict = Similarity.maintainIndexAlias(spark,
              alias.toString, dir, AnnWorkload(latencyPinned = true), "v2")
        }
        .option("checkpointLocation", ckpt.toString)
        .start()
      try query.processAllAvailable() finally query.stop()
      // (1) DEFERRED: batch 0's routing claim was seconds old, so the
      // refamily verdict shipped nothing — and batch 1 therefore kept
      // appending into the IVF-PQ artifact, no mid-stream crash
      assert(midStreamVerdict.isEmpty,
        s"refamily must defer under a live ingest: $midStreamVerdict")
      assert(Similarity.resolveIndexAlias(spark, alias.toString)
        == s"$alias/v1")
      val ifs = graft.sources.IndexFs.on(spark, alias.toString)
      def claim(id: Int) = ifs.readUtf8(
        ifs.child("_alias", "_ingest_log", s"batch-$id"))
      assert(claim(0) == "v1" && claim(1) == "v1")
      // the ingest detaches; the quiet window elapses (conf-compressed
      // to zero — the claims' modTimes are now strictly in the past)
      spark.conf.set("graft.index.refamilyIngestQuietMs", "0")
      try {
        val shipped = Similarity.maintainIndexAlias(spark, alias.toString,
          dir, AnnWorkload(latencyPinned = true), "v2")
        assert(shipped.contains(("v2", "lsh-index")), s"shipped=$shipped")
        // (2) LOUD + REMEDIED: a straggler batch routed through the
        // alias fails with the re-route remedy before touching the LSH
        // artifact, and releases its claim
        val ex = intercept[RuntimeException] {
          StreamingIndexAppend.appendBatchAliased(spark,
            alias.toString)(d2, 2L)
        }
        assert(ex.getMessage.contains("no append protocol"),
          ex.getMessage)
        assert(ex.getMessage.contains("maintainIndexAlias"),
          s"the failure must carry the remedy: ${ex.getMessage}")
        assert(!ifs.exists(ifs.child("_alias", "_ingest_log", "batch-2")),
          "a guarded-out batch must release its routing claim")
        // (3) the maintenance turn NO-OPS on the LSH version dir — no
        // throw on the missing centroids, nothing written
        StreamingIndexAppend.maintainAfterBatch(spark, s"$alias/v2", 2L, 4)
        val v2fs = graft.sources.IndexFs.on(spark, s"$alias/v2")
        assert(!v2fs.exists(v2fs.child("_stats", "maintenance.parquet",
          "batch-2.parquet")))
        // (4) the WAY BACK: the LSH version carries the measurement its
        // verdict was made on, so the advisor is not blind — a
        // continuous-ingest workload (structurally IVF-PQ) routes the
        // alias back, and the retried batch lands in the new version
        val back = Similarity.maintainIndexAlias(spark, alias.toString,
          dir, AnnWorkload(continuousIngest = true), "v3")
        assert(back.contains(("v3", "ivf-pq-index")), s"back=$back")
        StreamingIndexAppend.appendBatchAliased(spark,
          alias.toString)(d2, 2L)
        assert(claim(2) == "v3")
        val v3fs = graft.sources.IndexFs.on(spark, s"$alias/v3")
        assert(v3fs.exists(v3fs.child("_append_log", "batch-2")))
        // and the alias reader serves the restored IVF-PQ family
        val q = graft.sources.Tables.embeddings(spark, dir).limit(3)
          .select((col("vec_id") + 900000L).as("query_id"),
            col("embedding").cast("array<double>").as("qev"))
        assert(Similarity.searchIndexAlias(spark, q, dir,
          alias.toString).count() > 0)
      } finally spark.conf.unset("graft.index.refamilyIngestQuietMs")
    } finally {
      StreamingStaging.deleteRecursively(alias)
      StreamingStaging.deleteRecursively(streamDir)
      StreamingStaging.deleteRecursively(ckpt)
    }
  }
}
