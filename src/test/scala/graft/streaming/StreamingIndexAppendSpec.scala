package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** Streaming index maintenance: the streamed-maintained persisted index
  * must answer queries exactly as the batch build+append on the same
  * splits, and a re-applied (retried) micro-batch must change nothing. */
class StreamingIndexAppendSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def resultRows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("streamed micro-batch appends equal the batch delta append, query-exact") {
    val streamRoot = java.nio.file.Files.createTempDirectory("graft_idx_stream")
    val batchRoot = java.nio.file.Files.createTempDirectory("graft_idx_batch")
    try {
      val streamed = resultRows(StreamingIndexAppend.indexDeltaStreaming(
        spark, dir, streamRoot.toString))
      val e = graft.sources.Tables.embeddings(spark, dir)
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        e.filter(col("vec_id") % 8 =!= 7), batchRoot.toString)
      graft.operators.Similarity.appendToIvfPqIndexProd(spark,
        e.filter(col("vec_id") % 8 === 7), batchRoot.toString, "all")
      val batch = resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, batchRoot.toString))
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // both days committed: a `batch-<id>` marker AND a create-once
      // `ord-<seq>` pointer per batch (the round-12 raced-seq guard)
      val logNames = {
        import scala.jdk.CollectionConverters._
        val s = java.nio.file.Files.list(streamRoot.resolve("_append_log"))
        try s.iterator().asScala.map(_.getFileName.toString).toSet
        finally s.close()
      }
      assert(logNames == Set("batch-0", "batch-1",
        "ord-000000000000", "ord-000000000001"),
        s"unexpected append log contents: $logNames")
    } finally {
      StreamingStaging.deleteRecursively(streamRoot)
      StreamingStaging.deleteRecursively(batchRoot)
    }
  }

  test("maintenance cadence: compaction fires exactly when the threshold crosses") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_maintained")
    val batchRoot = java.nio.file.Files.createTempDirectory("graft_idx_mbatch")
    try {
      // threshold 2: after batch 0 every cell holds ≤2 files (base build's
      // one + at most one from day 1) — under the threshold; after batch 1
      // the cells both days touched hold 3 — crossed. So a correct cadence
      // compacts nothing on batch 0 and >0 cells on batch 1.
      val streamed = resultRows(StreamingIndexAppend.indexDeltaStreaming(
        spark, dir, root.toString, maxFilesPerCell = 2))
      // the maintained (compacted mid-cadence) index answers bit-identically
      // to the batch build + single-append twin
      val e = graft.sources.Tables.embeddings(spark, dir)
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        e.filter(col("vec_id") % 8 =!= 7), batchRoot.toString)
      graft.operators.Similarity.appendToIvfPqIndexProd(spark,
        e.filter(col("vec_id") % 8 === 7), batchRoot.toString, "all")
      val batch = resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, batchRoot.toString))
      assert(batch.nonEmpty)
      assert(streamed == batch)
      // the maintenance artifact: exactly one row per micro-batch, with
      // compaction counts proving WHEN it fired
      val m = graft.operators.Similarity
        .indexMaintenanceReport(spark, root.toString)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(3), r.getInt(4))).toMap
      assert(m.keySet == Set(0L, 1L),
        s"expected one maintenance row per batch, got ${m.keySet}")
      assert(m(0L)._3 == 0,
        "compaction fired on batch 0, before any cell crossed the threshold")
      assert(m(1L)._3 > 0,
        "compaction never fired though batch 1 pushed cells past the threshold")
      // in-distribution drift on both batches (the held-out-slice band the
      // drift-report spec pins)
      m.values.foreach { case (_, drift, _) =>
        assert(drift < 0.0 && drift > -0.2, f"drift $drift%.4f out of band")
      }
      // and compaction did its job: no cell is left over the threshold
      val cellFiles = {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(root.resolve("postings.parquet"))
        try walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet"))
          .toSeq.groupBy(_.getParent.getFileName.toString)
          .map { case (c, fs) => c -> fs.size }
        finally walk.close()
      }
      assert(cellFiles.values.forall(_ <= 2),
        s"fragmented cells survived the cadence: $cellFiles")
    } finally {
      StreamingStaging.deleteRecursively(root)
      StreamingStaging.deleteRecursively(batchRoot)
    }
  }

  test("alias-routed ingest follows a mid-stream rotation; claims survive retries") {
    val alias = java.nio.file.Files.createTempDirectory("graft_idx_alias")
    val control = java.nio.file.Files.createTempDirectory("graft_idx_actl")
    val streamDir = java.nio.file.Files.createTempDirectory("graft_alias_src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_alias_ckpt")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val base = e.filter(col("vec_id") % 4 === 0)
      val d0 = e.filter(col("vec_id") % 8 === 1)
      val d1 = e.filter(col("vec_id") % 8 === 3)
      val d2 = e.filter(col("vec_id") % 8 === 5)
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark, base,
        s"$alias/v1")
      graft.operators.Similarity.publishIndexVersion(spark,
        alias.toString, "v1")
      // three staged files → batches 0, 1, 2 at maxFilesPerTrigger = 1;
      // the retrain SHIPS inside the stream, right after batch 0 commits
      Seq(d0, d1, d2).foreach(_.coalesce(1)
        .write.mode("append").parquet(streamDir.toString))
      val stream = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
      val query = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          StreamingIndexAppend.appendBatchAliased(spark,
            alias.toString)(b, id)
          if (id == 0L) {
            graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
              base.unionByName(d0), s"$alias/v2")
            graft.operators.Similarity.publishIndexVersion(spark,
              alias.toString, "v2")
          }
        }
        .option("checkpointLocation", ckpt.toString)
        .start()
      try query.processAllAvailable() finally query.stop()
      // routing: batch 0 landed on v1, batches 1-2 on the rotated v2
      def markers(v: String) = {
        import scala.jdk.CollectionConverters._
        val p = alias.resolve(v).resolve("_append_log")
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("batch-")).toSet
        finally s.close()
      }
      assert(markers("v1") == Set("batch-0"))
      assert(markers("v2") == Set("batch-1", "batch-2"))
      // the claims record the routing
      val ifs = graft.sources.IndexFs.on(spark, alias.toString)
      def claim(id: Int) = ifs.readUtf8(
        ifs.child("_alias", "_ingest_log", s"batch-$id"))
      assert(claim(0) == "v1" && claim(1) == "v2" && claim(2) == "v2")
      // a retry of batch 0 AFTER the rotation must follow its claim back
      // to v1 and no-op there — not double-land d0's rows into v2 (whose
      // build already contains them)
      val v2Rows = spark.read.parquet(s"$alias/v2/postings.parquet").count()
      StreamingIndexAppend.appendBatchAliased(spark, alias.toString)(d0, 0L)
      assert(markers("v1") == Set("batch-0"))
      assert(markers("v2") == Set("batch-1", "batch-2"),
        "a post-rotation retry re-landed its batch on the new version")
      assert(spark.read.parquet(s"$alias/v2/postings.parquet").count()
        == v2Rows)
      // and the rotated, streamed result equals the batch twin built the
      // same way with no rotation machinery
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        base.unionByName(d0), control.toString)
      graft.operators.Similarity.appendToIvfPqIndexProd(spark, d1,
        control.toString, "1")
      graft.operators.Similarity.appendToIvfPqIndexProd(spark, d2,
        control.toString, "2")
      val live = graft.operators.Similarity.resolveIndexAlias(spark,
        alias.toString)
      assert(live.endsWith("/v2"))
      val got = resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, live))
      val want = resultRows(graft.operators.Similarity.annIvfPqIndexed(
        spark, dir, control.toString))
      assert(want.nonEmpty)
      assert(got == want)
    } finally {
      StreamingStaging.deleteRecursively(alias)
      StreamingStaging.deleteRecursively(control)
      StreamingStaging.deleteRecursively(streamDir)
      StreamingStaging.deleteRecursively(ckpt)
    }
  }

  test("a retried (already-committed) batch is a no-op on the postings") {
    val root = java.nio.file.Files.createTempDirectory("graft_idx_retry")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        e.filter(col("vec_id") % 8 =!= 7), root.toString)
      val delta = e.filter(col("vec_id") % 8 === 7)
      StreamingIndexAppend.appendBatch(spark, root.toString)(delta, 0L)
      def postingsFiles() = {
        val walk = java.nio.file.Files.walk(root.resolve("postings.parquet"))
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(_.toString).toSet
        } finally walk.close()
      }
      val after1 = postingsFiles()
      StreamingIndexAppend.appendBatch(spark, root.toString)(delta, 0L)
      assert(postingsFiles() == after1,
        "retried batch 0 modified the postings — the commit log failed")
      // and a NEW batch id does append
      StreamingIndexAppend.appendBatch(spark, root.toString)(
        delta.limit(0), 1L)
      assert(java.nio.file.Files.exists(
        root.resolve("_append_log").resolve("batch-1")))
    } finally StreamingStaging.deleteRecursively(root)
  }

  test("torn-claim sweep is serialized and re-verified — never a blind delete") {
    val alias = java.nio.file.Files.createTempDirectory("graft_idx_torn")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        e.filter(col("vec_id") % 8 === 0), s"$alias/v1")
      graft.operators.Similarity.publishIndexVersion(spark,
        alias.toString, "v1")
      graft.operators.Similarity.buildIvfPqIndexProdOn(spark,
        e.filter(col("vec_id") % 8 === 1), s"$alias/v2")
      graft.operators.Similarity.publishIndexVersion(spark,
        alias.toString, "v2") // current: a blind re-route would pick v2
      val ifs = graft.sources.IndexFs.on(spark, alias.toString)
      val emptyBatch = e.limit(0)

      // ---- phase 1: a crashed sweeper's stale marker self-heals ----
      spark.conf.set("graft.index.tornClaimGraceMs", "100")
      try {
        ifs.createUtf8(ifs.child("_alias", "_ingest_log", "batch-8"), "")
        val ts8 = ifs.modTimeOf(ifs.child("_alias", "_ingest_log", "batch-8"))
        val crashed = alias.resolve("_alias").resolve("_ingest_log")
          .resolve(s"reclaim-batch-8-$ts8")
        java.nio.file.Files.writeString(crashed, s"batch-8:$ts8")
        java.nio.file.Files.setLastModifiedTime(crashed,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 60000L))
        StreamingIndexAppend.appendBatchAliased(spark, alias.toString)(
          emptyBatch, 8L)
        assert(ifs.readUtf8(
          ifs.child("_alias", "_ingest_log", "batch-8")) == "v2",
          "the healed claim must route to the current version")
        assert(!java.nio.file.Files.exists(crashed),
          "the crashed sweeper's marker husk must be reclaimed")
        assert(java.nio.file.Files.exists(
          alias.resolve("v2").resolve("_append_log").resolve("batch-8")))

        // ---- phase 2: a LIVE sweep marker blocks the straggler; the
        // winner's resolution is ADOPTED, not re-routed ----
        ifs.createUtf8(ifs.child("_alias", "_ingest_log", "batch-9"), "")
        val claim9 = ifs.child("_alias", "_ingest_log", "batch-9")
        val ts9 = ifs.modTimeOf(claim9)
        ifs.createUtf8(ifs.child("_alias", "_ingest_log",
          s"reclaim-batch-9-$ts9"), s"batch-9:$ts9") // live sweeper
        @volatile var failure: Option[Throwable] = None
        val straggler = new Thread(() => {
          try StreamingIndexAppend.appendBatchAliased(spark,
            alias.toString)(emptyBatch, 9L)
          catch { case t: Throwable => failure = Some(t) }
        }, "graft-torn-straggler")
        straggler.start()
        Thread.sleep(600L) // several grace expiries deep
        assert(ifs.exists(claim9),
          "the straggler deleted the torn claim despite the live marker")
        // the live sweeper finishes: it routes batch 9 to the OLD v1
        ifs.deleteFile(claim9)
        ifs.createUtf8(claim9, "v1")
        ifs.deleteFile(ifs.child("_alias", "_ingest_log",
          s"reclaim-batch-9-$ts9"))
        straggler.join(120000L)
        assert(!straggler.isAlive && failure.isEmpty,
          s"straggler did not adopt the winner's routing: $failure")
        assert(ifs.readUtf8(claim9) == "v1",
          "the winner's claim was rewritten")
        assert(java.nio.file.Files.exists(
          alias.resolve("v1").resolve("_append_log").resolve("batch-9")),
          "the straggler must follow the adopted claim to v1")
        assert(!java.nio.file.Files.exists(
          alias.resolve("v2").resolve("_append_log").resolve("batch-9")),
          "batch 9 double-landed on the current version")
      } finally spark.conf.unset("graft.index.tornClaimGraceMs")
    } finally StreamingStaging.deleteRecursively(alias)
  }
}
