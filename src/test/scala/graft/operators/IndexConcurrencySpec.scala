package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** TRUE-CONCURRENCY exercise of the persisted-index lifecycle: real
  * parallel writer threads released through one barrier, over the
  * `graftfs://` scheme (so every metadata touch routes through the
  * Hadoop FS abstraction the protocol is written against, not
  * `java.nio.file`). `IndexLifecycleFuzzSpec` replays seeded
  * SEQUENTIAL interleavings; this spec runs the races the commit-log
  * protocol claims to survive — append ∥ append, append ∥ delete,
  * delete ∥ full purge, routed append ∥ alias rotation — and asserts
  * the same invariants after the dust settles: visible set equals the
  * model, seqs unique, retries no-ops, no erased vector resurrected.
  *
  * The two races the protocol does NOT claim are stated in the
  * verbs' scaladoc instead of half-held here: duplicate concurrent
  * submissions of ONE batch id (sequential retry is the contract —
  * [[Similarity.appendToIvfPqIndex]]), and compaction racing appends
  * ([[Similarity.compactIvfPqIndex]] — partition overwrite replaces
  * whole cell directories from a snapshot). */
class IndexConcurrencySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[graft.sources.GraftTestFs].getName)
    s
  }
  private val dir = TestSpark.sfDir

  /** Run the thunks on real threads, all released by one barrier;
    * returns each thread's failure if it threw. */
  private def race(thunks: (() => Unit)*): Vector[Option[Throwable]] = {
    val barrier = new java.util.concurrent.CyclicBarrier(thunks.size)
    val results = Array.fill[Option[Throwable]](thunks.size)(None)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      new Thread(() => {
        results(i) =
          try { barrier.await(); t(); None }
          catch { case e: Throwable => Some(e) }
      }, s"graft-race-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000L))
    assert(threads.forall(!_.isAlive), "a racing writer is still running")
    results.toVector
  }

  private def newRoot(tag: String): (java.nio.file.Path, String) = {
    val local = java.nio.file.Files.createTempDirectory(s"graft_conc_$tag")
    (local, "graftfs:" + local.toString)
  }

  private def postingIds(root: String): Set[Long] =
    spark.read.parquet(s"$root/postings.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet

  private def fileHashes(local: java.nio.file.Path): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val md = java.security.MessageDigest.getInstance("MD5")
    val walk = java.nio.file.Files.walk(local)
    try walk.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map { p =>
        md.reset()
        local.relativize(p).toString ->
          md.digest(java.nio.file.Files.readAllBytes(p))
            .map("%02x".format(_)).mkString
      }.toMap
    finally walk.close()
  }

  test("two racing appends of different batches: both commit, seqs unique") {
    val (local, root) = newRoot("appapp")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val base = e.filter(col("vec_id") % 4 === 0)
      Similarity.buildIvfPqIndexOn(spark, base, root)
      val d1 = e.filter(col("vec_id") % 4 === 1)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val d2 = e.filter(col("vec_id") % 4 === 2)
        .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))
      val outcomes = race(
        () => Similarity.appendToIvfPqIndex(spark, d1, root, "crawl-a"),
        () => Similarity.appendToIvfPqIndex(spark, d2, root, "crawl-b"))
      assert(outcomes.flatten.isEmpty,
        s"racing appends threw: ${outcomes.flatten.map(_.toString)}")
      val want = (base.select(col("vec_id")) union d1.select(col("vec_id"))
        union d2.select(col("vec_id"))).collect().map(_.getLong(0)).toSet
      assert(postingIds(root) == want, "a racing append lost rows")
      val drift = Similarity.indexDriftReport(spark, root)
        .select(col("batch_id"), col("seq")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(drift.map(_._1).toSet == Set("crawl-a", "crawl-b"))
      assert(drift.map(_._2).toSet == Set(0L, 1L),
        s"racing appends minted non-unique/non-dense seqs: ${drift.toSeq}")
      val desc = Similarity.describeIndex(spark, root).head()
      assert(desc.getAs[Long]("committed_appends") == 2L)
      // sequential retries of both batches are byte-level no-ops
      val once = fileHashes(local)
      Similarity.appendToIvfPqIndex(spark, d1, root, "crawl-a")
      Similarity.appendToIvfPqIndex(spark, d2, root, "crawl-b")
      assert(fileHashes(local) == once, "a retried append mutated bytes")
      // no staging husk survives a committed batch
      assert(!java.nio.file.Files.exists(local.resolve("_append_staging"))
        || local.resolve("_append_staging").toFile.list().isEmpty)
    } finally graft.streaming.StreamingStaging.deleteRecursively(local)
  }

  test("append racing a delete: both commit, erasure holds through the race") {
    val (local, root) = newRoot("appdel")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val base = e.filter(col("vec_id") % 4 =!= 3)
      Similarity.buildIvfPqIndexOn(spark, base, root)
      val delta = e.filter(col("vec_id") % 4 === 3)
        .select((col("vec_id") + 3000000L).as("vec_id"), col("embedding"))
      val dead = base.filter(col("vec_id") % 10 === 6).select(col("vec_id"))
      val deadIds = dead.collect().map(_.getLong(0)).toSet
      assert(deadIds.nonEmpty)
      val outcomes = race(
        () => Similarity.appendToIvfPqIndex(spark, delta, root, "crawl-c"),
        () => Similarity.deleteFromIvfPqIndex(spark, dead, root, "erase-1"))
      assert(outcomes.flatten.isEmpty,
        s"append∥delete threw: ${outcomes.flatten.map(_.toString)}")
      val baseIds = base.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      val deltaIds = delta.select(col("vec_id")).collect()
        .map(_.getLong(0)).toSet
      // visibility: postings minus tombstones == base + delta - dead
      val desc = Similarity.describeIndex(spark, root).head()
      assert(desc.getAs[Long]("committed_appends") == 1L)
      assert(desc.getAs[Long]("committed_deletes") == 1L)
      assert(desc.getAs[Long]("tombstoned_ids") == deadIds.size)
      assert(postingIds(root) == baseIds ++ deltaIds,
        "the race dropped appended or base rows")
      val served = Similarity.annIvfPqIndexed(spark, dir, root)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(served.nonEmpty)
      served.foreach { case (q, n) =>
        assert(!deadIds.contains(q) && !deadIds.contains(n),
          s"erased id served after append∥delete race: $q / $n")
      }
      // retries of both verbs are byte no-ops
      val once = fileHashes(local)
      Similarity.appendToIvfPqIndex(spark, delta, root, "crawl-c")
      Similarity.deleteFromIvfPqIndex(spark, dead, root, "erase-1")
      assert(fileHashes(local) == once, "a retried verb mutated bytes")
    } finally graft.streaming.StreamingStaging.deleteRecursively(local)
  }

  test("delete racing a full purge: no resurrection, next pass erases the late batch") {
    val (local, root) = newRoot("delpurge")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      Similarity.buildIvfPqIndexOn(spark, e, root)
      val dead1 = e.filter(col("vec_id") % 10 === 2).select(col("vec_id"))
      val dead1Ids = dead1.collect().map(_.getLong(0)).toSet
      val dead2 = e.filter(col("vec_id") % 10 === 7).select(col("vec_id"))
      val dead2Ids = dead2.collect().map(_.getLong(0)).toSet
      Similarity.deleteFromIvfPqIndex(spark, dead1, root, "erase-a")
      val outcomes = race(
        () => { Similarity.compactIvfPqIndex(spark, root,
          maxFilesPerCell = 0); () },
        () => Similarity.deleteFromIvfPqIndex(spark, dead2, root, "erase-b"))
      assert(outcomes.flatten.isEmpty,
        s"purge∥delete threw: ${outcomes.flatten.map(_.toString)}")
      // the pre-existing batch is physically gone (the purge's claim)
      val left = postingIds(root)
      assert((left & dead1Ids).isEmpty,
        "full purge left rows of the already-committed erasure batch")
      // the racing batch may or may not have been caught by this pass,
      // but its tombstones stay AUTHORITATIVE: nothing resurfaces
      val served = Similarity.annIvfPqIndexed(spark, dir, root)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(served.nonEmpty)
      served.foreach { case (q, n) =>
        assert(!dead1Ids.contains(q) && !dead1Ids.contains(n))
        assert(!dead2Ids.contains(q) && !dead2Ids.contains(n),
          s"mid-purge erasure batch resurfaced: $q / $n")
      }
      // the NEXT maintenance pass physically erases the late batch too
      Similarity.compactIvfPqIndex(spark, root, maxFilesPerCell = 0)
      assert((postingIds(root) & dead2Ids).isEmpty,
        "second purge pass left the mid-purge batch's bytes on disk")
      val desc = Similarity.describeIndex(spark, root).head()
      assert(desc.getAs[Long]("committed_deletes") == 2L)
    } finally graft.streaming.StreamingStaging.deleteRecursively(local)
  }

  test("routed streaming append racing an alias rotation lands in exactly one real version") {
    val (local, alias) = newRoot("rot")
    try {
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      Similarity.buildIvfPqIndexOn(spark,
        e.filter(col("vec_id") % 4 =!= 3), s"$alias/v-001")
      Similarity.publishIndexVersion(spark, alias, "v-001")
      Similarity.buildIvfPqIndexOn(spark,
        e.filter(col("vec_id") % 4 =!= 3), s"$alias/v-002")
      val batch = e.filter(col("vec_id") % 4 === 3)
        .select((col("vec_id") + 4000000L).as("vec_id"), col("embedding"))
      val batchIds = batch.collect().map(_.getLong(0)).toSet
      val outcomes = race(
        () => graft.streaming.StreamingIndexAppend
          .appendBatchAliased(spark, alias)(batch, 7L),
        () => Similarity.publishIndexVersion(spark, alias, "v-002"))
      assert(outcomes.flatten.isEmpty,
        s"rotation∥append threw: ${outcomes.flatten.map(_.toString)}")
      // the rotation won the alias; the batch landed under its CLAIMED
      // version — which must be a real version directory, fully
      // committed there, and nowhere else
      assert(Similarity.resolveIndexAlias(spark, alias) == s"$alias/v-002")
      val claim = java.nio.file.Files.readString(
        local.resolve("_alias").resolve("_ingest_log").resolve("batch-7"))
      assert(Set("v-001", "v-002").contains(claim),
        s"claim names no real version: '$claim'")
      val inClaimed = postingIds(s"$alias/$claim")
      assert((batchIds -- inClaimed).isEmpty,
        s"batch only partially committed under claimed version $claim")
      val other = if (claim == "v-001") "v-002" else "v-001"
      assert((postingIds(s"$alias/$other") & batchIds).isEmpty,
        "batch leaked into the non-claimed version")
      // a replay of the same micro-batch follows the claim and no-ops
      val once = fileHashes(local)
      graft.streaming.StreamingIndexAppend
        .appendBatchAliased(spark, alias)(batch, 7L)
      assert(fileHashes(local) == once,
        "replayed micro-batch was not routed to its claim / not a no-op")
    } finally graft.streaming.StreamingStaging.deleteRecursively(local)
  }
}
