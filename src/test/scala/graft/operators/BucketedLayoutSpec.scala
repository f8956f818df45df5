package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The executable analog of the reference's shuffle-avoidance claims:
  * "no shuffle when grouping/join keys align with the sharding key"
  * (`query_simulator/aggregate.py:218-237`, `chapter5/simulator.py:
  * 209-217`). On Spark the sharded layout is a bucketed table; Catalyst's
  * EnsureRequirements then elides the Exchange because the scan's
  * outputPartitioning already satisfies the required distribution. These
  * specs assert that on the PHYSICAL PLAN, not in comments.
  */
class BucketedLayoutSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    if (s.conf.getOption("spark.sql.warehouse.created").isEmpty) {
      s.conf.set("spark.sql.warehouse.created", "true")
    }
    s
  }

  /** AQE wraps the plan in AdaptiveSparkPlanExec, which `collect` does not
    * traverse — the rendered plan text shows the full tree either way.
    * Matches SHUFFLE exchanges only ("Exchange hashpartitioning(…)" etc.);
    * a BroadcastExchange moves no fact-side data and is the desired plan. */
  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findFirstIn(df.queryExecution.executedPlan.toString).nonEmpty

  private lazy val bucketedName: String = {
    val name = "lineitem_bucketed"
    if (!spark.catalog.tableExists(name)) {
      // external table at a fresh temp path — keeps reruns independent of
      // leftover spark-warehouse directories
      val loc = Files.createTempDirectory("graft_bucketed").resolve(name)
      graft.sources.Layouts.writeBucketed(
        graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity")),
        name, loc.toString, "l_partkey", numBuckets = 4)
    }
    name
  }

  test("q6-shaped aggregate on the bucketed layout runs with ZERO shuffles") {
    val agg = spark.table(bucketedName)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("total_quantity"))
    assert(!hasShuffle(agg), agg.queryExecution.executedPlan.toString)
    // same aggregate on the flat parquet layout DOES shuffle — the
    // contrast the reference prices as Q6-with vs without sharding
    val flat = graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("total_quantity"))
    assert(hasShuffle(flat), flat.queryExecution.executedPlan.toString)
    // and the results are identical
    assert(agg.orderBy("l_partkey").collect().toSeq ==
      flat.orderBy("l_partkey").collect().toSeq)
  }

  test("shard-partitioned layout: filter on the shard key prunes partitions") {
    // the executable analog of the reference's shard-targeted scan
    // (`challenge/simulator.py:57-61`: touch sharding_access_fraction of
    // the cluster): a layout partitioned by shard key + an equality filter
    // → Catalyst partition pruning reads 1 of 16 directories
    val dir = Files.createTempDirectory("graft_sharded").resolve("lineitem_sharded")
    graft.sources.Layouts.writeSharded(
      graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_quantity")),
      dir.toString, "l_partkey", numShards = 16)
    val shard3 = graft.sources.Layouts.readSharded(spark, dir.toString)
      .filter(col("shard") === 3)
    val plan = shard3.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(shard"), plan)
    // pruned scan touches exactly the one shard directory — proven from
    // the files actually read at execution time
    val scanned = shard3.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("shard=3")), scanned.toSeq)
    // and the pruned read returns exactly the rows of a post-hoc filter
    assert(shard3.count() ==
      spark.read.parquet(dir.toString)
        .filter(col("l_partkey") % 16 === 3).count())
  }

  test("compaction merges a small-files layout into right-sized sorted files") {
    // simulate the streaming-sink pathology: 64 tiny files
    val base = Files.createTempDirectory("graft_compact")
    val in = base.resolve("small").toString
    val out = base.resolve("compacted").toString
    graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .repartition(64).write.mode("overwrite").parquet(in)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(in), spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(p))
        .filter(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles(in).length == 64)
    val inBytes = parquetFiles(in).map(_.getLen).sum
    // target ~quarter of the input → expect a handful of files, far
    // fewer than 64, each within a loose band of the target
    val n = graft.sources.Layouts.compact(
      spark, in, out, "l_orderkey", targetBytes = inBytes / 4)
    val outFiles = parquetFiles(out)
    assert(n == outFiles.length)
    assert(n <= 8, s"expected <=8 compacted files, got $n")
    // nothing lost, nothing duplicated
    assert(spark.read.parquet(out).count() ==
      spark.read.parquet(in).count())
    // range clustering: per-file min/max on the sort key must not overlap
    // (strictly increasing file ranges), which is what footer-stat
    // pruning needs after compaction
    val ranges = outFiles.map { f =>
      val d = spark.read.parquet(f.getPath.toString)
        .agg(min("l_orderkey"), max("l_orderkey")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    for (Seq((_, hi), (lo2, _)) <- ranges.toSeq.sliding(2))
      assert(hi <= lo2, s"overlapping file ranges: $ranges")
  }

  test("AQE splits a skewed join partition (the claimed join-skew mitigation)") {
    // SCALING.md claims AQE skew-join absorbs hot join keys; prove it:
    // a join where one key holds most rows must show skew-split partitions
    // in the FINAL adaptive plan. Thresholds are scaled down to fixture
    // size (the mechanism, not the defaults, is what scales).
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: ~90% of lineitem rows collapse onto key 0 (the hot key);
      // right: plain uniform dimension scan — the rule only fires on
      // SMJ(Sort(shuffle), Sort(shuffle)) where the OTHER side of the
      // skewed partition is not itself skewed
      val l = graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
        // skew splitting works by map-index ranges — a single-file scan
        // is one mapper and cannot be split, so spread it over 8 first
        // (at real scale a 100 TB fact side has thousands of mappers)
        .repartition(8)
        .select(when(col("l_partkey") % 10 =!= 0, lit(0L))
          .otherwise(col("l_partkey")).as("k"), col("l_quantity"))
      val r = graft.sources.Tables.part(spark, TestSpark.sfDir)
        .select(col("p_partkey").as("k"), col("p_brand"))
      val joined = l.join(r, "k")
      // materialize THIS DataFrame's own query execution so its adaptive
      // plan re-plans with runtime sizes (count() would build a separate
      // QueryExecution and leave this one unexecuted)
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      assert(plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed history band index: incremental-dedup join shuffles ONLY the delta") {
    // the incremental-dedup scale contract (SCALING.md §dedup): the
    // history band index is PERSISTED bucketed by bandHash, so the per-
    // batch delta join re-shuffles the (small) delta side only — the
    // corpus-sized index side reads straight from its buckets
    val name = "hist_band_index"
    if (!spark.catalog.tableExists(name)) {
      val loc = Files.createTempDirectory("graft_band_idx").resolve(name)
      val history = graft.sources.Tables.documents(spark, TestSpark.sfDir)
        .select(col("doc_id"), col("text"))
      val idx = Dedup.bandHashes(history)
        .select(col("doc_id").as("hist_id"),
          posexplode(col("bands")).as(Seq("band", "bandHash")))
      graft.sources.Layouts.writeBucketedOn(idx, name, loc.toString,
        Seq("band", "bandHash"), numBuckets = 4)
    }
    val idxT = spark.table(name)
    val delta = graft.sources.Tables.documents(spark, TestSpark.sfDir)
      .filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val deltaBands = Dedup.bandHashes(delta)
      .select(col("doc_id").as("delta_id"),
        posexplode(col("bands")).as(Seq("band", "bandHash")))
    // force the shuffle join shape the claim is about (at fixture scale
    // the planner would otherwise broadcast the delta side)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = deltaBands.join(idxT, Seq("band", "bandHash"))
      val plan = joined.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 1, s"expected only the delta-side shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"history side must read from buckets:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("co-bucketed self-join runs with ZERO shuffles (aligned join keys)") {
    val t = spark.table(bucketedName)
    val totals = t.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("tq"))
    val joined = t.join(totals, "l_partkey")
    // bucketed scan satisfies both the aggregate's and the join's
    // required distribution on l_partkey → no Exchange anywhere
    assert(!hasShuffle(joined), joined.queryExecution.executedPlan.toString)
    assert(joined.count() > 0)
  }
}
