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
      graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .write.mode("overwrite")
        .option("path", loc.toString)
        .bucketBy(4, "l_partkey").sortBy("l_partkey")
        .saveAsTable(name)
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
    graft.sources.Tables.lineitem(spark, TestSpark.sfDir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"))
      .withColumn("shard", (col("l_partkey") % 16).cast("int"))
      .write.partitionBy("shard").parquet(dir.toString)
    val shard3 = spark.read.parquet(dir.toString).filter(col("shard") === 3)
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
