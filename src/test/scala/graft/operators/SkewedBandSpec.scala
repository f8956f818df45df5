package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skew stress for the LSH band self-join — the dedup-specific skew the
  * q6_salted_skew proof does not cover: a pathological (band, bandHash)
  * bucket. A burst of IDENTICAL documents (a template page, a scraped
  * error page) produces identical MinHash signatures, so ONE bucket per
  * band holds the whole burst and the band self-join's shuffle partition
  * for that key is quadratic in the burst size while every other
  * partition is tiny.
  *
  * The scale answer is AQE's skew-join split: the skewed partition is
  * subdivided and joined in parallel sub-partitions, so the bucket costs
  * its pairs (which here are TRUE duplicates — output-sized work, not
  * waste) without serializing on one task. This spec proves the
  * mechanism ENGAGES on this exact plan — Spark marks the sort-merge
  * join `skew=true` — and that the pair semantics survive: every burst
  * pair is found with Jaccard 1.0, the clean corpus contributes nothing,
  * and cluster assignment still collapses the burst to one keeper. The
  * skew thresholds are lowered to make fixture-scale skew visible; the
  * PLAN property (split engaged, result exact) is scale-independent.
  */
class SkewedBandSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** A burst of identical docs + a clean tail of distinct docs. The
    * burst text has ≥ 3 words (shingles exist); the tail documents
    * share no 3-gram with the burst or each other. */
  private def skewedCorpus(burst: Int, clean: Int) = {
    import spark.implicits._
    val burstText =
      "all work and no play makes a dull template page for every crawl"
    val burstDocs = (0 until burst).map(i => (i.toLong, burstText))
    val cleanDocs = (0 until clean).map { i =>
      val words = (0 until 12).map(j => s"tok${i}x$j").mkString(" ")
      ((burst + i).toLong, words)
    }
    (burstDocs ++ cleanDocs).toDF("doc_id", "text")
  }

  test("giant (band, hash) bucket: AQE skew split engages and pairs stay exact") {
    val confs = Seq(
      // force the band self-join to sort-merge (the explicit broadcast()
      // hints inside the operator are unaffected by the threshold)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // enough shuffle partitions that the clean tail's many small keys
      // spread thin and the burst's hot buckets stand out from the
      // median partition — with the session default of a handful of
      // partitions every partition carries a hot bucket and none is
      // "skewed" relative to the others (exactly how a 100 TB job with
      // thousands of partitions sees a hot key)
      "spark.sql.shuffle.partitions" -> "64",
      // fixture-scale skew: flag partitions over 4 KiB at 2x median and
      // split to ~2 KiB targets (production keeps the 256 MiB defaults)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val burst = 600
      val docs = skewedCorpus(burst, clean = 200)
      val pairs = Dedup.minhashLshOn(docs)
      val t0 = System.nanoTime()
      val rows = pairs.collect()
      val elapsedS = (System.nanoTime() - t0) / 1e9
      // exact semantics under skew: all C(burst, 2) identical pairs at
      // Jaccard 1.0, nothing from the clean tail
      assert(rows.length == burst * (burst - 1) / 2,
        s"expected ${burst * (burst - 1) / 2} burst pairs, got ${rows.length}")
      assert(rows.forall(r => r.getDouble(2) == 1.0))
      assert(rows.forall(r => r.getLong(0) < burst && r.getLong(1) < burst))
      // the skewed shuffle join was actually SPLIT, not serialized on one
      // task: AQE marks the final sort-merge join skew=true
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not engage; plan:\n${plan.take(4000)}")
      // wall-clock sanity: quadratic-in-burst OUTPUT, but parallel —
      // generous bound so CI noise can't flake it
      assert(elapsedS < 120.0, s"skewed band join took ${elapsedS}s")
      // and the composition that consumes the pairs still collapses the
      // burst to one keeper
      val keepers = Dedup.clusterAssignOn(docs)
        .filter(col("is_keeper")).count()
      assert(keepers == 1 + 200, s"expected 201 keepers, got $keepers")
    } finally {
      spark.catalog.clearCache()
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
