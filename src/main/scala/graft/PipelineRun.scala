package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.sources.Tables

/** End-to-end corpus curation — the user story the operator library
  * exists for, composed from the same oracle-gated pieces:
  *
  *   1. quality gate  (`text_quality_rules` keep verdict)
  *   2. PII masking   (`text_pii_mask` rewrite, raw corpus — no planting)
  *   3. NEAR-dup removal (`dedup_clusters` on the raw corpus: MinHash+LSH
  *                     pairs → connected components → keep each cluster's
  *                     min doc_id)
  *   4. exact dedup   (md5 on the NORMALIZED text, keep min doc_id —
  *                     normalization-aware, so case/punctuation variants
  *                     collapse; catches what shingle-level LSH ignores)
  *   5. train/val/test split (content-keyed poly_hash — dedup-safe)
  *   6. one parquet write partitioned by split
  *
  * Each stage is a narrow transform or one shuffle; the composition adds
  * NO driver-side loops and no collects — the whole pipeline is one
  * DataFrame program Catalyst optimizes end to end (the dedup window and
  * the final write are the only wide stages). `PipelineSpec` pins the
  * stage-count invariants and determinism.
  *
  * `runMain graft.PipelineRun [sfDir] [outDir]` prints one JSON summary
  * line (same contract style as Bench).
  */
object PipelineRun {

  /** The curated corpus as a DataFrame (no side effects). */
  def curated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val keep = TextAnalysis.qualityRules(spark, dir)
      .filter(col("keep")).select(col("doc_id"))
    // mask the RAW corpus (the registry's text_pii_mask plants synthetic
    // PII for oracle coverage — that planting must not reach user output)
    val masked = TextAnalysis.piiMaskOn(
        docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("masked_text"))
    val norm = TextAnalysis.normalize(spark, dir)
      .select(col("doc_id"), col("norm_text"))
    val split = TextAnalysis.trainSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    // near-dup removal: cluster the RAW corpus's LSH pair graph and keep
    // only each duplicate cluster's canonical representative
    val nearKeepers = graft.operators.Dedup
      .clusterAssignOn(docs.select(col("doc_id"), col("text")))
      .filter(col("is_keeper")).select(col("doc_id"))
    val joined = docs.join(keep, "doc_id").join(masked, "doc_id")
      .join(norm, "doc_id").join(split, "doc_id")
      .join(nearKeepers, "doc_id")
    // normalization-aware exact dedup: keep the min doc_id per distinct
    // normalized text (32-byte md5 shuffle key, same shape as dedup_exact)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("norm_text"))).orderBy(col("doc_id"))
    (joined
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("masked_text"), col("lang"),
        col("source"), col("split")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/pipeline_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.requiredConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ranked stages (the dedup window) run on the bounded-heap operator
    graft.plans.TopKPlanning.register(spark)

    val out = curated(spark, sfDir)
    out.write.mode("overwrite").partitionBy("split").parquet(outDir)

    val total = Tables.documents(spark, sfDir).count()
    val written = spark.read.parquet(outDir)
    val bySplit = written.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val summary = Seq(
      "docs_in" -> total,
      "docs_out" -> written.count(),
      "train" -> bySplit.getOrElse("train", 0L),
      "val" -> bySplit.getOrElse("val", 0L),
      "test" -> bySplit.getOrElse("test", 0L))
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(summary)
    spark.stop()
  }
}
