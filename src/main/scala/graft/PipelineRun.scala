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
  * Composition shape (the 100 TB story): stages 1, 2, 4's key and 5 are
  * ALL per-row expressions over `text`, so they ride ONE corpus scan as
  * one codegen'd projection — no self-joins re-reading the corpus per
  * stage (the previous form joined four derived frames of the same scan
  * back on doc_id: four avoidable corpus-sized shuffles). Near-dup
  * removal lands as a broadcast ANTI join against the duplicate-LOSER id
  * frame ([[graft.operators.Dedup.nearDupLoserIds]], ∝ true duplicates —
  * broadcastable by construction). The dedup window is the single wide
  * stage (32-byte md5 shuffle key), and it runs on the bounded-heap
  * top-k operator. `PipelineSpec` pins the behavioral invariants,
  * `PlanBudgetSpec` the 1-shuffle plan, and `pipeline_curated` is
  * oracle-gated end to end by [[curatedOracle]].
  *
  * `runMain graft.PipelineRun [sfDir] [outDir]` prints one JSON summary
  * line (same contract style as Bench).
  */
object PipelineRun {

  /** The curated corpus as a DataFrame (no side effects). */
  def curated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // near-dup losers: cluster the RAW corpus's LSH pair graph; every id
    // that is not its cluster's min — a duplicate-proportional frame
    val losers = graft.operators.Dedup
      .nearDupLoserIds(docs.select(col("doc_id"), col("text")))
    // one projection computes every per-row stage (the registry's
    // text_pii_mask plants synthetic PII for oracle coverage — the raw
    // corpus is masked here, no planting)
    val enriched = docs.select(
      col("doc_id"),
      TextAnalysis.piiMaskedExpr.as("masked_text"),
      col("lang"), col("source"),
      TextAnalysis.splitExpr.as("split"),
      TextAnalysis.normalizedExpr.as("norm_text"),
      TextAnalysis.qualityKeepExpr.as("keep"))
    // normalization-aware exact dedup: keep the min doc_id per distinct
    // normalized text (32-byte md5 shuffle key, same shape as dedup_exact)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("norm_text"))).orderBy(col("doc_id"))
    (enriched
      .filter(col("keep"))
      .join(broadcast(losers), Seq("doc_id"), "left_anti")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("masked_text"), col("lang"),
        col("source"), col("split")))
  }

  /** DuckDB replay of the WHOLE composition — each stage's own oracle
    * fragment (quality keep, mask chain, normalization, split case,
    * shared-shingle near-dup keepers) chained exactly as [[curated]]
    * chains the expressions, ending in the same min-doc_id-per-norm-hash
    * window. A defect in any stage, or in how the stages compose, breaks
    * the row hash. */
  val curatedOracle: String = {
    import graft.operators.{Dedup, TextAnalysis => TA}
    s"""WITH RECURSIVE ${Dedup.rawKeepersCtes},
       |j AS (SELECT d.doc_id,
       |             ${TA.piiMaskedSql} AS masked_text,
       |             d.lang, d.source,
       |             ${TA.splitCaseSql} AS split,
       |             md5(${TA.normTextSql}) AS norm_hash
       |      FROM documents d
       |      JOIN keepers USING (doc_id)
       |      WHERE ${TA.qualityKeepSql}),
       |r AS (SELECT *, row_number() OVER (PARTITION BY norm_hash
       |                                   ORDER BY doc_id) AS rnk
       |      FROM j)
       |SELECT doc_id, masked_text, lang, source, split
       |FROM r WHERE rnk = 1 ORDER BY 1, 2, 3, 4, 5""".stripMargin
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
