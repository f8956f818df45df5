package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Denorm, Events, Multimodal, Relational, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's registry; each key has
  * a matching `oracleSql` entry (ANSI SQL DuckDB runs over the same parquet
  * fixtures) unless the operation is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q5: the reference's widest plan shape — multi-way filtered join
    * (`query_simulator/queries.py:89-123`). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5OrdersBrandClientJoin(spark, "/root/testdata/sf0.001")

  /** The PRODUCTION registry: every operator exactly as a user would run
    * it — no canonicalization, no global sort. This is what Bench times. */
  def productionQueries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.entries ++ TextAnalysis.entries ++ Dedup.entries ++
      Similarity.entries ++ Events.entries ++ Denorm.entries ++
      Multimodal.entries ++ graft.plans.MiniSql.entries

  /** Deterministic total order over all columns — the one extra operator
    * the ORACLE registry adds on top of [[productionQueries]] so the
    * driver's row-hash compare is order-stable. Applied here at the
    * registry boundary, not inside the operators: production plans carry
    * no global Sort (`ProductionRegistrySpec` pins that on the physical
    * plan). */
  private def canonical(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(df.col).toIndexedSeq: _*)

  /** One entry per implemented operator from SURVEY.md §2, canonicalized
    * for the driver's Verify/DuckDB hash compare. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    productionQueries.view.mapValues(fn =>
      (s: SparkSession, d: String) => canonical(fn(s, d))).toMap

  /** O(n²) correctness baselines: they exist to prove the LSH/scale paths
    * exact on the fixtures (run by Verify at sf0.01), but must not be
    * *timed* at full n — at sf0.1 the three of them were 96% of the r2
    * bench wall-clock while proving nothing about the scale paths. */
  val baselineOnly: Set[String] = Set(
    "dedup_jaccard_brute", "sim_cosine_topk", "sim_cosine_neardup")

  /** The scale-path queries Bench times: production (un-canonicalized)
    * forms, minus the O(n²) oracle baselines. */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    productionQueries -- baselineOnly

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ Events.oracles ++ Denorm.oracles ++
      Multimodal.oracles ++ graft.plans.MiniSql.oracles
}
