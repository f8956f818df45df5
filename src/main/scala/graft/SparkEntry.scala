package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}

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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.entries ++ TextAnalysis.entries ++ Dedup.entries ++
      Similarity.entries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Similarity.oracles
}
