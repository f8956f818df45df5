package graft.costs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField}

import ChallengeModel._

/** Observability bridge between the executable engine and the cost layer
  * (SURVEY §1.4): where the reference consults hand-written stats JSON,
  * this derives the same `CollectionSchema`/`CollectionStats` from a REAL
  * DataFrame — one aggregation pass computing the exact row count, an
  * `approx_count_distinct` per requested field (HLL++, deterministic on a
  * given dataset), and observed average byte widths for strings.
  *
  * The result plugs straight into [[ChallengePlanner]]/[[ChallengeSim]],
  * so one SQL string can be planned, cost-estimated from live statistics,
  * and executed ([[graft.plans.MiniSql]]) against the same tables —
  * `StatsCollectorSpec` closes that loop and checks the estimates against
  * actual row counts.
  *
  * Scale: a single `agg` over the table — partial-aggregated HLL sketches
  * shuffle once; nothing driver-side beyond the final one-row collect.
  */
object StatsCollector {

  /** Fixed-width sizes per Spark type; strings use the observed average
    * (the reference's defaults table, `challenge/loader.py:22-27`, is the
    * fallback when a column is all-null). */
  private def fixedSize(f: StructField): Option[Long] = f.dataType match {
    case StringType => None // measured
    case _ => Some(8L)
  }

  /** Tables at or below this row count profile distinct values EXACTLY
    * (`count_distinct`); above it, HLL++ (`approx_count_distinct`,
    * bounded sketch state, rsd ≈ 5%). Below the threshold exactness is
    * cheap — a multi-distinct agg expands rows ≤ |statFields|× through
    * one shuffle, fine at 10 M rows — and it removes the ONLY error
    * channel between a live-profiled cost run and the declared-stats
    * run (LiveStatsLeaderboardSpec: totals within 8% under HLL, ≤1%
    * exact). Above it the fixed-size sketch is the point: a 100 TB
    * table must not pay an exact-distinct expand to be profiled. */
  private[costs] val ExactDistinctMaxRows = 10000000L

  /** Profile `df` into a collection model: one count pass to pick the
    * distinct strategy, then ONE aggregation pass for all statistics.
    * The reported row count is the stats pass's own `count(1)` — NOT the
    * strategy pre-count — so every number in the returned model comes
    * from the same scan and stays mutually consistent even when the
    * source is non-deterministic or changing between the two passes
    * (the pre-count then only risks picking the other distinct strategy,
    * never an inconsistent stats row).
    *
    * @param statFields fields to gather distinct-value estimates for
    *                   (grouping/filter/join candidates)
    */
  def profile(
      name: String,
      df: DataFrame,
      primaryKey: String,
      shardingKey: String,
      indexes: List[String] = Nil,
      statFields: Seq[String] = Seq.empty): CollectionModel = {
    val fields = df.schema.fields.toSeq
    val stringFields = fields.filter(_.dataType == StringType).map(_.name)

    val preCount = df.count() // strategy selection only — never reported
    val distinctOf: String => org.apache.spark.sql.Column =
      if (preCount <= ExactDistinctMaxRows) f => count_distinct(col(f))
      else f => approx_count_distinct(col(f))
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        statFields.map(f => distinctOf(f).as(s"__d_$f")) ++
        stringFields.map(f =>
          ceil(avg(octet_length(col(f)))).cast("long").as(s"__w_$f"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val nbDocuments = row.getAs[Long]("__n")
    val distinct = statFields.map(f => f -> row.getAs[Long](s"__d_$f")).toMap
    val widths = stringFields.map { f =>
      f -> Option(row.getAs[Any](s"__w_$f")).map(_.asInstanceOf[Long])
        .getOrElse(80L)
    }.toMap

    val schema = CollectionSchema(name, primaryKey, fields.map { f =>
      val size = fixedSize(f).getOrElse(widths(f.name))
      f.name -> FieldSpec(f.name, size)
    })
    CollectionModel(schema,
      CollectionStats(nbDocuments, distinctValues = distinct),
      CollectionConfig(shardingKey, indexes))
  }

  /** Profile LIVE Product/OrderLine data into the exact statistics shape
    * the challenge's `stats.json` declares — row counts, the
    * grouping/filter/join distincts, AND the derived `orderLines` embed
    * array length (avg order lines per product = |OrderLine| /
    * |distinct OrderLine.IDP|, which is how the D3/D4 embedded-array
    * document sizing gets its 40.0 in the reference data). One
    * aggregation pass per collection; feeds
    * [[ChallengeReporting.runAll(stats*]] so the full leaderboard runs
    * off profiled numbers end-to-end. */
  def profileChallenge(product: DataFrame,
      orderLine: DataFrame): Map[String, ChallengeModel.CollectionStats] = {
    val p = profile("Product", product, primaryKey = "IDP",
      shardingKey = "IDP",
      statFields = Seq("IDP", "brand", "categorie")).stats
    val ol = profile("OrderLine", orderLine, primaryKey = "IDL",
      shardingKey = "IDP", statFields = Seq("IDP", "IDC")).stats
    val avgLines =
      ol.nbDocuments.toDouble / math.max(1L, ol.distinctValues("IDP"))
    Map(
      "Product" -> p.copy(
        avgArrayLengths = Map("orderLines" -> avgLines)),
      "OrderLine" -> ol)
  }
}
