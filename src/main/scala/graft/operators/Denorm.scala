package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Denormalization (embed) layer — the reference's signature capability
  * (SURVEY §2 O11, §2.5 rows 15–16), realized as *executable* nested
  * DataFrame layouts instead of cost arithmetic.
  *
  * The reference models embeds declaratively: an `EmbedSpec{source, target,
  * path, cardinality}` copies the source collection's fields into the
  * target under `path.field` (reference `challenge/loader.py:109-182`), and
  * the planner then rewrites a join query into a single-collection filter
  * whenever an embed covers the joined collection
  * (`challenge/planner.py:168-222`). The invariant the reference tests
  * (`tests/test_challenge.py:102-117`) is that the rewritten plan answers
  * the same query without a join — here we prove the *data* equivalence:
  * the nested layout's answer hash-matches the flat join's oracle.
  *
  * Domain mapping (FIXTURES.md): Product→part, OrderLine→lineitem; the two
  * layouts below are the reference's D2 (OrderLine embeds Product,
  * cardinality=one — `challenge/denormalizations.json`, `schemas/db4.json`)
  * and D3 (Product embeds orderLines[], cardinality=many —
  * `schemas/db5.json`).
  *
  * Scale story (100 TB):
  *   - one-to-one embed = fact ⋈ broadcast(dimension) + `struct` — the fact
  *     side never shuffles; materialization is a map-only job.
  *   - one-to-many embed = one shuffle of the projected fact columns on the
  *     embed key (`groupBy` + `collect_list(struct)`); the dimension joins
  *     broadcast. Written once, it converts every query on the embed path
  *     into a shuffle-free narrow scan — exactly the trade the reference's
  *     cost model prices (D2/D3 vs D1 leaderboards).
  *   - embed-rewritten queries are single-collection scans with filters on
  *     nested fields; Catalyst pushes struct-field predicates and prunes
  *     unaccessed struct fields from the parquet read (nested schema
  *     pruning), so the rewrite wins at scale the same way it wins in the
  *     reference's cost units.
  */
object Denorm {

  /** D2-style one-to-one embed: every lineitem row carries its part as a
    * nested `product` struct (reference `challenge/loader.py:109-128`,
    * cardinality="one"). The dimension is unfiltered, so no `broadcast()`
    * hint — size-based planning/AQE broadcasts while `part` fits (keeping
    * the materialization map-only) and falls back to a shuffle join when
    * the dimension scales past the threshold, instead of OOMing on an
    * unconditional hint (`JoinPlanningSpec`). */
  def productEmbedded(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_retailprice"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"),
        struct(col("p_name"), col("p_brand"), col("p_type"),
          col("p_retailprice")).as("product"))
  }

  /** D3-style one-to-many embed: every part row carries its lineitems as a
    * nested `lines` array of structs (reference `challenge/loader.py:
    * 109-128`, cardinality="many"; `avg_array_lengths[path]` multiplier at
    * `challenge/models.py:20-27`). One shuffle on the embed key. */
  def linesEmbedded(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(collect_list(struct(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))).as("lines"))
    Tables.part(spark, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
      .join(lines, col("p_partkey") === col("l_partkey"))
      .drop("l_partkey")
  }

  /** Embed materialization proof (one-to-one): build the nested layout,
    * then read the embedded fields back out — the oracle is the flat join,
    * so a hash-match proves the embed preserved every (row, field). */
  def embedOne(spark: SparkSession, dir: String): DataFrame = (
    productEmbedded(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("product.p_brand").as("p_brand"),
        col("product.p_retailprice").as("p_retailprice")))

  val embedOneOracle: String =
    """SELECT l_orderkey, l_linenumber, l_partkey, p_brand, p_retailprice
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** Embed materialization proof (one-to-many): build the array-of-structs
    * layout, explode it back flat; hash-match vs the flat join shows the
    * grouping lost/duplicated nothing. */
  def embedMany(spark: SparkSession, dir: String): DataFrame = (
    linesEmbedded(spark, dir)
      .select(col("p_partkey"), col("p_brand"), explode(col("lines")).as("ln"))
      .select(col("p_partkey"), col("p_brand"),
        col("ln.l_orderkey").as("l_orderkey"),
        col("ln.l_linenumber").as("l_linenumber"),
        col("ln.l_quantity").as("l_quantity")))

  val embedManyOracle: String =
    """SELECT p_partkey, p_brand, l_orderkey, l_linenumber, l_quantity
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** The denormalization payoff for aggregates: `size(lines)` over the
    * nested layout answers "lineitems per part" with no join and no
    * shuffle at query time — the work was paid once at materialization
    * (the executable analog of the reference's D3 cost advantage on
    * grouped queries). */
  def embedAgg(spark: SparkSession, dir: String): DataFrame = (
    linesEmbedded(spark, dir)
      .select(col("p_partkey"), col("p_brand"),
        size(col("lines")).cast("long").as("n_lines")))

  val embedAggOracle: String =
    """SELECT p_partkey, p_brand, count(*) AS n_lines
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |GROUP BY 1, 2 ORDER BY 1, 2, 3""".stripMargin

  /** The O11 join-elimination rewrite, executed: challenge Q2 (per-side
    * filters + join, `Relational.challengeQ2`) answered from the D2 nested
    * layout as a SINGLE-collection filter on an embedded field
    * (`product.p_brand`) — no join in this query's plan. Its oracle is the
    * flat-join SQL (`Relational.challengeQ2Oracle`), so the hash-match IS
    * the reference's rewrite-equivalence invariant
    * (`tests/test_challenge.py:102-117`, rewrite logic
    * `challenge/planner.py:168-222`). */
  def rewriteQ2(spark: SparkSession, dir: String): DataFrame = (
    productEmbedded(spark, dir)
      .filter(col("l_orderkey") === Relational.OrderKeyQ2 &&
        col("product.p_brand") === Relational.Brand)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("product.p_retailprice").as("p_retailprice")))

  // --- registry ------------------------------------------------------------

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "denorm_embed_one" -> (embedOne _),
    "denorm_embed_many" -> (embedMany _),
    "denorm_embed_agg" -> (embedAgg _),
    "denorm_rewrite_q2" -> (rewriteQ2 _))

  val oracles: Map[String, String] = Map(
    "denorm_embed_one" -> embedOneOracle,
    "denorm_embed_many" -> embedManyOracle,
    "denorm_embed_agg" -> embedAggOracle,
    "denorm_rewrite_q2" -> Relational.challengeQ2Oracle)
}
