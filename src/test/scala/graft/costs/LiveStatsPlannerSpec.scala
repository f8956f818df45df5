package graft.costs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import ChallengeModel._

/** The end-to-end optimizer demo (SURVEY §1.4 closed loop): the SAME
  * planner code ([[ChallengePlanner.planQuery]]) plans the challenge
  * workload from TWO statistics sources —
  *
  *   1. the reference's hand-written stats JSON (transcribed in
  *      [[ChallengeModel.refStats]], the D1 physical design), exactly
  *      as `challenge/run.py` consumes it; and
  *   2. LIVE statistics profiled from the actual parquet fixtures by
  *      [[StatsCollector.profile]] (exact row counts, HLL++ distincts,
  *      observed string widths) under the structurally identical
  *      physical design (part ↔ Product: sharded on its key, brand/type
  *      indexed; lineitem ↔ OrderLine: sharded on the join key, the
  *      lookup key indexed)
  *
  * — and must make the SAME scan-strategy choices for the structurally
  * identical workload (Q1: equality filter on an indexed non-shard
  * field; Q2: per-side filters + a shard-aligned join). Strategy comes
  * from the physical design; stats drive the COST arithmetic — the last
  * test pins that the live numbers actually flow through (perturbing a
  * profiled distinct count moves the simulated cardinality).
  */
class LiveStatsPlannerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  // --- source 1: the reference's stats JSON, D1 design -------------------
  private lazy val refModels = buildDatabaseModels(refSchemas, refStats,
    refDenorms.find(_.id == "D1").get)

  // --- source 2: live-profiled parquet under the analogous design --------
  private lazy val liveModels: Map[String, CollectionModel] = Map(
    "part" -> StatsCollector.profile("part",
      graft.sources.Tables.part(spark, dir),
      primaryKey = "p_partkey", shardingKey = "p_partkey",
      indexes = List("p_brand", "p_type"),
      statFields = Seq("p_partkey", "p_brand", "p_type")),
    "lineitem" -> StatsCollector.profile("lineitem",
      graft.sources.Tables.lineitem(spark, dir),
      primaryKey = "l_orderkey", shardingKey = "l_partkey",
      indexes = List("l_orderkey"),
      statFields = Seq("l_partkey", "l_orderkey")))

  /** The live workload, shape-for-shape the reference's Q1/Q2 (the
    * mini-SQL registry rows `sql_challenge_q1/q2` execute the same
    * strings against the same tables). */
  private val liveQ1 = QuerySpec("Q1L",
    "SELECT p_name FROM part WHERE p_type = 'PROMO';", 1000.0)
  private val liveQ2 = QuerySpec("Q2L",
    "SELECT l.l_quantity, p.p_retailprice FROM lineitem l " +
      "JOIN part p ON l.l_partkey = p.p_partkey " +
      "WHERE p.p_brand = 'Brand#4' AND l.l_orderkey = 1149;", 100.0)

  private def shape(plan: QueryPlan): List[(String, Option[String])] =
    plan.operators.map(op => (op.operatorType, op.scanStrategy))

  test("live-profiled stats yield the reference's strategy choices, query for query") {
    val refQ1 = ChallengePlanner.planQuery(refQueries.head, refModels, Map.empty)
    val refQ2 = ChallengePlanner.planQuery(refQueries(1), refModels, Map.empty)
    val livQ1 = ChallengePlanner.planQuery(liveQ1, liveModels, Map.empty)
    val livQ2 = ChallengePlanner.planQuery(liveQ2, liveModels, Map.empty)
    // Q1: one filter, chosen as an INDEX scan (categorie / p_type are
    // indexed, not the sharding key) — identical operator type + strategy
    assert(shape(refQ1) == List(("filter_without_sharding", Some("index"))))
    assert(shape(livQ1) == shape(refQ1))
    // Q2: two pushed-down per-side index filters, then the shard-ALIGNED
    // join (both sides sharded on the join key) — identical sequences
    assert(shape(refQ2) == List(
      ("filter_without_sharding", Some("index")),
      ("filter_without_sharding", Some("index")),
      ("nested_loop_with_sharding", None)))
    assert(shape(livQ2) == shape(refQ2))
  }

  test("the sharding key flips the live strategy to a shard-targeted scan") {
    // same planner, same live stats, filter moved onto the sharding key:
    // the reference's chooseScanStrategy contract (planner.py:115-124)
    val q = QuerySpec("QS",
      "SELECT p_name FROM part WHERE p_partkey = 42;", 1.0)
    val plan = ChallengePlanner.planQuery(q, liveModels, Map.empty)
    assert(shape(plan) == List(("filter_with_sharding", Some("shard"))))
  }

  test("live numbers drive the cost arithmetic, not just the plan shape") {
    val cluster = ClusterConfig(1000L, 0.1)
    val plan = ChallengePlanner.planQuery(liveQ2, liveModels, Map.empty)
    val sim = ChallengeSim.simulatePlan(plan, liveModels, cluster)
    val brandFilter = sim.operators
      .find(_.operator.name.endsWith("_filter_part")).get
    assert(brandFilter.outputDocs > 0)
    // perturb ONLY the profiled distinct count of the filtered field:
    // the simulated cardinality must shrink accordingly — proof the
    // live-profiled numbers (not defaults) feed the arithmetic
    val part = liveModels("part")
    val doubled = liveModels + ("part" -> part.copy(stats = part.stats.copy(
      distinctValues = part.stats.distinctValues +
        ("p_brand" -> part.stats.distinctValues("p_brand") * 2))))
    val sim2 = ChallengeSim.simulatePlan(plan, doubled, cluster)
    val brandFilter2 = sim2.operators
      .find(_.operator.name.endsWith("_filter_part")).get
    assert(brandFilter2.outputDocs < brandFilter.outputDocs,
      s"${brandFilter2.outputDocs} !< ${brandFilter.outputDocs}")
  }
}
