package graft.costs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import ChallengeModel._

/** Closes the plan → estimate → execute loop: one SQL string is planned
  * by the challenge planner over LIVE statistics profiled from the
  * fixture tables, cost-simulated, and executed by the mini-SQL front
  * end — and the simulator's cardinality estimates must be in the right
  * ballpark of the actual row counts. */
class StatsCollectorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val part = StatsCollector.profile("part",
    graft.sources.Tables.part(spark, dir),
    primaryKey = "p_partkey", shardingKey = "p_partkey",
    indexes = List("p_brand", "p_type"),
    statFields = Seq("p_partkey", "p_brand", "p_type"))

  private lazy val lineitem = StatsCollector.profile("lineitem",
    graft.sources.Tables.lineitem(spark, dir),
    primaryKey = "l_orderkey", shardingKey = "l_partkey",
    indexes = Nil,
    statFields = Seq("l_partkey", "l_orderkey"))

  test("profiled stats carry exact counts and sane distinct estimates") {
    val actualParts = graft.sources.Tables.part(spark, dir).count()
    assert(part.stats.nbDocuments == actualParts)
    // HLL++ estimate of a 200-key column lands near 200
    val d = part.stats.distinctValues("p_partkey")
    assert(d > actualParts * 0.9 && d < actualParts * 1.1, d)
    // observed string widths flow into the document size
    assert(part.documentSizeBytes > 5 * 8)
  }

  test("plan over live stats: estimates track the executed row counts") {
    val sql = "SELECT l.l_quantity, p.p_retailprice FROM lineitem l " +
      "JOIN part p ON l.l_partkey = p.p_partkey WHERE p.p_brand = 'Brand#4'"
    val models = Map("part" -> part, "lineitem" -> lineitem)
    val plan = ChallengePlanner.planQuery(QuerySpec("QS", sql), models, Map.empty)
    assert(plan.operators.last.operatorType.startsWith("nested_loop"))
    val result = ChallengeSim.simulatePlan(plan, models,
      ClusterConfig(1000L, 0.1))

    // executed via the mini-SQL front end — same SQL string
    val actualRows = graft.plans.MiniSql.execute(spark, dir, sql).count()
    assert(actualRows > 0)

    // the brand filter estimate: nb_parts / distinct(p_brand); the actual
    // per-brand count is within a small factor on the uniform fixture
    val brandFilter = result.operators
      .find(_.operator.name.endsWith("_filter_part")).get
    val actualBrandRows = graft.sources.Tables.part(spark, dir)
      .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#4").count()
    assert(brandFilter.outputDocs > 0)
    assert(brandFilter.outputDocs.toDouble / actualBrandRows < 3.0)
    assert(actualBrandRows.toDouble / brandFilter.outputDocs < 3.0)

    // scanned volume is positive and the join consumed the unfiltered
    // lineitem side plus the brand-filtered part side
    assert(result.scannedBytes > 0)
    assert(result.operators.last.scannedDocs ==
      lineitem.stats.nbDocuments + brandFilter.outputDocs)
  }
}
