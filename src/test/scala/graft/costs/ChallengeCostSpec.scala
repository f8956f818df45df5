package graft.costs

import org.scalatest.funsuite.AnyFunSuite

import ChallengeModel._

/** Parity suite for the challenge engine port — ports the reference's
  * `tests/test_challenge.py` three tests verbatim, then pins the full-run
  * leaderboard numbers (BASELINE.md: D1 0.442877 weighted, D2 worst at
  * 1955.032398) as exact doubles captured from a live reference run. */
class ChallengeCostSpec extends AnyFunSuite {

  private def d1Models = {
    val denorm = refDenorms.find(_.id == "D1").get
    (buildDatabaseModels(refSchemas, refStats, denorm), collectEmbedPaths(denorm))
  }

  // reference `tests/test_challenge.py:32-60`
  test("planner: Q1 plans to a single filter on Product (D1)") {
    val (models, embeds) = d1Models
    val plan = ChallengePlanner.planQuery(refQueries.head, models, embeds)
    assert(plan.operators.length == 1)
    assert(plan.operators.head.targetCollection.contains("Product"))
  }

  test("planner: Q2 plans to a join under the normalized design (D1)") {
    val (models, embeds) = d1Models
    val plan = ChallengePlanner.planQuery(refQueries(1), models, embeds)
    assert(plan.operators.exists(_.operatorType.startsWith("nested_loop")))
    // per-side filters are emitted BEFORE the join op (O10 pushdown)
    assert(plan.operators.takeWhile(!_.operatorType.startsWith("nested_loop"))
      .count(_.operatorType.startsWith("filter")) == 2)
  }

  // reference `tests/test_challenge.py:63-99`
  test("cost engine: deterministic filter on a hand-built 100-doc collection") {
    val schema = CollectionSchema("Foo", "id", Seq(
      "id" -> FieldSpec("id", 8), "value" -> FieldSpec("value", 10)))
    val stats = CollectionStats(100L, distinctValues = Map("value" -> 10L))
    val collection = CollectionModel(schema, stats, CollectionConfig("id"))
    val plan = QueryPlan(
      QuerySpec("QX", "SELECT value FROM Foo WHERE value = 1;"),
      List(PlanOperator(
        name = "QX_filter",
        operatorType = "filter_without_sharding",
        targetCollection = Some("Foo"),
        filters = List(FilterPredicate("Foo", "value", IntV(1))),
        outputFields = List("value"),
        scanStrategy = Some("full"))),
      List("Foo"))
    val result = ChallengeSim.simulatePlan(plan, Map("Foo" -> collection),
      ClusterConfig(10L, 0.1))
    val expectedScannedBytes = 100L * (8 + 10)
    assert(result.scannedBytes == expectedScannedBytes)
    assert(result.totalCost.timeCost ==
      expectedScannedBytes.toDouble / CostConstants.BytesPerGb *
        CostConstants.BaseIoTimeUnit)
    assert(result.outputBytes == 10L * (CostConstants.KeyOverheadBytes + 10))
  }

  // reference `tests/test_challenge.py:102-117`
  test("denormalization D2 removes the join: Q2 becomes a filter on OrderLine") {
    val denorm = refDenorms.find(_.id == "D2").get
    val models = buildDatabaseModels(refSchemas, refStats, denorm)
    val embeds = collectEmbedPaths(denorm)
    val plan = ChallengePlanner.planQuery(refQueries(1), models, embeds)
    assert(plan.operators.length == 1)
    assert(plan.operators.head.operatorType.startsWith("filter"))
    assert(plan.operators.head.targetCollection.contains("OrderLine"))
    // predicates re-prefixed onto the embed path
    assert(plan.operators.head.filters.exists(_.field == "product.brand"))
  }

  // --- full-run goldens (live reference run this session) ------------------

  private val (rows, totals, _) = ChallengeReporting.runAll()
  private def row(d: String, q: String) =
    rows.find(r => r.denormId == d && r.queryId == q).get

  test("per-(denorm, query) metrics are exact") {
    val d1q1 = row("D1", "Q1")
    assert(d1q1.time == 0.00027567148208618164)
    assert((d1q1.scannedDocs, d1q1.outputDocs) == ((1000L, 1000L)))
    assert((d1q1.scannedBytes, d1q1.returnedBytes) == ((296000L, 212000L)))

    val d1q2 = row("D1", "Q2")
    assert(d1q2.time == 1.1265277862548828e-05)
    assert((d1q2.scannedDocs, d1q2.outputDocs) == ((48L, 1L)))
    assert((d1q2.scannedBytes, d1q2.returnedBytes) == ((12096L, 40L)))
    assert(d1q2.operatorPlanSummary ==
      "filter_without_sharding -> filter_without_sharding -> nested_loop_with_sharding")

    val d2q1 = row("D2", "Q1")
    assert(d2q1.time == 1.2218952178955078)
    assert((d2q1.scannedDocs, d2q1.outputDocs) == ((4000000L, 40000L)))
    assert((d2q1.scannedBytes, d2q1.returnedBytes) == ((1312000000L, 480000L)))

    val d2q2 = row("D2", "Q2")
    assert(d2q2.time == 3.0547380447387695e-07)
    assert((d2q2.scannedBytes, d2q2.returnedBytes) == ((328L, 40L)))

    val d3q1 = row("D3", "Q1")
    assert(d3q1.time == 0.0014677643775939941)
    assert((d3q1.scannedBytes, d3q1.returnedBytes) == ((1576000L, 212000L)))
  }

  test("leaderboard totals match BASELINE.md (weighted D1 0.442877, D2 1955.03)") {
    assert(totals("D1").time == 0.2767980098724365)
    assert(totals("D1").weighted == 0.44287681579589844)
    assert(totals("D2").time == 1221.8952484428883)
    assert(totals("D2").weighted == 1955.0323975086212)
    assert(totals("D3").time == 1.4679111540317535)
    assert(totals("D3").weighted == 2.3486578464508057)
    assert(totals("D4").weighted == 2.3486578464508057)
  }

  test("ranking key is (price, carbon, time): D1 < D3 = D4 < D2") {
    assert(ChallengeReporting.ordering(totals) == List("D1", "D3", "D4", "D2"))
  }

  // --- parser / strategy unit coverage -------------------------------------

  test("parse_sql handles aliases, join, and literal types") {
    val p = ChallengePlanner.parseSql(refQueries(1).sql)
    assert(p.selectFields == List("ol.quantity", "p.price"))
    assert(p.join.contains(JoinPredicate("OrderLine", "IDP", "Product", "IDP")))
    assert(p.filters == List(
      FilterPredicate("Product", "brand", StrV("apple")),
      FilterPredicate("OrderLine", "IDC", IntV(125))))
  }

  test("parse_sql parses float literals and collapses whitespace") {
    val p = ChallengePlanner.parseSql(
      "SELECT a\n FROM   T\n WHERE x = 1.5 AND y = 'z';")
    assert(p.filters == List(
      FilterPredicate("T", "x", NumV(1.5)), FilterPredicate("T", "y", StrV("z"))))
  }

  test("unsupported SQL raises (no SELECT...FROM shape)") {
    assertThrows[IllegalArgumentException] {
      ChallengePlanner.parseSql("DELETE FROM Product")
    }
  }

  test("scan strategy selection: shard beats index beats full") {
    assert(ChallengePlanner.chooseScanStrategy(Some("IDP"), "IDP", List("IDP")) == "shard")
    assert(ChallengePlanner.chooseScanStrategy(Some("brand"), "IDP", List("brand")) == "index")
    assert(ChallengePlanner.chooseScanStrategy(Some("other"), "IDP", List("brand")) == "full")
    assert(ChallengePlanner.chooseScanStrategy(None, "IDP", List("brand")) == "full")
  }

  test("filter on an embedded-away collection rewrites onto the target (D2)") {
    val denorm = refDenorms.find(_.id == "D2").get
    val models = buildDatabaseModels(refSchemas, refStats, denorm)
    val embeds = collectEmbedPaths(denorm)
    // Product no longer exists as a collection under D2
    val q = QuerySpec("QP", "SELECT description FROM Product WHERE categorie = 'smartphone';")
    val plan = ChallengePlanner.planQuery(q, models, embeds)
    assert(plan.operators.head.targetCollection.contains("OrderLine"))
    assert(plan.operators.head.filters.exists(_.field == "product.categorie"))
    // the reference strips the leading path component from output fields
    // in this branch (`planner.py:306`): product.description → description
    assert(plan.operators.head.outputFields == List("description"))
  }
}
