package graft.costs

import org.scalatest.funsuite.AnyFunSuite

/** Parity suite for the homework engine port — asserts the EXACT doubles
  * the reference CLI prints (`python main.py --db DB1`, BASELINE.md
  * "Homework Q1–Q5"). Golden values captured from a live run of the
  * reference this session (full 17-digit precision, not the 4-digit
  * REPORT.md roundings). */
class HomeworkCostSpec extends AnyFunSuite {

  private val results = HomeworkSim.simulateQueries()
  private def byName(name: String) = results.find(_.query.name == name).get

  test("Q1 stock lookup: shard-targeted filter cost") {
    val r = byName("Q1_stock_lookup")
    assert(r.total.timeCost == 2.7939677238464355e-08)
    assert(r.total.carbonCost == 1.3969838619232178e-08)
    assert(r.total.priceCost == 2.7939677238464355e-09)
    assert(r.total.dataScannedGb == 2.7939677238464355e-08)
  }

  test("Q2 brand filter: full-scan with network multiplier") {
    val r = byName("Q2_brand_filter")
    assert(r.total.timeCost == 0.0001862645149230957)
    assert(r.total.carbonCost == 9.313225746154785e-05)
    assert(r.total.priceCost == 1.862645149230957e-05)
  }

  test("Q3 orders by date: dominant full scan of OrderLine") {
    val r = byName("Q3_orders_by_date")
    assert(r.total.timeCost == 25.515686975766535)
    assert(r.total.carbonCost == 12.757843487883267)
    assert(r.total.priceCost == 2.5515686975766534)
    assert(r.total.dataScannedGb == 5.103137395153307)
  }

  test("Q4 brand-stock join: components + join network overhead") {
    val r = byName("Q4_brand_stock_join")
    assert(r.total.timeCost == 0.0020489096641540527)
    assert(r.joinOverhead.nonEmpty)
    assert(r.total.dataScannedGb == 0.0006332993507385254)
  }

  test("Q5 orders-brand-client join: 3-way join total") {
    val r = byName("Q5_orders_brand_client_join")
    assert(r.total.timeCost == 51.0317468717184)
    assert(r.total.carbonCost == 25.5158734358592)
    assert(r.total.priceCost == 5.1031746871718395)
    assert(r.total.dataScannedGb == 10.206349426497743)
  }

  test("Q1-Q5 total matches BASELINE.md headline 76.5497") {
    val total = results.foldLeft(0.0)(_ + _.total.timeCost)
    assert(total == 76.5496690496037)
  }

  test("unknown collection sizes degrade to 0 GB with a warning note") {
    val r = HomeworkSim.estimateQuery(HomeworkSim.QuerySpec(
      "QX", "filter", "missing collection",
      List(HomeworkSim.QueryComponent("x", "Nope", 0.5, "missing"))))
    assert(r.total.timeCost == 0.0)
    assert(r.total.notes.exists(_.contains("collection size not found")))
  }

  test("unsupported query kind is rejected") {
    assertThrows[IllegalArgumentException] {
      HomeworkSim.estimateQuery(HomeworkSim.QuerySpec("QX", "union", "", Nil))
    }
  }
}
