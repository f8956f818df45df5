package graft.costs

import org.scalatest.funsuite.AnyFunSuite

/** Parity suite for the chapter5 dataflow engine port — collection sizes,
  * per-query totals and frequency-weighted DB totals, asserted as the
  * EXACT doubles a live run of the reference produced this session
  * (BASELINE.md "Chapter 5 challenge": DB1 4.2549, DB2 11.1095). */
class Chapter5CostSpec extends AnyFunSuite {

  private val (db1Results, db1Total) = Chapter5Sim.runDb("DB1")
  private val (db2Results, db2Total) = Chapter5Sim.runDb("DB2")
  private def q(results: List[(String, Chapter5Sim.PlanResult)], name: String) =
    results.find(_._1 == name).get._2

  test("collection sizes match the reference (GB)") {
    val db1 = RefSchemas.chapter5Db("DB1")
    assert(db1("Movie").sizeGb == 0.021979212760925293)
    assert(db1("Review").sizeGb == 1.043081283569336)
    assert(db1("User").sizeGb == 0.1341104507446289)
    val db2 = RefSchemas.chapter5Db("DB2")
    assert(db2("Review").sizeGb == 2.7567148208618164)
  }

  test("DB1 per-query time costs are exact") {
    assert(q(db1Results, "Q1_movies_by_genre").totalCost.timeCost == 0.0010989606380462646)
    assert(q(db1Results, "Q2_reviews_for_movie").totalCost.timeCost == 1.0430812835693361e-06)
    assert(q(db1Results, "Q3_movie_review_join").totalCost.timeCost == 1.0650604963302612)
    assert(q(db1Results, "Q4_avg_rating_by_movie").totalCost.timeCost == 1.0468065738677979)
    assert(q(db1Results, "Q5_top_movies_with_titles").totalCost.timeCost == 1.072511076927185)
  }

  test("DB1 output documents per query") {
    assert(q(db1Results, "Q1_movies_by_genre").outputDocuments == 5000L)
    assert(q(db1Results, "Q2_reviews_for_movie").outputDocuments == 100L)
    assert(q(db1Results, "Q3_movie_review_join").outputDocuments == 100000L)
    assert(q(db1Results, "Q4_avg_rating_by_movie").outputDocuments == 100000L)
    assert(q(db1Results, "Q5_top_movies_with_titles").outputDocuments == 100000L)
  }

  test("DB1 frequency-weighted totals match BASELINE.md 4.2549") {
    assert(db1Total.timeCost == 4.254943877458572)
    assert(db1Total.carbonCost == 2.127471938729286)
    assert(db1Total.priceCost == 0.42549438774585724)
  }

  test("DB2 (denormalized Review) per-query and weighted totals") {
    assert(q(db2Results, "Q3_movie_review_join").totalCost.timeCost == 2.7786940336227417)
    assert(q(db2Results, "Q4_avg_rating_by_movie").totalCost.timeCost == 2.7604401111602783)
    assert(q(db2Results, "Q5_top_movies_with_titles").totalCost.timeCost == 2.7861446142196655)
    assert(db2Total.timeCost == 11.109495162963867)
    assert(db2Total.carbonCost == 5.554747581481934)
    assert(db2Total.priceCost == 1.1109495162963867)
  }

  test("Q2 is shard-targeted: filter on the Review sharding key") {
    val r = q(db1Results, "Q2_reviews_for_movie")
    assert(r.steps.head.shardingKey.contains("movieId"))
    assert(r.steps.head.notes.exists(_.contains("Targeted shard access")))
  }

  test("Q3 join on the shared sharding key avoids the shuffle") {
    val r = q(db1Results, "Q3_movie_review_join")
    val shuffle = r.steps.head.details.find(_.label.endsWith(":shuffle")).get
    assert(shuffle.dataScannedGb == 0.0)
    assert(r.steps.head.notes.exists(_.contains("shuffle avoided")))
  }

  test("Q5 joins a named intermediate (aggregate output) with Movie") {
    val r = q(db1Results, "Q5_top_movies_with_titles")
    assert(r.steps.length == 2)
    assert(r.steps(1).step.leftRef.contains("aggregate_reviews_for_titles"))
  }

  test("unknown planner name and unknown input references are errors") {
    assertThrows[IllegalArgumentException] {
      Chapter5Sim.buildPlan(Chapter5Sim.PlanQuerySpec("nope", ""))
    }
    assertThrows[IllegalArgumentException] {
      Chapter5Sim.simulatePlan(
        Chapter5Sim.QueryPlan(Chapter5Sim.PlanQuerySpec("x", ""),
          List(Chapter5Sim.PlanStep("s", "filter", targetCollection = Some("Nope")))),
        RefSchemas.chapter5Db("DB1"))
    }
  }
}
