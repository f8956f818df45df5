package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Joins against UNFILTERED full dimensions (`ch5_q3`, the D2 embed) must
  * not carry a `broadcast()` hint: a hint is unconditional, and a dimension
  * that grows with the dataset becomes a driver OOM at scale. These specs
  * pin the contract from both sides — the plan carries NO join hint, yet
  * size-based planning still picks a broadcast join while the dimension is
  * genuinely small, and demotes to a shuffle join when the threshold says
  * it is not. (Filtered dimensions — q4/q5/challenge_q2 — keep their hints:
  * there the filter makes the side provably small at any scale.)
  */
class JoinPlanningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def joinHints(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case j: Join => j.hint }

  private def planText(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("ch5_q3: unfiltered dimension join carries no hint, broadcast is size-chosen") {
    val df = Relational.ch5Q3MovieReviewJoin(spark, TestSpark.sfDir)
    val hints = joinHints(df)
    assert(hints.nonEmpty && hints.forall(h =>
      h.leftHint.isEmpty && h.rightHint.isEmpty), hints.toString)
    // part at test scale is far under autoBroadcastJoinThreshold — the
    // planner must still broadcast it, just from statistics, not a hint
    assert(planText(df).contains("BroadcastHashJoin"), planText(df))
  }

  test("D2 embed: unfiltered dimension join carries no hint, broadcast is size-chosen") {
    val df = Denorm.productEmbedded(spark, TestSpark.sfDir)
    val hints = joinHints(df)
    assert(hints.nonEmpty && hints.forall(h =>
      h.leftHint.isEmpty && h.rightHint.isEmpty), hints.toString)
    assert(planText(df).contains("BroadcastHashJoin"), planText(df))
  }

  test("with broadcast thresholds disabled the same joins degrade to shuffle joins") {
    // proves the broadcast above was size-chosen: flip the size knobs and
    // the plan changes — a hint-forced broadcast would ignore them
    val static = "spark.sql.autoBroadcastJoinThreshold"
    val adaptive = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    val prevStatic = spark.conf.getOption(static)
    val prevAdaptive = spark.conf.getOption(adaptive)
    try {
      spark.conf.set(static, "-1")
      spark.conf.set(adaptive, "-1")
      for (df <- Seq(Relational.ch5Q3MovieReviewJoin(spark, TestSpark.sfDir),
                     Denorm.productEmbedded(spark, TestSpark.sfDir))) {
        assert(!planText(df).contains("BroadcastHashJoin"), planText(df))
      }
    } finally {
      prevStatic.fold(spark.conf.unset(static))(spark.conf.set(static, _))
      prevAdaptive.fold(spark.conf.unset(adaptive))(spark.conf.set(adaptive, _))
    }
  }
}
