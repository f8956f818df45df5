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

  test("runtime bloom filter injects into the probe side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter: a selective filter on the build side of
    // a shuffle join plants a bloom `might_contain` predicate on the probe
    // side's scan, pruning probe rows BEFORE the shuffle — at 100 TB this
    // is the difference between shuffling the corpus and shuffling the
    // matching slice. Fixture scans are far under the 10 GB
    // application-side default, so lower the thresholds to observe the
    // rewrite fire; production relies on the defaults (the probe side IS
    // >10 GB there — exactly when the filter pays).
    import graft.sources.Tables
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = Tables.part(spark, TestSpark.sfDir)
        .filter(org.apache.spark.sql.functions.col("p_brand") === "Brand#13")
      val fact = Tables.lineitem(spark, TestSpark.sfDir)
      val joined = fact.join(dim,
        fact("l_partkey") === dim("p_partkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter did not inject:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
