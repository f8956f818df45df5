package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The memory contract of [[TopKPerKeyExec]]: a high-cardinality key
  * (here: 500 distinct keys against a 16-row spill threshold) must not
  * grow the heap map without bound — the operator spills key-sorted runs
  * and merges them, returning bit-identical rows to the in-memory path.
  * Also pins the UnsafeRow output convention (ADVICE round 5): with
  * whole-stage codegen disabled, an exchange directly above the operator
  * must still receive UnsafeRows. */
class TopKSpillSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withTopK[A](f: => A): A = {
    TopKPlanning.register(spark)
    try f finally TopKPlanning.unregister(spark)
  }

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** 10k rows over 500 keys, top-3 per key under a total order (v, id) —
    * ties impossible, so spill and in-memory paths must agree exactly. */
  private def ranked() = {
    val w = Window.partitionBy(col("k")).orderBy(col("v"), col("id"))
    spark.range(10000)
      .select(col("id"), (col("id") % 500).as("k"), ((col("id") * 37) % 1000).as("v"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  test("spill path returns exactly the in-memory rows (16-row threshold)") {
    val expected = ranked().collect().map(_.toSeq).toSet // window plan, no rule
    assert(expected.size == 1500)
    val (got, spills) = withTopK {
      withConf(
        "spark.graft.topk.spillRows" -> "16",
        "spark.sql.adaptive.enabled" -> "false") {
        val df = ranked()
        val rows = df.collect().map(_.toSeq).toSet
        val execs = df.queryExecution.executedPlan.collect {
          case t: TopKPerKeyExec => t
        }
        assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
        (rows, execs.map(_.metrics("spillCount").value).sum)
      }
    }
    assert(spills > 0, "threshold 16 over 1500 retained rows must spill")
    assert(got == expected)
  }

  test("no spill under the default threshold; results still exact") {
    val expected = ranked().collect().map(_.toSeq).toSet
    val (got, spills) = withTopK {
      withConf("spark.sql.adaptive.enabled" -> "false") {
        val df = ranked()
        val rows = df.collect().map(_.toSeq).toSet
        val execs = df.queryExecution.executedPlan.collect {
          case t: TopKPerKeyExec => t
        }
        (rows, execs.map(_.metrics("spillCount").value).sum)
      }
    }
    assert(spills == 0)
    assert(got == expected)
  }

  test("UnsafeRow output convention holds with whole-stage codegen off") {
    // Without the output projection, the rows leaving the operator are
    // JoinedRow(GenericInternalRow) and the exchange below groupBy throws
    // ClassCastException when no codegen stage re-projects them.
    val expected = ranked().groupBy(col("k")).count()
      .collect().map(_.toSeq).toSet
    val got = withTopK {
      withConf("spark.sql.codegen.wholeStage" -> "false") {
        val df = ranked().groupBy(col("k")).count()
        assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
        df.collect().map(_.toSeq).toSet
      }
    }
    assert(got == expected)
  }

  test("spill path composes with the library's ranked queries") {
    val name = "text_top_quality_by_lang"
    val expected = graft.SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .collect().map(_.toSeq).toSet
    val got = withTopK {
      withConf("spark.graft.topk.spillRows" -> "2") {
        graft.SparkEntry.queries(name)(spark, TestSpark.sfDir)
          .collect().map(_.toSeq).toSet
      }
    }
    assert(got == expected)
  }
}
