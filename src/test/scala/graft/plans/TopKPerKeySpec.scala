package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The top-k-per-key whole-operator extension must (1) actually fire on
  * the library's ranked-window pattern, (2) eliminate the per-group
  * SortExec the window form pays, and (3) return exactly the window
  * form's rows and ranks. Registered via the public
  * `spark.experimental` hooks for the duration of each test (the
  * rewrite is semantics-preserving, but tests leave the shared session
  * untouched on exit). */
class TopKPerKeySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def withTopK[A](f: => A): A = {
    TopKPlanning.register(spark)
    try f finally TopKPlanning.unregister(spark)
  }

  private def ranked() = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
  }

  test("rewrite fires: plan contains TopKPerKeyExec and no window sort") {
    withTopK {
      val df = ranked()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey"), plan)
      assert(!plan.contains("Window"), plan)
      // the window form sorts every group; the top-k form must not sort
      assert(!plan.contains("Sort "), plan)
    }
  }

  test("partial top-k runs map-side below the exchange (round 17)") {
    withTopK {
      val df = ranked()
      val plan = df.queryExecution.executedPlan.toString
      // final-over-partial: the map-side pass keeps ≤ k rows per key per
      // input partition, so the exchange carries the pruned set — the
      // ranked-window analogue of partial aggregation
      assert(plan.contains("TopKPerKeyPartial"), plan)
      // the partial node must sit BELOW the exchange, the final above it
      val iPartial = plan.indexOf("TopKPerKeyPartial")
      val iFinal = plan.indexOf("TopKPerKey ")
      val iExchange = plan.indexOf("Exchange hashpartitioning")
      assert(iFinal >= 0 && iExchange >= 0 && iPartial >= 0, plan)
      // toString prints parents before children: final < exchange < partial
      assert(iFinal < iExchange && iExchange < iPartial, plan)
      // and the split selects exactly the single-pass rows
      val expected = TopKPlanning.synchronized {
        TopKPlanning.unregister(spark)
        try ranked().collect().map(_.toSeq).toSet
        finally TopKPlanning.register(spark)
      }
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("top-k results equal the window form exactly (rows and ranks)") {
    val expected = ranked().collect().map(_.toSeq).toSet // no rule
    val got = withTopK(ranked().collect().map(_.toSeq).toSet)
    assert(expected.nonEmpty)
    assert(got == expected)
  }

  test("library queries still hash-identical under the rewrite") {
    // a registry query using the pattern (per-language top-quality)
    val name = "text_top_quality_by_lang"
    val expected = graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toSeq).toSet
    val got = withTopK {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      assert(df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      df.collect().map(_.toSeq).toSet
    }
    assert(got == expected)
  }

  test("argmax (rnk = 1) and bounded conjunctions also plan on the heap") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    val base = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("rnk", row_number().over(w))
    // expected results computed WITHOUT the rule
    val expArgmax = base.filter(col("rnk") === 1).collect().map(_.toSeq).toSet
    val expConj = base.filter(col("rnk") <= 3 && col("lang") =!= "en")
      .collect().map(_.toSeq).toSet
    withTopK {
      val argmax = base.filter(col("rnk") === 1)
      assert(argmax.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(argmax.collect().map(_.toSeq).toSet == expArgmax)
      val conj = base.filter(col("rnk") <= 3 && col("lang") =!= "en")
      assert(conj.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(conj.collect().map(_.toSeq).toSet == expConj)
    }
  }

  test("strict less-than bound and non-matching filters are handled") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val base = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rnk", row_number().over(w))
    withTopK {
      // rnk < 3 → top-2
      val lt = base.filter(col("rnk") < 3)
      assert(lt.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(lt.groupBy(col("lang")).count().collect().forall(_.getLong(1) <= 2))
      // a filter NOT on the rank column must keep the window plan
      val other = base.filter(col("doc_id") <= 10)
      assert(!other.queryExecution.executedPlan.toString.contains("TopKPerKey"))
      assert(other.count() > 0)
    }
  }
}
