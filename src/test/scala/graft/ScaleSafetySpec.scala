package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  CollectList, CollectSet, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 scale contract: NO query in the production registry may
  * aggregate an unbounded per-group buffer. The three oracle forms that
  * do (fold-exact centroid, unbounded postings, exact percentile) stay in
  * the oracle registry only; their production substitutes
  * (`SparkEntry.productionOverrides`) must agree with them on the
  * fixtures — pinned here — while keeping fixed-size aggregation state.
  */
class ScaleSafetySpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    graft.plans.TopKPlanning.register(s)
    s
  }
  private val dir = TestSpark.sfDir

  /** Offending aggregate functions in a production plan: exact Percentile
    * anywhere, and CollectList/CollectSet whose input is not rank-bounded
    * (i.e. no bounded-heap TopKPerKey below the aggregate — the rewrite
    * that caps the group before collection). */
  private def unboundedAggs(plan: LogicalPlan): Seq[String] = {
    def hasTopKBelow(p: LogicalPlan): Boolean =
      p.collectFirst { case t: graft.plans.TopKPerKey => t }.nonEmpty
    plan.collect {
      case node if node.expressions.nonEmpty =>
        node.expressions.flatMap(_.collect {
          case ae: AggregateExpression => ae.aggregateFunction match {
            case _: Percentile => Some("exact percentile")
            case _: CollectList =>
              if (node.children.exists(hasTopKBelow)) None
              else Some("unbounded collect_list")
            case _: CollectSet =>
              if (node.children.exists(hasTopKBelow)) None
              else Some("unbounded collect_set")
            case _ => None
          }
        }.flatten)
    }.flatten
  }

  /** The sanctioned collect_list families — cases where the collected
    * array's boundedness is a DATA-MODEL contract, not a query
    * implementation choice:
    *   - the D3 one-to-many embeds (`Denorm.linesEmbedded`), where the
    *     array IS the operator's output — a nested document whose length
    *     is the embed fanout the reference's own cost model prices
    *     (`avg_array_lengths`, challenge/models.py); you embed orderLines
    *     in products precisely because a part has bounded lines;
    *   - span excision (`Dedup.spanExcise`), which reassembles each
    *     document's surviving words — a per-DOCUMENT buffer bounded by
    *     document length; rebuilding a document's text requires that
    *     document's words in one place by definition.
    * Documented in SCALING.md §denorm / §dedup. */
  private val embedOutputQueries =
    Set("denorm_embed_many", "denorm_embed_agg", "dedup_span_excise")

  test("no production plan aggregates an unbounded per-group buffer") {
    for ((name, fn) <- SparkEntry.productionQueries.toSeq.sortBy(_._1)
         if !embedOutputQueries.contains(name)) {
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val bad = unboundedAggs(plan)
      assert(bad.isEmpty,
        s"$name production plan has ${bad.mkString(", ")}:\n$plan")
    }
  }

  test("production centroid agrees with the fold-exact oracle form to 1e-9") {
    val exact = graft.operators.Similarity.centroidByLang(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val prod = graft.operators.Similarity.centroidByLangProd(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(prod.keySet == exact.keySet)
    for ((k, (cProd, nProd)) <- prod) {
      val (cExact, nExact) = exact(k)
      assert(nProd == nExact, s"count mismatch at $k")
      assert(math.abs(cProd - cExact) <= 1e-9,
        s"centroid mismatch at $k: prod=$cProd exact=$cExact")
    }
  }

  test("production quantiles land within a ±2-rank-percent exact bracket") {
    import org.apache.spark.sql.functions.{col, expr}
    // approx_percentile returns an actual data value with bounded RANK
    // error, while exact percentile interpolates — so the right check is a
    // rank bracket, not a value tolerance (in a small group's tail,
    // adjacent order statistics can be far apart in value)
    val bracket = graft.sources.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, array(0.48D, 0.52D, 0.93D, 0.97D, 0.97D, 1.0D))")
          .as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val prod = graft.operators.Events.valueQuantilesApprox(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(prod.keySet == bracket.keySet)
    for ((k, (p50, p95, p99)) <- prod) {
      val b = bracket(k)
      assert(p50 >= b(0) && p50 <= b(1), s"$k p50=$p50 outside [${b(0)}, ${b(1)}]")
      assert(p95 >= b(2) && p95 <= b(3), s"$k p95=$p95 outside [${b(2)}, ${b(3)}]")
      assert(p99 >= b(4) && p99 <= b(5), s"$k p99=$p99 outside [${b(4)}, ${b(5)}]")
    }
  }

  test("capped inverted index is the exact index truncated to 100 postings") {
    val exact = graft.operators.TextAnalysis.invertedIndex(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    val capped = graft.operators.TextAnalysis.invertedIndexCapped(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3))).toMap
    assert(capped.keySet == exact.keySet)
    var truncSeen = false
    for ((tok, (df, postings, truncated)) <- capped) {
      val (dfE, postingsE) = exact(tok)
      assert(df == dfE, s"df mismatch at $tok") // df stays EXACT under the cap
      val expected = postingsE.split(',').take(100).mkString(",")
      assert(postings == expected, s"postings mismatch at $tok")
      assert(truncated == (dfE > 100), s"truncated flag wrong at $tok")
      truncSeen |= truncated
    }
    assert(truncSeen, "fixture never exercised the cap — raise sf or lower cap")
  }

  test("scan-side quantization equals the explode+join oracle form exactly") {
    // same IEEE ops in the same order → bit-identical codes AND errors
    val exact = graft.operators.Similarity.quantizeSq(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val prod = graft.operators.Similarity.quantizeSqProd(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(prod.keySet == exact.keySet && prod.nonEmpty)
    for ((id, (codes, err)) <- prod) {
      assert(codes == exact(id)._1, s"codes mismatch at vec $id")
      assert(err == exact(id)._2, s"max_err mismatch at vec $id")
    }
    // and the production plan is explode/join/shuffle-free: a single
    // project over the scan (plus the tiny stats job run beforehand)
    val plan = graft.operators.Similarity.quantizeSqProd(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate") && !plan.contains("Exchange"), plan)
  }

  test("quantization error honors the half-bin analytical bound") {
    import org.apache.spark.sql.functions.{col, max, min, posexplode}
    // midpoint decode ⇒ |x − x̂| ≤ (hi−lo)/512 per dimension; the
    // reported max_err must respect the WIDEST dimension's bound (small
    // fp slack for the decode arithmetic itself)
    val stats = graft.sources.Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("d", "xf")))
      .select(col("d"), col("xf").cast("double").as("x"))
      .groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
    val widest = stats.map(r => r.getDouble(2) - r.getDouble(1)).max
    val bound = widest / 512.0 * (1.0 + 1e-9) + 1e-12
    val errs = graft.operators.Similarity.quantizeSqProd(spark, dir)
      .select(org.apache.spark.sql.functions.col("max_err"))
      .collect().map(_.getDouble(0))
    assert(errs.nonEmpty)
    assert(errs.max <= bound,
      f"max_err ${errs.max}%.6g exceeds half-bin bound $bound%.6g")
    // and quantization is actually lossy (codes are 8-bit, data is float)
    assert(errs.max > 0.0)
  }
}
