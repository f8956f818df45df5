package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-budget regression gate: every production-registry query has a
  * PINNED physical-plan shuffle count (measured at sf0.001 via
  * `graft.PlanAudit`). A new Exchange creeping into a query — a lost
  * broadcast, a de-optimized aggregate, an accidental repartition — fails
  * here as a one-line diff instead of surfacing as a wall-clock
  * regression three rounds later (or a 100 TB incident). When a plan
  * change is INTENTIONAL, rerun `runMain graft.PlanAudit` and update the
  * budget with a sentence of justification in the commit.
  *
  * Budgets are exact, not upper bounds: a query that LOSES a shuffle
  * also fails, because that usually means the query stopped doing its
  * work (e.g. an aggregation folded away by a broken rewrite) — plan
  * shape is part of each operator's contract.
  */
class PlanBudgetSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    graft.plans.TopKPlanning.register(s)
    s
  }
  private val dir = TestSpark.sfDir

  /** Measured round 6 at sf0.001, AQE off (PlanAudit session shape). */
  private val shuffleBudget: Map[String, Int] = Map(
    "ch5_q1_movies_by_genre" -> 0,
    "ch5_q2_reviews_for_movie" -> 0,
    "ch5_q3_movie_review_join" -> 0,
    "ch5_q4_avg_rating_by_movie" -> 1,
    "ch5_q5_top_movies_with_titles" -> 1,
    "challenge_q1" -> 0,
    "challenge_q2" -> 0,
    "curate_mix_resample" -> 4,
    "dedup_clusters" -> 0, // CC runs eagerly; final plan is the rep join
    "dedup_cross_source" -> 3,
    "dedup_dup_spans" -> 3,
    "dedup_exact" -> 1,
    "dedup_incremental" -> 4, // semi-join id pruning, persisted candidates
    "dedup_jaccard_brute" -> 0,
    "dedup_minhash_lsh" -> 2, // semi-join candidate pruning (no id distinct)
    "dedup_semantic" -> 0, // same eager-CC shape as dedup_clusters
    "dedup_simhash" -> 1,
    "dedup_span_excise" -> 3,
    "denorm_embed_agg" -> 1,
    "denorm_embed_many" -> 1,
    "denorm_embed_one" -> 0,
    "denorm_rewrite_q2" -> 0,
    "events_asof_join" -> 1,
    "events_hourly_agg" -> 2,
    "events_hourly_top" -> 1,
    "events_range_join" -> 0,
    "events_sessionize" -> 1,
    "events_sliding_agg" -> 1,
    "events_value_quantiles" -> 1,
    "events_zorder_key" -> 0,
    "mm_decode_png" -> 0, // encode+decode inside the partition iterator
    "mm_features" -> 0,
    "mm_frame_sample" -> 0,
    "mm_metadata" -> 0,
    "mm_resize" -> 0,
    "pipeline_curated" -> 1, // single-scan projection; dedup window only
    "q1_stock_lookup" -> 0,
    "q2_brand_filter" -> 0,
    "q3_orders_by_date" -> 0,
    "q4_brand_stock_join" -> 0,
    "q5_orders_brand_client_join" -> 0,
    "q6_salted_skew" -> 2,
    "q6_stock_by_product" -> 1,
    "q7_orders_by_date_agg" -> 1,
    "q8_rollup" -> 1,
    "q9_running_total" -> 1,
    "q10_pivot" -> 1, // one groupBy with per-flag conditional aggregates
    "q11_except" -> 1, // union-side aggregate feeding the anti join
    "q12_outer_join" -> 1, // reduced fact side broadcasts; one final agg
    "q13_scalar_subquery" -> 3, // per-part totals twice (mean + output) + 1-row mean
    "sim_ann_ivf" -> 7,
    "sim_ann_ivf_sq" -> 7,
    "sim_ann_lsh" -> 1,
    "sim_centroid_by_lang" -> 1,
    "sim_cosine_neardup" -> 0,
    "sim_cosine_topk" -> 1,
    "sim_neardup_lsh" -> 1,
    "sim_quantize_sq" -> 0,
    "sketch_distinct_kmv" -> 2,
    "sketch_heavy_hitters" -> 3,
    "sql_challenge_q1" -> 0,
    "sql_challenge_q2" -> 0,
    "text_bigram_familiarity" -> 2,
    "text_bpe_tokens" -> 0,
    "text_decontaminate" -> 2,
    "text_decontaminate_bloom" -> 2, // + the persisted test-shingle distinct
    "text_fingerprint" -> 0,
    "text_inverted_index" -> 2,
    "text_inverted_index_capped" -> 2,
    "text_lang_id" -> 0,
    "text_normalize" -> 0,
    "text_pii_mask" -> 0,
    "text_quality_rules" -> 0,
    "text_quality_score" -> 0,
    "text_repetition" -> 2,
    "text_seq_pack" -> 1,
    "text_stats_by_source" -> 2,
    "text_stratified_sample" -> 1,
    "text_tfidf_topk" -> 5,
    "text_token_stats" -> 0,
    "text_top_quality_by_lang" -> 1,
    "text_train_split" -> 0,
    "text_vocab_stats" -> 2,
    "text_winnow" -> 0, // scan-side expression + explode, shuffle-free
    "text_winnow_matches" -> 3) // index distinct + fp self-join + pair agg

  test("every production query is budgeted — no unpinned query ships") {
    val unpinned = SparkEntry.productionQueries.keySet -- shuffleBudget.keySet
    val stale = shuffleBudget.keySet -- SparkEntry.productionQueries.keySet
    assert(unpinned.isEmpty, s"add budgets (run graft.PlanAudit): $unpinned")
    assert(stale.isEmpty, s"remove stale budgets: $stale")
  }

  test("physical-plan shuffle counts match the pinned budgets exactly") {
    // measured with AQE off — the same session shape as graft.PlanAudit,
    // so "rerun PlanAudit and paste" stays a one-step update. (Exchange
    // insertion precedes AQE; the off switch only changes how cached /
    // staged subtrees PRINT, not what shuffles execute.)
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val diffs = SparkEntry.productionQueries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, dir).queryExecution.executedPlan.toString
          spark.catalog.clearCache()
          val got = PlanAudit.shuffleCount(plan)
          val want = shuffleBudget(name)
          if (got != want) Some(s"$name: $got shuffles (budget $want)")
          else None
      }
      assert(diffs.isEmpty,
        s"plan regressions (rerun graft.PlanAudit if intentional):\n${
          diffs.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
