package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Event-time windowing over the `events` fixture — tumbling, sliding and
  * session windows as *batch* queries with DuckDB oracles. The reference
  * has no streaming surface at all (SURVEY §2.4); these are the
  * Spark-native extension. [[graft.streaming.StreamingEvents]] replays
  * the same fixture through `readStream`; its spec asserts the streaming
  * hourly aggregate equals the batch form bit-for-bit.
  *
  * Determinism: double `value` sums go through decimal(18,6) (exact,
  * order-independent) and back to double; window starts are computed on
  * the 1800 s grid both engines share (Spark `window()` origin and DuckDB
  * `time_bucket` origin are both 30-min aligned).
  *
  * Scale: tumbling/sliding aggs are partial-aggregated map-side before one
  * shuffle on (window, type) — cardinality = #buckets × #types, tiny.
  * Sessionization shuffles on user_id once; within a partition the
  * gaps-and-islands window sort is linear after the sort — the same shape
  * `flatMapGroupsWithState` has in the streaming variant.
  */
object Events {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  private val dsumSql = "CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)"

  /** Tumbling 1-hour aggregate by event type. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = (
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value")))

  val hourlyAggOracle: String =
    s"""SELECT date_trunc('hour', ts) AS hour_ts, event_type,
       |       count(*) AS n_events,
       |       count(DISTINCT user_id) AS n_users,
       |       $dsumSql AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** Sliding 1-hour window every 30 minutes (each event lands in exactly
    * two windows). Uses Spark's `window()`; the oracle enumerates the two
    * member windows per event on the shared 30-min grid. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame = (
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value")))

  val slidingAggOracle: String =
    s"""WITH x AS (
       |  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE
       |           AS window_start,
       |         event_type, value
       |  FROM events, range(0, 2) t(k))
       |SELECT window_start, event_type, count(*) AS n_events,
       |       $dsumSql AS total_value
       |FROM x GROUP BY 1, 2 ORDER BY 1, 2, 3, 4""".stripMargin

  /** Per-user session windows with a 4-hour inactivity gap — Spark's
    * `session_window` (session = [first ts, last ts + gap)); the oracle is
    * the classic gaps-and-islands rewrite (break when the gap to the
    * previous event is ≥ the timeout). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = (
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "4 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value")))

  val sessionizeOracle: String =
    s"""WITH m AS (
       |  SELECT user_id, ts, value,
       |         CASE WHEN lag(ts) OVER w IS NULL
       |                OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
       |              THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |g AS (
       |  SELECT user_id, ts, value,
       |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |                        ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM m)
       |SELECT user_id, min(ts) AS session_start,
       |       max(ts) + INTERVAL 4 HOUR AS session_end,
       |       count(*) AS n_events, $dsumSql AS total_value
       |FROM g GROUP BY user_id, sid ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** Backward as-of join (inclusive): for each purchase event, the most
    * recent click event by the same user at-or-before the purchase —
    * purchases with no prior click are dropped (inner as-of). Spark has
    * no native as-of join, and the range-join rewrite
    * (`p JOIN c ON user AND c.ts <= p.ts` + argmax) explodes to
    * clicks×purchases-per-user pairs before pruning; this is the
    * union+window formulation instead — tag both sides, sort within user
    * by (ts, tag, event_id), carry the last click forward with
    * `last(ignoreNulls)` — ONE shuffle on user_id and O(1) window state
    * per row, the same shape kdb's `aj` and Flink's event-time join use.
    * Ties: a click at exactly the purchase ts is eligible (tag orders it
    * first); equal-ts clicks resolve to the highest event_id. The oracle
    * replays the identical union+window algorithm. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("event_type"))
    val tagged = e.filter(col("event_type") === "click")
      .withColumn("tag", lit(0))
      .unionAll(e.filter(col("event_type") === "purchase")
        .withColumn("tag", lit(1)))
      .drop("event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def carried(c: Column): Column =
      last(when(col("tag") === 0, c), ignoreNulls = true).over(w)
    (tagged
      .withColumn("click_id", carried(col("event_id")))
      .withColumn("click_ts", carried(col("ts")))
      .withColumn("click_value", carried(col("value")))
      .filter(col("tag") === 1 && col("click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("click_id"), col("click_ts"),
        col("click_value")))
  }

  val asofJoinOracle: String =
    """WITH u AS (
      |  SELECT user_id, ts, event_id, value, 0 AS tag
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, value, 1 AS tag
      |  FROM events WHERE event_type = 'purchase'),
      |o AS (
      |  SELECT user_id, ts, event_id, tag,
      |         last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
      |           OVER w AS click_id,
      |         last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
      |           OVER w AS click_ts,
      |         last_value(CASE WHEN tag = 0 THEN value END IGNORE NULLS)
      |           OVER w AS click_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
      |       click_id, click_ts, click_value
      |FROM o WHERE tag = 1 AND click_id IS NOT NULL
      |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin

  /** Range (interval) join: every error event within the hour BEFORE a
    * purchase by the same user. A naive `ON a.ts BETWEEN …` inequality
    * join plans as a broadcast-nested-loop — O(n·m) per user at scale —
    * so this uses the bin-bucketed decomposition: both sides key on
    * (user_id, 1-hour time bin), each purchase probes its own bin and the
    * previous one (an interval of length L spans ≤ 2 bins of width L),
    * then the exact interval filter prunes. ONE equi-shuffle on
    * (user, bin); candidates bounded by per-bin occupancy, never by the
    * full history. The DuckDB oracle runs the direct inequality join —
    * a DIFFERENT algorithm — so the hash-match proves the binning loses
    * and invents nothing. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000 * 1000
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val errs = e.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"),
        floor(unix_micros(col("ts")) / HourUs).as("bin"))
    val purch = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withColumn("bin", explode(array(
        floor(unix_micros(col("purchase_ts")) / HourUs),
        floor(unix_micros(col("purchase_ts")) / HourUs) - 1)))
    (purch.join(errs, Seq("user_id", "bin"))
      .filter(col("error_ts") > col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("error_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        col("purchase_ts"), col("error_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("error_ts")))
          .as("gap_us")))
  }

  val rangeJoinOracle: String =
    """SELECT p.event_id AS purchase_id, e.event_id AS error_id,
      |       p.user_id, p.ts AS purchase_ts, e.ts AS error_ts,
      |       epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id
      | AND e.ts > p.ts - INTERVAL 1 HOUR
      | AND e.ts <= p.ts
      |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin

  /** Exact per-type value quantiles (p50/p95/p99) — the distribution
    * profile a pipeline owner reads before setting filter thresholds.
    * Spark's `percentile` is the exact sorted-interpolation aggregate
    * (one shuffle, sort per group); both engines interpolate as
    * lower + (upper - lower)·frac over the same sorted values, so the
    * doubles hash-match bit-for-bit. */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = (
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"),
        count(lit(1)).as("n")))

  /** PRODUCTION quantiles ([[graft.SparkEntry.productionOverrides]]): the
    * scale-safe form of [[valueQuantiles]]. Spark's exact `percentile`
    * buffers EVERY value of a group in its aggregate state — with
    * #groups = #event_types, one reducer holds ~a fifth of the corpus at
    * 100 TB (the round-5 verdict's scale killer). `approx_percentile`
    * (Greenwald–Khanna style summary, here at 1/accuracy = 1e-4 relative
    * rank error) keeps a FIXED-size summary per group that partial-
    * aggregates map-side like any counter. The exact form stays in the
    * oracle registry; `ScaleSafetySpec` pins approx-vs-exact agreement on
    * the fixtures. */
  def valueQuantilesApprox(spark: SparkSession, dir: String): DataFrame = (
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, array(0.5D, 0.95D, 0.99D), 10000)").as("q"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        element_at(col("q"), 1).as("p50"),
        element_at(col("q"), 2).as("p95"),
        element_at(col("q"), 3).as("p99"),
        col("n")))

  val valueQuantilesOracle: String =
    """SELECT event_type,
      |       quantile_cont(value, 0.5) AS p50,
      |       quantile_cont(value, 0.95) AS p95,
      |       quantile_cont(value, 0.99) AS p99,
      |       count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** Bits per dimension for the Z-order key (2×16 → a 32-bit z-value). */
  private val ZBits = 16

  /** Z-order (Morton) key over (user_id, event minute) — the
    * multi-dimensional clustering key: sorting a layout by the
    * interleaved bits keeps rows close in BOTH dimensions close on disk,
    * so parquet footer min/max stats prune selective predicates on
    * EITHER column (a single-column sort prunes only its own column —
    * every file spans the full range of the other). This is the layout
    * trick behind Delta's OPTIMIZE ZORDER, as a plain deterministic
    * expression feeding [[graft.sources.Layouts.compact]]'s
    * range-partitioned writer.
    *
    * The Spark Column and the DuckDB SQL are generated from the SAME
    * bit-interleave loop ([[zInterleave]]), so the two engines cannot
    * drift; everything is integer shifts/masks — bit-exact by
    * construction. Scan-only, no shuffle. */
  /** The bit interleave as a reusable Column (nonnegative inputs are
    * taken mod 2^[[ZBits]]); [[ZOrderSpec]] property-tests the bijection
    * over edge and pseudorandom values through this entry point. */
  private[graft] def zInterleave(u: Column, t: Column): Column = {
    val u16 = pmod(u, lit(1L << ZBits))
    val t16 = pmod(t, lit(1L << ZBits))
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(u16, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(t16, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  def zorderKey(spark: SparkSession, dir: String): DataFrame = {
    val minutes = floor(unix_timestamp(col("ts")).cast("double") / 60.0)
      .cast("long")
    (Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), minutes.as("minute"),
        zInterleave(col("user_id"), minutes).as("zval")))
  }

  /** The same interleave as SQL text, generated by the same loop. */
  private def zInterleaveSql(u: String, t: String): String =
    (0 until ZBits).map { i =>
      s"((($u >> $i) & 1) << ${2 * i + 1}) | ((($t >> $i) & 1) << ${2 * i})"
    }.mkString(" | ")

  val zorderKeyOracle: String = {
    val minutes = "CAST(floor(CAST(epoch(ts) AS DOUBLE) / 60.0) AS BIGINT)"
    s"""WITH x AS (
       |  SELECT event_id, user_id, $minutes AS minute FROM events),
       |b AS (SELECT event_id, user_id, minute,
       |             user_id % ${1L << ZBits} AS u16,
       |             minute % ${1L << ZBits} AS t16
       |      FROM x)
       |SELECT event_id, user_id, minute,
       |       ${zInterleaveSql("u16", "t16")} AS zval
       |FROM b ORDER BY 1, 2, 3, 4""".stripMargin
  }

  /** Top-3 events by value within each (hour, event_type) bucket — the
    * windowed-leaderboard shape (alerting, per-window sampling). One
    * shuffle on the composite bucket key; under `TopKPlanning` the rank
    * runs on the bounded-heap [[graft.plans.TopKPerKeyExec]] — O(3)
    * state per bucket, no per-bucket sort — and the bucket count grows
    * with the time range, not the event volume, so parallelism scales
    * with history length. No arithmetic beyond the rank: value/ties
    * compare identically in both engines. */
  def hourlyTop(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_ts"), col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    (Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("hour_ts"),
        col("event_type"), col("event_id"), col("value"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3))
  }

  val hourlyTopOracle: String =
    """WITH x AS (SELECT date_trunc('hour', ts) AS hour_ts, event_type,
      |                  event_id, value
      |           FROM events),
      |r AS (SELECT hour_ts, event_type, event_id, value,
      |             row_number() OVER (PARTITION BY hour_ts, event_type
      |                                ORDER BY value DESC, event_id) AS rnk
      |      FROM x)
      |SELECT hour_ts, event_type, event_id, value, rnk
      |FROM r WHERE rnk <= 3 ORDER BY 1, 2, 3, 4, 5""".stripMargin

  /** Conversion window for [[funnel]]: each stage must follow the
    * previous within this horizon — the defining parameter of funnel
    * analysis (a purchase a month after the click is a different
    * journey, not a conversion). 12 h also makes the FIXTURES exercise
    * every depth: at sf0.001 the depth histogram is {1: 9, 2: 3, 3: 3},
    * so partial funnels and the drop-off accounting are oracle-gated,
    * not just the all-completers case. */
  private val FunnelWindow = "INTERVAL 12 HOURS"

  /** Ordered conversion funnel (view → click → purchase), per user —
    * the sequence/pattern-matching operator class (Flink CEP /
    * MATCH_RECOGNIZE territory) expressed as layered window aggregates:
    *   - `v_ts` = the user's FIRST view;
    *   - `c_ts` = first click STRICTLY AFTER that view and within
    *     [[FunnelWindow]] of it (a click before any view — or a day
    *     later — is not a funnel step);
    *   - `p_ts` = first purchase strictly after that click, within the
    *     window again.
    * Output: per user, the three stage timestamps, stages completed
    * (0–3), completion flag, and microseconds from view to purchase for
    * completers. All users appear — a user with only `error` events is
    * a 0-stage row (the drop-off denominator a funnel report needs).
    *
    * Plan shape: ONE shuffle on user_id; the three stage columns are
    * whole-partition window minima layered over the same Exchange (each
    * depends on the previous stage's value, which is what makes this a
    * sequence match and not three independent mins), and the final
    * per-user collapse reuses the window partitioning. Per-user state
    * is three timestamps — no event list is ever collected. At 100 TB:
    * partial-agg-free but linear; the shuffle carries (user_id, ts,
    * type) only. Strict `>` ordering makes ties deterministic (a
    * same-microsecond click does not follow its view), so the DuckDB
    * replay hash-matches. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelStages(Tables.events(spark, dir),
      Seq("view", "click", "purchase"), FunnelWindow)
      .withColumnsRenamed(Map(
        "s1_ts" -> "v_ts", "s2_ts" -> "c_ts", "s3_ts" -> "p_ts"))

  /** The k-stage generalization [[funnel]] is an instance of: an ORDERED
    * conversion funnel over any `stages` sequence — stage 1 is the
    * user's first `stages(0)` event; stage i+1 is the first
    * `stages(i)` event strictly after the user's stage-i timestamp and
    * within `window` of it. Output: (user_id, s1_ts…sk_ts, steps 0–k,
    * completed, funnel_us first→last for completers); every user
    * appears, so drop-off denominators are built in.
    *
    * The plan shape is k-INVARIANT: still ONE shuffle on user_id — the
    * k layered whole-partition window minima all reuse the same
    * Exchange, per-user state is k timestamps, and the final collapse
    * rides the same partitioning (`FunnelStagesSpec` pins the (1, 0)
    * shuffle/broadcast budget at k = 4). Adding a funnel stage at
    * 100 TB therefore costs one more map-side column, not another pass
    * over the events. */
  def funnelStages(events: DataFrame, stages: Seq[String],
      window: String): DataFrame = {
    require(stages.size >= 2 && stages.distinct.size == stages.size,
      s"a funnel needs >= 2 distinct stages, got $stages")
    val k = stages.size
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val layered = stages.zipWithIndex.foldLeft(
      events.select(col("user_id"), col("ts"), col("event_type"))) {
      case (df, (stage, 0)) => df.withColumn("s1_ts",
        min(when(col("event_type") === stage, col("ts"))).over(w))
      case (df, (stage, i)) =>
        val prev = col(s"s${i}_ts")
        df.withColumn(s"s${i + 1}_ts",
          min(when(col("event_type") === stage && col("ts") > prev &&
            col("ts") <= prev + expr(window), col("ts"))).over(w))
    }
    val stageNames = (1 to k).map(i => s"s${i}_ts")
    val steps = (k - 1 to 1 by -1).foldLeft(
      when(col(s"s${k}_ts").isNotNull, k.toLong)) {
      case (c, i) => c.when(col(s"s${i}_ts").isNotNull, i.toLong)
    }.otherwise(0L)
    layered.groupBy(col("user_id"))
      .agg(min(col("s1_ts")).as("s1_ts"),
        stageNames.tail.map(n => min(col(n)).as(n)): _*)
      .select((Seq(col("user_id")) ++ stageNames.map(col) ++ Seq(
        steps.as("steps"),
        col(s"s${k}_ts").isNotNull.as("completed"),
        (unix_micros(col(s"s${k}_ts")) - unix_micros(col("s1_ts")))
          .as("funnel_us"))): _*)
  }

  val funnelOracle: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |        AND e.ts <= v.v_ts + INTERVAL 12 HOUR GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |        AND e.ts <= c.c_ts + INTERVAL 12 HOUR GROUP BY 1)
      |SELECT u.user_id, v.v_ts, c.c_ts, p.p_ts,
      |       CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
      |                 WHEN c.c_ts IS NOT NULL THEN 2
      |                 WHEN v.v_ts IS NOT NULL THEN 1
      |                 ELSE 0 END AS BIGINT) AS steps,
      |       p.p_ts IS NOT NULL AS completed,
      |       epoch_us(p.p_ts) - epoch_us(v.v_ts) AS funnel_us
      |FROM u
      |LEFT JOIN v ON u.user_id = v.user_id
      |LEFT JOIN c ON u.user_id = c.user_id
      |LEFT JOIN p ON u.user_id = p.user_id
      |ORDER BY 1, 2, 3, 4, 5, 6, 7""".stripMargin

  /** The funnel REPORT layer: per-stage reach counts and conversion
    * rates over [[funnel]]'s per-user rows — the numbers a funnel
    * dashboard actually displays (reach, step conversion, cumulative
    * conversion). One extra GLOBAL aggregation over the per-user frame
    * (map-side partial → single row), then the 3 stage rows are
    * unpivoted driver-free with `stack`; cost at 100 TB is the funnel's
    * own user_id shuffle plus a one-row exchange. Rates are exact
    * ratios of exact counts, so the DuckDB replay hash-matches. */
  def funnelRates(spark: SparkSession, dir: String): DataFrame =
    funnel(spark, dir)
      .agg(count(lit(1)).as("users"),
        count(col("v_ts")).as("r1"), count(col("c_ts")).as("r2"),
        count(col("p_ts")).as("r3"))
      .select(expr("stack(3, 1, 'view', r1, users, " +
        "2, 'click', r2, r1, 3, 'purchase', r3, r2) " +
        "AS (stage, stage_name, reached, prev)"),
        col("users"))
      .select(col("stage").cast("long").as("stage"), col("stage_name"),
        col("reached"),
        (col("reached").cast("double") / col("prev")).as("conv_from_prev"),
        (col("reached").cast("double") / col("users")).as("conv_from_start"))

  val funnelRatesOracle: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |        AND e.ts <= v.v_ts + INTERVAL 12 HOUR GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |        AND e.ts <= c.c_ts + INTERVAL 12 HOUR GROUP BY 1),
      |agg AS (SELECT (SELECT count(*) FROM u) AS users,
      |               (SELECT count(*) FROM v) AS r1,
      |               (SELECT count(*) FROM c) AS r2,
      |               (SELECT count(*) FROM p) AS r3)
      |SELECT stage, stage_name, reached,
      |       CAST(reached AS DOUBLE) / prev AS conv_from_prev,
      |       CAST(reached AS DOUBLE) / users AS conv_from_start
      |FROM (
      |  SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
      |         r1 AS reached, users AS prev, users FROM agg
      |  UNION ALL
      |  SELECT CAST(2 AS BIGINT), 'click', r2, r1, users FROM agg
      |  UNION ALL
      |  SELECT CAST(3 AS BIGINT), 'purchase', r3, r2, users FROM agg)
      |ORDER BY 1, 2, 3, 4, 5""".stripMargin

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_funnel" -> (funnel _),
    "events_funnel_rates" -> (funnelRates _),
    "events_zorder_key" -> (zorderKey _),
    "events_hourly_top" -> (hourlyTop _),
    "events_hourly_agg" -> (hourlyAgg _),
    "events_sliding_agg" -> (slidingAgg _),
    "events_sessionize" -> (sessionize _),
    "events_asof_join" -> (asofJoin _),
    "events_range_join" -> (rangeJoin _),
    "events_value_quantiles" -> (valueQuantiles _))

  val oracles: Map[String, String] = Map(
    "events_funnel" -> funnelOracle,
    "events_funnel_rates" -> funnelRatesOracle,
    "events_zorder_key" -> zorderKeyOracle,
    "events_hourly_top" -> hourlyTopOracle,
    "events_hourly_agg" -> hourlyAggOracle,
    "events_sliding_agg" -> slidingAggOracle,
    "events_sessionize" -> sessionizeOracle,
    "events_asof_join" -> asofJoinOracle,
    "events_range_join" -> rangeJoinOracle,
    "events_value_quantiles" -> valueQuantilesOracle)
}
