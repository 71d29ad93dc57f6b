package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Window functions, sorts/limits/top-k, and an as-of join (SURVEY.md §2
  * Part B rows: Window functions, Sorts/limits/top-k). All absent in the
  * reference — its only ordering concept is zero-padded offset file names
  * giving lexicographic=offset order at rest (s3.clj:16-20).
  *
  * Scale notes:
  *  - Every window here partitions by a key (brand / customer / event) so
  *    state is bounded per partition; no global unpartitioned windows, which
  *    would serialize 100 TB through one task.
  *  - Top-k = orderBy().limit(k) → Spark plans TakeOrderedAndProject: a
  *    per-partition heap + driver merge of k·partitions rows, never a full
  *    sort of the fact table.
  *  - The as-of join is a range join + per-left-row top-1; at scale both
  *    sides are pre-bucketed on the equi key so the range part stays within
  *    co-located partitions.
  */
object Windows {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Top-3 parts per brand by price: row_number over a keyed window, with a
    * unique-key tiebreak so ranking is total and deterministic. */
  def windowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    t(spark, dir, "part")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "rn", "p_partkey", "p_retailprice")
      .orderBy("p_brand", "rn")
  }

  /** Running total + lag/lead per customer (ROWS frame; exact decimal
    * accumulation so the running sum is order-stable cross-engine). */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice").cast(DecimalType(30, 8)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"), 2).as("running_total"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** rank / dense_rank / ntile / percent_rank over customers per segment. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        graft.core.Determinism.dround(percent_rank().over(w), 6).as("prank"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Global top-k: orderBy + limit → TakeOrderedAndProject (no full sort). */
  def sortLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  /** As-of join: each purchase event matched to the latest prior click of
    * the same user (inclusive: a click at exactly the purchase ts counts).
    * Spark lacks a native as-of join. The naive form — equi+range join +
    * per-purchase top-1 window — materializes every (purchase × prior
    * click) pair per user: a hot user with 10⁵ clicks × 10³ purchases is
    * 10⁸ intermediate rows before the window prunes them. Scale-safe form
    * used here: union-tag both event types into one stream, ONE window
    * sort per user ordered by (ts, kind, event_id) with clicks sorting
    * before purchases at equal ts, and a running
    * `last(click, ignoreNulls)` carry-forward — O(n log n) per user, zero
    * pair explosion, no join at all. The carried struct(c_ts, c_event)
    * makes "latest click" = lexicographic max (ts, event_id), matching
    * the (c_ts DESC, c_event DESC) tiebreak of the oracle's top-1 form. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click", when(col("kind") === 0,
        struct(col("ts").as("c_ts"), col("event_id").as("c_event"))))
      .withColumn("last_click", last(col("click"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("last_click").isNotNull)
      .select(col("event_id").as("p_event"), col("user_id"),
        col("last_click.c_event").as("c_event"), col("last_click.c_ts").as("c_ts"))
      .orderBy("p_event")
  }

  /** Batch sessionization (gaps-and-islands): split each user's event
    * stream into sessions at inactivity gaps > 30 min — the batch analog
    * of the streaming `session_window`/`flatMapGroupsWithState` operators
    * (which have no SQL oracle), expressed so DuckDB can replay it: lag →
    * new-session flag → running sum = session id → per-session rollup.
    * Two window passes over ONE per-user sort order, no self-join; at
    * 100 TB state is one user's events per task, same as the as-of join. */
  def batchSessions(spark: SparkSession, dir: String): DataFrame = {
    val gapMs = 30 * 60 * 1000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
      .orderBy("user_id", "sess_id")
  }

  /** Event-sequence transition matrix: for each consecutive pair of events
    * per user (order: ts, event_id), count from_type → to_type transitions
    * and the mean gap between them — the funnel/Markov primitive of
    * clickstream analysis. One keyed window sort (per-user state, same
    * scale shape as [[batchSessions]]) then a tiny global aggregate over
    * |event_types|² rows — partial (map-side) aggregation makes the final
    * shuffle negligible at any corpus size. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .withColumn("gap_ms", lead(unix_millis(col("ts")), 1).over(w) -
        unix_millis(col("ts")))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        graft.core.Determinism.davg(col("gap_ms").cast("double") / 1000.0, 3)
          .as("mean_gap_s"))
      .orderBy("from_type", "to_type")
  }

  /** Time-series resample + gap-fill: bucket events to an hourly grid per
    * event_type, materialize the MISSING buckets (sequence → explode over
    * each type's [min, max] hour span), and carry the last observed value
    * forward across gaps (`last(_, ignoreNulls)` over one keyed window).
    * The grid side is |types| × |hours| rows — trivially small next to the
    * fact table at any scale — and the heavy side is a single hash
    * aggregation of the raw events, so 100 TB costs one scan + one
    * per-type window over the already-aggregated grid. */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the grid-bounds branch and the left join both consume it,
    // and without the cache each branch re-runs the full events scan +
    // aggregation — the one part of this plan that is 100 TB heavy. The
    // cached frame itself is |types| × |hours| rows, trivially resident.
    val hourly = t(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"),
        graft.core.Determinism.dsum(col("value"), 2).as("sum_value"))
      .transform(graft.core.EngineCache.persisted)
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_value").isNull.as("is_gap"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("event_type", "hour")
  }

  /** Rolling time-window aggregates: per user, events + value-sum over the
    * trailing hour — a RANGE frame keyed on epoch millis, so rows at the
    * same instant are frame peers in both engines (deterministic under
    * ties, unlike a ROWS frame). One keyed window sort per user; no
    * self-join — the naive "join events to events within 1h" form is the
    * same pair explosion the as-of join avoids. */
  val RollingMs = 3600 * 1000L
  def rollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"))
      .rangeBetween(-RollingMs, 0)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        unix_millis(col("ts")).as("ms"))
      .select(col("event_id"), col("user_id"), col("ts"),
        count(lit(1)).over(w).as("n_1h"),
        round(sum(col("value").cast(DecimalType(30, 8))).over(w)
          .cast("double"), 2).as("sum_1h"))
      .orderBy("event_id")
  }

  /** Ordered conversion funnel signup → view → click → purchase: stage k
    * counts users whose earliest stage-k event STRICTLY FOLLOWS their
    * stage-(k-1) entry time (min-ts chaining, the standard funnel
    * semantics). Each stage is one filtered aggregation of the fact table
    * joined to the previous stage's (user, ts) frame — per-user stage
    * frames are tiny (≤ |users| rows), so every join broadcasts and the
    * fact table is scanned with an event_type filter that reaches the
    * parquet scan. Emits one row per stage: (stage, stage_name, n_users). */
  val FunnelStages: Seq[String] = Seq("signup", "view", "click", "purchase")
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    // stageFrames(k) = (user_id, t = entry time into stage k)
    val stageFrames = FunnelStages.tail.scanLeft(
      e.filter(col("event_type") === FunnelStages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))) {
      case (prev, stage) =>
        e.filter(col("event_type") === stage)
          .join(broadcast(prev), "user_id")
          .filter(col("ts") > col("t"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
    stageFrames.zip(FunnelStages).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(name).as("stage_name"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("stage")
  }

  /** Per-group z-score outliers: mean/std per event_type from exact
    * decimal sums (order-independent, cross-engine identical), broadcast
    * back, flag |z| > ZCut. The variance path squares IN DECIMAL (value
    * is 2 dp → square exact at 4 dp) so no fp op precedes the final
    * identical-double arithmetic. One scan + one 5-row broadcast join. */
  val ZCut = 2.5
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val dec = col("value").cast(DecimalType(15, 4))
    val stats = t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s1"),
        sum(dec * dec).cast("double").as("s2"))
      .select(col("event_type"),
        (col("s1") / col("n")).as("mean"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
          .as("std"))
    t(spark, dir, "events")
      .join(broadcast(stats), "event_type")
      .withColumn("z", graft.core.Determinism.dround(
        (col("value") - col("mean")) / col("std"), 4))
      .filter(abs(col("z")) > ZCut)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  /** Cohort retention: users are cohorted by first-seen day; each
    * (cohort_day, day_offset) cell counts the distinct cohort members
    * active that day — the standard retention triangle. Plan: one
    * aggregation builds the per-user cohort frame (|users| rows), a
    * shuffle join on user_id tags every event with its cohort, and a
    * second hash aggregation collapses to |days|² cells. At 100 TB the
    * dominant cost is the single shuffle of (user_id, day) pairs — the
    * event scan projects just two columns, so the exchange carries a
    * fraction of the table, and count_distinct keeps partial maps bounded
    * by cohort cardinality. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val firstSeen = e.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    e.join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Forward as-of join with tolerance: each click matched to the NEXT
    * purchase of the same user within `AsofTolMs` (inclusive at equal ts).
    * Same zero-join shape as [[asofJoin]] mirrored in time: union-tag the
    * two event types, one window sort per user ordered by
    * (ts, kind, event_id) — clicks sort before purchases at equal ts, so
    * an equal-ts purchase lands in the strictly-following frame — and a
    * `first(purchase, ignoreNulls)` over (1 FOLLOWING, UNBOUNDED
    * FOLLOWING) picks the nearest one. The tolerance is a post-filter:
    * the nearest following purchase is the only candidate that can be
    * within it. No purchase×click pair ever materializes. */
  val AsofTolMs: Long = 3600 * 1000L
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "click", lit(0)).otherwise(lit(1)).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    e.withColumn("purch", when(col("kind") === 1,
        struct(col("ts").as("p_ts"), col("event_id").as("p_event"))))
      .withColumn("next_p", first(col("purch"), ignoreNulls = true).over(w))
      .withColumn("gap_ms",
        unix_millis(col("next_p.p_ts")) - unix_millis(col("ts")))
      .filter(col("kind") === 0 && col("next_p").isNotNull &&
        col("gap_ms") <= AsofTolMs)
      .select(col("event_id").as("c_event"), col("user_id"),
        col("next_p.p_event").as("p_event"), col("next_p.p_ts").as("p_ts"),
        col("gap_ms"))
      .orderBy("c_event")
  }

  // ---------------------------------------------------------------- q215
  /** Complex-event-processing pattern match (MATCH_RECOGNIZE / Flink
    * CEP-lite): per user, order the event stream and count
    * non-overlapping occurrences of the browse-then-buy pattern
    * `view click+ purchase` — the sequence detector funnels (q70) and
    * transition matrices (q58) cannot express, because the pattern has
    * a variable-length middle and must respect strict adjacency. The
    * journey compiles to a per-user string of event-type initials
    * (distinct across the five types) and the pattern to a regex; both
    * engines' regex scans are left-to-right non-overlapping, so counts
    * are deterministic. Total order inside the journey = (ts,
    * event_id), the repo-wide tiebreak.
    *
    * Scale: ONE shuffle keyed by user_id; per-user state is that
    * user's events — the exact partitioning every CEP engine uses.
    * A journey string is bounded by a user's event count (the same
    * bound sessionization q50 carries); nothing global exists. */
  def eventPattern(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(s"""
      WITH j AS (
        SELECT user_id,
          array_join(transform(
            array_sort(collect_list(struct(ts, event_id,
              substr(event_type, 1, 1) AS ini))), x -> x.ini), '') AS journey,
          count(1) AS n_events
        FROM events GROUP BY user_id)
      SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        CAST(regexp_count(journey, '$EventPatternRe') AS BIGINT) AS n_matches
      FROM j WHERE regexp_count(journey, '$EventPatternRe') >= 1
      ORDER BY user_id""")
  }

  val EventPatternRe = "vc+p" // view, click+, purchase — initials are
                              //   distinct across the five event types

  // ---------------------------------------------------------------- q226
  /** SESSION-BOUNDED pattern match — the time constraint q215's pure
    * regex cannot express: the same `view click+ purchase` pattern, but
    * every step must follow its predecessor within [[PatternGapMs]]
    * (MATCH_RECOGNIZE's WITHIN clause / Flink CEP's `within()`). The
    * gap constraint compiles INTO the journey string: a lag() window
    * marks every event arriving after a gap with a break character, and
    * since '|' can never match inside the pattern, no match spans a
    * break — the regex machinery is reused unchanged, and the time
    * semantics live in one window pass. Same single user-keyed shuffle
    * as q215; the lag and the collect share the exchange. On the
    * fixture the WITHIN clause bites hard: 14 of q215's 66 matched
    * users survive the 6-hour adjacency requirement. */
  val PatternGapMs = 21600000L // 6 h — each step within 6 h of the last

  def sessionPattern(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events").createOrReplaceTempView("events")
    spark.sql(s"""
      WITH t AS (
        SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ini,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      tok AS (
        SELECT user_id, ts, event_id,
          CASE WHEN pts IS NULL
                 OR unix_millis(ts) - unix_millis(pts) <= $PatternGapMs
               THEN ini ELSE concat('|', ini) END AS tk
        FROM t),
      j AS (
        SELECT user_id,
          array_join(transform(array_sort(collect_list(
            struct(ts, event_id, tk))), x -> x.tk), '') AS journey,
          count(1) AS n_events
        FROM tok GROUP BY user_id)
      SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        CAST(regexp_count(journey, '$EventPatternRe') AS BIGINT) AS n_matches
      FROM j WHERE regexp_count(journey, '$EventPatternRe') >= 1
      ORDER BY user_id""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q09_window_topk"    -> windowTopK _,
    "q10_window_running" -> windowRunning _,
    "q11_window_rank"    -> windowRank _,
    "q12_sort_limit"     -> sortLimit _,
    "q27_asof_join"      -> asofJoin _,
    "q50_batch_sessions" -> batchSessions _,
    "q58_event_transitions" -> eventTransitions _,
    "q68_gap_fill"       -> gapFill _,
    "q69_rolling_window" -> rollingWindow _,
    "q70_event_funnel"   -> eventFunnel _,
    "q71_zscore_outliers" -> zscoreOutliers _,
    "q79_cohort_retention" -> cohortRetention _,
    "q80_asof_forward"   -> asofForward _,
    "q215_event_pattern" -> eventPattern _,
    "q226_session_pattern" -> sessionPattern _
  )

  val oracles: Map[String, String] = Map(
    "q09_window_topk" -> """
      SELECT p_brand, rn, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          (row_number() OVER (PARTITION BY p_brand
             ORDER BY p_retailprice DESC, p_partkey))::INT AS rn
        FROM part)
      WHERE rn <= 3
      ORDER BY p_brand, rn""",
    "q10_window_running" -> """
      SELECT o_custkey, o_orderkey, o_orderdate,
        round((sum(CAST(o_totalprice AS DECIMAL(30,8)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE, 2)
          AS running_total,
        lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          AS prev_order,
        lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
          AS next_order
      FROM orders
      ORDER BY o_custkey, o_orderkey""",
    "q11_window_rank" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal,
        (rank() OVER w)::INT AS rnk,
        (dense_rank() OVER w)::INT AS drnk,
        (ntile(4) OVER w)::INT AS quartile,
        floor((percent_rank() OVER w) * 1e6 + 0.5) / 1e6 AS prank
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, c_custkey""",
    "q12_sort_limit" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 20""",
    "q27_asof_join" -> """
      SELECT p_event, user_id, c_event, c_ts FROM (
        SELECT p.event_id AS p_event, p.user_id, c.event_id AS c_event, c.ts AS c_ts,
          row_number() OVER (PARTITION BY p.event_id
            ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts)
      WHERE rn = 1
      ORDER BY p_event""",
    "q50_batch_sessions" -> """
      WITH o AS (
        SELECT user_id, ts, event_id,
          lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        FROM events),
      s AS (
        SELECT user_id, ts, event_id,
          CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
               THEN 1 ELSE 0 END AS is_new
        FROM o),
      g AS (
        SELECT user_id, ts,
          (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::INT AS sess_id
        FROM s)
      SELECT user_id, sess_id, count(1) AS n_events,
             min(ts) AS sess_start, max(ts) AS sess_end
      FROM g GROUP BY user_id, sess_id
      ORDER BY user_id, sess_id""",
    "q58_event_transitions" -> s"""
      WITH o AS (
        SELECT user_id, event_type,
          lead(event_type) OVER w AS to_type,
          lead(epoch_ms(ts)) OVER w - epoch_ms(ts) AS gap_ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT event_type AS from_type, to_type, count(1) AS n,
        ${graft.core.Determinism.avgSql("gap_ms::DOUBLE / 1000.0", 3)}
          AS mean_gap_s
      FROM o WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
      ORDER BY from_type, to_type""",
    "q68_gap_fill" -> s"""
      WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
          count(1) AS n_events,
          ${graft.core.Determinism.sumSql("value", 2)} AS sum_value
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT event_type, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY 1),
      grid AS (
        SELECT event_type,
          unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        FROM bounds)
      SELECT g.event_type, g.hour,
        coalesce(h.n_events, 0) AS n_events,
        (h.sum_value IS NULL) AS is_gap,
        last_value(h.sum_value IGNORE NULLS) OVER (
          PARTITION BY g.event_type ORDER BY g.hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      FROM grid g LEFT JOIN hourly h
        ON g.event_type = h.event_type AND g.hour = h.hour
      ORDER BY g.event_type, g.hour""",
    "q69_rolling_window" -> s"""
      SELECT event_id, user_id, ts,
        count(1) OVER w AS n_1h,
        round((sum(CAST(value AS DECIMAL(30,8))) OVER w)::DOUBLE, 2) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        RANGE BETWEEN $RollingMs PRECEDING AND CURRENT ROW)
      ORDER BY event_id""",
    "q70_event_funnel" -> {
      val stageCtes = FunnelStages.zipWithIndex.map { case (stage, i) =>
        if (i == 0)
          s"s1 AS (SELECT user_id, min(ts) AS t FROM events " +
            s"WHERE event_type = '$stage' GROUP BY user_id)"
        else
          s"s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t FROM events e " +
            s"JOIN s$i p ON e.user_id = p.user_id " +
            s"WHERE e.event_type = '$stage' AND e.ts > p.t GROUP BY e.user_id)"
      }.mkString(",\n      ")
      val stageSelects = FunnelStages.zipWithIndex.map { case (stage, i) =>
        s"SELECT ${i + 1}::INT AS stage, '$stage' AS stage_name, " +
          s"count(1) AS n_users FROM s${i + 1}"
      }.mkString("\n      UNION ALL ")
      s"""
      WITH $stageCtes
      $stageSelects
      ORDER BY stage"""
    },
    "q71_zscore_outliers" -> s"""
      WITH stats AS (
        SELECT event_type,
          sum(CAST(value AS DECIMAL(15,4)))::DOUBLE / count(1) AS mean,
          sqrt(sum(CAST(value AS DECIMAL(15,4)) * CAST(value AS DECIMAL(15,4)))::DOUBLE / count(1)
            - (sum(CAST(value AS DECIMAL(15,4)))::DOUBLE / count(1))
              * (sum(CAST(value AS DECIMAL(15,4)))::DOUBLE / count(1))) AS std
        FROM events GROUP BY event_type)
      SELECT event_id, e.event_type, value,
        ${graft.core.Determinism.droundSql("(value - mean) / std", 4)} AS z
      FROM events e JOIN stats s ON e.event_type = s.event_type
      WHERE abs(${graft.core.Determinism.droundSql("(value - mean) / std", 4)}) > $ZCut
      ORDER BY event_id""",
    "q79_cohort_retention" -> """
      WITH e AS (
        SELECT user_id, date_trunc('day', ts) AS day FROM events),
      f AS (
        SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
      SELECT cohort_day,
        date_diff('day', cohort_day, day)::INT AS day_offset,
        count(DISTINCT e.user_id) AS n_active
      FROM e JOIN f ON e.user_id = f.user_id
      GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset""",
    "q80_asof_forward" -> s"""
      SELECT c_event, user_id, p_event, p_ts, gap_ms FROM (
        SELECT c.event_id AS c_event, c.user_id,
          p.event_id AS p_event, p.ts AS p_ts,
          epoch_ms(p.ts) - epoch_ms(c.ts) AS gap_ms,
          row_number() OVER (PARTITION BY c.event_id
            ORDER BY p.ts, p.event_id) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND p.ts >= c.ts)
      WHERE rn = 1 AND gap_ms <= $AsofTolMs
      ORDER BY c_event""",
    "q215_event_pattern" -> s"""
      WITH j AS (
        SELECT user_id,
          string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
            AS journey,
          count(*) AS n_events
        FROM events GROUP BY user_id)
      SELECT user_id, n_events::BIGINT AS n_events,
        len(regexp_extract_all(journey, '$EventPatternRe'))::BIGINT AS n_matches
      FROM j WHERE len(regexp_extract_all(journey, '$EventPatternRe')) >= 1
      ORDER BY user_id""",
    "q226_session_pattern" -> s"""
      WITH t AS (
        SELECT user_id, ts, event_id, substr(event_type, 1, 1) AS ini,
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        FROM events),
      tok AS (
        SELECT user_id, ts, event_id,
          CASE WHEN pts IS NULL
                 OR epoch_ms(ts) - epoch_ms(pts) <= $PatternGapMs
               THEN ini ELSE '|' || ini END AS tk
        FROM t),
      j AS (
        SELECT user_id, string_agg(tk, '' ORDER BY ts, event_id) AS journey,
          count(*) AS n_events
        FROM tok GROUP BY user_id)
      SELECT user_id, n_events::BIGINT AS n_events,
        len(regexp_extract_all(journey, '$EventPatternRe'))::BIGINT AS n_matches
      FROM j WHERE len(regexp_extract_all(journey, '$EventPatternRe')) >= 1
      ORDER BY user_id"""
  )
}
