package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics in batch form over `events(event_id, ts, user_id,
  * event_type, value, props)` — tumbling windows, sessionization (the batch
  * twin of the Structured Streaming path in [[graft.streaming]]), and JSON
  * prop extraction. Money-style sums go through DECIMAL so the result is
  * order-independent and engine-exact, then surface as DOUBLE.
  */
object EventOps {

  /** Tumbling 1-hour windows per event type: the batch equivalent of
    * `groupBy(window($"ts", "1 hour"), $"event_type")`. Window start is
    * surfaced as a formatted string to keep the output engine-neutral. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // scale swap: countDistinct becomes approx_count_distinct (Spark's
        // HLL++) when exactness stops paying for its shuffle — asserted
        // against the exact count in EventOpsSpec; not emitted here because
        // its engine-private bias tables cannot replay in the DuckDB oracle
        countDistinct("user_id").as("n_users"),
        expr("CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE)").as("sum_value"))
      .orderBy("window_start", "event_type")

  /** Hopping (sliding) windows: length `windowMinutes`, advancing every
    * `hopMinutes` — each event lands in `window/hop` overlapping windows,
    * materialized by an explode over hop offsets (the batch equivalent of
    * `window($"ts", "1 hour", "30 minutes")`, kept in integer epoch
    * arithmetic so every engine agrees on the edges; by construction
    * `(epoch DIV hop − h)·hop` enumerates exactly the covering starts, no
    * post-filter). Scale shape: the explode multiplies rows by the small
    * overlap factor BEFORE one keyed aggregation — map-side partials
    * absorb the blowup. */
  def hoppingCounts(events: DataFrame, windowMinutes: Int = 60, hopMinutes: Int = 30): DataFrame = {
    require(windowMinutes % hopMinutes == 0, "window must be a multiple of hop")
    val hop = hopMinutes * 60L
    val nHops = windowMinutes / hopMinutes
    events
      .selectExpr("event_type", "CAST(unix_timestamp(ts) AS BIGINT) AS epoch")
      .selectExpr("event_type", "epoch", s"explode(sequence(0, ${nHops - 1})) AS h")
      .selectExpr("event_type", s"(epoch DIV $hop - h) * $hop AS win_start_epoch")
      .groupBy("win_start_epoch", "event_type")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("win_start_epoch", "event_type")
  }

  /** Salted equi-join for skewed keys, as a PUBLIC generic operator (the
    * segmentation pipeline salts internally; this exposes the pattern for
    * any fact/dim pair). The fact side gets a deterministic salt from a
    * high-cardinality tiebreaker column; the dim side is replicated
    * `salts`× by an explode — so one hot key's rows spread over `salts`
    * shuffle partitions instead of hot-spotting one reducer. Semantics are
    * exactly the plain inner equi-join (the salt rides the join key and is
    * dropped); at 100 TB pick `salts` ≈ the hot key's row count / target
    * partition rows, or route on AQE's skew stats. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltBy: String,
                 salts: Int = 8): DataFrame = {
    // the internal salt must not collide with (and then silently destroy)
    // a caller column of the same name — the contract is the PLAIN join
    val salt = "__graft_salt"
    Seq(fact, dim).foreach(df => require(!df.columns.contains(salt),
      s"saltedJoin: input already carries a '$salt' column"))
    val f = fact.withColumn(salt, expr(s"pmod(hash($saltBy), $salts)"))
    val d = dim.withColumn(salt, explode(expr(s"sequence(0, ${salts - 1})")))
    f.join(d, Seq(key, salt)).drop(salt)
  }

  /** Skew-safe enrichment: every event joined to its user's session profile
    * via [[saltedJoin]] (events are user-skewed by construction), rolled up
    * per event type. The oracle is the PLAIN join+agg — proving the salted
    * plan changes the shuffle layout, not the answer. */
  def skewJoinProfile(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val dim = sessionStats(events, gapMinutes).select("user_id", "n_sessions")
    saltedJoin(
      events.select(col("user_id"), col("event_id"), col("event_type"), col("value")),
      dim, "user_id", "event_id")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("n_sessions") >= 3, 1L).otherwise(0L)).as("n_from_heavy_users"),
        expr("CAST(SUM(CASE WHEN n_sessions >= 3 THEN CAST(value AS DECIMAL(18,3)) END) AS DOUBLE)")
          .as("heavy_user_value"))
      .orderBy("event_type")
  }

  /** Gap-based sessionization: a session breaks after `gapMinutes` of
    * inactivity per user. Pure window algebra (lag → break flag → running
    * session id) — identical SQL shape in any engine. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withBreaks = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch"))
      .withColumn("prev_epoch", lag("epoch", 1).over(byUser))
      .withColumn("is_break",
        when(col("prev_epoch").isNull.or(col("epoch") - col("prev_epoch") > gapMinutes * 60L), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_break").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withBreaks
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("epoch").as("session_start_epoch"),
        max("epoch").as("session_end_epoch"))
      .withColumn("duration_sec", col("session_end_epoch") - col("session_start_epoch"))
      .orderBy("user_id", "session_seq")
  }

  /** Per-user session summary — top-level rollup of [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        max("duration_sec").as("max_duration_sec"))
      .orderBy("user_id")

  /** As-of join: every 'purchase' event paired with the latest
    * prior-or-simultaneous 'view' event of the same user. Implemented as a
    * SINGLE sorted window pass over the unioned streams (`last(_, ignoreNulls)`
    * carry-forward) — the scale-correct shape: one shuffle on user_id, no
    * range join, no per-pair work. Views are deduped per (user, second)
    * keeping max event_id so the result is deterministic. The DuckDB oracle
    * uses its native ASOF JOIN — an independent implementation of the same
    * semantics. */
  def asofViewBeforePurchase(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("epoch"))
    val views = base.where(col("event_type") === "view")
      .groupBy("user_id", "epoch")
      .agg(max("event_id").as("view_event_id"))
      .select(col("user_id"), col("epoch"), lit(0).as("k"),
        col("view_event_id"), lit(null).cast("long").as("purchase_event_id"))
    val purchases = base.where(col("event_type") === "purchase")
      .select(col("user_id"), col("epoch"), lit(1).as("k"),
        lit(null).cast("long").as("view_event_id"), col("event_id").as("purchase_event_id"))
    val w = Window.partitionBy("user_id").orderBy("epoch", "k")
      .rowsBetween(Window.unboundedPreceding, 0)
    views.unionByName(purchases)
      .withColumn("lv", last(when(col("k") === 0,
        struct(col("epoch").as("vepoch"), col("view_event_id").as("vid"))), ignoreNulls = true).over(w))
      .where(col("k") === 1 && col("lv").isNotNull)
      .select(
        col("purchase_event_id"),
        col("user_id"),
        col("epoch").as("pepoch"),
        col("lv.vid").as("view_event_id"),
        col("lv.vepoch").as("vepoch"),
        (col("epoch") - col("lv.vepoch")).as("lag_sec"))
      .orderBy("purchase_event_id")
  }

  /** Ordered funnel: view → click → purchase, each stage's first occurrence
    * strictly at-or-after the previous stage's first occurrence, per user.
    * Three filtered aggregates chained by broadcast-size joins (each stage
    * output is one row per qualifying user) — no window over the full
    * event stream, so the plan scales with users, not events. */
  def funnel(events: DataFrame): DataFrame = {
    val base = events.select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("epoch"))
    val v = base.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("epoch").as("t_view"))
    val c = base.where(col("event_type") === "click")
      .join(v, "user_id").where(col("epoch") >= col("t_view"))
      .groupBy("user_id").agg(min("epoch").as("t_click"))
    val p = base.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("epoch") >= col("t_click"))
      .groupBy("user_id").agg(min("epoch").as("t_purchase"))
    val joined = v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
    joined.agg(
      count(lit(1)).as("n_view"),
      count(col("t_click")).as("n_click_after_view"),
      count(col("t_purchase")).as("n_purchase_after_click"),
      sum(col("t_purchase") - col("t_view")).as("total_view_to_purchase_sec"))
  }

  /** Global interval (range) join via time-binning — the scale-correct
    * non-equi-join shape. A raw `s <= t AND t <= e` theta join plans as a
    * broadcast nested loop (every event against every interval); instead
    * each interval explodes into the hour bins it covers and each event
    * carries its own bin, so the match becomes an EQUI-join on bin (shuffle
    * keyed by bin) plus a residual range filter. An event's bin is unique,
    * so every qualifying (event, interval) pair meets exactly once — no
    * dedup pass. Intervals are the sessions of the first `nUsers` users
    * (deterministic, derived from the same table); output counts events of
    * ALL users inside each window.
    *
    * Guard: one pathological interval spanning years would explode
    * `sequence(s DIV bin, e DIV bin)` into millions of rows per interval,
    * so any interval covering more than `maxBinsPerInterval` bins fails
    * LOUDLY (pick a wider `binSeconds` for long-span interval sets) instead
    * of silently materializing the blowup. */
  def intervalJoin(events: DataFrame, nUsers: Int = 10, binSeconds: Long = 3600L,
                   maxBinsPerInterval: Long = 10000L): DataFrame = {
    val iv = sessionize(events)
      .where(col("user_id") < nUsers)
      // 10^6 sessions/user of headroom, guarded: an id collision would
      // corrupt attribution AND break the total-order the oracle compare
      // relies on
      .selectExpr("IF(session_seq < 1000000, user_id * 1000000 + session_seq, " +
        "raise_error('intervalJoin: session_seq overflows the interval_id encoding')) AS interval_id",
        "session_start_epoch AS s", "session_end_epoch AS e")
      .selectExpr("interval_id", "s", "e",
        s"""explode(IF(e DIV $binSeconds - s DIV $binSeconds < $maxBinsPerInterval,
           |  sequence(s DIV $binSeconds, e DIV $binSeconds),
           |  CAST(raise_error(concat('intervalJoin: interval ', interval_id, ' spans ',
           |    e DIV $binSeconds - s DIV $binSeconds + 1, ' bins (cap $maxBinsPerInterval) — ',
           |    'use a wider binSeconds')) AS ARRAY<BIGINT>))) AS bin""".stripMargin)
    val ev = events
      .select(unix_timestamp(col("ts")).as("t"))
      .withColumn("bin", expr(s"t DIV $binSeconds"))
    ev.join(iv, "bin")
      .where(col("t") >= col("s") && col("t") <= col("e"))
      .groupBy("interval_id", "s", "e")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("interval_id")
  }

  /** Cohort retention matrix — the standard growth-analytics operator:
    * users are grouped into the UNIX week of their first event, then each
    * (cohort, weeks-since-cohort) cell counts the distinct users still
    * active. Weeks are integer epoch arithmetic (`epoch DIV 604800`), not
    * calendar truncation, so every engine agrees on the bucket edges.
    *
    * Shape at scale: one distinct on (user_id, week), a per-user min
    * (rides the user_id partitioning), a join back on user_id, one
    * aggregation on the (cohort, offset) pair — every stage keyed,
    * nothing windowed, nothing collected. */
  def retention(events: DataFrame): DataFrame = {
    val wk = events
      .selectExpr("user_id", "CAST(unix_timestamp(ts) AS BIGINT) DIV 604800 AS wk")
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      // wk is distinct on (user_id, wk) and cohort is one row per user, so
      // each user appears exactly once per group: a plain count equals
      // countDistinct without the two-phase distinct-aggregate machinery
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** Default |z| decision threshold for [[eventAnomaly]] — shared with the
    * DuckDB oracle (which compares against its square). */
  val DefaultZThreshold = 2L

  /** Daily event-volume ANOMALY flags — the ops-side monitor an ingest
    * pipeline runs over its own telemetry: per (event_type, day) count,
    * z-scored against that type's daily mean/variance across the observed
    * window, all in EXACT integer arithmetic. With D days, S = Σcnt and
    * Q = Σcnt² per type, z² = (cnt·D − S)² / (D·Q − S²) — both sides of
    * the |z| ≥ `zThreshold` decision multiply through the denominator, so
    * no square root and no float ever appears and the DuckDB oracle
    * replays the flag bit-for-bit. A constant daily series (D·Q = S²) has
    * zero variance: z²_ppm reports 0 and nothing flags.
    *
    * Shape at 100 TB: the daily count is ONE map-side-partial aggregation
    * riding the scan; the per-type moment triple is a ≤(#types)-row
    * aggregate broadcast back — nothing scales with the event count past
    * the first agg. The binding overflow term is the z²_ppm numerator
    * (cnt·D − S)²·10⁶, exact while |cnt·D − S| < 3·10⁶ (the flag itself
    * only needs |cnt·D − S| < 3·10⁹ since its comparison skips the ppm
    * scale-up); beyond that, pre-bucket counts (cnt DIV 2^k) — the z
    * ratio is scale-invariant, so the verdicts are unchanged. */
  def eventAnomaly(events: DataFrame, zThreshold: Long = DefaultZThreshold): DataFrame = {
    require(zThreshold >= 1, s"eventAnomaly: zThreshold must be >= 1, got $zThreshold")
    // NULL event_type is excluded EXPLICITLY (the inner equi-join below
    // would drop the NULL-key group anyway — NULL never equals NULL — but
    // an implicit drop reads as an accident): malformed events belong in
    // an upstream quarantine count, and the streaming twin filters the
    // same way so the closed-input equality holds
    val daily = events.where("ts IS NOT NULL AND event_type IS NOT NULL")
      .selectExpr("event_type", "CAST(unix_timestamp(ts) AS BIGINT) DIV 86400 AS epoch_day")
      .groupBy("event_type", "epoch_day").agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("d"), sum("cnt").as("s"),
      sum(expr("cnt * cnt")).as("q"))
    daily.join(broadcast(stats), "event_type")
      .selectExpr("event_type", "epoch_day", "cnt",
        "(cnt * d - s) * (cnt * d - s) AS dev2", "d * q - s * s AS var2")
      .selectExpr("event_type", "epoch_day", "cnt",
        "IF(var2 > 0, dev2 * 1000000 DIV var2, 0) AS z2_ppm",
        s"var2 > 0 AND dev2 >= ${zThreshold * zThreshold} * var2 AS anomaly")
      .orderBy("event_type", "epoch_day")
  }

  /** JSON prop extraction + conditional aggregation (`from_json` /
    * `get_json_object` surface). */
  def propExtract(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy("event_type")
}
