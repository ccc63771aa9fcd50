package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event sessionization — the gap-based session assignment every
  * user-behavior pipeline needs (and the streaming-native form of the
  * reference's TTL-cache correlation idea): events of one user belong to
  * one session while consecutive gaps stay under `gapMs`.
  *
  * Spark-first: the batch form uses the native `session_window`
  * (Catalyst merges sessions inside a single keyed aggregation — no
  * window function over the raw stream, no self-join), which is the
  * SAME operator Structured Streaming uses for streaming sessionization
  * with watermark-driven state eviction, so the batch query is the
  * streaming query. The DuckDB oracle expresses identical semantics the
  * relational way (gaps-and-islands: lag + running sum of breaks).
  *
  * Session boundary semantics (pinned by the oracle): a new session
  * starts when `ts - prev_ts >= gap` (Spark merges while the next event
  * starts strictly before prev_ts + gap); session_end = last_ts + gap.
  * Value sums use exact 1e-2 grains (float-parity policy).
  */
object Sessionize {

  def sessions(spark: SparkSession, sfDir: String,
      gapMs: Long = 86400000L): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    sessionsFrom(ev.select(col("user_id"),
      timestamp_millis(Tables.tsMillis(ev)).as("ts"), col("value")), gapMs)
  }

  /** Frame form: (user_id, ts: timestamp, value) — works unchanged on a
    * streaming frame (add `withWatermark` upstream; session state evicts
    * once the watermark passes a session's close).
    */
  def sessionsFrom(ev: DataFrame, gapMs: Long = 86400000L): DataFrame =
    ev.select(col("user_id"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("vgrain"))
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMs milliseconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("vgrain")) / lit(100.0)).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("n_events"), col("sum_value"))

  def sessionsSql(gapMs: Long = 86400000L): String =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms,
          CAST(floor(value*100 + 0.5) AS BIGINT) AS vgrain FROM events),
        x AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
                OR ms - lag(ms) OVER w >= $gapMs THEN 1 ELSE 0 END AS brk
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ms
                ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        SELECT user_id, min(ms) AS session_start_ms,
          max(ms) + $gapMs AS session_end_ms,
          count(*) AS n_events, sum(vgrain) / 100.0 AS sum_value
        FROM s GROUP BY user_id, sid"""

  /** Three-step first-touch funnel (step1 → step2 → step3 within a
    * conversion window of the first step): each stage is "first
    * qualifying event strictly after the previous stage's time",
    * computed as chained per-user min-aggregations — the classic
    * relational funnel. All three stages key on `user_id`, so the plan
    * re-shuffles on ONE key and AQE/exchange-reuse keeps each stage's
    * per-user frame tiny (rows ≈ users, never raw events, past stage
    * 1). Counts are exact longs; conversion rates are one double
    * division each.
    */
  def funnel(spark: SparkSession, sfDir: String,
      s1: String = "view", s2: String = "click", s3: String = "purchase",
      windowMs: Long = 7L * 86400000L): DataFrame = {
    val ev0 = Tables.load(spark, sfDir, "events")
    val ev = ev0.select(col("user_id"), col("event_type"),
      Tables.tsMillis(ev0).as("ms"))
    val u1 = ev.filter(col("event_type") === s1)
      .groupBy("user_id").agg(min(col("ms")).as("t1"))
    val u2 = ev.filter(col("event_type") === s2)
      .join(u1, "user_id")
      .filter(col("ms") > col("t1") && col("ms") <= col("t1") + windowMs)
      .groupBy("user_id")
      .agg(min(col("ms")).as("t2"), max(col("t1")).as("t1w"))
    val u3 = ev.filter(col("event_type") === s3)
      .join(u2, "user_id")
      .filter(col("ms") > col("t2") && col("ms") <= col("t1w") + windowMs)
      .groupBy("user_id").agg(min(col("ms")).as("t3"))
    u1.agg(count(lit(1)).as("step1_users"))
      .crossJoin(u2.agg(count(lit(1)).as("step2_users")))
      .crossJoin(u3.agg(count(lit(1)).as("step3_users")))
      .select(col("step1_users"), col("step2_users"), col("step3_users"),
        (col("step2_users") / col("step1_users")).as("conv_1_2"),
        (col("step3_users") / col("step2_users")).as("conv_2_3"))
  }

  def funnelSql(s1: String = "view", s2: String = "click",
      s3: String = "purchase", windowMs: Long = 7L * 86400000L): String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
          FROM events),
        u1 AS (SELECT user_id, min(ms) AS t1 FROM e
               WHERE event_type = '$s1' GROUP BY user_id),
        u2 AS (SELECT e.user_id, min(ms) AS t2, max(t1) AS t1w
               FROM e JOIN u1 ON e.user_id = u1.user_id
               WHERE event_type = '$s2' AND ms > t1
                 AND ms <= t1 + $windowMs
               GROUP BY e.user_id),
        u3 AS (SELECT e.user_id, min(ms) AS t3
               FROM e JOIN u2 ON e.user_id = u2.user_id
               WHERE event_type = '$s3' AND ms > t2
                 AND ms <= t1w + $windowMs
               GROUP BY e.user_id)
        SELECT step1_users, step2_users, step3_users,
          step2_users * 1.0 / step1_users AS conv_1_2,
          step3_users * 1.0 / step2_users AS conv_2_3
        FROM (SELECT CAST(count(*) AS BIGINT) AS step1_users FROM u1)
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS step2_users FROM u2)
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS step3_users FROM u3)"""

  /** Cohort retention triangle: users bucketed by first-active day;
    * for each (cohort, day-offset) cell, how many of that cohort's
    * users were active — plus the rate against the cohort size. The
    * pipeline collapses raw events to distinct (user, day) FIRST, so
    * every downstream shuffle moves user-day rows, never events;
    * cohort sizes are a per-cohort scalar table joined back broadcast.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev0 = Tables.load(spark, sfDir, "events")
    val days = ev0.select(col("user_id"), Tables.tsMillis(ev0).as("ms"))
      .selectExpr("user_id", "ms div 86400000 AS day")
      .distinct()
    val firsts = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val sizes = firsts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    days.join(firsts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_users"),
        col("cohort_size"),
        (col("n_users") / col("cohort_size")).as("retention"))
  }

  val retentionSql: String =
    """WITH days AS (SELECT DISTINCT user_id,
          epoch_ms(ts) // 86400000 AS day FROM events),
        firsts AS (SELECT user_id, min(day) AS cohort_day
                   FROM days GROUP BY user_id),
        sizes AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
                  FROM firsts GROUP BY cohort_day)
        SELECT f.cohort_day, d.day - f.cohort_day AS day_offset,
          CAST(count(*) AS BIGINT) AS n_users, cohort_size,
          count(*) * 1.0 / cohort_size AS retention
        FROM days d JOIN firsts f ON d.user_id = f.user_id
        JOIN sizes s ON f.cohort_day = s.cohort_day
        GROUP BY f.cohort_day, d.day - f.cohort_day, cohort_size"""

  /** Event-transition matrix (path analysis): per-user event streams in
    * time order yield (prev → next) bigram counts and their share of
    * all transitions — the Markov-chain view of user behavior that
    * funnel analysis generalizes to. One keyed lag window per user
    * (shuffle on user_id, parallel across users — the per-key-ordered
    * shape shared with the z-score fold) feeding a map-combined pair
    * count; ties inside a timestamp break on event_id on both engines,
    * so the transition relation is deterministic.
    */
  def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val d = ev.select(col("user_id"), Tables.tsMillis(ev).as("ms"),
      col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
    val pairs = d.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val tot = Window.partitionBy(lit(1))
    pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / sum("n").over(tot)).as("share"))
  }

  val transitionsSql: String =
    """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type
          FROM events),
        p AS (SELECT event_type AS next_type,
            lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ms, event_id) AS prev_type
          FROM e)
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n,
          CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share
        FROM p WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type"""

  /** Inter-arrival time distribution per event type — the behavioral
    * cadence profile (how often does a user fire this event): gap
    * between consecutive same-type events of the same user, summarized
    * per type with exact reference percentiles. Gaps are integer ms so
    * the mean is a single exact-integer division; percentiles use the
    * reference's exact formula over the sorted gap multiset.
    *
    * Scale: one keyed window for the lag (user, type), one aggregation
    * per type. The sorted gap list per type is the exact-percentile
    * payload — swap in [[graft.operators.ApmStats.histQuantile]]'s
    * binned sketch when types have corpus-scale cardinality.
    */
  def interArrival(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.RefStats
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(col("user_id"), col("event_type"),
      Tables.tsMillis(ev).as("ms"), col("event_id"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ms", "event_id")
    base.withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sum_gap"),
        sort_array(collect_list(col("gap").cast("double"))).as("sorted"))
      .select(col("event_type"), col("n_gaps"),
        (col("sum_gap").cast("double") / col("n_gaps").cast("double"))
          .as("mean_gap_ms"),
        RefStats.refPercentile(col("sorted"), 0.5).as("p50_gap_ms"),
        RefStats.refPercentile(col("sorted"), 0.95).as("p95_gap_ms"))
  }

  val interArrivalSql: String = {
    import graft.functions.RefStats
    val p50 = RefStats.refPercentileSql("sorted", "0.5")
    val p95 = RefStats.refPercentileSql("sorted", "0.95")
    s"""SELECT event_type, n_gaps,
          CAST(sum_gap AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_ms,
          $p50 AS p50_gap_ms,
          $p95 AS p95_gap_ms
        FROM (
          SELECT event_type, count(*) AS n_gaps,
            CAST(sum(gap) AS BIGINT) AS sum_gap,
            list_sort(list(CAST(gap AS DOUBLE))) AS sorted
          FROM (
            SELECT event_type,
              ms - lag(ms, 1) OVER (PARTITION BY user_id, event_type
                                    ORDER BY ms, event_id) AS gap
            FROM (SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
                  FROM events))
          WHERE gap IS NOT NULL
          GROUP BY event_type)"""
  }

  /** Rolling active-user counts — DAU plus exact trailing WAU (7-day)
    * and the DAU/WAU stickiness ratio per day. Exact rolling DISTINCT
    * doesn't decompose into window sums of daily counts; the relational
    * shape is presence fan-out: each (user, day) presence row feeds the
    * 7 trailing window positions it keeps the user "active" in, and the
    * per-day distinct is counted after the fan-out (the same
    * sparse-window-as-fan-out shape as the histogram sliding quantile).
    *
    * Scale: |user-days| x 7 fanned rows — linear; both aggregations are
    * keyed and the distinct collapses map-side. No per-day user sets
    * are ever materialized. The day series is DENSE over [min, max]: a
    * day with trailing-window activity but no same-day activity reports
    * dau=0 / stickiness=0 instead of silently vanishing (an inner join
    * of DAU to WAU would hole the series — both engines scaffold).
    */
  def activeUsers(spark: SparkSession, sfDir: String,
      windowDays: Int = 7): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val pres = ev
      .select(col("user_id"), Tables.tsMillis(ev).as("ms"))
      .select(col("user_id"), expr("ms div 86400000").as("day")).distinct()
    val rng = pres.agg(min("day").as("mnd"), max("day").as("mxd"))
    val wau = pres.crossJoin(broadcast(rng.select(col("mxd"))))
      .select(col("user_id"),
        explode(sequence(col("day"),
          least(col("day") + (windowDays - 1), col("mxd")))).as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("wau"))
    val dau = pres.groupBy(col("day").as("d"))
      .agg(count(lit(1)).as("dau"))
    val days = rng.select(explode(sequence(col("mnd"), col("mxd"))).as("d"))
    days.join(wau, Seq("d"), "left").join(dau, Seq("d"), "left")
      .select(col("d").as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        when(coalesce(col("wau"), lit(0L)) === 0L, lit(0.0))
          .otherwise(coalesce(col("dau"), lit(0L)).cast("double") /
            col("wau").cast("double")).as("stickiness"))
  }

  def activeUsersSql(windowDays: Int = 7): String =
    s"""WITH pres AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
          FROM events),
        rng AS (SELECT min(day) AS mnd, max(day) AS mxd FROM pres),
        days AS (SELECT unnest(range(mnd, mxd + 1)) AS d FROM rng),
        wau AS (
          SELECT d, count(*) AS wau FROM (
            SELECT DISTINCT user_id,
              unnest(range(day, least(day + $windowDays, mxd + 1))) AS d
            FROM pres, rng)
          GROUP BY d),
        dau AS (SELECT day AS d, count(*) AS dau FROM pres GROUP BY day)
        SELECT days.d AS day,
          CAST(coalesce(dau, 0) AS BIGINT) AS dau,
          CAST(coalesce(wau, 0) AS BIGINT) AS wau,
          CASE WHEN coalesce(wau, 0) = 0 THEN 0.0
               ELSE CAST(coalesce(dau, 0) AS DOUBLE) / CAST(wau AS DOUBLE)
          END AS stickiness
        FROM days LEFT JOIN wau ON days.d = wau.d
                  LEFT JOIN dau ON days.d = dau.d"""

  /** Within-session event-type co-occurrence with PMI-style lift —
    * which behaviors cluster in the same user-day (association mining
    * over the behavior stream; the classic market-basket shape).
    *
    * lift(a,b) = P(a,b) / (P(a)·P(b)) over user-day sessions
    *           = n_ab · N / (n_a · n_b)   (all counts exact integers).
    * Reported as the raw ratio, not log-PMI: `ln` is not bit-stable
    * across engines, a single integer-derived division is.
    *
    * Scale shape: project to DISTINCT (user, day, type) FIRST — the
    * irreducible presence set — so the pair join explodes presence rows
    * (≤ |types| per session), never raw events. With a bounded type
    * vocabulary the output is |types|² regardless of corpus size; all
    * joins key on (user, day) and the final aggregation is map-side
    * combinable.
    */
  def cooccur(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val pres = ev
      .select(col("user_id"), Tables.tsMillis(ev).as("ms"), col("event_type"))
      .select(col("user_id"), expr("ms div 86400000").as("day"),
        col("event_type")).distinct()
    val nSess = pres.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val typeCnt = pres.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val pairs = pres.as("a")
      .join(pres.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(typeCnt.select(col("event_type").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(typeCnt.select(col("event_type").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_sessions"),
        (col("n_ab").cast("double") * col("n_sessions").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  val cooccurSql: String =
    """WITH pres AS (
         SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day, event_type
         FROM events),
       ns AS (SELECT count(*) AS n_sessions
              FROM (SELECT DISTINCT user_id, day FROM pres)),
       tc AS (SELECT event_type, count(*) AS n_t FROM pres GROUP BY 1),
       p AS (
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           count(*) AS n_ab
         FROM pres a JOIN pres b
           ON a.user_id = b.user_id AND a.day = b.day
          AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT type_a, type_b, ta.n_t AS n_a, tb.n_t AS n_b, n_ab,
         n_sessions,
         CAST(n_ab AS DOUBLE) * CAST(n_sessions AS DOUBLE) /
           (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE)) AS lift
       FROM p
       JOIN tc ta ON p.type_a = ta.event_type
       JOIN tc tb ON p.type_b = tb.event_type, ns"""

  /** w8 — multi-touch ATTRIBUTION: for every conversion (a `purchase`
    * event), the marketing touches (`click`/`view`/`signup`) the same
    * user made in the `lookbackMs` window before it, credited
    * first-touch and last-touch. Integer/string outputs only — per-
    * conversion linear credit is a ratio whose cross-row float
    * summation order differs between engines, so the per-conversion
    * frame IS the deliverable and any credit model aggregates it
    * downstream (first/last counts are exact GROUP BYs over this).
    *
    * Tie-breaks are total: touches order by (ms, event_id) both ways.
    * Conversions with NO touch in window are kept ('none', 0) — the
    * organic-conversion segment an attribution report must not drop.
    * Shape: one user-keyed equi-join (conversions x touches of the
    * same user, window-bounded) + one per-conversion window — at 100 TB
    * both shuffles key on user/conversion ids; no cross-user work.
    */
  def attribution(spark: SparkSession, sfDir: String,
      lookbackMs: Long = 86400000L): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val ms = Tables.tsMillis(ev)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        ms.as("conv_ms"))
    val touch = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        ms.as("touch_ms"), col("event_type").as("touch_type"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ms") <= col("conv_ms") &&
        col("touch_ms") > col("conv_ms") - lookbackMs)
    val wF = Window.partitionBy("conv_id")
      .orderBy(col("touch_ms").asc, col("touch_id").asc)
    val wL = Window.partitionBy("conv_id")
      .orderBy(col("touch_ms").desc, col("touch_id").desc)
    val agg = j
      .withColumn("rn_f", row_number().over(wF))
      .withColumn("rn_l", row_number().over(wL))
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy("conv_id")))
      .filter(col("rn_f") === 1)
      .select(col("conv_id"),
        col("touch_type").as("first_touch"),
        col("n_touches").cast("long").as("n_touches"))
    val lastT = j
      .withColumn("rn_l", row_number().over(wL))
      .filter(col("rn_l") === 1)
      .select(col("conv_id"), col("touch_type").as("last_touch"))
    conv.join(agg, Seq("conv_id"), "left")
      .join(lastT, Seq("conv_id"), "left")
      .select(col("user_id"), col("conv_id"), col("conv_ms"),
        coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"))
  }

  def attributionSql(lookbackMs: Long = 86400000L): String =
    s"""WITH conv AS (
          SELECT user_id, event_id AS conv_id, epoch_ms(ts) AS conv_ms
          FROM events WHERE event_type = 'purchase'),
        touch AS (
          SELECT user_id, event_id AS touch_id, epoch_ms(ts) AS touch_ms,
            event_type AS touch_type
          FROM events WHERE event_type IN ('click', 'view', 'signup')),
        j AS (
          SELECT c.conv_id, t.touch_id, t.touch_ms, t.touch_type
          FROM conv c JOIN touch t ON c.user_id = t.user_id
          WHERE t.touch_ms <= c.conv_ms
            AND t.touch_ms > c.conv_ms - $lookbackMs),
        r AS (
          SELECT conv_id, touch_type,
            row_number() OVER (PARTITION BY conv_id
              ORDER BY touch_ms ASC, touch_id ASC) AS rn_f,
            row_number() OVER (PARTITION BY conv_id
              ORDER BY touch_ms DESC, touch_id DESC) AS rn_l,
            CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT)
              AS n_touches
          FROM j),
        f AS (SELECT conv_id, touch_type AS first_touch, n_touches
              FROM r WHERE rn_f = 1),
        l AS (SELECT conv_id, touch_type AS last_touch
              FROM r WHERE rn_l = 1)
        SELECT c.user_id, c.conv_id, c.conv_ms,
          coalesce(f.first_touch, 'none') AS first_touch,
          coalesce(l.last_touch, 'none') AS last_touch,
          coalesce(f.n_touches, 0) AS n_touches
        FROM conv c
        LEFT JOIN f ON c.conv_id = f.conv_id
        LEFT JOIN l ON c.conv_id = l.conv_id"""
}
