package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
