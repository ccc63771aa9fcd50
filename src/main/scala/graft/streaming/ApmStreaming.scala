package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.collection.mutable
import graft.functions.RefStats
import graft.operators.{Alerts, ZScore}

/** Structured Streaming realization of the reference pipeline (SURVEY.md
  * §2.8): the same column expressions as the batch operators, driven by
  * `readStream` sources with watermarks, windowed aggregation, and keyed
  * state.
  *
  * Reference mapping:
  *  - S1 file-tail source -> `spark.readStream` (file/kafka source); here
  *    any streaming DataFrame with (server, service, end_ts, elapsed).
  *  - A1-A5 window stats -> watermarked sliding `window()` aggregation;
  *    the 6-bucket lateness buffer (stream_calc_stats.js:103-113) is the
  *    watermark delay; exact percentiles via sort_array(collect_list).
  *  - J1 pairing -> stream-stream left-outer join with event-time range
  *    (the 120 s TTL cache, stream_parse_transactions.js:211-224).
  *  - Z2 z-score -> flatMapGroupsWithState keyed on (server, service,
  *    lag), bounded per-key list state — the faithful influence-feedback
  *    recurrence (stream_calc_z_score.js:232-307).
  *  - R3/R4 alert folds -> flatMapGroupsWithState: leaky-bucket counter
  *    keyed (server, service, lag); cooldown keyed (service).
  *  - S6 buffered DB sink -> `foreachBatch` micro-batch writer (count/
  *    time flush becomes the trigger interval; exactly-once via
  *    checkpoint + idempotent write).
  *  - S7 resume files -> checkpointLocation.
  *
  * Scale notes: state per key is O(lag) doubles (bounded, like the
  * reference's shifted lists); RocksDB state store handles key counts in
  * the hundreds of millions; the window agg shuffles on (key, window)
  * with partial aggregation upstream.
  */
object ApmStreaming {

  private[streaming] val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** A1-A5: sliding 5-min/10-s window stats over a streaming tx frame
    * with event-time column `end_ts` (TimestampType) — emits per closed
    * window once the 1-minute watermark passes (A4 lateness buffer).
    */
  def slidingStatsStream(tx: DataFrame,
      windowLen: String = "300 seconds", slide: String = "10 seconds",
      lateness: String = "60 seconds"): DataFrame = {
    // tpm denominator = the actual window length in minutes (the
    // reference's fixed-denominator semantics, stream_calc_stats.js:186)
    val winSec = windowLen.trim.split("\\s+")(0).toDouble *
      (if (windowLen.contains("minute")) 60.0 else 1.0)
    val winMin = winSec / 60.0
    tx.withWatermark("end_ts", lateness)
      .groupBy(col("server"), col("service"),
        window(col("end_ts"), windowLen, slide))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(col("elapsed"))).as("sorted"))
      .select(col("server"), col("service"),
        unix_millis(col("window.end")).as("ts_ms"),
        col("n"),
        (col("n") / lit(winMin)).as("tpm"),
        RefStats.arrayMean(col("sorted")).as("average"),
        RefStats.refPercentile(col("sorted"), 0.75).as("per75"),
        RefStats.refPercentile(col("sorted"), 0.95).as("per95"))
  }

  /** J1/J2: entry<->exit pairing as a watermarked stream-stream left-outer
    * join; unmatched exits emit with null entry after the watermark closes
    * the join window (the salvage path), unmatched entries simply expire.
    */
  def pairingStream(entries: DataFrame, exits: DataFrame,
      ttl: String = "120 seconds"): DataFrame = {
    val e = entries.select(col("log_id").as("e_log_id"),
      col("service").as("e_service"), col("entry_ts"))
      .withWatermark("entry_ts", "30 seconds")
    val x = exits.withWatermark("exit_ts", "30 seconds")
    x.join(e,
      col("log_id") === col("e_log_id") &&
        col("service") === col("e_service") &&
        col("exit_ts") >= col("entry_ts") &&
        col("exit_ts") <= col("entry_ts") + expr(s"INTERVAL $ttl"),
      "leftOuter")
      .select(col("log_id"), col("service"), col("entry_ts"),
        col("exit_ts"), col("elapsed"),
        when(col("entry_ts").isNull, "N").otherwise("Y").as("complete"))
  }

  // ------------------------------------------------------------- z-score

  /** Bounded per-key z-score state: the three influenced-value lists
    * (NaN encodes the reference's `undefined` entries).
    */
  case class ZKey(server: String, service: String, lag: Int,
      threshold: Double, influence: Double)
  case class ZIn(server: String, service: String, lag: Int,
      threshold: Double, influence: Double, ts_ms: Long, tpm: Double,
      average: Double, per75: Double, per95: Double) // NaN = undefined
  case class ZState(avgL: Seq[Double], p75L: Seq[Double], p95L: Seq[Double])
  case class ZOut(server: String, service: String, ts_ms: Long, lag: Int,
      tpm: Double, average: Double, per75: Double, per95: Double,
      average_avg: Double, average_lb: Double, average_ub: Double, average_signal: Int,
      per75_avg: Double, per75_lb: Double, per75_ub: Double, per75_signal: Int,
      per95_avg: Double, per95_lb: Double, per95_ub: Double, per95_signal: Int)

  private def od(d: Double): Option[Double] = if (d.isNaN) None else Some(d)
  private def dd(o: Option[Double]): Double = o.getOrElse(Double.NaN)

  def zScoreStep(rows: Iterator[ZIn], st: ZState, key: ZKey): (Iterator[ZOut], ZState) = {
    val lists = Array(
      mutable.Queue(st.avgL.map(od): _*),
      mutable.Queue(st.p75L.map(od): _*),
      mutable.Queue(st.p95L.map(od): _*))
    val out = rows.toArray.sortBy(_.ts_ms).map { r =>
      val ms = Array(od(r.average), od(r.per75), od(r.per95))
      val zs = (0 until 3).map { i =>
        val (infl, avgV, lb, ub, sig) = RefStats.zScoreStepRef(
          key.lag, key.threshold, key.influence, ms(i), lists(i).toIndexedSeq)
        if (lists(i).size >= key.lag) lists(i).dequeue()
        lists(i).enqueue(infl)
        (dd(avgV), dd(lb), dd(ub), sig)
      }
      ZOut(r.server, r.service, r.ts_ms, r.lag, r.tpm, r.average, r.per75, r.per95,
        zs(0)._1, zs(0)._2, zs(0)._3, zs(0)._4,
        zs(1)._1, zs(1)._2, zs(1)._3, zs(1)._4,
        zs(2)._1, zs(2)._2, zs(2)._3, zs(2)._4)
    }
    (out.iterator,
      ZState(lists(0).toSeq.map(dd), lists(1).toSeq.map(dd), lists(2).toSeq.map(dd)))
  }

  /** Z1-Z5 as a stateful streaming transform. Input: a streaming stats
    * frame already fanned out per lag config (columns of [[ZIn]]).
    */
  def zScoreStream(stats: Dataset[ZIn]): Dataset[ZOut] = {
    import stats.sparkSession.implicits._
    stats.groupByKey(r => ZKey(r.server, r.service, r.lag, r.threshold, r.influence))
      .flatMapGroupsWithState[ZState, ZOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: ZKey, rows: Iterator[ZIn], state: GroupState[ZState]) =>
          val st = state.getOption.getOrElse(ZState(Nil, Nil, Nil))
          val (out, st2) = zScoreStep(rows, st, key)
          state.update(st2)
          out
      }
  }

  /** Fan a streaming stats frame out per lag config (Z5) into [[ZIn]]. */
  def fanOutLags(stats: DataFrame, lags: Seq[ZScore.LagCfg]): Dataset[ZIn] = {
    import stats.sparkSession.implicits._
    val lagRows = lags.map(c => (c.lag, c.threshold, c.influence))
    val lagDf = stats.sparkSession.createDataFrame(lagRows)
      .toDF("lag", "threshold", "influence")
    stats.crossJoin(broadcast(lagDf))
      .select(col("server"), col("service"), col("lag"), col("threshold"),
        col("influence"), col("ts_ms"), col("tpm"),
        coalesce(col("average"), lit(Double.NaN)).as("average"),
        coalesce(col("per75"), lit(Double.NaN)).as("per75"),
        coalesce(col("per95"), lit(Double.NaN)).as("per95"))
      .as[ZIn]
  }

  // -------------------------------------------------- J2 park-and-expire

  case class EnrichIn(log_id: Long, kind: String, // "tx" | "acct"
      service: String, ts_ms: Long, elapsed: Double, acct: String)
  case class EnrichOut(log_id: Long, service: String, ts_ms: Long,
      elapsed: Double, acct: String, matched: Boolean)
  case class EnrichState(txs: Seq[(String, Long, Double)], acct: String,
      deadlineMs: Long)

  /** J2 — acctNum enrichment with the reference's park/flush/expire
    * semantics (stream_parse_transactions.js:218,226-239,294-327): a tx
    * lacking its account number parks in keyed state; a late acct
    * arrival flushes every parked tx enriched; after the TTL the state
    * times out and parked txs emit with acct='' (left-outer-with-
    * deadline, realized as EventTimeTimeout keyed state).
    */
  def enrichStream(in: Dataset[EnrichIn], ttlMs: Long = 30000L): Dataset[EnrichOut] = {
    import in.sparkSession.implicits._
    in.withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", "10 seconds")
      .as[(Long, String, String, Long, Double, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EnrichState, EnrichOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (logId: Long,
         rows: Iterator[(Long, String, String, Long, Double, String, java.sql.Timestamp)],
         state: GroupState[EnrichState]) =>
          if (state.hasTimedOut) {
            // TTL expiry: emit parked txs with empty acct (:226-239)
            val st = state.get
            state.remove()
            st.txs.iterator.map { case (svc, ts, el) =>
              EnrichOut(logId, svc, ts, el, "", matched = false)
            }
          } else {
            var st = state.getOption.getOrElse(EnrichState(Nil, "", 0L))
            val out = scala.collection.mutable.Buffer.empty[EnrichOut]
            val batch = rows.toArray.sortBy(_._4)
            batch.foreach {
              case (_, "acct", _, _, _, acct, _) =>
                // late acct arrival flushes parked rows (:316-325)
                st.txs.foreach { case (svc, ts, el) =>
                  out += EnrichOut(logId, svc, ts, el, acct, matched = true)
                }
                st = EnrichState(Nil, acct, st.deadlineMs)
              case (_, _, svc, ts, el, _, _) =>
                if (st.acct.nonEmpty)
                  out += EnrichOut(logId, svc, ts, el, st.acct, matched = true)
                else {
                  st = st.copy(txs = st.txs :+ ((svc, ts, el)),
                    deadlineMs = math.max(st.deadlineMs, ts + ttlMs))
                }
            }
            if (st.txs.nonEmpty || st.acct.nonEmpty) {
              val maxTs = batch.map(_._4).max
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.deadlineMs, maxTs + ttlMs))
            }
            out.iterator
          }
      }
  }

  // ------------------------------------------------------------- alerts

  case class VoteIn(server: String, service: String, lag: Int, ts_ms: Long,
      bad: Int, causes: String)
  case class VoteOut(server: String, service: String, lag: Int, ts_ms: Long,
      causes: String)

  /** R3 leaky-bucket vote counter as keyed streaming state. */
  def voteStream(cand: Dataset[VoteIn], cfg: Alerts.AlertCfg): Dataset[VoteOut] = {
    import cand.sparkSession.implicits._
    cand.groupByKey(r => (r.server, r.service, r.lag))
      .flatMapGroupsWithState[Int, VoteOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (String, String, Int), rows: Iterator[VoteIn], state: GroupState[Int]) =>
          var c = state.getOption.getOrElse(0)
          val out = rows.toArray.sortBy(_.ts_ms).flatMap { r =>
            var fire = false
            if (r.bad == 1) {
              if (c <= cfg.windowSz) c += 1
              fire = c >= cfg.voteThreshold
            } else if (c > 0) c -= 1
            if (fire) Some(VoteOut(r.server, r.service, r.lag, r.ts_ms, r.causes))
            else None
          }
          state.update(c)
          out.iterator
      }
  }

  /** R4 per-service cooldown dedup as keyed streaming state.
    *
    * Ordering caveat (reference-faithful): the SERVICE key is coarser
    * than the upstream per-(server,service,lag) vote keys, so when two
    * servers fire the same service near-simultaneously, which one wins
    * the cooldown window depends on micro-batch arrival order — exactly
    * as in the reference, whose cooldown folds bus ARRIVAL order
    * (stream_process_alerts.js:420-447). Rows are sorted by
    * (ts_ms, server, lag) WITHIN a batch, so same-batch ties are
    * deterministic; cross-batch merge order across different upstream
    * keys is not a guarantee any per-key ordering contract can give
    * (ApmGraph's per-key epoch atomicity covers each key chain, not
    * their interleave). A batch formulation imposes global ts order —
    * strictly stronger; MultiProcessGraphSpec documents and sidesteps
    * the difference.
    */
  def cooldownStream(fired: Dataset[VoteOut], cfg: Alerts.AlertCfg): Dataset[VoteOut] = {
    import fired.sparkSession.implicits._
    fired.groupByKey(_.service)
      .flatMapGroupsWithState[Long, VoteOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (svc: String, rows: Iterator[VoteOut], state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toArray.sortBy(r => (r.ts_ms, r.server, r.lag)).flatMap { r =>
            val emit = last == Long.MinValue ||
              (r.ts_ms - last) / 1000.0 > cfg.cooldownMs / 1000.0
            if (emit) { last = r.ts_ms; Some(r) } else None
          }
          state.update(last)
          out.iterator
      }
  }

  /** S6/A7 — the buffered batch sink: micro-batch parquet/JDBC writer.
    * `foreachBatch` gives exactly-once with the checkpoint; the
    * reference's 1000-row/5-s flush policy maps to the trigger interval.
    * A7 (the reference's min-heap watermark-ordered emission,
    * stream_calc_stats.js:136-155 + binary_heap.js): rows are sorted by
    * event time within each emitted batch — Spark's watermark already
    * bounds what a batch contains, so a per-batch local sort reproduces
    * the ordered-emission guarantee without any heap.
    *
    * Exactly-once: a `foreachBatch` writer is only exactly-once if it is
    * IDEMPOTENT per batchId — a crash between the data write and the
    * checkpoint commit replays the batch on restart. Writing
    * mode=overwrite into a per-batchId directory makes the replay land
    * on the same path with the same (deterministically recomputed)
    * rows, so the crash window cannot duplicate. `afterBatch` is a
    * fault-injection point: it runs after the data write but BEFORE the
    * epoch commits, i.e. inside that exact window (GraphFaultSpec
    * crashes there and asserts the resume is loss- and dup-free);
    * production callers leave it a no-op.
    */
  def sinkToParquet(df: DataFrame, outDir: String, checkpoint: String,
      trigger: String = "5 seconds", orderCol: Option[String] = None,
      availableNow: Boolean = false,
      afterBatch: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(
        if (availableNow) org.apache.spark.sql.streaming.Trigger.AvailableNow()
        else org.apache.spark.sql.streaming.Trigger.ProcessingTime(trigger))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val ordered = orderCol.fold(batch)(c => batch.sortWithinPartitions(c))
        ordered.write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        afterBatch(batchId)
      }
      .start()

  /** S6 failed-batch re-queue (stream_insert_db.js:326-353): when the DB
    * insert throws, the reference unshifts the drained buffer back to the
    * FRONT of the queue, so failed records retry — in original order —
    * at the next flush, and nothing is dropped while the sink is down.
    *
    * Spark-native mapping: the in-memory buffer becomes a durable park
    * directory. Each micro-batch (1) retries parked batches in batch-id
    * order, deleting each on success, then (2) attempts the current
    * batch, parking it as parquet on failure. Parking with
    * mode=overwrite keyed on batchId keeps the park step idempotent
    * under checkpoint replay; the retry path is at-least-once across a
    * crash between write-success and park-delete — the same contract as
    * the reference (a re-consumed message after an un-acked insert).
    *
    * Order is STRICT, like the reference's queue: the first parked
    * batch that still fails BLOCKS the line — later parked batches are
    * not attempted and the current batch parks behind them without a
    * write attempt. A flaky sink that recovers mid-window can therefore
    * never insert batch N+1 before a still-stuck batch N (the
    * overtaking a per-batch try/ignore loop would allow).
    *
    * The park is BOUNDED the way the reference bounds its queues
    * (alarm thresholds at 10⁶ msgs / 150 MB per queue,
    * config/apm_config.json:41-42): every park updates a
    * batches/bytes [[ParkGauge]]; crossing `alarmBatches` OR
    * `alarmBytes` fires `onAlarm` (default: a log WARN) on every
    * subsequent park, and crossing `maxParkedBatches` — the optional
    * hard stop — throws AFTER the batch has parked durably, halting
    * the query with the backlog intact for replay on restart (data
    * safety first, then operator attention; silently parking forever
    * would fill the disk instead of a pager).
    */
  final case class ParkGauge(batches: Int, bytes: Long)

  class RequeueWriter(parkDir: String,
      write: (DataFrame, Long) => Unit,
      alarmBatches: Int = 64,
      alarmBytes: Long = 150L * 1024 * 1024,
      onAlarm: ParkGauge => Unit = ApmStreaming.warnParkAlarm,
      maxParkedBatches: Int = Int.MaxValue) extends Serializable {
    private def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(); ()
    }
    def parkedBatches(): Seq[java.io.File] =
      Option(new java.io.File(parkDir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("park_"))
        .sortBy(_.getName).toSeq
    private def dirBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .map(dirBytes).sum
    /** Current park backlog — the queue-depth gauge a deployment
      * monitors (mirrors the reference's per-queue size/bytes alarm).
      */
    def gauge(): ParkGauge = {
      val ds = parkedBatches()
      ParkGauge(ds.size, ds.map(dirBytes).sum)
    }
    private def afterPark(): Unit = {
      val g = gauge()
      if (g.batches >= alarmBatches || g.bytes >= alarmBytes) onAlarm(g)
      if (g.batches > maxParkedBatches)
        throw new IllegalStateException(
          s"requeue park exceeded maxParkedBatches=$maxParkedBatches " +
            s"(${g.batches} batches, ${g.bytes} bytes): the head batch " +
            s"keeps failing; backlog is parked durably under $parkDir " +
            "and replays in order on restart")
    }
    def apply(batch: Dataset[org.apache.spark.sql.Row], batchId: Long): Unit = {
      val spark = batch.sparkSession
      var blocked = false
      parkedBatches().foreach { d =>
        if (!blocked) {
          val replay = spark.read.parquet(d.getPath)
          try { write(replay, batchId); deleteRec(d) }
          catch { case e: Exception => // head of line stuck
            blocked = true
            // name the CAUSE, not just the backlog: the park gauge says
            // how much is stuck, this says why (a silent catch left
            // operators diagnosing a growing park dir blind)
            ApmStreaming.log.warn(s"requeue head batch ${d.getName} " +
              s"still failing: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
      if (blocked) {
        batch.write.mode("overwrite").parquet(f"$parkDir/park_$batchId%012d")
        afterPark()
      } else
        try write(batch.toDF(), batchId)
        catch { case e: Exception =>
          ApmStreaming.log.warn(s"sink write failed for batch $batchId, " +
            s"parking: ${e.getClass.getSimpleName}: ${e.getMessage}")
          batch.write.mode("overwrite").parquet(f"$parkDir/park_$batchId%012d")
          afterPark()
        }
    }
  }

  /** Default park alarm: one WARN per park past the threshold. */
  private def warnParkAlarm(g: ParkGauge): Unit =
    org.slf4j.LoggerFactory.getLogger(classOf[RequeueWriter]).warn(
      s"requeue park backlog past alarm threshold: ${g.batches} batches, " +
        s"${g.bytes} bytes — the head batch is failing and everything " +
        "behind it is parking (reference analogue: queue alarm at 1e6 " +
        "msgs / 150 MB)")

  /** [[sinkToParquet]] with the re-queue wrapper around an arbitrary
    * batch writer (parquet append here; JDBC `df.write.jdbc` on a real
    * deployment — the writer is injected precisely so the flaky-sink
    * path is testable without a database).
    */
  def sinkWithRequeue(df: DataFrame, checkpoint: String, parkDir: String,
      write: (DataFrame, Long) => Unit,
      availableNow: Boolean = true, trigger: String = "5 seconds")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = new RequeueWriter(parkDir, write)
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(
        if (availableNow) org.apache.spark.sql.streaming.Trigger.AvailableNow()
        else org.apache.spark.sql.streaming.Trigger.ProcessingTime(trigger))
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        w(batch, batchId)
      }
      .start()
  }
}
