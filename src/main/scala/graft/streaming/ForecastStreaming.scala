package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.ApmStats.holtForecast]] (a13) —
  * Holt level+trend forecasting AT INGEST: per (server, service) key the
  * state is just (level, trend, last bucket), each arriving per-bucket
  * count emits its one-step-ahead forecast and residual, and the fp
  * operation order is IDENTICAL to the batch recursion, so stream ==
  * batch bit-for-bit on the same series (the spec pins exact equality on
  * both state-store providers).
  *
  * Init matches the batch convention exactly: l0 = y(0), b0 =
  * y(1) - y(0); the first emitted row is the series' second bucket.
  *
  * INTERIOR gaps are filled: an arrival at bucket b > last + 1 first
  * runs the recurrence through the missing buckets with y = 0, emitting
  * those rows too — the dense-scaffold semantics (a5's tpm=0 rule) that
  * the batch side gets from its crossJoin scaffold, reproduced from
  * state so a sparse feed converges to the dense-fed result. Leading /
  * trailing zeros (before a key's first event, after its last) are the
  * feed's responsibility — a stream cannot know the global bucket range
  * (documented contract; the batch scaffold covers them).
  *
  * State is O(1) per key (three numbers), the scale contract
  * forecast-based alerting needs at millions of keys. Rows within a
  * micro-batch are processed in bucket order (iterator order is not
  * guaranteed); out-of-order ACROSS micro-batches is a feed error and
  * fails loudly rather than corrupting the recursion.
  */
object ForecastStreaming {

  case class BucketCnt(server: String, service: String, bucket: Long,
      cnt: Long)
  case class HoltOut(server: String, service: String, bucket: Long,
      y: Double, forecast: Double, err: Double, level: Double,
      trend: Double)
  case class HoltState(l: Double, b: Double, have: Int, firstY: Double,
      lastBucket: Long)

  def holtStream(buckets: DataFrame, alpha: Double = 0.5,
      beta: Double = 0.25): Dataset[HoltOut] = {
    import buckets.sparkSession.implicits._
    buckets.select(col("server"), col("service"),
        col("bucket").cast("long").as("bucket"),
        col("cnt").cast("long").as("cnt")).as[BucketCnt]
      .groupByKey(r => (r.server, r.service))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), rows: Iterator[BucketCnt],
            state: GroupState[HoltState]) => {
          val (srv, svc) = key
          var st = state.getOption.getOrElse(HoltState(0.0, 0.0, 0, 0.0, 0L))
          val out = List.newBuilder[HoltOut]
          def step(bucket: Long, y: Double): Unit = {
            val f = st.l + st.b
            val l1 = alpha * y + (1 - alpha) * f
            val b1 = beta * (l1 - st.l) + (1 - beta) * st.b
            out += HoltOut(srv, svc, bucket, y, f, y - f, l1, b1)
            st = HoltState(l1, b1, 2, st.firstY, bucket)
          }
          rows.toSeq.sortBy(_.bucket).foreach { r =>
            require(st.have == 0 || r.bucket > st.lastBucket,
              s"out-of-order bucket ${r.bucket} after ${st.lastBucket} " +
                s"for key $key")
            val y = r.cnt.toDouble
            if (st.have == 0) st = HoltState(0.0, 0.0, 1, y, r.bucket)
            else {
              if (st.have == 1) {
                // batch init from the first two points; the second
                // point is then processed as the first step
                st = HoltState(st.firstY, 0.0, 1, st.firstY, st.lastBucket)
                val y1 = if (r.bucket == st.lastBucket + 1) y else 0.0
                st = st.copy(b = y1 - st.firstY)
              }
              // interior gap fill: run the recurrence through missing
              // buckets with y = 0 (the dense-scaffold semantics)
              var g = st.lastBucket + 1
              while (g < r.bucket) { step(g, 0.0); g += 1 }
              step(r.bucket, y)
            }
          }
          if (st.have > 0) state.update(st)
          out.result().iterator
        })
  }
}
