package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming twin of the PCA covariance pass
  * ([[graft.functions.FixedPointMoments]] / `e4_pca_cov`): exact
  * first+second moments of the embedding stream, maintained at ingest.
  *
  * Same invariant as the batch aggregate — ALL accumulation is integer
  * (fixed-point quantized input), so the running state is exactly
  * order- and batch-boundary-independent: after any prefix of the
  * stream, merging the shard states equals the batch aggregate over
  * the same rows bit-for-bit (MomentsStreamSpec case in StateV2Spec
  * pins it). That is what makes covariance maintainable incrementally
  * at all — a floating accumulation would drift per micro-batch
  * ordering.
  *
  * Sharding: vectors hash to `nShards` keys, each shard folding its own
  * O(d^2)-long buffer (1 + d + d(d+1)/2 — constant in row count), so
  * ingest parallelism scales with shards while the merge — integer adds
  * of nShards tiny buffers — is a trivial final reduction, batch-side
  * or on a downstream tick. Per micro-batch each touched shard emits
  * its updated running buffer; a consumer takes each shard's LATEST row
  * and sums. Overflow uses Math.addExact/multiplyExact like the batch
  * aggregate: loud, never silent — even for out-of-domain input.
  */
object MomentsStreaming {

  case class MomIn(vecId: Long, q: Seq[Long])
  case class MomState(buf: Seq[Long])
  /** Running shard buffer after the micro-batch: n, s[d], m2 upper tri. */
  case class MomOut(shard: Int, n: Long, s: Seq[Long], m2: Seq[Long])

  class MomentsProcessor(d: Int)
      extends StatefulProcessor[Int, MomIn, MomOut] {
    private val nTri = d * (d + 1) / 2
    private val len = 1 + d + nTri
    @transient private var st: ValueState[MomState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MomState]("moments",
        Encoders.product[MomState], TTLConfig.NONE)
    override def handleInputRows(shard: Int, rows: Iterator[MomIn],
        tv: TimerValues): Iterator[MomOut] = {
      val buf = if (st.exists()) st.get().buf.toArray else new Array[Long](len)
      rows.foreach { r =>
        require(r.q.length == d,
          s"moments stream: expected length $d, got ${r.q.length}")
        buf(0) = Math.addExact(buf(0), 1L)
        var i = 0
        var k = 1 + d
        while (i < d) {
          val xi = r.q(i)
          buf(1 + i) = Math.addExact(buf(1 + i), xi)
          var j = i
          while (j < d) {
            buf(k) = Math.addExact(buf(k), Math.multiplyExact(xi, r.q(j)))
            k += 1; j += 1
          }
          i += 1
        }
      }
      st.update(MomState(buf.toSeq))
      Iterator.single(MomOut(shard, buf(0),
        buf.slice(1, 1 + d).toSeq, buf.slice(1 + d, len).toSeq))
    }
  }

  /** (vecId, quantized vector) stream -> per-shard running moments. */
  def momentsStreamV2(in: Dataset[MomIn], d: Int,
      nShards: Int = 16): Dataset[MomOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(r => java.lang.Long.hashCode(r.vecId) % nShards match {
        case m if m < 0 => m + nShards
        case m => m
      })
      .transformWithState(new MomentsProcessor(d),
        TimeMode.None(), OutputMode.Append())
  }

  /** Merge each shard's latest emitted buffer — integer adds, exactly
    * the batch aggregate's merge.
    */
  def mergeLatest(rows: Seq[MomOut], d: Int): (Long, Seq[Long], Seq[Long]) = {
    val latest = rows.groupBy(_.shard).map { case (_, rs) => rs.maxBy(_.n) }
    val nTri = d * (d + 1) / 2
    val s = new Array[Long](d)
    val m2 = new Array[Long](nTri)
    var n = 0L
    latest.foreach { r =>
      n = Math.addExact(n, r.n)
      var i = 0
      while (i < d) { s(i) = Math.addExact(s(i), r.s(i)); i += 1 }
      var k = 0
      while (k < nTri) { m2(k) = Math.addExact(m2(k), r.m2(k)); k += 1 }
    }
    (n, s.toSeq, m2.toSeq)
  }
}
