package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters by the space-saving summary (Metwally et
  * al., a Misra-Gries-FAMILY counter summary — but not Misra-Gries
  * itself, which decrements every counter instead of evicting the
  * minimum slot) — the ingest-time twin of the batch count-min top-k
  * ([[graft.operators.TextAnalysis.cmsTopk]]): each word-space shard
  * of the stream keeps at
  * most `capacity` counters, evicting the minimum-count slot when a new
  * word arrives at a full table (the evicted count is inherited, which
  * is what gives the deterministic error bound).
  *
  * Guarantee (Metwally et al., the space-saving invariant): for every
  * item, est − true ≤ min-counter ≤ N / capacity, and every item whose
  * true frequency exceeds N / capacity is IN the table. Both bounds are
  * asserted against exact batch counts in TopKStreamingSpec — the
  * approximation ships with its error contract, like the KMV/CMS batch
  * sketches.
  *
  * Scale/state: keyed by a hash shard of the word space so the table
  * parallelizes; state per shard is a bounded `capacity`-entry map —
  * corpus-size-independent, exactly what an unbounded-vocabulary
  * ingest needs. Deterministic given data order: ties evict the
  * lexicographically smallest minimum slot, so results are reproducible
  * run-to-run (no arrival-accident nondeterminism).
  */
object TopKStreaming {

  case class WordIn(shard: Int, word: String, seq: Long)
  case class SlotOut(shard: Int, word: String, est: Long, err: Long,
      n_shard: Long)
  case class MgState(slots: Map[String, (Long, Long)], n: Long)

  /** words: streaming frame with (shard, word, seq); `seq` fixes the
    * fold order within a micro-batch (cross-batch order is batch order,
    * checkpointed). Emits the CURRENT summary table of each shard after
    * every batch — consumers read the latest snapshot per shard.
    */
  def topKStream(words: DataFrame, capacity: Int): Dataset[SlotOut] = {
    import words.sparkSession.implicits._
    words.selectExpr("shard", "word", "seq").as[WordIn]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (shard: Int, rows: Iterator[WordIn], state: GroupState[MgState]) => {
          var st = state.getOption.getOrElse(MgState(Map.empty, 0L))
          var slots = st.slots // word -> (est, inheritedErr)
          var n = st.n
          rows.toSeq.sortBy(_.seq).foreach { r =>
            n += 1
            slots.get(r.word) match {
              case Some((est, err)) =>
                slots = slots.updated(r.word, (est + 1, err))
              case None if slots.size < capacity =>
                slots = slots.updated(r.word, (1L, 0L))
              case None =>
                // evict the min-count slot (lexicographic tie-break),
                // inherit its count as the new word's overestimate
                val (evWord, (evEst, _)) =
                  slots.minBy { case (w, (e, _)) => (e, w) }
                slots = (slots - evWord)
                  .updated(r.word, (evEst + 1, evEst))
            }
          }
          state.update(MgState(slots, n))
          slots.toSeq.sortBy { case (w, (e, _)) => (-e, w) }
            .map { case (w, (e, er)) => SlotOut(shard, w, e, er, n) }
            .iterator
        })
  }
}
