package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming token-QUOTA admission — the ingest-control twin of the
  * batch token-budget fill ([[graft.operators.Curation.mixApply]]): as
  * documents arrive, each source's running token total decides
  * admission, so a source that has filled its budget stops consuming
  * the corpus AT INGEST instead of being trimmed after the fact (the
  * streaming analogue of the reference's queue-depth flow control, S2 —
  * backpressure by data budget rather than queue length).
  *
  * Every arriving doc advances the running total whether admitted or
  * not, which makes the decision identical to the batch rule
  * (`tokens-before < budget`): feed the same docs in the same order
  * and the admitted set and cumulative totals match the batch operator
  * row-for-row (QuotaStreamingSpec pins stream == batch across
  * micro-batch boundaries — budgets must survive a restart mid-corpus).
  *
  * Scale/state: keyed by source; state is ONE long per source (the
  * running total) — no document retention at all, so state size is
  * |sources| regardless of corpus size.
  */
object QuotaStreaming {

  case class DocTok(source: String, doc_id: Long, n_tok: Long, seq: Long)
  case class Admit(source: String, doc_id: Long, n_tok: Long,
      cum_tok: Long, admitted: Int)
  case class SrcQuota(cum: Long)

  /** docs: streaming frame with (source, doc_id, n_tok, seq). `seq` is
    * the caller's admission-order key (a micro-batch iterator's order is
    * not guaranteed, so the order must be data, not arrival accident);
    * cross-batch order is batch order, checkpointed.
    */
  def quotaStream(docs: DataFrame, budget: Long): Dataset[Admit] = {
    import docs.sparkSession.implicits._
    docs.selectExpr("source", "doc_id", "n_tok", "seq").as[DocTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[DocTok], state: GroupState[SrcQuota]) => {
          var cum = state.getOption.map(_.cum).getOrElse(0L)
          val out = rows.toSeq.sortBy(_.seq).map { d =>
            val before = cum
            cum += d.n_tok
            Admit(src, d.doc_id, d.n_tok, cum,
              if (before < budget) 1 else 0)
          }
          state.update(SrcQuota(cum))
          out.iterator
        })
  }
}
