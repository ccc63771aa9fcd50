package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.{Dedup, Multimodal, Similarity}

/** Streaming near-duplicate DEDUP-AT-INGEST — the streaming twin of the
  * batch MinHash-LSH pass ([[Dedup.minhashLsh]]): as documents arrive,
  * each is checked against everything ALREADY ingested and flagged if a
  * prior near-duplicate exists. This is the shape a training-data
  * ingestion pipeline needs (drop near-dups before they ever land in
  * the corpus) rather than the batch shape (find all pairs after the
  * fact).
  *
  * Mechanics: same signature and banding columns as the batch pass
  * ([[Dedup.minhashSigCol]]/[[Dedup.bandStructsCol]] — shared code, so
  * stream and batch agree by construction), then keyed state per LSH
  * band BUCKET via `flatMapGroupsWithState`: the state is the bucket's
  * seen (doc_id, signature) list, each arriving doc compares against
  * the bucket's priors with the signature-estimated Jaccard, and every
  * match emits (doc_id, canonical_id, est). A doc's final verdict (is
  * it a dup, and of whom) is the min canonical over its emitted matches
  * — an ordinary downstream aggregation, kept out of this query because
  * a stateful operator must be last in its plan (the same reason
  * [[ApmGraph]] stages its queries).
  *
  * Scale/retention: state is sharded by (band, bkey) — the same key the
  * batch shuffle uses — and holds signatures only (k longs per doc),
  * never text. Buckets are ~N/keyspace docs; production ingest bounds
  * retention with an event-time timeout per bucket (drop state for
  * buckets idle past the dedup horizon) exactly like the enrichment
  * state's `EventTimeTimeout` — kept timeout-free here because the
  * contract under test is the cross-batch dedup decision itself.
  */
object DedupStreaming {

  case class BandDoc(band: Int, bkey: String, doc_id: Long, sig: Seq[Long])
  case class DupMatch(doc_id: Long, canonical_id: Long, est_jaccard: Double)
  case class BucketState(docs: List[(Long, Seq[Long])])

  /** docs: streaming frame with (doc_id: long, text: string).
    * `maxBucket` bounds the retained per-bucket state to the most recent
    * N entries (FIFO eviction, same contract as [[pHashDupStream]]):
    * default unbounded preserves the exact-recall contract the spec
    * pins; WIRED ingest paths ([[markupIngestStream]]) pass a bound.
    */
  def nearDupStream(docs: DataFrame, threshold: Double = 0.4,
      maxBucket: Int = Int.MaxValue): Dataset[DupMatch] = {
    import docs.sparkSession.implicits._
    val banded = docs
      .select(col("doc_id"), Dedup.minhashSigCol(col("text")).as("sig"))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.bandStructsCol(col("sig"))).as("b"))
      .select(col("b.band").as("band"), col("b.bkey").as("bkey"),
        col("doc_id"), col("sig"))
      .as[BandDoc]
    banded.groupByKey(d => (d.band, d.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, String), rows: Iterator[BandDoc],
            state: GroupState[BucketState]) => {
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[DupMatch]
          // deterministic within-batch order: ingest order == doc_id
          // order (micro-batch iterator order is not guaranteed)
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            seen.foreach { case (cid, csig) =>
              if (cid < d.doc_id) {
                var eq = 0
                var i = 0
                while (i < Dedup.MinhashK) {
                  if (csig(i) == d.sig(i)) eq += 1
                  i += 1
                }
                val est = eq.toDouble / Dedup.MinhashK
                if (est >= threshold) out += DupMatch(d.doc_id, cid, est)
              }
            }
            seen = (d.doc_id, d.sig) :: seen
            if (maxBucket != Int.MaxValue) seen = seen.take(maxBucket)
          }
          state.update(BucketState(seen))
          out.result().iterator
        })
  }

  /** The ingest FRONT DOOR, chained: markup main-content extraction
    * ([[graft.operators.Markup.extractedFromHtml]] — t22's pure per-row
    * expressions, stateless and therefore streaming-safe by
    * construction) feeding the text near-dup twin, so dedup decisions
    * are made on the EXTRACTED content, never the raw markup (shared
    * nav/footer boilerplate would otherwise dominate the shingle sets
    * and glue unrelated documents together).
    *
    * This is a WIRED production path, so the per-bucket dedup state is
    * BOUNDED by default (`maxBucket` FIFO — a prior older than the
    * bucket's last N arrivals can no longer be matched, the explicit
    * recall trade; MarkupStreamingSpec pins both the stream==batch
    * equivalence through the chain and the trade itself). The bare
    * twins keep their unbounded exact-recall default for the spec
    * contract.
    *
    * docs: streaming frame with (doc_id: long, html: string).
    */
  def markupIngestStream(docs: DataFrame, threshold: Double = 0.4,
      maxBucket: Int = 256): Dataset[DupMatch] = {
    val extracted = docs.select(col("doc_id"),
      graft.operators.Markup.extractedFromHtml(col("html")).as("text"))
    nearDupStream(extracted, threshold, maxBucket)
  }

  case class PHashBand(band_idx: Int, band_val: Long, doc_id: Long,
      lo: Long, hi: Long)
  case class PHashMatch(doc_id: Long, canonical_id: Long, hamming: Int)
  case class PHashBucketState(docs: List[(Long, Long, Long)])

  /** Streaming twin of [[graft.operators.Multimodal.imagePHash]]'s banded
    * near-dup join — perceptual IMAGE dedup at ingest: as image hashes
    * arrive, each is checked against everything already ingested in its
    * four 16-bit band buckets and flagged when a prior image sits at
    * Hamming <= `tau`. Pigeonhole gives the same exactness the batch
    * join has: any pair within tau=3 of 64 bits shares at least one
    * band, so a qualifying prior can never be missed. The hash itself is
    * computed upstream (a stateless typed map over the payload bytes —
    * [[graft.operators.Multimodal.pHashOf]] works unchanged on a
    * streaming frame); only (id, 8-byte hash) rows reach this stateful
    * stage, never pixels.
    *
    * Same contracts as [[nearDupStream]] with one deliberate widening:
    * the canonical is the FIRST-INGESTED bucket-mate, not the lower id —
    * a doc is checked against every state prior regardless of id, so a
    * near-dup whose "original" arrives in a later micro-batch with a
    * SMALLER id is still caught (under in-id-order ingest, where ids
    * track arrival, the two contracts coincide and stream == batch pair
    * relation exactly; the spec pins both). Within-batch determinism via
    * the doc_id sort, a pair sharing several bands emits once per shared
    * band (downstream dedups, e.g. min-canonical per doc), and
    * production ingest bounds the per-bucket state list with an
    * event-time timeout.
    *
    * `maxBucket` bounds the retained per-bucket state to the most
    * recent N entries (FIFO eviction): with it set, a prior older than
    * the bucket's last `maxBucket` arrivals can no longer be matched —
    * the recall trade a production ingest path makes explicitly. The
    * default keeps the bucket unbounded, preserving the exact-recall
    * contract the spec pins.
    */
  def pHashDupStream(hashes: DataFrame, tau: Int = 3,
      maxBucket: Int = Int.MaxValue): Dataset[PHashMatch] = {
    import hashes.sparkSession.implicits._
    require(tau >= 0 && tau <= Multimodal.PHashBands - 1,
      s"banded recall is exact only for tau <= ${Multimodal.PHashBands - 1}, got $tau")
    val banded = hashes.select(
      Multimodal.pHashBandsCol(col("phash_lo"), col("phash_hi"))
        .as(Seq("band_idx", "band_val")),
      col("doc_id"), col("phash_lo").as("lo"), col("phash_hi").as("hi"))
      .as[PHashBand]
    banded.groupByKey(d => (d.band_idx, d.band_val))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[PHashBand],
            state: GroupState[PHashBucketState]) => {
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[PHashMatch]
          rows.toSeq.sortBy(_.doc_id).foreach { d =>
            seen.foreach { case (cid, clo, chi) =>
              val h = java.lang.Long.bitCount(clo ^ d.lo) +
                java.lang.Long.bitCount(chi ^ d.hi)
              if (h <= tau) out += PHashMatch(d.doc_id, cid, h)
            }
            // cap only when asked: List.take walks/allocates the whole
            // prefix, so the unbounded default stays an O(1) prepend
            seen = (d.doc_id, d.lo, d.hi) :: seen
            if (maxBucket != Int.MaxValue) seen = seen.take(maxBucket)
          }
          state.update(PHashBucketState(seen))
          out.result().iterator
        })
  }

  case class XPair(cap_fp: Long, pair_id: Long, lo: Long, hi: Long)
  case class XMatch(pair_id: Long, canonical_id: Long, hamming: Int,
      is_imgdup: Boolean)
  case class XPairState(pairs: List[(Long, Long, Long)])

  /** Streaming twin of [[graft.operators.Multimodal.crossModalDedup]]
    * (x1) — cross-modal PAIR dedup at ingest: as (caption fingerprint,
    * image pHash) pairs arrive, each is compared against its caption
    * group's priors and every caption collision is emitted with the
    * image verdict attached (`is_imgdup` = Hamming <= tau), so the
    * downstream decision is one aggregation: any imgdup match => drop
    * (the LAION cleanup), collisions but none imgdup => hard negative.
    *
    * State is keyed by cap_fp ONLY — no pHash band state is needed,
    * because the caption group already bounds the candidates, and
    * within a group a direct two-word Hamming compare equals the batch
    * side's banded relation exactly (pigeonhole: Hamming <= 3 of 64
    * bits always shares a 16-bit band, so the band join prunes nothing
    * at the cut; equal image_ids compare at Hamming 0). Canonical is
    * the first-ingested caption-mate, which under in-id-order ingest
    * coincides with x1's p < q rule — CrossModalStreamingSpec pins
    * stream decisions == batch x1 decisions on the planted corpus.
    * `maxBucket` is the wired-path FIFO bound (the hot_caption guard's
    * streaming analogue: a bounded state list caps per-arrival work the
    * way capMax caps the batch group fan-out); default unbounded for
    * the exact twin contract.
    */
  def crossModalDupStream(pairs: DataFrame, tau: Int = 3,
      maxBucket: Int = Int.MaxValue): Dataset[XMatch] = {
    import pairs.sparkSession.implicits._
    require(tau >= 0 && tau <= Multimodal.PHashBands - 1,
      s"the batch twin's banded recall is exact only for tau <= " +
        s"${Multimodal.PHashBands - 1}, got $tau")
    pairs.select(col("cap_fp").cast("long").as("cap_fp"),
        col("pair_id").cast("long").as("pair_id"),
        col("phash_lo").cast("long").as("lo"),
        col("phash_hi").cast("long").as("hi"))
      .as[XPair]
      .groupByKey(_.cap_fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[XPair],
            state: GroupState[XPairState]) => {
          var seen = state.getOption.map(_.pairs).getOrElse(Nil)
          val out = List.newBuilder[XMatch]
          rows.toSeq.sortBy(_.pair_id).foreach { d =>
            seen.foreach { case (cid, clo, chi) =>
              val h = java.lang.Long.bitCount(clo ^ d.lo) +
                java.lang.Long.bitCount(chi ^ d.hi)
              out += XMatch(d.pair_id, cid, h, h <= tau)
            }
            seen = (d.pair_id, d.lo, d.hi) :: seen
            if (maxBucket != Int.MaxValue) seen = seen.take(maxBucket)
          }
          state.update(XPairState(seen))
          out.result().iterator
        })
  }

  case class EmbBand(band: Int, bkey: Long, vec_id: Long,
      v: Seq[Double], bks: Seq[Long])
  case class EmbMatch(vec_id: Long, canonical_id: Long, cos: Double)
  case class EmbBucketState(docs: List[(Long, Seq[Double], Seq[Long])])

  /** Streaming twin of [[Similarity.embedNearDup]] — EMBEDDING near-dup
    * check at ingest, the highest-volume family's ingest-dedup story: as
    * vectors arrive, each is SRP-banded with the batch pass's exact
    * plane table ([[Similarity.srpBandKeys]], bit-identical arithmetic)
    * and compared by exact cosine against everything already ingested in
    * its band buckets; a match emits (vec_id, canonical_id, cos).
    *
    * Batch-contract carryovers: canonical-witness band dedup — a pair is
    * emitted only at the FIRST band where the two signatures agree, so a
    * pair sharing several bands emits ONCE (the batch side's
    * no-distinct-shuffle trick, replayed against state priors using the
    * signature vectors both sides carry); first-INGESTED canonical (the
    * [[pHashDupStream]] widening — under in-id-order ingest this
    * coincides with the batch id_a < id_b relation and stream == batch
    * exactly, cosines included). State per (band, bkey) holds (id, v,
    * bks) — the vector is needed for the exact-cosine verify; a
    * production deployment bounds it with `maxBucket` (FIFO eviction)
    * or an event-time timeout, default unbounded for the exact-recall
    * contract the spec pins.
    */
  def embedDupStream(vecs: DataFrame, threshold: Double = 0.3,
      maxBucket: Int = Int.MaxValue): Dataset[EmbMatch] = {
    import vecs.sparkSession.implicits._
    val typed = vecs.select(col("vec_id").cast("long").as("vec_id"),
      col("v")).as[(Long, Seq[Double])]
    val banded = typed.flatMap { case (id, v) =>
      val bks = Similarity.srpBandKeys(v.toIndexedSeq)
      bks.iterator.zipWithIndex.map { case (bk, band) =>
        EmbBand(band, bk, id, v, bks.toSeq)
      }
    }
    banded.groupByKey(d => (d.band, d.bkey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Int, Long), rows: Iterator[EmbBand],
            state: GroupState[EmbBucketState]) => {
          var seen = state.getOption.map(_.docs).getOrElse(Nil)
          val out = List.newBuilder[EmbMatch]
          rows.toSeq.sortBy(_.vec_id).foreach { d =>
            seen.foreach { case (cid, cv, cbks) =>
              val firstBand = cbks.zip(d.bks).indexWhere {
                case (x, y) => x == y }
              if (firstBand == d.band) {
                val cos = Similarity.cosineSeq(cv.toIndexedSeq,
                  d.v.toIndexedSeq)
                if (cos >= threshold) out += EmbMatch(d.vec_id, cid, cos)
              }
            }
            seen = (d.vec_id, d.v, d.bks) :: seen
            if (maxBucket != Int.MaxValue) seen = seen.take(maxBucket)
          }
          state.update(EmbBucketState(seen))
          out.result().iterator
        })
  }
}
