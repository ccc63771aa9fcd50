package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup
import graft.streaming.DedupStreaming

/** Streaming dedup-at-ingest vs the batch pair relation: feeding docs in
  * id order, a doc is flagged iff a lower-id near-dup exists — exactly
  * the (id_a < id_b, shared band, est >= t) pair set of the batch LSH
  * pass — including dups whose canonical arrived in an EARLIER
  * micro-batch (the cross-batch state contract).
  */
class DedupStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mkDocs: Seq[(Long, String)] = {
    val bases = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank",
      "machine learning systems require careful data curation and cleaning",
      "a completely different sentence about cooking pasta with tomato sauce",
      "streaming engines process unbounded data with bounded state budgets")
    val docs = scala.collection.mutable.Buffer.empty[(Long, String)]
    var id = 0L
    bases.zipWithIndex.foreach { case (b, i) =>
      docs += ((id, b)); id += 1
      // exact dup and a near dup (one word changed) of each base
      docs += ((id, b)); id += 1
      docs += ((id, b.replaceFirst("the", "that"))); id += 1
      // an unrelated singleton between families
      docs += ((id, s"unique filler number $i with nothing shared at all $i $i")); id += 1
    }
    docs.toSeq
  }

  test("stream == batch first-seen dup relation, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = mkDocs
    val threshold = 0.4

    // batch expectation from the SAME shared columns: pairs with a
    // shared band and est >= t; per doc, the min lower-id canonical
    val sigRows = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.minhashSigCol(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val rows = Dedup.MinhashK / Dedup.MinhashBands
    def bands(sig: Seq[Long]): Set[(Int, Seq[Long])] =
      (0 until Dedup.MinhashBands)
        .map(b => b -> sig.slice(b * rows, (b + 1) * rows)).toSet
    val expected = docs.map(_._1).flatMap { idB =>
      val cands = docs.map(_._1).filter(_ < idB).filter { idA =>
        bands(sigRows(idA)).intersect(bands(sigRows(idB))).nonEmpty
      }.filter { idA =>
        val eq = sigRows(idA).zip(sigRows(idB)).count { case (x, y) => x == y }
        eq.toDouble / Dedup.MinhashK >= threshold
      }
      if (cands.isEmpty) None else Some(idB -> cands.min)
    }.toMap
    assert(expected.nonEmpty, "fixture must contain dups")

    val in = MemoryStream[(Long, String)]
    val out = DedupStreaming.nearDupStream(
      in.toDF.toDF("doc_id", "text"), threshold)
    val q = out.writeStream.format("memory").queryName("dedup_ingest")
      .outputMode("append").start()
    try {
      // split mid-family so several dups arrive AFTER their canonical's
      // micro-batch
      val (b1, b2) = docs.splitAt(docs.size / 2)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      val got = spark.table("dedup_ingest")
        .groupBy("doc_id").agg(min("canonical_id").as("canonical"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"got $got\nexpected $expected")
      // at least one dup must have crossed the batch boundary
      val boundary = b1.last._1
      assert(expected.exists { case (d, c) => d > boundary && c <= boundary },
        "fixture must exercise a cross-batch dup")
    } finally q.stop()
  }
}
