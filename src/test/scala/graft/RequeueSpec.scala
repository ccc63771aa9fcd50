package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicBoolean
import graft.streaming.ApmStreaming

/** S6 failed-batch re-queue: a flaky sink must not lose rows — batches
  * written while the sink is down park durably and replay, in original
  * batch order, once the sink recovers (stream_insert_db.js:326-353).
  */
class RequeueSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("sink-down batches park, replay in order on recovery, then drain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rq").toString
    val target = s"$dir/target"
    val down = new AtomicBoolean(true)
    var seq = 0 // write-arrival sequence, stamps replay order
    val write: (DataFrame, Long) => Unit = (df, _) => {
      if (down.get) throw new RuntimeException("sink down")
      seq += 1
      df.withColumn("arrival", org.apache.spark.sql.functions.lit(seq))
        .write.mode("append").parquet(target)
    }
    val in = MemoryStream[Int]
    val q = ApmStreaming.sinkWithRequeue(in.toDF.toDF("v"),
      s"$dir/ckpt", s"$dir/park", write, availableNow = false, trigger = "1 seconds")
    val w = new ApmStreaming.RequeueWriter(s"$dir/park", write)
    try {
      in.addData(1, 2, 3); q.processAllAvailable()   // parks (down)
      in.addData(4, 5); q.processAllAvailable()      // parks (still down)
      assert(w.parkedBatches().size == 2, s"expected 2 parked: ${w.parkedBatches()}")
      down.set(false)
      in.addData(6); q.processAllAvailable()         // replays both + writes
      val got = spark.read.parquet(target).as[(Int, Int)].collect().toList
      // exactly-once: every row lands once
      assert(got.map(_._1).sorted == List(1, 2, 3, 4, 5, 6), s"rows: $got")
      // original order: batch {1,2,3} replays before {4,5}, before live {6}
      val byArrival = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      assert(byArrival(1) == Set(1, 2, 3) && byArrival(2) == Set(4, 5) &&
        byArrival(3) == Set(6), s"order: $byArrival")
      assert(w.parkedBatches().isEmpty, "park dir must drain")
    } finally q.stop()
  }
}
