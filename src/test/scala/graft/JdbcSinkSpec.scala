package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicBoolean
import graft.streaming.{ApmStreaming, JdbcSink}

/** S6 against a LIVE database: embedded Apache Derby (shipped in Spark's
  * own jar directory) stands in for the reference's Postgres
  * (stream_insert_db.js:277-353). Verifies the real `df.write.jdbc`
  * path — table auto-create, multi-row batched INSERT, append-mode
  * retries — plus the jsonb stats column round-trip and the failed-batch
  * requeue driving an actual DB that goes down and recovers.
  */
class JdbcSinkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // keep derby.log out of the repo working dir
  System.setProperty("derby.stream.error.file", "/tmp/graft_derby.log")

  private def derbyUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby")
    s"jdbc:derby:$dir/db;create=true"
  }

  private def readTable(url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, new java.util.Properties())

  test("tx rows batch-insert into Derby and read back identical") {
    val url = derbyUrl()
    val sf = "/root/testdata/sf0.001"
    val tx = graft.operators.Parsing.parseRoundtrip(spark, sf)
      .limit(500).cache()
    JdbcSink.writeBatch(tx, url, "tx")
    val back = readTable(url, "tx")
    assert(back.count() == tx.count())
    // cell-exact, null-safe: canonical sorted row renderings match
    def canon(df: DataFrame): Seq[String] = {
      val ordered = df.select(tx.columns.sorted.map(col).toIndexedSeq: _*)
      ordered.collect().map(_.toString).sorted.toSeq
    }
    assert(canon(back) == canon(tx))
    tx.unpersist(); ()
  }

  test("stats jsonb column survives the DB round-trip via from_json") {
    val url = derbyUrl()
    val sf = "/root/testdata/sf0.001"
    val cand = SparkEntry.entry(spark).limit(200).cache()
    val rows = JdbcSink.statsTableRows(cand)
    JdbcSink.writeBatch(rows, url, "stats")
    val back = readTable(url, "stats")
    assert(back.count() == rows.count())
    // parse the json payload read back FROM THE DB and check one nested
    // field against the flat source column (entries.js:120-151 shape)
    val parsed = back.select(col("server"), col("service"), col("ts_ms"),
      get_json_object(col("stats_json"), "$.averagesignal")
        .cast("int").as("sig_back"))
    val src = cand.select(col("server"), col("service"), col("ts_ms"),
      col("average_signal").cast("int").as("sig_src"))
    val joined = parsed.join(src, Seq("server", "service", "ts_ms"))
    assert(joined.count() == rows.count())
    assert(joined.filter(
      !(col("sig_back") <=> col("sig_src"))).isEmpty)
    cand.unpersist(); ()
  }

  test("flush policy: count-bound batches and time-bound trickle flushes") {
    // The reference flushes its insert buffer at 1000 rows OR 5 s idle
    // (config/apm_config.json:230-231). Spark-side the micro-batch IS
    // the buffer: source admission bounds the count path, the trigger
    // interval bounds the time path. Pin BOTH on the live Derby sink.
    import scala.collection.mutable
    import spark.implicits._
    import graft.streaming.QueueRegistry
    implicit val sqlCtx = spark.sqlContext
    val url = derbyUrl()
    val bound = 1000

    // COUNT path: 2500 queued rows with maxpoll=1000 on a 1-partition
    // topic must arrive as exactly 1000/1000/500-row inserts.
    val topic = "t_flush"
    QueueRegistry.drop(topic)
    val t = QueueRegistry.topic(topic, nPartitions = 1)
    (0 until 2500).foreach(i => t.produce(null, i.toString))
    val sizes = mutable.Buffer.empty[Long]
    val write: (DataFrame, Long) => Unit = (df, _) => {
      val rows = df.selectExpr("CAST(value AS INT) AS v").cache()
      sizes += rows.count()
      JdbcSink.writeBatch(rows, url, "flushed")
      rows.unpersist(); ()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_flush").toString
    val q = ApmStreaming.sinkWithRequeue(
      spark.readStream.format("graftqueue")
        .option("topic", topic).option("group", "flush")
        .option("maxpoll", bound).load(),
      s"$dir/ckpt_cnt", s"$dir/park_cnt", write,
      availableNow = true)
    q.awaitTermination()
    assert(sizes.toList == List(1000L, 1000L, 500L),
      s"count-bound flush sizes: $sizes")
    assert(readTable(url, "flushed").count() == 2500L)

    // TIME path: a trickle far below the count bound still flushes per
    // trigger — rows never wait for the buffer to fill.
    val in = MemoryStream[Int]
    sizes.clear()
    val q2 = ApmStreaming.sinkWithRequeue(in.toDF.toDF("value"),
      s"$dir/ckpt_t", s"$dir/park_t", write,
      availableNow = false, trigger = "1 seconds")
    try {
      in.addData(1, 2, 3); q2.processAllAvailable()
      in.addData(4, 5); q2.processAllAvailable()
      assert(sizes.toList == List(3L, 2L),
        s"time-bound flush sizes: $sizes")
      assert(readTable(url, "flushed").count() == 2505L)
    } finally q2.stop()
  }

  test("requeue parks while Derby is down and drains into the live table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val url = derbyUrl()
    val dir = java.nio.file.Files.createTempDirectory("graft_jrq").toString
    val down = new AtomicBoolean(true)
    val write: (DataFrame, Long) => Unit = (df, _) => {
      if (down.get) throw new RuntimeException("db down")
      JdbcSink.writeBatch(df, url, "vals")
    }
    val in = MemoryStream[Int]
    val q = ApmStreaming.sinkWithRequeue(in.toDF.toDF("v"),
      s"$dir/ckpt", s"$dir/park", write,
      availableNow = false, trigger = "1 seconds")
    val w = new ApmStreaming.RequeueWriter(s"$dir/park", write)
    try {
      in.addData(1, 2, 3); q.processAllAvailable()
      assert(w.parkedBatches().nonEmpty, "batch must park while DB is down")
      down.set(false)
      in.addData(4); q.processAllAvailable()
      val got = readTable(url, "vals").as[Int].collect().toList.sorted
      assert(got == List(1, 2, 3, 4), s"rows: $got")
      assert(w.parkedBatches().isEmpty, "park dir must drain")
    } finally q.stop()
  }
}
