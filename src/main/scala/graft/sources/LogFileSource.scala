package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S1/S2 — the log-file source layer. The reference spawns ~70
  * `perl_tail.pl` processes with a pause-file backpressure protocol
  * (stream_parse_transactions.js:814-975, perl_tail.pl); in Spark both
  * collapse into the file streaming source:
  *
  *  - tail-follow  -> `readStream.format("text")` on the log directory
  *    (new data is discovered per micro-batch);
  *  - per-file identity (the parser routes by file name, :741-812)
  *    -> `input_file_name()`;
  *  - pause-file flow control -> `maxFilesPerTrigger` / source rate
  *    limits (Structured Streaming back-pressures natively);
  *  - the server-name-from-path convention (path segment 2, :747)
  *    -> regexp_extract on the file name.
  */
object LogFileSource {

  val lineSchema: StructType =
    StructType(Seq(StructField("value", StringType)))

  /** Streaming lines + file identity + routing columns. */
  def stream(spark: SparkSession, globPath: String,
      maxFilesPerTrigger: Int = 10): DataFrame =
    route(spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(globPath))

  /** Batch equivalent over the same layout (for tests / backfill). */
  def batch(spark: SparkSession, globPath: String): DataFrame =
    route(spark.read.format("text").load(globPath))

  /** P1 routing columns: file, server (path segment after /net/),
    * log type class (soap_io | server_log | app).
    */
  def route(lines: DataFrame): DataFrame =
    lines
      .withColumn("file", input_file_name())
      .withColumn("server", regexp_extract(col("file"), "/net/([^/]+)/", 1))
      .withColumn("log_type",
        when(col("file").rlike("soap_io"), "soap_io")
          .when(col("file").rlike("server\\.log"), "server_log")
          .otherwise("app"))
      .select(col("file"), col("server"), col("log_type"),
        col("value").as("line"))
}
