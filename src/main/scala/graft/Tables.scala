package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the driver test data (`/root/testdata/sf*`).
  *
  * All operators are parameterized `(SparkSession, sfDir) => DataFrame`;
  * this is the single place that knows the on-disk layout. Reads are plain
  * parquet scans so Catalyst can push filters/column pruning into the scan
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Load + spread an under-split scan across the cores. The test tables
    * are single-file/single-row-group parquet, so a plain scan is ONE
    * input partition — and any query whose cost is per-row compute above
    * that scan (regex parse, JSON decode, shingle hashing) runs on one
    * core of 32 no matter how declarative the plan is (this, not host
    * stalls, explained most of round 1's bench outliers). The repartition
    * is conditional: at production scale input splits >> cores and this
    * is a no-op with zero added exchanges. Row-group-level splitting
    * can't substitute (`maxPartitionBytes` only splits across row-group
    * boundaries, and these files have one).
    *
    * Use for scans feeding heavy per-row expressions; plain [[load]] is
    * right for scans feeding joins/aggregations (their exchanges already
    * redistribute) and for operators whose plan contract is shuffle-free.
    */
  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = load(spark, sfDir, name)
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** The APM transaction stream, mapped per FIXTURES.md §A onto `events`:
    * endTs→ts, service→event_type, elapsed→value, server→srv(user_id%3),
    * logId→event_id. Reference schema: /root/reference/entries.js:1-43.
    * Timestamps flow as epoch millis (BIGINT) end-to-end so Spark and the
    * DuckDB oracle agree bit-for-bit regardless of parquet time units.
    */
  /** Epoch-millis from the events `ts` column. The test parquet stores
    * TIMESTAMP(NANOS), which Spark 4 only reads as LongType (nanos) under
    * `spark.sql.legacy.parquet.nanosAsLong=true` — integer `div` keeps
    * full precision (ns values exceed 2^53, so float division would not).
    */
  def tsMillis(df: DataFrame): org.apache.spark.sql.Column = colMillis(df, "ts")

  /** Epoch-ms column for any nano-timestamp parquet column (read as
    * LongType nanos under nanosAsLong, or as a native timestamp).
    */
  def colMillis(df: DataFrame, name: String): org.apache.spark.sql.Column =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$name div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ wall-clock == UTC instant under the UTC session timezone
        unix_millis(col(name).cast("timestamp"))
      case _ => unix_millis(col(name))
    }

  /** `spread = true` for consumers whose cost is per-row compute on this
    * frame itself (codecs, parsers); leave false when the consumer's own
    * exchanges (joins, groupBys, keyed folds) already redistribute.
    */
  /** Pushdown-friendly event-time range predicate (ms bounds, half-open):
    * compares the RAW timestamp column against literals of its own type.
    * `unix_millis(col) >= lo` never reaches the parquet scan (the
    * conversion wraps the column); `col >= <literal of column type>`
    * shows up in PushedFilters — at scale this is the fact-table date
    * pruning that decides whether a query reads 1% or 100% of the data.
    */
  def tsRange(df: DataFrame, name: String,
      loMs: Option[Long], hiMs: Option[Long]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    def ntzLit(ms: Long) = lit(java.time.LocalDateTime.ofEpochSecond(
      math.floorDiv(ms, 1000), (math.floorMod(ms, 1000) * 1000000).toInt,
      java.time.ZoneOffset.UTC))
    val (loC, hiC) = df.schema(name).dataType match {
      case LongType => // nanos under nanosAsLong
        (loMs.map(m => col(name) >= m * 1000000L),
          hiMs.map(m => col(name) < m * 1000000L))
      case TimestampNTZType =>
        (loMs.map(m => col(name) >= ntzLit(m)), hiMs.map(m => col(name) < ntzLit(m)))
      case _ =>
        (loMs.map(m => col(name) >= timestamp_millis(lit(m))),
          hiMs.map(m => col(name) < timestamp_millis(lit(m))))
    }
    (loC.toSeq ++ hiC.toSeq).reduceOption(_ && _).getOrElse(lit(true))
  }

  def txBase(spark: SparkSession, sfDir: String, spread: Boolean = false): DataFrame = {
    val ev = if (spread) loadSpread(spark, sfDir, "events")
             else load(spark, sfDir, "events")
    ev.select(
      col("event_id").as("log_id"),
      concat(lit("srv"), pmod(col("user_id"), lit(3))).as("server"),
      col("event_type").as("service"),
      tsMillis(ev).as("end_ms"),
      col("value").as("elapsed"))
  }

  /** Same mapping expressed for the DuckDB oracle. */
  val txBaseSql: String =
    """SELECT event_id AS log_id,
       'srv' || CAST(user_id % 3 AS VARCHAR) AS server,
       event_type AS service,
       epoch_ms(ts) AS end_ms,
       value AS elapsed
       FROM events"""
}
