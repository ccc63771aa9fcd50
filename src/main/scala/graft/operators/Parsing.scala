package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The scan+extract layer — the reference parser's per-line operators
  * (SURVEY.md §2.2) as pure column expressions.
  *
  * The driver test tables contain no raw log text, so each registered
  * query *synthesizes* reference-shaped log lines from `events` columns
  * (both engines build byte-identical strings) and then runs the real
  * extraction pipeline over them — proving the regex/timestamp/projection
  * semantics match DuckDB exactly:
  *
  * - P1 router: classify by line shape (CommonTiming::Start/Stop)
  *   (stream_parse_transactions.js:741-812).
  * - P5 CommonTiming entry/exit field extraction (:451-483,506-565).
  * - P6 BAF acct-number salvage — last `:`-field of the bracket metadata
  *   token (:449,486-504).
  * - P8 timestamp normalizer, log format `yyyy-MM-dd HH:mm:ss,SSS` ->
  *   epoch ms (:242-256).
  * - P9 finalizer: `Provider[x]` -> `Provider:x` normalization, derived
  *   `start_ms = end_ms - elapsed`, `top_level = service ~ '^S:'`
  *   (:258-290).
  * - P10 acctNum validation `^[0-9]+$` (:296-297).
  * - F5/F6 date formatting (util_methods.js:149-182).
  *
  * Everything is `regexp_extract`/`to_timestamp`/`when` — codegen'd, no
  * UDFs, trivially distributed (embarrassingly parallel scan layer; at
  * 100 TB this is the map side of the pipeline with full pushdown below
  * it).
  */
object Parsing {

  /** Build the synthetic exit log line, extract every field back out, and
    * finalize the record (P1+P5+P6+P8+P9+P10+F5/F6 in one pass).
    */
  def parseRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val base = ev.select(
      col("event_id").cast("string").as("log_id"),
      col("event_type").as("service0"),
      Tables.tsMillis(ev).as("end_ms"),
      ceil(col("value")).cast("long").as("elapsed_int"),
      col("user_id"))
    // --- synthesize: "[<logId>] <ts> [x:y:<acct>] INFO CommonTiming::Stop Provider[<svc>] somewords time <elapsed>"
    val tsStr = date_format(timestamp_millis(col("end_ms")), "yyyy-MM-dd HH:mm:ss,SSS")
    val line = concat(
      lit("["), col("log_id"), lit("] "), tsStr,
      lit(" [x:y:"), col("user_id"), lit("] INFO CommonTiming::Stop Provider["),
      col("service0"), lit("] somewords time "), col("elapsed_int"))
    val lines = base.select(col("log_id").as("expected_log_id"), line.as("line"))
    // --- parse it all back (the operator under test)
    val isExit = col("line").rlike("INFO +CommonTiming::Stop") // P1 route
    val logId  = regexp_extract(col("line"), "^\\[([^\\]]*)\\]", 1)
    val rawTs  = regexp_extract(col("line"),
      "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3})", 1)
    val endMs  = unix_millis(to_timestamp(rawTs, "yyyy-MM-dd HH:mm:ss,SSS")) // P8
    val acct   = regexp_extract(col("line"), "\\[[^\\]\\[]*:([^:\\]\\[]*)\\] INFO ", 1) // P6
    val rawSvc = regexp_extract(col("line"), "CommonTiming::Stop +([^ ]+)", 1)
    val service = regexp_replace(rawSvc, "^Provider\\[(.*)\\]$", "Provider:$1") // P9
    val elapsed = regexp_extract(col("line"), "time (\\d+)$", 1).cast("long")
    lines.filter(isExit).select(
      col("expected_log_id"),
      logId.as("log_id"),
      endMs.as("end_ms"),
      (endMs - elapsed).as("start_ms"), // P9 derive start
      service.as("service"),
      elapsed.as("elapsed"),
      when(service.rlike("^S:"), "Y").otherwise("N").as("top_level"), // P9
      when(acct.rlike("^[0-9]+$"), acct).otherwise(lit("")).as("acct_num"), // P10
      date_format(timestamp_millis(endMs), "yyyy-MM-dd HH:mm:ss").as("log_date"), // F5
      date_format(timestamp_millis(endMs), "yyyyMMdd").cast("int").as("yyyymmdd")) // F6
  }

  val parseRoundtripSql: String =
    """WITH base AS (
         SELECT CAST(event_id AS VARCHAR) AS log_id, event_type AS service0,
           epoch_ms(ts) AS end_ms,
           CAST(ceil(value) AS BIGINT) AS elapsed_int, user_id
         FROM events),
       lines AS (
         SELECT log_id AS expected_log_id,
           '[' || log_id || '] ' ||
           strftime(make_timestamp(end_ms*1000), '%Y-%m-%d %H:%M:%S,%g') ||
           ' [x:y:' || user_id || '] INFO CommonTiming::Stop Provider[' ||
           service0 || '] somewords time ' || elapsed_int AS line
         FROM base),
       parsed AS (
         SELECT expected_log_id,
           regexp_extract(line, '^\[([^\]]*)\]', 1) AS log_id,
           epoch_ms(strptime(regexp_extract(line,
             '(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})', 1),
             '%Y-%m-%d %H:%M:%S,%g')) AS end_ms,
           regexp_extract(line, '\[[^\]\[]*:([^:\]\[]*)\] INFO ', 1) AS acct0,
           regexp_replace(regexp_extract(line, 'CommonTiming::Stop +([^ ]+)', 1),
             '^Provider\[(.*)\]$', 'Provider:\1') AS service,
           CAST(regexp_extract(line, 'time (\d+)$', 1) AS BIGINT) AS elapsed
         FROM lines
         WHERE regexp_matches(line, 'INFO +CommonTiming::Stop'))
       SELECT expected_log_id, log_id, end_ms,
         end_ms - elapsed AS start_ms, service, elapsed,
         CASE WHEN regexp_matches(service, '^S:') THEN 'Y' ELSE 'N' END AS top_level,
         CASE WHEN regexp_matches(acct0, '^[0-9]+$') THEN acct0 ELSE '' END AS acct_num,
         strftime(make_timestamp(end_ms*1000), '%Y-%m-%d %H:%M:%S') AS log_date,
         CAST(strftime(make_timestamp(end_ms*1000), '%Y%m%d') AS INT) AS yyyymmdd
       FROM parsed"""

  /** F8 — the pipe-CSV record codec: serialize a tx record to the
    * reference wire format (entries.js:16-21,19) and parse it back.
    * Integers-only payload (the reference serializes ms/int fields; float
    * formatting is engine-specific so the codec demo keeps the int core).
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val b = Tables.txBase(spark, sfDir)
      .withColumn("elapsed_int", ceil(col("elapsed")).cast("long"))
      .withColumn("start_ms", col("end_ms") - col("elapsed_int"))
      .withColumn("top_level", when(col("service").rlike("^S"), "Y").otherwise("N"))
    val csv = concat_ws("|", lit("tx"), col("server"), col("service"),
      col("log_id"), col("start_ms"), col("end_ms"), col("elapsed_int"),
      col("top_level"))
    val f = split(csv, "\\|")
    b.select(
      csv.as("csv"),
      element_at(f, 1).as("tag"),
      element_at(f, 2).as("server"),
      element_at(f, 3).as("service"),
      element_at(f, 4).cast("long").as("log_id"),
      element_at(f, 5).cast("long").as("start_ms"),
      element_at(f, 6).cast("long").as("end_ms"),
      element_at(f, 7).cast("long").as("elapsed"),
      element_at(f, 8).as("top_level"))
  }

  val csvRoundtripSql: String =
    s"""WITH b AS (
          SELECT *, CAST(ceil(elapsed) AS BIGINT) AS elapsed_int,
            end_ms - CAST(ceil(elapsed) AS BIGINT) AS start_ms,
            CASE WHEN regexp_matches(service, '^S') THEN 'Y' ELSE 'N' END AS top_level
          FROM (${Tables.txBaseSql})),
        c AS (
          SELECT concat_ws('|', 'tx', server, service, log_id, start_ms,
            end_ms, elapsed_int, top_level) AS csv FROM b),
        f AS (SELECT csv, string_split(csv, '|') AS p FROM c)
        SELECT csv, p[1] AS tag, p[2] AS server, p[3] AS service,
          CAST(p[4] AS BIGINT) AS log_id, CAST(p[5] AS BIGINT) AS start_ms,
          CAST(p[6] AS BIGINT) AS end_ms, CAST(p[7] AS BIGINT) AS elapsed,
          p[8] AS top_level
        FROM f"""

  /** F9/S5 — JSON normalization + nested flatten: build a JMX-shaped
    * nested JSON document per event and flatten it to the wide row
    * (pull_jvm_stats.js:15-84, entries.js:246-332).
    */
  def jsonFlatten(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.load(spark, sfDir, "events")
    val doc = concat(
      lit("""{"heap":{"used":"""), col("user_id") * 1000,
      lit(""","max":"""), col("user_id") * 2000,
      lit("""},"threads":{"count":"""), col("event_id") % 100,
      lit("""},"k":"""), get_json_object(col("props"), "$.k"), lit("}"))
    ev.select(col("event_id"), doc.as("doc"))
      .select(
        col("event_id"),
        get_json_object(col("doc"), "$.heap.used").cast("long").as("heap_used"),
        get_json_object(col("doc"), "$.heap.max").cast("long").as("heap_max"),
        get_json_object(col("doc"), "$.threads.count").cast("long").as("thread_cnt"),
        get_json_object(col("doc"), "$.k").cast("long").as("k"))
  }

  val jsonFlattenSql: String =
    """WITH d AS (
         SELECT event_id,
           '{"heap":{"used":' || (user_id*1000) || ',"max":' || (user_id*2000) ||
           '},"threads":{"count":' || (event_id%100) || '},"k":' ||
           json_extract_string(props, '$.k') || '}' AS doc
         FROM events)
       SELECT event_id,
         CAST(json_extract_string(doc, '$.heap.used') AS BIGINT) AS heap_used,
         CAST(json_extract_string(doc, '$.heap.max') AS BIGINT) AS heap_max,
         CAST(json_extract_string(doc, '$.threads.count') AS BIGINT) AS thread_cnt,
         CAST(json_extract_string(doc, '$.k') AS BIGINT) AS k
       FROM d"""
}
