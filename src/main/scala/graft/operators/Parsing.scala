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
    val ev = Tables.loadSpread(spark, sfDir, "events")
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

  /** P3/P4 + P8 — the EJB CommonTiming parse variant and the dual-format
    * timestamp normalizer (stream_parse_transactions.js:378-446,241-256,
    * router regexes :736-737).
    *
    * Reference semantics re-expressed Spark-first:
    * - Router: `INFO *[CommonTiming] The EJB` → entry, `Total time` → exit
    *   (:736-737,768-771); both are whitespace-token formats (no
    *   INFO-anchored split like the standard variant).
    * - Entry (:378-401): logId = token1 unbracketed, startTs = tokens 2-3,
    *   service = `S:` + token14; empty-logId entries are DISCARDED.
    * - Exit (:403-446): endTs = tokens 2-3, service = `S:` + token10,
    *   elapsed = token12; empty-logId exits emit immediately with
    *   start_ms derived. The reference's recordCache.get(logId).get(service)
    *   pairing is an equi-join on (log_id, service) here — the declarative
    *   form of the entry/exit cache, shuffling once on the pair key.
    * - acctCache.get(logId) (:429) is an equi-join against the SOAP-derived
    *   acct map (synthesized per-logId here).
    * - P8 normalizer (:241-256): ISO-with-zone (`T.*-` dispatch) vs
    *   `yyyy-MM-dd HH:mm:ss,SSS`; exercised on a mixed-format column AND on
    *   the entry/exit timestamps; `start_ms = end_ms - elapsed` fallback
    *   when the entry is missing (:276-279).
    */
  def ejbRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.loadSpread(spark, sfDir, "events")
    val base = ev.select(
      col("event_id"),
      // every 7th exit has an empty logId → exercises the emit-immediately
      // path; its entry is discarded by the reference (and by us)
      when(pmod(col("event_id"), lit(7)) === 0, lit(""))
        .otherwise(col("event_id").cast("string")).as("log_id0"),
      concat(lit("srv"), pmod(col("user_id"), lit(3))).as("server"),
      col("event_type").as("svc0"),
      Tables.tsMillis(ev).as("end_ms0"),
      ceil(col("value")).cast("long").as("elapsed0"),
      col("user_id"))
    val startMs0 = col("end_ms0") - col("elapsed0")
    def logTs(ms: org.apache.spark.sql.Column) =
      date_format(timestamp_millis(ms), "yyyy-MM-dd HH:mm:ss,SSS")
    // --- synthesize both reference line shapes (token positions per
    //     parseEjbCommonTimingEntry/Exit: service @ 13 / 9, elapsed @ 11)
    val entryLine = concat(
      lit("["), col("log_id0"), lit("] "), logTs(startMs0),
      lit(" INFO [CommonTiming] The EJB method invocation for the bean named "),
      col("svc0"))
    val exitLine = concat(
      lit("["), col("log_id0"), lit("] "), logTs(col("end_ms0")),
      lit(" INFO [CommonTiming] Total time for EJB "), col("svc0"),
      lit(" was "), col("elapsed0"))
    // mixed-format P8 input: even ids log-format, odd ids ISO-with-zone
    val isoStr = concat(
      date_format(from_utc_timestamp(timestamp_millis(col("end_ms0")), "-06:00"),
        "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("-06:00"))
    val auditRaw = when(pmod(col("event_id"), lit(2)) === 0, logTs(col("end_ms0")))
      .otherwise(isoStr)
    // the synthesized lines feed three consumers (entry parse, exit
    // parse, acct map) — materialize once so the timestamp-format +
    // concat synthesis doesn't re-run per consumer (the parse itself is
    // the query's point; the synthesis was being paid 3x as a lazy plan)
    val lines = base.select(
      col("event_id"), col("server"), col("user_id"),
      entryLine.as("entry_line"), exitLine.as("exit_line"),
      auditRaw.as("audit_raw")).localCheckpoint()
    // --- P8: the dual-branch normalizer (convertStringDateToMs)
    def normTs(c: org.apache.spark.sql.Column) =
      when(c.isNull || c === "", lit(null).cast("long"))
        .when(c.rlike("T.*-"),
          unix_millis(to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")))
        .otherwise(unix_millis(to_timestamp(c, "yyyy-MM-dd HH:mm:ss,SSS")))
    // --- parse entries (router predicate + token extraction)
    val ef = split(col("entry_line"), "\\s+")
    val entries = lines
      .filter(col("entry_line").rlike("INFO *\\[CommonTiming\\] The EJB"))
      .select(
        regexp_replace(element_at(ef, 1), "[\\[\\]]", "").as("log_id"),
        concat(element_at(ef, 2), lit(" "), element_at(ef, 3)).as("start_raw"),
        concat(lit("S:"), element_at(ef, 14)).as("service"))
      .filter(col("log_id") =!= "") // empty-logId entries discarded (:384-387)
    // --- parse exits
    val xf = split(col("exit_line"), "\\s+")
    val exits = lines
      .filter(col("exit_line").rlike("INFO *\\[CommonTiming\\] Total time"))
      .select(
        col("event_id"), col("server"), col("user_id"), col("audit_raw"),
        regexp_replace(element_at(xf, 1), "[\\[\\]]", "").as("log_id"),
        concat(element_at(xf, 2), lit(" "), element_at(xf, 3)).as("end_raw"),
        concat(lit("S:"), element_at(xf, 10)).as("service"),
        element_at(xf, 12).cast("long").as("elapsed"))
    // --- pair (recordCache) + enrich (acctCache); both small-key equi-joins
    // (acct re-derived from the checkpointed lines: log_id0 is '' exactly
    // when event_id % 7 == 0, else the event_id string — same map, no
    // third evaluation of the synthesis chain)
    val acct = lines.filter(pmod(col("event_id"), lit(7)) =!= 0)
      .select(col("event_id").cast("string").as("a_log_id"),
        col("user_id").cast("string").as("acct"))
    val joined = exits
      .join(entries.withColumnRenamed("log_id", "e_log_id")
                   .withColumnRenamed("service", "e_service"),
        col("log_id") === col("e_log_id") && col("service") === col("e_service"), "left")
      .join(acct, col("log_id") === col("a_log_id"), "left")
    // end_ms staged as an attribute: it feeds both the start_ms fallback
    // and the output column, and normTs is a dual-branch timestamp parse
    // — inlined, it was evaluated twice per row
    joined.withColumn("end_ms", normTs(col("end_raw")))
      .select(
        col("event_id"),
        col("log_id"),
        col("server"),
        col("service"),
        coalesce(normTs(col("start_raw")), col("end_ms") - col("elapsed"))
          .as("start_ms"),
        col("end_ms"),
        col("elapsed"),
        lit("Y").as("top_level"), // `S:` services are top-level by definition
        coalesce(col("acct"), lit("")).as("acct_num"),
        normTs(col("audit_raw")).as("audit_ms"))
  }

  val ejbRoundtripSql: String =
    """WITH base AS (
         SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN '' ELSE CAST(event_id AS VARCHAR) END AS log_id0,
           'srv' || CAST(user_id % 3 AS VARCHAR) AS server,
           event_type AS svc0, epoch_ms(ts) AS end_ms0,
           CAST(ceil(value) AS BIGINT) AS elapsed0, user_id
         FROM events),
       lines AS (
         SELECT event_id, server, user_id,
           '[' || log_id0 || '] ' ||
             strftime(make_timestamp((end_ms0 - elapsed0)*1000), '%Y-%m-%d %H:%M:%S,%g') ||
             ' INFO [CommonTiming] The EJB method invocation for the bean named ' || svc0
             AS entry_line,
           '[' || log_id0 || '] ' ||
             strftime(make_timestamp(end_ms0*1000), '%Y-%m-%d %H:%M:%S,%g') ||
             ' INFO [CommonTiming] Total time for EJB ' || svc0 || ' was ' || elapsed0
             AS exit_line,
           CASE WHEN event_id % 2 = 0
             THEN strftime(make_timestamp(end_ms0*1000), '%Y-%m-%d %H:%M:%S,%g')
             ELSE strftime(make_timestamp(end_ms0*1000) - INTERVAL 6 HOUR,
                    '%Y-%m-%dT%H:%M:%S.%g') || '-06:00' END AS audit_raw
         FROM base),
       entries AS (
         SELECT
           regexp_replace(t[1], '[\[\]]', '', 'g') AS log_id,
           t[2] || ' ' || t[3] AS start_raw,
           'S:' || t[14] AS service
         FROM (SELECT string_split_regex(entry_line, '\s+') AS t FROM lines
               WHERE regexp_matches(entry_line, 'INFO *\[CommonTiming\] The EJB'))
         WHERE regexp_replace(t[1], '[\[\]]', '', 'g') <> ''),
       exits AS (
         SELECT event_id, server, user_id, audit_raw,
           regexp_replace(t[1], '[\[\]]', '', 'g') AS log_id,
           t[2] || ' ' || t[3] AS end_raw,
           'S:' || t[10] AS service,
           CAST(t[12] AS BIGINT) AS elapsed
         FROM (SELECT event_id, server, user_id, audit_raw,
                 string_split_regex(exit_line, '\s+') AS t FROM lines
               WHERE regexp_matches(exit_line, 'INFO *\[CommonTiming\] Total time'))),
       acct AS (
         SELECT log_id0 AS a_log_id, CAST(user_id AS VARCHAR) AS acct
         FROM base WHERE log_id0 <> '')
       SELECT x.event_id, x.log_id, x.server, x.service,
         coalesce(
           CASE WHEN e.start_raw IS NULL OR e.start_raw = '' THEN NULL
                WHEN regexp_matches(e.start_raw, 'T.*-')
                  THEN epoch_ms(strptime(e.start_raw, '%Y-%m-%dT%H:%M:%S.%g%z'))
                ELSE epoch_ms(strptime(e.start_raw, '%Y-%m-%d %H:%M:%S,%g')) END,
           epoch_ms(strptime(x.end_raw, '%Y-%m-%d %H:%M:%S,%g')) - x.elapsed) AS start_ms,
         epoch_ms(strptime(x.end_raw, '%Y-%m-%d %H:%M:%S,%g')) AS end_ms,
         x.elapsed, 'Y' AS top_level,
         coalesce(a.acct, '') AS acct_num,
         CASE WHEN x.audit_raw IS NULL OR x.audit_raw = '' THEN NULL
              WHEN regexp_matches(x.audit_raw, 'T.*-')
                THEN epoch_ms(strptime(x.audit_raw, '%Y-%m-%dT%H:%M:%S.%g%z'))
              ELSE epoch_ms(strptime(x.audit_raw, '%Y-%m-%d %H:%M:%S,%g')) END AS audit_ms
       FROM exits x
       LEFT JOIN entries e ON x.log_id = e.log_id AND x.service = e.service
       LEFT JOIN acct a ON x.log_id = a.a_log_id"""

  /** P1+P5 extraction over a routed `line` column (streaming-safe pure
    * column expressions — the same regexes as [[parseRoundtrip]], exposed
    * for the live streaming graph). Keeps only standard
    * `CommonTiming::Stop` exit lines and yields (server passthrough,
    * service, end_ms, elapsed).
    */
  def extractStdExit(lines: DataFrame): DataFrame = {
    val rawTs = regexp_extract(col("line"),
      "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2},\\d{3})", 1)
    val rawSvc = regexp_extract(col("line"), "CommonTiming::Stop +([^ ]+)", 1)
    lines.filter(col("line").rlike("INFO +CommonTiming::Stop"))
      .withColumn("end_ms",
        unix_millis(to_timestamp(rawTs, "yyyy-MM-dd HH:mm:ss,SSS")))
      .withColumn("service",
        regexp_replace(rawSvc, "^Provider\\[(.*)\\]$", "Provider:$1"))
      .withColumn("elapsed",
        regexp_extract(col("line"), "time (\\d+)$", 1).cast("double"))
  }

  /** F8 — the pipe-CSV record codec: serialize a tx record to the
    * reference wire format (entries.js:16-21,19) and parse it back.
    * Integers-only payload (the reference serializes ms/int fields; float
    * formatting is engine-specific so the codec demo keeps the int core).
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val b = Tables.txBase(spark, sfDir, spread = true)
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
    val ev = Tables.loadSpread(spark, sfDir, "events")
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

  /** S5/F9 preprocessing — JMX CLI-output normalization
    * (pull_jvm_stats.js:15-33 `cliToJSON`): the CLI prints a SEQUENCE of
    * anonymous top-level `{...}` JSON blocks (one per stat command),
    * possibly preceded by non-JSON warning lines. The reference:
    * discards letter-initial lines, inserts `,` between adjacent blocks
    * (`\n}\n{` -> `\n},\n{`), keys the i-th block with the i-th
    * configured stat name, wraps the whole thing in braces, parses.
    *
    * Here: the stat-name list is plan-time config (as in the reference),
    * so the keying is a fixed-arity split/concat — all codegen'd string
    * expressions. We strip warnings BEFORE the comma insertion (strictly
    * more robust than the reference, which breaks if a warning lands
    * between blocks). The flatten then reuses the verified F9 path.
    */
  /** The keyed-doc normalization itself, factored so the live poller
    * ([[graft.streaming.JmxPoller]]) runs the IDENTICAL expression over
    * real exec output that the registered `s5_jmx_cli` oracle pins over
    * synthesized output.
    */
  def cliDocCol(raw: org.apache.spark.sql.Column,
      statNames: Seq[String]): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(raw, "(?m)^[A-Za-z][^\n]*\n?", "")
    val commas = regexp_replace(stripped, "\\}\\n\\{", "},\n{")
    val parts = split(commas, "(?m)^\\{")
    concat(
      lit("{"),
      concat(statNames.zipWithIndex.map { case (nm, i) =>
        concat(lit("\"" + nm + "\" : {"), element_at(parts, i + 2))
      }: _*),
      lit("}"))
  }

  /** The flattened stat columns over a [[cliDocCol]] doc — shared by the
    * registered query and the live poller.
    */
  def cliStatCols(doc: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = Seq(
    get_json_object(doc, "$.ds.InUseCount").cast("long").as("ds_in_use"),
    get_json_object(doc, "$.ds.AvailableCount").cast("long").as("ds_available"),
    get_json_object(doc, "$.heap.used").cast("long").as("heap_used"),
    get_json_object(doc, "$.heap.max").cast("long").as("heap_max"),
    get_json_object(doc, "$.threads.count").cast("long").as("thread_cnt"))

  def jmxCliNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    val statNames = Seq("ds", "heap", "threads") // statCmdMap keys (config)
    val ev = Tables.loadSpread(spark, sfDir, "events")
    // --- synthesize reference-shaped CLI output (warning + 3 blocks)
    val raw = concat(
      lit("WFLYPROMPT: picked up client options\n"),
      lit("{\n\"InUseCount\" : "), pmod(col("user_id"), lit(50)),
      lit(",\n\"AvailableCount\" : 50\n}\n"),
      lit("{\n\"used\" : "), col("user_id") * 1000,
      lit(",\n\"max\" : "), col("user_id") * 2000, lit("\n}\n"),
      lit("{\n\"count\" : "), pmod(col("event_id"), lit(100)), lit("\n}"))
    // --- normalize (the operator under test)
    ev.select(col("event_id"), raw.as("raw"))
      .select(col("event_id"),
        cliDocCol(col("raw"), statNames).as("doc"))
      .select(col("event_id") +: cliStatCols(col("doc")): _*)
  }

  val jmxCliNormalizeSql: String =
    """WITH r AS (
         SELECT event_id,
           'WFLYPROMPT: picked up client options' || chr(10) ||
           '{' || chr(10) || '"InUseCount" : ' || (user_id % 50) || ',' ||
             chr(10) || '"AvailableCount" : 50' || chr(10) || '}' || chr(10) ||
           '{' || chr(10) || '"used" : ' || (user_id*1000) || ',' || chr(10) ||
             '"max" : ' || (user_id*2000) || chr(10) || '}' || chr(10) ||
           '{' || chr(10) || '"count" : ' || (event_id % 100) || chr(10) || '}'
           AS raw
         FROM events),
       n AS (
         SELECT event_id,
           string_split_regex(
             regexp_replace(
               regexp_replace(raw, '(?m)^[A-Za-z][^\n]*\n?', '', 'g'),
               '\}\n\{', '},' || chr(10) || '{', 'g'),
             '(?m)^\{') AS t
         FROM r),
       d AS (
         SELECT event_id,
           '{' || '"ds" : {' || t[2] || '"heap" : {' || t[3] ||
             '"threads" : {' || t[4] || '}' AS doc
         FROM n)
       SELECT event_id,
         CAST(json_extract_string(doc, '$.ds.InUseCount') AS BIGINT) AS ds_in_use,
         CAST(json_extract_string(doc, '$.ds.AvailableCount') AS BIGINT) AS ds_available,
         CAST(json_extract_string(doc, '$.heap.used') AS BIGINT) AS heap_used,
         CAST(json_extract_string(doc, '$.heap.max') AS BIGINT) AS heap_max,
         CAST(json_extract_string(doc, '$.threads.count') AS BIGINT) AS thread_cnt
       FROM d"""

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
