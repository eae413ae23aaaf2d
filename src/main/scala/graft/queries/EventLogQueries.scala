package graft.queries

import graft.exprs.functions._
import graft.util.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's log algebra re-expressed over the `events` table
  * (event_id ≙ version, event_type ≙ label, props ≙ payload JSON, ts ≙
  * timestamp): forward/reverse scan with limit / skip_first, version-chain
  * derivation via lag/lead (reference derives VersionNext at read time too —
  * eventlog/file/file.go:293-295), version bounds, hex codec, validation,
  * minification, RFC3339 rendering, checksums and the integrity job
  * (eventlog/file/check_integrity.go:15-94).
  *
  * NOTE `ts` is LongType (ns since epoch) — see Tables.apply.
  */
object EventLogQueries {
  type Q = (SparkSession, String) => DataFrame

  /** events table projected into the event-log schema. */
  private def log(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      col("event_id").as("version"),
      col("ts"),
      col("event_type").as("label"),
      col("props").as("payload"))

  /** Chain links via ARITHMETIC on dense versions + broadcast bounds —
    * never a global `Window.orderBy(version)`, whose sort collapses the
    * whole log into one partition at scale. Versions are dense by the
    * engine's commit-sequencer contract (graft.core); lag/lead defaults
    * (first prev = 0, last next = 0) are reproduced at the bounds. */
  private def chain(s: SparkSession, dir: String): DataFrame = {
    val l = log(s, dir)
    val bounds = l.agg(
      min(col("version")).as("vmin"), max(col("version")).as("vmax"))
    l.crossJoin(broadcast(bounds))
      .withColumn("version_prev",
        when(col("version") === col("vmin"), 0L).otherwise(col("version") - 1L))
      .withColumn("version_next",
        when(col("version") === col("vmax"), 0L).otherwise(col("version") + 1L))
      .drop("vmin", "vmax")
  }

  /** Per-type integer moments of the 2-decimal value (×100 as exact
    * BIGINTs) — the anomaly BASELINE, shared by the batch events_anomaly
    * and the streaming twin so the two can never score differently.
    * Moments in decimal(38,0) (DuckDB side: HUGEINT): s1² for a type with
    * n=1e6 events at value~250 is ~6e20, past BIGINT — Spark would wrap
    * silently and zero every z while DuckDB throws; 128-bit integers keep
    * the math exact at any realistic type cardinality. */
  def anomalyBaseline(e100: DataFrame): DataFrame =
    e100.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("v100").cast("decimal(38,0)")).as("s1"),
      sum((col("v100") * col("v100")).cast("decimal(38,0)")).as("s2"))

  /** The z projection over rows joined with the baseline. Cross-engine
    * float determinism without quantization tricks: the algebra is folded
    * so the ONLY float ops are one division and sqrt — which IEEE-754
    * requires to be correctly rounded (unlike ln/exp), so both engines
    * produce identical bits from identical integers.
    * z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²) — the n·100 scaling cancels. */
  def withAnomalyZ(joined: DataFrame): DataFrame =
    joined
      .withColumn("a",
        col("v100").cast("decimal(38,0)") * col("n") - col("s1"))
      .withColumn("var_n2", col("n") * col("s2") - col("s1") * col("s1"))
      .withColumn("z",
        when(col("var_n2") > 0,
          col("a").cast("double") / sqrt(col("var_n2").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("is_outlier", abs(col("z")) > 3.0)

  /** Per-label corpus drift between two log snapshots — two versionAsOf
    * reads of one immutable log, each file-pruned to its ceiling, diffed
    * on the label-cardinality join. Shared by the graft_version_diff
    * query (fixed 300/800 for the oracle) and the CLI `diff` command
    * (user-supplied versions), so the two can never drift. Append-only
    * log ⇒ lo's labels ⊆ hi's ⇒ the left join is exact. */
  def versionDiffCard(
      s: SparkSession, logDir: String, vLo: Long, vHi: Long): DataFrame = {
    def card(v: Long): DataFrame =
      s.read.format("graft").option("versionAsOf", v).load(logDir)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("chars"))
    card(vHi)
      .select(col("label"), col("n").as("n_hi"), col("chars").as("chars_hi"))
      .join(card(vLo)
        .select(col("label"), col("n").as("n_lo"),
          col("chars").as("chars_lo")), Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_lo"), lit(0L)).as("n_lo"), col("n_hi"),
        (col("n_hi") - coalesce(col("n_lo"), lit(0L))).as("n_delta"),
        coalesce(col("chars_lo"), lit(0L)).as("chars_lo"), col("chars_hi"),
        (col("chars_hi") - coalesce(col("chars_lo"), lit(0L)))
          .as("chars_delta"))
      .orderBy("label")
  }

  /** Per-label scan-parity aggregate shared by graft_scan_forward and
    * graft_time_travel, so the time-travel gate always tests the exact
    * shape the scan gate does (oracle mirror: [[graftScanSql]]). */
  private def graftScanAgg(df: DataFrame): DataFrame =
    df.groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("version")).as("sum_version"),
        min(col("version")).as("min_version"),
        max(col("version")).as("max_version"),
        sum(length(col("payload"))).as("payload_chars"))

  /** DuckDB mirror of [[graftScanAgg]] over the events table; log versions
    * are 1-based (commit sequencer), event_id is 0-based. */
  private def graftScanSql(where: String): String =
    s"""SELECT event_type AS label,
       |  count(*) AS n_events,
       |  CAST(sum(event_id + 1) AS BIGINT) AS sum_version,
       |  min(event_id) + 1 AS min_version,
       |  max(event_id) + 1 AS max_version,
       |  CAST(sum(length(props)) AS BIGINT) AS payload_chars
       |FROM events${if (where.isEmpty) "" else " " + where}
       |GROUP BY 1""".stripMargin

  /** RFC3339 rendering of the ns-epoch `ts` column, second granularity
    * (serve.go:227-230). Integer `div` — a double roundtrip would lose ns
    * precision and can flip a second boundary. */
  private def rfc3339(tsNsCol: String) =
    concat(
      date_format(timestamp_seconds(expr(s"$tsNsCol div 1000000000")),
        "yyyy-MM-dd'T'HH:mm:ss"),
      lit("Z"))

  val queries: Map[String, Q] = Map(
    // Scan(version=100, reverse=false, n=1000): chain links derived over the
    // FULL log before the range filter, so the last batch row still points to
    // its successor — matching the reference's read-time derivation.
    "el_scan_forward" -> { (s, dir) =>
      chain(s, dir).filter(col("version") >= 100)
        .orderBy("version")
        .limit(1000)
        .select(
          col("version"), hex_version(col("version")).as("version_hex"),
          col("version_prev"), col("version_next"),
          col("label"), col("payload"),
          rfc3339("ts").as("time"))
    },

    // Scan(version=5000, reverse=true, n=500, skip_first=true)
    "el_scan_reverse" -> { (s, dir) =>
      chain(s, dir).filter(col("version") <= 5000)
        .orderBy(col("version").desc)
        .offset(1) // skip_first cursor resume (serve.go:213)
        .limit(500)
        .select("version", "version_prev", "version_next", "label")
    },

    // §4.1 V2 source: the whole log scanned via format("graft") — exercises
    // the columnar vectorized read path end-to-end (segments + tail planned
    // from readView, not a directory-listing file source). The log is the
    // events table replayed through the real commit sequencer
    // (GraftLogCache), so the oracle runs on the same parquet.
    "graft_scan_forward" -> { (s, dir) =>
      val logDir = graft.sources.GraftLogCache.ensure(s, dir)
      graftScanAgg(s.read.format("graft").load(logDir))
    },

    // Time travel on the V2 source: versionAsOf pins the read to a
    // historical snapshot (inclusive ceiling, file-level pruned — the
    // same maxV machinery version predicates use).
    "graft_time_travel" -> { (s, dir) =>
      val logDir = graft.sources.GraftLogCache.ensure(s, dir)
      graftScanAgg(
        s.read.format("graft").option("versionAsOf", 500L).load(logDir))
    },

    // Corpus DRIFT between two log snapshots: the per-label data card at
    // version 800 vs version 300, diffed — "what changed in the corpus
    // since the last training run" answered from ONE immutable log via two
    // versionAsOf reads (each file-level pruned to its ceiling, so the lo
    // read touches only the log's first segments at any scale). The log is
    // append-only, so lo's labels ⊆ hi's and a left join is exact.
    "graft_version_diff" -> { (s, dir) =>
      versionDiffCard(s, graft.sources.GraftLogCache.ensure(s, dir),
        vLo = 300L, vHi = 800L)
    },

    // The V2 source's O(1) aggregate pushdown under the driver gate: a
    // bounded MIN/MAX/COUNT over the log plans as a one-row
    // GraftLogAggScan (values from segment names + commit-log tail —
    // zero data-file opens; plan shape asserted in GraftSourceSpec, the
    // VALUES pinned here against the DuckDB oracle).
    "graft_version_stats" -> { (s, dir) =>
      val logDir = graft.sources.GraftLogCache.ensure(s, dir)
      s.read.format("graft").load(logDir)
        .filter(col("version") >= 100L)
        .agg(min(col("version")).as("version_lo"),
          max(col("version")).as("version_hi"),
          count(lit(1)).as("n_versions"))
    },

    // Version / VersionInitial point lookups (eventlog.go:132-140)
    "el_version_bounds" -> { (s, dir) =>
      log(s, dir).agg(
        min(col("version")).as("version_initial"),
        max(col("version")).as("version_latest"),
        count(lit(1)).as("n_events"))
        .select(
          col("version_initial"), col("version_latest"), col("n_events"),
          hex_version(col("version_initial")).as("initial_hex"),
          hex_version(col("version_latest")).as("latest_hex"))
    },

    // Hex codec round-trip: encode via HexVersion, decode via ParseHexVersion
    "el_hex_roundtrip" -> { (s, dir) =>
      log(s, dir)
        .select(col("version"), hex_version(col("version")).as("version_hex"))
        .withColumn("parsed", parse_hex_version(col("version_hex")))
        .orderBy("version")
    },

    // X3 byte-preserving JSON minification on ingestion (jsonminify.go)
    "el_minify" -> { (s, dir) =>
      log(s, dir)
        .select(col("version"), minify_json(col("payload")).as("payload_min"))
        .orderBy("version")
    },

    // V1 + X2 validation surface (validate_label.go / validate_payload_json.go)
    "el_validate" -> { (s, dir) =>
      log(s, dir).select(
        col("version"),
        label_is_valid(col("label")).as("label_ok"),
        payload_is_valid(col("payload")).as("payload_ok"))
        .orderBy("version")
    },

    // V7 RFC3339 time rendering (serve.go:227-230)
    "el_rfc3339" -> { (s, dir) =>
      log(s, dir)
        .select(col("version"), rfc3339("ts").as("time_rfc3339"))
        .orderBy("version")
    },

    // M1 integrity job as one window pass: chain continuity, time
    // monotonicity, payload+label validity (check_integrity.go:15-94).
    "el_integrity" -> { (s, dir) =>
      // predecessor via self-equi-join on the dense version (hash-partitioned
      // both sides) instead of a single-partition lag window — the same
      // reshaping as graft.core.EventLog.checkIntegrity.
      val l = log(s, dir)
      val prev = l.select((col("version") + 1L).as("version"),
        col("version").as("prev_v"), col("ts").as("prev_ts"))
      val bounds = l.agg(min(col("version")).as("vmin"))
      l.join(prev, Seq("version"), "left")
        .crossJoin(broadcast(bounds)).agg(
        count(lit(1)).as("n"),
        // a version (other than the first) with no predecessor = a chain gap
        sum(when(col("version") =!= col("vmin") && col("prev_v").isNull, 1)
          .otherwise(0)).as("chain_violations"),
        sum(when(col("prev_ts").isNull || col("ts") >= col("prev_ts"), 0)
          .otherwise(1)).as("time_violations"),
        sum(when(payload_is_valid(col("payload")), 0).otherwise(1))
          .as("payload_violations"),
        sum(when(label_is_valid(col("label")), 0).otherwise(1))
          .as("label_violations"))
    },

    // X1 checksum over the reference's LE layout (no cross-engine oracle:
    // DuckDB has no XXH64-over-bytes — covered by fixture specs instead).
    "el_checksum" -> { (s, dir) =>
      chain(s, dir).select(
        col("version"),
        event_checksum(
          expr("ts div 1000000000"), // unix seconds (file.go:378)
          col("label"),
          minify_json(col("payload")),
          col("version_prev")).as("checksum"))
        .orderBy("version")
    },

    // Sessionization over the change stream: 30-minute inactivity gap.
    // Timestamps are compared in MICROSECONDS end-to-end: the oracle's
    // DuckDB reads the ns parquet at µs precision, so a true-ns comparison
    // can never hash-match (round-1 events_sessionize red — 9,541 cells
    // differed only in the last 3 digits).
    "events_sessionize" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .withColumn("t", expr("ts div 1000")) // ns → µs (ts >= 0: div = floor)
      val wu = Window.partitionBy("user_id").orderBy("t", "event_id")
      val wrun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev_t", lag(col("t"), 1).over(wu))
        .withColumn("is_new",
          when(col("prev_t").isNull
            || col("t") - col("prev_t") > 1800000000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("is_new")).over(wrun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("t")).as("t_start"),
          max(col("t")).as("t_end"))
        .orderBy("user_id", "session_id")
    },

    // Typed access INTO the JSON payload (SURVEY §1.3: an extension, not a
    // parity requirement — the reference stores payloads opaquely). from_json
    // projects the schema once; the aggregate then runs on a typed column.
    "el_payload_extract" -> { (s, dir) =>
      log(s, dir)
        .withColumn("k",
          from_json(col("payload"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("label")
    },

    // Analytic window functions beyond ranking: lag/lead deltas, ntile
    // bucketing, cumulative distribution — per-user partitions, so the
    // window parallelizes by key.
    "el_window_analytics" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.filter(col("user_id") <= 50)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("cume", cume_dist().over(w))
        .select("user_id", "event_id", "value", "prev_value", "delta",
          "quartile", "cume")
        .orderBy("user_id", "event_id")
    },

    // Ordered funnel: signup -> view -> purchase, each stage's first
    // occurrence strictly after the previous stage's. Three per-user min
    // aggregations + broadcast-joined stage frontiers — no window over the
    // raw stream, so each stage is one shuffle on user_id and the data
    // only shrinks stage over stage.
    "events_funnel" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t_signup"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, "user_id").filter(col("ts") > col("t_signup"))
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, "user_id").filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_view_after_signup")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchase_after_view")))
        .select(lit("signup->view->purchase").as("funnel"),
          col("n_signup"), col("n_view_after_signup"),
          col("n_purchase_after_view"))
    },

    // Tumbling 1h event-time window aggregation (batch counterpart of the
    // Structured Streaming path in graft.streaming).
    "events_window_agg" -> { (s, dir) =>
      // exact decimal sum surfaced as double — see Relational.window_running
      Tables(s, dir, "events")
        .groupBy(expr("ts div 3600000000000").as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("hour_bucket", "event_type")
    },

    // Per-type z-score anomaly detection over event values. Cross-engine
    // float determinism without quantization tricks: values are 2-decimal,
    // so v*100 rounds to EXACT BIGINTs; per-type moments (n, Σv, Σv²) are
    // integer sums; and z = (v·n − Σv) / sqrt(n·Σv² − (Σv)²) · sqrt(n) ...
    // algebra folded so the ONLY float ops are one division and sqrt —
    // which IEEE-754 requires to be correctly rounded (unlike ln/exp), so
    // both engines produce identical bits from identical integers. Scale
    // shape: one groupBy to type-level moments (tiny), broadcast back,
    // pure projection per event.
    "events_anomaly" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
        .withColumn("v100", round(col("value") * 100).cast("long"))
      withAnomalyZ(e.join(broadcast(anomalyBaseline(e)), "event_type"))
        .select("event_id", "event_type", "value", "z", "is_outlier")
        .orderBy("event_id")
    },

    // Cohort retention: users grouped by first-activity day, counted once
    // per (cohort, days-since-cohort) cell — the standard product-analytics
    // triangle. The cohort day comes from a window min (ONE user_id
    // exchange, no aggregate+self-join); the per-day dedup then groups on a
    // superset of the window's partitioning, so it reuses that exchange,
    // and only the final small (cohort, offset) aggregate reshuffles. All
    // integer day arithmetic on the ns-epoch ts.
    "events_retention" -> { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      val wu = Window.partitionBy("user_id")
      ev.withColumn("cohort_day", min(col("day")).over(wu))
        .select(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"), col("user_id"))
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }
  )

  private val chainSql =
    """SELECT event_id AS version, ts, event_type AS label, props AS payload,
      |  coalesce(lag(event_id) OVER (ORDER BY event_id), 0) AS version_prev,
      |  coalesce(lead(event_id) OVER (ORDER BY event_id), 0) AS version_next
      |FROM events""".stripMargin

  val oracle: Map[String, String] = Map(
    "el_scan_forward" ->
      s"""SELECT version, printf('%x', version) AS version_hex,
         |  version_prev, version_next, label, payload,
         |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS time
         |FROM ($chainSql) c
         |WHERE version >= 100 ORDER BY version LIMIT 1000""".stripMargin,

    "el_scan_reverse" ->
      s"""SELECT version, version_prev, version_next, label
         |FROM ($chainSql) c
         |WHERE version <= 5000 ORDER BY version DESC LIMIT 500 OFFSET 1""".stripMargin,

    "graft_scan_forward" -> graftScanSql(""),

    "graft_time_travel" -> graftScanSql("WHERE event_id + 1 <= 500"),

    "graft_version_diff" ->
      """WITH lo AS (SELECT event_type AS label, count(*) AS n,
        |    CAST(sum(length(props)) AS BIGINT) AS chars
        |  FROM events WHERE event_id + 1 <= 300 GROUP BY 1),
        |hi AS (SELECT event_type AS label, count(*) AS n,
        |    CAST(sum(length(props)) AS BIGINT) AS chars
        |  FROM events WHERE event_id + 1 <= 800 GROUP BY 1)
        |SELECT h.label, COALESCE(l.n, 0) AS n_lo, h.n AS n_hi,
        |  h.n - COALESCE(l.n, 0) AS n_delta,
        |  COALESCE(l.chars, 0) AS chars_lo, h.chars AS chars_hi,
        |  h.chars - COALESCE(l.chars, 0) AS chars_delta
        |FROM hi h LEFT JOIN lo l USING (label) ORDER BY label""".stripMargin,

    // log versions are event_id + 1 (GraftLogCache's mapping)
    "graft_version_stats" ->
      """SELECT min(event_id + 1) AS version_lo,
        |  max(event_id + 1) AS version_hi,
        |  count(*) AS n_versions
        |FROM events WHERE event_id + 1 >= 100""".stripMargin,

    "el_version_bounds" ->
      """SELECT min(event_id) AS version_initial,
        |  max(event_id) AS version_latest,
        |  count(*) AS n_events,
        |  printf('%x', min(event_id)) AS initial_hex,
        |  printf('%x', max(event_id)) AS latest_hex
        |FROM events""".stripMargin,

    "el_hex_roundtrip" ->
      """SELECT event_id AS version, printf('%x', event_id) AS version_hex,
        |  event_id AS parsed
        |FROM events ORDER BY version""".stripMargin,

    // corpus-specific: props never contain spaces inside strings
    "el_minify" ->
      """SELECT event_id AS version, replace(props, ' ', '') AS payload_min
        |FROM events ORDER BY version""".stripMargin,

    "el_validate" ->
      """SELECT event_id AS version,
        |  (length(event_type) <= 65535
        |   AND regexp_matches(event_type, '^[A-Za-z0-9_.~%-]*$')) AS label_ok,
        |  (json_valid(props) AND regexp_matches(props, '^\s*\{')
        |   AND NOT regexp_matches(props, '^\s*\{\s*\}\s*$')) AS payload_ok
        |FROM events ORDER BY version""".stripMargin,

    "el_rfc3339" ->
      """SELECT event_id AS version,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS time_rfc3339
        |FROM events ORDER BY version""".stripMargin,

    "el_integrity" ->
      """WITH chain AS (
        |  SELECT event_id AS version, epoch_ns(ts) AS ts_ns,
        |    event_type AS label, props AS payload,
        |    lag(event_id) OVER (ORDER BY event_id) AS prev_v,
        |    lag(epoch_ns(ts)) OVER (ORDER BY event_id) AS prev_ts
        |  FROM events)
        |SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN prev_v IS NULL OR version = prev_v + 1 THEN 0 ELSE 1 END) AS BIGINT) AS chain_violations,
        |  CAST(sum(CASE WHEN prev_ts IS NULL OR ts_ns >= prev_ts THEN 0 ELSE 1 END) AS BIGINT) AS time_violations,
        |  CAST(sum(CASE WHEN json_valid(payload) AND regexp_matches(payload, '^\s*\{')
        |           AND NOT regexp_matches(payload, '^\s*\{\s*\}\s*$') THEN 0 ELSE 1 END) AS BIGINT) AS payload_violations,
        |  CAST(sum(CASE WHEN length(label) <= 65535
        |           AND regexp_matches(label, '^[A-Za-z0-9_.~%-]*$') THEN 0 ELSE 1 END) AS BIGINT) AS label_violations
        |FROM chain""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_t
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, t,
        |    CASE WHEN prev_t IS NULL OR t - prev_t > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM g),
        |sess AS (
        |  SELECT user_id, event_id, t,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(t) AS t_start, max(t) AS t_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "el_payload_extract" ->
      """SELECT event_type AS label, count(*) AS n,
        |  CAST(sum(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(props ->> 'k' AS INT)) AS min_k,
        |  max(CAST(props ->> 'k' AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "el_window_analytics" ->
      """SELECT user_id, event_id, value,
        |  lag(value) OVER w AS prev_value,
        |  value - lag(value) OVER w AS delta,
        |  ntile(4) OVER w AS quartile,
        |  cume_dist() OVER w AS cume
        |FROM events WHERE user_id <= 50
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "events_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS t_signup
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_view
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND epoch_ns(e.ts) > s1.t_signup
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(epoch_ns(e.ts)) AS t_purchase
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > s2.t_view
        |  GROUP BY 1)
        |SELECT 'signup->view->purchase' AS funnel,
        |  (SELECT count(*) FROM s1) AS n_signup,
        |  (SELECT count(*) FROM s2) AS n_view_after_signup,
        |  (SELECT count(*) FROM s3) AS n_purchase_after_view""".stripMargin,

    "events_window_agg" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  count(*) AS n,
        |  CAST(sum(cast(value AS decimal(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_anomaly" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value,
        |    CAST(round(value * 100) AS BIGINT) AS v100 FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(v100) AS HUGEINT) AS s1,
        |    CAST(sum(v100 * v100) AS HUGEINT) AS s2
        |  FROM e GROUP BY 1),
        |j AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    e.v100 * m.n - m.s1 AS a,
        |    m.n * m.s2 - m.s1 * m.s1 AS var_n2
        |  FROM e JOIN m USING (event_type))
        |SELECT event_id, event_type, value,
        |  CASE WHEN var_n2 > 0
        |    THEN CAST(a AS DOUBLE) / sqrt(CAST(var_n2 AS DOUBLE))
        |    ELSE 0.0 END AS z,
        |  CASE WHEN var_n2 > 0
        |    THEN abs(CAST(a AS DOUBLE) / sqrt(CAST(var_n2 AS DOUBLE))) > 3.0
        |    ELSE FALSE END AS is_outlier
        |FROM j ORDER BY event_id""".stripMargin,

    "events_retention" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT user_id, day,
        |  min(day) OVER (PARTITION BY user_id) AS cohort_day FROM ev),
        |d AS (SELECT DISTINCT cohort_day, day - cohort_day AS day_offset,
        |  user_id FROM c)
        |SELECT cohort_day, day_offset, count(*) AS n_users
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
