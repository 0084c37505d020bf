package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{MarketOps, ScalarOps}

/** SURVEY §2.7 scalar-function queries (F1-F8, F10, F11) over the `events`
  * and `documents` stand-in tables. Every expression is pure Catalyst —
  * whole-stage-codegen'd, no UDFs. */
object FunctionQueries extends QueryPack {

  /** "now" constant for replay-deterministic age/fallback computations:
    * 2024-02-01 00:00:00 UTC, one day past the testdata's max event time. */
  private val NOW_SEC = 1706745600L

  private def summarized(s: SparkSession, dir: String): DataFrame =
    MarketOps.dailySummary(Tables.events(s, dir))
      .select(
        col("ticker"), col("date"),
        ScalarOps.formatSummaryText(
          col("open"), col("close"), col("low"), col("high"),
          col("variation_pct"), col("volume")).as("summary"))

  /** Bars + formatted summary, shared by F1/F2 oracles. */
  private val SUMMARY_CTE =
    """bars AS (
      |  SELECT user_id AS ticker, CAST(ts AS DATE) AS date,
      |         arg_min(value, ts) AS open, max(value) AS high,
      |         min(value) AS low, arg_max(value, ts) AS close,
      |         count(*) AS volume
      |  FROM events GROUP BY 1, 2
      |), vard AS (
      |  SELECT *, CASE WHEN lag(close) OVER w <> 0
      |                 THEN (close - lag(close) OVER w) / lag(close) OVER w * 100
      |                 ELSE 0.0 END AS variation_pct
      |  FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)
      |), summarized AS (
      |  SELECT ticker, date,
      |         printf(E'- Open: %.2f\n- Close: %.2f\n- Low: %.2f\n- High: %.2f\n- Variation: %.2f%%\n- Volume: %d',
      |                open, close, low, high, floor(variation_pct * 100 + 0.5) / 100, volume) AS summary
      |  FROM vard
      |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- F2: render OHLCV into the reference's summary text block ----------
    "format_summary_text" -> ((s, dir) => summarized(s, dir)),

    // -- F1: regex re-extract the numbers back out of the text (round-trip)
    "regex_extract_ohlcv" -> ((s, dir) =>
      summarized(s, dir).select(
        col("ticker"), col("date"),
        ScalarOps.extractField(col("summary"), "Open").as("open_x"),
        ScalarOps.extractField(col("summary"), "Close").as("close_x"),
        ScalarOps.extractField(col("summary"), "Variation").as("variation_x"),
        ScalarOps.extractField(col("summary"), "Volume").cast("long").as("volume_x"))),

    // -- F3: multi-format date parse (4 formats, first match wins) ---------
    "parse_date_multiformat" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          when(col("event_id") % 4 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
            .when(col("event_id") % 4 === 1, date_format(col("ts"), "yyyy/MM/dd HH:mm"))
            .when(col("event_id") % 4 === 2, date_format(col("ts"), "dd-MM-yyyy"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd")).as("raw"))
        .select(
          col("event_id"), col("raw"),
          ScalarOps.parseDateMultiformat(col("raw")).as("parsed"))),

    // -- F4: ISO pubdate parse with now-fallback ---------------------------
    "parse_rss_pubdate" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          when(col("event_id") % 3 === 0, lit("not a date"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("raw"))
        .select(
          col("event_id"),
          ScalarOps.parsePubdate(col("raw"), NOW_SEC).as("pub_sec"))),

    // -- F5: human magnitude formatting ------------------------------------
    "human_format_number" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        ScalarOps.humanFormat(col("value") * col("event_id").cast("double"))
          .as("human"))),

    // -- F6: relative-age buckets ------------------------------------------
    "relative_time_bucket" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        ScalarOps.relativeTimeBucket(lit(NOW_SEC) - col("ts").cast("long"))
          .as("rel"))),

    // -- F7: sentiment thresholds ±0.5 -------------------------------------
    "sentiment_classify" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          ((col("event_id") % 21 - 10).cast("double") / 10.0).as("score"))
        .select(
          col("event_id"), col("score"),
          ScalarOps.sentimentClass(col("score")).as("label"))),

    // -- F8: type-dispatched doc-id derivation -----------------------------
    "id_derivation" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        ScalarOps.deriveId(col("event_type"), col("user_id"), col("ts"), col("props"))
          .as("doc_id"))),

    // -- F10: JSON serde round-trip ----------------------------------------
    "json_serde" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("payload"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"))),

    // -- F11: url-encode of the search term --------------------------------
    "url_encode_query" -> ((s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        expr("url_encode(substring(text, 1, 50))").as("q")))
  )

  def oracleSql: Map[String, String] = Map(
    "format_summary_text" ->
      s"""WITH $SUMMARY_CTE
         |SELECT ticker, date, summary FROM summarized""".stripMargin,

    "regex_extract_ohlcv" ->
      s"""WITH $SUMMARY_CTE
         |SELECT ticker, date,
         |       CAST(regexp_extract(summary, 'Open:\\s*(-?[\\d\\.]+)', 1) AS DOUBLE) AS open_x,
         |       CAST(regexp_extract(summary, 'Close:\\s*(-?[\\d\\.]+)', 1) AS DOUBLE) AS close_x,
         |       CAST(regexp_extract(summary, 'Variation:\\s*(-?[\\d\\.]+)', 1) AS DOUBLE) AS variation_x,
         |       CAST(CAST(regexp_extract(summary, 'Volume:\\s*(-?[\\d\\.]+)', 1) AS DOUBLE) AS BIGINT) AS volume_x
         |FROM summarized""".stripMargin,

    "parse_date_multiformat" ->
      """WITH raws AS (
        |  SELECT event_id,
        |         CASE WHEN event_id % 4 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |              WHEN event_id % 4 = 1 THEN strftime(ts, '%Y/%m/%d %H:%M')
        |              WHEN event_id % 4 = 2 THEN strftime(ts, '%d-%m-%Y')
        |              ELSE strftime(ts, '%Y-%m-%d') END AS raw
        |  FROM events)
        |SELECT event_id, raw,
        |       coalesce(
        |         try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
        |         try_strptime(raw, '%Y/%m/%d %H:%M'),
        |         try_strptime(raw, '%d-%m-%Y'),
        |         try_strptime(raw, '%Y-%m-%d')) AS parsed
        |FROM raws""".stripMargin,

    "parse_rss_pubdate" ->
      s"""WITH raws AS (
         |  SELECT event_id,
         |         CASE WHEN event_id % 3 = 0 THEN 'not a date'
         |              ELSE strftime(ts, '%Y-%m-%dT%H:%M:%SZ') END AS raw
         |  FROM events)
         |SELECT event_id,
         |       coalesce(CAST(floor(extract(epoch FROM try_strptime(raw, '%Y-%m-%dT%H:%M:%SZ'))) AS BIGINT),
         |                $NOW_SEC) AS pub_sec
         |FROM raws""".stripMargin,

    "human_format_number" ->
      """WITH n AS (SELECT event_id, value * CAST(event_id AS DOUBLE) AS x FROM events)
        |SELECT event_id,
        |       CASE WHEN x >= 1e12 THEN printf('%.1fT', floor(x / 1e12 * 10 + 0.5) / 10)
        |            WHEN x >= 1e9  THEN printf('%.1fB', floor(x / 1e9 * 10 + 0.5) / 10)
        |            WHEN x >= 1e6  THEN printf('%.1fM', floor(x / 1e6 * 10 + 0.5) / 10)
        |            WHEN x >= 1e3  THEN printf('%.1fK', floor(x / 1e3 * 10 + 0.5) / 10)
        |            ELSE printf('%.1f', floor(x * 10 + 0.5) / 10) END AS human
        |FROM n""".stripMargin,

    "relative_time_bucket" ->
      s"""WITH ages AS (
         |  SELECT event_id, $NOW_SEC - CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS age
         |  FROM events)
         |SELECT event_id,
         |       CASE WHEN age < 60 THEN age || 's ago'
         |            WHEN age < 3600 THEN (age // 60) || 'm ago'
         |            WHEN age < 86400 THEN (age // 3600) || 'h ago'
         |            ELSE (age // 86400) || 'd ago' END AS rel
         |FROM ages""".stripMargin,

    "sentiment_classify" ->
      """SELECT event_id,
        |       CAST(event_id % 21 - 10 AS DOUBLE) / 10.0 AS score,
        |       CASE WHEN CAST(event_id % 21 - 10 AS DOUBLE) / 10.0 > 0.5 THEN 'positive'
        |            WHEN CAST(event_id % 21 - 10 AS DOUBLE) / 10.0 < -0.5 THEN 'negative'
        |            ELSE 'neutral' END AS label
        |FROM events""".stripMargin,

    "id_derivation" ->
      """SELECT event_id,
        |       CASE WHEN event_type = 'purchase' THEN 'LATEST_METRICS_' || user_id
        |            WHEN event_type = 'click' THEN 'LATEST_TECH_' || user_id
        |            WHEN event_type = 'view' THEN 'DAILY_SUMMARY_' || user_id || '_' || strftime(ts, '%Y-%m-%d')
        |            ELSE 'NEWS_' || user_id || '_' || md5(props) END AS doc_id
        |FROM events""".stripMargin,

    "json_serde" ->
      """SELECT event_id,
        |       '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}' AS payload,
        |       CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k_int
        |FROM events""".stripMargin,

    "url_encode_query" ->
      "SELECT doc_id, replace(substring(text, 1, 50), ' ', '+') AS q FROM documents"
  )
}
