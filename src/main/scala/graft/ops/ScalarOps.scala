package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library (SURVEY §2.7 F1-F11): string / date / math /
  * parsing expressions. All pure Catalyst `Column` expressions — codegen'd,
  * no UDFs anywhere on this surface.
  *
  * Reference behaviors (cites into /root/reference/):
  *  - regex re-extract of OHLCV     src/app/rag_engine.py:295-317
  *  - summary text formatting       src/ingestion/producer.py:173-181,479-488
  *  - multi-format date parse       src/app/rag_engine.py:40-57
  *  - RSS/ISO pubdate parse         src/ingestion/producer.py:102-104,406-411
  *  - human number format           src/app/main.py:21-33
  *  - relative time buckets         src/app/main.py:36-50
  *  - sentiment thresholds ±0.5     src/app/main.py:417-433
  *  - doc id derivation             src/processing/consumer.py:143-155
  *  - json serde                    src/ingestion/producer.py:67, consumer.py:206-207
  *  - url-encode of query term      src/ingestion/producer.py:85-87
  */
object ScalarOps {

  /** F2: render an OHLCV row into the reference's multi-line summary block
    * (producer.py:173-181). The computed variation is floor-trick quantized
    * to 2 decimals BEFORE formatting: Java's %.2f rounds the shortest
    * decimal repr HALF_UP while C printf rounds the binary value half-even,
    * so un-quantized values whose repr ends in 5 would format differently
    * across engines. A ≤2-decimal value formats identically everywhere. */
  def formatSummaryText(open: Column, close: Column, low: Column,
                        high: Column, variation: Column, volume: Column): Column =
    format_string(
      "- Open: %.2f\n- Close: %.2f\n- Low: %.2f\n- High: %.2f\n- Variation: %.2f%%\n- Volume: %d",
      open, close, low, high, Num.r2(variation), volume)

  /** F1: regex-extract one numeric field back out of the summary text
    * (rag_engine.py:295-317). try_cast: a non-matching regex yields an
    * empty string, which ANSI-mode cast would throw on. */
  def extractField(doc: Column, field: String): Column =
    regexp_extract(doc, s"$field:\\s*(-?[\\d\\.]+)", 1).try_cast("double")

  /** F3: try several datetime formats in order (rag_engine.py:40-57). */
  def parseDateMultiformat(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(c, lit("yyyy/MM/dd HH:mm")),
      try_to_timestamp(c, lit("dd-MM-yyyy")),
      try_to_timestamp(c, lit("yyyy-MM-dd")))

  /** F4: ISO-8601 pubdate → unix seconds, fallback to "now"
    * (producer.py:406-411; "now" is a caller-supplied constant so batch
    * replays stay deterministic). */
  def parsePubdate(c: Column, nowSec: Long): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).cast("long"),
      lit(nowSec))

  /** F5: 1234567 → "1.2M" magnitude bucketing (main.py:21-33). Quantized to
    * 1 decimal before formatting for cross-engine parity (see
    * [[formatSummaryText]]). */
  def humanFormat(n: Column): Column = {
    def f(x: Column, suffix: String) = format_string("%.1f%s", Num.r1(x), lit(suffix))
    when(n >= 1e12, f(n / 1e12, "T"))
      .when(n >= 1e9, f(n / 1e9, "B"))
      .when(n >= 1e6, f(n / 1e6, "M"))
      .when(n >= 1e3, f(n / 1e3, "K"))
      .otherwise(f(n, ""))
  }

  /** F6: age seconds → "Xs/Xm/Xh/Xd ago" buckets (main.py:36-50).
    * Integer arithmetic only — cross-engine exact. */
  def relativeTimeBucket(ageSec: Column): Column =
    when(ageSec < 60, concat(ageSec, lit("s ago")))
      .when(ageSec < 3600, concat(floor(ageSec / 60).cast("long"), lit("m ago")))
      .when(ageSec < 86400, concat(floor(ageSec / 3600).cast("long"), lit("h ago")))
      .otherwise(concat(floor(ageSec / 86400).cast("long"), lit("d ago")))

  /** F7: sentiment score → positive/negative/neutral at ±0.5 exclusive
    * (main.py:421-428). */
  def sentimentClass(score: Column): Column =
    when(score > 0.5, lit("positive"))
      .when(score < -0.5, lit("negative"))
      .otherwise(lit("neutral"))

  /** F8: type-dispatched document id (consumer.py:143-155). The reference's
    * `hash(title)` fallback becomes md5 — deterministic and identical in
    * every engine. */
  def deriveId(typ: Column, key: Column, ts: Column, payload: Column): Column =
    when(typ === "purchase", concat(lit("LATEST_METRICS_"), key))
      .when(typ === "click", concat(lit("LATEST_TECH_"), key))
      .when(typ === "view",
        concat(lit("DAILY_SUMMARY_"), key, lit("_"), date_format(ts, "yyyy-MM-dd")))
      .otherwise(concat(lit("NEWS_"), key, lit("_"), md5(payload)))
}
