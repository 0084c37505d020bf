package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's market-analytics core, re-expressed as pure
  * `DataFrame => DataFrame` transforms over a keyed bar/event table.
  *
  * Reference behaviors covered (cites into /root/reference/):
  *  - daily OHLCV summary       src/ingestion/producer.py:154-199, 470-503
  *  - pct-change (guarded)      src/ingestion/producer.py:169-171, 231-233
  *  - prev-bar lag "join"       src/ingestion/producer.py:161-171
  *  - rolling MA 10/50/200      src/ingestion/producer.py:297-299, 325-327
  *  - trend classification      src/ingestion/producer.py:301-305
  *  - multi-horizon momentum    src/ingestion/producer.py:225-236
  *  - latest-snapshot per key   src/ingestion/producer.py:268, 331
  *
  * Scale notes: every transform here is a single keyed shuffle (groupBy or
  * window partitioned by the series key). Partial aggregation happens
  * map-side; window functions reuse one Exchange per (partition, order)
  * pair, so chaining lag/avg/row_number over the same window spec costs one
  * shuffle total. Nothing collects to the driver.
  */
object MarketOps {

  /** Per-key daily OHLCV bars derived from the raw event stream — the
    * engine's stand-in for the reference's per-ticker OHLCV history
    * (producer.py:130-150). open/close are exact arg-min/arg-max selections
    * (deterministic: `ts` is unique per key-day in the testdata).
    */
  def dailyBars(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id").as("ticker"), to_date(col("ts")).as("date"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("volume"))

  private def byDate = Window.partitionBy(col("ticker")).orderBy(col("date"))

  /** Guarded percent change: 0.0 when the base is 0 or missing
    * (producer.py:169-171). Pure element-wise IEEE arithmetic. */
  def pctChange(cur: Column, prev: Column): Column =
    when(prev =!= 0.0, (cur - prev) / prev * 100).otherwise(lit(0.0))

  /** Previous-day close via `lag` — the windowed self-join the reference
    * does positionally with iloc[-2] (producer.py:161-171). */
  def withPrevClose(bars: DataFrame): DataFrame =
    bars.withColumn("prev_close", lag(col("close"), 1).over(byDate))

  /** Daily summary: OHLCV + variation vs previous close
    * (producer.py:154-199). */
  def dailySummary(events: DataFrame): DataFrame =
    withPrevClose(dailyBars(events))
      .withColumn("variation_pct", pctChange(col("close"), col("prev_close")))

  /** Rolling mean of close over the trailing `n` bars with pandas
    * min-periods semantics: undefined (NaN) until the window is full, then
    * coerced to 0.0 exactly as the reference does (producer.py:325-327).
    * The window sum accumulates in DECIMAL so the value is order-insensitive
    * and bit-stable cross-engine (see [[Num]]). */
  def rollingMa(n: Int): Column = {
    val w = byDate.rowsBetween(-(n - 1), 0)
    val full = count(lit(1)).over(w) === n
    val ma = sum(col("close").cast(org.apache.spark.sql.types.DecimalType(27, 2)))
      .over(w).cast("double") / n
    when(full, ma).otherwise(lit(0.0))
  }

  /** MA10/50/200 overlay columns (producer.py:297-299; chart overlays
    * main.py:125-143). One Exchange serves all three frames. */
  def withRollingMas(bars: DataFrame): DataFrame =
    bars
      .withColumn("ma_10", rollingMa(10))
      .withColumn("ma_50", rollingMa(50))
      .withColumn("ma_200", rollingMa(200))

  /** BULLISH / BEARISH / NEUTRAL vs MA50 (producer.py:301-305). The
    * reference emits NEUTRAL when the MA is unavailable (0.0) too. */
  def trend(cur: Column, ma50: Column): Column =
    when(ma50 === 0.0, lit("NEUTRAL"))
      .when(cur > ma50, lit("BULLISH"))
      .when(cur < ma50, lit("BEARISH"))
      .otherwise(lit("NEUTRAL"))

  /** Multi-horizon momentum over the raw (5-min-bar analog) event series:
    * lagged prices at bar offsets 2/6/12/36/72 = 10m/30m/1h/3h/6h
    * (producer.py:225-236), plus pct-changes and a direction bucket. Missing
    * history → 0.0 (producer.py:229-230 length guard). */
  def momentum(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val horizons = Seq("10min" -> 2, "30min" -> 6, "1h" -> 12, "3h" -> 36, "6h" -> 72)
    val lagged = horizons.foldLeft(events) { case (df, (name, off)) =>
      df.withColumn(s"price_$name" + "_ago", coalesce(lag(col("value"), off).over(w), lit(0.0)))
    }
    horizons.foldLeft(lagged) { case (df, (name, _)) =>
      val prev = col(s"price_$name" + "_ago")
      df.withColumn(s"chg_$name", pctChange(col("value"), prev))
        .withColumn(
          s"dir_$name",
          when(col(s"chg_$name") > 0.0, lit("UP"))
            .when(col(s"chg_$name") < 0.0, lit("DOWN"))
            .otherwise(lit("FLAT")))
    }
  }

  /** Latest row per key — the reference's LATEST_* singleton-id snapshot
    * state (producer.py:268,331; consumer.py:143-146), as a batch query.
    * Ordering is made total with the unique event id so latest-wins is
    * deterministic post-shuffle (SURVEY §2.9 T6). */
  def latestSnapshot(events: DataFrame): DataFrame =
    events
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .drop("rn")
}
