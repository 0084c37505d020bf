package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.MarketOps

/** SURVEY §2.4/§2.5 market-analytics queries (A1, A2, J1, J2/W3, W1, W2, T3
  * batch oracle) over the `events` stand-in table. */
object MarketQueries extends QueryPack {

  /** Daily OHLCV bars from `events` — mirrors [[MarketOps.dailyBars]]. */
  private val BARS_CTE =
    """bars AS (
      |  SELECT user_id AS ticker, CAST(ts AS DATE) AS date,
      |         arg_min(value, ts) AS open, max(value) AS high,
      |         min(value) AS low, arg_max(value, ts) AS close,
      |         count(*) AS volume
      |  FROM events GROUP BY 1, 2
      |)""".stripMargin

  /** min-periods rolling MA over window alias `w` — mirrors
    * [[MarketOps.rollingMa]] (DECIMAL-accumulated, see [[graft.ops.Num]]). */
  private def maSql(n: Int, w: String): String =
    s"CASE WHEN count(*) OVER $w = $n THEN " +
      s"CAST(sum(CAST(close AS DECIMAL(27,2))) OVER $w AS DOUBLE) / $n ELSE 0.0 END"

  private def maWindows =
    """WINDOW w10 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
      |       w50 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
      |       w200 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- A1+J1+A2: per-key daily OHLCV + variation vs previous close -------
    "daily_ohlcv_summary" -> ((s, dir) =>
      MarketOps.dailySummary(Tables.events(s, dir))),

    // -- drawdown curve: running peak + drawdown-from-peak per ticker ------
    //    The risk metric every market dashboard carries. One bounded
    //    prefix-max window over the daily bars; dd is a single IEEE
    //    division of exact window outputs, so no rounding is needed —
    //    max/min are order-insensitive. ------------------------------------
    "indicator_drawdown" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("ticker").orderBy(col("date"))
        .rowsBetween(Window.unboundedPreceding, 0)
      MarketOps.dailyBars(Tables.events(s, dir))
        .select(col("ticker"), col("date"), col("close"),
          max(col("close")).over(w).as("peak"))
        .withColumn("dd",
          when(col("peak") =!= 0.0,
            (col("close") - col("peak")) / col("peak")).otherwise(lit(0.0)))
    }),

    // -- annualized Sharpe per ticker from daily close returns -------------
    //    Returns are r6-quantized, their squares re-quantized, and both
    //    moments accumulate as DECIMAL(27,6) (order-free) — the zipf-OLS
    //    recipe — so mean/std and the √252-annualized ratio are
    //    bit-identical cross-engine. Degenerate series (n ≤ 1 or zero
    //    variance) report 0.0 on both sides. -------------------------------
    "stats_sharpe" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.ops.Num
      val w = Window.partitionBy("ticker").orderBy(col("date"))
      val rets = MarketOps.dailyBars(Tables.events(s, dir))
        .select(col("ticker"), col("close"),
          lag(col("close"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull && col("prev") =!= 0.0)
        .select(col("ticker"),
          Num.r6((col("close") - col("prev")) / col("prev")).as("r"))
        .select(col("ticker"), col("r"), Num.r6(col("r") * col("r")).as("rr"))
      rets.groupBy(col("ticker"))
        .agg(count(lit(1)).as("n"),
          Num.dsum6(col("r")).as("sr"), Num.dsum6(col("rr")).as("srr"))
        .select(col("ticker"), col("n"),
          when(col("n") > 1 && col("n") * col("srr") - col("sr") * col("sr") > 0,
            Num.r6((col("sr") / col("n")) /
              sqrt((col("n") * col("srr") - col("sr") * col("sr")) /
                (col("n") * (col("n") - 1))) * sqrt(lit(252.0))))
            .otherwise(lit(0.0)).as("sharpe_ann"))
    }),

    // -- J1: previous-bar lag self-join ------------------------------------
    "lag_join_prev_day" -> ((s, dir) =>
      MarketOps
        .withPrevClose(MarketOps.dailyBars(Tables.events(s, dir)))
        .select("ticker", "date", "close", "prev_close")),

    // -- A2: guarded pct-change --------------------------------------------
    "pct_change" -> ((s, dir) =>
      MarketOps
        .withPrevClose(MarketOps.dailyBars(Tables.events(s, dir)))
        .select(
          col("ticker"), col("date"),
          MarketOps.pctChange(col("close"), col("prev_close")).as("variation_pct"))),

    // -- W1: rolling MA 10/50/200 with min-periods NaN→0.0 -----------------
    "rolling_ma_10_50_200" -> ((s, dir) =>
      MarketOps.withRollingMas(MarketOps.dailyBars(Tables.events(s, dir)))
        .select("ticker", "date", "close", "ma_10", "ma_50", "ma_200")),

    // -- W1 extension: Cutler's RSI-14 (the SMA form — the recursive
    //    Wilder smoothing is not window-expressible; the SMA variant is
    //    the standard closed form). Deltas feed DECIMAL-accumulated gain/
    //    loss window sums (order-insensitive, so DuckDB's segment-tree
    //    window evaluation cannot produce a different float than Spark's
    //    running frame). Convention mirrored in the oracle: <14 deltas →
    //    0.0 (the MA min-periods convention), zero avg loss → 100. -------
    "indicator_rsi_14" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val d2 = DecimalType(27, 2)
      val wLag = Window.partitionBy("ticker").orderBy("date")
      val w = Window.partitionBy("ticker").orderBy("date").rowsBetween(-13, 0)
      MarketOps.dailyBars(Tables.events(s, dir))
        .withColumn("delta", col("close") - lag(col("close"), 1).over(wLag))
        .withColumn("gain",
          when(col("delta").isNotNull, greatest(col("delta"), lit(0.0)).cast(d2)))
        .withColumn("loss",
          when(col("delta").isNotNull, greatest(-col("delta"), lit(0.0)).cast(d2)))
        .withColumn("n_d", count(col("delta")).over(w))
        .withColumn("sg", sum(col("gain")).over(w).cast("double"))
        .withColumn("sl", sum(col("loss")).over(w).cast("double"))
        .select(col("ticker"), col("date"), col("close"),
          graft.ops.Num.r6(
            when(col("n_d") < 14, lit(0.0))
              .when(col("sl") === 0.0, lit(100.0))
              .otherwise(lit(100.0) - lit(100.0) /
                (lit(1.0) + col("sg") / col("sl"))))
            .as("rsi_14"))
    }),

    // -- W1 extension: exact EMA-12/26 + MACD. The EMA recursion
    //    EMA_t = α·x_t + (1−α)·EMA_{t−1} folds over the ordered close
    //    prefix (window collect in frame order), seeded with the first
    //    close — the EXACT recursive EMA, not a truncated approximation,
    //    with the identical IEEE op sequence in both engines (aggregate /
    //    list_reduce both fold left in element order). Per-key history is
    //    bounded by trading days, so the prefix array stays small; the
    //    unbounded-history variant is the streaming stateful op. ----------
    "indicator_ema_macd" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("ticker").orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
      def ema(n: Int) = {
        val a = lit(2.0 / (n + 1.0))
        aggregate(
          expr("slice(prefix, 2, size(prefix) - 1)"),
          element_at(col("prefix"), 1),
          (acc, x) => a * x + (lit(1.0) - a) * acc)
      }
      MarketOps.dailyBars(Tables.events(s, dir))
        .withColumn("prefix", collect_list(col("close")).over(w))
        .withColumn("e12", ema(12))
        .withColumn("e26", ema(26))
        .select(col("ticker"), col("date"), col("close"),
          graft.ops.Num.r6(col("e12")).as("ema_12"),
          graft.ops.Num.r6(col("e26")).as("ema_26"),
          graft.ops.Num.r6(col("e12") - col("e26")).as("macd"))
    }),

    // -- W1 extension: Bollinger bands (20-day SMA ± 2σ) + stochastic %K
    //    (14-day). Mean and sample-σ derive from decimal-exact window
    //    sums of close and close² (order-insensitive; close has 2
    //    decimals so close² has 4 — both sums exact), %K from exact
    //    min/max windows. Min-periods convention: bands/%K are 0.0 until
    //    the window fills; flat 14-day ranges emit %K = 50. --------------
    "indicator_bollinger_stoch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val d2 = DecimalType(27, 2)
      val d4 = DecimalType(38, 4)
      val w20 = Window.partitionBy("ticker").orderBy("date").rowsBetween(-19, 0)
      val w14 = Window.partitionBy("ticker").orderBy("date").rowsBetween(-13, 0)
      val n20 = count(lit(1)).over(w20)
      val sx = sum(col("close").cast(d2)).over(w20).cast("double")
      val sxx = sum((col("close").cast(d2) * col("close").cast(d2)).cast(d4))
        .over(w20).cast("double")
      val mean = sx / lit(20.0)
      val sd = sqrt((lit(20.0) * sxx - sx * sx) / (lit(20.0) * lit(19.0)))
      val lo14 = min(col("close")).over(w14)
      val hi14 = max(col("close")).over(w14)
      val n14 = count(lit(1)).over(w14)
      MarketOps.dailyBars(Tables.events(s, dir))
        .withColumn("n20", n20).withColumn("sx", sx).withColumn("sxx", sxx)
        .withColumn("n14", n14).withColumn("lo", lo14).withColumn("hi", hi14)
        .select(col("ticker"), col("date"), col("close"),
          graft.ops.Num.r6(when(col("n20") < 20, lit(0.0)).otherwise(mean))
            .as("bb_mid"),
          graft.ops.Num.r6(when(col("n20") < 20, lit(0.0))
            .otherwise(mean + lit(2.0) * sd)).as("bb_upper"),
          graft.ops.Num.r6(when(col("n20") < 20, lit(0.0))
            .otherwise(mean - lit(2.0) * sd)).as("bb_lower"),
          graft.ops.Num.r6(
            when(col("n14") < 14, lit(0.0))
              .when(col("hi") === col("lo"), lit(50.0))
              .otherwise(lit(100.0) * (col("close") - col("lo")) /
                (col("hi") - col("lo")))).as("stoch_k"))
    }),

    // -- W1 extension: on-balance volume — running sum of volume signed
    //    by the close-to-close direction. All integers: the cumsum is
    //    exact at any scale and any accumulation order. -------------------
    "indicator_obv" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val wLag = Window.partitionBy("ticker").orderBy("date")
      val wCum = Window.partitionBy("ticker").orderBy("date")
        .rowsBetween(Window.unboundedPreceding, 0)
      MarketOps.dailyBars(Tables.events(s, dir))
        .withColumn("prev", lag(col("close"), 1).over(wLag))
        .withColumn("signed_vol",
          when(col("prev").isNull || col("close") === col("prev"), lit(0L))
            .when(col("close") > col("prev"), col("volume"))
            .otherwise(-col("volume")))
        .select(col("ticker"), col("date"), col("close"),
          sum(col("signed_vol")).over(wCum).as("obv"))
    }),

    // -- W2: trend bucket vs rolling mean ----------------------------------
    "trend_classify" -> ((s, dir) =>
      MarketOps.withRollingMas(MarketOps.dailyBars(Tables.events(s, dir)))
        .select(
          col("ticker"), col("date"), col("close"),
          MarketOps.trend(col("close"), col("ma_10")).as("trend"))),

    // -- W3/J2: multi-horizon momentum via lag offsets ---------------------
    "momentum_multihorizon" -> ((s, dir) =>
      MarketOps.momentum(Tables.events(s, dir))
        .select(
          "user_id", "event_id", "ts", "value",
          "price_10min_ago", "price_30min_ago", "price_1h_ago",
          "price_3h_ago", "price_6h_ago",
          "chg_10min", "chg_30min", "chg_1h", "chg_3h", "chg_6h",
          "dir_10min", "dir_30min", "dir_1h", "dir_3h", "dir_6h")),

    // -- T3 batch oracle: latest snapshot per key --------------------------
    "latest_snapshot_state" -> ((s, dir) =>
      MarketOps.latestSnapshot(Tables.events(s, dir))
        .select("user_id", "event_id", "ts", "event_type", "value"))
  )

  def oracleSql: Map[String, String] = Map(
    "daily_ohlcv_summary" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date, open, high, low, close, volume,
         |       lag(close) OVER w AS prev_close,
         |       ${pctSql("close", "lag(close) OVER w")} AS variation_pct
         |FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)""".stripMargin,

    "lag_join_prev_day" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date, close, lag(close) OVER w AS prev_close
         |FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)""".stripMargin,

    "indicator_drawdown" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date, close,
         |       max(close) OVER w AS peak,
         |       CASE WHEN max(close) OVER w <> 0.0
         |            THEN (close - max(close) OVER w) / (max(close) OVER w)
         |            ELSE 0.0 END AS dd
         |FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "stats_sharpe" -> {
      import graft.ops.Num.{DSUM6_SQL, R6_SQL}
      s"""WITH $BARS_CTE, rets AS (
         |  SELECT ticker, ${R6_SQL("(close - prev) / prev")} AS r
         |  FROM (SELECT ticker, close,
         |               lag(close) OVER (PARTITION BY ticker ORDER BY date) AS prev
         |        FROM bars)
         |  WHERE prev IS NOT NULL AND prev <> 0.0
         |), r2 AS (
         |  SELECT ticker, r, ${R6_SQL("r * r")} AS rr FROM rets
         |), m AS (
         |  SELECT ticker, count(*) AS n,
         |         ${DSUM6_SQL("r")} AS sr, ${DSUM6_SQL("rr")} AS srr
         |  FROM r2 GROUP BY ticker
         |)
         |SELECT ticker, n,
         |       CASE WHEN n > 1 AND n * srr - sr * sr > 0
         |            THEN ${R6_SQL("(sr / n) / sqrt((n * srr - sr * sr) / (n * (n - 1))) * sqrt(252.0)")}
         |            ELSE 0.0 END AS sharpe_ann
         |FROM m""".stripMargin
    },

    "pct_change" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date,
         |       ${pctSql("close", "lag(close) OVER w")} AS variation_pct
         |FROM bars WINDOW w AS (PARTITION BY ticker ORDER BY date)""".stripMargin,

    "indicator_rsi_14" ->
      s"""WITH $BARS_CTE,
         |d AS (SELECT ticker, date, close,
         |             close - lag(close, 1) OVER (PARTITION BY ticker ORDER BY date) AS delta
         |      FROM bars),
         |g AS (SELECT ticker, date, close, delta,
         |             CASE WHEN delta IS NULL THEN NULL
         |                  ELSE CAST(greatest(delta, 0.0) AS DECIMAL(27,2)) END AS gain,
         |             CASE WHEN delta IS NULL THEN NULL
         |                  ELSE CAST(greatest(-delta, 0.0) AS DECIMAL(27,2)) END AS loss
         |      FROM d)
         |SELECT ticker, date, close,
         |       ${graft.ops.Num.R6_SQL(
               "CASE WHEN count(delta) OVER w < 14 THEN 0.0 " +
                 "WHEN CAST(sum(loss) OVER w AS DOUBLE) = 0.0 THEN 100.0 " +
                 "ELSE 100.0 - 100.0 / (1.0 + CAST(sum(gain) OVER w AS DOUBLE) / CAST(sum(loss) OVER w AS DOUBLE)) END")} AS rsi_14
         |FROM g
         |WINDOW w AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin,

    "indicator_ema_macd" -> {
      // DuckDB list_reduce seeds with the FIRST element and folds the rest
      // — exactly the EMA seed semantics.
      def ema(n: Int) =
        s"list_reduce(prefix, (acc, x) -> (2.0 / ${n + 1}.0) * x + (1.0 - 2.0 / ${n + 1}.0) * acc)"
      s"""WITH $BARS_CTE,
         |p AS (SELECT ticker, date, close,
         |             list(close) OVER (PARTITION BY ticker ORDER BY date
         |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
         |      FROM bars)
         |SELECT ticker, date, close,
         |       ${graft.ops.Num.R6_SQL(ema(12))} AS ema_12,
         |       ${graft.ops.Num.R6_SQL(ema(26))} AS ema_26,
         |       ${graft.ops.Num.R6_SQL(s"${ema(12)} - ${ema(26)}")} AS macd
         |FROM p""".stripMargin
    },

    "indicator_bollinger_stoch" -> {
      val sx = "CAST(sum(CAST(close AS DECIMAL(27,2))) OVER w20 AS DOUBLE)"
      val sxx = "CAST(sum(CAST(CAST(close AS DECIMAL(27,2)) * CAST(close AS DECIMAL(27,2)) AS DECIMAL(38,4))) OVER w20 AS DOUBLE)"
      val mean = s"$sx / 20.0"
      val sd = s"sqrt((20.0 * $sxx - $sx * $sx) / (20.0 * 19.0))"
      s"""WITH $BARS_CTE
         |SELECT ticker, date, close,
         |       ${graft.ops.Num.R6_SQL(s"CASE WHEN count(*) OVER w20 < 20 THEN 0.0 ELSE $mean END")} AS bb_mid,
         |       ${graft.ops.Num.R6_SQL(s"CASE WHEN count(*) OVER w20 < 20 THEN 0.0 ELSE $mean + 2.0 * $sd END")} AS bb_upper,
         |       ${graft.ops.Num.R6_SQL(s"CASE WHEN count(*) OVER w20 < 20 THEN 0.0 ELSE $mean - 2.0 * $sd END")} AS bb_lower,
         |       ${graft.ops.Num.R6_SQL(
               "CASE WHEN count(*) OVER w14 < 14 THEN 0.0 " +
                 "WHEN max(close) OVER w14 = min(close) OVER w14 THEN 50.0 " +
                 "ELSE 100.0 * (close - min(close) OVER w14) / (max(close) OVER w14 - min(close) OVER w14) END")} AS stoch_k
         |FROM bars
         |WINDOW w20 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
         |       w14 AS (PARTITION BY ticker ORDER BY date ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)""".stripMargin
    },

    "indicator_obv" ->
      s"""WITH $BARS_CTE,
         |d AS (SELECT ticker, date, close, volume,
         |             lag(close, 1) OVER (PARTITION BY ticker ORDER BY date) AS prev
         |      FROM bars)
         |SELECT ticker, date, close,
         |       CAST(sum(CASE WHEN prev IS NULL OR close = prev THEN 0
         |                     WHEN close > prev THEN volume ELSE -volume END)
         |         OVER (PARTITION BY ticker ORDER BY date
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
         |FROM d""".stripMargin,

    "rolling_ma_10_50_200" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date, close,
         |       ${maSql(10, "w10")} AS ma_10,
         |       ${maSql(50, "w50")} AS ma_50,
         |       ${maSql(200, "w200")} AS ma_200
         |FROM bars
         |$maWindows""".stripMargin,

    "trend_classify" ->
      s"""WITH $BARS_CTE
         |SELECT ticker, date, close,
         |       CASE WHEN ${maSql(10, "w10")} = 0.0 THEN 'NEUTRAL'
         |            WHEN close > ${maSql(10, "w10")} THEN 'BULLISH'
         |            WHEN close < ${maSql(10, "w10")} THEN 'BEARISH'
         |            ELSE 'NEUTRAL' END AS trend
         |FROM bars
         |$maWindows""".stripMargin,

    "momentum_multihorizon" ->
      s"""WITH lagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         coalesce(lag(value, 2)  OVER w, 0.0) AS price_10min_ago,
         |         coalesce(lag(value, 6)  OVER w, 0.0) AS price_30min_ago,
         |         coalesce(lag(value, 12) OVER w, 0.0) AS price_1h_ago,
         |         coalesce(lag(value, 36) OVER w, 0.0) AS price_3h_ago,
         |         coalesce(lag(value, 72) OVER w, 0.0) AS price_6h_ago
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |)
         |SELECT user_id, event_id, ts, value,
         |       price_10min_ago, price_30min_ago, price_1h_ago, price_3h_ago, price_6h_ago,
         |       ${pctSql("value", "price_10min_ago")} AS chg_10min,
         |       ${pctSql("value", "price_30min_ago")} AS chg_30min,
         |       ${pctSql("value", "price_1h_ago")} AS chg_1h,
         |       ${pctSql("value", "price_3h_ago")} AS chg_3h,
         |       ${pctSql("value", "price_6h_ago")} AS chg_6h,
         |       CASE WHEN ${pctSql("value", "price_10min_ago")} > 0 THEN 'UP' WHEN ${pctSql("value", "price_10min_ago")} < 0 THEN 'DOWN' ELSE 'FLAT' END AS dir_10min,
         |       CASE WHEN ${pctSql("value", "price_30min_ago")} > 0 THEN 'UP' WHEN ${pctSql("value", "price_30min_ago")} < 0 THEN 'DOWN' ELSE 'FLAT' END AS dir_30min,
         |       CASE WHEN ${pctSql("value", "price_1h_ago")} > 0 THEN 'UP' WHEN ${pctSql("value", "price_1h_ago")} < 0 THEN 'DOWN' ELSE 'FLAT' END AS dir_1h,
         |       CASE WHEN ${pctSql("value", "price_3h_ago")} > 0 THEN 'UP' WHEN ${pctSql("value", "price_3h_ago")} < 0 THEN 'DOWN' ELSE 'FLAT' END AS dir_3h,
         |       CASE WHEN ${pctSql("value", "price_6h_ago")} > 0 THEN 'UP' WHEN ${pctSql("value", "price_6h_ago")} < 0 THEN 'DOWN' ELSE 'FLAT' END AS dir_6h
         |FROM lagged""".stripMargin,

    "latest_snapshot_state" ->
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT user_id, event_id, ts, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin
  )
}
