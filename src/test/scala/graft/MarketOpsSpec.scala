package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MarketOps

/** Unit specs for the market-analytics core, asserting the reference's exact
  * edge semantics (SURVEY §5.2): guarded pct-change, min-periods rolling MA
  * with NaN→0.0, deterministic latest-wins. */
class MarketOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def events(rows: (Long, String, Long, Double)*) =
    rows.toDF("user_id", "tsStr", "event_id", "value")
      .withColumn("ts", to_timestamp($"tsStr")).drop("tsStr")

  test("dailyBars: OHLCV per key-day, open/close by event time") {
    val df = events(
      (1L, "2024-01-01 09:00:00", 1L, 10.0),
      (1L, "2024-01-01 12:00:00", 2L, 30.0),
      (1L, "2024-01-01 17:00:00", 3L, 20.0),
      (1L, "2024-01-02 09:00:00", 4L, 5.0))
    val bars = MarketOps.dailyBars(df).orderBy("date").collect()
    assert(bars.length == 2)
    val d1 = bars(0)
    assert(d1.getAs[Double]("open") == 10.0)
    assert(d1.getAs[Double]("high") == 30.0)
    assert(d1.getAs[Double]("low") == 10.0)
    assert(d1.getAs[Double]("close") == 20.0)
    assert(d1.getAs[Long]("volume") == 3L)
  }

  test("pctChange: zero or missing base -> 0.0 (producer.py:169-171)") {
    val df = Seq((100.0, 0.0), (110.0, 100.0), (90.0, Double.NaN))
      .toDF("cur", "prev")
      .select(MarketOps.pctChange($"cur", $"prev").as("chg"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 10.0) < 1e-12)
  }

  test("variation: first day of a key -> 0.0 (null prev_close)") {
    val df = events((1L, "2024-01-01 09:00:00", 1L, 10.0))
    val got = MarketOps.dailySummary(df).collect()
    assert(got.head.getAs[Double]("variation_pct") == 0.0)
  }

  test("rollingMa: NaN until window full, then exact mean (producer.py:325-327)") {
    val df = events((1 to 12).map(i =>
      (1L, f"2024-01-$i%02d 09:00:00", i.toLong, i.toDouble)): _*)
    val got = MarketOps.dailyBars(df)
      .withColumn("ma_10", MarketOps.rollingMa(10))
      .orderBy("date").collect()
    // first 9 bars: window not full -> 0.0
    assert(got.take(9).forall(_.getAs[Double]("ma_10") == 0.0))
    // bar 10: mean(1..10) = 5.5 ; bar 12: mean(3..12) = 7.5
    assert(got(9).getAs[Double]("ma_10") == 5.5)
    assert(got(11).getAs[Double]("ma_10") == 7.5)
  }

  test("trend: BULLISH above MA, BEARISH below, NEUTRAL when MA unavailable") {
    val df = Seq((10.0, 5.0), (3.0, 5.0), (7.0, 0.0), (5.0, 5.0))
      .toDF("close", "ma")
      .select(MarketOps.trend($"close", $"ma").as("t"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("BULLISH", "BEARISH", "NEUTRAL", "NEUTRAL"))
  }

  test("latestSnapshot: one row per key, ties broken by event_id") {
    val df = events(
      (1L, "2024-01-01 09:00:00", 1L, 10.0),
      (1L, "2024-01-01 10:00:00", 2L, 20.0),
      (2L, "2024-01-01 09:00:00", 3L, 30.0))
    val got = MarketOps.latestSnapshot(df).orderBy("user_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("event_id") == 2L)
    assert(got(1).getAs[Long]("event_id") == 3L)
  }

  test("momentum: short history -> lagged price 0.0 and chg 0.0") {
    val df = events((1L, "2024-01-01 09:00:00", 1L, 10.0))
    val r = MarketOps.momentum(df).collect().head
    assert(r.getAs[Double]("price_10min_ago") == 0.0)
    assert(r.getAs[Double]("chg_10min") == 0.0)
    assert(r.getAs[String]("dir_10min") == "FLAT")
  }

  test("indicator_drawdown: peak is a running max, dd nonpositive and hits the trough") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, 100.0),
      (1L, "2024-01-02 10:00:00", 2L, 120.0),
      (1L, "2024-01-03 10:00:00", 3L, 90.0),   // dd = -0.25 from 120
      (1L, "2024-01-04 10:00:00", 4L, 150.0))  // new peak -> dd = 0
    val dir = java.nio.file.Files.createTempDirectory("dd_test").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("indicator_drawdown")(spark, dir)
      .orderBy("date").collect()
    assert(got.map(_.getAs[Double]("peak")).toSeq == Seq(100.0, 120.0, 120.0, 150.0))
    assert(got.map(_.getAs[Double]("dd")).toSeq == Seq(0.0, 0.0, -0.25, 0.0))
  }

  test("stats_sharpe: constant returns -> zero variance guard reports 0.0") {
    val df = events(
      (1L, "2024-01-01 10:00:00", 1L, 100.0),
      (1L, "2024-01-02 10:00:00", 2L, 110.0),
      (1L, "2024-01-03 10:00:00", 3L, 121.0)) // +10% twice -> std 0
    val dir = java.nio.file.Files.createTempDirectory("sharpe_test").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("stats_sharpe")(spark, dir).collect().head
    assert(got.getAs[Long]("n") == 2L)
    assert(got.getAs[Double]("sharpe_ann") == 0.0)
  }
}
