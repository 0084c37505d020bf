package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics for the feature/analytics pack the sf corpus may not
  * reach: funnel subsequence matching with interleaved noise and
  * out-of-order stages. */
class FeatureSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: interleaved noise still converts; out-of-order stages don't") {
    // build a tiny events table and run the registered query's exact logic
    // against it via a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("funnel_test").toString
    Seq(
      // user 1: view .. error .. click .. signup .. purchase -> converted
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "error", 1.0),
      (1L, ts("2024-01-01 12:00:00"), 3L, "click", 1.0),
      (1L, ts("2024-01-01 13:00:00"), 4L, "signup", 1.0),
      (1L, ts("2024-01-01 14:00:00"), 5L, "purchase", 1.0),
      // user 2: purchase BEFORE view/click -> only stage 1 (the later view)
      (2L, ts("2024-01-01 10:00:00"), 6L, "purchase", 1.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, "view", 1.0),
      // user 3: view click view purchase -> converted (second view ignored)
      (3L, ts("2024-01-01 10:00:00"), 8L, "view", 1.0),
      (3L, ts("2024-01-01 11:00:00"), 9L, "click", 1.0),
      (3L, ts("2024-01-01 12:00:00"), 10L, "view", 1.0),
      (3L, ts("2024-01-01 13:00:00"), 11L, "purchase", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("funnel_conversion")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L) == (3L, true))
    assert(got(2L) == (1L, false))
    assert(got(3L) == (3L, true))
  }

  test("active_users_rolling7: each window counts the trailing week, no phantom tail days") {
    val dir = java.nio.file.Files.createTempDirectory("wau_test").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (2L, ts("2024-01-03 10:00:00"), 2L, "view", 1.0),
      (1L, ts("2024-01-09 10:00:00"), 3L, "view", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("active_users_rolling7")(spark, dir)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // only days that occur are emitted: 01-01, 01-03, 01-09
    assert(got.keySet == Set("2024-01-01", "2024-01-03", "2024-01-09"))
    assert(got("2024-01-01") == 1L)            // just user 1
    assert(got("2024-01-03") == 2L)            // users 1 (01-01) + 2
    assert(got("2024-01-09") == 2L)            // user 2 (01-03, in window) + user 1
  }

  test("funnel_time_to_convert: purchase before first view doesn't count") {
    val dir = java.nio.file.Files.createTempDirectory("ttc_test").toString
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 1.0),
      (1L, ts("2024-01-01 10:30:00"), 2L, "purchase", 1.0),   // 30 min
      (2L, ts("2024-01-01 09:00:00"), 3L, "purchase", 1.0),   // BEFORE first view
      (2L, ts("2024-01-01 10:00:00"), 4L, "view", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("funnel_time_to_convert")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 30L * 60 * 1000000))
  }

  test("stats_chi2_independence: statistic bounds and df from the real table") {
    val r = SparkEntry.queries("stats_chi2_independence")(spark, "/root/testdata/sf0.001")
      .collect().head
    val chi2 = r.getDouble(0); val df = r.getLong(1)
    assert(chi2 >= 0.0)
    // cohorts = 2 (user parity), outcomes = the event_type arity observed
    val nTypes = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_type").distinct().count()
    assert(df == (2 - 1) * (nTypes - 1))
  }

  test("stats_ks_test: D in [0,1], and equals a driver-side CDF sweep") {
    val out = SparkEntry.queries("stats_ks_test")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, na, nb, d) =>
      assert(na > 0 && nb > 0); assert(d >= 0.0 && d <= 1.0)
    }
    // exact reference on collected rows
    val rows = graft.model.Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("value").isNotNull)
      .select("event_type", "user_id", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) % 2 == 0, r.getDouble(2)))
    val ref = rows.groupBy(_._1).map { case (et, rs) =>
      val na = rs.count(_._2).toDouble; val nb = rs.size - na
      val vals = rs.map(_._3).distinct.sorted
      var ca = 0L; var cb = 0L
      var d = 0.0
      vals.foreach { v =>
        ca += rs.count(r => r._2 && r._3 == v)
        cb += rs.count(r => !r._2 && r._3 == v)
        d = math.max(d, math.abs(ca / na - cb / nb))
      }
      et -> d
    }
    out.foreach { case (et, _, _, d) =>
      assert(math.abs(d - ref(et)) < 1e-12, s"$et: $d vs ${ref(et)}")
    }
  }
}
