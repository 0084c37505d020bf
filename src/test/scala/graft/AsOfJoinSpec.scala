package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The custom AsOfJoinExec must return exactly the rows of the composable
  * range-join + row_number formulation, including the no-match (null)
  * case, and handle tolerance boundaries inclusively. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("as-of picks the latest right row within tolerance, nulls when none") {
    val grid = Seq((1L, 1000L), (1L, 2000L), (2L, 1000L), (3L, 500L))
      .toDF("g_user", "g_us")
    val ev = Seq(
      (1L, 900L, 10.0), (1L, 999L, 11.0), (1L, 1001L, 12.0),
      (1L, 1500L, 13.0), (2L, 100L, 20.0))
      .toDF("user_id", "r_us", "value")
    val got = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us", tolerance = 600L)
      .select($"g_user", $"g_us", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 1000L, Some(11.0)),  // latest <= 1000 within 600
      (1L, 2000L, Some(13.0)),  // 1500 within [1400, 2000]
      (2L, 1000L, None),        // 100 < 1000-600 -> out of tolerance
      (3L, 500L, None)))        // key has no right rows
  }

  test("native operator matches the composed range-join formulation on real data") {
    val native = SparkEntry.queries("asof_join_native")(spark, "/root/testdata/sf0.001")
    val composed = SparkEntry.queries("asof_lookback_join")(spark, "/root/testdata/sf0.001")
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }

  test("hot key: bounded window stays correct with 100k right rows on one key") {
    // one key carries 100k right rows (ts = 0,10,20,…); the window must
    // hold only the tolerance span (100 entries), never the whole key.
    // Correctness: each left t matches the latest right ts <= t, and a
    // left row before any right data within tolerance gets null.
    val n = 100000
    val ev = spark.range(n).select(
      lit(7L).as("user_id"), (col("id") * 10).as("r_us"), col("id").cast("double").as("value"))
    val grid = Seq((7L, 5L), (7L, 499999L), (7L, 999995L), (8L, 100L))
      .toDF("g_user", "g_us")
    val got = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us", tolerance = 1000L)
      .select($"g_user", $"g_us", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (7L, 5L, Some(0.0)),            // latest ts <= 5 is 0
      (7L, 499999L, Some(49999.0)),   // latest ts <= 499999 is 499990
      (7L, 999995L, Some(99999.0)),   // latest ts <= 999995 is 999990
      (8L, 100L, None)))              // key has no right rows
  }

  test("tolerance boundary is inclusive: rts == t - tol matches") {
    val grid = Seq((1L, 1000L)).toDF("g_user", "g_us")
    val ev = Seq((1L, 400L, 5.0)).toDF("user_id", "r_us", "value")
    val got = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us", tolerance = 600L)
      .select($"value").collect().head
    assert(!got.isNullAt(0) && got.getDouble(0) == 5.0)
  }

  test("forward: picks the earliest right row in [t, t+tol], nulls when none") {
    import graft.plans.AsOfForward
    val grid = Seq((1L, 1000L), (1L, 2000L), (2L, 1000L), (3L, 500L))
      .toDF("g_user", "g_us")
    val ev = Seq(
      (1L, 900L, 10.0), (1L, 1001L, 12.0), (1L, 1500L, 13.0),
      (1L, 2600L, 14.0), (2L, 100L, 20.0))
      .toDF("user_id", "r_us", "value")
    val got = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us",
      tolerance = 600L, direction = AsOfForward)
      .select($"g_user", $"g_us", $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, 1000L, Some(12.0)),  // earliest >= 1000 within 600 is 1001
      (1L, 2000L, Some(14.0)),  // 2600 == 2000+600, boundary inclusive
      (2L, 1000L, None),        // only right row (100) is in the past
      (3L, 500L, None)))        // key has no right rows
  }

  test("exact-ts ties resolve by the tie-break key, not arrival order") {
    import graft.plans.AsOfForward
    // three right rows TIED at ts=900 for key 1; event_id is the tie-break.
    // Shuffle arrival order on purpose (ids out of order in the input).
    val grid = Seq((1L, 1000L)).toDF("g_user", "g_us")
    val ev = Seq(
      (1L, 900L, 30.0, 302L), (1L, 900L, 10.0, 100L), (1L, 900L, 20.0, 201L))
      .toDF("user_id", "r_us", "value", "event_id")
    // backward: ORDER BY ts DESC, event_id DESC limit 1 -> id 302
    val back = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us",
      tolerance = 600L, rightTieBreak = Some("event_id"))
      .select($"value", $"event_id").collect().head
    assert((back.getDouble(0), back.getLong(1)) == ((30.0, 302L)))
    // forward: ORDER BY ts ASC, event_id ASC limit 1 -> id 100
    val gridF = Seq((1L, 800L)).toDF("g_user", "g_us")
    val fwd = AsOfJoin(gridF, ev, "g_user", "user_id", "g_us", "r_us",
      tolerance = 600L, direction = AsOfForward, rightTieBreak = Some("event_id"))
      .select($"value", $"event_id").collect().head
    assert((fwd.getDouble(0), fwd.getLong(1)) == ((10.0, 100L)))
  }

  test("exact-ts ties with a NULL tie-break never beat a non-null one") {
    import graft.plans.AsOfForward
    // three right rows TIED at ts=900; one has a NULL tie-break. Oracle
    // semantics: backward = ORDER BY ts DESC, tb DESC (nulls implicitly
    // LAST) → max non-null wins; forward = ORDER BY ts ASC, tb ASC NULLS
    // LAST → min non-null wins. A direction-blind null ordering hands one
    // direction's tie to the null row (the exec reads opposite ends of
    // the equal-ts run).
    val ev = Seq(
      (1L, 900L, 99.0, Option.empty[Long]),
      (1L, 900L, 30.0, Some(302L)),
      (1L, 900L, 10.0, Some(100L)))
      .toDF("user_id", "r_us", "value", "event_id")
    val grid = Seq((1L, 1000L)).toDF("g_user", "g_us")
    val back = AsOfJoin(grid, ev, "g_user", "user_id", "g_us", "r_us",
      tolerance = 600L, rightTieBreak = Some("event_id"))
      .select($"value").collect().head
    assert(back.getDouble(0) == 30.0, "backward tie must go to max non-null tb")
    val gridF = Seq((1L, 800L)).toDF("g_user", "g_us")
    val fwd = AsOfJoin(gridF, ev, "g_user", "user_id", "g_us", "r_us",
      tolerance = 600L, direction = AsOfForward, rightTieBreak = Some("event_id"))
      .select($"value").collect().head
    assert(fwd.getDouble(0) == 10.0, "forward tie must go to min non-null tb")
  }

  test("forward: native matches the composed formulation on real data") {
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("asof_join_forward")(spark, sf)
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    val grid = ev.select(col("user_id").as("g_user"),
        (to_date(col("ts")).cast("timestamp") + expr("INTERVAL 12 HOURS")).as("g_ts"))
      .distinct()
    val w = Window.partitionBy("g_user", "g_ts")
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val composed = grid.join(ev,
        col("g_user") === col("user_id") &&
          col("ts") >= col("g_ts") &&
          col("ts") <= col("g_ts") + expr("INTERVAL 6 HOURS"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("g_user").as("user_id"), col("g_ts"),
        coalesce(col("value"), lit(0.0)).as("next_value"),
        col("event_id").as("next_event"))
    assert(native.count() == composed.count())
    assert(native.except(composed).isEmpty && composed.except(native).isEmpty)
  }
}
