package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics for the time-series robustness pack (SeriesQueries)
  * plus the round-6 curriculum/fuzzy-dedup additions: hand-computed
  * medians at both parities, MAD outlier flagging, gap scaffolding with
  * forward carry, Markov row-normalization, interleave shard structure,
  * and the edit-distance band/threshold behavior. */
class SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("series_test").toString
    rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("rolling_median: odd picks middle, even averages the two middles") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 10.0),
      (1L, ts("2024-01-01 11:00:00"), 2L, "view", 30.0),
      (1L, ts("2024-01-01 12:00:00"), 3L, "view", 20.0),
      (1L, ts("2024-01-01 13:00:00"), 4L, "view", 100.0)))
    val med = SparkEntry.queries("rolling_median")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(med(1L) == 10.0)           // [10]
    assert(med(2L) == 20.0)           // [10,30] -> (10+30)/2
    assert(med(3L) == 20.0)           // [10,20,30]
    assert(med(4L) == 25.0)           // [10,20,30,100] -> (20+30)/2
  }

  test("rolling_median: frame is bounded at 10 trailing rows") {
    val rows = (1 to 15).map(i =>
      (1L, ts(f"2024-01-01 ${9 + i / 60}%02d:${i % 60}%02d:00"), i.toLong, "view", i.toDouble))
    val med = SparkEntry.queries("rolling_median")(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // row 15 sees [6..15] -> (10+11)/2; an unbounded frame would give 8.0
    assert(med(15L) == 10.5)
  }

  test("robust_zscore_mad: a wild point is flagged, the bulk is not") {
    val rows = (1 to 9).map(i =>
      (1L, ts(s"2024-01-01 10:0$i:00"), i.toLong, "view", 10.0 + (i % 3))) :+
      (1L, ts("2024-01-01 11:00:00"), 10L, "view", 500.0)
    val out = SparkEntry.queries("robust_zscore_mad")(spark, eventsDir(rows))
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(10L))                       // the 500.0 spike
    assert((1 to 9).forall(i => !out(i.toLong)))
  }

  test("robust_zscore_mad: zero-MAD group degrades to rz=0, no outliers") {
    val rows = (1 to 4).map(i =>
      (1L, ts(s"2024-01-01 10:0$i:00"), i.toLong, "view", 42.0))
    val out = SparkEntry.queries("robust_zscore_mad")(spark, eventsDir(rows))
      .collect()
    assert(out.forall(r => r.getDouble(3) == 0.0 && !r.getBoolean(4)))
  }

  test("gap_fill_forward: missing days scaffolded and carried forward") {
    val dir = eventsDir(Seq(
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 5.0),
      (1L, ts("2024-01-01 17:00:00"), 2L, "view", 7.0),  // day close = 7
      (1L, ts("2024-01-04 10:00:00"), 3L, "view", 9.0)))
    val got = SparkEntry.queries("gap_fill_forward")(spark, dir)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(got.map(_._2).toSeq == Seq(7.0, 7.0, 7.0, 9.0))  // last-of-day then carry
    assert(got.map(_._3).toSeq == Seq(false, true, true, false))
  }

  test("markov_transitions: per-prev probabilities sum to 1") {
    val rows = Seq("view", "click", "view", "purchase", "view", "click").zipWithIndex.map {
      case (t, i) => (1L, ts(s"2024-01-01 10:0$i:00"), i.toLong, t, 1.0)
    }
    val df = SparkEntry.queries("markov_transitions")(spark, eventsDir(rows))
    val byPrev = df.collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(3)).sum).toMap
    byPrev.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
    // view -> {click: 2, purchase: 1}
    val vc = df.collect().find(r => r.getString(0) == "view" && r.getString(1) == "click").get
    assert(vc.getLong(2) == 2L && math.abs(vc.getDouble(3) - 2.0 / 3.0) < 1e-12)
  }

  test("curriculum_interleave: shard k holds each source's k-th best") {
    val got = SparkEntry.queries("curriculum_interleave")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(1), r.getLong(3), r.getLong(2)))
    // per source: shard ids are 0..n-1 exactly once, scores non-increasing
    got.groupBy(_._1).foreach { case (_, rows) =>
      val byShard = rows.sortBy(_._2)
      assert(byShard.map(_._2).toSeq == byShard.indices.map(_.toLong).toSeq)
      val scores = byShard.map(_._3)
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("dedup_fuzzy_editdist: pairs are banded, ordered, under threshold") {
    val rows = SparkEntry.queries("dedup_fuzzy_editdist")(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 0L)
    }
  }

  test("pagerank_canonical: one canonical per cluster, ranks bounded below") {
    val rows = SparkEntry.queries("pagerank_canonical")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, members) =>
      assert(members.count(_._4) == 1)                 // exactly one canonical
      val canon = members.find(_._4).get
      assert(members.forall(m => m._3 <= canon._3 ||
        (m._3 == canon._3 && m._1 >= canon._1)))       // argmax with id tiebreak
    }
    rows.foreach(r => assert(r._3 >= 0.15))            // damping floor
  }

  test("tpch_q6_forecast plan: every predicate pushes to parquet, 4-column read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("tpch_q6_forecast")(spark, "/root/testdata/sf0.001")
    // sparkPlan, not executedPlan: AQE wraps the tree in
    // AdaptiveSparkPlanExec whose children aren't visible to collect
    val scan = df.queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c must push into parquet, got: $pushed"))
    val read = scan.metadata.getOrElse("ReadSchema", "")
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(read.contains) && !read.contains("l_orderkey"),
      s"scan must read exactly the 4 needed columns, got: $read")
  }

  test("tpch_q6_forecast: revenue equals the per-row decimal sum") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("tpch_q6_forecast")(spark, "/root/testdata/sf0.001")
      .collect().head
    val manual = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .collect().map(r =>
        BigDecimal(r.getAs[Double]("l_extendedprice")).setScale(2) *
          BigDecimal(r.getAs[Double]("l_discount")).setScale(2))
      .sum
    assert(df.getLong(1) > 0)
    assert(math.abs(df.getDouble(0) - manual.toDouble) < 1e-9)
  }

  test("tpch_q18_large_orders plan: aggregate below the joins, broadcast, top-k") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val df = SparkEntry.queries("tpch_q18_large_orders")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.sparkPlan
    // the quantity aggregate must sit BELOW every join: no join operator
    // may appear in any aggregate's subtree
    val aggs = plan.collect { case a: BaseAggregateExec => a }
    assert(aggs.nonEmpty)
    assert(aggs.forall(_.collect { case j: BroadcastHashJoinExec => j }.isEmpty),
      "quantity aggregation must run before the dim joins, not after")
    // the filtered big-order set broadcasts; the top-100 is
    // TakeOrderedAndProject, never a global sort
    assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      "big-order set must broadcast into the orders join")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-100 must plan as TakeOrderedAndProject")
  }

  test("series_downsample_m4: every bucket keeps exactly its envelope points") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("series_downsample_m4")(spark, sf).cache()
    // exactly the 4 roles per (series, bucket)
    val bad = out.groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"), count_distinct(col("role")).as("nr"))
      .filter(col("n") =!= 4 || col("nr") =!= 4)
    assert(bad.count() == 0, "each bucket must carry first/last/vmin/vmax")
    // roles agree with a raw recomputation
    val raw = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("long").as("ts_int"), col("value"))
      .withColumn("bucket", floor(col("ts_int") / 86400).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(min(col("value")).as("r_vmin"), max(col("value")).as("r_vmax"),
        min(col("ts_int")).as("r_tmin"), max(col("ts_int")).as("r_tmax"))
    val joined = out.groupBy(col("event_type"), col("bucket"))
      .pivot("role", Seq("first", "last", "vmin", "vmax"))
      .agg(first(struct(col("ts_int"), col("value"))))
      .join(raw, Seq("event_type", "bucket"))
    assert(joined.filter(
      col("vmin.value") =!= col("r_vmin") || col("vmax.value") =!= col("r_vmax") ||
        col("first.ts_int") =!= col("r_tmin") || col("last.ts_int") =!= col("r_tmax"))
      .count() == 0, "envelope points must match the raw per-bucket extrema")
  }
}
