package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Tables
import graft.streaming.StreamOps

/** The round-7→8 breakage class, turned into a unit-test failure: the
  * driver regenerated the testdata with a different physical timestamp
  * encoding (INT64 TIMESTAMP(NANOS) → `timestamp[us]` with no UTC flag,
  * which Spark 4 reads as TIMESTAMP_NTZ) and every `cast(ts as long)` /
  * `unix_micros(ts)` call site became an analysis error.
  *
  * The contract under test: [[Tables.load]] yields ONE canonical post-load
  * schema — `ts` is `TimestampType`, wall-clock-identical values under the
  * pinned UTC session zone — regardless of which of the three observed
  * encodings the parquet file uses:
  *
  *   - `events_nanos.parquet`  INT64 TIMESTAMP(NANOS)        (r1-r6 data)
  *   - `events_ntz.parquet`    timestamp[us], no UTC flag    (r7+ data)
  *   - `events_utc.parquet`    timestamp[us], UTC-adjusted
  *
  * Fixtures live in src/test/resources/fixtures (same rows, same logical
  * values, byte-different physical layout). On top of schema equality the
  * spec asserts the properties the engine actually relies on: epoch casts
  * analyze, values are bit-identical across encodings, the time-range
  * predicate still reaches the parquet scan, and the streaming twins
  * accept an NTZ-encoded file source.
  */
class SchemaPortabilitySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val encodings = Seq("nanos", "ntz", "utc")

  /** Stage fixture `events_<enc>.parquet` into its own dir under the
    * standard `<dir>/events.parquet` layout and load through Tables. */
  private def loadFixture(enc: String): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-portability-$enc")
    dir.toFile.deleteOnExit()
    val src = Paths.get(getClass.getResource(s"/fixtures/events_$enc.parquet").toURI)
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Tables.load(spark, dir.toString, "events")
  }

  private lazy val loaded: Map[String, DataFrame] =
    encodings.map(e => e -> loadFixture(e)).toMap

  test("one canonical post-load schema across all three physical encodings") {
    val schemas = loaded.map { case (enc, df) =>
      enc -> df.schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq
    }
    // ts is canonical TimestampType in every encoding — never NTZ, never long
    schemas.foreach { case (enc, fields) =>
      val (_, tsType, _) = fields.find(_._1 == "ts").get
      assert(tsType == TimestampType, s"encoding $enc: ts is $tsType")
    }
    // and the full (name, type, nullability) schema is identical
    assert(schemas("ntz") == schemas("nanos"),
      s"ntz vs nanos schema drift:\n${schemas("ntz")}\n${schemas("nanos")}")
    assert(schemas("utc") == schemas("nanos"),
      s"utc vs nanos schema drift:\n${schemas("utc")}\n${schemas("nanos")}")
  }

  test("epoch-domain expressions analyze and agree bit-for-bit across encodings") {
    // The exact expression shapes that broke in r7 when ts arrived NTZ.
    val results = loaded.map { case (enc, df) =>
      enc -> df.select(
        col("event_id"),
        col("ts").cast("long").as("sec"),
        unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    }
    assert(results("nanos") == results("ntz"))
    assert(results("nanos") == results("utc"))
    // spot-check the absolute domain: 2024-01-10T00:00:00Z epoch seconds
    assert(results("ntz").head._2 == 1704844800L)
  }

  test("time-range predicate reaches the parquet scan on the current (ntz) encoding") {
    val filtered = graft.ops.FilterOps.timeWindowPushdown(
      loaded("ntz"), "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val stats = graft.tools.PlanAudit.scanStats(filtered.queryExecution.sparkPlan)
    assert(stats.nonEmpty, "no parquet scan found in the filtered plan")
    assert(stats.head.nPushed >= 1,
      s"ts BETWEEN did not push to the parquet reader: $stats")
    // and the filter semantics survive the encoding: 2 days of 7-hourly
    // rows starting at the window open = ceil(48/7) = 7 rows
    assert(filtered.count() == 7)
  }

  test("time-range predicate reaches the parquet scan on the nanos encoding") {
    // The ADVICE-r8 hole: normalizeTs rewrites a nanos long to
    // timestamp_micros(ts div 1000), a DERIVED column the parquet source
    // cannot push — NanosRangePushdown must augment the filter with the
    // raw-long bounds so the scan still prunes row groups. Semantics must
    // be unchanged: same 7 rows as the ntz encoding's window.
    val filtered = graft.ops.FilterOps.timeWindowPushdown(
      loaded("nanos"), "2024-01-10 00:00:00", "2024-01-12 00:00:00")
    val stats = graft.tools.PlanAudit.scanStats(filtered.queryExecution.sparkPlan)
    assert(stats.nonEmpty, "no parquet scan found in the filtered plan")
    assert(stats.head.nPushed >= 1,
      s"ts BETWEEN on a nanos source did not push to the parquet reader: $stats")
    assert(filtered.count() == 7)
  }

  test("date32 encoding normalizes to midnight-UTC TimestampType") {
    // a day-granular producer: same rows, ts truncated to its date —
    // loads to canonical TimestampType at midnight UTC
    val df = loadFixture("date32")
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // row 0 is 2024-01-10T00:00Z exactly; row 1 (07:00) truncates to the
    // same midnight
    assert(got(0L) == 1704844800L * 1000000L)
    assert(got(1L) == 1704844800L * 1000000L)
    // every value is midnight-aligned
    assert(got.values.forall(_ % 86400000000L == 0))
  }

  /** Re-encode the ntz fixture's rows through `mk`, write parquet under
    * the standard `<dir>/events.parquet` layout, load through Tables, and
    * return event_id → unix_micros. Asserts the canonical schema. */
  private def loadEncoded(name: String)(mk: DataFrame => DataFrame): DataFrame = {
    val dir = Files.createTempDirectory(s"graft-portability-$name")
    dir.toFile.deleteOnExit()
    mk(loaded("ntz")).write.parquet(dir.resolve("events.parquet").toString)
    val df = Tables.load(spark, dir.toString, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"$name: ts loaded as ${df.schema("ts").dataType}")
    df
  }

  private def roundTrip(name: String)(mk: DataFrame => DataFrame): Map[Long, Long] =
    loadEncoded(name)(mk)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("plausible future encodings normalize to the canonical column (r9 hardening)") {
    // Get ahead of the next driver regeneration: every encoding a
    // plausible producer could ship — raw int64 epochs at any unit,
    // int32 seconds, decimal-encoded epochs, INT96 legacy and annotated
    // TIMESTAMP_MILLIS — must load to the same canonical values as the
    // current ntz data. The fixture rows are hour-aligned, so every
    // granularity down to seconds is lossless.
    val ref = loaded("ntz").select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // raw int64 epochs, unit detected by magnitude
    assert(roundTrip("i64us")(_.withColumn("ts", unix_micros(col("ts")))) == ref)
    assert(roundTrip("i64ms")(_.withColumn("ts", unix_millis(col("ts")))) == ref)
    assert(roundTrip("i64s")(_.withColumn("ts", col("ts").cast("long"))) == ref)
    // int32 epoch seconds (fits until 2038)
    assert(roundTrip("i32s")(_.withColumn("ts", col("ts").cast("long").cast("int"))) == ref)
    // decimal-encoded epochs: integer micros, integer nanos, fractional seconds
    assert(roundTrip("dec20us")(
      _.withColumn("ts", unix_micros(col("ts")).cast("decimal(20,0)"))) == ref)
    assert(roundTrip("dec22ns")(
      _.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("decimal(22,0)"))) == ref)
    assert(roundTrip("dec26s")(
      _.withColumn("ts",
        (unix_micros(col("ts")).cast("decimal(26,6)") / lit(1000000)))) == ref)
    // INT96 legacy + annotated TIMESTAMP_MILLIS physical layouts
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "INT96")
      assert(roundTrip("int96")(identity) == ref)
      spark.conf.set(key, "TIMESTAMP_MILLIS")
      assert(roundTrip("tsmillis")(identity) == ref)
    } finally spark.conf.set(key, prev)
  }

  test("time-range predicate reaches the parquet scan on every raw int64 unit") {
    // same contract as the nanos test, for the micros/millis/seconds
    // decode shapes NanosRangePushdown also inverts
    val encoded = Seq[(String, DataFrame => DataFrame)](
      "pd_us" -> (_.withColumn("ts", unix_micros(col("ts")))),
      "pd_ms" -> (_.withColumn("ts", unix_millis(col("ts")))),
      "pd_s" -> (_.withColumn("ts", col("ts").cast("long"))))
    encoded.foreach { case (name, mk) =>
      val filtered = graft.ops.FilterOps.timeWindowPushdown(
        loadEncoded(name)(mk), "2024-01-10 00:00:00", "2024-01-12 00:00:00")
      val stats = graft.tools.PlanAudit.scanStats(filtered.queryExecution.sparkPlan)
      assert(stats.nonEmpty, s"$name: no parquet scan found")
      assert(stats.head.nPushed >= 1,
        s"$name: ts BETWEEN did not push to the parquet reader: $stats")
      assert(filtered.count() == 7, name)
    }
  }

  test("int32 epoch-days encoding normalizes to midnight-UTC TimestampType") {
    // an unannotated day-granular producer: plain int32 day counts (the
    // annotated variant is the date32 test below)
    val got = roundTrip("i32days")(
      _.withColumn("ts", datediff(col("ts"), lit("1970-01-01")).cast("int")))
    val refDays = loaded("ntz")
      .select(col("event_id"),
        (unix_micros(to_date(col("ts")).cast("timestamp"))).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refDays)
    assert(got.values.forall(_ % 86400000000L == 0))
  }

  test("normalizeTs rejects an un-normalizable encoding loudly") {
    import spark.implicits._
    val bogus = Seq(("a", "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(bogus, "ts"))
    assert(e.getMessage.contains("unsupported physical encoding"))
  }

  test("streaming twin accepts an NTZ-encoded file source") {
    // readStream with an explicitly-NTZ schema reproduces the fragile
    // case: a parquet feed whose ts is not LTZ. The stream twins cast to
    // canonical TimestampType before unix_micros, so this must analyze
    // AND produce the same medians as the batch path over the same rows.
    val dir = Files.createTempDirectory("graft-portability-stream")
    dir.toFile.deleteOnExit()
    val src = Paths.get(getClass.getResource("/fixtures/events_ntz.parquet").toURI)
    Files.copy(src, dir.resolve("part-0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType),
      StructField("ts", TimestampNTZType)))
    val in = spark.readStream.schema(schema).parquet(dir.toString)
    val q = StreamOps.rollingMedianStream(in)
      .writeStream.format("memory").queryName("portability_med")
      .outputMode(OutputMode.Append).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("portability_med")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(got.length == 40)
    // batch reference: same per-key trailing-10 median over the canonical load
    val ref = loaded("ntz").select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getDouble(3)))
      .groupBy(_._1).flatMap { case (uid, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        sorted.indices.map { i =>
          val wnd = sorted.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
          val n = wnd.length
          val med = if (n % 2 == 1) wnd((n + 1) / 2 - 1)
                    else (wnd(n / 2 - 1) + wnd(n / 2)) / 2.0
          (uid, sorted(i)._2, med)
        }
      }.toSeq.sortBy(t => (t._1, t._2))
    assert(got.toSeq == ref)
  }
}
