package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

/** Executes the Kafka serialization contract as far as the sandbox
  * allows (r10 verdict item 4): no broker exists here, so a file-backed
  * stream is the topic surrogate — but the ENCODE and DECODE projections
  * are the exact code the broker sink/source ship
  * ([[StreamOps.encodeMessages]] is `kafkaSink`'s projection,
  * [[StreamOps.decodeTopic]] is `kafkaSource`'s with the per-topic
  * schema), so what this proves is the part a broker cannot change: the
  * to_json/from_json round-trip of every topic's FULL value schema, the
  * ticker key, and the defensive-null decode of variant fields.
  *
  * One test per topic in [[StreamOps.topicSchemas]]: representative
  * messages (field shapes cited to the reference producer in
  * FIXTURES.md §1) encode producer-style, land as a JSON file, stream
  * back through `readStream` + the topic decode, and must equal the
  * input bit-exactly — including null round-trips (JSON omits nulls;
  * the decode must restore them) and double fidelity (Jackson's
  * shortest-roundtrip rendering must reproduce the exact IEEE value).
  */
class TopicRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private def canon(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      .toJSON.collect().sorted.toSeq

  /** Representative messages per topic — every field exercised, plus a
    * row with the nullable/variant fields null. */
  private def fixture(topic: String): Seq[Row] = topic match {
    case "financial-news" => Seq(
      // news variant (producer.py:106-117): technical fields null
      Row("MC.PA", "LVMH beats estimates", "Google News",
        "https://example.invalid/a", "Quarterly revenue up", null,
        1745379000L, "news", "google_rss", null, null, "h_1a2b",
        null, null, null, null, null),
      // technical variant (producer.py:316-332): publisher/link null
      Row("TTE.PA", "Technical Analysis TTE.PA (bullish)", null, null,
        "MA crossover", "content body", 1745379060L, "technical",
        "system_metrics", "REGULAR", "EUR", "LATEST_TECH_TTE.PA",
        52.3299999999998, 51.875, 50.0000001, 49.125, 1745379055L))
    case "stock-history" => Seq(
      Row("MC.PA", "2025-04-23 00:00:00+02:00",
        612.3000000000001, 618.9, 608.05, 615.1, 123456789L),
      // defensive decode: a sparse bar (missing OHLC fields) nulls out
      Row("OR.PA", "2025-04-24 00:00:00+02:00",
        null, null, null, 402.15, 0L))
    case "hot-news-events" => Seq(
      Row("RMS.PA", "Intraday metrics RMS.PA", "summary txt", "content txt",
        null, "intraday_metrics", "system_metrics", "LATEST_METRICS_RMS.PA",
        1745379120L, 2345.5, 2331.0, 2340.0, 2329.999999,
        2333.25, 2338.5, 2344.0, 2344.75, 1745379119L, "EUR", "REGULAR"),
      // the reference's 0.0-when-missing defaults (producer.py:243-269)
      Row("SAN.PA", "Intraday metrics SAN.PA", null, null, null,
        "intraday_metrics", "system_metrics", "LATEST_METRICS_SAN.PA",
        1745379180L, 96.41, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        1745379179L, "EUR", "N/C"))
    case "daily-summary" => Seq(
      Row("SAF.PA", "Daily Summary SAF.PA", null, "daily_summary",
        "system_summary", "DAILY_SUMMARY_SAF.PA_1745379600", 1745379600L,
        "- Open: 210.40\n- Close: 212.80", "- Variation: 1.14%\n- Volume: 88 - Low/High"),
      Row("AI.PA", "Daily Summary AI.PA", "https://example.invalid/b",
        "daily_summary", "backfill", "DAILY_SUMMARY_AI.PA_1745293200",
        1745293200L, null, null))
    case other => fail(s"no fixture for topic $other")
  }

  StreamOps.topicSchemas.keys.toSeq.sorted.foreach { topic =>
    test(s"$topic: producer encode -> file stream -> topic decode is bit-exact") {
      val schema = StreamOps.topicSchemas(topic)
      val rows = fixture(topic)
      assert(rows.head.size == schema.size,
        s"fixture arity ${rows.head.size} != schema arity ${schema.size}")
      val in = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(rows).asJava), schema)

      // producer side: the exact kafkaSink projection, plus the broker's
      // ingest timestamp the consumer-side decode expects
      val wire = StreamOps.encodeMessages(in)
        .withColumn("timestamp", lit("2026-01-02T03:04:05Z").cast("timestamp"))
      val dir = Files.createTempDirectory(s"graft_topic_$topic").toString
      Files.write(Paths.get(dir, "wire.json"),
        wire.toJSON.collect().mkString("\n").getBytes("UTF-8"))

      // consumer side: streaming read of the surrogate, topic decode
      val raw = spark.readStream
        .schema("key STRING, value STRING, timestamp TIMESTAMP")
        .json(dir)
      val sinkName = s"topic_rt_${topic.replace('-', '_')}"
      val q = StreamOps.decodeTopic(raw, topic)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val decoded = spark.table(sinkName)

      val fields = schema.fieldNames.toIndexedSeq.map(col)
      assert(canon(decoded.select(fields: _*)) == canon(in.select(fields: _*)),
        s"$topic: decoded payload diverges from the produced messages")
      // the topic key contract: key = ticker, for every message
      assert(decoded.filter(col("kafka_key") =!= col("ticker")).isEmpty,
        s"$topic: kafka key must be the ticker")
      assert(decoded.filter(col("ingest_ts").isNull).isEmpty,
        s"$topic: the broker timestamp column must survive the surrogate")
    }
  }
}
