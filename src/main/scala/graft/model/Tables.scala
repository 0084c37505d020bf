package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * These tables stand in for the reference's inputs (see FIXTURES.md §3):
  * `events` replaces the Kafka topics / OHLCV bar stream (key = `user_id`,
  * event time = `ts`, price = `value`); `documents` / `embeddings` back the
  * document-pipeline superset operators; the TPC-H-ish tables back the
  * generic relational surface.
  *
  * All loads are plain parquet scans so Catalyst's filter pushdown and
  * column pruning reach the file readers — at 100 TB this is what turns a
  * full-table scan into a row-group-pruned, column-projected read.
  */
object Tables {
  /** Timestamp columns stored as parquet TIMESTAMP(NANOS) per table. Spark
    * has no nanosecond timestamp type, so we read them as longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds —
    * the same truncation DuckDB applies, keeping the oracle bit-aligned. */
  private val nanoTsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  /** One analyzed scan plan per (session, dir, table): `spark.read.parquet`
    * builds a fresh file index and re-reads footers for schema inference on
    * every call, which a 95-query batch pays 95 times over. Reusing the
    * resolved `DataFrame` shares the listed `FileIndex` inside its
    * `LogicalRelation` across all downstream plans. Keyed WEAKLY by session
    * so stopped test sessions (and their file indexes) stay collectable. */
  private val scanCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def cached(spark: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    val perSession = scanCache.synchronized {
      var m = scanCache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        scanCache.put(spark, m)
      }
      m
    }
    perSession.getOrElseUpdate((dir, key), build)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cached(spark, dir, name) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      nanoTsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
        if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
          df.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
        else df
      }
    }

  /** `events` with the raw nanosecond column kept as `ts_nanos`. Predicates
    * on the converted `ts` cannot reach the parquet scan (the conversion
    * expression blocks pushdown), so range filters should ALSO constrain
    * `ts_nanos` — that predicate pushes down and prunes row groups, which
    * is the difference between a pruned read and a full scan at 100 TB.
    * Callers drop `ts_nanos` after filtering. */
  def eventsWithRawTs(spark: SparkSession, dir: String): DataFrame =
    cached(spark, dir, "events-raw-ts") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/events.parquet")
        .withColumn("ts_nanos", org.apache.spark.sql.functions.col("ts"))
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
}
