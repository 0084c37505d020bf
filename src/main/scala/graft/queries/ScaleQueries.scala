package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables
import graft.ops.TextOps

/** Scale-shape operators for the training-data-pipeline superset (round 3):
  * sequence packing, stratified splits, per-key heavy hitters, the binned
  * range join, and the bucketed co-located join.
  *
  * Each query is the shape that survives 100 TB, demonstrated at test SF:
  * packing and splitting are single-shuffle window plans partitioned by
  * shard/stratum; heavy hitters ride the fused partial top-k; the range
  * join turns a theta predicate into an equi-join on time bins; the
  * bucketed join eliminates the join shuffle entirely via storage layout.
  */
object ScaleQueries extends QueryPack {

  /** Context length (tokens) for greedy sequence packing. */
  private[graft] val CTX = 512L

  /** Packing/split shards: enough for parallelism at test SF; at real
    * scale this is O(cluster cores) and the plan shape is unchanged. */
  private[graft] val SHARDS = 8L

  /** Time-bin width for the binned range join: 1 h in microseconds.
    * Chosen ~ interval length so each interval explodes into O(1) bins —
    * the knob that trades replication against residual-filter work. */
  private val BIN_US = 3600000000L

  /** Interval length for the synthetic interval table: 6 h. */
  private val IVL_US = 21600000000L

  private def revenue: org.apache.spark.sql.Column =
    sum(col("l_extendedprice").cast(DecimalType(9, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(3, 2))).cast("double")

  private val REV_SQL =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE)"

  /** Bucketed staging tables are per-SF (table name carries the SF tag) so
    * a Bench run at sf0.1 can't poison a Verify run at sf0.01. A session
    * whose catalog doesn't know the table yet rewrites it — the in-memory
    * catalog forgets across sessions, and an overwrite of already-correct
    * files is idempotent. */
  private def sfTag(dir: String): String =
    dir.split('/').last.replaceAll("[^A-Za-z0-9]", "_")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- greedy sequence packing: docs -> fixed-size training windows ------
    // The standard concat-and-chunk LLM batching layout: per shard, docs
    // are concatenated in a deterministic order and every CTX tokens
    // starts a new sequence; a doc's placement is a pure function of the
    // running token count before it. One window partitioned by shard =
    // one shuffle, embarrassingly parallel across shards; no collect, no
    // driver state. (First-fit bin packing needs global state per bin;
    // sequential packing is what large pipelines actually run because it
    // streams.)
    "pack_sequences_greedy" -> ((s, dir) => {
      val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("doc_id"), (col("doc_id") % SHARDS).as("shard"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          expr(s"cum_before div $CTX").as("seq_idx"),
          (col("cum_before") % CTX).as("offset"))
    }),

    // -- exact stratified train/valid/test split ---------------------------
    // Deterministic hash-rank within each stratum, then exact 80/10/10 by
    // rank: unlike mod-hash assignment the per-stratum proportions are
    // exact at any stratum size. One shuffle (partition by stratum);
    // integer arithmetic end-to-end so the oracle hash-matches.
    "split_stratified_hash" -> ((s, dir) => {
      val h = TextOps.sampleKey(col("doc_id"))
      val byLang = Window.partitionBy(col("lang"))
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(byLang.orderBy(h, col("doc_id"))))
        .withColumn("n", count(lit(1)).over(byLang))
        .withColumn("split",
          when(col("rn") * 10 <= col("n") * 8, lit("train"))
            .when(col("rn") * 10 <= col("n") * 9, lit("valid"))
            .otherwise(lit("test")))
        .select(col("doc_id"), col("lang"), col("split"))
    }),

    // -- per-key heavy hitters: top-5 users by event count per type --------
    // Partial-aggregated counts then the fused per-partition top-k heap
    // (VectorOps.topKPerQuery) — no single-reducer-per-key window, so a
    // 100 TB key with millions of users still merges k-sized heaps.
    "heavy_hitters_topk" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      graft.ops.VectorOps.topKPerQuery(
        counts, col("event_type"), Seq(col("cnt").desc, col("user_id")), k = 5)
        .select("event_type", "user_id", "cnt")
    }),

    // -- binned range join: point-in-interval as an EQUI-join --------------
    // The theta form (`ts BETWEEN start AND end`) only executes as a
    // broadcast nested loop — a dead end when both sides are large. The
    // scale shape: every event has exactly ONE time bin, every interval
    // explodes into the O(len/width) bins it covers, and the join becomes
    // an equi-join on bin + a residual range filter. No pair-dedup is
    // needed because an (event, interval) pair can only meet in the
    // event's single bin. Replication factor = interval_len/bin_width + 1
    // (here 7), the standard Flink/Trino interval-join decomposition.
    "join_range_binned" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("value"), unix_micros(col("ts")).as("ts_us"))
      val iv = ev.filter(col("event_id") % 997 === 0)
        .select(col("event_id").as("interval_id"), col("ts_us").as("start_us"),
          (col("ts_us") + IVL_US).as("end_us"))
      val ivBins = iv.withColumn("bin",
        explode(expr(s"sequence(start_us div $BIN_US, end_us div $BIN_US)")))
      ev.withColumn("bin", expr(s"ts_us div $BIN_US"))
        .join(ivBins, "bin")
        .filter(col("ts_us").between(col("start_us"), col("end_us")))
        .select(col("interval_id"), col("event_id"), col("value"))
    }),

    // -- bucketed co-located join: the layout that deletes the shuffle -----
    // Both join sides are staged as parquet tables bucketed (and sorted)
    // by the join key with the same bucket count, so the sort-merge join
    // reads co-located buckets directly — zero Exchange on either side
    // (ScaleQueriesSpec asserts it). At 100 TB this converts every
    // recurring fact-fact join on the bucket key from a full-data shuffle
    // into a local merge; the one-time bucketing cost amortizes across
    // every downstream join/aggregation on that key. The merge hints pin
    // SMJ so the demonstration doesn't degrade to a broadcast at test SF.
    "join_bucketed_colocated" -> ((s, dir) => {
      val tag = sfTag(dir)
      val tOrders = s"graft_bkt_orders_$tag"
      val tItems = s"graft_bkt_lineitem_$tag"
      // Staging semantics mirror the CSV/partitioned-store fixtures: the
      // bucketed files live OUTSIDE the session (external location, per
      // SF) with a _SUCCESS marker invalidated when the source parquet is
      // newer. A fresh session whose catalog has forgotten the table
      // re-ATTACHES the existing files via DDL (CLUSTERED BY … INTO 8
      // BUCKETS LOCATION …) instead of rewriting them — which is exactly
      // the production story: bucket once, reuse across every job.
      def stage(t: String, srcTable: String, key: String)(build: => DataFrame): Unit = {
        if (s.catalog.tableExists(t)) return
        val loc = new java.io.File(s"/tmp/graft_bucketed/$tag/$t")
        val src = new java.io.File(s"$dir/$srcTable.parquet")
        val srcMtime = Option(src.listFiles())
          .map(_.map(_.lastModified()).foldLeft(src.lastModified())(math.max))
          .getOrElse(src.lastModified())
        val marker = new java.io.File(loc, "_SUCCESS")
        if (marker.exists() && marker.lastModified() >= srcMtime) {
          s.sql(s"CREATE TABLE $t (${build.schema.toDDL}) USING PARQUET " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO 8 BUCKETS " +
            s"LOCATION '${loc.getAbsolutePath}'")
        } else {
          // repartition(8, key) uses the SAME hash-pmod placement as
          // bucketBy's bucket assignment, so each of the 8 parallel write
          // tasks holds exactly one bucket's rows → one file per bucket
          // (the layout that keeps the sorted-bucket metadata valid)
          // WITHOUT funneling the write through a single task.
          val fs = new org.apache.hadoop.fs.Path(loc.getAbsolutePath)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(loc.getAbsolutePath), true)
          build.repartition(8, col(key))
            .write.bucketBy(8, key).sortBy(key)
            .format("parquet").mode("overwrite")
            .option("path", loc.getAbsolutePath).saveAsTable(t)
        }
      }
      stage(tOrders, "orders", "o_orderkey") {
        Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
      }
      stage(tItems, "lineitem", "l_orderkey") {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      }
      s.table(tItems).hint("merge")
        .join(s.table(tOrders).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), revenue.as("revenue"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "pack_sequences_greedy" ->
      s"""SELECT doc_id, shard, n_tokens,
         |       cum_before // $CTX AS seq_idx, cum_before % $CTX AS offset
         |FROM (
         |  SELECT doc_id, doc_id % $SHARDS AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |         CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
         |           PARTITION BY doc_id % $SHARDS ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |           AS cum_before
         |  FROM documents)""".stripMargin,

    "split_stratified_hash" ->
      """SELECT doc_id, lang,
        |       CASE WHEN rn * 10 <= n * 8 THEN 'train'
        |            WHEN rn * 10 <= n * 9 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY ((doc_id % 1000000007) * (2654435761 % 1000000007)) % 1000000007, doc_id) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)""".stripMargin,

    "heavy_hitters_topk" ->
      """SELECT event_type, user_id, cnt FROM (
        |  SELECT event_type, user_id, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY count(*) DESC, user_id) AS rn
        |  FROM events GROUP BY event_type, user_id
        |) WHERE rn <= 5""".stripMargin,

    "join_range_binned" ->
      s"""WITH iv AS (
         |  SELECT event_id AS interval_id, epoch_us(ts) AS start_us,
         |         epoch_us(ts) + $IVL_US AS end_us
         |  FROM events WHERE event_id % 997 = 0
         |)
         |SELECT iv.interval_id, e.event_id, e.value
         |FROM events e JOIN iv
         |  ON epoch_us(e.ts) BETWEEN iv.start_us AND iv.end_us""".stripMargin,

    "join_bucketed_colocated" ->
      s"""SELECT o_orderpriority, count(*) AS n, $REV_SQL AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority""".stripMargin
  )
}
