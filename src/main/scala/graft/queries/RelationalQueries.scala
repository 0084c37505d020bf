package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{DedupOps, FilterOps}

/** SURVEY §2.2 projection/filter (P1-P8), §2.6 sort/limit/set (O1-O4),
  * §2.4 A3 upsert-dedup, §2.3 J3 seen-id anti-join, §2.9 T4 retention —
  * all over the `events` stand-in table.
  *
  * The synthetic duplicate-id column for the dedup family is
  * `event_id % 1000` (FIXTURES.md §3), giving ~1000 keys with duplicates at
  * every scale factor.
  */
object RelationalQueries extends QueryPack {

  /** Seconds-since-epoch, floored — Spark `cast(ts as long)`;
    * DuckDB `CAST(floor(extract(epoch FROM ts)) AS BIGINT)`. */
  private val EPOCH_SQL = "CAST(floor(extract(epoch FROM ts)) AS BIGINT)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- P1: project the last bar per key to a typed record ----------------
    // One partial-aggregatable max_by instead of a sort: at scale this is a
    // single shuffle with map-side combine, not a per-key sort.
    "project_last_bar" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id").as("ticker"))
        .agg(
          max(col("ts")).as("last_ts"),
          max_by(col("value"), col("ts")).cast("double").as("last_value"),
          max_by(col("event_id"), col("ts")).cast("int").as("last_event_id"))),

    // -- P2: metadata flatten + coercion (consumer.py:50-84) ---------------
    "metadata_coercion" -> ((s, dir) =>
      Tables.events(s, dir).select(
        col("event_id"),
        FilterOps.coerceString(col("event_type"), "unknown").as("type"),
        FilterOps.truncDoc(concat(col("event_type"), lit(":"), col("props"))).as("doc"),
        FilterOps.coerceDouble(regexp_extract(col("props"), "\"k\": (\\d+)", 1)).as("k_val"),
        FilterOps.coerceDouble(
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
          .as("value_clean"))),

    // -- P3: timestamp := publish_time when 0 (consumer.py:79-80) ----------
    "timestamp_coalesce" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          when(col("event_type") === "error", lit(0L))
            .otherwise(col("ts").cast("long")).as("timestamp"),
          col("ts").cast("long").as("publish_time"))
        .select(
          col("event_id"),
          FilterOps.coalesceTimestamp(col("timestamp"), col("publish_time"))
            .as("timestamp_fixed"))),

    // -- P4: conjunctive time-range predicate, pushed to the parquet scan
    //    for row-group pruning ---------------------------------------------
    "filter_time_window" -> ((s, dir) =>
      FilterOps.timeWindowPushdown(
        Tables.events(s, dir),
        "2024-01-10 00:00:00", "2024-01-20 00:00:00")),

    // -- P5: + optional key equality ---------------------------------------
    "filter_ticker_eq" -> ((s, dir) =>
      FilterOps.tickerEq(
        FilterOps.timeWindowPushdown(
          Tables.events(s, dir),
          "2024-01-10 00:00:00", "2024-01-20 00:00:00"),
        col("user_id"), 7L)),

    // -- P6: latest row for one (key, type) — sidebar k=1 lookup -----------
    "filter_latest_metric" -> ((s, dir) =>
      FilterOps.latestMetric(
        Tables.events(s, dir), col("user_id"), col("event_type"),
        3L, "purchase", col("ts"), col("event_id"))),

    // -- P7: retention delete (30d TTL analog; 15d to bite in 30d data) ----
    "retention_delete" -> ((s, dir) =>
      FilterOps.retentionDelete(
        Tables.events(s, dir), col("event_type"), "view", col("ts"), 15)),

    // -- P8: drop rows whose coerced numeric is null (main.py:110) ---------
    "dropna_ohlc" -> ((s, dir) =>
      // Filter FIRST, in source-translatable form: the natural spelling
      // (CASE WHEN type='error' THEN null ELSE value, then na.drop) hides
      // the predicate inside an untranslatable CASE, so nothing reaches
      // the parquet reader. Its kept-row set is exactly
      // type <> 'error' AND value IS NOT NULL — both push down as
      // Not(EqualTo) / IsNotNull and prune row groups at scale
      // (PlanAudit asserts this scan pushes).
      Tables.events(s, dir)
        .filter(col("event_type") =!= "error" && col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("value").as("value_clean"))),

    // -- O1: sort by date (driver compare is set-based; this exercises the
    //        plan: a range-partitioned global sort) ------------------------
    "sort_by_date" -> ((s, dir) =>
      graft.ops.MarketOps.dailyBars(Tables.events(s, dir)).orderBy("ticker", "date")),

    // -- O2: top-n head via TakeOrderedAndProject --------------------------
    "limit_head_n" -> ((s, dir) =>
      Tables.events(s, dir)
        .orderBy(col("ts").desc, col("event_id").desc).limit(20)),

    // -- O3: stream-union of topic subsets with missing columns ------------
    "union_topics" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "event_type", "value")
      val signups = ev.filter(col("event_type") === "signup")
        .select("event_id", "user_id", "ts", "event_type")
      purchases.unionByName(signups, allowMissingColumns = true)
    }),

    // -- anti-entropy table digest: order-free per-shard content checksum --
    // The replica-reconciliation primitive behind join_full_outer's row
    // audit: two copies of a 100 TB table compare per-shard digests first
    // and row-diff only the shards that disagree. Digest = bit_xor of a
    // canonical per-row hash — XOR is commutative/associative, so the
    // digest is independent of row order, partitioning, AND engine
    // aggregation order (no decimal machinery needed); the row hash is
    // the shared polynomial hash over a field concatenation with an
    // explicit separator (no ambiguity between ("ab","c")/("a","bc")).
    // One scan + a keyed agg whose shuffle carries one (shard, digest)
    // partial per map task. ------------------------------------------------
    "table_checksum" -> ((s, dir) => {
      val rowHash = graft.ops.TextOps.polyHash(
        concat_ws("|", col("doc_id"), col("lang"), col("source"), col("text")))
      Tables.documents(s, dir)
        .select(col("source"), rowHash.as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("digest"))
    }),

    // -- O4: retrieval dedup keep-first by score (rag_engine.py:230-239) ---
    "distinct_dedup_hash" -> ((s, dir) =>
      DedupOps.keepFirst(
        Tables.events(s, dir)
          .withColumn("ts_int", col("ts").cast("long")),
        keys = Seq(col("user_id"), col("ts_int"), col("event_type")),
        order = Seq(col("value").desc, col("event_id")))
        .select("event_id", "user_id", "ts_int", "event_type", "value")),

    // -- A3: upsert-by-id latest-wins (consumer.py:176-181) ----------------
    "dedup_latest_wins" -> ((s, dir) =>
      DedupOps.latestWins(
        Tables.events(s, dir).withColumn("id", col("event_id") % 1000),
        id = col("id"), order = Seq(col("ts").desc, col("event_id").desc))
        .select("id", "event_id", "user_id", "ts", "value")),

    // -- J3: seen-id anti-join = keep first occurrence (producer.py:98-100)
    "dedup_antijoin_seen" -> ((s, dir) =>
      DedupOps.keepFirst(
        Tables.events(s, dir).withColumn("id", col("event_id") % 1000),
        keys = Seq(col("id")), order = Seq(col("ts"), col("event_id")))
        .select("id", "event_id", "user_id", "ts", "value")),

    // -- T4 batch oracle: 30-day TTL on one type (consumer.py:115-130) -----
    "retention_ttl" -> ((s, dir) =>
      FilterOps.retentionDelete(
        Tables.events(s, dir), col("event_type"), "click", col("ts"), 20)),

    // -- T2 batch oracle: streaming dedup state = first occurrence per id
    //    (the watermarked dropDuplicates semantic; streaming form covered
    //    by StreamingSpec) ------------------------------------------------
    "stream_dedup_state" -> ((s, dir) =>
      DedupOps.keepFirst(
        Tables.events(s, dir).withColumn("id", col("event_id") % 500),
        keys = Seq(col("id")), order = Seq(col("ts"), col("event_id")))
        .select("id", "event_id", "user_id", "ts", "value")),

    // -- native set ops (SURVEY §2.6 "absent: intersect/except") -----------
    "set_intersect" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .intersect(ev.filter(col("event_type") === "error").select("user_id"))
    }),

    "set_except" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.filter(col("event_type") === "purchase").select("user_id")
        .except(ev.filter(col("event_type") === "signup").select("user_id"))
    }),

    // -- §2.10 generator analog: fan-out one row per token (posexplode) ----
    "explode_fanout" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("token"))),

    // -- §2.5 window natives absent in reference: rank/dense_rank/ntile/
    //    first_value over a deterministic total order (value, event_id
    //    tiebreak — rank functions are only oracle-stable under a total
    //    order). One partition-wide shuffle on event_type, then all four
    //    functions evaluate in a single Window exec pass. --------------
    "window_rank_funcs" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, dir).select(
        col("event_id"), col("event_type"), col("value"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        first(col("value")).over(w).as("min_value_so_far"))
    }),

    // -- §7 superset: session windows (1 h inactivity gap) -----------------
    "session_window_agg" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
        .agg(count(lit(1)).as("n"), graft.ops.Num.dsum(col("value")).as("sum_value"))
        .select(
          col("session_window.start").as("session_start"),
          col("user_id"), col("n"), col("sum_value"))),

    // -- native: pivot — per-user event_type sums as wide columns ----------
    // The EXPLICIT value list matters at scale: without it Spark runs an
    // extra distinct pass over the fact table just to discover the column
    // set. With the dictionary pinned, the plan is one partial-aggregatable
    // groupBy. Decimal accumulation keeps the sums bit-stable cross-engine.
    "pivot_event_values" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(graft.ops.Num.dsum(col("value")))),

    // -- native: unpivot/melt — wide OHLC bars back to (field, value) long
    //    form (the feature-store normalization step; narrow op, fan-out 4×,
    //    no shuffle beyond the bars aggregation) ---------------------------
    "unpivot_ohlc_melt" -> ((s, dir) =>
      graft.ops.MarketOps.dailyBars(Tables.events(s, dir))
        .select("ticker", "date", "open", "high", "low", "close")
        .unpivot(
          Array(col("ticker"), col("date")),
          Array(col("open"), col("high"), col("low"), col("close")),
          "field", "value")),

    // -- native: ordered-sequence aggregation ------------------------------
    // The build-the-training-sequence op: per user, the event-type sequence
    // in event-time order. collect_list order is partition-dependent, so
    // the list is built as structs and sort_array'd on the (ts, event_id)
    // total order — deterministic at any parallelism. Emitted as a joined
    // string because the driver's compare can't hash array cells.
    "sequence_per_user" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              st => st.getField("event_type")),
            ",").as("event_seq"),
          count(lit(1)).cast("long").as("seq_len"))),

    // -- native: reproducible systematic sampling --------------------------
    // Hash-mod sampling is the reproducible-training-subset pattern: the
    // SAME rows are selected at any parallelism and in any engine, unlike
    // Bernoulli sample() whose RNG stream is engine- and partition-
    // dependent. The predicate pushes to the scan like any filter.
    "sample_hash_mod" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(pmod(col("event_id"), lit(20)) === 3)
        .select("event_id", "user_id", "event_type", "value"))
  )

  def oracleSql: Map[String, String] = Map(
    "project_last_bar" ->
      """SELECT user_id AS ticker, max(ts) AS last_ts,
        |       arg_max(value, ts) AS last_value,
        |       CAST(arg_max(event_id, ts) AS INTEGER) AS last_event_id
        |FROM events GROUP BY 1""".stripMargin,

    "metadata_coercion" ->
      """SELECT event_id,
        |       coalesce(event_type, 'unknown') AS type,
        |       substring(event_type || ':' || props, 1, 150) AS doc,
        |       coalesce(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS DOUBLE), 0.0) AS k_val,
        |       coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 0.0) AS value_clean
        |FROM events""".stripMargin,

    "timestamp_coalesce" ->
      s"""SELECT event_id,
         |       CASE WHEN (CASE WHEN event_type = 'error' THEN 0 ELSE $EPOCH_SQL END) = 0
         |                  AND $EPOCH_SQL > 0
         |            THEN $EPOCH_SQL
         |            ELSE (CASE WHEN event_type = 'error' THEN 0 ELSE $EPOCH_SQL END)
         |       END AS timestamp_fixed
         |FROM events""".stripMargin,

    "filter_time_window" ->
      """SELECT * FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,

    "filter_ticker_eq" ->
      """SELECT * FROM events
        |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
        |  AND user_id = 7""".stripMargin,

    "filter_latest_metric" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
        |  SELECT *, row_number() OVER (ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id = 3 AND event_type = 'purchase'
        |) WHERE rn = 1""".stripMargin,

    "retention_delete" ->
      s"""WITH c AS (SELECT CAST(floor(extract(epoch FROM max(ts))) AS BIGINT) - 15*86400 AS cutoff_sec FROM events)
         |SELECT events.* FROM events, c
         |WHERE NOT (event_type = 'view' AND $EPOCH_SQL < c.cutoff_sec)""".stripMargin,

    "dropna_ohlc" ->
      """SELECT event_id, user_id, value AS value_clean
        |FROM events WHERE event_type <> 'error' AND value IS NOT NULL""".stripMargin,

    "sort_by_date" ->
      """SELECT user_id AS ticker, CAST(ts AS DATE) AS date,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*) AS volume
        |FROM events GROUP BY 1, 2 ORDER BY ticker, date""".stripMargin,

    "limit_head_n" ->
      "SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 20",

    "union_topics" ->
      """SELECT event_id, user_id, ts, event_type, value
        |FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT event_id, user_id, ts, event_type, NULL AS value
        |FROM events WHERE event_type = 'signup'""".stripMargin,

    "table_checksum" -> {
      val rowSql = "CAST(doc_id AS VARCHAR) || '|' || lang || '|' || source || '|' || text"
      val polySql =
        s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split($rowSql, ''), c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * 31 + c) % ${graft.ops.TextOps.P})"
      s"""SELECT source, count(*) AS n_rows, bit_xor($polySql) AS digest
         |FROM documents
         |GROUP BY source""".stripMargin
    },

    "distinct_dedup_hash" ->
      s"""SELECT event_id, user_id, ts_int, event_type, value FROM (
         |  SELECT event_id, user_id, $EPOCH_SQL AS ts_int, event_type, value,
         |         row_number() OVER (PARTITION BY user_id, $EPOCH_SQL, event_type
         |                            ORDER BY value DESC, event_id) AS rn
         |  FROM events
         |) WHERE rn = 1""".stripMargin,

    "dedup_latest_wins" ->
      """SELECT id, event_id, user_id, ts, value FROM (
        |  SELECT event_id % 1000 AS id, event_id, user_id, ts, value,
        |         row_number() OVER (PARTITION BY event_id % 1000 ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "dedup_antijoin_seen" ->
      """SELECT id, event_id, user_id, ts, value FROM (
        |  SELECT event_id % 1000 AS id, event_id, user_id, ts, value,
        |         row_number() OVER (PARTITION BY event_id % 1000 ORDER BY ts, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "retention_ttl" ->
      s"""WITH c AS (SELECT CAST(floor(extract(epoch FROM max(ts))) AS BIGINT) - 20*86400 AS cutoff_sec FROM events)
         |SELECT events.* FROM events, c
         |WHERE NOT (event_type = 'click' AND $EPOCH_SQL < c.cutoff_sec)""".stripMargin,

    "stream_dedup_state" ->
      """SELECT id, event_id, user_id, ts, value FROM (
        |  SELECT event_id % 500 AS id, event_id, user_id, ts, value,
        |         row_number() OVER (PARTITION BY event_id % 500 ORDER BY ts, event_id) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin,

    "set_except" ->
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'signup'""".stripMargin,

    "explode_fanout" ->
      """WITH e AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[CAST(i AS INTEGER)] AS token
        |FROM e""".stripMargin,

    "window_rank_funcs" ->
      """SELECT event_id, event_type, value,
        |       CAST(rank() OVER w AS INTEGER) AS rnk,
        |       CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |       first_value(value) OVER w AS min_value_so_far
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)""".stripMargin,

    // gaps-and-islands mirror of Spark's session_window: a new session
    // starts when the gap to the previous event is >= 1 h (Spark's session
    // end bound is exclusive)
    "session_window_agg" ->
      """WITH marks AS (
        |  SELECT user_id, ts, value, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 3600000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marks)
        |SELECT min(ts) AS session_start, user_id, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(27,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    "pivot_event_values" -> {
      val cols = Seq("click", "view", "purchase", "signup", "error").map { t =>
        s"CAST(sum(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(27,2)) END) AS DOUBLE) AS $t"
      }.mkString(",\n        |       ")
      s"""SELECT user_id,
         |       $cols
         |FROM events GROUP BY user_id""".stripMargin
    },

    "unpivot_ohlc_melt" ->
      """WITH bars AS (
        |  SELECT user_id AS ticker, CAST(ts AS DATE) AS date,
        |         arg_min(value, ts) AS open, max(value) AS high,
        |         min(value) AS low, arg_max(value, ts) AS close
        |  FROM events GROUP BY 1, 2)
        |SELECT ticker, date, 'open' AS field, open AS value FROM bars
        |UNION ALL SELECT ticker, date, 'high', high FROM bars
        |UNION ALL SELECT ticker, date, 'low', low FROM bars
        |UNION ALL SELECT ticker, date, 'close', close FROM bars""".stripMargin,

    "sample_hash_mod" ->
      """SELECT event_id, user_id, event_type, value
        |FROM events WHERE event_id % 20 = 3""".stripMargin,

    "sequence_per_user" ->
      """SELECT user_id,
        |       array_to_string(list(event_type ORDER BY ts, event_id), ',') AS event_seq,
        |       count(*) AS seq_len
        |FROM events GROUP BY user_id""".stripMargin
  )
}
