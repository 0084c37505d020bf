package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** Feature-engineering / warehouse-modeling operators (round-5): the
  * steps between raw events and model features that the relational pack
  * doesn't cover —
  *
  *   - SCD2 validity intervals (each event becomes a version row valid
  *     [ts, next ts) — the slowly-changing-dimension build),
  *   - per-group z-score normalization (feature scaling with
  *     decimal-exact moments so both engines derive the identical
  *     mean/std),
  *   - per-group winsorization (p05/p95 outlier clipping, the robust-
  *     stats twin of normalization).
  *
  * Scale notes: SCD2 is one lead() window per key (shuffle by key, never
  * global); normalization reduces each group to ONE stats row joined
  * back broadcast; winsorize's exact percentiles are the stated
  * small-group path with approx_percentile as the 100 TB swap-in
  * (property-checked by percentile_approx_sketch). Float parity follows
  * [[graft.ops.Num]]: moments accumulate in decimals (order-insensitive
  * exact), every double expression is single-shot IEEE.
  */
object FeatureQueries extends QueryPack {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- SCD2 dimension build: per-key version rows with [valid_from,
    //    valid_to) ranges; the open (current) version has null valid_to.
    //    One lead() window per user — shuffle keyed by user_id, bounded
    //    frame, no global sort. (ts, event_id) is the deterministic
    //    version order. ----------------------------------------------------
    "scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"), col("ts").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
    }),

    // -- per-group z-score: mean/std from decimal-exact sums (value has
    //    2 decimals, its square 4 — both sums exact at any row count and
    //    any accumulation order), so the doubles both engines divide are
    //    bit-identical. Stats reduce to one row per event_type; the join
    //    back is a broadcast. Sample std (n-1), computed from the same
    //    closed form on both sides. ---------------------------------------
    "normalize_zscore" -> ((s, dir) => {
      val d2 = DecimalType(18, 2)
      val stats = events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(d2)).cast("double").as("sx"),
          sum(col("value").cast(d2) * col("value").cast(d2)).cast("double").as("sxx"))
        .select(col("event_type"),
          (col("sx") / col("n").cast("double")).as("mean"),
          sqrt((col("n").cast("double") * col("sxx") - col("sx") * col("sx")) /
            (col("n").cast("double") * (col("n").cast("double") - 1.0))).as("std"))
      events(s, dir)
        .join(broadcast(stats), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          ((col("value") - col("mean")) / col("std")).as("z"))
    }),

    // -- funnel conversion: how far each user progresses through the
    //    ordered view -> click -> purchase funnel, matched as a
    //    SUBSEQUENCE of the user's event-time-ordered history (other
    //    events may interleave). One shuffle per user; the per-user fold
    //    is an integer state machine over the ordered type array — the
    //    struct-sort makes collect_list's nondeterministic order
    //    irrelevant, same trick as sequence_per_user. -----------------------
    "funnel_conversion" -> ((s, dir) => {
      val stages = Seq("view", "click", "purchase")
      val target = array(stages.map(lit): _*)
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(collect_list(struct(col("ts"), col("event_id"), col("event_type"))).as("evs"))
        .select(col("user_id"),
          transform(array_sort(col("evs")), _.getField("event_type")).as("seq"))
        .select(col("user_id"),
          aggregate(col("seq"), lit(0),
            (acc, t) => when(acc < stages.length &&
              t === element_at(target, acc + 1), acc + 1).otherwise(acc))
            .cast("long").as("stages_matched"))
        .withColumn("converted", col("stages_matched") === stages.length)
    }),

    // -- rolling 7-day active users: the WAU curve. The SCALABLE form is
    //    fan-out, not a per-day range self-join: each (user, active day)
    //    row projects into the 7 window-end days it supports, then one
    //    distinct-count per window end. |user×day| × 7 rows shuffle once —
    //    at 100 TB the fan-out constant beats a day-keyed range join's
    //    skew (every day joins the whole week's users). Window ends are
    //    clipped to days that actually occur, so the tail carries no
    //    phantom partial windows. -----------------------------------------
    "active_users_rolling7" -> ((s, dir) => {
      val ud = events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val days = ud.select(col("day").as("w_day")).distinct()
      ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("w_day"))
        .join(days, "w_day")
        .groupBy(col("w_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
    }),

    // -- funnel latency: microseconds from each user's FIRST view to the
    //    first purchase at-or-after it. Two per-user min-reductions and
    //    one joined filter; the per-user first-view table scales with
    //    the user population, so its join is hint-free (AQE broadcasts
    //    it at fixture scale, key-shuffles it at 100 TB). The exact
    //    integer microsecond difference needs no float discipline at all.
    "funnel_time_to_convert" -> ((s, dir) => {
      val v = events(s, dir).filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      events(s, dir).filter(col("event_type") === "purchase")
        .join(v, "user_id")
        .filter(col("ts") >= col("first_view"))
        .groupBy(col("user_id"), col("first_view"))
        .agg(min(col("ts")).as("first_purchase"))
        .select(col("user_id"),
          (unix_micros(col("first_purchase")) - unix_micros(col("first_view")))
            .as("ttc_us"))
    }),

    // -- cohort retention: users grouped by first-active week, counted in
    //    each later week they return — the classic retention triangle.
    //    Two hash aggregations and one equi-join on user_id; every output
    //    column is an exact integer. ---------------------------------------
    "cohort_retention" -> ((s, dir) => {
      val week = floor(
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("double") / 7.0)
        .cast("long")
      val weeks = events(s, dir)
        .select(col("user_id"), week.as("week")).distinct()
      val cohort = weeks.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      weeks.join(cohort, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // -- decile bucketizing: ntile(10) per event_type over the total
    //    order (value, event_id) — the quantile feature-binning step.
    //    Deterministic because the order is total; exact integers out. ----
    "quantile_bucketize" -> ((s, dir) => {
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"),
          ntile(10).over(w).cast("long").as("decile"))
    }),

    // -- one-hot encoding: event_type to fixed indicator columns — the
    //    categorical-feature step. Pure map-side projection; the column
    //    set is the (small, known) category domain, never inferred by a
    //    driver-side collect. --------------------------------------------
    "one_hot_encode" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      types.foldLeft(
        events(s, dir).select(col("event_id"), col("event_type"))) {
        case (df, t) =>
          df.withColumn(s"is_$t", (col("event_type") === t).cast("long"))
      }
    }),

    // -- feature hashing (the hashing trick): tokens project into a fixed
    //    32-bucket count vector per document — unbounded vocabulary to
    //    bounded dimensionality with no fitted dictionary. Emitted sparse
    //    as (doc_id, bucket, cnt): map-side hash + one count aggregate;
    //    the dense assembly is a downstream reshape. ----------------------
    "feature_hashing" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("tok"))
        .select(col("doc_id"),
          pmod(graft.expressions.TextHash.polyHash(col("tok")), lit(32L)).as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // -- data-drift monitor: binned KL divergence of the value
    //    distribution between the reference half (first 15 days) and the
    //    current half, per event_type — the distribution-shift check a
    //    production pipeline runs before retraining. ONE aggregation
    //    produces all 20 Laplace-smoothed bin counts as pivot columns;
    //    the 10-term KL sum is a fixed left-assoc expression chain, so
    //    float order is identical cross-engine. -------------------------
    "monitor_drift_kl" -> ((s, dir) => {
      val bin = least(lit(9L), floor(col("value") / 50.0).cast("long"))
      val isRef = col("ts") < lit("2024-01-16").cast("timestamp")
      val aggs =
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref") +:
          (sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur") +:
            (0 until 10).flatMap(i => Seq(
              sum(when(col("is_ref") && col("bin") === i, 1L).otherwise(0L)).as(s"r$i"),
              sum(when(!col("is_ref") && col("bin") === i, 1L).otherwise(0L)).as(s"c$i"))))
      val counts = events(s, dir)
        .select(col("event_type"), bin.as("bin"), isRef.as("is_ref"))
        .groupBy(col("event_type"))
        .agg(aggs.head, aggs.tail: _*)
      def p(i: Int) =
        (col(s"r$i").cast("double") + 1.0) / (col("n_ref").cast("double") + 10.0)
      def q(i: Int) =
        (col(s"c$i").cast("double") + 1.0) / (col("n_cur").cast("double") + 10.0)
      val kl = (0 until 10).map(i => q(i) * log(q(i) / p(i))).reduce(_ + _)
      counts.select(col("event_type"), col("n_ref"), col("n_cur"),
        graft.ops.Num.r6(kl).as("kl"),
        (graft.ops.Num.r6(kl) > 0.05).as("drift"))
    }),

    // -- per-group Shannon entropy of the event-type mix — the class-
    //    balance health stat next to the KL drift monitor. The category
    //    domain is fixed, so the 5 probabilities pivot into columns and
    //    the entropy sum is a fixed left-assoc chain (cross-engine float
    //    order); empty categories contribute 0 via the p>0 guard. --------
    "stats_entropy" -> ((s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val aggList = count(lit(1)).as("n") +:
        types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"))
      val counts = events(s, dir)
        .groupBy(col("user_id"))
        .agg(aggList.head, aggList.tail: _*)
      def term(t: String) = {
        val p = col(s"n_$t").cast("double") / col("n").cast("double")
        when(col(s"n_$t") > 0, -p * log(p)).otherwise(lit(0.0))
      }
      counts.select(col("user_id"), col("n").as("n_events"),
        graft.ops.Num.r6(types.map(term).reduce(_ + _)).as("entropy"))
    }),

    // -- per-group winsorization: clip to [p05, p95] computed exactly per
    //    group (quantile_cont interpolation, identical in both engines —
    //    percentile_value proves the parity). Percentile rows broadcast
    //    back; the clip itself is a map-side least/greatest. --------------
    "winsorize_clip" -> ((s, dir) => {
      val pct = events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
      events(s, dir)
        .join(broadcast(pct), "event_type")
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("p05")), col("p95")).as("value_w"),
          (col("value") < col("p05") || col("value") > col("p95")).as("clipped"))
    })
  )

  private def polySql(s: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * 31 + c) % ${graft.ops.TextOps.P})"

  def oracleSql: Map[String, String] = Map(
    "quantile_bucketize" ->
      """SELECT event_id, event_type, value,
        |       CAST(ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS decile
        |FROM events""".stripMargin,

    "one_hot_encode" -> {
      val cols = Seq("click", "view", "purchase", "signup", "error")
        .map(t => s"CAST(event_type = '$t' AS BIGINT) AS is_$t").mkString(", ")
      s"SELECT event_id, event_type, $cols FROM events"
    },

    "feature_hashing" ->
      s"""SELECT doc_id, h % 32 AS bucket, count(*) AS cnt
         |FROM (SELECT doc_id, ${polySql("t")} AS h
         |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents))
         |GROUP BY doc_id, h % 32""".stripMargin,

    "scd2_intervals" ->
      """SELECT user_id, event_id, value, ts AS valid_from,
        |       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events""".stripMargin,

    "normalize_zscore" ->
      """WITH stats AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean,
        |         sqrt((CAST(count(*) AS DOUBLE) * CAST(CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |               - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE))
        |              / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) - 1.0))) AS std
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_id, e.event_type, value, (value - mean) / std AS z
        |FROM events e JOIN stats s ON e.event_type = s.event_type""".stripMargin,

    "funnel_conversion" ->
      """WITH seqs AS (
        |  SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id
        |), matched AS (
        |  -- accumulator rides as a VARCHAR stage counter ('0'..'3') because
        |  -- list_reduce's fold type must equal the element type
        |  SELECT user_id,
        |         CAST(list_reduce(['0'] || seq,
        |           (acc, t) -> CASE WHEN acc = '0' AND t = 'view' THEN '1'
        |                            WHEN acc = '1' AND t = 'click' THEN '2'
        |                            WHEN acc = '2' AND t = 'purchase' THEN '3'
        |                            ELSE acc END) AS BIGINT) AS stages_matched
        |  FROM seqs
        |)
        |SELECT user_id, stages_matched, stages_matched = 3 AS converted
        |FROM matched""".stripMargin,

    "active_users_rolling7" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), days AS (SELECT DISTINCT day FROM ud),
        |fan AS (
        |  SELECT user_id,
        |         CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
        |           CAST(day AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS DATE) AS w_day
        |  FROM ud
        |)
        |SELECT w_day, count(DISTINCT user_id) AS wau
        |FROM fan
        |WHERE w_day IN (SELECT day FROM days)
        |GROUP BY w_day""".stripMargin,

    "funnel_time_to_convert" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), p AS (
        |  SELECT e.user_id, v.first_view, min(e.ts) AS first_purchase
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
        |  GROUP BY e.user_id, v.first_view
        |)
        |SELECT user_id, epoch_us(first_purchase) - epoch_us(first_view) AS ttc_us
        |FROM p""".stripMargin,

    "cohort_retention" ->
      """WITH weeks AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) / 7.0) AS BIGINT) AS week
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id
        |)
        |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
        |       count(DISTINCT w.user_id) AS n_users
        |FROM weeks w JOIN cohort c USING (user_id)
        |GROUP BY c.cohort_week, w.week - c.cohort_week""".stripMargin,

    "monitor_drift_kl" -> {
      def cnt(ref: Boolean, i: Int) = {
        val side = if (ref) "ts < TIMESTAMP '2024-01-16'" else "ts >= TIMESTAMP '2024-01-16'"
        s"sum(CASE WHEN $side AND least(9, CAST(floor(value / 50.0) AS BIGINT)) = $i THEN 1 ELSE 0 END)"
      }
      def tot(ref: Boolean) = {
        val side = if (ref) "ts < TIMESTAMP '2024-01-16'" else "ts >= TIMESTAMP '2024-01-16'"
        s"sum(CASE WHEN $side THEN 1 ELSE 0 END)"
      }
      def pq(ref: Boolean, i: Int, nAlias: String) =
        s"((CAST(${if (ref) s"r$i" else s"c$i"} AS DOUBLE) + 1.0) / (CAST($nAlias AS DOUBLE) + 10.0))"
      val kl = (0 until 10)
        .map(i => s"${pq(false, i, "n_cur")} * ln(${pq(false, i, "n_cur")} / ${pq(true, i, "n_ref")})")
        .mkString(" + ")
      val binCols = (0 until 10)
        .map(i => s"${cnt(true, i)} AS r$i, ${cnt(false, i)} AS c$i").mkString(",\n       ")
      s"""WITH counts AS (
         |  SELECT event_type,
         |       CAST(${tot(true)} AS BIGINT) AS n_ref,
         |       CAST(${tot(false)} AS BIGINT) AS n_cur,
         |       $binCols
         |  FROM events GROUP BY event_type
         |)
         |SELECT event_type, n_ref, n_cur,
         |       ${graft.ops.Num.R6_SQL(kl)} AS kl,
         |       ${graft.ops.Num.R6_SQL(kl)} > 0.05 AS drift
         |FROM counts""".stripMargin
    },

    "stats_entropy" -> {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val cnts = types.map(t =>
        s"sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS n_$t").mkString(", ")
      def term(t: String) =
        s"CASE WHEN n_$t > 0 THEN -(CAST(n_$t AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(n_$t AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END"
      val h = types.map(term).mkString(" + ")
      s"""WITH counts AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n, $cnts
         |  FROM events GROUP BY user_id
         |)
         |SELECT user_id, n AS n_events, ${graft.ops.Num.R6_SQL(h)} AS entropy
         |FROM counts""".stripMargin
    },

    "winsorize_clip" ->
      """WITH pct AS (
        |  SELECT event_type,
        |         quantile_cont(value, 0.05) AS p05,
        |         quantile_cont(value, 0.95) AS p95
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_id, e.event_type, value,
        |       least(greatest(value, p05), p95) AS value_w,
        |       (value < p05 OR value > p95) AS clipped
        |FROM events e JOIN pct p ON e.event_type = p.event_type""".stripMargin
  )
}
