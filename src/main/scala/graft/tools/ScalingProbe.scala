package graft.tools

import org.apache.spark.sql.SparkSession

/** Scaling-curve probe (dev tool, not part of the driver contract): runs
  * the historically slowest registry queries at two scale factors and
  * checks that wall time grows no worse than ~linearly in the size of the
  * query's driving table. A query whose time ratio exceeds the data ratio
  * by more than SLACK is flagged SUPERLINEAR — the early-warning signal
  * for the next corpus_curation_pipeline-style blowup (that one went
  * quadratic silently and cost a full round to find).
  *
  * Method: per query, one untimed warm pass at the SMALL sf (codegen +
  * JIT), then `reps` timed runs at each sf keeping the MINIMUM (the
  * stable-floor estimator — min is far less noisy than mean under GC /
  * scheduling jitter at these sub-second magnitudes). Queries faster than
  * MIN_SECS at the big sf are reported but never flagged: at that
  * magnitude task-launch overhead dominates and a ratio is meaningless.
  *
  * Usage: runMain graft.tools.ScalingProbe [smallDir bigDir [q1,q2,...]]
  */
object ScalingProbe {

  /** The r8 warm-median top-cost queries, each with the table whose
    * cardinality drives its cost — the probe computes the actual row
    * ratio per driving table (embeddings historically scaled 4× where
    * documents/events scaled 10×; one global ratio would mis-flag every
    * vector query). */
  private val DefaultQueries: Seq[(String, String)] = Seq(
    "dedup_cluster_cc" -> "documents",
    "kmeans_lloyd_train" -> "embeddings",
    "lsh_recall_eval" -> "documents",
    "bpe_encode" -> "documents",
    "embedding_pca_project" -> "embeddings",
    "embedding_pca_2d" -> "embeddings",
    "graph_kcore" -> "documents",
    "phrase_merges_bpe" -> "documents",
    "pagerank_canonical" -> "documents",
    "join_skew_aqe" -> "lineitem",
    "corpus_curation_pipeline" -> "documents",
    "ann_serve_from_store" -> "embeddings",
    "ann_ivf_pq_search" -> "embeddings",
    "dedup_containment" -> "documents",
    "mining_pipeline" -> "documents",
    "dedup_fuzzy_editdist" -> "documents",
    "dedup_minhash_lsh" -> "documents",
    "knn_join_lsh" -> "embeddings",
    "text_tfidf_top_terms" -> "documents",
    "quality_lm_score" -> "documents")

  /** Headroom over perfectly-linear before a query is called superlinear:
    * covers constant per-stage overhead amortizing differently across SFs
    * and the known ±20% run-to-run variance. */
  private val SLACK = 1.6

  /** Below this wall time at the big SF, scheduling noise > signal. */
  private val MIN_SECS = 0.5

  /** Driving-table mapping for CLI-named queries OUTSIDE the default
    * set — kept even for queries rotated out of DefaultQueries, so an ad
    * hoc probe still computes its linearity headroom against the right
    * row ratio instead of silently assuming documents. */
  private val ExtraTables: Map[String, String] = Map(
    "profile_columns" -> "events",
    "join_bloom_runtime" -> "lineitem",
    "join_skew_salted" -> "lineitem",
    "chunk_sliding_window" -> "documents",
    "dedup_shingle_jaccard" -> "documents",
    "stats_chi2_independence" -> "events",
    "stats_ks_test" -> "events",
    "asof_join_forward" -> "events",
    "asof_join_native" -> "events",
    "filter_time_window" -> "events",
    "filter_ticker_eq" -> "events",
    "series_downsample_m4" -> "events",
    "ann_pq_codes" -> "embeddings",
    "ann_recall_at_k" -> "embeddings",
    "tpch_q10_returns" -> "lineitem",
    "tpch_q19_brackets" -> "lineitem",
    "tpch_q22_untapped" -> "customer",
    "tpch_q4_priority" -> "lineitem",
    "tpch_q12_latemix" -> "lineitem",
    "tpch_q13_custdist" -> "orders",
    "mix_temperature_sample" -> "documents",
    "tpch_q17_smallqty" -> "lineitem",
    "tpch_q21_waiting" -> "lineitem",
    "tpch_q2_mincost" -> "lineitem",
    "tpch_q7_volume" -> "lineitem",
    "tpch_q15_topsupp" -> "lineitem",
    "tpch_q8_marketshare" -> "lineitem",
    "tpch_q9_profit" -> "lineitem",
    "tpch_q11_important" -> "lineitem",
    "tpch_q16_suppcnt" -> "lineitem",
    "tpch_q20_excess" -> "lineitem")

  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val big = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val tableOf = DefaultQueries.toMap ++ ExtraTables
    val queries: Seq[(String, String)] =
      if (args.length > 2)
        args(2).split(",").toSeq.map { q =>
          val t = tableOf.getOrElse(q, {
            System.err.println(
              s"[probe] WARNING: no driving-table mapping for '$q'; assuming documents")
            "documents"
          })
          q -> t
        }
      else DefaultQueries
    val reps = 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def release(): Unit = graft.ops.SessionOps.dropCachedBlocks(spark)

    def rows(dir: String, table: String): Long =
      graft.model.Tables.load(spark, dir, table).count()

    def time(q: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(q)
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        release()
        secs
      }.min
    }

    val sizeRatio: Map[String, Double] =
      queries.map(_._2).distinct.map { t =>
        t -> rows(big, t).toDouble / rows(small, t).toDouble
      }.toMap

    println(f"${"query"}%-24s ${"t_small"}%8s ${"t_big"}%8s ${"t_ratio"}%8s ${"d_ratio"}%8s  verdict")
    var flagged = List.empty[String]
    queries.foreach { case (q, table) =>
      try {
        graft.SparkEntry.queries(q)(spark, small.replaceAll("sf[0-9.]+/?$", "sf0.001")).count()
        release()
        val ts = time(q, small)
        val tb = time(q, big)
        val tr = tb / ts
        val dr = sizeRatio(table)
        val verdict =
          if (tb < MIN_SECS) "ok (below noise floor)"
          else if (tr > SLACK * dr) { flagged ::= q; "SUPERLINEAR" }
          else "ok"
        println(f"$q%-24s $ts%8.2f $tb%8.2f $tr%8.2f $dr%8.1f  $verdict")
      } catch {
        case e: Throwable => println(f"$q%-24s ERROR ${e.getMessage.take(60)}")
      }
    }
    if (flagged.nonEmpty)
      println(s"SUPERLINEAR: ${flagged.reverse.mkString(", ")}")
    else println("SUPERLINEAR: none")
    spark.stop()
  }
}
