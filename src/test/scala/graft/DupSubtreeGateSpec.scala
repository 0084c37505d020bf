package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.DupSubtreeProbe

/** Duplicated-expensive-subtree GATE (r12 verdict item 2): the
  * DupSubtreeProbe sweep found the defect class behind three separate
  * round-fixes (tpch_q15's double revenue build, clusterLabels' pair
  * build, knn_join_lsh_adaptive's verify frame) and measured every
  * flagged registry query at ≤ 1.5 executed base-table passes — but as a
  * run-when-someone-remembers tool. This spec pins those measurements so
  * the NEXT optimizer-reuse miss fails `sbt test` instead of waiting for
  * a decade probe.
  *
  * The gate executes each query the r13 sweep flagged as carrying a
  * duplicated canonicalized Join/Aggregate (contingency marginals,
  * corpus-stat broadcasts, TPC-H correlated-subquery archetypes — the
  * shapes that BET on AQE exchange reuse instead of materializing) and
  * asserts, from scan METRICS, that no base table was read more than
  * [[DupSubtreeProbe.PASS_BUDGET]]× its row count. The red case proves
  * the detector actually fires: the same bet with exchange reuse
  * disabled measures ~2 passes and would fail the budget.
  */
class DupSubtreeGateSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  /** The r13 post-fix sweep's flagged set (logical duplicates present on
    * HEAD whose measured REAL passes are within budget — AQE fuses
    * these). The r13 pre-fix sweep with real metrics found 8 of the r12
    * list's 12 actually over budget (2–4 passes each; the r12 "all
    * ≤ 1.5" rows were vacuous zero-metrics reads) — those 8 were fixed
    * by checkpointing the shared narrow frame (bm25_score,
    * cooccur_pmi_topk, stats_chi2_independence, text_tfidf_top_terms,
    * mix_temperature_sample, quality_lm_score, gap_fill_forward) or a
    * window-min restructure (tpch_q2_mincost) and rotated out or into
    * budget. A query rotating OUT of this list is fine (duplicate
    * removed); measured passes above budget are the regression this
    * gate exists for. Queries whose shared stage is CHECKPOINTED
    * execute it at construction — outside this plan's metrics — which
    * is correct: a checkpoint runs once by construction, the very
    * property the gate wants. */
  private val Flagged = Seq(
    "cooccur_pmi_topk", "dedup_ngram_jaccard", "mix_temperature_sample",
    "tpch_q15_topsupp", "tpch_q17_smallqty", "tpch_q20_excess",
    // the r13-fixed shapes, kept under the gate so un-checkpointing or
    // un-windowing one of them re-fails here instead of at a decade probe
    "bm25_score", "stats_chi2_independence", "text_tfidf_top_terms",
    "quality_lm_score", "gap_fill_forward", "tpch_q2_mincost")

  private lazy val tableRows: Map[String, Long] =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").map { t =>
      s"$t.parquet" -> spark.read.parquet(s"$sf/$t.parquet").count()
    }.toMap

  test("every dup-flagged registry query executes within the pass budget") {
    val over = Flagged.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      // the gate only binds where the logical duplicate still exists;
      // report drift as info, not failure
      val dups = DupSubtreeProbe.duplicated(df.queryExecution.analyzed)
      if (dups.isEmpty) info(s"$name: no longer carries a logical duplicate")
      DupSubtreeProbe.executedPasses(df, tableRows)
        .filter(_._2 > DupSubtreeProbe.PASS_BUDGET)
        .map { case (t, r) => f"$name: $t read $r%.2f× (budget ${DupSubtreeProbe.PASS_BUDGET})" }
    }
    assert(over.isEmpty,
      "reuse miss — duplicated subtree re-executed a base-table pass:\n" +
        over.mkString("\n"))
  }

  test("red case: a reuse miss is measured above the budget") {
    // The exact bet the flagged queries make — one expensive aggregate
    // referenced twice, reuse left to the optimizer — with exchange
    // reuse OFF, so both copies must execute. The detector must see ~2
    // base-table passes; if it reports under budget here, the gate above
    // is asserting nothing.
    val key = "spark.sql.exchange.reuse"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val d = spark.read.parquet(s"$sf/documents.parquet")
      val agg = d.groupBy("lang").agg(count(lit(1)).as("n"))
      val twice = agg.union(agg)
      val passes = DupSubtreeProbe.executedPasses(twice, tableRows)
      val docPasses = passes.collectFirst {
        case ("documents.parquet", r) => r
      }.getOrElse(0.0)
      assert(docPasses > DupSubtreeProbe.PASS_BUDGET,
        f"detector failed to see the re-executed scan: $docPasses%.2f passes")
    } finally spark.conf.set(key, prev)
  }
}
