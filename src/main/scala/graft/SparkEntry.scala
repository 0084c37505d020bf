package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.MarketOps
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (plus the
  * 100-TB-pipeline superset), expressed over the driver testdata
  * (TESTDATA.md / FIXTURES.md §3) as a pure DataFrame transform;
  * [[oracleSql]] holds the equivalent DuckDB SQL the driver hash-compares
  * against. Column names/aliases are identical on both sides (the compare
  * sorts columns by name), and all floating-point output follows the
  * cross-engine determinism rules in [[graft.ops.Num]].
  *
  * The registry is assembled from themed [[graft.queries.QueryPack]]s.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    MarketQueries,
    RelationalQueries,
    FunctionQueries,
    VectorQueries,
    TextQueries,
    EnrichmentQueries,
    JoinQueries,
    PipelineQueries,
    ScaleQueries,
    CurationQueries,
    MiningQueries,
    FeatureQueries,
    SeriesQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Composes the slice-0 pipeline of SURVEY §7: daily OHLCV summary +
    * prev-close variation + rolling MAs + trend, per key. */
  def entry(spark: SparkSession): DataFrame = {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    MarketOps
      .withRollingMas(MarketOps.dailySummary(events))
      .withColumn("trend", MarketOps.trend(col("close"), col("ma_10")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap

  /** Build every DerivedStore-staged table for `sfDir` if not already
    * published. Store builds are INDEX-time cost — each has an inline-
    * build twin in the registry that prices the build honestly
    * (dedup_ngram_jaccard / dedup_cluster_cc / dedup_minhash_lsh /
    * ann_ivf_pq_search / rag_search_pipeline / bm25_score) — so serve
    * consumers should measure SERVING; callers (the bench warmup, a
    * deployment's index job) stage here, outside any serve timing. */
  def stageDerivedStores(spark: SparkSession, sfDir: String): Unit = {
    graft.queries.TextQueries.jaccardPairsStore(spark, sfDir).count()
    graft.queries.TextQueries.clusterLabelsStore(spark, sfDir).count()
    graft.queries.TextQueries.minhashPairsStore(spark, sfDir).count()
    graft.queries.VectorQueries.ivfIndexStore(spark, sfDir).count()
    graft.queries.PipelineQueries.vectorStoreServed(spark, sfDir).count()
    graft.queries.MiningQueries.bm25Store(spark, sfDir).count()
    (): Unit
  }
}
