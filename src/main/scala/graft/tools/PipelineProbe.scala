package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.VectorOps
import graft.queries.CurationQueries

/** Dev-side breakdown of corpus_curation_pipeline: times each cumulative
  * prefix of the composed plan so the stage that multiplies cost is
  * attributable. Reuses CurationQueries' OWN stage helpers
  * (withRepetitionStats / contaminatedIds) so the probe can never time a
  * different plan than the pipeline ships. Not part of the driver
  * contract. */
object PipelineProbe {
  // The pipeline's OWN constants (private[graft]) — a local copy could
  // silently drift and time a different plan than the one that ships.
  private val BENCH_MOD = CurationQueries.BENCH_MOD
  private val SOURCE_CAP = CurationQueries.SOURCE_CAP

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, dir)

    def quality = CurationQueries.withRepetitionStats(docs)
      .filter(col("top_unigram_frac") <= 0.3 && col("top_bigram_frac") <= 0.18)
      .filter(col("doc_id") % BENCH_MOD =!= 0)
    def clean = quality.join(
      CurationQueries.contaminatedIds(spark, dir), Seq("doc_id"), "left_anti")
    def deduped = clean
      .groupBy(col("text"))
      .agg(min(struct(col("doc_id"), col("source"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens"))).as("keep"))
      .select(col("keep.doc_id"), col("keep.source"), col("keep.lang"),
        col("keep.n_tokens"))
    def capped = VectorOps.topKPerQuery(
      deduped.withColumn("h", graft.ops.TextOps.sampleKey(col("doc_id"))),
      col("source"), Seq(col("h"), col("doc_id")), k = SOURCE_CAP)
      .select("doc_id", "source", "lang", "n_tokens")

    def time(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    time("1_quality", quality)
    time("1_quality_warm", quality)
    time("2_clean_antijoin", clean)
    time("3_deduped", deduped)
    time("4_capped_full", capped)
    time("4_capped_full_warm", capped)
    spark.stop()
  }
}
