package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.ops.{TextOps, VectorOps}

/** Dev-side breakdown of corpus_curation_pipeline: times each cumulative
  * prefix of the composed plan so the stage that multiplies cost is
  * attributable. Not part of the driver contract. */
object PipelineProbe {
  private val BENCH_MOD = 97L
  private val SOURCE_CAP = 15

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.documents(spark, dir)

    def withStats(df: DataFrame): DataFrame = {
      val rs = graft.expressions.TextHash.repetitionStats(col("text"))
      df.withColumn("n_tokens", rs.getField("n_tokens"))
        .withColumn("top_unigram_frac",
          rs.getField("top_uni").cast("double") / rs.getField("n_tokens").cast("double"))
        .withColumn("top_bigram_frac",
          when(rs.getField("n_tokens") >= 2,
            rs.getField("top_bi").cast("double") /
              (rs.getField("n_tokens") - 1).cast("double"))
            .otherwise(lit(0.0)))
    }

    def contaminatedIds: DataFrame = {
      val sh = docs.select(
        col("doc_id"),
        graft.expressions.TextHash.shingleHashes(col("text")).as("sh"))
      val benchHashes = sh.filter(col("doc_id") % BENCH_MOD === 0)
        .select(explode(col("sh")).as("h")).distinct()
      sh.filter(col("doc_id") % BENCH_MOD =!= 0)
        .select(col("doc_id"), explode(col("sh")).as("h"))
        .join(benchHashes, "h")
        .select("doc_id").distinct()
    }

    def quality = withStats(docs)
      .filter(col("top_unigram_frac") <= 0.3 && col("top_bigram_frac") <= 0.18)
      .filter(col("doc_id") % BENCH_MOD =!= 0)
    def clean = quality.join(contaminatedIds, Seq("doc_id"), "left_anti")
    def deduped = clean
      .groupBy(col("text"))
      .agg(min(struct(col("doc_id"), col("source"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens"))).as("keep"))
      .select(col("keep.doc_id"), col("keep.source"), col("keep.lang"),
        col("keep.n_tokens"))
    val h = (col("doc_id") * lit(2654435761L)) % lit(1000000007L)
    def capped = VectorOps.topKPerQuery(
      deduped.withColumn("h", h), col("source"), Seq(col("h"), col("doc_id")),
      k = SOURCE_CAP)
      .select("doc_id", "source", "lang", "n_tokens")

    def time(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    time("0_project_only", withStats(docs).select("doc_id", "n_tokens",
      "top_unigram_frac", "top_bigram_frac"))
    time("0_project_only_warm", withStats(docs).select("doc_id", "n_tokens",
      "top_unigram_frac", "top_bigram_frac"))
    time("1_quality", quality)
    time("1_quality_warm", quality)
    // force the stats to materialize in a Project before the filter by
    // aggregating through a shuffle boundary? no — just test a checkpoint
    val ck = withStats(docs).localCheckpoint()
    time("1b_quality_via_checkpoint", ck
      .filter(col("top_unigram_frac") <= 0.3 && col("top_bigram_frac") <= 0.18)
      .filter(col("doc_id") % BENCH_MOD =!= 0))
    time("2_clean_antijoin", clean)
    time("3_deduped", deduped)
    time("4_capped_full", capped)
    time("4_capped_full_warm", capped)
    spark.stop()
  }
}
