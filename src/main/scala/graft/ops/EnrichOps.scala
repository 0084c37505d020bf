package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment operators (SURVEY §2.4 A4/A5, §2.7 F9, plus the multimodal
  * superset): sentiment scoring, text embedding, translation, binary-blob
  * feature extraction.
  *
  * The reference performs these with external models/services
  * (consumer.py:157-172: googletrans → VADER → sentence-transformer).
  * Scoring here is a deterministic lexicon port of the VADER *mechanism*
  * (token valences summed, then score/sqrt(score²+α) normalization with
  * α=15); embedding and translation are deterministic STUBS behind the
  * same column-in/column-out interface a real model UDF would use — the
  * engine-side plumbing (schema, batching, partitioning) is real, the
  * model call is swappable.
  */
object EnrichOps {

  /** Mini valence lexicon over the testdata vocabulary (deterministic
    * stand-in for the VADER lexicon; same ±4 valence scale). */
  val lexicon: Seq[(String, Double)] = Seq(
    "fast" -> 2.0, "big" -> 1.0, "value" -> 1.5, "spark" -> 2.0,
    "merge" -> 0.5, "stream" -> 1.0,
    "slow" -> -2.0, "small" -> -0.5, "dup" -> -1.5, "error" -> -3.0,
    "filter" -> -0.5, "scan" -> -1.0)

  private def valence(t: Column): Column =
    lexicon.foldRight(lit(0.0): Column) { case ((w, v), els) =>
      when(t === w, lit(v)).otherwise(els)
    }

  /** A4: VADER-style compound score: s = Σ valence(tokenᵢ) (serial fold,
    * same order as the oracle), normalized to (-1, 1) by s/√(s²+15)
    * (the reference's scorer, consumer.py:168-169). */
  def sentimentScore(toks: Column): Column = {
    val s = aggregate(transform(toks, t => valence(t)), lit(0.0), (acc, v) => acc + v)
    s / sqrt(s * s + lit(15.0))
  }

  /** A5 STUB: deterministic 16-dim pseudo-embedding derived from the text's
    * rolling hash: e[d] = ((fp·(d+1)) mod 1000)/1000 - 0.5. The real
    * implementation swaps this expression for a batched model UDF
    * (mapPartitions inference); schema and call shape are identical. */
  def embedText(text: Column, dims: Int = 16): Column = {
    val fp = TextOps.polyHash(text)
    array((0 until dims).map { d =>
      ((fp * (d + 1)) % 1000).cast("double") / 1000.0 - 0.5
    }: _*)
  }

  /** Scalar twin of [[embedText]]: the per-text "model" result. Shared by
    * the expression path and the batched kernel so both are bit-equal. */
  def embedVector(text: String, dims: Int = 16): Array[Double] = {
    val fp = graft.expressions.TextHash.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    Array.tabulate(dims)(d => ((fp * (d + 1)) % 1000).toDouble / 1000.0 - 0.5)
  }

  /** The batch "model" call: one invocation embeds a whole batch of texts.
    * This is the seam a real encoder (MiniLM etc., reference
    * consumer.py:171-172) plugs into — production swaps the body for a
    * native-library forward pass over the batch; everything around it
    * (batching, partitioning, schema) is engine-side and stays the same. */
  def embedBatch(texts: Seq[String], dims: Int = 16): Seq[Array[Double]] =
    texts.map(embedVector(_, dims))

  /** A5 at scale: batched embedding inference as a `mapPartitions` kernel.
    * Each partition's rows are grouped into `batchSize` batches and each
    * batch goes to ONE model call — amortizing per-call overhead (model
    * dispatch, JNI crossing, GPU transfer) the way a real inference
    * operator must. Narrow op: no shuffle, partitioning carries through
    * from the scan. Input must have (doc_id: long, text: string); output
    * is (doc_id, embedding: array<double>).
    *
    * `model` is injectable so specs can count batch calls; the default is
    * the deterministic stub, bit-equal to the [[embedText]] expression. */
  def embedTextBatched(
      df: DataFrame,
      batchSize: Int = 64,
      model: Seq[String] => Seq[Array[Double]] = embedBatch(_)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val embs = model(batch.map(_._2))
          batch.iterator.zip(embs.iterator).map { case ((id, _), e) => (id, e) }
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** F9 STUB: translation behind an interface — identity for English,
    * tagged passthrough otherwise (the reference also passes text through
    * unchanged on translation failure, consumer.py:160-166). */
  def translateEn(text: Column, lang: Column): Column =
    when(lang === "en", text).otherwise(concat(lit("[en] "), text))

  /** Multimodal: pack text into an opaque binary blob + typed metadata —
    * the storage shape for image/audio payloads. */
  def toBlob(text: Column): Column = encode(text, "UTF-8")

  /** Multimodal STUB feature extraction over the blob: byte length, first
    * byte, content checksum. A real decoder (image resize, audio frames)
    * replaces the expressions with a batched binary UDF; the schema
    * contract (blob in, fixed-width features out) is what's exercised. */
  def blobFeatures(blob: Column, text: Column): Seq[(String, Column)] = Seq(
    "n_bytes" -> length(blob).cast("long"),
    "first_byte" -> ascii(substring(text, 1, 1)).cast("long"),
    "checksum" -> TextOps.polyHash(text))
}
