package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.CosineSimilarity.cosineSim
import graft.ops.{DedupOps, Num, VectorOps}

/** Search intent, as emitted by the reference's router
  * (/root/reference/src/app/rag_engine.py:96-99): REAL_TIME applies the
  * freshness-decay re-rank, HISTORICAL scores on pure semantic similarity
  * (rag_engine.py:147-163). */
sealed trait QueryIntent
object QueryIntent {
  case object RealTime extends QueryIntent
  case object Historical extends QueryIntent
}

/** The typed query spec — SURVEY §3.3's engine surface for the reference's
  * LLM router output (/root/reference/src/app/rag_engine.py:59-145): the
  * router compiles natural language into `{ticker, start, end, intent}`
  * JSON; this case class is that contract with the NL front end stripped
  * (out of engine scope). [[RagPlans.search]] turns one spec into one
  * Catalyst plan — the deterministic half of "query compilation".
  *
  * @param ticker optional exact-match metadata prefilter
  *               (rag_engine.py:207-210; None = no ticker clause)
  * @param start  inclusive epoch-second window start (Chroma `$gte`,
  *               rag_engine.py:203)
  * @param end    inclusive window end (Chroma `$lte`, rag_engine.py:204)
  * @param intent decay on (RealTime) / off (Historical)
  * @param now    the "query time" the decay ages against. The reference
  *               reads the wall clock (rag_engine.py:158); here it is an
  *               explicit field so plans are deterministic and replayable.
  * @param k      candidate pool size (n_results=20, rag_engine.py:214)
  * @param topN   final context size (rag_engine.py:253)
  */
final case class QuerySpec(
    ticker: Option[String],
    start: Long,
    end: Long,
    intent: QueryIntent,
    now: Long,
    k: Int = 20,
    topN: Int = 8)

/** Plan builder for the RAG read path (SURVEY §3.3): metadata filter →
  * k-NN → retrieval dedup → intent-dependent rescore → top-N, constructed
  * from a [[QuerySpec]] as ONE declarative plan (reference call chain
  * rag_engine.py:184-253).
  *
  * Scale shape: the window/ticker filters reach the parquet scan (plain
  * conjunctive predicates on scan columns — pushdown-eligible), the single
  * query vector broadcasts to every partition (no shuffle of the store),
  * the k-NN plans as TakeOrderedAndProject (per-partition top-k then a
  * k-row merge on one reducer), and everything after the k-NN operates on
  * ≤ k rows. One pass over the vector store, however large.
  */
object RagPlans {

  /** Required store columns: `vec_id` (unique long), `embedding`
    * (array&lt;float&gt;), `ticker` (string), `ts` (epoch seconds) — the
    * engine layout of the reference's Chroma metadata
    * {ticker, timestamp} (rag_engine.py:230-236). */
  val StoreColumns: Seq[String] = Seq("vec_id", "embedding", "ticker", "ts")

  /** Intent-dependent score (rag_engine.py:147-163): REAL_TIME is the
    * 0.6·sim + 0.4·exp(−age/14400) decay blend with age clamped at 0 for
    * future-stamped rows (rag_engine.py:158-159); HISTORICAL is pure
    * similarity. Both quantized at 1e-6 ([[Num.r6]]) so the score is
    * bit-comparable across engines. */
  def score(spec: QuerySpec)(dist: Column, ts: Column): Column =
    spec.intent match {
      case QueryIntent.RealTime =>
        VectorOps.timeDecayScore(
          dist, greatest(lit(spec.now) - ts, lit(0L)).cast("double"))
      case QueryIntent.Historical =>
        Num.r6(lit(1.0) - dist)
    }

  /** Compile `spec` against a vector store (columns [[StoreColumns]]) and
    * a one-row query frame holding `q_emb`. Returns the top-N context
    * rows: (vec_id, ticker, ts, dist, score). */
  def search(spec: QuerySpec, queryVec: DataFrame)(store: DataFrame): DataFrame = {
    // P4 time window + P5 optional ticker equality (rag_engine.py:201-210):
    // plain conjunctive scan predicates, so Catalyst pushes them into the
    // source — the k-NN never sees out-of-window rows.
    val windowed = store.filter(col("ts").between(spec.start, spec.end))
    val filtered =
      spec.ticker.fold(windowed)(t => windowed.filter(col("ticker") === t))
    // V1 k-NN (rag_engine.py:212-217): broadcast query vector, map-side
    // codegen cosine, global top-k via TakeOrderedAndProject.
    val knn = VectorOps.knn(
      VectorOps.withQueryVector(filtered, queryVec),
      lit(1.0) - cosineSim(col("embedding"), col("q_emb")),
      spec.k, col("vec_id"))
    // O4 retrieval dedup (rag_engine.py:230-239): the reference hashes
    // (ticker, timestamp) per result and keeps the first in rank order.
    val deduped = DedupOps.keepFirst(knn,
      keys = Seq(col("ticker"), col("ts")),
      order = Seq(col("dist"), col("vec_id")))
    // W5 intent rescore + W4 top-N (rag_engine.py:241-253). ≤ k rows here.
    deduped
      .withColumn("score", score(spec)(col("dist"), col("ts")))
      .orderBy(col("score").desc, col("vec_id")).limit(spec.topN)
      .select("vec_id", "ticker", "ts", "dist", "score")
  }
}
