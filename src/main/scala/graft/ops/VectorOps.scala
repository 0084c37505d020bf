package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector / similarity operators (SURVEY §2.8 V1-V3, §2.5 W4-W5) plus the
  * 100-TB-pipeline ANN/near-dup superset.
  *
  * Reference behaviors (cites into /root/reference/):
  *  - metadata-filtered k-NN (k=20)  src/app/rag_engine.py:212-217
  *  - similarity = 1 - distance      src/app/rag_engine.py:154
  *  - 0.6·sim + 0.4·exp(-age/14400)  src/app/rag_engine.py:161-163
  *  - top-8 by rescored score        src/app/rag_engine.py:252-253
  *  - idempotent vector upsert       src/processing/consumer.py:176-181
  *
  * All vector math is higher-order array functions (`zip_with` +
  * `aggregate`) — codegen-friendly, no UDFs, and the serial left-fold makes
  * the result bit-identical to DuckDB's `list_reduce`, which is what lets
  * cosine scores be oracle-checked exactly.
  *
  * Scale notes: brute-force k-NN broadcasts the (small) query side and
  * computes distances map-side — one pass over the big table, no shuffle
  * until the per-query top-k. The LSH variant buckets both sides first so
  * the candidate join is an equi-join on bucket id instead of a cross
  * product — the 100-TB path.
  */
object VectorOps {

  /** Element-cast to double — float→double conversion is exact. */
  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Serial-fold dot product: ((0+x₁)+x₂)+… — matches DuckDB list_reduce. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product over arrays that are ALREADY double — higher-order
    * functions are interpreted (not codegen'd), so on all-pairs workloads
    * pre-cast each vector once with [[castDouble]] instead of paying two
    * per-pair transforms inside [[dot]]. */
  def dotRaw(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** One-time element cast for reuse across many pair computations. */
  def castDouble(a: Column): Column = asDouble(a)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, 0.0 on a zero vector (guard mirrors the oracle). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** V2: distance = 1 - cosine (Chroma's default metric). */
  def cosineDist(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  /** Attach the query vector (one row, `q_emb`) to every row — broadcast,
    * no shuffle of the big side. */
  def withQueryVector(df: DataFrame, queryVec: DataFrame): DataFrame =
    df.crossJoin(broadcast(queryVec))

  /** V1: metadata-prefiltered exact k-NN: filter → distance → global top-k.
    * Plans as TakeOrderedAndProject (per-partition top-k, then merge). */
  def knn(df: DataFrame, dist: Column, k: Int, tieBreak: Column): DataFrame =
    df.withColumn("dist", dist).orderBy(col("dist"), tieBreak).limit(k)

  /** W5: REAL_TIME re-rank score (weights 0.6/0.4, τ=14400 s), quantized at
    * 1e-6 because exp() may differ by 1 ulp across libm implementations. */
  def timeDecayScore(dist: Column, ageSec: Column): Column =
    Num.r6(lit(0.6) * (lit(1.0) - dist) + lit(0.4) * exp(-ageSec / lit(14400.0)))

  /** Per-query top-k over a candidates frame (ANN result shaping). */
  def topKPerQuery(df: DataFrame, qId: Column, order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn", row_number().over(Window.partitionBy(qId).orderBy(order: _*)))
      .filter(col("rn") <= k).drop("rn")

  // ------------------------------------------------------------------
  // LSH: deterministic integer hyperplanes, shared with the SQL oracle.
  // ------------------------------------------------------------------

  /** Plane weights: w(p,d) = ((p·73 + d·37) mod 17) - 8 ∈ [-8, 8].
    * Integer-derived so Spark and the oracle agree bit-for-bit. */
  def planeWeight(p: Int, d: Int): Int = ((p * 73 + d * 37) % 17) - 8

  /** Random-hyperplane signature: bucket = Σ_p 2^p · [emb·w_p > 0].
    * One pass, no shuffle; the bucket id then drives an equi-join. */
  def lshBucket(emb: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { p =>
      val w = array((0 until dims).map(d => lit(planeWeight(p, d).toDouble)): _*)
      when(dot(emb, w) > 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
}
