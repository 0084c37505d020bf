package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.CosineSimilarity.cosineSim
import graft.model.Tables
import graft.ops._

/** SURVEY §3's traced entry points, composed end-to-end as single Catalyst
  * plans — the lifecycle proof that the per-operator pieces compose the way
  * the reference's call chains do.
  *
  *  - §3.3 RAG read path: metadata filter → k-NN (k=20) → retrieval dedup
  *    (keep-first by rank) → time-decay rescore → top-8
  *    (rag_engine.py:184-253).
  *  - §3.2 consumer enrich path: id derivation → translate → sentiment →
  *    embed → coercion → upsert latest-wins
  *    (consumer.py:133-192).
  */
object PipelineQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- §3.3: the full RAG retrieval pipeline as ONE plan -----------------
    "rag_search_pipeline" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
      val knn20 = e
        .filter(col("label").between(2, 6))               // metadata prefilter
        .crossJoin(broadcast(q))
        .withColumn("dist", lit(1.0) - cosineSim(col("embedding"), col("q_emb")))
        .orderBy(col("dist"), col("vec_id")).limit(20)    // k-NN k=20
      val deduped = DedupOps.keepFirst(                    // retrieval dedup
        knn20.withColumn("dup_key", col("vec_id") % 5),
        keys = Seq(col("label"), col("dup_key")),
        order = Seq(col("dist"), col("vec_id")))
      deduped
        .withColumn("score", VectorOps.timeDecayScore(     // re-rank
          col("dist"), col("vec_id").cast("double") * 60.0))
        .orderBy(col("score").desc, col("vec_id")).limit(8) // top-8 context
        .select("vec_id", "label", "dist", "score")
    }),

    // -- §3.2: the full enrich/upsert pipeline as ONE plan -----------------
    "consumer_enrich_pipeline" -> ((s, dir) => {
      val enriched = Tables.documents(s, dir)
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(
          col("doc_id"),
          // F8 analog over document metadata
          concat(lit("DOC_"), col("lang"), lit("_"), col("doc_id")).as("id_raw"),
          EnrichOps.translateEn(col("text"), col("lang")).as("translated"),
          EnrichOps.sentimentScore(col("toks")).as("sentiment"),
          TextOps.qualityScore(col("text")).as("quality"),
          TextOps.polyHash(col("text")).as("fp"))
        .withColumn("store_id", col("doc_id") % 100)       // upsert key
      DedupOps.latestWins(                                  // V3 upsert
        enriched, id = col("store_id"),
        order = Seq(col("doc_id").desc))
        .select("store_id", "doc_id", "id_raw", "sentiment", "quality", "fp")
    })
  )

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"

  private def cosSql(a: String, b: String): String =
    s"CASE WHEN sqrt(${dotSql(a, a)}) = 0.0 OR sqrt(${dotSql(b, b)}) = 0.0 THEN 0.0 " +
      s"ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END"

  private def polySql(s: String): String =
    s"list_reduce([CAST(0 AS BIGINT)] || list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc * 31 + c) % ${TextOps.P})"

  private val VAL_SQL: String =
    EnrichOps.lexicon.foldRight("0.0") { case ((w, v), els) =>
      s"CASE WHEN t = '$w' THEN $v ELSE $els END"
    }

  def oracleSql: Map[String, String] = Map(
    "rag_search_pipeline" ->
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
         |knn AS (
         |  SELECT vec_id, label, 1.0 - ${cosSql("embedding", "q_emb")} AS dist
         |  FROM embeddings, q WHERE label BETWEEN 2 AND 6
         |  ORDER BY dist, vec_id LIMIT 20
         |), deduped AS (
         |  SELECT vec_id, label, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY label, vec_id % 5
         |                                 ORDER BY dist, vec_id) AS rn
         |    FROM knn
         |  ) WHERE rn = 1
         |), scored AS (
         |  SELECT vec_id, label, dist,
         |         floor((0.6 * (1.0 - dist) + 0.4 * exp(-(CAST(vec_id AS DOUBLE) * 60.0) / 14400.0)) * 1000000 + 0.5) / 1000000 AS score
         |  FROM deduped
         |)
         |SELECT vec_id, label, dist, score FROM scored
         |ORDER BY score DESC, vec_id LIMIT 8""".stripMargin,

    "consumer_enrich_pipeline" ->
      s"""WITH enriched AS (
         |  SELECT doc_id,
         |         'DOC_' || lang || '_' || doc_id AS id_raw,
         |         list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(string_split(text, ' '), t -> CAST($VAL_SQL AS DOUBLE)),
         |                     (acc, v) -> acc + v) AS s,
         |         0.4 * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)
         |         + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE))
         |         + 0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 400.0) AS quality,
         |         ${polySql("text")} AS fp,
         |         doc_id % 100 AS store_id
         |  FROM documents
         |)
         |SELECT store_id, doc_id, id_raw, s / sqrt(s * s + 15.0) AS sentiment, quality, fp
         |FROM (
         |  SELECT *, row_number() OVER (PARTITION BY store_id ORDER BY doc_id DESC) AS rn
         |  FROM enriched
         |) WHERE rn = 1""".stripMargin
  )
}
