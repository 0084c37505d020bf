package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dedup / upsert / set operators (SURVEY §2.3 J3, §2.4 A3, §2.6 O3-O4).
  *
  * Reference behaviors (cites into /root/reference/):
  *  - upsert-by-id latest-wins    src/processing/consumer.py:143-155,176-181
  *  - keep-last dedup by date     src/processing/consumer.py:98-104
  *  - seen-id anti-join           src/ingestion/producer.py:98-100,400
  *  - retrieval dedup keep-first  src/app/rag_engine.py:230-239
  *
  * All are one `row_number` over a keyed window — a single hash shuffle on
  * the dedup key, no sort of the full table, and the per-key ordering is
  * made total (event-time + unique id) so latest-wins survives shuffle
  * nondeterminism (SURVEY §2.9 T6).
  */
object DedupOps {

  /** Latest-wins per id: the ChromaDB upsert semantic as a batch query.
    * `order` is taken verbatim (callers pass `.desc` where wanted) — wrapping
    * an already-direction-tagged column in another SortOrder kills ordering
    * codegen and drops the sort to interpreter mode. */
  def latestWins(df: DataFrame, id: Column, order: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(id).orderBy(order: _*)))
      .filter(col("rn") === 1).drop("rn")

  /** Keep-first per id in arrival/score order: the producer's seen-set
    * anti-join (J3) and the RAG retrieval dedup (O4). `order` taken
    * verbatim, as in [[latestWins]]. */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(keys: _*).orderBy(order: _*)))
      .filter(col("rn") === 1).drop("rn")
}
