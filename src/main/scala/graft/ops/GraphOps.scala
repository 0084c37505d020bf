package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for the dedup pipeline.
  *
  * Connected components is the canonical post-pass over near-dup PAIRS:
  * A~B and B~C must collapse into one keep-group even when A!~C, so the
  * canonical representative is the component min, not the pair min.
  */
object GraphOps {

  /** Min-label propagation connected components.
    *
    * @param vertices one column `id` (distinct)
    * @param edges    columns `src`, `dst` — treated as DIRECTED; pass both
    *                 orientations for an undirected graph
    * @return (`id`, `comp`) where `comp` = min vertex id in the component
    *
    * Each round every vertex takes the smallest label among itself and its
    * in-neighbors; rounds = graph diameter (near-dup clusters are dense,
    * so 1–3 in practice). Each round is one distributed join + partial-agg
    * min — the only driver-side work is the O(diameter) loop and a
    * sum(comp) convergence probe, exactly how large-scale CC runs on a
    * cluster (alternating large/small-star cuts rounds on adversarial
    * chains; plain propagation is the right first shape). localCheckpoint
    * truncates the per-round lineage so plan size stays O(1) in rounds
    * (reliable checkpoint on a real cluster).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var comp = vertices.select(col("id"), col("id").as("comp")).localCheckpoint()
    // comp labels only ever decrease, so the label sum is a strictly
    // decreasing convergence measure — one cheap agg per round, no
    // change-detection join.
    var prevSum = BigDecimal(Long.MaxValue)
    var curSum = labelSum(comp)
    while (curSum < prevSum) {
      val msgs = e.join(comp.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      comp = comp.union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      prevSum = curSum
      curSum = labelSum(comp)
    }
    comp
  }

  /** Exact decimal sum of labels — overflow-proof for any vertex count. */
  private def labelSum(comp: DataFrame): BigDecimal = {
    val d = comp.agg(sum(col("comp").cast("decimal(38,0)"))).head.getDecimal(0)
    if (d == null) BigDecimal(0) else BigDecimal(d)
  }
}
