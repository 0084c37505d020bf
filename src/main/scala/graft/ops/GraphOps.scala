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

  /** Min-label propagation connected components with pointer jumping.
    *
    * @param vertices one column `id` (distinct)
    * @param edges    columns `src`, `dst` — treated as DIRECTED; pass both
    *                 orientations for an undirected graph
    * @return (`id`, `comp`) where `comp` = min vertex id in the component
    *
    * Each round every vertex takes the smallest label among itself and its
    * in-neighbors (one distributed join + partial-agg min), then FOLLOWS
    * ITS LABEL'S LABEL (pointer jumping): a label is itself a vertex id,
    * so one extra self-join per round squares the distance information
    * travels along label chains — O(log diameter) rounds instead of
    * O(diameter), the difference between 4 and 40 jobs on a chain-shaped
    * near-dup graph (size-banded similarity graphs ARE chain-shaped:
    * doc(n tokens) ~ doc(n±1)). Both labels are reachable-vertex minima,
    * so the invariant `comp(v) = min id of some vertex reachable from v`
    * holds throughout and the fixpoint is the component min. The only
    * driver-side work is the loop and a sum(comp) convergence probe;
    * localCheckpoint truncates per-round lineage so plan size stays O(1)
    * in rounds (reliable checkpoint on a real cluster).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    // The edge table is loop-invariant and joined on `src` every round:
    // hash-partition it on `src` ONCE before checkpointing. localCheckpoint
    // preserves outputPartitioning, so each round's join plans a single
    // Exchange (the label side) instead of reshuffling the edges — at
    // 100 TB the edge table is the near-dup pair set, the largest input
    // of the loop, and this converts O(rounds) edge shuffles into one.
    val n = edges.sparkSession.sessionState.conf.numShufflePartitions
    val e = edges.select(col("src"), col("dst"))
      .repartition(n, col("src")).localCheckpoint()
    // Same trick for the initial labels: groupBy(id) each round emits
    // hash(id)-partitioned output, so seeding with that partitioning
    // makes round 1 shaped like every later round.
    var comp = vertices.select(col("id"), col("id").as("comp"))
      .repartition(n, col("id")).localCheckpoint()
    // comp labels only ever decrease, so the label sum is a strictly
    // decreasing convergence measure — one cheap agg per round, no
    // change-detection join.
    var prevSum = BigDecimal(Long.MaxValue)
    var curSum = labelSum(comp)
    while (curSum < prevSum) {
      val msgs = e.join(comp.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      // materialize before the self-join below — without this the whole
      // union+groupBy subtree executes twice (once more for the join's
      // broadcast build; exchange reuse does not cross that boundary)
      val propagated = comp.union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      // pointer jump: comp(v) := comp(comp(v)). Labels are vertex ids, so
      // the lookup side is `propagated` itself renamed; a label that is
      // its own component root maps to itself and the join stays inner.
      comp = propagated
        .join(propagated.select(col("id").as("lid"), col("comp").as("lcomp")),
          col("comp") === col("lid"))
        .select(col("id"), col("lcomp").as("comp"))
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
