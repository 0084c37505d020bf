package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The parity-critical BPE primitives shared by BOTH trainers —
  * `MiningQueries.bpeTrainOn` (the registry's recount/delta trainer)
  * and [[BpeIndexedTrainer]] (the LSM-indexed long-run trainer). Their
  * contract is bit-identical greedy semantics, so the two pieces that
  * DEFINE those semantics must exist exactly once:
  *
  *  - the framed non-overlapping replace that applies one merge, and
  *  - the (cnt desc, w1, w2) winner selection off a maintained
  *    (bg, cnt) table.
  *
  * Until r11 each trainer carried its own verbatim copy; an edit to one
  * (tie-break, separator, framing) would have silently broken the
  * cross-trainer equality the specs promise. The test oracle
  * (BpeTestOracle) stays an INDEPENDENT implementation on purpose — it
  * is the thing that would catch a bug here.
  */
object BpeOps {

  /** Framed text: every space doubled plus one leading/trailing space.
    * Framing makes ` w1  w2 ` occurrences NON-OVERLAPPING, so a plain
    * left-to-right `replace` is exactly the greedy BPE merge pass —
    * in "a a a" only the first "a a" merges, as real BPE does. */
  def framed(text: Column): Column =
    concat(lit(" "), replace(text, lit(" "), lit("  ")), lit(" "))

  /** The framed occurrence of the winning pair — also the delta
    * branch's exact merge-applicability prefilter (`instr > 0`). */
  def needle(w1: String, w2: String): String = s" $w1  $w2 "

  /** One greedy merge (w1, w2) → w1_w2 applied to raw `text`. Column
    * API with lit() operands — the winning tokens are DATA, not SQL
    * text; an expr() splice would mis-parse on any corpus token
    * containing a quote or backslash. */
  def applyMerge(text: Column, w1: String, w2: String): Column =
    trim(replace(
      replace(framed(text), lit(needle(w1, w2)), lit(s" ${w1}_$w2 ")),
      lit("  "), lit(" ")))

  /** Full bigram pair count of a `(doc_id, text, ...)` corpus — the
    * `(bg, cnt)` table the winner reads. Both trainers' maintained-count
    * equality contract depends on this exact aggregate, so it lives here
    * with the other parity-critical semantics. */
  def pairCounts(corpus: DataFrame): DataFrame =
    corpus
      .select(explode(TextOps.bigrams(TextOps.tokens(col("text")))).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))

  /** Greedy winner off a maintained `(bg, cnt)` table: highest count,
    * ties broken on (w1, w2) — one row to the driver, the inherently
    * sequential decision every greedy BPE trainer has. None = the
    * vocabulary is exhausted (no bigram left to merge). */
  def winner(counts: DataFrame): Option[(String, String, Long)] =
    counts
      .select(
        split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"), col("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1)
      .collect().headOption
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("cnt")))

  /** Recount-vs-indexed trainer pick, wired to the MEASURED crossover
    * (BPE_CROSSOVER_r12{,_sf10}.json — the r11 verdict asked for the
    * measurement to replace the in-code prose heuristic, and the
    * measurement REFUTED the prose): from-scratch A/B at sf1 (50k docs,
    * ~0.2 GB) and sf10 (500k docs, ~2.1 GB) shows the indexed trainer
    * LOSING at every measurable configuration — its per-round constant
    * (postings probe + append writes + ~6 extra jobs ≈ 4–7 s) exceeds a
    * full corpus recount pass (0.5 s/round at sf1, 1.6 s at sf10), and
    * the gap is k-independent, so there is no crossover in merge count
    * at these corpus sizes. The crossover dimension is CORPUS BYTES:
    * recount's per-round pass grows ~linearly (≈ 0.55 s/GB measured
    * across the two points) while the indexed round cost is dominated
    * by its fixed overhead, giving an extrapolated break-even around
    * 10 GB — beyond what this machine holds, hence a threshold, not a
    * measured point, and the threshold is deliberately placed AT the
    * extrapolation, not below it. BpeTrainerSpec's gate test asserts
    * the committed artifacts actually support this direction (indexed
    * slower at every measured cell) and that the threshold sits beyond
    * the largest measured corpus. */
  val TRAINER_CROSSOVER_BYTES: Long = 10L * 1024 * 1024 * 1024

  /** True when a k-merge training run over `corpusBytes` should take the
    * LSM postings-indexed trainer instead of the recount/delta trainer. */
  def pickIndexedTrainer(corpusBytes: Long): Boolean =
    corpusBytes >= TRAINER_CROSSOVER_BYTES

  /** k-merge BPE training with the execution REGIME picked by the
    * measured crossover — the actual wiring of [[pickIndexedTrainer]],
    * so a caller that just wants "train k merges on this corpus" never
    * re-derives the regime choice:
    *
    *  - below [[TRAINER_CROSSOVER_BYTES]]: the recount/delta trainer
    *    (per-round corpus bigram pass — cheaper than the indexed round's
    *    4-7 s fixed overhead at EVERY measured cell of
    *    BPE_CROSSOVER_r12{,_sf10}.json);
    *  - at/above it: [[BpeIndexedTrainer.train]] against `scratchRoot`
    *    (one-time index build, then O(affected-slice) rounds — the only
    *    regime whose round cost does not scale with corpus bytes).
    *
    * `corpusBytes` < 0 (the default) derives the size from the
    * optimizer's estimate for the corpus plan — the same estimator the
    * LshJoin broadcast gate trusts — EXCEPT when the plan carries joins
    * or generators: size-in-bytes estimates MULTIPLY through those
    * nodes, so a small corpus behind a join/explode-bearing plan can be
    * grossly overestimated and silently misrouted to the indexed
    * trainer far below the measured ~10 GiB crossover (bit-equal either
    * way, but a large perf regression). For such plans the estimate is
    * clamped to the sum of the plan's LEAF relation sizes — an upper
    * bound on corpus bytes actually read, immune to the multiplication.
    * Pass an explicit value when the caller knows better (a catalog
    * stat at 100 TB). Returns
    * (merges, final rewritten corpus). Both regimes are bit-equal
    * (BpeTrainerSpec / BpeIndexedTrainerSpec 17-case equality); the
    * dispatch itself is spec-pinned in both directions via forced byte
    * counts. */
  def trainAuto(s: org.apache.spark.sql.SparkSession, corpus0: DataFrame,
      k: Long, scratchRoot: String, corpusBytes: Long = -1L)
      : (DataFrame, DataFrame) = {
    val bytes =
      if (corpusBytes >= 0L) corpusBytes
      else estimateBytes(corpus0)
    if (pickIndexedTrainer(bytes)) {
      val (m, c, _, _) = BpeIndexedTrainer.train(s, corpus0, k, scratchRoot)
      (m, c)
    } else {
      val (m, c, _) = graft.queries.MiningQueries.bpeTrainOn(s, corpus0, k)
      (m, c)
    }
  }

  /** Corpus-byte estimate for [[trainAuto]]'s regime dispatch: the
    * optimizer's size-in-bytes, clamped to the sum of leaf relation
    * sizes whenever the plan contains a join or generator (see the
    * trainAuto scaladoc for why the raw estimate misroutes there). */
  private[graft] def estimateBytes(corpus0: DataFrame): Long = {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    val plan = corpus0.queryExecution.optimizedPlan
    val raw = plan.stats.sizeInBytes
    val multiplicative =
      plan.collectFirst { case j: Join => j; case g: Generate => g }.nonEmpty
    val est =
      if (!multiplicative) raw
      else raw.min(
        plan.collectLeaves().map(_.stats.sizeInBytes).foldLeft(BigInt(0))(_ + _))
    est.min(BigInt(Long.MaxValue)).toLong
  }
}
