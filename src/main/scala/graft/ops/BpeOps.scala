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

  /** Conf key (dev/spec dial): max measured corpus text BYTES for the
    * driver fast path of `MiningQueries.bpeTrainOn`; 0 forces the
    * distributed trainer (the delta/recount branch specs and the
    * reliable-checkpoint spec pin the loop through this). */
  private[graft] val BPE_DRIVER_MAX_KEY = "spark.graft.bpe.driverMaxBytes"

  /** Default driver gate: 64 MB of measured corpus payload — the same
    * collect-budget class as LshJoin.PAIRS_BROADCAST_CAP and the CC /
    * k-core driver gates, clamped to the session driver budget by the
    * caller. */
  private[graft] val BPE_DRIVER_MAX_DEFAULT: Long = 64L * 1024 * 1024

  /** Driver-side k-merge BPE train over a collected (doc_id, text,
    * n_raw) corpus — bit-equal semantics to the distributed trainer by
    * construction: the same whitespace tokens (`split(" ", -1)` ≡ Spark
    * `split(text, " ")`), the same full bigram count, the same
    * (cnt desc, w1, w2) winner with ties compared in UTF-8 BINARY order
    * (Spark string sort order; Java's UTF-16 `compareTo` diverges on
    * supplementary planes), and the same framed non-overlapping replace
    * (Java `String.replace` is the same literal left-to-right
    * single-pass scan as `UTF8String.replace`). Returns (merges, final
    * corpus, final bigram counts) — the counts are a recount of the
    * final corpus, which the delta-correctness specs prove equal to the
    * distributed trainer's maintained table. Pure function, pinned
    * against BpeTestOracle and the distributed trainer in
    * BpeTrainerSpec/BpePropertySpec. */
  private[graft] def driverTrain(
      rows: Array[(java.lang.Long, String, java.lang.Long)], k: Long)
      : (Seq[(Long, String, String, Long)],
         Seq[(java.lang.Long, String, java.lang.Long)], Seq[(String, Long)]) = {
    // null text contributes no bigrams and rewrites to null — the same
    // null algebra as the distributed trainer (explode of a null token
    // array emits nothing; replace/trim of null stay null). Boxed
    // doc_id/n_raw ride through untouched, nulls included.
    def bigramCounts(
        texts: Array[(java.lang.Long, String, java.lang.Long)]): java.util.HashMap[String, Long] = {
      val m = new java.util.HashMap[String, Long]()
      texts.foreach { case (_, t, _) =>
        if (t != null) {
          val toks = t.split(" ", -1)
          var i = 0
          while (i < toks.length - 1) {
            m.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
            i += 1
          }
        }
      }
      m
    }
    var texts = rows
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var step = 1L
    var exhausted = false
    while (step <= k && !exhausted) {
      val counts = bigramCounts(texts)
      if (counts.isEmpty) exhausted = true
      else {
        var bw1: String = null
        var bw2: String = null
        var bc = -1L
        counts.forEach { (bg, c) =>
          val sp = bg.indexOf(' ')
          val w1 = bg.substring(0, sp)
          val w2 = bg.substring(sp + 1)
          val better = c > bc || (c == bc &&
            (utf8Compare(w1, bw1) < 0 ||
              (utf8Compare(w1, bw1) == 0 && utf8Compare(w2, bw2) < 0)))
          if (better) { bw1 = w1; bw2 = w2; bc = c }
        }
        merges += ((step, bw1, bw2, bc))
        texts = texts.map { case (id, t, n) =>
          (id, if (t == null) null else applyMergeStr(t, bw1, bw2), n)
        }
      }
      step += 1
    }
    val fin = bigramCounts(texts)
    val finB = Seq.newBuilder[(String, Long)]
    fin.forEach((bg, c) => finB += ((bg, c)))
    (merges.result(), texts.toSeq, finB.result())
  }

  /** Driver twin of [[applyMerge]] — identical framed single-pass
    * literal replaces; trailing/leading trim strips SPACES only
    * (Spark `trim` semantics; `String.trim` would also strip control
    * chars). */
  private[graft] def applyMergeStr(text: String, w1: String, w2: String): String = {
    val framed = " " + text.replace(" ", "  ") + " "
    val merged = framed.replace(needle(w1, w2), s" ${w1}_$w2 ").replace("  ", " ")
    var b = 0
    var e = merged.length
    while (b < e && merged.charAt(b) == ' ') b += 1
    while (e > b && merged.charAt(e - 1) == ' ') e -= 1
    merged.substring(b, e)
  }

  /** Unsigned UTF-8 byte comparison — Spark's binary string collation. */
  private[graft] def utf8Compare(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Recount-vs-indexed trainer pick, wired to the MEASURED crossover
    * artifacts (BPE_CROSSOVER_r12{,_sf10}.json and
    * BPE_CROSSOVER_r13_{sf100,sf250}.json). The r12 story — indexed
    * rounds cost a fixed ~4–7 s while recount passes grow ~0.55 s/GB,
    * extrapolated break-even ~10 GiB — was REFUTED the first time a
    * cell past 10 GiB was measured: at 21 GB (sf100, k=12) recount
    * 129.9 s vs indexed 164.6 s, and at 52 GB (25× sf10 docs, k=12)
    * recount 188.9 s vs indexed 292.3 s. Both trainers are near-linear
    * in corpus bytes at this scale, and the indexed trainer's SLOPE is
    * the worse one (~3.3 s/GB vs ~1.9 s/GB across the 21→52 GB
    * segment): its "O(affected-slice)" round cost is itself linear in
    * corpus bytes, because the merged bigram's postings slice grows
    * with the corpus. A fixed overhead can be amortized away; a worse
    * slope cannot — so there is NO byte crossover, measured or
    * extrapolatable, and the threshold is the off-switch. The indexed
    * trainer remains available via an explicit `corpusBytes` override
    * (its LSM store is still the right shape for INCREMENTAL
    * re-training, which no measured cell exercises).
    * BpeIndexedTrainerSpec's gate test asserts the committed artifacts
    * support this direction (indexed slower at every measured cell,
    * slope ordering included) and that the auto path can never reach
    * the dominated trainer. */
  val TRAINER_CROSSOVER_BYTES: Long = Long.MaxValue

  /** True when a k-merge training run over `corpusBytes` should take the
    * LSM postings-indexed trainer instead of the recount/delta trainer. */
  def pickIndexedTrainer(corpusBytes: Long): Boolean =
    corpusBytes >= TRAINER_CROSSOVER_BYTES

  /** k-merge BPE training with the execution REGIME picked by the
    * measured crossover — the actual wiring of [[pickIndexedTrainer]],
    * so a caller that just wants "train k merges on this corpus" never
    * re-derives the regime choice:
    *
    *  - below [[TRAINER_CROSSOVER_BYTES]]: the recount/delta trainer —
    *    cheaper at EVERY measured cell from 0.2 GB to 52 GB
    *    (BPE_CROSSOVER_r12{,_sf10}.json, BPE_CROSSOVER_r13_{sf100,
    *    sf250}.json), and since r13 the threshold is `Long.MaxValue`
    *    (the 21/52 GB cells showed the indexed trainer's slope is the
    *    worse one — no byte crossover exists);
    *  - at/above it (reachable only via an explicit `corpusBytes`
    *    override): [[BpeIndexedTrainer.train]] against `scratchRoot` —
    *    kept for incremental re-training shapes, not for from-scratch
    *    wins.
    *
    * `corpusBytes` < 0 (the default) derives the size from the
    * optimizer's estimate for the corpus plan — the same estimator the
    * LshJoin broadcast gate trusts — EXCEPT when the plan carries joins
    * or generators: size-in-bytes estimates MULTIPLY through those
    * nodes, so a small corpus behind a join/explode-bearing plan can be
    * grossly overestimated and (under any finite threshold) silently
    * misrouted to the dominated indexed trainer (bit-equal either
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
