package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.ops.TextOps
import graft.queries.MiningQueries

/** The BPE trainer's pair-count MAINTENANCE (delta aggregation over the
  * affected slice, MiningQueries.bpeTrainOn) must be bit-equal to the
  * from-scratch recount formulation on every round: same winners, same
  * winning counts, same final corpus, and a maintained count table that
  * exactly equals a recount of the corpus it claims to describe. The
  * independent oracle is [[BpeTestOracle.naiveTrain]] — a from-scratch
  * recount each round, the shape the registry ran through r10. */
class BpeTrainerSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def check(texts: Seq[String], k: Long): Unit = {
    // force the DISTRIBUTED trainer: this suite pins the maintained-count
    // algebra (delta vs recount branches); the r15 driver fast path would
    // otherwise capture every fixture-sized corpus. The driver path is
    // pinned against the same oracle in its own test below.
    spark.conf.set(graft.ops.BpeOps.BPE_DRIVER_MAX_KEY, "0")
    val (gotM, gotC, gotCounts) =
      try MiningQueries.bpeTrainOn(spark, BpeTestOracle.corpusDF(spark, texts), k)
      finally spark.conf.unset(graft.ops.BpeOps.BPE_DRIVER_MAX_KEY)
    val merges = BpeTestOracle.collectMerges(gotM)
    val corpus = BpeTestOracle.collectCorpus(gotC)
    val (expM, expC) = BpeTestOracle.naiveTrain(BpeTestOracle.corpusDF(spark, texts), k)
    assert(merges == expM, s"merge sequence diverged for $texts")
    assert(corpus == expC, s"final corpus diverged for $texts")
    // The maintained table must equal a recount of the final corpus —
    // catches any delta-algebra error that happens not to flip a winner.
    val maintained = gotCounts.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val recount = BpeTestOracle.recount(gotC)
    assert(maintained == recount, s"maintained counts != recount for $texts")
    // r15 driver fast path (the DEFAULT gate at fixture size): same
    // oracle equalities, and counts equal to the same recount — so
    // driver ≡ distributed ≡ oracle on every fixture this suite runs.
    val (dM, dC, dCounts) =
      MiningQueries.bpeTrainOn(spark, BpeTestOracle.corpusDF(spark, texts), k)
    assert(BpeTestOracle.collectMerges(dM) == expM,
      s"driver-path merge sequence diverged for $texts")
    assert(BpeTestOracle.collectCorpus(dC) == expC,
      s"driver-path final corpus diverged for $texts")
    assert(dCounts.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      == BpeTestOracle.recount(dC),
      s"driver-path counts != recount for $texts")
  }

  // Branch coverage: the trainer gates delta-vs-recount on
  // `DELTA_GATE·cnt < nDocs`. Small fixtures (chained/tied/overlapping/
  // exhaustion) force the RECOUNT branch; fixtures padded with hundreds
  // of bigram-free filler docs push nDocs above DELTA_GATE·cnt and
  // force the DELTA branch. Each delta test asserts its premise so a
  // future gate retune fails loudly here instead of silently moving
  // every fixture onto one branch.

  private def assertDeltaForces(nDocs: Int, maxCnt: Long): Unit =
    assert(MiningQueries.DELTA_GATE * maxCnt < nDocs,
      s"fixture no longer forces the delta branch (gate=${MiningQueries.DELTA_GATE})")

  test("chained merges: a merged token wins the next round (recount branch)") {
    // "a b c" dominates: round 1 merges a b, round 2 merges a_b c.
    // cnt=4 vs 3 docs → every round recounts.
    check(Seq("a b c a b c a b c", "a b c d", "x y"), 4L)
  }

  test("chained merges under the delta branch stay exact") {
    // Bigram-free filler docs push nDocs above DELTA_GATE·cnt, so every
    // round takes the DELTA branch — including round 2, where the
    // round-1 product a_b participates in the winner (the trickiest
    // maintenance algebra: the delta must retire (a,b)/(b,c) rows AND
    // introduce-then-consume the (a_b,c) row it created a round ago).
    val filler = (1 to 300).map(i => s"f$i")
    val texts = filler ++ Seq("a b c a b c", "a b c", "a b x")
    assertDeltaForces(texts.size, maxCnt = 4L)
    check(texts, 4L)
  }

  test("delta branch reaches exhaustion cleanly") {
    // One merge empties the maintained table via its own delta; the
    // next round must read the empty table and stop, not throw.
    val filler = (1 to 200).map(i => s"g$i")
    val texts = filler ++ Seq("p q", "p q")
    assertDeltaForces(texts.size, maxCnt = 2L)
    check(texts, 3L)
  }

  test("tie-breaking is lexicographic on (w1, w2)") {
    // Four pairs all count 2 — winner must be the (w1, w2)-smallest.
    check(Seq("b a", "b a", "c d", "c d", "a z", "a z", "a y", "a y"), 3L)
  }

  test("overlapping occurrences merge greedily left-to-right") {
    // "x x" counts 3 in "x x x x" but the framed replace is
    // non-overlapping: x_x x_x, then x_x x_x merges next round.
    check(Seq("x x x x", "x x x x"), 3L)
  }

  test("exhaustion: trainer stops when no bigram remains") {
    // One merge empties the pair space; rounds 2..k must no-op with the
    // single learned merge, not throw.
    check(Seq("a b", "a b", ""), 3L)
  }

  test("empty and single-token docs contribute nothing") {
    check(Seq("", "solo", "p q p q", "p q"), 3L)
  }

  test("deep run: six rounds of maintenance stay exact") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sat on the mat",
      "a quick brown cat jumps over a lazy fox",
      "the lazy dog and the lazy cat", "quick brown quick brown")
    check(texts, 6L)
  }
}
