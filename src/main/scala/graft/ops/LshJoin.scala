package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-generation + verify joins for banded LSH dedup
  * (dedup_minhash_lsh / dedup_shingle_jaccard).
  *
  * Two physical strategies behind one logical shape, picked by the
  * optimizer's size estimate of the banded table:
  *
  *  - '''broadcast''' (build side fits in memory): probe side round-robin
  *    repartitioned against a broadcast build — a low-cardinality corpus
  *    collapses into few buckets, and with the build broadcast the
  *    quadratic pair space of a heavy bucket spreads evenly because its
  *    probe ROWS do. No pair shuffle at all.
  *
  *  - '''salted shuffle''' (build side too big to broadcast — the 100 TB
  *    case): each probe row picks one deterministic salt from its doc_id,
  *    the build side is replicated to every salt, and the join shuffles
  *    BOTH sides on `(bucket, salt)`. A hot bucket's probe rows land on
  *    `salts` different reducers instead of one, so the quadratic pair
  *    enumeration of the heaviest bucket is spread `salts`-ways — the
  *    plan-level skew answer that works where AQE's skew-join split can't
  *    see the downstream pair blowup. Each (probe, build) pair meets at
  *    exactly one salt, so no dedup is needed.
  *
  * The verify joins follow the same decision: broadcast the token-set
  * lookups when small, plain shuffled equi-joins on the (unique, unskewed)
  * doc ids when not.
  */
object LshJoin {

  /** How the candidate join was planned; carries the decision to the
    * verify joins so both stages agree. `carried` lists the verify
    * payload columns already attached to `candidates` as
    * `a_<col>`/`b_<col>` (the salted fused-verify path — see
    * [[candidateJoin]]'s `verifyCols`). */
  case class Plan(candidates: DataFrame, broadcastBuild: Boolean,
      carried: Seq[String] = Nil)

  /** True when `df`'s optimizer size estimate fits the session's broadcast
    * threshold (and the threshold is positive — `-1` disables broadcasting
    * session-wide, which is also how the spec forces the salted path). */
  private def fitsBroadcast(s: SparkSession, df: DataFrame): Boolean = {
    val threshold = s.sessionState.conf.autoBroadcastJoinThreshold
    threshold > 0 &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
  }

  /** Self-join `bands` on `bucket` (plus `extraCond` over aliases `x`/`y`:
    * size prunes, first-collision-band filter), emitting candidate pairs
    * `(a_id, b_id)` with `a_id < b_id`. `bands` must carry `doc_id`,
    * `bucket`, and whatever `extraCond` references.
    *
    * `verifyCols` (salted-branch byte cut, r12): names of verify payload
    * columns present in `bands` (e.g. the sorted token-hash arrays) to
    * surface on the candidate output as `a_<col>`/`b_<col>` — computed
    * IN the candidate join stage, so the payload rides the (bucket,
    * salt) shuffle once per band×salt per DOCUMENT (2 + 2·salts copies
    * per doc) instead of once per candidate PAIR in a downstream verify
    * join (the r11 triage: 4.5 GB of paired token arrays at sf10,
    * ~512 pairs/doc — per-pair shipping is ~30× the fused volume there
    * and grows with bucket density, while the fused copy count is a
    * constant). The broadcast branch ignores `verifyCols` and keeps the
    * banded build lean (payload there is attached by [[verifyJoin]]'s
    * broadcast lookups, already per-doc); the size gate measures the
    * LEAN frame in both branches, so carrying payload never flips the
    * plan choice.
    *
    * Decision rule, MEASURED both ways (BENCH_NOTES r12): fuse when
    * expected candidate pairs per document exceed the per-doc copy count
    * (bands + bands·salts), ship per-pair otherwise. dedup_minhash_lsh
    * fuses (~512 pairs/doc at sf10 vs 18 copies: 7.1× fewer bytes);
    * dedup_shingle_jaccard does NOT (2.6k pairs total at sf1 vs 36
    * copies/doc: fusing measured 3.4× MORE bytes and slower walls). */
  def candidateJoin(
      s: SparkSession,
      bands: DataFrame,
      extraCond: Column,
      salts: Int = 8,
      verifyCols: Seq[String] = Nil): Plan = {
    val pairCond =
      col("x.bucket") === col("y.bucket") &&
        col("x.doc_id") < col("y.doc_id") && extraCond
    val lean = verifyCols.foldLeft(bands)(_ drop _)
    if (fitsBroadcast(s, lean)) {
      val nPart = s.sessionState.conf.numShufflePartitions
      val cand = lean.repartition(nPart).alias("x")
        .join(broadcast(lean.alias("y")), pairCond)
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      Plan(cand, broadcastBuild = true)
    } else {
      // Probe picks ONE salt (deterministic in doc_id); build replicated
      // to ALL salts. The join's shuffle keys become (bucket, salt).
      val x = bands
        .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)).cast("int"))
      val y = bands
        .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
      val cand = x.alias("x")
        .join(y.alias("y"), col("x.salt") === col("y.salt") && pairCond)
        .select(
          Seq(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")) ++
            verifyCols.flatMap(c =>
              Seq(col(s"x.$c").as(s"a_$c"), col(s"y.$c").as(s"b_$c"))): _*)
      Plan(cand, broadcastBuild = false, carried = verifyCols)
    }
  }

  /** Attach both token-set sides to the candidate pairs for the exact
    * verify. `ta` must be keyed `a_id`, `tb` keyed `b_id`, and their
    * payload columns named `a_<col>`/`b_<col>`. When the salted branch
    * already carried the payload through the candidate join
    * (`Plan.carried`), the pairs are returned as-is — column names and
    * values identical to the joined form, so callers are branch-blind. */
  def verifyJoin(plan: Plan, ta: DataFrame, tb: DataFrame): DataFrame =
    if (plan.broadcastBuild)
      plan.candidates.join(broadcast(ta), "a_id").join(broadcast(tb), "b_id")
    else if (plan.carried.nonEmpty)
      plan.candidates
    else
      plan.candidates.join(ta, "a_id").join(tb, "b_id")
}
