package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data-pipeline superset:
  * tokenization, language-ID heuristic, quality scoring, document
  * fingerprinting, token hashing for MinHash/SimHash.
  *
  * Everything is higher-order array functions over `split` output — pure
  * Catalyst, no UDFs — and all arithmetic is integer or exact-rational so
  * results are bit-identical across engines (see [[Num]]).
  *
  * The reference has no text pipeline (its only text ops are translate +
  * VADER, consumer.py:157-169); these operators are the 100-TB extension
  * the builder prompt mandates.
  */
object TextOps {

  /** Modulus for the polynomial rolling hash: the classic 1e9+7 prime.
    * acc·31 + code stays < 2^35, so the fold never overflows a long. */
  val P: Long = 1000000007L

  /** The MinHash family h_i(x) = (a_i·x + b_i) mod P, shared by the batch
    * LSH dedup queries AND the streaming near-dup operator (whose band-0
    * key is rows 0-3) — one definition so the stream can never silently
    * bucket differently than the batch twin. */
  val MINHASH_A: Seq[Long] = Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
  val MINHASH_B: Seq[Long] = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)

  /** Deterministic per-row sampling key: Knuth multiplicative hash mod P.
    * ONE definition shared by every hash-ordered sampler (source caps,
    * weighted sampling, token-budget mixing — batch AND stream) so a
    * constant tweak cannot silently de-synchronize a batch/stream twin.
    * DuckDB mirror: [[SAMPLE_KEY_SQL]].
    *
    * Reduced-before-multiply: (id mod P)·(A mod P) mod P ≡ (id·A) mod P,
    * but the left side's intermediate tops out at ~6.5e17 < 2^63 for ANY
    * id, where the naive product overflows 64-bit (silently wrapping in
    * Spark, erroring in DuckDB) once id ≳ 3.47e9 — inside the doc-id
    * range of a 100 TB corpus. Identical values wherever the naive form
    * didn't overflow, so existing oracles are unchanged. */
  def sampleKey(id: Column): Column =
    ((id % lit(P)) * lit(2654435761L % P)) % lit(P)

  /** Oracle fragment of [[sampleKey]] (same overflow-safe shape). */
  val SAMPLE_KEY_SQL: String => String =
    id => s"(($id % $P) * (2654435761 % $P)) % $P"

  /** Whitespace tokens (testdata text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Adjacent-pair bigrams ("tok_i tok_i+1") built with zip_with + slice
    * so each child array is evaluated exactly ONCE per call. The indexing
    * form `transform(sequence(1, n-1), i -> element_at(toks, i)...)` has
    * two failure modes this avoids: (a) under interpreted HOF evaluation
    * every element_at re-evaluates `toks` — i.e. re-splits the text once
    * per index, O(n²) characters per row once Catalyst inlines the
    * projection into a filter; (b) sequence(1, n-1) AUTO-REVERSES to
    * [1, 0] on a 1-token doc and element_at(_, 0) throws
    * INVALID_INDEX_OF_ZERO. Here a 0/1-token doc just yields []. */
  def bigrams(toks: Column): Column = {
    val n1 = greatest(size(toks) - 1, lit(0))
    // zip pads the shorter (tail) side with null, producing a trailing
    // spurious "last-token" entry — the outer slice drops it.
    slice(zip_with(toks, slice(toks, lit(2), n1), (a, b) => concat_ws(" ", a, b)),
      lit(1), n1)
  }

  /** Highest occurrence count of any element (null on an empty array,
    * mirroring list_max over an empty list). Single sorted pass: sort,
    * then fold (prev, run, best) over equal-run lengths. O(n log n) per
    * row versus the count-each-distinct HOF's O(n·distinct) — and immune
    * to interpreted-HOF subtree re-evaluation, because the child array is
    * evaluated once per call instead of once per distinct element. */
  def maxFreq(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && (x === acc("prev")), acc("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => when(acc("best") === 0, lit(null).cast("int")).otherwise(acc("best")))

  /** Polynomial rolling hash of a string: fold (acc·31 + charCode) mod P.
    * DuckDB mirror: list_reduce([0] || list_transform(string_split(s, ''),
    * c -> CAST(ascii(c) AS BIGINT)), (acc, c) -> (acc*31 + c) % P).
    * Native codegen kernel; [[polyHashHof]] is the HOF reference form
    * (bit-equal by spec). */
  def polyHash(s: Column): Column = graft.expressions.TextHash.polyHash(s)

  /** HOF reference formulation of [[polyHash]] — interpreted lambda
    * evaluation, kept for the native-vs-HOF equality spec. */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % P)

  /** Per-token polynomial hashes (distinct tokens) — the MinHash/SimHash
    * input. Native codegen kernel. */
  def tokenHashes(text: Column): Column =
    graft.expressions.TextHash.tokenHashes(text)

  /** HOF reference formulation of [[tokenHashes]]. */
  def tokenHashesHof(text: Column): Column =
    transform(distinctTokens(text), t => polyHashHof(t))

  /** MinHash_i over token hashes with h_i(x) = (a·x + b) mod P.
    * Native codegen kernel. */
  def minHash(hashes: Column, a: Long, b: Long): Column =
    graft.expressions.TextHash.minHash(hashes, a, b)

  /** HOF reference formulation of [[minHash]]. */
  def minHashHof(hashes: Column, a: Long, b: Long): Column =
    array_min(transform(hashes, x => (x * a + b) % P))

  /** One SimHash bit: sign of Σ_tokens (2·bit_b(hash) - 1). */
  private def simhashBit(hashes: Column, b: Int): Column = {
    val weight = aggregate(
      transform(hashes, x => (floor(x / lit(1L << b)) % 2) * 2 - 1),
      lit(0L), (acc, v) => acc + v)
    when(weight > 0, lit(1L << b)).otherwise(lit(0L))
  }

  /** 16-bit SimHash signature from token hashes — native single-pass
    * kernel at the default width; the HOF bit ladder covers other
    * widths and serves as the equality reference. */
  def simHash(hashes: Column, bits: Int = 16): Column =
    if (bits == 16) graft.expressions.TextHash.simHash16(hashes)
    else simHashHof(hashes, bits)

  /** HOF reference formulation of [[simHash]] (16 interpreted folds). */
  def simHashHof(hashes: Column, bits: Int = 16): Column =
    (0 until bits).map(simhashBit(hashes, _)).reduce(_ + _)

  /** Language-profile stopword sets, drawn from the testdata's 31-word
    * vocabulary. The heuristic's *shape* (argmax of profile hits with a
    * fixed priority order) is what matters; real deployments swap in real
    * per-language stopword lists. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow", "big", "small"),
    "es" -> Seq("data", "value", "query", "vector"),
    "fr" -> Seq("table", "column", "row", "line"),
    "de" -> Seq("join", "merge", "group", "sort"),
    "zh" -> Seq("spark", "stream", "batch", "window"))

  /** Occurrence count of profile words in the token list. */
  def profileHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => words.map(w => t === w).reduce(_ || _)))

  /** Predicted language: argmax profile hits, ties resolved by profile
    * order (en > es > fr > de > zh). */
  def langId(toks: Column): Column = {
    val hits = langProfiles.map { case (lang, words) => (lang, profileHits(toks, words)) }
    def build(i: Int): Column =
      if (i == hits.length - 1) lit(hits(i)._1)
      else {
        val (lang, h) = hits(i)
        val beatsRest = hits.drop(i + 1).map { case (_, other) => h >= other }.reduce(_ && _)
        when(beatsRest, lit(lang)).otherwise(build(i + 1))
      }
    build(0)
  }

  /** Quality score in [0,1]: 0.4·min(1, n_tok/50) + 0.3·(distinct ratio)
    * + 0.3·min(1, n_chars/400). Exact-rational arithmetic, same
    * left-to-right order as the oracle. */
  def qualityScore(text: Column): Column = {
    val nTok = size(tokens(text)).cast("double")
    val nDis = size(distinctTokens(text)).cast("double")
    val nChars = length(text).cast("double")
    lit(0.4) * least(lit(1.0), nTok / 50.0) +
      lit(0.3) * (nDis / nTok) +
      lit(0.3) * least(lit(1.0), nChars / 400.0)
  }
}
