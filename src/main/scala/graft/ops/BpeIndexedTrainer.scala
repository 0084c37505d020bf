package graft.ops

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fully-indexed BPE trainer round: the at-scale regime BENCH_NOTES r11
  * names as "the remaining step" beyond `MiningQueries.bpeTrainOn`'s
  * delta branch. The delta branch removed the per-round tokenize+explode
  * aggregate but still SCANS the corpus once per round (the map-only
  * `instr` prefilter) and re-materializes the full corpus checkpoint.
  * This trainer removes both: per-round work is proportional to the
  * AFFECTED SLICE only, with the winner's document set found by a
  * file-pruned index probe instead of a corpus scan.
  *
  * Storage is the log-structured merge-on-read shape (the
  * incremental-LSH / streaming-upsert pattern applied to the trainer's
  * own state), two append-only partitioned parquet stores:
  *
  *  - '''corpus''' — `(doc_id, text, n_raw, ver)` partitioned by
  *    `bkt = hash(doc_id) % B`. A merge round APPENDS the rewritten
  *    docs with `ver = step`; readers resolve latest-version-wins per
  *    doc. Nothing untouched is ever rewritten, so per-round write I/O
  *    is O(affected docs), and reading the affected docs touches only
  *    the bucket directories their ids hash to.
  *  - '''postings''' — `(bg, doc_id, d)` partitioned by
  *    `pbkt = hash(bg) % P`, `d = ±1` (insert/tombstone). The winner
  *    probe reads exactly ONE directory (`pbkt` of the winning bigram)
  *    and resolves presence by `sum(d) > 0` per doc. A merge round
  *    appends only the SYMMETRIC DIFFERENCE of each affected doc's
  *    distinct-bigram set (old vs rewritten text) — bigrams present in
  *    both versions produce no rows at all.
  *
  * The global pair-count table that picks each winner stays a flat
  * vocabulary-bounded frame maintained by the same `-old +new` delta
  * algebra as `bpeTrainOn` (one full count at round 1, deltas after),
  * and the winner argmax remains the 1-row driver reduction every
  * greedy BPE trainer has — merges are inherently sequential decisions.
  *
  * Per-round cost, B corpus buckets / P postings buckets / A affected
  * docs: one 1-dir postings probe, a read of ≤min(A,B) corpus bucket
  * dirs, two explodes over the A-doc slice, and appends sized by the
  * slice. Zero full-corpus passes. The classic LSM residual applies —
  * appended deltas accumulate one small file set per round until a
  * background compaction folds them (exactly the story a streaming
  * upsert sink has); readers stay correct throughout because
  * resolution is by (ver) / sum(d), not by file layout.
  *
  * The greedy semantics (framed non-overlapping replace, count
  * tie-break on (cnt desc, w1, w2), exhaustion stop) are bit-identical
  * to `MiningQueries.bpeTrainOn` — BpeIndexedTrainerSpec asserts
  * merges, final corpus, AND maintained counts equal the from-scratch
  * recount trainer on chained / tied / overlapping / exhausting
  * corpora, and asserts the file-pruning properties (1/P probe dirs,
  * affected-only corpus dirs) that are the point of the index.
  *
  * Not registry-wired: the registry's `phrase_merges_bpe` keeps its
  * k=3 head-winner recount plan (frozen registry; the gate in
  * `bpeTrainOn` already picks the cheapest regime there). Scale
  * placement is MEASURED, not prose (BPE_CROSSOVER_r12{,_sf10}.json,
  * BPE_CROSSOVER_r13_{sf100,sf250}.json): this trainer LOSES to the
  * recount trainer at every measured (k, corpus) cell from 0.2 GB to
  * 52 GB. r12 blamed a fixed per-round constant (postings probe,
  * append writes, ~6 extra jobs ≈ 4–7 s) and extrapolated a ~10 GiB
  * break-even; the r13 cells past that point (21 GB: 164.6 s vs
  * 129.9 s recount; 52 GB: 292.3 s vs 188.9 s) showed the round cost
  * is NOT fixed — the merged bigram's postings slice grows linearly
  * with the corpus, and the indexed slope is the worse one — so
  * [[BpeOps.pickIndexedTrainer]] never auto-selects this trainer.
  * It stays for the incremental re-training shape (corpus grows,
  * merges replayed over the delta), which no from-scratch cell
  * exercises.
  */
object BpeIndexedTrainer {

  /** Per-round I/O evidence, returned so specs and the probe tool can
    * assert/report the pruning instead of trusting the prose. */
  final case class RoundStats(
      step: Long,
      affectedDocs: Long,
      corpusDirsRead: Int,
      corpusDirsTotal: Int,
      postingsDirsRead: Int,
      postingsDirsTotal: Int,
      postingsRowsAppended: Long,
      corpusRowsAppended: Long)

  private def tokens(c: org.apache.spark.sql.Column) = TextOps.tokens(c)
  private def bigrams(c: org.apache.spark.sql.Column) =
    TextOps.bigrams(TextOps.tokens(c))

  private def partDirs(root: String): Int =
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.contains("="))

  private def deleteRecursively(f: File): Unit =
    DerivedStore.deleteRecursively(f)

  /** Parquet data files under `root`, recursively — the LSM growth
    * metric compaction exists to reset. */
  def dataFiles(root: String): Int = {
    def walk(f: File): Int =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new File(root))
  }

  /** Fold the accumulated per-round append files into a fresh
    * single-generation base: superseded doc versions dropped
    * (latest-version-wins made physical), postings tombstone pairs
    * cancelled (only `sum(d) > 0` presence rows survive, renormalized
    * to d = 1). Readers resolve by version / sum(d) either way, so
    * compaction changes NOTHING semantically — the specs assert
    * bit-equal training through mid-run compactions — it only resets
    * the small-file growth an append-per-round log accumulates.
    *
    * Swap discipline: the resolved content is MATERIALIZED
    * (localCheckpoint) before any directory is touched, then written to
    * a sibling tmp dir and swapped in with two renames. The trainer is
    * the store's single owner and compaction runs between rounds, so
    * the non-atomic window needs no concurrent-reader story — a SERVED
    * store would go through DerivedStore's versioned publish instead. */
  /** Roll back a swap the previous [[compact]] crashed in the middle of:
    * the two-rename publish has a window (live dir retired, tmp not yet
    * renamed in) where `path` is missing and `.compact_old` holds the
    * only copy — restore it BEFORE anything reads or deletes. Idempotent
    * and cheap (two existence probes), so [[compact]] runs it
    * unconditionally on entry; BpeIndexedTrainerSpec exercises the
    * crash-window shape explicitly. */
  private def recoverSwap(path: String): Unit = {
    val old = new File(path + ".compact_old")
    if (!new File(path).exists() && old.exists())
      require(old.renameTo(new File(path)),
        s"compact: cannot restore crashed swap from $old")
  }

  def compact(s: SparkSession, root: String,
              corpusBuckets: Int = 16, postingsBuckets: Int = 16): Unit = {
    recoverSwap(s"$root/corpus"); recoverSwap(s"$root/postings")
    def swapIn(resolved: DataFrame, path: String, partCol: String): Unit = {
      val out = SessionOps.truncate(resolved)
      out.count() // force full materialization before unlinking sources
      val tmp = new File(path + ".compact_tmp")
      val old = new File(path + ".compact_old")
      // a crashed previous fold may have left either sibling behind.
      // They are garbage ONLY once `path` itself exists: a crash in the
      // window between the two publish renames below leaves `path`
      // missing with `.compact_old` holding the ONLY copy of the store
      // — recovery (handled in [[recoverSwap]] before any read) must
      // have restored it before this delete runs, and the recover-first
      // order is what makes the deletion safe even if the scratch-dir
      // contract ("fresh root per run") is ever relaxed.
      deleteRecursively(tmp); deleteRecursively(old)
      DerivedStore.writePartitioned(
        out.repartition(org.apache.spark.sql.functions.col(partCol)),
        tmp.getAbsolutePath, Seq(partCol))
      require(new File(path).renameTo(old), s"compact: cannot retire $path")
      require(tmp.renameTo(new File(path)), s"compact: cannot publish $tmp")
      deleteRecursively(old)
      SessionOps.releaseQuiet(out)
    }
    import org.apache.spark.sql.functions.{col, lit, pmod, sum, xxhash64}
    swapIn(
      DedupOps.latestWins(s.read.parquet(s"$root/corpus"),
          col("doc_id"), Seq(col("ver").desc))
        .select(col("doc_id"), col("text"), col("n_raw"), col("ver"),
          pmod(xxhash64(col("doc_id")), lit(corpusBuckets)).as("bkt")),
      s"$root/corpus", "bkt")
    swapIn(
      s.read.parquet(s"$root/postings")
        .groupBy(col("bg"), col("doc_id")).agg(sum(col("d")).as("sd"))
        .filter(col("sd") > 0)
        .select(col("bg"), col("doc_id"), lit(1).as("d"),
          pmod(xxhash64(col("bg")), lit(postingsBuckets)).as("pbkt")),
      s"$root/postings", "pbkt")
  }

  /** Train `k` greedy merges over `corpus0(doc_id, text, n_raw)`,
    * staging the indexed state under `root` (a fresh scratch dir per
    * run — the store is the trainer's working state, not a served
    * artifact). `compactEvery > 0` folds the append log every that many
    * rounds ([[compact]]) — the long-run mode, where the log would
    * otherwise accumulate one small file set per round. Returns
    * (merges, final corpus, final pair counts, per-round stats). */
  def train(s: SparkSession, corpus0: DataFrame, k: Long, root: String,
            corpusBuckets: Int = 16, postingsBuckets: Int = 16,
            compactEvery: Int = 0)
      : (DataFrame, DataFrame, DataFrame, Seq[RoundStats]) = {
    import s.implicits._
    val cRoot = s"$root/corpus"
    val pRoot = s"$root/postings"

    def pairCounts(c: DataFrame): DataFrame = BpeOps.pairCounts(c)

    // ---- one-time index build (the amortized full pass) -----------------
    // Materialize the input ONCE: the build consumes it three times (the
    // corpus store, the postings store, the initial pair count) — left
    // lazy, the caller's lineage (scan + spread + tokenize) would
    // execute three times, making the "amortized full pass" three.
    val corpusIn = SessionOps.truncate(corpus0)
    // writePartitioned, not a bare partitionBy write: a degenerate corpus
    // (no rows / no bigrams) must still leave a READABLE store behind.
    // repartition on the bucket column first: without it every input
    // task writes a file into every bucket dir (tasks × buckets files —
    // and B is MEANT to scale with the corpus so the affected slice
    // stays ≪ B, which makes that a file explosion); keyed on the
    // bucket, each dir's rows land in few tasks = few files per dir.
    DerivedStore.writePartitioned(
      corpusIn.select(col("doc_id"), col("text"), col("n_raw"),
        lit(0L).as("ver"),
        pmod(xxhash64(col("doc_id")), lit(corpusBuckets)).as("bkt"))
        .repartition(col("bkt")),
      cRoot, Seq("bkt"))
    DerivedStore.writePartitioned(
      corpusIn.select(col("doc_id"),
        explode(array_distinct(bigrams(col("text")))).as("bg"))
        .select(col("bg"), col("doc_id"), lit(1).as("d"),
          pmod(xxhash64(col("bg")), lit(postingsBuckets)).as("pbkt"))
        .repartition(col("pbkt")),
      pRoot, Seq("pbkt"))
    var counts = SessionOps.truncate(pairCounts(corpusIn))
    // All three consumers have materialized; every later round reads the
    // STORES, so the input copy is dead — release its blocks.
    SessionOps.releaseQuiet(corpusIn)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val stats = scala.collection.mutable.ArrayBuffer.empty[RoundStats]
    var step = 1L
    var exhausted = false
    while (step <= k && !exhausted) {
      // Winner + framed replace come from BpeOps — the ONE implementation
      // of the greedy semantics shared with MiningQueries.bpeTrainOn, so
      // the two trainers cannot drift apart.
      val topOpt = BpeOps.winner(counts)
      if (topOpt.isEmpty) exhausted = true
      else {
        val (w1, w2, cnt) = topOpt.get
        merges += ((step, w1, w2, cnt))
        val winnerBg = s"$w1 $w2"

        // ---- probe: ONE postings directory, presence = sum(d) > 0 -------
        // The bucket ordinal must be Spark's own hash of the winner (a
        // driver-side reimplementation of xxhash64 would be a parity
        // bug waiting to happen) — one 1-row local job computes it.
        val pb = s.range(1)
          .select(pmod(xxhash64(lit(winnerBg)), lit(postingsBuckets)))
          .head().getLong(0)
        val probeDir = s"$pRoot/pbkt=$pb"
        val affected = SessionOps.truncate(
          s.read.option("basePath", pRoot).parquet(probeDir)
            .filter(col("bg") === winnerBg)
            .groupBy(col("doc_id")).agg(sum(col("d")).as("d"))
            .filter(col("d") > 0).select(col("doc_id")))
        val nAffected = affected.count()

        // ---- read ONLY the corpus buckets the affected ids hash to ------
        // Bounded driver collect: ≤ corpusBuckets distinct ordinals, by
        // construction (the same bounded-collect class as the IVF
        // probe-cell list).
        val bkts = affected
          .select(pmod(xxhash64(col("doc_id")), lit(corpusBuckets)).as("bkt"))
          .distinct().collect().map(_.getLong(0)).sorted
        val dirs = bkts.map(b => s"$cRoot/bkt=$b")
        val bucketRows = s.read.option("basePath", cRoot).parquet(dirs.toIndexedSeq: _*)
        val affectedOld = SessionOps.truncate(DedupOps.latestWins(
            bucketRows, col("doc_id"), Seq(col("ver").desc))
          .join(affected, Seq("doc_id"), "left_semi")
          .select(col("doc_id"), col("text"), col("n_raw")))

        // ---- rewrite the slice (framed non-overlapping replace) ---------
        val rewritten = SessionOps.truncate(affectedOld
          .select(col("doc_id"),
            BpeOps.applyMerge(col("text"), w1, w2).as("text"),
            col("n_raw")))

        // ---- append: new doc versions into their bucket dirs ------------
        rewritten
          .select(col("doc_id"), col("text"), col("n_raw"),
            lit(step).as("ver"),
            pmod(xxhash64(col("doc_id")), lit(corpusBuckets)).as("bkt"))
          .repartition(col("bkt"))
          .write.mode("append").partitionBy("bkt").parquet(cRoot)

        // ---- append: postings symmetric difference with tombstones ------
        def docBigramSet(c: DataFrame, d: Int): DataFrame =
          c.select(col("doc_id"),
            explode(array_distinct(bigrams(col("text")))).as("bg"))
            .withColumn("d", lit(d))
        val pDelta = SessionOps.truncate(docBigramSet(affectedOld, -1)
          .unionByName(docBigramSet(rewritten, 1))
          .groupBy(col("doc_id"), col("bg")).agg(sum(col("d")).as("d"))
          .filter(col("d") =!= 0)
          .select(col("bg"), col("doc_id"), col("d").cast("int").as("d"),
            pmod(xxhash64(col("bg")), lit(postingsBuckets)).as("pbkt")))
        val pRows = pDelta.count()
        pDelta.repartition(col("pbkt"))
          .write.mode("append").partitionBy("pbkt").parquet(pRoot)

        // ---- maintain the global pair counts by the same delta algebra --
        def occ(c: DataFrame, d: Int): DataFrame =
          c.select(explode(bigrams(col("text"))).as("bg"), lit(d.toLong).as("cnt"))
        val prevCounts = counts
        counts = SessionOps.truncate(counts.unionByName(
            occ(affectedOld, -1).unionByName(occ(rewritten, 1))
              .groupBy(col("bg")).agg(sum(col("cnt")).as("cnt")))
          .groupBy(col("bg")).agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") > 0))
        // localCheckpoint is eager, so the superseded table is dead here.
        SessionOps.releaseQuiet(prevCounts)

        stats += RoundStats(step, nAffected,
          corpusDirsRead = dirs.length, corpusDirsTotal = partDirs(cRoot),
          postingsDirsRead = 1, postingsDirsTotal = partDirs(pRoot),
          postingsRowsAppended = pRows, corpusRowsAppended = nAffected)
        // The round's slice checkpoints are dead once appended — release
        // them, or a long (50k-merge) run pins one small RDD set per
        // round in executor storage for the trainer's lifetime.
        Seq(affected, affectedOld, rewritten, pDelta).foreach(SessionOps.releaseQuiet)
        if (compactEvery > 0 && step % compactEvery == 0)
          compact(s, root, corpusBuckets, postingsBuckets)
      }
      step += 1
    }

    val finalCorpus = DedupOps.latestWins(
        s.read.parquet(cRoot), col("doc_id"), Seq(col("ver").desc))
      .select(col("doc_id"), col("text"), col("n_raw"))
    (merges.toSeq.toDF("step", "w1", "w2", "cnt"), finalCorpus, counts,
      stats.toSeq)
  }
}
