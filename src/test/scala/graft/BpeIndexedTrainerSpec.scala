package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BpeIndexedTrainer, TextOps}

/** The fully-indexed BPE trainer (LSM corpus + postings stores,
  * BpeIndexedTrainer) must be bit-equal to the from-scratch recount
  * trainer — same merges, same final corpus, same maintained pair
  * counts — AND must actually deliver the I/O shape that justifies it:
  * a 1-directory postings probe and corpus reads confined to the
  * buckets the affected docs hash to. Both halves are asserted; the
  * pruning claims come from the trainer's own RoundStats, which count
  * real directories on disk. */
class BpeIndexedTrainerSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private def run(texts: Seq[String], k: Long,
                  corpusBuckets: Int = 8, postingsBuckets: Int = 8) = {
    val root = Files.createTempDirectory("graft_bpe_idx").toString
    BpeIndexedTrainer.train(spark, BpeTestOracle.corpusDF(spark, texts), k, root,
      corpusBuckets, postingsBuckets)
  }

  private def check(texts: Seq[String], k: Long)
      : Seq[BpeIndexedTrainer.RoundStats] = {
    val (gotM, gotC, gotCounts, stats) = run(texts, k)
    val merges = BpeTestOracle.collectMerges(gotM)
    val corpus = BpeTestOracle.collectCorpus(gotC)
    val (expM, expC) = BpeTestOracle.naiveTrain(BpeTestOracle.corpusDF(spark, texts), k)
    assert(merges == expM, s"merge sequence diverged for $texts")
    assert(corpus == expC, s"final corpus diverged for $texts")
    // Maintained counts must equal a recount of the final corpus —
    // catches delta-algebra errors that happen not to flip any winner.
    val maintained = gotCounts.collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val recount = BpeTestOracle.recount(gotC)
    assert(maintained == recount, s"maintained counts != recount for $texts")
    stats
  }

  test("chained merges: round-2 winner contains the round-1 product") {
    // a_b c wins round 2 — the postings delta must have retired the
    // (a,b)/(b,c) rows and introduced (a_b,c) a round earlier.
    check(Seq("a b c a b c a b c", "a b c d", "x y"), 4L)
  }

  test("tie-breaking is lexicographic on (w1, w2)") {
    check(Seq("b a", "b a", "c d", "c d", "a z", "a z", "a y", "a y"), 3L)
  }

  test("overlapping occurrences merge greedily left-to-right") {
    check(Seq("x x x x", "x x x x"), 3L)
  }

  test("exhaustion: trainer stops when no bigram remains") {
    val stats = check(Seq("a b", "a b", ""), 3L)
    assert(stats.size == 1, "only one merge should have run")
  }

  test("empty and single-token docs contribute nothing") {
    check(Seq("", "solo", "p q p q", "p q"), 3L)
  }

  test("deep run: six indexed rounds stay exact") {
    check(Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sat on the mat",
      "a quick brown cat jumps over a lazy fox",
      "the lazy dog and the lazy cat", "quick brown quick brown"), 6L)
  }

  test("I/O shape: 1-dir probe; corpus reads confined to affected buckets") {
    // 400 docs with disjoint 2-token vocabularies spread over every
    // bucket; one 3-doc needle family ("n0 n1" x3) is the only repeated
    // bigram, so each round's affected slice is tiny while the corpus
    // store is wide. Doc ids are arbitrary longs — bucket spread comes
    // from xxhash64, same as production.
    val filler = (0 until 400).map(i => s"u${i}a u${i}b")
    val texts = filler ++ Seq("n0 n1 z0", "n0 n1 z1", "n0 n1 z2")
    val stats = check(texts, 2L)
    assert(stats.nonEmpty)
    val s1 = stats.head
    // Probe: exactly one postings directory of the 8 on disk.
    assert(s1.postingsDirsRead == 1 && s1.postingsDirsTotal > 1,
      s"probe should read 1/${s1.postingsDirsTotal} postings dirs: $s1")
    // Corpus: 3 affected docs can touch at most 3 of the 8 bucket dirs.
    assert(s1.affectedDocs == 3, s"winner should touch 3 docs: $s1")
    assert(s1.corpusDirsRead <= 3 && s1.corpusDirsTotal == 8,
      s"corpus read should be confined to affected buckets: $s1")
    // Appends sized by the slice, never the corpus: each affected doc
    // rewrites once, and its postings delta is a handful of rows.
    assert(s1.corpusRowsAppended == 3, s"append = affected docs: $s1")
    assert(s1.postingsRowsAppended <= 12,
      s"postings delta must be slice-sized: $s1")
  }

  test("compaction mid-run changes nothing; the file log shrinks") {
    // Six rounds with a fold every second round: the trainer must stay
    // bit-equal to the naive oracle THROUGH compactions (resolution by
    // version / sum(d) is what compaction makes physical), and the
    // compacted store must hold fewer data files than the append log
    // it replaced.
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox sat on the mat",
      "a quick brown cat jumps over a lazy fox",
      "the lazy dog and the lazy cat", "quick brown quick brown")
    val root = Files.createTempDirectory("graft_bpe_cmp").toString
    val (gotM, gotC, _, _) = BpeIndexedTrainer.train(
      spark, BpeTestOracle.corpusDF(spark, texts), 6L, root, 8, 8, compactEvery = 2)
    val merges = gotM.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val corpus = gotC.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val (expM, expC) = BpeTestOracle.naiveTrain(BpeTestOracle.corpusDF(spark, texts), 6L)
    assert(merges == expM && corpus == expC,
      "training through mid-run compactions must stay exact")
    // A standalone fold on an uncompacted log must shrink the file set
    // and leave the resolved corpus identical.
    val root2 = Files.createTempDirectory("graft_bpe_cmp2").toString
    val (_, c2, _, _) = BpeIndexedTrainer.train(
      spark, BpeTestOracle.corpusDF(spark, texts), 6L, root2, 8, 8)
    val before = c2.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val filesBefore = BpeIndexedTrainer.dataFiles(root2)
    BpeIndexedTrainer.compact(spark, root2, 8, 8)
    val after = graft.ops.DedupOps.latestWins(
        spark.read.parquet(s"$root2/corpus"), col("doc_id"),
        Seq(col("ver").desc))
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    val filesAfter = BpeIndexedTrainer.dataFiles(root2)
    assert(after == before, "compaction must not change the resolved corpus")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the log: $filesBefore -> $filesAfter")
  }

  test("file discipline: no write fans out tasks x buckets files") {
    // 403 docs forced through 16 input partitions: WITHOUT the keyed
    // repartition before each partitioned write, the initial build
    // alone fans out ~(input tasks x bucket dirs) data files — and B
    // is meant to scale with the corpus, so that product explodes
    // exactly when the index matters. Keyed on the bucket column,
    // every bucket's rows collapse into one task, so each write lands
    // at most ONE data file per directory; the store's file count is
    // bounded by dirs-touched summed over writes, never tasks x dirs.
    val filler = (0 until 400).map(i => s"u${i}a u${i}b")
    val texts = filler ++ Seq("n0 n1 z0", "n0 n1 z1", "n0 n1 z2")
    val root = Files.createTempDirectory("graft_bpe_files").toString
    val (_, _, _, stats) = BpeIndexedTrainer.train(
      spark, BpeTestOracle.corpusDF(spark, texts).repartition(16),
      2L, root, 8, 8)
    val corpusBound = 8 + stats.map(_.corpusDirsRead).sum
    val postingsBound =
      8 + stats.map(s => math.min(s.postingsRowsAppended, 8L)).sum
    val corpusFiles = BpeIndexedTrainer.dataFiles(s"$root/corpus")
    val postingsFiles = BpeIndexedTrainer.dataFiles(s"$root/postings")
    assert(corpusFiles <= corpusBound,
      s"corpus store fanned out: $corpusFiles files > bound $corpusBound")
    assert(postingsFiles <= postingsBound,
      s"postings store fanned out: $postingsFiles files > bound $postingsBound")
  }

  test("compact recovers a swap crashed between the two publish renames") {
    // The two-rename publish has a window where the live dir is retired
    // (renamed to .compact_old) but the tmp is not yet renamed in: `path`
    // is missing and .compact_old holds the ONLY copy. A compact run
    // entered in that state must restore the store before its
    // delete-siblings step, or the whole store is silently lost.
    val texts = Seq("a b c a b c", "a b d", "x y")
    val root = Files.createTempDirectory("graft_bpe_crash").toString
    val (_, c0, _, _) = BpeIndexedTrainer.train(
      spark, BpeTestOracle.corpusDF(spark, texts), 2L, root, 8, 8)
    val expect = c0.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    // Simulate the crash window for BOTH stores: live dir retired, a
    // stale tmp left behind (as an interrupted writePartitioned would).
    for (store <- Seq("corpus", "postings")) {
      val live = new java.io.File(s"$root/$store")
      assert(live.renameTo(new java.io.File(s"$root/$store.compact_old")))
      assert(new java.io.File(s"$root/$store.compact_tmp").mkdirs())
    }
    BpeIndexedTrainer.compact(spark, root, 8, 8)
    val after = graft.ops.DedupOps.latestWins(
        spark.read.parquet(s"$root/corpus"), col("doc_id"),
        Seq(col("ver").desc))
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(after == expect,
      "compact entered in the crash window must recover the store, not delete it")
  }

  test("postings tombstones: a bigram removed then re-created stays exact") {
    // Round 1 merges (p,q) everywhere, deleting bigram "q r"; the doc
    // "z p q r" still holds "p_q r". Round 2 merges (p_q,r) — its
    // probe must see the LIVE (p_q r) rows appended in round 1, and
    // the retired (q,r)/(p,q) rows must not resurrect. 4 rounds runs
    // the store to exhaustion.
    check(Seq("p q r s", "p q r t", "p q u v", "z p q r"), 4L)
  }

  test("trainer pick is wired to the MEASURED crossover artifacts") {
    // r12: the recount-vs-indexed decision must follow the committed
    // measurement, not prose. r13 extended the artifact set past the
    // r12-extrapolated ~10 GiB break-even (21 GB sf100, 52 GB sf250
    // cells) and the measurement refuted the extrapolation twice over:
    // indexed still loses at every cell AND its slope in corpus bytes
    // is the worse one across the 21->52 GB segment, so no crossover
    // exists and the threshold is the off-switch (Long.MaxValue — the
    // auto path can never reach the dominated trainer; only an explicit
    // corpusBytes override does). A future re-measurement that flips a
    // cell or the slope ordering should update the artifact AND the
    // constant together — this test forces the pairing.
    def cells(path: String): Seq[(Double, Double)] = {
      val f = new java.io.File(path)
      assert(f.exists(), s"crossover artifact missing: $path")
      val s = scala.io.Source.fromFile(f, "UTF-8").mkString
      val rx = """"recount_s":([0-9.]+),"indexed_s":([0-9.]+)""".r
      rx.findAllMatchIn(s).map(m => (m.group(1).toDouble, m.group(2).toDouble)).toSeq
    }
    val all = cells("BPE_CROSSOVER_r12.json") ++ cells("BPE_CROSSOVER_r12_sf10.json") ++
      cells("BPE_CROSSOVER_r13_sf100.json") ++ cells("BPE_CROSSOVER_r13_sf250.json")
    assert(all.size >= 7, s"expected >= 7 measured cells, got ${all.size}")
    all.foreach { case (recount, indexed) =>
      assert(indexed > recount,
        f"a measured cell favors the indexed trainer ($indexed%.2f < $recount%.2f) " +
          "— re-derive TRAINER_CROSSOVER_BYTES from the new artifact")
    }
    // slope ordering over the two large-corpus cells (21 GB vs 52 GB at
    // k=12): the indexed trainer's marginal s/GB must still exceed
    // recount's, the fact that makes "no crossover" the right placement
    val Seq((rec21, idx21)) = cells("BPE_CROSSOVER_r13_sf100.json")
    val Seq((rec52, idx52)) = cells("BPE_CROSSOVER_r13_sf250.json")
    assert(idx52 - idx21 > rec52 - rec21,
      "indexed slope no longer dominates recount's — a finite byte " +
        "crossover may exist again; re-derive TRAINER_CROSSOVER_BYTES")
    val gb = 1024L * 1024 * 1024
    assert(graft.ops.BpeOps.TRAINER_CROSSOVER_BYTES > 52 * gb,
      "threshold must sit beyond the largest measured corpus (52 GB)")
    assert(!graft.ops.BpeOps.pickIndexedTrainer(2 * gb))
    assert(!graft.ops.BpeOps.pickIndexedTrainer(100 * gb),
      "auto path reached the dominated indexed trainer")
    assert(graft.ops.BpeOps.pickIndexedTrainer(Long.MaxValue),
      "explicit override seam must still reach the indexed trainer")
  }

  test("trainAuto dispatches on the measured crossover, bit-equal both ways") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b c d", 6L), (2L, "a b a b", 4L), (3L, "c d a b", 4L))
      .toDF("doc_id", "text", "n_raw")
    def run(forcedBytes: Long): Seq[(Long, String, String, Long)] = {
      val root = java.nio.file.Files.createTempDirectory("graft-auto").toString
      val (m, c) = graft.ops.BpeOps.trainAuto(
        spark, corpus, 2L, root, corpusBytes = forcedBytes)
      val merges = m.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      // the final corpus must reflect both merges in either regime
      assert(c.filter(col("text").contains("a b")).count() == 0,
        "returned corpus missing the applied merges")
      merges
    }
    val small = run(1L)                      // forces the recount trainer
    val big = run(Long.MaxValue)             // forces the indexed trainer
    assert(small == big,
      s"trainAuto regimes diverged: recount=$small indexed=$big")
    assert(small.nonEmpty && small.head._2 == "a" && small.head._3 == "b")
    // default sizing (optimizer estimate of a 3-row local corpus) must
    // pick the recount branch — i.e. match the forced-small result
    val root = java.nio.file.Files.createTempDirectory("graft-auto").toString
    val (m, _) = graft.ops.BpeOps.trainAuto(spark, corpus, 2L, root)
    assert(m.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq == small)
  }
}
