package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_fuzzy_minhash` — the scale-adaptive complement to the banded
  * `dedup_fuzzy_editdist` contract. Three claims, each executable:
  *
  *  1. On the fixture, its pair set is a SUPERSET of the banded
  *     baseline's (same verify, content-keyed candidates recover every
  *     pair the bounded-domain blocking finds) with identical distances
  *     on the shared pairs.
  *  2. It finds the pair class the banded generator MISSES by
  *     construction: a small-edit pair whose lengths straddle an 8-char
  *     band boundary (the baseline's in-code caveat). Planted, not
  *     hypothesized.
  *  3. Design recall is SCALE-STABLE: planted typo pairs (gram-Jaccard
  *     ≥ the 0.95 design point) are recovered at ≥ the design rate under
  *     the big-n (r, L) parameter regimes of all three scaling decades —
  *     testable on small data because (r, L) are explicit inputs to
  *     `fuzzyCandidates` (the AdaptiveLshSpec trick).
  */
class FuzzyMinhashSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  private def pairs(name: String, dir: String): Map[(Long, Long), Long] =
    SparkEntry.queries(name)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("fixture pairs: minhash candidates ⊇ banded candidates, same distances") {
    val banded = pairs("dedup_fuzzy_editdist", sf)
    val mh = pairs("dedup_fuzzy_minhash", sf)
    val missed = banded.keySet -- mh.keySet
    assert(missed.isEmpty,
      s"minhash path missed banded pairs: ${missed.take(5)} (of ${missed.size})")
    banded.foreach { case (k, d) =>
      assert(mh(k) == d, s"distance mismatch on $k: banded=$d minhash=${mh(k)}")
    }
    info(s"banded=${banded.size} pairs, minhash=${mh.size} pairs (superset)")
  }

  test("band-straddling small-edit pair: banded misses, minhash finds") {
    import spark.implicits._
    // Length 127 (band 15) vs 132 (band 16): dist = 5 ≤ ⌊132/5⌋ = 26, so
    // the pair is a true fuzzy dup under the family threshold, but the
    // (lang, len/8) blocks differ — exactly the in-code caveat on
    // dedup_fuzzy_editdist. Written as a real documents table so both
    // registry queries run unmodified.
    val t1 = "the fast key order sort table scan merge part window small " +
      "hash join spark group query row data slow filter customer line extra"
    val t2 = t1 + " part"
    assert(t1.length == 127 && t2.length == 132)
    assert(t1.length / 8 != t2.length / 8, "plant must straddle a band")
    val dir = java.nio.file.Files.createTempDirectory("graft-fuzzymh").toString
    Seq(
      (900001L, t1, "en", "plant", 127L),
      (900002L, t2, "en", "plant", 132L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val banded = pairs("dedup_fuzzy_editdist", dir)
    val mh = pairs("dedup_fuzzy_minhash", dir)
    assert(!banded.contains((900001L, 900002L)),
      "banded generator unexpectedly found the straddling pair — plant stale")
    assert(mh.get((900001L, 900002L)).contains(5L),
      s"minhash path must find the planted pair at dist 5, got $mh")
  }

  test("minhash coefficient family is non-degenerate (no proportional pair)") {
    // The defect this pins: a linear family (a, b) = k·(c1, c2) makes
    // h_k = k·h_0 mod P, so ONE small-valued common gram minimizes every
    // hash and half the corpus lands in a single bucket (measured:
    // 2,481 of 5,000 docs at sf0.1 before the quadratic mix). Two
    // affine hashes collide in argmin structure when (a_p, b_p) ∝
    // (a_q, b_q) mod P — assert none do across the plane range the
    // adaptive sizing can emit.
    import graft.queries.TextQueries.{fuzzyA, fuzzyB}
    val P = BigInt(graft.ops.TextOps.P)
    val coef = (0 until 200).map(p => (BigInt(fuzzyA(p)), BigInt(fuzzyB(p))))
    for (p <- coef.indices; q <- (p + 1) until coef.size) {
      val ((ap, bp), (aq, bq)) = (coef(p), coef(q))
      assert((ap * bq - aq * bp).mod(P) != BigInt(0),
        s"degenerate minhash pair at p=$p q=$q")
      assert(ap != BigInt(0), s"zero multiplier at p=$p")
    }
  }

  test("design recall is scale-stable: planted typo pairs survive big-n (r, L)") {
    import spark.implicits._
    // 150 base docs of 170 random lowercase+space chars (rich gram
    // space, unlike the 31-word fixture vocabulary), each with a 1-char
    // substitution twin: ≤8 of ~167 distinct grams perturbed, gram-jac
    // ≥ ~0.95 — the s* design point the band law amplifies for.
    val rnd = new scala.util.Random(7)
    def txt() = (0 until 170).map { i =>
      if (i % 8 == 7) ' ' else ('a' + rnd.nextInt(26)).toChar
    }.mkString
    val base = (0 until 150).map(i => (i.toLong, txt()))
    val dups = base.map { case (id, t) =>
      val k = 3 + rnd.nextInt(t.length - 6)
      (10000L + id, t.updated(k, if (t(k) == 'q') 'z' else 'q'))
    }
    val docs = (base ++ dups).map { case (id, t) =>
      (id, t, "en", "plant", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val truth = base.map { case (id, _) => (id, 10000L + id) }.toSet
    // the three decades' regimes: sf0.1 (r=9), sf1 (r=12), sf10 (r=15)
    for (r <- Seq(9, 12, 15)) {
      val l = graft.queries.TextQueries.fuzzyBands(r)
      val got = graft.queries.TextQueries
        .fuzzyCandidates(spark, docs, r, l)
        .candidates.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val recall = truth.count(got.contains).toDouble / truth.size
      info(f"r=$r L=$l planted typo-pair candidate recall: $recall%.3f")
      assert(recall >= 0.85,
        f"design recall decayed at r=$r (L=$l): $recall%.3f < 0.85")
    }
  }
}
