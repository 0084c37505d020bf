package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleUpGen

/** The generator-honesty gate (r15, the r14 corpus-corruption lesson
  * encoded as failing tests): a scale-up transform must be honest at
  * EVERY granularity an operator consumes. The r13 suffix-tag document
  * transform was honest at the token level yet injected universal
  * char-grams that saturated fuzzy minhash bands — candidate pairs grew
  * 139×/1660× per decade against a 10×/14× design law, and two rounds
  * mis-attributed that to the operators (SCALING_r12/r13, retracted
  * r14). These tests pin the invariants on ScaleUpGen's actual column
  * transforms at tiny scale, so the next corrupting transform is a red
  * test, not a forensic finding:
  *
  *  - documents: LETTERED char-4-gram sets disjoint across copies
  *    (pure punctuation/digit grams are copy-invariant by construction
  *    and vanishingly rare as minimizers), and within-copy pair-level
  *    gram Jaccard EXACTLY the source pair's (character bijection ⇒
  *    1:1 gram map);
  *  - embeddings: every per-copy map preserves within-copy dot products
  *    (orthogonality ⇒ cosine/ANN neighborhood structure replicates),
  *    and per-copy maps are pairwise distinct (no copy aliases another
  *    into spurious cross-copy duplicates);
  *  - the negative control: the retracted suffix-tag transform FAILS
  *    the within-copy invariant here — the gate would have caught r13's
  *    corruption before a single probe ran.
  */
class GeneratorHonestySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val sf = "/root/testdata/sf0.001"

  /** Sliding char-4-grams, the granularity dedup_fuzzy_minhash consumes. */
  private def grams(s: String): Set[String] =
    if (s.length < 4) Set(s) else s.sliding(4).toSet

  private def lettered(g: String): Boolean =
    g.exists(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c >= 0x100)

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size

  /** `copies` upscaled texts per source doc under the given transform:
    * (copy, doc_id) -> text. */
  private def upscaled(
      tf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column,
      copies: Int, nDocs: Int): Map[(Int, Long), String] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(nDocs)
    docs.withColumn("copy", explode(array((0 until copies).map(lit): _*)))
      .withColumn("text2", tf(col("text"), col("copy")))
      .select(col("copy"), col("doc_id"), col("text2"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
  }

  test("documents (chain bijection): lettered gram sets disjoint across copies") {
    val copies = 3
    val up = upscaled(ScaleUpGen.blockShift(_, _, copies, 1), copies, 30)
    val byCopy = (0 until copies).map { c =>
      c -> up.collect { case ((cc, _), t) if cc == c => grams(t) }
        .foldLeft(Set.empty[String])(_ ++ _)
    }.toMap
    for (i <- 0 until copies; j <- (i + 1) until copies) {
      val shared = byCopy(i).intersect(byCopy(j)).filter(lettered)
      assert(shared.isEmpty,
        s"copies $i/$j share ${shared.size} lettered grams, e.g. " +
          s"${shared.take(3).mkString("[", ", ", "]")} — the r13 corruption class")
    }
  }

  test("documents (chain2 composition): all copies^2 effective copies stay gram-disjoint") {
    // decade 3 (srcBlocks = 1) composed with decade 4 (srcBlocks =
    // copies): the composed block index must be unique per (c3, c4), so
    // every pair of the 9 effective copies is lettered-gram-disjoint.
    val copies = 3
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(15)
    val both = docs
      .withColumn("c3", explode(array((0 until copies).map(lit): _*)))
      .withColumn("c4", explode(array((0 until copies).map(lit): _*)))
      .withColumn("text2", ScaleUpGen.blockShift(
        ScaleUpGen.blockShift(col("text"), col("c3"), copies, 1),
        col("c4"), copies, copies))
      .select(col("c3"), col("c4"), col("text2")).collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => grams(r.getString(2)))
          .foldLeft(Set.empty[String])(_ ++ _)
      }
    val keys = both.keys.toSeq.sorted
    for (ai <- keys.indices; bi <- (ai + 1) until keys.size) {
      val (a, b) = (keys(ai), keys(bi))
      val shared = both(a).intersect(both(b)).filter(lettered)
      assert(shared.isEmpty,
        s"effective copies $a/$b share lettered grams — composed blocks collide")
    }
  }

  test("documents: within-copy pair Jaccard is exactly the source pair's") {
    val copies = 3
    val up = upscaled(ScaleUpGen.blockShift(_, _, copies, 1), copies, 20)
    val ids = up.keys.collect { case (0, id) => id }.toSeq.sorted
    for (c <- 1 until copies; i <- 0 until 6; j <- (i + 1) until 6) {
      val srcJ = jaccard(grams(up((0, ids(i)))), grams(up((0, ids(j)))))
      val cpJ = jaccard(grams(up((c, ids(i)))), grams(up((c, ids(j)))))
      assert(srcJ == cpJ,
        s"copy $c changed pair (${ids(i)}, ${ids(j)}) gram Jaccard: $srcJ -> $cpJ")
    }
  }

  test("NEGATIVE CONTROL: the retracted r13 suffix-tag transform fails the gate") {
    // The historical transform: every token of copy c gets the same
    // per-copy tag letter appended. Token-level honesty holds (tagged
    // vocabularies are disjoint across copies) — but every document in
    // a copy now shares the tag-adjacent grams, so two docs with
    // DISJOINT source gram sets acquire nonzero within-copy Jaccard,
    // minhash minimizers pile onto the universal grams, and band
    // signatures saturate. The within-copy invariant must go red.
    val copies = 3
    def suffixTag(text: org.apache.spark.sql.Column,
        copy: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (1 until copies).foldLeft(when(copy === 0, text)) { (acc, c) =>
        acc.when(copy === c, regexp_replace(text, "([a-z]+)",
          "$1" + ScaleUpGen.blockChar(c, 25)))
      }
    val up = upscaled(suffixTag, copies, 40)
    val ids = up.keys.collect { case (0, id) => id }.toSeq.sorted
    // the exact invariant the bijection test asserts: copy Jaccard ==
    // source Jaccard for every within-copy pair. Suffix tagging must
    // break it — the universal tag-adjacent grams inflate pair overlap.
    val violations = for {
      i <- ids.indices; j <- (i + 1) until ids.size
      srcJ = jaccard(grams(up((0, ids(i)))), grams(up((0, ids(j)))))
      c <- 1 until copies
      cpJ = jaccard(grams(up((c, ids(i)))), grams(up((c, ids(j)))))
      if cpJ != srcJ
    } yield (ids(i), ids(j), c, srcJ, cpJ)
    assert(violations.nonEmpty,
      "the suffix-tag corruption slipped past the gate — the invariant is vacuous")
    val inflated = violations.count(v => v._5 > v._4)
    assert(inflated > 0,
      "suffix-tag violations exist but none inflate overlap — check the reimplementation")
    info(s"gate catches suffix-tag: ${violations.size} within-copy pairs " +
      s"drifted from their source Jaccard ($inflated inflated)")
  }

  test("embeddings: every per-copy map preserves within-copy dot products") {
    val copies = 4
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(10)
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    def dots(tf: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Map[(Int, Long), Array[Double]] =
      e.withColumn("copy", explode(array((0 until copies).map(lit): _*)))
        .withColumn("emb2", tf(col("embedding"), col("copy")))
        .select(col("copy"), col("vec_id"), col("emb2")).collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          r.getSeq[Float](2).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    for ((name, tf) <- Seq[(String, (org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column)](
      "rotation" -> (ScaleUpGen.rotated(_, _, dims)),
      "dihedral" -> (ScaleUpGen.dihedral(_, _, copies, dims)),
      "sign-flip" -> (ScaleUpGen.signFlipped(_, _, copies)))) {
      val m = dots(tf)
      val ids = m.keys.collect { case (0, id) => id }.toSeq.sorted
      for (c <- 1 until copies; i <- 0 until 6; j <- (i + 1) until 6) {
        val src = dot(m((0, ids(i))), m((0, ids(j))))
        val cp = dot(m((c, ids(i))), m((c, ids(j))))
        assert(math.abs(src - cp) <= 1e-9 * math.max(1.0, math.abs(src)),
          s"$name copy $c broke dot(${ids(i)}, ${ids(j)}): $src -> $cp")
      }
      // and no copy aliases another: the image of a generic vector is
      // pairwise distinct across copies
      val images = (0 until copies).map(c => m((c, ids.head)).toSeq)
      assert(images.distinct.size == copies,
        s"$name aliases copies — identical images of a generic vector")
    }
  }

  test("embeddings: dihedral ∘ sign-flip composed maps are pairwise distinct") {
    // decade 3's permutation composed with decade 4's diagonal must be
    // distinct for every (c3, c4) combination, or whole copy cohorts
    // alias into duplicate vector sets and pair counts inflate BY
    // CONSTRUCTION — the vector twin of the chain2 block composition.
    val copies = 4
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(1)
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val images = e
      .withColumn("c3", explode(array((0 until copies).map(lit): _*)))
      .withColumn("c4", explode(array((0 until copies).map(lit): _*)))
      .withColumn("emb2", ScaleUpGen.signFlipped(
        ScaleUpGen.dihedral(col("embedding"), col("c3"), copies, dims),
        col("c4"), copies))
      .select(col("c3"), col("c4"), col("emb2")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toSeq).toMap
    assert(images.values.toSeq.distinct.size == copies * copies,
      "composed (dihedral, sign-flip) maps alias copies")
  }
}
