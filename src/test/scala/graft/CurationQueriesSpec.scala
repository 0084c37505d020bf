package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CurationQueries

/** Round-4 curation operators: decontamination, repetition filters,
  * source balancing, sliding-window chunking, semantic dedup, int8
  * quantization. Values are oracle-checked by the driver; these specs pin
  * the structural invariants the hash compare can't express. */
class CurationQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val SF = "/root/testdata/sf0.001"

  private def q(name: String) = CurationQueries.queries(name)(spark, SF)

  // ---- decontamination --------------------------------------------------

  test("decontaminate_ngram: covers exactly the non-benchmark docs, hits iff shared shingle") {
    val out = q("decontaminate_ngram").cache()
    val docs = graft.model.Tables.documents(spark, SF)
    val expected = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(out.count() == expected, "one row per training doc")
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0,
      "benchmark docs never appear in the training output")
    assert(out.filter(col("contaminated") =!= (col("n_hits") > 0)).count() == 0,
      "contaminated flag is exactly n_hits > 0")
    // an exact copy of a benchmark doc must be flagged: doc 0 is in the
    // benchmark set; any training doc with identical text shares all
    // shingles. Build the check from data so it holds on any SF.
    val benchTexts = docs.filter(col("doc_id") % 97 === 0).select(col("text"))
    val copies = docs.filter(col("doc_id") % 97 =!= 0)
      .join(benchTexts, "text").select(col("doc_id"))
    val missed = copies.join(out.filter(!col("contaminated")), "doc_id")
    assert(missed.count() == 0, "verbatim benchmark copies must be flagged")
  }

  // ---- repetition filters ----------------------------------------------

  test("quality_repetition: ratios bounded and consistent with a hand count") {
    val out = q("quality_repetition").cache()
    assert(out.filter(col("top_unigram_frac") <= 0 || col("top_unigram_frac") > 1).count() == 0)
    assert(out.filter(col("top_bigram_frac") < 0 || col("top_bigram_frac") > 1).count() == 0)
    // hand-check one row against a driver-side count
    val row = out.orderBy("doc_id").first()
    val text = graft.model.Tables.documents(spark, SF)
      .filter(col("doc_id") === row.getLong(0)).head().getAs[String]("text")
    val toks = text.split(" ", -1)
    val topUni = toks.groupBy(identity).values.map(_.length).max
    assert(row.getDouble(2) == topUni.toDouble / toks.length)
  }

  test("quality_repetition is map-side only: no shuffle in the plan") {
    val df = q("quality_repetition")
    df.count()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "per-document ratios must not shuffle")
  }

  // ---- source balancing -------------------------------------------------

  test("source_cap_sample: at most 15 per source, deterministic, subset of corpus") {
    val out = q("source_cap_sample").cache()
    val over = out.groupBy("source").count().filter(col("count") > 15)
    assert(over.count() == 0, "cap respected per source")
    val again = q("source_cap_sample").collect().toSet
    assert(out.collect().toSet == again, "sample is deterministic")
    // a source with <= 15 docs is kept whole
    val small = graft.model.Tables.documents(spark, SF)
      .groupBy("source").count().filter(col("count") <= 15)
    val keptCounts = out.groupBy("source").count()
    val mismatched = small.alias("s")
      .join(keptCounts.alias("k"), "source")
      .filter(col("s.count") =!= col("k.count"))
    assert(mismatched.count() == 0, "under-cap sources keep every doc")
  }

  // ---- chunking ---------------------------------------------------------

  test("chunk_sliding_window: chunks reconstruct the document with 50% overlap") {
    val out = q("chunk_sliding_window")
    val docs = graft.model.Tables.documents(spark, SF)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.collect().groupBy(_.getLong(0)).foreach { case (id, rows) =>
      val toks = docs(id).split(" ", -1)
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) == 0, "chunk indices start at 0")
      sorted.foreach { r =>
        val st = (r.getLong(1) * 8).toInt
        val expect = toks.slice(st, math.min(toks.length, st + 16))
        assert(r.getString(2) == expect.mkString(" "),
          s"chunk ${r.getLong(1)} of doc $id")
        assert(r.getLong(3) == expect.length)
      }
      // every token position is covered by at least one chunk
      val covered = sorted.map(_.getLong(1) * 8).max + 16
      assert(covered >= toks.length, s"doc $id tail uncovered")
    }
  }

  test("chunk_sliding_window is map-side only: no shuffle in the plan") {
    val df = q("chunk_sliding_window")
    df.count()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "chunking must not shuffle")
  }

  // ---- semantic dedup ---------------------------------------------------

  test("semantic_dedup_ivf: one verdict per vector; kept set has no intra-cell near-dup pair") {
    val out = q("semantic_dedup_ivf").cache()
    val n = graft.model.Tables.embeddings(spark, SF).count()
    assert(out.count() == n, "one verdict per vector")
    // among KEPT vectors of the same cell, no pair at or above the
    // threshold may remain where the lower id is also kept (the drop rule
    // removes the higher id of every offending pair)
    val kept = out.filter(col("kept"))
      .join(graft.model.Tables.embeddings(spark, SF), "vec_id")
      .select(col("vec_id"), col("c_id"), col("embedding"))
    val a = kept.select(col("c_id"), col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = kept.select(col("c_id"), col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val survivors = a.join(b, Seq("c_id"))
      .filter(col("a_id") < col("b_id") &&
        graft.expressions.CosineSimilarity.cosineSim(col("a_emb"), col("b_emb")) >= 0.3)
    assert(survivors.count() == 0, "kept set still contains a near-dup pair")
  }

  // ---- composed pipeline ------------------------------------------------

  test("corpus_curation_pipeline: every stage's invariant holds on the survivors") {
    val out = q("corpus_curation_pipeline").cache()
    assert(out.count() > 0)
    assert(out.select("doc_id").distinct().count() == out.count(), "unique docs")
    assert(out.filter(col("doc_id") % 97 === 0).count() == 0, "no benchmark docs")
    assert(out.groupBy("source").count().filter(col("count") > 15).count() == 0,
      "per-source cap respected")
    // survivors pass the repetition filter (re-derive via the public query)
    val failing = q("quality_repetition").filter(!col("keep")).select("doc_id")
    assert(out.join(failing, "doc_id").count() == 0, "no low-quality doc survives")
    // survivors are decontaminated
    val dirty = q("decontaminate_ngram").filter(col("contaminated")).select("doc_id")
    assert(out.join(dirty, "doc_id").count() == 0, "no contaminated doc survives")
  }

  // ---- quantization -----------------------------------------------------

  test("embedding_quantize_int8: values stay in the int8 grid and l1 bounds the sum") {
    val out = q("embedding_quantize_int8").cache()
    assert(out.count() == graft.model.Tables.embeddings(spark, SF).count())
    // |q_sum| <= q_l1 <= 127 * dims
    assert(out.filter(abs(col("q_sum")) > col("q_l1")).count() == 0)
    assert(out.filter(col("q_l1") > 127L * 64).count() == 0)
    assert(out.filter(col("scale") < 0).count() == 0)
    // at least one coordinate hits the grid edge for a max-abs scale:
    // the max-abs element quantizes to exactly ±127, so q_l1 >= 127
    assert(out.filter(col("scale") > 0 && col("q_l1") < 127).count() == 0,
      "max-abs coordinate must reach the grid edge")
  }

  // ---- gopher rule gate --------------------------------------------------

  test("quality_gopher_rules: passes flag is exactly the conjunction of the reported rules") {
    val out = q("quality_gopher_rules").cache()
    assert(out.count() == graft.model.Tables.documents(spark, SF).count())
    val recomputed = out.withColumn("expect",
      col("n_words").between(10, 200) &&
        col("mean_word_len") >= 2.0 && col("mean_word_len") <= 8.0 &&
        col("distinct_ratio") >= 0.3 &&
        col("n_stop") >= 2)
    assert(recomputed.filter(col("passes") =!= col("expect")).count() == 0,
      "gate must equal the conjunction of its published rules")
  }

  test("quality_gopher_rules is map-side only: no shuffle in the plan") {
    val df = q("quality_gopher_rules")
    df.count()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty, "the first-pass gate must not shuffle")
  }
}
