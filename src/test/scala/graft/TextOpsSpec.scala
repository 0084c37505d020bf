package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EnrichOps, TextOps}

/** Edge semantics for the text/enrichment layer: fingerprint determinism,
  * language-ID tie-breaking, quality bounds, sentiment normalization. */
class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("polyHash: deterministic fold, matches hand computation") {
    // 'abc': ((0*31+97)*31+98)*31+99 mod 1e9+7 = 96354
    val got = Seq("abc").toDF("s")
      .select(TextOps.polyHash($"s")).collect().head.getLong(0)
    assert(got == 96354L)
  }

  test("langId: argmax of profile hits; ties go to profile order") {
    val df = Seq(
      "the a fast slow",        // en words only
      "data value query",       // es words only
      "spark stream batch",     // zh words only
      "merge sort table column" // de=2 fr=2 tie -> fr wins (earlier profile)
    ).toDF("text").select(TextOps.langId(TextOps.tokens($"text")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "es", "zh", "fr"))
  }

  test("qualityScore stays in [0,1] and rewards longer, diverse docs") {
    val df = Seq(
      "a b",
      ("the quick " * 40).trim // long but repetitive
    ).toDF("text").select(TextOps.qualityScore($"text").as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("sentimentScore: normalized to (-1,1), sign follows lexicon") {
    val df = Seq("fast spark value", "slow error dup", "table column")
      .toDF("text")
      .select(EnrichOps.sentimentScore(TextOps.tokens($"text")).as("s"))
    val ss = df.collect().map(_.getDouble(0))
    assert(ss(0) > 0 && ss(0) < 1)
    assert(ss(1) < 0 && ss(1) > -1)
    assert(ss(2) == 0.0)
  }

  test("simHash: identical docs collide, signature within 16 bits") {
    val df = Seq("spark merge join", "spark merge join", "value data table")
      .toDF("text")
      .select(TextOps.simHash(TextOps.tokenHashes($"text")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs.forall(h => h >= 0 && h < 65536))
  }
}
