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

  test("embedTextBatched: one model call per batch, bit-equal to the expression path") {
    val calls = spark.sparkContext.longAccumulator("graft.embed.batchCalls")
    val rows = spark.sparkContext.longAccumulator("graft.embed.rows")
    val df = (0L until 100L).map(i => (i, s"doc text number $i"))
      .toDF("doc_id", "text").repartition(4)
    val countingModel: Seq[String] => Seq[Array[Double]] = { batch =>
      if (batch.isEmpty || batch.size > 16)
        throw new IllegalStateException(s"bad batch size ${batch.size}")
      calls.add(1); rows.add(batch.size)
      EnrichOps.embedBatch(batch)
    }
    val got = EnrichOps.embedTextBatched(df, batchSize = 16, model = countingModel)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // every row embedded, via far fewer model calls than rows: each of the
    // 4 partitions groups its ~25 rows into ceil(25/16)=2 batches
    assert(rows.value == 100L)
    assert(calls.value >= 7L && calls.value <= 12L, s"calls=${calls.value}")
    // bit-equal to the expression form (same stub "model" on both paths)
    val exprPath = df.select($"doc_id", EnrichOps.embedText($"text").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got == exprPath)
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
