package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.CosineSimilarity.cosineSim
import graft.ops.{VectorOps, VwapAggregator}
import graft.streaming.Heartbeat

/** Custom Catalyst surface: the codegen'd CosineSimilarity expression must
  * be bit-identical to the interpreted HOF formulation; the VWAP Aggregator
  * must match its decimal-exact closed form; the heartbeat mirrors the
  * reference's 120 s SLO (main.py:74-79). */
class CustomExprSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("CosineSimilarity: bit-identical to the HOF fold on real embeddings") {
    val e = graft.model.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter($"vec_id" === 0).select($"embedding".as("q_emb"))
    val both = e.crossJoin(broadcast(q)).select(
      VectorOps.cosine($"embedding", $"q_emb").as("hof"),
      cosineSim($"embedding", $"q_emb").as("native"))
    val mismatches = both.filter(
      $"hof" =!= $"native" || $"hof".isNull =!= $"native".isNull).count()
    assert(mismatches == 0)
  }

  test("CosineSimilarity: nulls propagate, zero vector -> 0.0") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(1.0f, 0.0f))),
      (None, Some(Array(1.0f, 0.0f))),
      (Some(Array(0.0f, 0.0f)), Some(Array(1.0f, 2.0f))))
      .toDF("a", "b")
      .select(cosineSim($"a", $"b").as("c"))
    val got = df.collect()
    assert(got(0).getDouble(0) == 1.0)
    assert(got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 0.0)
  }

  test("VWAP aggregator matches the decimal closed form") {
    val df = Seq((1L, 10.00, 1L), (1L, 20.00, 3L), (2L, 5.50, 2L))
      .toDF("k", "price", "w")
    val got = df.groupBy($"k")
      .agg(VwapAggregator.vwapColumn($"price", $"w").as("vwap"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == (10.0 * 1 + 20.0 * 3) / 4) // 17.5
    assert(got(2L) == 5.5)
  }

  test("Heartbeat: ONLINE under 120s, OFFLINE at/after (main.py:74-79)") {
    val p = java.nio.file.Files.createTempFile("hb", ".txt").toString
    Heartbeat.write(p, 1000L)
    assert(Heartbeat.status(p, 1000L + 119) == "ONLINE")
    assert(Heartbeat.status(p, 1000L + 120) == "OFFLINE")
    assert(Heartbeat.status(p + ".missing", 0L) == "OFFLINE")
  }
}
