package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** The two physical shapes of the LSH dedup candidate join (VERDICT r1
  * item 4): broadcast build when the banded table fits the threshold,
  * salted (bucket, salt) shuffle when it doesn't — same rows either way.
  * The salted path is the 100 TB plan; forcing it here via
  * autoBroadcastJoinThreshold=-1 is exactly how LshJoin decides at scale
  * (optimizer size estimate vs threshold). */
class LshJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val SF = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def exchanges(df: DataFrame) = {
    // force execution so an AQE plan is final
    df.count()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    (plan.collect { case e: BroadcastExchangeExec => e },
      plan.collectWithSubqueries { case e: ShuffleExchangeExec => e })
  }

  private def withForcedSalted[T](body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }

  test("dedup_minhash_lsh: salted path shuffles on (bucket, salt), no broadcast, same rows") {
    val q = TextQueries.queries("dedup_minhash_lsh")
    val expected = rows(q(spark, SF))
    withForcedSalted {
      val salted = q(spark, SF)
      val (bcasts, shuffles) = exchanges(salted)
      assert(bcasts.isEmpty, s"salted path must not broadcast, found ${bcasts.size}")
      val saltKeyed = shuffles.filter { e =>
        val p = e.outputPartitioning.toString
        p.contains("salt") && p.contains("bucket")
      }
      assert(saltKeyed.nonEmpty,
        s"expected a hashpartitioning on (bucket, salt); shuffles were:\n" +
          shuffles.map(_.outputPartitioning).mkString("\n"))
      assert(rows(salted) == expected)
    }
  }

  test("dedup_shingle_jaccard: salted path matches broadcast path") {
    val q = TextQueries.queries("dedup_shingle_jaccard")
    val expected = rows(q(spark, SF))
    withForcedSalted {
      val salted = q(spark, SF)
      val (bcasts, _) = exchanges(salted)
      assert(bcasts.isEmpty)
      assert(rows(salted) == expected)
    }
  }

  // -- fuse-vs-ship rule (r12 verdict item 4): the verify-payload
  // decision is mechanical (LshJoin.fuseRule from bucket-size stats),
  // and the r12 MEASURED A/B outcomes stay pinned as fixtures so the
  // rule can never silently invert them. fuse ⟺ bucket-collision pairs
  // > bandRows·(1+salts) — the per-doc prose rule with nDocs cancelled.

  test("fuseRule pins the r12 minhash A/B: high pair density fuses") {
    // dedup_minhash_lsh at sf10 (BENCH_NOTES r12): ~512 candidate
    // pairs/doc vs 2 band rows/doc at salts=8 → copies 18/doc. In the
    // cancelled form with 1M docs: pairs=512e6, bandRows=2e6.
    assert(graft.ops.LshJoin.fuseRule(512e6, 2000000L, salts = 8))
    // and at the sf1 magnitude (~52 pairs/doc, 500k docs)
    assert(graft.ops.LshJoin.fuseRule(26e6, 1000000L, salts = 8))
  }

  test("fuseRule pins the r12 shingle A/B refusal: sparse pairs ship per-pair") {
    // dedup_shingle_jaccard at sf1: 2,557 verified pairs over 500k docs
    // with 4 band rows/doc — fusing measured 3.4× MORE bytes; even at
    // 100× the candidate density the refusal holds.
    assert(!graft.ops.LshJoin.fuseRule(2557.0, 2000000L, salts = 8))
    assert(!graft.ops.LshJoin.fuseRule(255700.0, 2000000L, salts = 8))
  }

  test("shouldFuseVerify measures the live corpora to the same verdicts") {
    // The live integration of the rule on this corpus: the minhash
    // banded frame (2 bands over token minhashes — dense buckets, dup
    // structure is scale-invariant in the testdata) fuses; the shingle
    // banded frame (4 bands over shingle minhashes — sparse buckets)
    // ships per-pair. Built on real sf0.001 data via the same band keys
    // the queries use (bucket column is all shouldFuseVerify reads).
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$SF/documents.parquet")
    val mhBands = {
      val base = d.select(col("doc_id"),
        array_sort(array_distinct(
          graft.ops.TextOps.tokenHashes(col("text")))).as("th"))
      val withMh = (0 until 8).foldLeft(base) { (df, i) =>
        df.withColumn(s"mh$i", graft.ops.TextOps.minHash(
          col("th"), graft.ops.TextOps.MINHASH_A(i),
          graft.ops.TextOps.MINHASH_B(i)))
      }
      def bandKey(j: Int) = concat_ws("_",
        lit(j) +: (0 until 4).map(k => col(s"mh${4 * j + k}")): _*)
      withMh.select(col("doc_id"),
        explode(array(bandKey(0), bandKey(1))).as("bucket"))
    }
    assert(graft.ops.LshJoin.shouldFuseVerify(mhBands, salts = 8),
      "minhash banded frame must fuse on this corpus")
  }
}
