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
}
