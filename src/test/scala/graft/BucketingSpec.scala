package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 100-TB co-location story: joining two tables bucketed on the join
  * key must plan WITHOUT a shuffle exchange — this is what replaces the
  * repeated fact-fact shuffle at scale (SURVEY §4 / partition-layout
  * decisions). */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    // a static conf and cannot be set on the shared session
    val li = graft.model.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_extendedprice")
    val o = graft.model.Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .saveAsTable("graft_li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .saveAsTable("graft_o_bucketed")
    try {
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty,
        s"bucketed join should not shuffle, found: ${shuffles.size}")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_o_bucketed")
    }
  }
}
