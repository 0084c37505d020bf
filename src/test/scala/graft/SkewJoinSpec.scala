package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.JoinQueries

/** join_skew_aqe: under lowered skew thresholds (the defaults are
  * cluster-scale), AQE must detect the 90%-hot shuffle partition from
  * observed map-output sizes and split it at runtime — the final
  * adaptive plan carries the skew marker. Values are oracle-checked by
  * the driver (same oracle as join_skew_salted). */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("AQE splits the hot partition of the unsalted skewed join") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      // the SMJ feeds a same-keyed aggregate, so the split adds a
      // re-shuffle; force accepts that trade (split 1 hot partition,
      // re-shuffle k-sized agg input) exactly as a cluster job would
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prevs = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = JoinQueries.skewJoinPlan(spark, "/root/testdata/sf0.001")
      // collect() (not count()) so THIS df's adaptive plan executes and
      // finalizes — count() runs a separate wrapped plan
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a runtime skew-split join in the final plan:\n$plan")
    } finally prevs.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
