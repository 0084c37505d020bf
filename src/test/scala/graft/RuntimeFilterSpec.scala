package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 additions beyond the curation pack: the runtime Bloom-filter
  * join, the LSH kNN join, and the single-pass column profiler. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val SF = "/root/testdata/sf0.001"

  test("join_bloom_runtime: Catalyst injects might_contain on the fact side") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prevs = keys.map { case (k, _) => k -> spark.conf.get(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dim = graft.model.Tables.orders(spark, SF)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val joined = graft.model.Tables.lineitem(spark, SF).hint("merge")
        .join(dim.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter, got:\n${optimized.take(1500)}")
    } finally prevs.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("join_bloom_runtime query: one exact row, same with and without the filter") {
    val out = graft.SparkEntry.queries("join_bloom_runtime")(spark, SF).collect()
    assert(out.length == 1)
    // exact reference without any runtime-filter involvement
    val plain = graft.model.Tables.lineitem(spark, SF)
      .join(
        graft.model.Tables.orders(spark, SF)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out.head.getLong(0) == plain, "bloom pruning must not change results")
  }

  test("knn_join_lsh: k bounded, self excluded, neighbors share the bucket") {
    val out = graft.SparkEntry.queries("knn_join_lsh")(spark, SF).cache()
    assert(out.filter(col("vec_id") === col("nbr_id")).count() == 0)
    val over = out.groupBy("vec_id").count().filter(col("count") > 3)
    assert(over.count() == 0, "at most k=3 neighbors per vector")
    // symmetry of the candidate graph: if a has b as a candidate they share
    // a bucket, so b also saw a (though not necessarily in ITS top-3)
    assert(out.count() > 0)
  }

  test("profile_columns: one row per profiled column, stats agree with direct aggs") {
    val out = graft.SparkEntry.queries("profile_columns")(spark, SF).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("value", "user_id", "event_id"))
    val ev = graft.model.Tables.events(spark, SF)
    val n = ev.count()
    out.values.foreach(r => assert(r.getLong(1) == n))
    val distinctUsers = ev.select("user_id").distinct().count()
    assert(out("user_id").getLong(3) == distinctUsers)
    val minV = ev.agg(min("value")).head.getDouble(0)
    assert(out("value").getDouble(4) == minV)
  }
}
