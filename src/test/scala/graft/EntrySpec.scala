package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver smoke path: entry() must run on a vanilla session (Tables
  * handles the nanos-parquet conf itself) and return rows. */
class EntrySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("flagship entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    val cols = df.columns.toSet
    assert(Set("ticker", "date", "close", "variation_pct", "ma_10", "trend")
      .subsetOf(cols))
  }

  test("every oracle key has a registered query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("approx_distinct_hll estimate lands within 3x the 2% target rsd") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("approx_distinct_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = SparkEntry.queries("distinct_count")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, est) <- approx) {
      val ex = exact(k).toDouble
      assert(math.abs(est - ex) / ex <= 0.06,
        s"$k: estimate $est vs exact $ex exceeds 6% relative error")
    }
  }
}
