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
}
