package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.PlanAudit

/** In-suite guard for the scan-level plan assertions PlanAudit enforces
  * registry-wide: pushdown reaches the parquet reader and projection is
  * pruned on the asserted paths. The full audit runs out-of-band
  * (`runMain graft.tools.PlanAudit`); these cases pin the highest-value
  * examples so a regression fails `sbt test` directly. */
class PlanAuditSpec extends AnyFunSuite {
  private val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  private def stats(q: String) =
    PlanAudit.scanStats(
      SparkEntry.queries(q)(spark, sf).queryExecution.sparkPlan)

  test("dropna_ohlc pushes its filters into the events scan") {
    val ev = stats("dropna_ohlc").filter(_.table == "events")
    assert(ev.nonEmpty)
    // type <> 'error' and value IS NOT NULL both translate: at least
    // two source filters, and never a filtered scan with zero pushed.
    assert(ev.head.nPushed >= 2, s"expected >=2 pushed filters, got $ev")
  }

  test("tpch_q6_forecast reads only the 4 lineitem columns it needs") {
    val li = stats("tpch_q6_forecast").filter(_.table == "lineitem")
    assert(li.nonEmpty)
    assert(li.head.readCols <= 4,
      s"q6 must prune lineitem to quantity/extendedprice/discount/shipdate, got $li")
    assert(li.head.readCols < li.head.totalCols)
  }

  test("knn_filtered_search prunes and pushes the metadata prefilter") {
    val em = stats("knn_filtered_search").filter(_.table == "embeddings")
    assert(em.nonEmpty)
    assert(em.head.nPushed >= 1,
      s"metadata prefilter must reach the parquet reader, got $em")
  }
}
