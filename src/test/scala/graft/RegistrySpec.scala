package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: the driver's correctness gate is only as strong as
  * the registry/oracle pairing, so drift between them must be a test
  * failure, not a silently weaker check. (r7 shipped a query whose oracle
  * existed but which had never earned a driver row because nothing
  * asserted the pairing end to end.)
  */
class RegistrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with NO oracle row: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles with NO query: ${(o -- q).toSeq.sorted}")
  }

  test("query names are unique across packs") {
    // Map.flatMap silently keeps the last duplicate — a pack accidentally
    // reusing a name would shadow another pack's query and shrink the
    // registry without any other signal.
    val all = Seq(
      graft.queries.MarketQueries, graft.queries.RelationalQueries,
      graft.queries.FunctionQueries, graft.queries.VectorQueries,
      graft.queries.TextQueries, graft.queries.EnrichmentQueries,
      graft.queries.JoinQueries, graft.queries.PipelineQueries,
      graft.queries.ScaleQueries, graft.queries.CurationQueries,
      graft.queries.MiningQueries, graft.queries.FeatureQueries,
      graft.queries.SeriesQueries).flatMap(_.queries.keys)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dupes.isEmpty, s"duplicate query names across packs: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }

  test("oracle SQL never hardcodes a scale-factor path") {
    // Oracles run against whatever sfDir the driver picks; an absolute
    // /root/testdata path would pin one SF and silently diverge.
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("/root/testdata") => name
    }
    assert(offenders.isEmpty, s"oracles with hardcoded paths: $offenders")
  }
}
