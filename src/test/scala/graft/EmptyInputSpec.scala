package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness, pinned: EVERY registry query must run to
  * completion against zero-row twins of the source tables.
  *
  * At production scale empty inputs are not an edge case — a language
  * shard with no documents left after filtering, a day with no events, a
  * source that contributed nothing to this snapshot. A query that throws
  * (instead of returning an empty or degenerate-but-typed result) takes
  * the whole pipeline run down. The classes this spec originally caught,
  * all fixed at shared choke points:
  *
  *   - driver-side `collect()(0)` on an aggregate of an empty corpus
  *     (the BPE trainer's winning-bigram pick);
  *   - `partitionBy` store builds of an empty DataFrame, which write no
  *     parquet footer and leave the store UNREADABLE for every later
  *     consumer (DerivedStore.writePartitioned's flat fallback);
  *   - per-dimension stat maps assumed total (the PCA mean lookup).
  *
  * The twin preserves each table's REAL physical schema (limit(0) of the
  * actual testdata), so the loader's encoding probes run against the
  * same parquet types production sees.
  */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("every registry query completes on zero-row inputs") {
    val dst = "/tmp/graft_empty_sf"
    graft.tools.EmptyInputProbe.stageEmptyTwin(
      spark, "/root/testdata/sf0.001", dst)
    val failed = graft.tools.RegistrySweep.sweep(spark, dst)
    assert(failed.isEmpty,
      s"queries throwing on empty input:\n  " +
        failed.map { case (n, m) => s"$n: $m" }.mkString("\n  "))
  }
}
