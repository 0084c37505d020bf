package graft

import org.scalatest.funsuite.AnyFunSuite

/** Null-robustness, pinned: EVERY registry query must run to completion
  * against a twin of the smallest SF where ~10% of every column's values
  * are nulled (deterministically, keyed on the value's own hash).
  *
  * Raw corpus data carries nulls everywhere — scraped documents with no
  * text, events with no value, embeddings that failed to compute. The
  * contract is relational: nulls propagate (null in → null/absent out);
  * they never crash a native expression's eval loop, a typed encoder
  * boundary, a driver-side collect, or a store build. The classes this
  * spec originally caught: tuple-encoder boundaries
  * (`as[(Long, String)]`) asserting NOT_NULL on fuzzed ids/text in the
  * batched-embedding and frame-sampling paths.
  */
class NullFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("every registry query completes on 10%-nulled inputs") {
    val dst = "/tmp/graft_nullfuzz_sf"
    graft.tools.NullFuzzProbe.stageNullTwin(
      spark, "/root/testdata/sf0.001", dst)
    val failed = graft.tools.RegistrySweep.sweep(spark, dst)
    assert(failed.isEmpty,
      s"queries throwing on nulled input:\n  " +
        failed.map { case (n, m) => s"$n: $m" }.mkString("\n  "))
  }
}
