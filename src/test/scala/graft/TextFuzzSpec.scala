package graft

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-text robustness, pinned: EVERY registry query must run to
  * completion against a twin where ~10% of every string column carries
  * hostile content — regex metacharacters, quote/backslash injection,
  * astral-plane codepoints (surrogate pairs), RTL script, zero-width
  * characters, control characters, embedded newlines, a 10k-char token,
  * the empty string.
  *
  * Scraped corpus text contains all of this; the native codepoint loops
  * (TextHash, ShingleHashes), the interpolated regexes, and the
  * driver-spliced BPE merge tokens must treat it as data. This passed on
  * first run — the repo-wide rule of building dynamic predicates with
  * Column + lit() (never SQL-text splicing) is what this spec keeps
  * true.
  */
class TextFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("every registry query completes on adversarial text") {
    val dst = "/tmp/graft_textfuzz_sf"
    graft.tools.TextFuzzProbe.stageTextTwin(
      spark, "/root/testdata/sf0.001", dst)
    val failed = graft.tools.RegistrySweep.sweep(spark, dst)
    assert(failed.isEmpty,
      s"queries throwing on adversarial text:\n  " +
        failed.map { case (n, m) => s"$n: $m" }.mkString("\n  "))
  }
}
