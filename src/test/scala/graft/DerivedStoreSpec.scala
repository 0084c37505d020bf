package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DerivedStore

/** Staging contract of the build-once/serve-many derived stores
  * (near-dup pairs, cluster labels, IVF+PQ index, BM25 table):
  *   - a published version is reused, the build runs at most once;
  *   - regenerating the SOURCE data (mtime bump) invalidates it;
  *   - changing the build LOGIC (fingerprint) invalidates it even when
  *     the data is byte-identical — the failure mode a pure
  *     mtime-keyed store gets wrong;
  *   - publishing is rename-based: no partially-written version is
  *     ever served, and superseded versions are garbage-collected.
  */
class DerivedStoreSpec extends AnyFunSuite {

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("graft_store_spec").toString
    val sf = new File(root, "sfX")
    new File(sf, "src.parquet").mkdirs()
    Files.write(new File(sf, "src.parquet/part-0").toPath, "data".getBytes)
    (s"$root/store", sf.getAbsolutePath)
  }

  private def build(counter: Array[Int])(tmp: String): Unit = {
    counter(0) += 1
    new File(tmp).mkdirs()
    Files.write(new File(tmp, "_SUCCESS").toPath, Array.empty[Byte])
    Files.write(new File(tmp, "data").toPath, s"build${counter(0)}".getBytes)
  }

  test("published version is served without rebuilding") {
    val (store, sf) = freshDirs()
    val n = Array(0)
    val p1 = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    val p2 = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    assert(n(0) == 1, "second serve must hit the published version")
    assert(p1 == p2)
    assert(new File(p1, "_SUCCESS").exists())
  }

  test("source regeneration (mtime bump) triggers a rebuild") {
    val (store, sf) = freshDirs()
    val n = Array(0)
    val p1 = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    val srcFile = new File(sf, "src.parquet/part-0")
    srcFile.setLastModified(srcFile.lastModified() + 5000)
    val p2 = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    assert(n(0) == 2, "stale source must rebuild")
    assert(p1 != p2, "rebuild must land in a new version directory")
  }

  test("logic change (fingerprint) invalidates even with unchanged data") {
    val (store, sf) = freshDirs()
    val n = Array(0)
    val p1 = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    val p2 = DerivedStore.serve(store, sf, "src.parquet", "fp-v2")(build(n))
    val p3 = DerivedStore.serve(store, sf, "src.parquet", "fp-v3")(build(n))
    assert(n(0) == 3, "fingerprint change must rebuild")
    assert(p1 != p2 && p2 != p3)
    // GC keeps the current version plus ONE superseded generation (the
    // grace window for lazily-planned readers); anything older goes —
    // after three publishes, v1 is gone and v2/v3 remain
    val versions = new File(store, "sfX").listFiles().map(_.getName).sorted
    assert(versions.sameElements(
      Array(new File(p2).getName, new File(p3).getName).sorted),
      s"expected current + one grace version after GC, got ${versions.mkString(",")}")
  }

  test("no partial publish: the served path always has _SUCCESS") {
    val (store, sf) = freshDirs()
    // a builder that dies mid-write leaves only a .tmp_ dir behind
    intercept[RuntimeException] {
      DerivedStore.serve(store, sf, "src.parquet", "fp-v1") { tmp =>
        new File(tmp).mkdirs()
        Files.write(new File(tmp, "data").toPath, "partial".getBytes)
        throw new RuntimeException("builder died")
      }
    }
    // next serve rebuilds cleanly and publishes atomically
    val n = Array(0)
    val p = DerivedStore.serve(store, sf, "src.parquet", "fp-v1")(build(n))
    assert(n(0) == 1)
    assert(new File(p, "_SUCCESS").exists())
  }

  test("compactWrite: small table lands in one file, sizing follows the row count") {
    val spark = SparkTest.session
    import spark.implicits._
    val out = Files.createTempDirectory("graft_compact_spec").toString
    // a few thousand rows is far under one 4M-row file: exactly 1 part
    DerivedStore.compactWrite(
      (1L to 5000L).toDF("id"), s"$out/small")
    val smallParts = new File(s"$out/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallParts == 1,
      s"5000 rows must compact to one file, got $smallParts — every extra " +
        "file costs each consumer scan a task launch")
    // rowsPerFile = 100 over 250 rows → ceil = 3 files
    DerivedStore.compactWrite(
      (1L to 250L).toDF("id"), s"$out/three", rowsPerFile = 100L)
    val threeParts = new File(s"$out/three").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(threeParts == 3, s"250 rows at 100/file must write 3 files, got $threeParts")
    // round trip: compaction must not lose or duplicate rows
    assert(spark.read.parquet(s"$out/small").count() == 5000L)
  }
}
