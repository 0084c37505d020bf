package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SessionOps

/** The conf-switched reliable-checkpoint mode (SessionOps.truncate):
  * `spark.graft.checkpoint.reliable=true` routes every iterative-loop
  * lineage truncation (CC loop, both BPE trainers) through a
  * directory-backed `Dataset.checkpoint()` — the executor-loss-safe
  * plan for a real cluster, where localCheckpoint's executor-resident
  * blocks die with the executor and kill the job. Asserted, not
  * claimed: bit-equal results in both modes AND real checkpoint files
  * on disk while reliable mode is on.
  */
class ReliableCheckpointSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private def withReliable[T](dir: String)(body: => T): T = {
    spark.conf.set(SessionOps.RELIABLE_KEY, "true")
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    sc.setCheckpointDir(dir)
    try body
    finally {
      spark.conf.set(SessionOps.RELIABLE_KEY, "false")
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  private def ckptFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.startsWith("rdd-") || f.getName.startsWith("part-")) 1
      else 0
    val root = new java.io.File(dir)
    if (root.exists()) walk(root) else 0
  }

  test("CC fixpoint: reliable mode bit-equal to local mode, files on disk") {
    import spark.implicits._
    // a chain plus an isolated vertex — exercises propagate, pointer
    // jump, and the untouched-vertex re-attach
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val sym = edges.union(edges.select(col("dst"), col("src")))
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    // force the distributed loop: this spec proves the LOOP's reliable-
    // checkpoint mode (the driver fast path writes no checkpoints)
    spark.conf.set(graft.ops.GraphOps.CC_DRIVER_MAX_KEY, "0")
    val (local, reliable, dir) = try {
      val local = graft.ops.GraphOps.connectedComponents(vertices, sym)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dir = java.nio.file.Files.createTempDirectory("graft-rck-cc").toString
      val reliable = withReliable(dir) {
        graft.ops.GraphOps.connectedComponents(vertices, sym)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      (local, reliable, dir)
    } finally spark.conf.unset(graft.ops.GraphOps.CC_DRIVER_MAX_KEY)
    assert(reliable == local, "CC labels diverged between checkpoint modes")
    assert(local == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
    assert(ckptFiles(dir) > 0, s"no reliable checkpoint files under $dir")
  }

  test("k-core peel: reliable mode bit-equal, superseded rounds released") {
    // graph_kcore's peel loop routes its per-round lineage truncation
    // through SessionOps.truncate like the CC loop (r12) — prove the
    // reliable mode end-to-end on the registry query, and prove the
    // release discipline: the peel must not grow the persistent-RDD set
    // by one edge-list copy per round (KCORE_ROUNDS retained copies was
    // the gap this spec's round closed).
    val q = SparkEntry.queries("graph_kcore")
    def run(): Set[(Long, Long)] =
      q(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // stage the pair store OUTSIDE the measured window — its inline
    // build caches the token sets, which is index-time cost, not peel
    // state (the bench warmup does the same staging)
    graft.queries.TextQueries.jaccardPairsStore(spark, "/root/testdata/sf0.001")
      .count()
    // force the distributed peel: this spec proves the LOOP's reliable-
    // checkpoint + release discipline (the r15 driver fast path collects
    // the edges and writes no checkpoints at all)
    spark.conf.set(graft.ops.GraphOps.CC_DRIVER_MAX_KEY, "0")
    val (local, reliable, dir) = try {
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val local = run()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
      assert(leaked.size <= 1,
        s"k-core peel leaked ${leaked.size} persisted RDDs (release per round missing)")
      val dir = java.nio.file.Files.createTempDirectory("graft-rck-kcore").toString
      val reliable = withReliable(dir) { run() }
      (local, reliable, dir)
    } finally spark.conf.unset(graft.ops.GraphOps.CC_DRIVER_MAX_KEY)
    assert(reliable == local, "k-core degrees diverged between checkpoint modes")
    assert(ckptFiles(dir) > 0, s"no reliable checkpoint files under $dir")
  }

  test("BPE rounds: reliable mode bit-equal merges, files on disk") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b a b c", 5L), (2L, "a b a b", 4L), (3L, "c a b", 3L))
      .toDF("doc_id", "text", "n_raw")
    def merges(k: Long): Seq[(Long, String, String, Long)] = {
      // force the distributed trainer: this spec proves the LOOP's
      // reliable-checkpoint mode (the r15 driver fast path writes none)
      spark.conf.set(graft.ops.BpeOps.BPE_DRIVER_MAX_KEY, "0")
      val (m, _, _) =
        try graft.queries.MiningQueries.bpeTrainOn(spark, corpus, k)
        finally spark.conf.unset(graft.ops.BpeOps.BPE_DRIVER_MAX_KEY)
      m.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    val local = merges(2)
    val dir = java.nio.file.Files.createTempDirectory("graft-rck-bpe").toString
    val reliable = withReliable(dir) { merges(2) }
    assert(reliable == local, "BPE merges diverged between checkpoint modes")
    assert(local.nonEmpty && local.head._2 == "a" && local.head._3 == "b")
    assert(ckptFiles(dir) > 0, s"no reliable checkpoint files under $dir")
  }
}
