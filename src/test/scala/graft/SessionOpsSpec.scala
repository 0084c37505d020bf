package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SessionOps

/** `SessionOps.releaseQuiet` is the one release implementation every
  * iterative operator (BPE trainers, CC loop, compaction swaps) leans
  * on for its per-round heap-pressure story — so the release must be
  * PROVEN against `sc.getPersistentRDDs`, not assumed. r11 shipped
  * `Dataset.unpersist` alone, which is a no-op for `localCheckpoint`
  * materializations (they are plain persisted RDDs behind a
  * `LogicalRDD` leaf, invisible to the CacheManager): every release
  * site freed nothing. These specs pin both release paths and the
  * derived-frame guard that makes the direct-RDD path safe. */
class SessionOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releaseQuiet frees a localCheckpoint's persisted RDD") {
    val before = persistentIds
    val ck = spark.range(100).toDF("x").localCheckpoint()
    val added = persistentIds -- before
    assert(added.nonEmpty,
      "localCheckpoint should register a persisted RDD")
    SessionOps.releaseQuiet(ck)
    val after = persistentIds
    assert(added.forall(!after.contains(_)),
      s"checkpoint RDDs $added must be gone after releaseQuiet, have $after")
  }

  test("releaseQuiet frees a cached (CacheManager) frame") {
    val before = persistentIds
    val cached = spark.range(100).toDF("x").cache()
    cached.count()
    val added = persistentIds -- before
    assert(added.nonEmpty, "cache + count should register a persisted RDD")
    SessionOps.releaseQuiet(cached)
    val after = persistentIds
    assert(added.forall(!after.contains(_)),
      s"cached RDDs $added must be gone after releaseQuiet, have $after")
  }

  test("releaseQuiet on a frame DERIVED from a checkpoint frees nothing") {
    // The direct-RDD path matches only the TOP-LEVEL LogicalRDD leaf: a
    // projection over a checkpoint must never free blocks the
    // checkpoint's other consumers still read.
    val before = persistentIds
    val ck = spark.range(100).toDF("x").localCheckpoint()
    val added = persistentIds -- before
    assert(added.nonEmpty)
    val derived = ck.selectExpr("x + 1 as y").filter("y > 10")
    SessionOps.releaseQuiet(derived)
    val after = persistentIds
    assert(added.forall(after.contains),
      s"derived-frame release must keep the checkpoint's RDDs $added alive")
    assert(derived.count() == 90L)
    SessionOps.releaseQuiet(ck)
  }

  test("releaseQuiet deletes a superseded RELIABLE checkpoint's files") {
    // In reliable mode a k-round loop writes one full state copy to the
    // checkpoint dir per round; Spark never deletes them. releaseQuiet
    // must bound that: superseded checkpoint -> directory gone; the
    // live checkpoint's files stay.
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("graft-relrel").toString
    sc.setCheckpointDir(dir)
    spark.conf.set(SessionOps.RELIABLE_KEY, "true")
    try {
      def files(): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory) f.listFiles().map(walk).sum
          else if (f.getName.startsWith("part-")) 1 else 0
        walk(new java.io.File(dir))
      }
      val round1 = SessionOps.truncate(spark.range(50).toDF("x"))
      val afterR1 = files()
      assert(afterR1 > 0, "reliable truncate wrote no checkpoint files")
      val round2 = SessionOps.truncate(round1.selectExpr("x + 1 as x"))
      val afterR2 = files()
      assert(afterR2 > afterR1, "second round wrote no checkpoint files")
      SessionOps.releaseQuiet(round1)
      assert(files() == afterR2 - afterR1,
        "superseded reliable checkpoint's files were not deleted")
      assert(round2.count() == 50L, "live checkpoint must survive the release")
      SessionOps.releaseQuiet(round2)
      assert(files() == 0, "released live checkpoint's files must be gone")
    } finally {
      spark.conf.set(SessionOps.RELIABLE_KEY, "false")
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  test("releaseQuiet refuses to delete checkpoint files outside the context's checkpoint dir") {
    // The guard on the one step of releaseQuiet that can DESTROY data on
    // a contract violation: the recursive file delete only fires for
    // paths under sparkContext.getCheckpointDir. A checkpoint whose
    // files live anywhere else (user-created, or the context was
    // repointed) is left on disk and the refusal is logged — never
    // silently deleted.
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    val dirA = java.nio.file.Files.createTempDirectory("graft-ckpt-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ckpt-b").toString
    spark.conf.set(SessionOps.RELIABLE_KEY, "true")
    sc.setCheckpointDir(dirA)
    try {
      val ck = SessionOps.truncate(spark.range(25).toDF("x"))
      val file = ck.queryExecution.analyzed
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
        .rdd.getCheckpointFile
      assert(file.isDefined, "reliable truncate must carry a checkpoint file")
      val p = new org.apache.hadoop.fs.Path(file.get)
      val fs = p.getFileSystem(sc.hadoopConfiguration)
      // repoint the context: the checkpoint now lives OUTSIDE its dir
      // (setCheckpointDir mints a fresh UUID subroot every call, so
      // there is no way back under the original root — the
      // delete-under-root half lives in the reliable-release test
      // above, which never repoints)
      sc.setCheckpointDir(dirB)
      SessionOps.releaseQuiet(ck)
      assert(fs.exists(p),
        s"checkpoint outside the context dir must NOT be deleted: ${file.get}")
    } finally {
      spark.conf.set(SessionOps.RELIABLE_KEY, "false")
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  test("iterative fold keeps the persistent-RDD count flat") {
    // The shape every trainer loop has: round N checkpoints its state,
    // releases round N-1. The persistent set must not grow with rounds
    // — this is the heap-pressure regression the r11 no-op shipped.
    val baseline = persistentIds.size
    var state = spark.range(10).toDF("x").localCheckpoint()
    for (_ <- 1 to 5) {
      val next = state.selectExpr("x + 1 as x").localCheckpoint()
      SessionOps.releaseQuiet(state)
      state = next
      assert(persistentIds.size <= baseline + 1,
        s"persistent-RDD set grew across rounds: ${persistentIds.size}")
    }
    assert(state.count() == 10L)
    SessionOps.releaseQuiet(state)
  }
}
