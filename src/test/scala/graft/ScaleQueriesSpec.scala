package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraphOps
import graft.queries.ScaleQueries

/** Round-3 scale operators: connected components, sequence packing,
  * stratified split, binned range join, bucketed co-located join. */
class ScaleQueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val SF = "/root/testdata/sf0.001"

  // ---- connected components --------------------------------------------

  /** Run `body` with the CC driver fast path disabled (gate = 0 bytes)
    * so the distributed loop is the code under test. */
  private def forcingCcLoop[T](body: => T): T = {
    spark.conf.set(graft.ops.GraphOps.CC_DRIVER_MAX_KEY, "0")
    try body
    finally spark.conf.unset(graft.ops.GraphOps.CC_DRIVER_MAX_KEY)
  }

  test("connectedComponents: chain collapses transitively, singleton stays") {
    import spark.implicits._
    // 1-2, 2-3 (chain: 1~3 only transitively), 4-5, 6 isolated
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
    // default gate: the driver union-find fast path
    val comp = GraphOps.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == expected)
    // gate forced to 0: the distributed loop, identical labels
    val loop = forcingCcLoop {
      GraphOps.connectedComponents(vertices, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(loop == expected, "driver fast path diverged from the loop")
  }

  test("connectedComponents: long path needs >1 round and still converges") {
    import spark.implicits._
    val n = 16L
    val vertices = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val comp = forcingCcLoop {
      GraphOps.connectedComponents(vertices, edges).collect()
    }
    assert(comp.length == n && comp.forall(_.getLong(1) == 0L))
  }

  test("connectedComponents: driver fast path == loop on a mixed random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: chains, a clique, isolated ids
    val rnd = new scala.util.Random(42)
    val pairsSeq = (0 until 400).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter { case (a, b) => a != b }
    val pairs = pairsSeq.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val vertices = (0L until 150L).toDF("id")
    val fast = GraphOps.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = forcingCcLoop {
      GraphOps.connectedComponents(vertices, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(fast == loop, "driver union-find diverged from the distributed loop")
    assert(fast.size == 150, "every vertex labeled exactly once")
  }

  test("connectedComponentsFromPairs == connectedComponents(symmetric), both gate branches") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairsSeq = (0 until 300).map { _ =>
      (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong)
    }.filter { case (a, b) => a != b }
    val pairs = pairsSeq.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val vertices = (0L until 100L).toDF("id")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = toMap(GraphOps.connectedComponents(vertices, edges))
    // driver gate branch (default)
    assert(toMap(GraphOps.connectedComponentsFromPairs(vertices, pairs)) == ref,
      "FromPairs driver branch diverged from the symmetric-input reference")
    // distributed-loop branch (gate forced to 0): symmetrization happens
    // inside, after the single checkpoint
    val loop = forcingCcLoop {
      toMap(GraphOps.connectedComponentsFromPairs(vertices, pairs))
    }
    assert(loop == ref, "FromPairs loop branch diverged from the reference")
  }

  test("dedup_cluster_cc: every doc labeled, comp <= doc_id, comps are reps") {
    // registered in TextQueries (it shares the Jaccard pair fragments);
    // reach it through the full registry
    val cc = graft.SparkEntry.queries("dedup_cluster_cc")(spark, SF)
    val docs = graft.model.Tables.documents(spark, SF).count()
    assert(cc.count() == docs, "one row per document")
    assert(cc.filter(col("comp") > col("doc_id")).count() == 0,
      "component label is the min id, so never exceeds the member id")
    // every component label is itself a member of that component
    val reps = cc.select(col("comp").as("rep")).distinct()
    val repRows = cc.join(reps, col("doc_id") === col("rep"), "left_semi")
    assert(reps.count() == repRows.count(), "each comp label is a real doc in the comp")
  }

  // ---- sequence packing -------------------------------------------------

  test("pack_sequences_greedy: offsets are the running concat position per shard") {
    val out = ScaleQueries.queries("pack_sequences_greedy")(spark, SF)
      .orderBy("shard", "doc_id").collect()
    val byShard = out.groupBy(_.getLong(1))
    byShard.foreach { case (_, rows) =>
      var cum = 0L
      rows.foreach { r =>
        assert(r.getLong(3) == cum / 512, s"seq_idx mismatch at doc ${r.getLong(0)}")
        assert(r.getLong(4) == cum % 512, s"offset mismatch at doc ${r.getLong(0)}")
        cum += r.getLong(2)
      }
    }
  }

  // ---- stratified split -------------------------------------------------

  test("split_stratified_hash: per-stratum proportions are exact") {
    val out = ScaleQueries.queries("split_stratified_hash")(spark, SF)
    val byLang = out.groupBy("lang").pivot("split", Seq("train", "valid", "test"))
      .count().na.fill(0L).collect()
    byLang.foreach { r =>
      val (tr, va, te) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val n = tr + va + te
      assert(tr == n * 8 / 10, s"train size for ${r.getString(0)}: $tr of $n")
      assert(va == n * 9 / 10 - n * 8 / 10, s"valid size for ${r.getString(0)}")
    }
  }

  test("split_stratified_hash: assignment is deterministic across runs") {
    val a = ScaleQueries.queries("split_stratified_hash")(spark, SF).collect().toSet
    val b = ScaleQueries.queries("split_stratified_hash")(spark, SF).collect().toSet
    assert(a == b)
  }

  // ---- binned range join ------------------------------------------------

  test("join_range_binned: identical to the direct theta join, boundaries inclusive") {
    val binned = ScaleQueries.queries("join_range_binned")(spark, SF)
    val ev = graft.model.Tables.events(spark, SF)
      .select(col("event_id"), col("value"), unix_micros(col("ts")).as("ts_us"))
    val iv = ev.filter(col("event_id") % 997 === 0)
      .select(col("event_id").as("interval_id"), col("ts_us").as("start_us"),
        (col("ts_us") + 21600000000L).as("end_us"))
    val theta = ev.join(iv,
      col("ts_us") >= col("start_us") && col("ts_us") <= col("end_us"))
      .select(col("interval_id"), col("event_id"), col("value"))
    assert(binned.exceptAll(theta).count() == 0 && theta.exceptAll(binned).count() == 0)
    // the seed event sits exactly on its own interval start -> inclusive
    assert(binned.filter(col("interval_id") === col("event_id")).count() ==
      iv.count(), "every interval matches its boundary event")
  }

  // ---- bucketed co-located join ----------------------------------------

  test("join_bucketed_colocated: sort-merge join with no shuffle on either side") {
    val df = ScaleQueries.queries("join_bucketed_colocated")(spark, SF)
    assert(df.count() > 0)
    // the final agg sits behind an exchange, so the plan is AQE-wrapped;
    // inspect the executed inner plan after the action above
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val smjs = plan.collect { case j: SortMergeJoinExec => j }
    assert(smjs.nonEmpty, s"expected a sort-merge join, got: ${plan.treeString.take(800)}")
    val shufflesUnderJoin = smjs.head.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed sides must not shuffle, got: ${smjs.head.treeString.take(500)}")
  }
}
