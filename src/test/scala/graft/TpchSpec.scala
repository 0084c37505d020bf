package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for the r8 TPC-H-style additions: the point of
  * each query is a specific physical shape that survives scale, so the
  * spec pins the shape, not just the answer (the answer is already
  * oracle-checked by the driver gate).
  */
class TpchSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"

  /** File scans of the static plan, DESCENDING into cached segments
    * (r11: q15 caches its two-consumer revenue table, which wraps the
    * lineitem scan in InMemoryTableScanExec — without the descent the
    * pushdown assertion would pass vacuously on an empty scan list). */
  private def scans(name: String): Seq[FileSourceScanExec] = {
    def all(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case t: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          all(t.relation.cachedPlan)
      }.flatten
    all(SparkEntry.queries(name)(spark, sf).queryExecution.sparkPlan)
  }

  private def scanOf(name: String, col: String) =
    scans(name).find(_.schema.fieldNames.contains(col)).get

  /** Shuffle-requiring join execs in a plan — the thing the broadcast-
    * shape assertions forbid. One place to extend if a Spark upgrade
    * adds a new shuffle-join node. */
  private def shuffleJoins(plan: org.apache.spark.sql.execution.SparkPlan) =
    plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }

  /** Join execs of the EXECUTED (post-AQE) plan: run the query, then walk
    * the adaptive plan through its runtime wrappers. The r10 broadcast
    * discipline moves SF-proportional sides from forced hints to AQE
    * size decisions, so the honest shape assertion is two-part: the
    * ANALYZED plan carries hints only on bounded frames (PlanAudit's
    * registry-wide check), and the RUNTIME plan at fixture scale still
    * ends all-broadcast — proving AQE picks up what the hint used to
    * force. */
  private def executedShuffleJoins(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() (not count()) so THIS queryExecution runs: count() spawns
    // a separate execution and would leave df's adaptive plan un-replanned.
    df.collect()
    tools.PlanAudit.allNodes(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
  }

  /** Broadcast-hinted subtrees of the analyzed logical plan. */
  private def broadcastHints(name: String) =
    SparkEntry.queries(name)(spark, sf).queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
          if h.hints.strategy.exists(_.toString.toUpperCase.contains("BROADCAST")) => h
    }

  test("tpch_q10_returns plan: both filters push pre-join, top-20 is TakeOrdered") {
    val li = scanOf("tpch_q10_returns", "l_returnflag")
    assert(li.metadata.getOrElse("PushedFilters", "").contains("l_returnflag"),
      "returnflag filter must reach the lineitem scan")
    val ord = scanOf("tpch_q10_returns", "o_orderdate")
    assert(ord.metadata.getOrElse("PushedFilters", "").contains("o_orderdate"),
      "quarter window must reach the orders scan")
    val plan = SparkEntry.queries("tpch_q10_returns")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-20 must plan as TakeOrderedAndProject, not a global sort")
  }

  test("tpch_q19_brackets plan: single-table envelopes push to BOTH scans") {
    // The OR-of-ANDs itself is not source-translatable; the planted
    // envelopes (quantity on lineitem, brand+size on part) must be.
    val li = scanOf("tpch_q19_brackets", "l_quantity")
    val liPushed = li.metadata.getOrElse("PushedFilters", "")
    assert(liPushed.contains("l_quantity"),
      s"quantity envelope must reach the lineitem scan, got: $liPushed")
    val part = scanOf("tpch_q19_brackets", "p_brand")
    val pPushed = part.metadata.getOrElse("PushedFilters", "")
    assert(pPushed.contains("p_brand") && pPushed.contains("p_size"),
      s"brand+size envelope must reach the part scan, got: $pPushed")
  }

  test("tpch_q19_brackets: envelopes are supersets of the bracket disjunction") {
    // Envelope filters may only REMOVE non-qualifying rows: the query with
    // envelopes equals the bare disjunction evaluated after the join.
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val bracket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    val bare = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(bracket).count()
    val got = SparkEntry.queries("tpch_q19_brackets")(spark, sf)
      .collect().head.getLong(0)
    assert(got == bare, s"envelope pre-filters changed the answer: $got vs $bare")
  }

  test("tpch_q4_priority plan: EXISTS compiles to one semi-join, quarter filter pushes") {
    val plan = SparkEntry.queries("tpch_q4_priority")(spark, sf)
      .queryExecution.sparkPlan
    val semis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftSemi" => j
    }
    assert(semis.size == 1, s"EXISTS must plan as exactly one LeftSemi join, got ${semis.size}")
    // the probe side carries only the correlation columns, never the fact
    assert(semis.head.right.output.map(_.name).toSet == Set("l_orderkey", "l_shipdate"),
      s"semi side must project only (l_orderkey, l_shipdate), got ${semis.head.right.output}")
    val ord = scanOf("tpch_q4_priority", "o_orderdate")
    assert(ord.metadata.getOrElse("PushedFilters", "").contains("o_orderdate"),
      "quarter window must reach the orders scan")
  }

  test("tpch_q13_custdist: zero-order customers land in the c_count = 0 bucket") {
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val out = SparkEntry.queries("tpch_q13_custdist")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // invariant: the histogram must cover every customer exactly once
    val nCust = Tables.customer(spark, sf).count()
    assert(out.values.sum == nCust, s"histogram covers $nCust customers")
    // an inner join would drop the zero bucket; assert it exists whenever
    // some customer has no non-urgent order (true at every testdata SF)
    val withOrders = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    if (withOrders < nCust)
      assert(out.getOrElse(0L, 0L) == nCust - withOrders,
        "customers with no qualifying orders must appear at c_count = 0")
  }

  test("tpch_q22_untapped plan: anti-join on a one-column right side") {
    val plan = SparkEntry.queries("tpch_q22_untapped")(spark, sf)
      .queryExecution.sparkPlan
    val antis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftAnti" => j
    }
    assert(antis.nonEmpty, "no-urgent-orders must plan as a LEFT ANTI join")
    // the anti side must carry only the join key — at scale this is the
    // difference between shuffling one long column and shuffling orders
    assert(antis.head.right.output.map(_.name) == Seq("o_custkey"),
      s"anti side must project only o_custkey, got ${antis.head.right.output}")
  }

  test("tpch_q17_smallqty plan: part slice pushes, no forced broadcast, AQE broadcasts") {
    val part = scanOf("tpch_q17_smallqty", "p_brand")
    val pushed = part.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("p_brand") && pushed.contains("p_size"),
      s"brand+size slice must reach the part scan, got: $pushed")
    // r10 discipline: the part slice and the per-part avg both grow with
    // SF, so NEITHER may carry a broadcast hint (a forced hint ODs the
    // driver at 100 TB) — and at fixture scale AQE must still end the
    // runtime plan all-broadcast, so nothing was lost locally.
    assert(broadcastHints("tpch_q17_smallqty").isEmpty,
      "q17 must not force-broadcast its SF-proportional sides")
    val shuffled = executedShuffleJoins("tpch_q17_smallqty")
    assert(shuffled.isEmpty,
      s"AQE must broadcast q17's joins at fixture scale (got ${shuffled.size} shuffle joins)")
  }

  test("tpch_q21_waiting plan: aggregate decorrelation, no lineitem self-join") {
    // The EXISTS/NOT-EXISTS pair must NOT plan as semi/anti self-joins of
    // lineitem: the per-order supplier-count rewrite replaces both.
    val plan = SparkEntry.queries("tpch_q21_waiting")(spark, sf)
      .queryExecution.sparkPlan
    val semiAnti = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftSemi" ||
            j.joinType.toString == "LeftAnti" => j
    }
    assert(semiAnti.isEmpty,
      s"q21 must decorrelate to aggregates, not semi/anti self-joins (${semiAnti.size})")
    val ord = scanOf("tpch_q21_waiting", "o_orderstatus")
    assert(ord.metadata.getOrElse("PushedFilters", "").contains("o_orderstatus"),
      "finished-orders filter must reach the orders scan")
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-100 must plan as TakeOrderedAndProject")
  }

  test("tpch_q21_waiting: aggregate rewrite equals the literal EXISTS chain") {
    // Semantics lock: the n_supp/n_late_supp rewrite must equal the
    // EXISTS(other line) AND NOT EXISTS(other late line) formulation.
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val lo = li.join(
      Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"))
    val late = lo.filter(col("l_shipdate") > col("o_orderdate"))
    val other = li.select(col("l_orderkey").as("x_ok"), col("l_suppkey").as("x_sk"))
    val literal = late
      .join(other, col("l_orderkey") === col("x_ok") &&
        col("l_suppkey") =!= col("x_sk"), "left_semi")
      .join(
        late.select(col("l_orderkey").as("y_ok"), col("l_suppkey").as("y_sk")),
        col("l_orderkey") === col("y_ok") && col("l_suppkey") =!= col("y_sk"),
        "left_anti")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
    val sup = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // mirror the native query's top-100 cut (numwait desc, s_name) so
    // the comparison stays valid at any SF, not just while <= 100
    // suppliers qualify. Aggregate per-suppkey counts BY NAME first —
    // the native query groups on s_name, so two suppliers sharing a
    // name must merge here too, not silently collapse in toMap.
    val want = literal.collect()
      .map(r => sup(r.getLong(0)) -> r.getLong(1))
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq
      .sortBy { case (name, n) => (-n, name) }
      .take(100).toMap
    val got = SparkEntry.queries("tpch_q21_waiting")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"rewrite diverges from EXISTS chain: $got vs $want")
  }

  test("tpch_q2_mincost plan: dims push, hints only on true dims, top-100 is TakeOrdered") {
    val region = scanOf("tpch_q2_mincost", "r_name")
    assert(region.metadata.getOrElse("PushedFilters", "").contains("r_name"),
      "region filter must reach the region scan")
    val part = scanOf("tpch_q2_mincost", "p_type")
    val pushed = part.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("p_type") && pushed.contains("p_size"),
      s"type+size slice must reach the part scan, got: $pushed")
    // r10 discipline: only nation/region may carry hints; the one-region
    // supplier list, part slice, and per-partkey min all grow with SF and
    // must be left to AQE. Every hinted subtree's leaves must be
    // nation/region scans.
    broadcastHints("tpch_q2_mincost").foreach { h =>
      val leaves = h.child.collectLeaves().map(_.toString)
      assert(leaves.forall(l => l.contains("nation") || l.contains("region")),
        s"q2 hint on a non-dim subtree: ${leaves.mkString(";").take(200)}")
    }
    // ...and at fixture scale AQE must still end the plan all-broadcast.
    val shuffled = executedShuffleJoins("tpch_q2_mincost")
    assert(shuffled.isEmpty,
      s"AQE must broadcast q2's joins at fixture scale (${shuffled.size})")
    val plan = SparkEntry.queries("tpch_q2_mincost")(spark, sf)
      .queryExecution.sparkPlan
    assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "top-100 must plan as TakeOrderedAndProject")
  }

  test("tpch_q7_volume plan: nation slice pushes to BOTH aliases, window to the fact") {
    // The self-aliased dim must appear as two nation scans, each with the
    // two-nation filter pushed — the pre-restriction that keeps the pair
    // OR off the full fact.
    val natScans = scans("tpch_q7_volume")
      .filter(_.schema.fieldNames.contains("n_name"))
    assert(natScans.size == 2,
      s"nation must scan twice (supplier + customer alias), got ${natScans.size}")
    natScans.foreach { sc =>
      val pushed = sc.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("n_name"),
        s"two-nation filter must reach each nation scan, got: $pushed")
    }
    val li = scanOf("tpch_q7_volume", "l_shipdate")
    assert(li.metadata.getOrElse("PushedFilters", "").contains("l_shipdate"),
      "two-year window must reach the lineitem scan")
  }

  test("tpch_q15_topsupp: quarter pushes, max joins back broadcast, ties kept") {
    scans("tpch_q15_topsupp")
      .filter(_.schema.fieldNames.contains("l_shipdate"))
      .foreach { sc =>
        assert(sc.metadata.getOrElse("PushedFilters", "").contains("l_shipdate"),
          "quarter filter must reach every lineitem pass")
      }
    // r10 discipline: only the 1-row max may carry a hint; the supplier
    // name lookup grows with SF and is AQE's call. Hinted subtrees must
    // all be aggregates with no grouping (scalar reductions).
    broadcastHints("tpch_q15_topsupp").foreach { h =>
      val aggs = h.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(aggs.exists(_.groupingExpressions.isEmpty),
        "q15's only hint must sit on the scalar max reduction")
    }
    val shuffled = executedShuffleJoins("tpch_q15_topsupp")
    assert(shuffled.isEmpty,
      s"AQE must broadcast q15's join-backs at fixture scale (${shuffled.size} shuffle joins)")
    // semantics lock: result = ALL argmax suppliers (ties kept, no limit)
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(9, 2)) *
        (lit(1.0) - col("l_discount")).cast(org.apache.spark.sql.types.DecimalType(3, 2)))
        .cast("double").as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val mx = rev.map(_._2).max
    val want = rev.filter(_._2 == mx).map(_._1).toSet
    val got = SparkEntry.queries("tpch_q15_topsupp")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"argmax supplier set diverges: $got vs $want")
  }

  test("tpch_q8_marketshare plan: region+part slices push, share bounded") {
    val region = scanOf("tpch_q8_marketshare", "r_name")
    assert(region.metadata.getOrElse("PushedFilters", "").contains("r_name"),
      "region filter must reach the region scan")
    val part = scanOf("tpch_q8_marketshare", "p_type")
    assert(part.metadata.getOrElse("PushedFilters", "").contains("p_type"),
      "part-type slice must reach the part scan")
    // numerator/denominator from ONE pass: share must land in [0, 1]
    val rows = SparkEntry.queries("tpch_q8_marketshare")(spark, sf).collect()
    assert(rows.nonEmpty, "q8 must return year rows — a drifted literal would empty it")
    rows.foreach { r =>
      val share = r.getDouble(3)
      assert(share >= 0.0 && share <= 1.0, s"share out of range: $share")
    }
  }

  test("tpch_q9_profit: measure equals revenue minus adapted supply cost") {
    // The derived measure must decompose: sum_profit(group) =
    // revenue(group) - 0.5 * retail * qty(group), each term exact.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import graft.model.Tables
    val base = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(9, 2)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(3, 2))).as("rev"),
        sum(col("p_retailprice").cast(DecimalType(9, 2)) *
          col("l_quantity").cast(DecimalType(4, 0)) *
          lit(0.5).cast(DecimalType(2, 1))).as("cost"))
      .select(col("n_name"), col("rev").minus(col("cost")).cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val got = SparkEntry.queries("tpch_q9_profit")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(got.nonEmpty, "q9 must return nation-year rows — a drifted literal would empty it")
    got.foreach { case (nation, profit) =>
      assert(math.abs(profit - base(nation)) < 1e-6,
        s"profit decomposition diverges for $nation: $profit vs ${base(nation)}")
    }
  }

  test("tpch_q11_important: fraction threshold is one scalar, rows exceed it") {
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val total = Tables.lineitem(spark, sf)
      .agg(graft.ops.Num.dsum(col("l_extendedprice"))).collect().head.getDouble(0)
    val nParts = Tables.lineitem(spark, sf)
      .select(col("l_partkey")).distinct().count()
    val threshold = total * 1.2 / nParts
    val rows = SparkEntry.queries("tpch_q11_important")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) > threshold,
        s"part ${r.getLong(0)} below the global-fraction threshold")
    }
    // and no qualifying part is missed
    val nAbove = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(graft.ops.Num.dsum(col("l_extendedprice")).as("v"))
      .filter(col("v") > threshold).count()
    assert(rows.length == nAbove, s"${rows.length} returned, $nAbove qualify")
  }

  test("tpch_q16_suppcnt plan: one-column anti exclusion, negated brand pushes") {
    val plan = SparkEntry.queries("tpch_q16_suppcnt")(spark, sf)
      .queryExecution.sparkPlan
    val antis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftAnti" => j
    }
    assert(antis.nonEmpty, "the supplier denylist must plan as a LEFT ANTI join")
    assert(antis.head.right.output.map(_.name) == Seq("s_suppkey"),
      s"anti side must project only s_suppkey, got ${antis.head.right.output}")
    val part = scanOf("tpch_q16_suppcnt", "p_brand")
    val pushed = part.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("p_brand") && pushed.contains("p_size"),
      s"negated brand + size slice must reach the part scan, got: $pushed")
  }

  test("tpch_q20_excess: semi-join into supplier, threshold is per-part") {
    val plan = SparkEntry.queries("tpch_q20_excess")(spark, sf)
      .queryExecution.sparkPlan
    val semis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftSemi" => j
    }
    assert(semis.nonEmpty, "the qualifying-supplier list must SEMI-join supplier")
    assert(semis.head.right.output.map(_.name) == Seq("l_suppkey"),
      s"semi side must project only the supplier key, got ${semis.head.right.output}")
    // every returned supplier really has a >2x-average part in the slice
    import org.apache.spark.sql.functions._
    import graft.model.Tables
    val sliced = Tables.lineitem(spark, sf)
      .filter(col("l_suppkey").isNotNull &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.part(spark, sf).filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(graft.ops.Num.dsum(col("l_quantity")).as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val avg = sliced.groupBy(_._1).view
      .mapValues(v => v.map(_._3).sum / v.size).toMap
    val want = sliced.filter { case (pk, _, q) => q > 2.0 * avg(pk) }
      .map(_._2).toSet
    val got = SparkEntry.queries("tpch_q20_excess")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == want, s"qualifying supplier set diverges: $got vs $want")
  }
}
