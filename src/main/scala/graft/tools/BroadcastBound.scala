package graft.tools

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.BooleanType

/** Static row-count BOUND estimator for broadcast-hinted subtrees — the
  * PlanAudit extension behind the r10 hint discipline: an explicit
  * `broadcast()` is legitimate ONLY on a frame whose cardinality is
  * bounded independent of scale factor (a true dim, a scalar reduction,
  * a bounded-group aggregate, a top-N). A hint on anything that grows
  * with SF does not degrade at scale — it ODs the driver — so the audit
  * walks every query's ANALYZED plan (hints are still explicit
  * `ResolvedHint` nodes there; the optimizer folds them into join
  * attributes), bounds each hinted subtree, and fails any hint whose
  * bound is unknown or above [[CAP]].
  *
  * The estimator is deliberately conservative: it returns a bound only
  * for shapes it can PROVE bounded —
  *
  *  - leaves: LocalRelation/Range by size; parquet scans only for
  *    tables in [[TABLE_BOUNDS]] (nation/region and the d-row derived
  *    stores); every other scan is unbounded;
  *  - `limit(n)` → n (the top-N sampler shape, e.g. lsh_recall_eval's
  *    fixed-count anchors);
  *  - aggregates: no grouping → 1; grouped → the product of grouping
  *    domains, where a domain is known for [[BOUNDED_COLS]] (bounded
  *    real-world vocabularies like event_type), boolean-typed
  *    expressions (2), year() (bounded calendar), or a column pinned by
  *    an IN/= literal filter below the aggregate (bm25's fixed query
  *    terms);
  *  - filters: an equality/range/IN predicate over a UNIQUE id column
  *    ([[UNIQUE_KEYS]]) bounds rows by the literal (the capped codebook
  *    seed filters, `vec_id < 10` query pools); ids are non-negative so
  *    `id < k` bounds rows by k;
  *  - joins: semi/anti by the left side; inner/outer by the product;
  *    unions by the sum; generate (explode of a literal-sized
  *    sequence/array) multiplies by the generator's width.
  *
  * Anything unrecognized is unbounded — a new hint pattern fails the
  * audit until it is either expressible in a provable shape or
  * explicitly waived in [[PlanAudit.BROADCAST_OK]] with a reason (the
  * UNPUSHED_OK review discipline applied to hints).
  *
  * Blind spot and its patch: `localCheckpoint()` during query
  * CONSTRUCTION truncates lineage to a LogicalRDD, hiding any hint in
  * the checkpointed segment from the final analyzed plan. The
  * [[ExecutionAuditListener]] closes that hole by auditing the analyzed
  * plan of every query the session EXECUTES (checkpoint segments run as
  * their own executions) — PlanAudit and BroadcastBoundSpec both
  * register it alongside the top-level walk.
  */
object BroadcastBound {

  /** Hard cap on a provable bound before it is still called a
    * violation: bounded-but-huge (> 1M rows) is not a broadcastable
    * dim either. Generous vs every legitimate site (nation² = 625,
    * codebook caps ≤ 32k after subspace explode). */
  val CAP: Long = 1000000L

  /** Columns whose value domain is bounded by the WORLD, not the
    * corpus: more data means more rows per value, never more values.
    * Domain sizes are generous caps, only multiplied against each
    * other, so slack is harmless under [[CAP]].
    *
    * This is a NAME convention, deliberately: the engine reserves these
    * names for bounded domains (c_id/code descend from the capped seed
    * filters, s is the subspace index, event_type/source/lang are fixed
    * vocabularies). A query that aliased an UNBOUNDED key onto one of
    * these names would false-pass — the residual risk of any name-based
    * rule — so additions here require the same review as a
    * BROADCAST_OK waiver, and the generic single-letter entries stay
    * minimal. */
  private val BOUNDED_COLS: Map[String, Long] = Map(
    "event_type" -> 16L, // fixed product event vocabulary
    "source" -> 16L, // fixed source-system list
    "lang" -> 32L, "a_lang" -> 32L, "b_lang" -> 32L, // language codes
    "n_name" -> 25L, "n_nationkey" -> 25L, // nation dim
    "r_name" -> 5L, "r_regionkey" -> 5L, // region dim
    "s" -> 64L, // PQ subspace index (SUBS constant)
    "ticker" -> 4096L, // listed-symbol universe: bounded, not SF-scaled
    // centroid / PQ-code ids: every c_id/code in this engine descends
    // from the capped codebook seed filters (VectorQueries.IVF_SEED_CAP
    // / PQ_SEED_CAP), so their DOMAIN is a model constant even when the
    // lineage (window ranks, re-grouping) hides the originating filter —
    // kmeans_lloyd_train's round-2 centroid table is the canonical case.
    "c_id" -> 8192L,
    "code" -> 8192L)

  /** Columns that are unique row ids in their base tables — a literal
    * equality/range/IN over one of these bounds the ROW count, not just
    * the domain. */
  private val UNIQUE_KEYS: Set[String] = Set("vec_id", "doc_id", "event_id")

  /** Parquet leaves with a priori bounded cardinality: the two true
    * TPC-H dims and the d-row PCA basis store (rows = embedding
    * dimensionality, a model constant). */
  private val TABLE_BOUNDS: Map[String, Long] = Map(
    "nation" -> 25L,
    "region" -> 5L,
    "graft_pca_basis" -> 4096L)

  // ---- expression helpers ---------------------------------------------

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case a: Alias => stripCast(a.child)
    case other => other
  }

  private def litLong(e: Expression): Option[Long] = stripCast(e) match {
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Short, _) => Some(v.toLong)
    case _ => None
  }

  private def attrName(e: Expression): Option[String] = stripCast(e) match {
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Row bound a single filter condition imposes, via its unique-key
    * conjuncts. `id < k` bounds rows by k because ids are non-negative
    * integers here (testdata + store contract). */
  private def condRowBound(cond: Expression): Option[Long] = {
    val bounds = conjuncts(cond).flatMap {
      case EqualTo(a, l) if attrName(a).exists(UNIQUE_KEYS) && litLong(l).isDefined =>
        Some(1L)
      case EqualTo(l, a) if attrName(a).exists(UNIQUE_KEYS) && litLong(l).isDefined =>
        Some(1L)
      case LessThan(a, l) if attrName(a).exists(UNIQUE_KEYS) => litLong(l)
      case LessThanOrEqual(a, l) if attrName(a).exists(UNIQUE_KEYS) =>
        litLong(l).map(_ + 1)
      case In(a, list) if attrName(a).exists(UNIQUE_KEYS) &&
          list.forall(_.isInstanceOf[Literal]) =>
        Some(list.size.toLong)
      case _ => None
    }
    bounds.minOption
  }

  /** Value-domain cap a filter in `plan` pins onto attribute `attr`
    * (IN-list / equality over ANY column, not just unique keys — a
    * grouping column filtered to literals has that many groups).
    * Matched by exprId, not name: a same-named column from another join
    * side must not leak its filter's bound onto this attribute. */
  private def filterDomain(attr: AttributeReference,
                           plan: LogicalPlan): Option[Long] = {
    def sameRef(e: Expression): Boolean = stripCast(e) match {
      case a: AttributeReference => a.exprId == attr.exprId
      case _ => false
    }
    plan.collect { case f: Filter => conjuncts(f.condition) }.flatten.collectFirst {
      case In(a, list) if sameRef(a) &&
          list.forall(_.isInstanceOf[Literal]) => list.size.toLong
      case EqualTo(a, l: Literal) if sameRef(a) => 1L
      case EqualTo(l: Literal, a) if sameRef(a) => 1L
    }
  }

  /** Domain size of one grouping expression over `child`. */
  private def domainOf(e: Expression, child: LogicalPlan): Option[Long] =
    stripCast(e) match {
      case a: AttributeReference =>
        BOUNDED_COLS.get(a.name)
          .orElse(filterDomain(a, child))
          .orElse(if (a.dataType == BooleanType) Some(2L) else None)
      case _: Year => Some(200L) // bounded calendar range
      case _: Month => Some(12L)
      case _: DayOfWeek | _: WeekDay => Some(7L)
      case other if other.dataType == BooleanType => Some(2L)
      case _ => None
    }

  private def product(xs: Seq[Option[Long]]): Option[Long] =
    xs.foldLeft(Option(1L)) {
      case (Some(a), Some(b)) if a <= CAP && b <= CAP => Some(a * b)
      case _ => None
    }

  /** Generator width for explode over a literal-sized sequence/array. */
  private def generatorBound(g: Generator): Option[Long] = g match {
    case Explode(child) => stripCast(child) match {
      case Sequence(lo, hi, _, _) =>
        for (l <- litLong(lo); h <- litLong(hi)) yield math.max(0L, h - l + 1)
      case CreateArray(items, _) => Some(items.size.toLong)
      case _ => None
    }
    case PosExplode(child) => generatorBound(Explode(child))
    case _ => None
  }

  /** Upper bound on `p`'s row count, independent of SF — None means
    * "could grow with the data". */
  def boundOf(p: LogicalPlan): Option[Long] = p match {
    case l: LocalRelation => Some(l.data.size.toLong)
    case _: OneRowRelation => Some(1L)
    case r: Range => Some(r.numElements.min(BigInt(Long.MaxValue)).toLong)
    case g: GlobalLimit =>
      litLong(g.limitExpr).map(n => boundOf(g.child).fold(n)(math.min(n, _)))
    case l: LocalLimit =>
      // local limit alone doesn't bound globally (n per partition);
      // only min with the child's own bound
      boundOf(l.child)
    case a: Aggregate =>
      if (a.groupingExpressions.isEmpty) Some(1L)
      else product(a.groupingExpressions.map(domainOf(_, a.child)))
    case d: Distinct =>
      product(d.child.output.map(domainOf(_, d.child)))
    case d: Deduplicate =>
      product(d.keys.map(domainOf(_, d.child)))
    case f: Filter =>
      (condRowBound(f.condition), boundOf(f.child)) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case (a, b) => a.orElse(b)
      }
    case j: Join =>
      import org.apache.spark.sql.catalyst.plans._
      val (l, r) = (boundOf(j.left), boundOf(j.right))
      j.joinType match {
        case LeftSemi | LeftAnti => l
        // Outer joins emit unmatched rows BEYOND the match product, so
        // the true upper bound adds the unmatched side(s) — an inner
        // product alone would under-bound (e.g. full outer of disjoint
        // 1-row sides emits 2, not 1).
        case LeftOuter => product(Seq(l, r)).flatMap(p => l.map(p + _))
        case RightOuter => product(Seq(l, r)).flatMap(p => r.map(p + _))
        case FullOuter =>
          for (p <- product(Seq(l, r)); a <- l; b <- r) yield p + a + b
        case _ => product(Seq(l, r))
      }
    case u: Union =>
      u.children.map(boundOf).foldLeft(Option(0L)) {
        case (Some(a), Some(b)) => Some(a + b)
        case _ => None
      }
    case g: Generate =>
      // outer generate emits the input row even when the generator is
      // empty, so its multiplier never drops below 1.
      val gb = generatorBound(g.generator)
        .map(n => if (g.outer) math.max(1L, n) else n)
      product(Seq(boundOf(g.child), gb))
    case h: ResolvedHint => boundOf(h.child)
    case pr: Project => boundOf(pr.child)
    case s: SubqueryAlias => boundOf(s.child)
    case s: Sort => boundOf(s.child)
    case w: Window => boundOf(w.child)
    case r: RepartitionOperation => boundOf(r.child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        val root = h.location.rootPaths.headOption.map(_.toString).getOrElse("?")
        TABLE_BOUNDS.get(tableFromRoot(root))
      case _ => None
    }
    case _ => None
  }

  /** Canonical table name from a file-scan root path — ONE parser shared
    * by every tool that attributes scans to tables (this estimator,
    * [[ScalingProbe]]'s driving-table derivation, [[PlanAudit.scanStats]]):
    * skip version dirs (`v_<fp>_m<mtime>`, `v3`-style), partition dirs
    * (`k=v`), and SF suffix dirs; strip the format extension. */
  private[tools] def tableFromRoot(root: String): String =
    root.split('/').reverse
      .find(seg => !seg.startsWith("v_") && !seg.contains("=") &&
        !seg.matches("sf[0-9.]+") && !seg.matches("v\\d+"))
      .getOrElse("?").stripSuffix(".parquet").stripSuffix(".csv")

  /** Broadcast-hinted subtrees of an analyzed plan with their bound
    * verdicts: (bound, description-of-offense) per hint; empty seq =
    * clean. */
  def audit(analyzed: LogicalPlan): Seq[(Option[Long], String)] =
    analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.exists(_.toString.toUpperCase.contains("BROADCAST")) =>
        val b = boundOf(h.child)
        (b, b match {
          case Some(n) if n <= CAP => ""
          case Some(n) => s"bounded but over cap ($n > $CAP)"
          case None =>
            val leaves = h.child.collectLeaves().map {
              case lr: LogicalRelation => lr.relation match {
                case hf: HadoopFsRelation =>
                  hf.location.rootPaths.headOption.map(_.toString.split('/').last)
                    .getOrElse("?")
                case _ => lr.relation.getClass.getSimpleName
              }
              case other => other.getClass.getSimpleName
            }
            s"UNBOUNDED hint (leaves: ${leaves.mkString(",").take(80)})"
        })
    }

  /** Sub-execution capture: `localCheckpoint()` (and any other eager
    * action taken DURING query construction — store builds, driver-side
    * probe collects) truncates lineage to a LogicalRDD, so a hint inside
    * the checkpointed segment is INVISIBLE in the final analyzed plan —
    * the one blind spot of [[audit]]. This listener closes it: every
    * query Spark executes on the session gets its OWN analyzed plan
    * audited at execution time, checkpoint segments included. The
    * listener bus is asynchronous, so labels are best-effort (set the
    * label before constructing each query; a violation reported under a
    * neighboring label still fails the gate) and callers must allow the
    * bus to drain (see [[drainWait]]) before reading [[hits]]. */
  final class ExecutionAuditListener
      extends org.apache.spark.sql.util.QueryExecutionListener {
    private val labelRef = new java.util.concurrent.atomic.AtomicReference[String]("?")
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    def setLabel(l: String): Unit = labelRef.set(l)
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        durationNs: Long): Unit =
      try audit(qe.analyzed).foreach { case (_, off) =>
        if (off.nonEmpty) hits.add((labelRef.get(), off))
      } catch { case _: Throwable => () }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution,
        error: Exception): Unit = ()
  }

  /** Crude-but-sufficient bus drain for a dev tool / spec: sleep in
    * slices until the hit count has been stable for 3 consecutive polls
    * AND a minimum wall floor has passed — the floor matters because a
    * backlogged bus can legitimately deliver its first event hundreds
    * of ms after the last execution, and a stability-only heuristic
    * would declare victory on an unchanged count of 0 after ~400 ms. */
  def drainWait(l: ExecutionAuditListener, millis: Long = 3000L): Unit = {
    val start = System.currentTimeMillis()
    val floor = math.min(1000L, millis)
    var last = -1
    var stable = 0
    val deadline = start + millis
    while ((stable < 3 || System.currentTimeMillis() - start < floor) &&
        System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      val n = l.hits.size
      if (n == last) stable += 1 else { stable = 0; last = n }
    }
  }
}
