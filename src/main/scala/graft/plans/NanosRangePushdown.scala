package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet row-group pruning for nanos-encoded time columns.
  *
  * When a source stores event time as INT64 TIMESTAMP(NANOS) (the r1-r6
  * testdata encoding; `spark.sql.legacy.parquet.nanosAsLong=true` reads it
  * as a raw long), [[graft.model.Tables.normalizeTs]] canonicalizes it with
  * `timestamp_micros(ts div 1000)`. A time-range predicate on the
  * canonical column then pushes through the Project as
  * `timestamp_micros(ts#raw div 1000) BETWEEN lo AND hi` — a predicate on
  * a DERIVED expression, which the parquet source cannot translate to
  * PushedFilters: the scan silently degrades to a full read, exactly the
  * failure mode ADVICE.md flags (at 100 TB, the difference between a
  * pruned read and scanning everything).
  *
  * This rule AUGMENTS such filters with the equivalent bound on the raw
  * long attribute itself (`ts#raw >= lo_ns AND ts#raw <= hi_ns`), which IS
  * translatable, so FileSourceStrategy pushes it into the reader and
  * row-group statistics prune. The original predicate is KEPT — the added
  * conjunct is a proven superset (sound for every long, including the
  * negative pre-1970 domain where `div`'s truncation toward zero differs
  * from floor), so semantics are bit-identical and only the scan gets
  * cheaper. Bounds carry ±999 ns slack to stay sign-exact; row-group
  * pruning at sub-microsecond slack loses nothing.
  *
  * Registered like [[ApproxDistinctRewrite]]: `injectOptimizerRule` for
  * extension-built sessions and [[NanosRangePushdown.install]] for
  * already-built ones (Tables.load installs it whenever it sees the nanos
  * encoding). Runs in the user-provided batch — AFTER operator
  * optimization has pushed the filter through the normalize Project and
  * constant-folded the literals, so the match shapes below are exactly
  * what arrives. Idempotent under the batch's fixed point: an already-
  * present conjunct is never added twice (semantic dedup).
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  /** `timestamp_micros(x div 1000)` over a raw long — the normalizeTs
    * shape after alias substitution. */
  private object NsDecoded {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(x, Literal(1000L, LongType), _))
          if x.dataType == LongType && x.deterministic => Some(x)
      case _ => None
    }
  }

  /** lo/hi nanosecond bounds, None on long overflow (skip the rewrite —
    * the original predicate still enforces correctness). */
  private def nsLo(us: Long): Option[Expression] =
    try Some(Literal(Math.subtractExact(Math.multiplyExact(us, 1000L), 999L), LongType))
    catch { case _: ArithmeticException => None }
  private def nsHi(us: Long): Option[Expression] =
    try Some(Literal(Math.addExact(Math.multiplyExact(us, 1000L), 999L), LongType))
    catch { case _: ArithmeticException => None }

  /** The raw-attribute bounds implied by one conjunct, if it compares the
    * decoded column against a timestamp literal (either orientation). */
  private def implied(c: Expression): Seq[Expression] = c match {
    // t(x) >= L  ⟹  x >= 1000L − 999
    case GreaterThanOrEqual(NsDecoded(x), Literal(us: Long, TimestampType)) =>
      nsLo(us).map(GreaterThanOrEqual(x, _)).toSeq
    case LessThanOrEqual(Literal(us: Long, TimestampType), NsDecoded(x)) =>
      nsLo(us).map(GreaterThanOrEqual(x, _)).toSeq
    // t(x) > L  ⟹  t(x) >= L+1 (micros granularity)  ⟹  x >= 1000L + 1
    case GreaterThan(NsDecoded(x), Literal(us: Long, TimestampType)) if us < Long.MaxValue =>
      nsLo(us + 1).map(GreaterThanOrEqual(x, _)).toSeq
    case LessThan(Literal(us: Long, TimestampType), NsDecoded(x)) if us < Long.MaxValue =>
      nsLo(us + 1).map(GreaterThanOrEqual(x, _)).toSeq
    // t(x) <= U  ⟹  x <= 1000U + 999
    case LessThanOrEqual(NsDecoded(x), Literal(us: Long, TimestampType)) =>
      nsHi(us).map(LessThanOrEqual(x, _)).toSeq
    case GreaterThanOrEqual(Literal(us: Long, TimestampType), NsDecoded(x)) =>
      nsHi(us).map(LessThanOrEqual(x, _)).toSeq
    // t(x) < U  ⟹  t(x) <= U−1  ⟹  x <= 1000U − 1
    case LessThan(NsDecoded(x), Literal(us: Long, TimestampType)) if us > Long.MinValue =>
      nsHi(us - 1).map(LessThanOrEqual(x, _)).toSeq
    case GreaterThan(Literal(us: Long, TimestampType), NsDecoded(x)) if us > Long.MinValue =>
      nsHi(us - 1).map(LessThanOrEqual(x, _)).toSeq
    // t(x) = L  ⟹  both bounds
    case EqualTo(NsDecoded(x), Literal(us: Long, TimestampType)) =>
      (nsLo(us).map(GreaterThanOrEqual(x, _)) ++ nsHi(us).map(LessThanOrEqual(x, _))).toSeq
    case EqualTo(Literal(us: Long, TimestampType), NsDecoded(x)) =>
      (nsLo(us).map(GreaterThanOrEqual(x, _)) ++ nsHi(us).map(LessThanOrEqual(x, _))).toSeq
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extras = conjuncts.flatMap(implied)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        // dedupe among the additions themselves (EqualTo emits two)
        .foldLeft(Seq.empty[Expression]) { (acc, e) =>
          if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
        }
      if (extras.isEmpty) f
      else Filter(extras.foldLeft(cond)(And(_, _)), child)
  }

  /** Idempotent registration on an already-built session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NanosRangePushdown)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NanosRangePushdown
    }
}
