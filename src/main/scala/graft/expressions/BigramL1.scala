package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-bigram multiset L1 distance between two strings — the
  * counting-filter lower bound for edit-distance joins.
  *
  * One edit operation changes each string's bigram multiset by at most 2
  * entries (a substitution at position i rewrites bigrams (i−1,i) and
  * (i,i+1); an indel touches ≤2 on one side and 1 on the other), so the
  * L1 distance moves by ≤4 per edit and
  *
  *   levenshtein(a, b) ≥ bigram_l1(a, b) / 4.
  *
  * A fuzzy-dedup candidate pair with threshold t can therefore be pruned
  * whenever `bigram_l1 > 4·t` — an O(|a|+|b|) counting pass against the
  * O(|a|·|b|) DP it avoids, and (unlike a plain character histogram)
  * order-sensitive enough to separate same-vocabulary documents.
  *
  * Exact by construction: bigram codes are two Unicode CODE POINTS
  * (≤21 bits each) packed into a long (no hashing, no collisions),
  * counted +1 for the left string and −1 for the right; the result is
  * Σ|count|. Iterating by code point, not UTF-16 code unit, matters for
  * the bound: both engines' `levenshtein` counts code-point edits, so a
  * substitution involving a supplementary-plane character (a surrogate
  * PAIR in UTF-16) is ONE edit — a code-unit bigram walk would see up
  * to 3 perturbed bigrams per side and could overshoot the 4-per-edit
  * budget, breaking the prune's soundness for non-BMP text. The
  * expression is integer-valued and engine-independent, but it exists
  * for PRUNING — oracle SQL should keep the plain levenshtein predicate
  * (the prune never changes the result set).
  */
case class BigramL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bigram_l1"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_l1 expects string inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BigramL1.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  /** Codegen delegates to the same static kernel the interpreted path
    * uses (the Spark-built-in pattern — `levenshtein` does exactly this
    * with `UTF8String.levenshteinDistance`): the call stays inside the
    * fused whole-stage loop, and the counting pass itself has no
    * profitable inline form. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.BigramL1.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BigramL1 {
  /** Σ over bigram codes of |count_a − count_b|. ~2(|a|+|b|) map ops per
    * call; the map holds ≤|a|+|b| entries (word-length strings → a few
    * hundred), far below any boxed-collection pathology. */
  def compute(a: UTF8String, b: UTF8String): Int = {
    val sa = a.toString
    val sb = b.toString
    val counts = new java.util.HashMap[Long, Integer](
      (sa.length + sb.length) * 2)
    // Walk by CODE POINT (surrogate pairs advance by 2 code units) so
    // one code-point edit perturbs ≤2 bigrams per side — the invariant
    // the lev ≥ l1/4 bound rests on.
    def addAll(s: String, sign: Int): Unit = {
      var i = 0
      var prev = -1
      while (i < s.length) {
        val cp = s.codePointAt(i)
        if (prev >= 0) {
          val key = (prev.toLong << 21) | cp.toLong
          counts.merge(key, Integer.valueOf(sign),
            (x, y) => Integer.valueOf(x + y))
        }
        prev = cp
        i += Character.charCount(cp)
      }
    }
    addAll(sa, 1)
    addAll(sb, -1)
    var l1 = 0
    val it = counts.values().iterator()
    while (it.hasNext) l1 += math.abs(it.next().intValue())
    l1
  }

  /** Column-API entry point: `bigram_l1(a, b)` over strings. */
  def bigramL1(a: Column, b: Column): Column =
    ColumnBridge.column(
      BigramL1(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
