package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst cosine-similarity over two numeric arrays.
  *
  * The higher-order-function formulation (VectorOps.cosine: zip_with +
  * aggregate) is semantically identical but interpreted — Spark does not
  * codegen lambda functions, so every row pays closure dispatch and an
  * intermediate array allocation. This expression emits a single fused
  * loop accumulating dot/normA/normB in one pass and participates in
  * whole-stage codegen, which is the hot path for brute-force k-NN and
  * all-pairs near-dup scans.
  *
  * Numerics: elements are widened to double and accumulated left-to-right,
  * the exact fold order of the HOF version and of DuckDB's list_reduce, so
  * results remain bit-identical to the oracle. Zero-norm input → 0.0
  * (rag_engine.py:154's metric never sees zero vectors; we define the
  * guard).
  *
  * Mismatched lengths fold over the common prefix BY DEFINITION — a
  * deliberate divergence from the HOF/oracle formulations, which
  * null-pad through zip_with/list_zip and return NULL (matching them
  * would force `nullable = true` unconditionally, changing the schema
  * of every sim column for an input the engine contract rules out).
  * The contract that makes all three formulations bit-equal is
  * equal-length arrays; CustomExprSpec pins both the contract on the
  * fixture (every embedding exactly DIMS elements) and the defined
  * prefix behavior off it.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // A null ELEMENT also nulls the result (the HOF fold propagates NULL
  // through zip_with/aggregate), so nullability must account for
  // element-level containsNull, not just the arrays.
  override def nullable: Boolean = left.nullable || right.nullable ||
    SquaredDistance.elemNullable(left) || SquaredDistance.elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val n = math.min(xa.numElements(), xb.numElements())
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // null element -> null result, matching the HOF fold's propagation;
      // schema-violating nulls (containsNull=false) fail loudly — gated on
      // elemNullable, the same condition that emits the codegen guard, so
      // interpreted and codegen paths agree (see SquaredDistance)
      if (xa.isNullAt(i) || xb.isNullAt(i)) {
        if (SquaredDistance.elemNullable(left) || SquaredDistance.elemNullable(right))
          return null
        throw new NullPointerException(
          "cosine_sim: null element in containsNull=false input")
      }
      val x = if (leftFloat) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (rightFloat) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val la = if (elemType(left) == FloatType) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
    val lb = if (elemType(right) == FloatType) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      // see SquaredDistance: the guard is emitted only when the schema
      // says elements can be null, keeping the common containsNull=false
      // hot loop branch-free
      val guard =
        if (SquaredDistance.elemNullable(left) || SquaredDistance.elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guard
         |  double $x = ${la.format(a, i)};
         |  double $y = ${lb.format(b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($d == 0.0) ? 0.0 : $dot / $d;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point: `cosine_sim(a, b)`. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
