package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Jaccard similarity of two long-array SETS (elements assumed
  * distinct, as produced by the dedup pipeline's hashed-token sets).
  *
  * Replaces `size(array_intersect(a,b)) / (|a| + |b| - inter)`: the
  * composed form materializes the intersection array and runs outside a
  * fused loop, while this expression computes the intersection COUNT in
  * one hash-probe pass and emits the ratio directly. Integer counts, so
  * the result is bit-identical to the oracle's len(list_filter(...))
  * formula by construction.
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"jaccard_sim expects array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  /** Intersection count via a probe set over the smaller array. */
  @inline private def interCount(xa: ArrayData, xb: ArrayData): Int = {
    val (small, big) = if (xa.numElements() <= xb.numElements()) (xa, xb) else (xb, xa)
    val set = new java.util.HashSet[Long](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) { set.add(small.getLong(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < big.numElements()) {
      if (set.contains(big.getLong(j))) inter += 1
      j += 1
    }
    inter
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xa = a.asInstanceOf[ArrayData]
    val xb = b.asInstanceOf[ArrayData]
    val union = xa.numElements() + xb.numElements()
    if (union == 0) 0.0
    else {
      val inter = interCount(xa, xb)
      inter.toDouble / (union - inter)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val set = ctx.freshName("set")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val ad = classOf[ArrayData].getName
      s"""
         |int $union = $a.numElements() + $b.numElements();
         |if ($union == 0) { ${ev.value} = 0.0; } else {
         |  $ad $small = ($a.numElements() <= $b.numElements()) ? $a : $b;
         |  $ad $big = ($a.numElements() <= $b.numElements()) ? $b : $a;
         |  java.util.HashSet<Long> $set = new java.util.HashSet<Long>($small.numElements() * 2);
         |  for (int $i = 0; $i < $small.numElements(); $i++) $set.add($small.getLong($i));
         |  int $inter = 0;
         |  for (int $j = 0; $j < $big.numElements(); $j++) {
         |    if ($set.contains($big.getLong($j))) $inter++;
         |  }
         |  ${ev.value} = (double) $inter / ($union - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSimilarity {
  /** Column-API entry point: `jaccard_sim(a, b)` over array<bigint> sets. */
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
