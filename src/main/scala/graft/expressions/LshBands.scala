package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst banded random-hyperplane LSH signature: for each of
  * `bands` bands, an `rows`-bit bucket id where bit i is the sign of the
  * dot product with integer hyperplane p = band·rows + i (weights
  * `VectorOps.adaptivePlaneWeight`: the full-rank integer derivation —
  * NOT the period-17 `planeWeight` of the frozen PLANES=8 contract —
  * shared bit-for-bit by Spark and the DuckDB oracle).
  *
  * The compositional formulation (one `VectorOps.dot` HOF per plane,
  * summed CASE bits — `VectorOps.lshBandBucket`) is semantically
  * identical but interpreted: at adaptive plane counts (bands·rows grows
  * with log n, ~56 planes at the third scaling decade) that is dozens of
  * closure-dispatched 64-element folds per row. This expression fuses
  * the whole signature into one codegen'd loop nest — weights computed
  * inline from the integer formula, no per-row allocation beyond the
  * result array — and participates in whole-stage codegen.
  *
  * Numerics: elements widen to double and each plane's dot accumulates
  * left-to-right from 0.0, the exact fold order of the HOF version and
  * of DuckDB's ordered `list_reduce`, so bucket ids are bit-identical to
  * the oracle (the only float sensitivity is the sign test, which
  * inherits the fold order). Arrays whose length ≠ `dims` produce the
  * ALL-ZERO signature: the HOF zip_with null-pads the shorter side, so
  * its dot is NULL and every sign test fails (bit 0), and the SQL
  * oracle's out-of-range `embedding[d + 1]` lookups propagate NULL the
  * same way — an earlier draft folded the prefix instead, which matched
  * neither off the 64-dim fixture (caught by the randomized
  * length-sweep property in AdaptiveLshSpec, which asserts bit-equality
  * against the HOF formulation at lengths 1..dims+8).
  */
case class LshBands(child: Expression, bands: Int, rows: Int, dims: Int,
    bandOffset: Int = 0, thresholds: Seq[Double] = Nil)
    extends UnaryExpression {
  // `thresholds` (r15 centered projections): per-plane sign-test
  // thresholds indexed by LOCAL plane t·rows + i (the caller passes the
  // slice for its bandOffset). Empty = sign-at-zero, the pre-r15
  // behavior every frozen contract keeps. Non-empty thresholds are the
  // per-plane sample MEDIANS (VectorQueries.adaptiveThresholds): bit i
  // becomes dp > thr[t·rows+i], splitting each plane's population ~50/50
  // against the corpus's own anisotropy — the r14 watch item measured
  // sign-at-zero planes at mean bias q ≈ 0.6, whose product over r
  // planes clumped buckets 2.07× over Poisson at sf100 and compounded
  // per decade. The oracle derives the identical medians in SQL from
  // the identical ordered-fold dots, so bucket ids stay bit-identical.
  require(thresholds.isEmpty || thresholds.size == bands * rows,
    s"need bands*rows (${bands * rows}) thresholds, got ${thresholds.size}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean =
    child.nullable || SquaredDistance.elemNullable(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_bands expects array<float|double> input, got ${other.catalogString}")
    }

  private def elemFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    // length mismatch -> all-zero signature (the HOF/oracle null
    // propagation; see class doc)
    if (xs.numElements() != dims) return new GenericArrayData(new Array[Int](bands))
    val lim = dims
    val out = new Array[Int](bands)
    var t = 0
    while (t < bands) {
      var bucket = 0
      var i = 0
      while (i < rows) {
        val p = (bandOffset + t) * rows + i
        var dp = 0.0
        var d = 0
        while (d < lim) {
          if (xs.isNullAt(d)) {
            if (SquaredDistance.elemNullable(child)) return null
            throw new NullPointerException(
              "lsh_bands: null element in containsNull=false input")
          }
          val x = if (elemFloat) xs.getFloat(d).toDouble else xs.getDouble(d)
          dp += x * graft.ops.VectorOps.adaptivePlaneWeight(p, d).toDouble
          d += 1
        }
        val thr = if (thresholds.isEmpty) 0.0 else thresholds(t * rows + i)
        if (dp > thr) bucket |= (1 << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemFloat) "(double) %s.getFloat(%s)" else "%s.getDouble(%s)"
    nullSafeCodeGen(ctx, ev, a => {
      val lim = ctx.freshName("lim")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val p = ctx.freshName("p")
      val dp = ctx.freshName("dp")
      val bucket = ctx.freshName("bucket")
      // centered projections: the per-plane threshold array rides along
      // as a referenced object (≤ bands·rows ≈ 900 doubles); the empty
      // case keeps the literal 0.0 compare so frozen sign-at-zero
      // consumers generate the identical code they always did
      val thrTest =
        if (thresholds.isEmpty) s"if ($dp > 0.0)"
        else {
          val thrRef = ctx.addReferenceObj("lshThr", thresholds.toArray, "double[]")
          s"if ($dp > $thrRef[$t * $rows + $i])"
        }
      // same emit-only-when-nullable guard discipline as SquaredDistance /
      // CosineSimilarity: containsNull=false inputs keep the loop
      // branch-free. The label breaks all three loops on a null element.
      val guard =
        if (SquaredDistance.elemNullable(child))
          s"if ($a.isNullAt($d)) { ${ev.isNull} = true; break bandsLoop$out; }"
        else ""
      s"""
         |int $lim = $dims;
         |int[] $out = new int[$bands];
         |// length mismatch -> all-zero signature (HOF/oracle null
         |// propagation; see class doc)
         |if ($a.numElements() == $dims) {
         |bandsLoop$out:
         |for (int $t = 0; $t < $bands; $t++) {
         |  int $bucket = 0;
         |  for (int $i = 0; $i < $rows; $i++) {
         |    int $p = ($bandOffset + $t) * $rows + $i;
         |    double $dp = 0.0;
         |    for (int $d = 0; $d < $lim; $d++) {
         |      $guard
         |      long k$dp = (long) $p * 104729L + (long) $d;
         |      $dp += ${get.format(a, d)} * (double)
         |        ((((k$dp * k$dp + k$dp * 2654435761L) % 2038074743L)
         |          / 131072L) % 17L - 8L);
         |    }
         |    $thrTest $bucket |= (1 << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBands {
  /** Column-API entry point: array of `bands` bucket ids for `emb`.
    * `bandOffset` shifts the hyperplane family to ABSOLUTE bands
    * [offset, offset + bands) — plane p = (offset + t)·rows + i — so a
    * band-chunked consumer (knn_join_lsh_adaptive's bounded-disk chunks)
    * computes exactly its chunk's planes per row instead of the full
    * L-band signature per chunk, and every chunk's buckets equal the
    * corresponding slice of the one-shot signature. `thresholds` (r15):
    * per-plane centered sign-test thresholds for the SAME local band
    * range, empty = sign-at-zero (see the class doc). */
  def lshBands(emb: Column, bands: Int, rows: Int, dims: Int,
      bandOffset: Int = 0, thresholds: Seq[Double] = Nil): Column =
    ColumnBridge.column(
      LshBands(ColumnBridge.expression(emb), bands, rows, dims, bandOffset,
        thresholds))
}
