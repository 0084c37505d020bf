package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-plane sign-split diagnostic for the adaptive hyperplane family
  * (r15): measures, on the deterministic threshold sample, the fraction
  * of vectors falling on the positive side of each plane — at the
  * legacy sign-at-zero test AND at the r15 median-split thresholds —
  * plus the inter-plane agreement the clump factor actually depends on.
  *
  * Exists to adjudicate the r14 clumping hypothesis: the r14 analysis
  * inverted the bucket clump factor (2.07× over Poisson at sf100)
  * through an INDEPENDENT-planes model and inferred mean per-plane bias
  * q ≈ 0.6; centering the projections (median thresholds) should then
  * have collapsed the clump to ~1. The direct measurement decides
  * between "marginal bias" (mean |q−0.5| large at zero, ~0 at thr) and
  * "inter-plane correlation from embedding cluster structure" (marginal
  * q ≈ 0.5 both ways, pairwise plane agreement > the q²+(1−q)²
  * independence line) — only the first is fixable by thresholds.
  *
  * Usage: runMain graft.tools.PlaneBias <sfDir> [<sfDir2> ...]
  */
object PlaneBias {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val e = graft.model.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val n = e.count()
      val dims = e.select(size(col("embedding"))).head().getInt(0)
      val r = graft.queries.VectorQueries.adaptiveRows(n)
      val l = graft.queries.VectorQueries.adaptiveBands(r)
      val thr = graft.queries.VectorQueries.adaptiveThresholds(spark, e, n, r, 0, l)
      val smod = graft.queries.VectorQueries.lshSampleMod(n)
      // one collect of the sampled plane dots: sample×L·r doubles,
      // bounded by the sample rule (~16k rows) — diagnostic-only
      val rows = e.filter(pmod(col("vec_id"), lit(smod)) === 0 &&
          size(col("embedding")) === dims)
        .select(graft.expressions.LshPlaneDots.planeDots(
          col("embedding"), l, r, dims)).collect()
        .map(_.getSeq[Double](0).toArray)
      val nP = l * r
      val qZero = new Array[Double](nP)
      val qThr = new Array[Double](nP)
      (0 until nP).foreach { p =>
        qZero(p) = rows.count(_(p) > 0.0).toDouble / rows.length
        qThr(p) = rows.count(_(p) > thr(p)).toDouble / rows.length
      }
      def stats(q: Array[Double]): (Double, Double) = {
        val dev = q.map(x => math.abs(x - 0.5))
        (dev.sum / dev.length, dev.max)
      }
      val (mz, xz) = stats(qZero)
      val (mt, xt) = stats(qThr)
      // pairwise plane agreement within each band vs the independence
      // line: for planes p, p' with marginals q_p, q_p', independent
      // splits agree w.p. q_p·q_p' + (1−q_p)(1−q_p'); the clump factor
      // compounds the RATIO of measured agreement over that line across
      // the band's r planes.
      var agreeSum = 0.0; var indepSum = 0.0; var cnt = 0
      (0 until l).foreach { t =>
        val ps = (t * r) until ((t + 1) * r)
        for (a <- ps; b <- ps; if a < b) {
          val agree = rows.count(v =>
            (v(a) > thr(a)) == (v(b) > thr(b))).toDouble / rows.length
          val indep = qThr(a) * qThr(b) + (1 - qThr(a)) * (1 - qThr(b))
          agreeSum += agree; indepSum += indep; cnt += 1
        }
      }
      println(s"""[planebias] {"dir":"$dir","n":$n,"r":$r,"l":$l,""" +
        s""""sample":${rows.length},"meanDevZero":$mz,"maxDevZero":$xz,""" +
        s""""meanDevThr":$mt,"maxDevThr":$xt,""" +
        s""""meanAgree":${agreeSum / cnt},"meanIndepAgree":${indepSum / cnt}}""")
    }
    spark.stop()
  }
}
