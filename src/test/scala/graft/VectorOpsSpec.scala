package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.VectorOps

/** Unit specs for the vector layer: exact cosine identities, zero-vector
  * guard, decay weights/τ (rag_engine.py:161-163), LSH bucket range. */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private def vec(xs: Double*) = xs.map(_.toFloat).toArray

  test("cosine: orthogonal -> 0, parallel -> 1, antiparallel -> -1") {
    val df = Seq(
      (vec(1, 0, 0, 0), vec(0, 1, 0, 0)),
      (vec(1, 2, 3, 4), vec(2, 4, 6, 8)),
      (vec(1, 0, 0, 0), vec(-1, 0, 0, 0)))
      .toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-15)
    assert(math.abs(got(1) - 1.0) < 1e-15)
    assert(math.abs(got(2) + 1.0) < 1e-15)
  }

  test("cosine: zero vector -> 0.0 guard") {
    val df = Seq((vec(0, 0), vec(1, 1))).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b").as("c"))
    assert(df.collect().head.getDouble(0) == 0.0)
  }

  test("timeDecayScore: weights 0.6/0.4 and tau=14400 (rag_engine.py:161-163)") {
    val df = Seq((0.0, 0.0), (0.0, 14400.0)).toDF("dist", "age")
      .select(VectorOps.timeDecayScore($"dist", $"age").as("s"))
    val got = df.collect().map(_.getDouble(0))
    assert(got(0) == 1.0) // sim=1, age=0 -> 0.6 + 0.4
    // age = tau -> 0.6 + 0.4/e, quantized at 1e-6
    assert(math.abs(got(1) - (0.6 + 0.4 / math.E)) < 1e-6)
  }

  test("lshBucket: deterministic, in [0, 2^planes), identical vectors collide") {
    val df = Seq(
      ("x", vec(1, 2, 3, 4, 5, 6, 7, 8)),
      ("y", vec(1, 2, 3, 4, 5, 6, 7, 8)),
      ("z", vec(-1, -2, -3, -4, -5, -6, -7, -8)))
      .toDF("id", "e")
      .select($"id", VectorOps.lshBucket($"e", planes = 8, dims = 8).as("b"))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("x") == got("y"))
    assert(got.values.forall(b => b >= 0 && b < 256))
    // expected bucket recomputed from the plane-weight formula
    val xs = (1 to 8).map(_.toDouble)
    val expected = (0 until 8).map { p =>
      val d = xs.zipWithIndex.map { case (v, i) => v * VectorOps.planeWeight(p, i) }.sum
      if (d > 0.0) 1 << p else 0
    }.sum
    assert(got("x") == expected)
  }

  test("topKPerQuery: fused heap+merge equals the window form, asc and desc") {
    val rnd = new scala.util.Random(42)
    val df = (0 until 3000).map { i =>
      (i % 7L, i.toLong, rnd.nextDouble())
    }.toDF("q_id", "doc_id", "dist").repartition(8)
    for {
      order <- Seq(
        Seq($"dist", $"doc_id"),
        Seq($"dist".desc, $"doc_id"))
      k <- Seq(1, 5) // k=1 exercises the min_by aggregate fast path
    } {
      val fused = VectorOps.topKPerQuery(df, $"q_id", order, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val window = VectorOps.topKPerQueryWindow(df, $"q_id", order, k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fused == window)
      assert(fused.size == 7 * k)
    }
  }

  test("topKPerQuery: partial heap prunes map-side before the per-query exchange") {
    val df = (0 until 4000).map(i => (i % 2L, i.toLong, (i * 37 % 101).toDouble))
      .toDF("q_id", "doc_id", "dist").repartition(8)
    val fused = VectorOps.topKPerQuery(df, $"q_id", Seq($"dist", $"doc_id"), k = 3)
    // the map-side heap stage must appear in the physical plan...
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), s"no map-side partial stage in:\n$plan")
    assert(fused.count() == 2 * 3)
  }

  test("embedding_pca_project: matches a driver replication, Rayleigh grows, deterministic") {
    // The synthetic embeddings are near-isotropic (flat eigenvalue
    // spectrum), so convergence-to-PC1 is NOT a sound invariant for 3
    // rounds. What IS guaranteed: (a) the distributed decimal pipeline
    // computes the same 3-round iterate as a naive driver replication
    // (different implementation, same math — tolerance covers the r6
    // quantization steps); (b) the power-iteration Rayleigh quotient is
    // monotone for a symmetric PSD covariance, so the variance captured
    // by the 3-round direction is >= the starting axis variance C[0][0];
    // (c) the engine result is bit-deterministic across invocations.
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("embedding_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = graft.model.Tables.embeddings(spark, sf)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val d = rows.head._2.length
    val n = rows.length
    val mu = Array.tabulate(d)(j => rows.map(_._2(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.map(r => (r._2(i) - mu(i)) * (r._2(j) - mu(j))).sum / (n - 1)
    }
    var v = Array.tabulate(d)(k => if (k == 0) 1.0 else 0.0)
    for (_ <- 1 to 3) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val ref = rows.map { case (id, x) =>
      id -> (0 until d).map(j => (x(j) - mu(j)) * v(j)).sum
    }.toMap
    // (a) same 3-round projections up to quantization noise
    val maxDiff = out.keys.map(id => math.abs(out(id) - ref(id))).max
    assert(maxDiff < 1e-3, s"engine vs driver replication diverged: $maxDiff")
    // (b) Rayleigh monotonicity: captured variance >= starting axis var
    val pm = out.values.sum / n
    val varOut = out.values.map(x => (x - pm) * (x - pm)).sum / (n - 1)
    assert(varOut >= cov(0)(0) * 0.999,
      s"variance along 3-round direction ${varOut} < C[0][0] ${cov(0)(0)}")
    // (c) bit-deterministic
    val again = SparkEntry.queries("embedding_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == out)
  }

  test("embedding_pca_2d: pc1 matches the 1-component query, pc2 near-orthogonal") {
    val sf = "/root/testdata/sf0.001"
    val two = SparkEntry.queries("embedding_pca_2d")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val one = SparkEntry.queries("embedding_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the shared first component must be IDENTICAL bits in both queries
    assert(two.keySet == one.keySet)
    assert(two.forall { case (id, (p1, _)) => p1 == one(id) })
    // deflation: the second projection decorrelates from the first —
    // C2 kills the v direction in its first application, so the sample
    // correlation of (pc1, pc2) is near zero (loose bound: 3-round
    // iterates, r6 quantization)
    val xs = two.values.map(_._1).toSeq
    val ys = two.values.map(_._2).toSeq
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
      ys.map(y => (y - my) * (y - my)).sum)
    val corr = num / den
    assert(math.abs(corr) < 0.1, s"pc1/pc2 projections correlated: $corr")
  }

  test("kmeans_lloyd_train: round-2 state differs from round-1 and covers the corpus") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.VectorQueries
      .queries("kmeans_lloyd_train")(spark, sf).cache()
    val nVecs = graft.model.Tables.embeddings(spark, sf).count()
    val dims = out.select(col("pos")).distinct().count()
    assert(dims == 64, "every dimension updated")
    // each vector lands in exactly one cell: per-dim counts sum to corpus
    val perDim = out.groupBy(col("pos")).agg(sum(col("n")).as("tot"))
      .select(col("tot")).distinct().collect()
    assert(perDim.length == 1 && perDim.head.getLong(0) == nVecs,
      s"per-dim assignment counts must sum to $nVecs")
    // the feedback must be real: round-2 output differs from a single
    // ivf_recluster-style round (same seeds, one iteration)
    val oneRound = graft.queries.VectorQueries
      .queries("ivf_recluster")(spark, sf)
      .select(col("c_id"), col("pos"), col("mean"))
    val diff = out.select(col("c_id"), col("pos"), col("mean"))
      .except(oneRound).count()
    assert(diff > 0, "two chained rounds must move the centroids beyond round 1")
  }
}
