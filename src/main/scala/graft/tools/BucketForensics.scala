package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** What do the FAT adaptive-LSH buckets actually hold? (r15) — the
  * follow-up PlaneBias demands: with per-plane marginals measured at
  * 0.5 and pairwise plane agreement on the independence line, the
  * 2.07×-over-Poisson candidate volume can only come from HIGHER-ORDER
  * structure, i.e. genuine angular clusters in the corpus. If that is
  * right, the members of an over-populated (band, bucket) cell must be
  * mutually SIMILAR — the bucket is doing its job on a dense
  * neighborhood — rather than unrelated (which would indicate signature
  * aliasing, the r14 fuzzy-corpus defect class).
  *
  * Prints, for each of the top `K` buckets: the member count and the
  * mean/min pairwise cosine over a capped member sample. Unrelated
  * docs in a healthy random corpus score ~0; cluster members score
  * well above.
  *
  * Usage: runMain graft.tools.BucketForensics <sfDir> [topK=5] [cap=40]
  */
object BucketForensics {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf10"
    val topK = if (args.length > 1) args(1).toInt else 5
    val cap = if (args.length > 2) args(2).toInt else 40
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.model.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val r = graft.queries.VectorQueries.adaptiveRows(n)
    val l = graft.queries.VectorQueries.adaptiveBands(r)
    val thr = graft.queries.VectorQueries.adaptiveThresholds(spark, e, n, r, 0, l)
    val sigs = e.select(col("vec_id"),
      posexplode(graft.expressions.LshBands.lshBands(
        col("embedding"), l, r, dims, 0, thr.toSeq)).as(Seq("band", "bucket")))
    val fat = sigs.groupBy("band", "bucket").count()
      .orderBy(col("count").desc).limit(topK).collect()
    fat.foreach { row =>
      val (band, bucket, cnt) =
        (row.getInt(0), row.getInt(1), row.getLong(2))
      val members = sigs.filter(col("band") === band && col("bucket") === bucket)
        .select("vec_id").limit(cap)
        .join(e, "vec_id").collect()
        .map(x => x.getSeq[Float](1).map(_.toDouble).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        val nn = math.sqrt(na) * math.sqrt(nb)
        if (nn == 0.0) 0.0 else d / nn
      }
      val sims = for (i <- members.indices; j <- (i + 1) until members.size)
        yield cos(members(i), members(j))
      println(f"[forensics] band=$band bucket=$bucket size=$cnt " +
        f"sampled=${members.size} meanCos=${sims.sum / sims.size}%.4f " +
        f"minCos=${sims.min}%.4f maxCos=${sims.max}%.4f")
    }
    spark.stop()
  }
}
