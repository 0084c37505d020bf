package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the adaptive char-gram MinHash banding
  * (dedup_fuzzy_minhash): prints the per-(lang, bucket) population stats
  * and the exact candidate-pair count Σ sz·(sz−1)/2 WITHOUT materializing
  * a single pair — the number that decides whether a fourth-decade disk
  * fill is candidate explosion (banding defect) or shuffle-volume
  * arithmetic (harness capacity). Usage:
  * runMain graft.tools.FuzzyBucketDiag <sfDir> [<sfDir2> ...] */
object FuzzyBucketDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { dir =>
      val d0 = graft.model.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      val n = d0.count()
      val r = graft.queries.VectorQueries.adaptiveRows(n)
      val l = graft.queries.TextQueries.fuzzyBands(r)
      val bands = graft.queries.TextQueries.fuzzyBandsFrame(spark, d0, r, l)
      val stats = bands.groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("sz"))
        .agg(
          sum(col("sz") * (col("sz") - 1) / 2).as("pairs"),
          max(col("sz")).as("maxSz"),
          expr("approx_percentile(sz, 0.999)").as("p999"),
          count(lit(1)).as("buckets"),
          sum(col("sz")).as("rows"))
        .head()
      println(s"[fuzzydiag] $dir n=$n r=$r l=$l pairsUB=${stats.get(0)} " +
        s"maxBucket=${stats.get(1)} p999=${stats.get(2)} " +
        s"buckets=${stats.get(3)} bandRows=${stats.get(4)}")
      // FUZZY_TOP=k: additionally dump the k most-populated buckets with
      // sample member texts — the r14 forensic mode that found the
      // cross-copy collision class behind the super-design pair growth.
      sys.env.get("FUZZY_TOP").map(_.toInt).filter(_ > 0).foreach { k =>
        val top = bands.groupBy(col("lang"), col("bucket"))
          .agg(count(lit(1)).as("sz"))
          .orderBy(col("sz").desc).limit(k).collect()
        top.foreach { row =>
          val (lg, bk, sz) = (row.getString(0), row.get(1), row.getLong(2))
          val sample = bands.filter(col("lang") === lg && col("bucket") === bk)
            .join(d0.select(col("doc_id"), col("text")), "doc_id")
            .select(col("doc_id"), col("text")).limit(4).collect()
          println(s"[fuzzydiag]   bucket lang=$lg sz=$sz key=${String.valueOf(bk).take(40)}")
          sample.foreach(x => println(
            s"[fuzzydiag]     doc=${x.getLong(0)} text='${x.getString(1).take(100)}'"))
        }
      }
      graft.ops.SessionOps.dropCachedBlocks(spark)
    }
    spark.stop()
  }
}
