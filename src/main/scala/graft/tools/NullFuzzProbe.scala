package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Robustness sweep #2: run every registry query against a twin of the
  * smallest test SF where ~10% of EVERY column's values are replaced by
  * NULL (deterministically, keyed on the value's own hash — reruns see
  * the same rows nulled).
  *
  * Raw corpus data carries nulls everywhere — scraped documents with no
  * text, events with no value, embeddings that failed to compute. The
  * engine's contract is the relational one: nulls propagate (null in →
  * null/absent out), they never crash a native expression's eval loop,
  * a driver-side collect, or a store build. This probe measures that
  * contract over the whole registry; like EmptyInputProbe it classifies
  * ok/FAIL only (no oracle — null semantics are the oracle-backed
  * queries' job on the real data).
  *
  * Usage: runMain graft.tools.NullFuzzProbe [srcSf] [dstDir] [q1,q2]
  */
object NullFuzzProbe {

  def stageNullTwin(spark: SparkSession, srcSf: String, dst: String): Unit = {
    val srcFiles = Option(new java.io.File(srcSf).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".parquet"))
    val srcMtime = srcFiles.map(_.lastModified()).foldLeft(0L)(math.max)
    val d = new java.io.File(dst)
    val marker = new java.io.File(d, s"_NULL_TWIN_OK_m$srcMtime")
    if (!marker.isFile) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
      d.mkdirs()
      srcFiles.map(_.getName.stripSuffix(".parquet")).foreach { t =>
        val raw = spark.read.parquet(s"$srcSf/$t.parquet")
        val fuzzed = raw.columns.foldLeft(raw) { (df, c) =>
          // hash(value) keys the choice so the same logical value is
          // nulled on every restage; the seed mixes the column name so
          // correlated columns don't null in lockstep.
          df.withColumn(c,
            when(pmod(hash(col(c), lit(c)), lit(10)) === 0,
              lit(null).cast(df.schema(c).dataType))
              .otherwise(col(c)))
        }
        fuzzed.coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      new java.io.FileOutputStream(marker).close()
    }
  }

  def main(args: Array[String]): Unit = {
    val srcSf = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_nullfuzz_sf"
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    stageNullTwin(spark, srcSf, dst)
    val failed = EmptyInputProbe.sweep(spark, dst, only, verbose = true)
    val n = (if (only.isEmpty) graft.SparkEntry.queries.size else only.size) - failed.size
    println(s"== null-fuzz probe: $n ok, ${failed.size} fail ==")
    failed.foreach { case (nm, m) => println(s"  FAIL $nm: $m") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
