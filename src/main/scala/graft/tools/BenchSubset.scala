package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-side mini-bench: times a SUBSET of the registry with exactly the
  * Bench methodology (same session confs, per-query sf0.001 warmup, cache
  * hygiene between queries, min-of-N reps) so a single optimization's
  * before/after can be measured in seconds instead of a full 210-query
  * run. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.BenchSubset <q1,q2,...> [sfDir] [reps]
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.model.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => }
    val warmDir = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
        try fn(spark, warmDir).count() catch { case _: Throwable => }
        graft.ops.SessionOps.dropCachedBlocks(spark)
      }
      var best = Double.MaxValue
      val all = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.SessionOps.dropCachedBlocks(spark)
        best = math.min(best, sec)
        sec
      }
      println(f"[subset] $name min=$best%.3f s  reps=${all.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
