package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-side plan dumper: writes `explain("formatted")` for each named
  * registry query to `<outDir>/<query>_<tag>.txt` — the before/after
  * plan evidence the optimization rounds commit under plans/.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.tools.DumpPlan <outDir> <tag> <q1,q2,...> [sfDir]
  */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      println(s"[dumpplan] wrote $p (${txt.length} chars)")
      graft.ops.SessionOps.dropCachedBlocks(spark)
    }
    spark.stop()
  }
}
