package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-side profiler: splits a registered query's wall time into
  * analysis+optimization+physical-planning vs execution, so a slow query
  * can be attributed to Catalyst (plan blowup) or the cluster (data). Not
  * part of the driver contract.
  *
  * Caveats: (1) iterative queries (dedup_cluster_cc) run their loop DURING
  * query construction, so that cost lands in neither bucket here — trust
  * Bench for those. (2) Repeat a name to see warm cost; the first
  * occurrence absorbs codegen+JIT (often 3-10× the steady state).
  *
  * Usage: runMain graft.tools.PlanProfile <sfDir> <query> [query…]
  */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      val plan = df.queryExecution.executedPlan
      val planSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = df.count()
      val execSec = (System.nanoTime() - t1) / 1e9
      println(f"[profile] $name rows=$n plan=$planSec%.2fs exec=$execSec%.2fs planNodes=${plan.collect { case p => p }.size}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
