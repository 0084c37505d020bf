package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Whole-registry plan audit (dev tool): walks every registered query's
  * physical plan and counts the structures the 100-TB checklist cares
  * about — unconditioned cartesian products (the one shape that cannot
  * survive scale), broadcast nested-loop joins (legitimate ONLY for the
  * scalar/pool-sized broadcast crosses this repo uses), exchanges
  * (shuffle count), and whole-stage-codegen spans (fused vs interpreted
  * execution).
  *
  * Exit is nonzero if any CartesianProductExec appears at all: every
  * intentional cross in the registry broadcasts a scalar or pool-sized
  * frame and therefore plans as BroadcastNestedLoopJoin, so a true
  * cartesian can only be a regression. BNLJ occurrences are listed for
  * eyeball review rather than failed — whether a broadcast cross is
  * sane depends on the broadcast side's cardinality, which the plan
  * alone doesn't carry.
  *
  * Usage: runMain graft.tools.PlanAudit [q1,q2,...]
  */
object PlanAudit {
  private def count(p: SparkPlan, pred: SparkPlan => Boolean): Int =
    p.collect { case n if pred(n) => n }.size

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = if (args.nonEmpty) args.flatMap(_.split(',')).toSet else Set.empty[String]
    var cartesians = 0
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
      .flatMap { case (name, fn) =>
        try {
          // sparkPlan (pre-AQE): AdaptiveSparkPlanExec hides children from
          // collect, and the audit wants the statically-planned shapes.
          val plan = fn(spark, sfDir).queryExecution.sparkPlan
          // No codegen-span column: WholeStageCodegen collapse happens
          // per-stage under AQE at runtime, so the static plan can't
          // report it honestly.
          val cart = count(plan, _.getClass.getSimpleName == "CartesianProductExec")
          val bnlj = count(plan, _.getClass.getSimpleName == "BroadcastNestedLoopJoinExec")
          val exch = count(plan, _.getClass.getSimpleName.startsWith("ShuffleExchange"))
          cartesians += cart
          spark.catalog.clearCache()
          Some((name, cart, bnlj, exch))
        } catch {
          case e: Throwable =>
            println(f"$name%-28s AUDIT ERROR: ${e.getMessage.take(80)}")
            None
        }
      }
    println(f"${"query"}%-28s ${"cart"}%5s ${"bnlj"}%5s ${"shuf"}%5s")
    rows.foreach { case (n, c, b, e) =>
      if (c > 0 || b > 0 || e >= 6)
        println(f"$n%-28s $c%5d $b%5d $e%5d${if (c > 0) "  <-- CARTESIAN" else ""}")
    }
    val totalShuf = rows.map(_._4).sum
    println(s"== audited ${rows.size} queries: $cartesians cartesian, " +
      s"${rows.count(_._3 > 0)} with BNLJ, total shuffles $totalShuf, " +
      s"max shuffles ${rows.maxBy(_._4)._4} (${rows.maxBy(_._4)._1}) ==")
    spark.stop()
    if (cartesians > 0) sys.exit(1)
  }
}
