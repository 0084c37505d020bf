package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps the formatted physical plan for the named queries
  * (or all) so scan pushdown (PushedFilters/ReadSchema), broadcast choices,
  * and WholeStageCodegen spans can be eyeballed per the 100-TB checklist.
  * Each query also gets its broadcast-hint bound verdicts
  * ([[graft.tools.BroadcastBound]]) — the static proof (or refusal) that
  * every hinted side is bounded independent of SF. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n===================== $name =====================")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val hints = graft.tools.BroadcastBound.audit(df.queryExecution.analyzed)
      if (hints.nonEmpty) {
        println(s"-- broadcast hints (${hints.size}) --")
        hints.foreach { case (bound, offense) =>
          val verdict =
            if (offense.isEmpty) s"bounded <= ${bound.getOrElse(-1L)}"
            else offense
          println(s"  $verdict")
        }
      }
    }
    spark.stop()
  }
}
