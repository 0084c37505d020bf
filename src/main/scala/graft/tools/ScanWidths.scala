package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot helper: print every parquet scan's (table, readCols,
  * totalCols) per query, for curating [[PlanAudit.EXPECT_READ_COLS]]
  * entries. Usage: runMain graft.tools.ScanWidths q1,q2,... */
object ScanWidths {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.flatMap(_.split(',')).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val plan = graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.sparkPlan
        PlanAudit.scanStats(plan).foreach { st =>
          println(f"$name%-28s ${st.table}%-14s read=${st.readCols}%2d of ${st.totalCols}%2d")
        }
      } catch { case e: Throwable =>
        println(f"$name%-28s ERROR ${String.valueOf(e.getMessage).take(60)}")
      }
    }
    spark.stop()
  }
}
