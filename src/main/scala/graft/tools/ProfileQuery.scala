package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Ad-hoc per-stage profiler: runs one SparkEntry query N times and prints
  * stage-level task counts, durations, CPU and straggler ratios. Not part
  * of the driver contract — a development tool.
  *
  * Usage: runMain graft.tools.ProfileQuery <queryName> [sfDir] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val qnames = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // same collect budget as ScalingProbe: the size-gated payload
      // broadcasts must take the same branch here as in the probes
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class TaskAgg(var n: Int = 0, var runMs: Long = 0, var cpuMs: Long = 0,
                       var maxRunMs: Long = 0, var shufReadB: Long = 0,
                       var shufWriteB: Long = 0, var outRows: Long = 0)
    val stages = mutable.LinkedHashMap[Int, TaskAgg]()
    val stageNames = mutable.Map[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        val a = stages.getOrElseUpdate(t.stageId, TaskAgg())
        val m = t.taskMetrics
        if (m != null) {
          a.n += 1
          a.runMs += m.executorRunTime
          a.cpuMs += m.executorCpuTime / 1000000
          a.maxRunMs = math.max(a.maxRunMs, m.executorRunTime)
          a.shufReadB += m.shuffleReadMetrics.totalBytesRead
          a.shufWriteB += m.shuffleWriteMetrics.bytesWritten
          a.outRows += m.outputMetrics.recordsWritten
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
        stageNames(s.stageInfo.stageId) = s.stageInfo.name.takeWhile(_ != '\n').take(60)
      }
    })

    // Same inter-query hygiene as Bench (shared impl): without it each
    // query's caches/localCheckpoints accumulate across the whole run and
    // later reps measure heap pressure, not the query.
    def dropCachedBlocks(): Unit = graft.ops.SessionOps.dropCachedBlocks(spark)
    graft.model.Tables.events(spark, sfDir).count() // session warmup
    for (r <- 1 to reps; qname <- qnames) {
      val fn = graft.SparkEntry.queries(qname)
      stages.clear()
      dropCachedBlocks()
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"== rep $r: $qname count=$cnt wall=$secs%.2f s ==")
      stages.toSeq.sortBy(-_._2.runMs).take(12).foreach { case (id, a) =>
        println(f"  stage $id%3d tasks=${a.n}%3d sumRun=${a.runMs / 1000.0}%7.2fs " +
          f"sumCpu=${a.cpuMs / 1000.0}%7.2fs maxTask=${a.maxRunMs / 1000.0}%6.2fs " +
          f"shufR=${a.shufReadB / 1024}%8dK shufW=${a.shufWriteB / 1024}%8dK " +
          stageNames.getOrElse(id, ""))
      }
    }
    spark.stop()
  }
}
