package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** S6: ops heartbeat — the reference writes a wall-clock liveness file on
  * every consumed message (consumer.py:40-47) and the dashboard calls the
  * pipeline ONLINE while the heartbeat is younger than 120 s
  * (main.py:63-84). Here the signal comes from the engine's own
  * StreamingQueryListener progress events instead of hand-rolled writes. */
object Heartbeat {

  /** SLO from main.py:74-79: heartbeat age < 120 s ⇒ ONLINE. */
  val SlaSeconds = 120L

  def write(path: String, epochSec: Long): Unit =
    Files.write(Paths.get(path), epochSec.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  /** Attach a listener that stamps `path` on every micro-batch progress. */
  def attach(spark: SparkSession, path: String): StreamingQueryListener = {
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        write(path, System.currentTimeMillis() / 1000)
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        write(path, System.currentTimeMillis() / 1000)
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(l)
    l
  }

  /** ONLINE / OFFLINE per the reference's age threshold (main.py:74-79). */
  def status(path: String, nowSec: Long): String = {
    val p = Paths.get(path)
    if (!Files.exists(p)) "OFFLINE"
    else {
      val beat = new String(Files.readAllBytes(p)).trim.toLong
      if (nowSec - beat < SlaSeconds) "ONLINE" else "OFFLINE"
    }
  }
}
