package graft.tools

import org.apache.spark.sql.SparkSession

/** Robustness sweep #1: run every registry query against ZERO-ROW twins
  * of the test tables and report which ones throw.
  *
  * Why this matters at 100 TB: production partitions are empty all the
  * time — a language shard with no documents after filtering, a day with
  * no events, a source that contributed nothing to this snapshot. A
  * query that returns an empty (or sensibly-degenerate) result keeps the
  * pipeline composable; one that throws from a driver-side
  * `collect()(0)` or a schema-inference-on-no-files read takes the whole
  * job down. The twin preserves each table's REAL physical schema
  * (limit(0) of the actual testdata — including the raw time encodings
  * normalizeTs probes for).
  *
  * Usage: runMain graft.tools.EmptyInputProbe [srcSf] [emptyDir] [q1,q2]
  * The pinned contract is EmptyInputSpec (zero failures, whole registry).
  */
object EmptyInputProbe {

  def stageEmptyTwin(spark: SparkSession, srcSf: String, dst: String): Unit =
    RegistrySweep.stageTwin(spark, srcSf, dst, "_EMPTY_TWIN_OK")(_.limit(0))

  def main(args: Array[String]): Unit =
    RegistrySweep.probeMain(args, "/tmp/graft_empty_sf", "empty-input")(stageEmptyTwin)
}
