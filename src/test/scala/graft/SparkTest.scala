package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (guide: one session per
  * suite; sharing across suites avoids repeated 5s startups). */
object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 2]: 2 task attempts, so StreamingRecoverySpec can prove
      // the sink write survives a task-level retry (local-mode default is
      // maxFailures=1 = no retry ever). Inert elsewhere: no other test
      // fails tasks, and deterministic failures still fail the job on
      // attempt 2.
      .master("local[4, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** The interpreted HOF folds that DEFINE the native expressions' parity
  * contracts — one definition shared by every spec that asserts against
  * them, so the contract formulation cannot drift between copies. */
object TestFolds {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** The exact zip_with/aggregate squared-L2 fold SquaredDistance replaced. */
  def hofSquaredDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
}
