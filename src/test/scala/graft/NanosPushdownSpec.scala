package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.NanosRangePushdown

/** Rule-level contract for [[NanosRangePushdown]] beyond the end-to-end
  * BETWEEN assert in SchemaPortabilitySpec: every comparison shape (strict,
  * non-strict, equality, mirrored literal) must (a) still push a raw-long
  * bound into the parquet scan and (b) return EXACTLY the rows the
  * canonical-column predicate defines — including rows whose nanos carry a
  * sub-microsecond remainder, where a sloppy bound inversion would drift
  * by one row at the boundary. Plus: the rewrite is idempotent (the
  * user-provided optimizer batch runs to fixed point, so a non-idempotent
  * augmentation would stack conjuncts forever).
  */
class NanosPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  // 500 rows, hourly from 2024-01-01T00:00Z, with a sub-microsecond nanos
  // remainder on 4 of every 5 rows (i%5 * 199 ns) — canonical micros
  // truncate the remainder, so boundary predicates at exact microseconds
  // must include/exclude those rows correctly.
  private val BASE_NS = 1704067200L * 1000000000L
  private val N = 500
  private def nsOf(i: Int): Long = BASE_NS + i.toLong * 3600L * 1000000000L + (i % 5) * 199L
  private def usOf(i: Int): Long = nsOf(i) / 1000L

  private lazy val nanosDf: DataFrame = {
    val dir = Files.createTempDirectory("graft-nanos-pushdown")
    dir.toFile.deleteOnExit()
    spark.range(N).select(
      col("id").as("event_id"),
      (lit(BASE_NS) + col("id") * (3600L * 1000000000L) + (col("id") % 5) * 199L).as("ts"))
      .write.parquet(dir.resolve("events.parquet").toString)
    graft.model.Tables.load(spark, dir.toString, "events")
  }

  /** Count via the engine AND assert the filter reached the parquet scan. */
  private def countPushed(df: DataFrame, minPushed: Int = 1): Long = {
    val stats = graft.tools.PlanAudit.scanStats(df.queryExecution.sparkPlan)
    assert(stats.nonEmpty, "no parquet scan in plan")
    assert(stats.head.nPushed >= minPushed,
      s"predicate did not push to the parquet reader: $stats")
    df.count()
  }

  private def tsLit(us: Long) = expr(s"timestamp_micros(${us}L)")

  test("every comparison shape pushes and matches the canonical semantics") {
    // boundary literal: row 123's exact canonical micros (a row with a
    // 3*199 ns sub-microsecond remainder truncated away)
    val b = usOf(123)
    val expGe = (0 until N).count(usOf(_) >= b).toLong
    val expGt = (0 until N).count(usOf(_) > b).toLong
    val expLe = (0 until N).count(usOf(_) <= b).toLong
    val expLt = (0 until N).count(usOf(_) < b).toLong
    assert(countPushed(nanosDf.filter(col("ts") >= tsLit(b))) == expGe)
    assert(countPushed(nanosDf.filter(col("ts") > tsLit(b))) == expGt)
    assert(countPushed(nanosDf.filter(col("ts") <= tsLit(b))) == expLe)
    assert(countPushed(nanosDf.filter(col("ts") < tsLit(b))) == expLt)
    // one microsecond off the boundary flips exactly the boundary row
    assert(countPushed(nanosDf.filter(col("ts") >= tsLit(b + 1))) == expGt)
    assert(countPushed(nanosDf.filter(col("ts") <= tsLit(b - 1))) == expLt)
    // equality: exactly the boundary row
    assert(countPushed(nanosDf.filter(col("ts") === tsLit(b))) == 1L)
    // a literal BETWEEN exact row micros: inclusive on both ends
    assert(countPushed(nanosDf.filter(
      col("ts").between(tsLit(usOf(100)), tsLit(usOf(110)))), minPushed = 2) == 11L)
  }

  test("mirrored literal orientation pushes too") {
    val b = usOf(250)
    val expGe = (0 until N).count(usOf(_) >= b).toLong
    // lit <= ts — the flipped shape the rule matches explicitly
    assert(countPushed(nanosDf.filter(tsLit(b) <= col("ts"))) == expGe)
    assert(countPushed(nanosDf.filter(tsLit(b) > col("ts"))) ==
      (0 until N).count(usOf(_) < b).toLong)
  }

  test("the rewrite is idempotent on an already-augmented plan") {
    val plan = nanosDf.filter(
      col("ts").between(tsLit(usOf(10)), tsLit(usOf(20))))
      .queryExecution.optimizedPlan // rule already ran (installed by load)
    assert(NanosRangePushdown(plan).fastEquals(plan),
      "re-applying the rule changed an already-augmented plan")
  }
}
