package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** zorder_layout: the Morton key must be the exact bit interleave (checked
  * bit-by-bit, independently of the mask-ladder implementation), and a
  * store range-partitioned on it must bound BOTH dimensions per partition —
  * the data-skipping property that motivates the layout. */
class ZorderSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  private val SF = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("zorder_layout")(spark, SF).cache()

  test("zkey is the exact bit interleave of the rank-scaled dims") {
    val rows = out.select("ux", "hx", "zkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((ux, hx, z) <- rows) {
      // independent re-derivation: place bit i of ux at 2i, of hx at 2i+1
      var want = 0L
      for (i <- 0 until 16) {
        want |= ((ux >> i) & 1L) << (2 * i)
        want |= ((hx >> i) & 1L) << (2 * i + 1)
      }
      assert(z == want, s"ux=$ux hx=$hx: z=$z want=$want")
      assert(ux >= 0 && ux <= 65535 && hx >= 0 && hx <= 65535)
    }
  }

  /** Per-partition (min,max) of both dims after range-partitioning on
    * `key` — what parquet footer stats would record per file. */
  private def partitionBoxes(key: String): Array[(Long, Long, Long, Long)] =
    out.repartitionByRange(8, col(key))
      .groupBy(spark_partition_id().as("pid"))
      .agg(min("ux").as("u0"), max("ux").as("u1"),
        min("hx").as("h0"), max("hx").as("h1"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def touched(boxes: Array[(Long, Long, Long, Long)],
                      u: (Long, Long), h: (Long, Long)): Int =
    boxes.count { case (u0, u1, h0, h1) =>
      u0 <= u._2 && u1 >= u._1 && h0 <= h._2 && h1 >= h._1
    }

  test("z-range layout prunes 2-D boxes that single-dim sorts cannot") {
    val z = partitionBoxes("zkey")
    val byUser = partitionBoxes("ux")
    val byTime = partitionBoxes("hx")
    assert(z.length == 8 && byUser.length == 8 && byTime.length == 8)

    val full = (0L, 65535L)
    val narrow = (0L, 8191L) // low eighth of the scaled range
    // A user-selective box defeats the time-sorted layout entirely...
    assert(touched(byTime, narrow, full) == 8)
    // ...and a time-selective box defeats the user-sorted layout.
    assert(touched(byUser, full, narrow) == 8)
    // The z layout bounds both dims per partition, so EACH single-dim
    // box skips at least half the store.
    val zUser = touched(z, narrow, full)
    val zTime = touched(z, full, narrow)
    assert(zUser <= 4, s"user-box touched $zUser/8 z-partitions")
    assert(zTime <= 4, s"time-box touched $zTime/8 z-partitions")
    // And across the two probes the z layout strictly beats either
    // single-dim layout's total.
    assert(zUser + zTime < touched(byTime, narrow, full) + touched(byTime, full, narrow))
    assert(zUser + zTime < touched(byUser, narrow, full) + touched(byUser, full, narrow))
  }
}
