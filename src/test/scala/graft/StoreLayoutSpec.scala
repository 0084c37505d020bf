package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.JoinQueries

/** The partitioned-store layout decision (SURVEY §4 "partition pruning by
  * key"): scanning one event_type from a partitionBy(event_type) store
  * must resolve the type predicate at the directory level (PartitionFilters)
  * and push the value predicate into the parquet scan (PushedFilters) —
  * the two prunings that keep a 100 TB store scan proportional to the
  * slice read, not the store size. */
class StoreLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session

  test("scan_partitioned_store: partition pruning + parquet filter pushdown in the plan") {
    val df = JoinQueries.queries("scan_partitioned_store")(spark, "/root/testdata/sf0.001")
    val scans = df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "no file scan in plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"event_type must be a partition filter, got: ${scan.partitionFilters}")
    assert(scan.dataFilters.exists(_.toString.contains("value")),
      s"value must be a data filter, got: ${scan.dataFilters}")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("GreaterThan(value")),
      s"value > 50 must push into parquet, got: ${scan.metadata.get("PushedFilters")}")
    // and the scan actually prunes: only the click partition's files are read
    val readFiles = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(readFiles.nonEmpty && readFiles.forall(_.contains("event_type=click")),
      s"expected only click-partition files, got: ${readFiles.take(3).mkString(", ")}")
    assert(df.count() > 0)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col}
    // fact = the event_type-partitioned store staged by scan_partitioned_store
    JoinQueries.queries("scan_partitioned_store")(spark, "/root/testdata/sf0.001").count()
    val fact = spark.read.parquet("/tmp/graft_store_parts/sf0.001")
    // dim restricted to one category -> only its event_types' partitions
    // should be scanned, decided at RUNTIME from the dim (DPP), not by a
    // static predicate on the fact
    // the dim must be a SOURCE, not a LocalRelation: Catalyst folds
    // filters over local relations eagerly, and DPP needs the selective
    // Filter node to survive on the pruning side
    val dimPath = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"))
      .toDF("etype", "category").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = fact
      .join(broadcast(dim), col("event_type") === col("etype"))
      .filter(col("category") === "engagement")
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the partitioned scan:\n$planStr")
    assert(joined.count() > 0)
  }
}
