package graft.tools

import org.apache.spark.sql.SparkSession

/** Robustness sweep: run every registry query against ZERO-ROW twins of
  * the test tables and report which ones throw.
  *
  * Why this matters at 100 TB: production partitions are empty all the
  * time — a language shard with no documents after filtering, a day with
  * no events, a source that contributed nothing to this snapshot. A
  * query that returns an empty (or sensibly-degenerate) result keeps the
  * pipeline composable; one that throws from a driver-side
  * `collect()(0)` or a schema-inference-on-no-files read takes the whole
  * job down. The sweep materializes each source table as a 0-row parquet
  * with the REAL schema (schema read from the sf dir given), then runs
  * each query and classifies: ok(rows) / FAIL(exception).
  *
  * Usage: runMain graft.tools.EmptyInputProbe [srcSf] [emptyDir] [q1,q2]
  * The pinned contract is EmptyInputSpec, which runs [[sweep]] over the
  * whole registry and asserts zero failures.
  */
object EmptyInputProbe {

  /** Materialize `dst` as a zero-row twin of every parquet table under
    * `srcSf` (schema preserved via limit(0) — including the raw time
    * encodings normalizeTs probes for). Idempotent per source snapshot:
    * the staged-ok marker embeds the source's max mtime, so a driver
    * regeneration of the testdata restages the twin with the new schema
    * instead of serving a stale one. */
  def stageEmptyTwin(spark: SparkSession, srcSf: String, dst: String): Unit = {
    val srcFiles = Option(new java.io.File(srcSf).listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".parquet"))
    val srcMtime = srcFiles.map(_.lastModified()).foldLeft(0L)(math.max)
    val d = new java.io.File(dst)
    val marker = new java.io.File(d, s"_EMPTY_TWIN_OK_m$srcMtime")
    if (!marker.isFile) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(d)
      d.mkdirs()
      srcFiles.map(_.getName.stripSuffix(".parquet")).foreach { t =>
        spark.read.parquet(s"$srcSf/$t.parquet").limit(0)
          .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      new java.io.FileOutputStream(marker).close()
    }
  }

  /** Run every registry query (or `only`) against `dst`; returns
    * (name, firstErrorLine) for each query that threw. */
  def sweep(spark: SparkSession, dst: String,
            only: Set[String] = Set.empty,
            verbose: Boolean = false): Seq[(String, String)] = {
    val failed = scala.collection.mutable.ArrayBuffer[(String, String)]()
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          val n = fn(spark, dst).count()
          if (verbose) println(f"ok   $name%-34s rows=$n")
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(140)
          failed += ((name, msg))
          if (verbose) println(f"FAIL $name%-34s $msg")
        }
        graft.ops.SessionOps.dropCachedBlocks(spark)
      }
    }
    failed.toSeq
  }

  def main(args: Array[String]): Unit = {
    val srcSf = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val dst = if (args.length > 1) args(1) else "/tmp/graft_empty_sf"
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    stageEmptyTwin(spark, srcSf, dst)
    val failed = sweep(spark, dst, only, verbose = true)
    val n = (if (only.isEmpty) graft.SparkEntry.queries.size else only.size) - failed.size
    println(s"== empty-input probe: $n ok, ${failed.size} fail ==")
    failed.foreach { case (nm, m) => println(s"  FAIL $nm: $m") }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
