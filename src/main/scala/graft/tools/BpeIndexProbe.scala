package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the indexed BPE trainer (ops/BpeIndexedTrainer): runs
  * k merge rounds over the real documents table and prints the
  * per-round I/O evidence — affected docs, corpus/postings directories
  * read vs on disk, rows appended, wall — the numbers BENCH_NOTES cites
  * for the O(affected)-per-round claim. Expectation on a Zipf corpus:
  * the head rounds touch a large fraction of docs (a head merge IS
  * corpus-wide — any trainer pays it), and the affected slice collapses
  * as the winner frequency falls down the tail, which is where a
  * 50k-merge run spends almost all of its rounds.
  *
  * Usage: runMain graft.tools.BpeIndexProbe [sfDir k buckets]
  */
object BpeIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toLong else 12L
    val buckets = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus0 = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_raw"))
    val nDocs = corpus0.count()
    val root = java.nio.file.Files.createTempDirectory("graft_bpe_probe").toString

    val t0 = System.nanoTime()
    val (merges, _, _, stats) =
      graft.ops.BpeIndexedTrainer.train(spark, corpus0, k, root, buckets, buckets)
    val mergeRows = merges.collect()
    val total = (System.nanoTime() - t0) / 1e9

    println(f"== BpeIndexProbe $sfDir: $nDocs docs, k=$k, B=P=$buckets, total ${total}%.2f s ==")
    // The file-discipline metric the keyed pre-write repartition bounds:
    // data files per store must track Σ dirs-touched over writes, never
    // (input tasks × bucket dirs).
    println(f"data files: corpus ${graft.ops.BpeIndexedTrainer.dataFiles(s"$root/corpus")}%d " +
      f"(dirs ${stats.lastOption.map(_.corpusDirsTotal).getOrElse(0)}%d), " +
      f"postings ${graft.ops.BpeIndexedTrainer.dataFiles(s"$root/postings")}%d " +
      f"(dirs ${stats.lastOption.map(_.postingsDirsTotal).getOrElse(0)}%d)")
    println(f"${"step"}%5s ${"winner"}%-28s ${"cnt"}%8s ${"affected"}%9s " +
      f"${"aff%"}%6s ${"cDirs"}%6s ${"pDirs"}%6s ${"pAppend"}%8s")
    stats.foreach { st =>
      val m = mergeRows.find(_.getLong(0) == st.step).get
      val winner = s"${m.getString(1)}+${m.getString(2)}"
      val affPct = 100.0 * st.affectedDocs / math.max(1L, nDocs)
      println(f"${st.step}%5d $winner%-28s ${m.getLong(3)}%8d ${st.affectedDocs}%9d " +
        f"$affPct%5.1f%% ${st.corpusDirsRead}%3d/${st.corpusDirsTotal}%-2d " +
        f"${st.postingsDirsRead}%3d/${st.postingsDirsTotal}%-2d ${st.postingsRowsAppended}%8d")
    }
    spark.stop()
  }
}
