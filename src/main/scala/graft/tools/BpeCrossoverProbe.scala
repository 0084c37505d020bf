package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recount-vs-indexed BPE trainer CROSSOVER measurement (dev tool): the
  * trainer pick used to rest on prose ("the indexed trainer wins once
  * rounds are tail-dominated"); this probe makes it a measured curve.
  * For each k it trains the same corpus twice from scratch — the
  * recount/delta trainer (`MiningQueries.bpeTrainOn`, per-round work ~
  * corpus-sized once the delta gate stops firing) and the LSM
  * postings-indexed trainer (`BpeIndexedTrainer.train`, ~2 full passes
  * to build the index, then O(affected-slice) rounds) — and emits one
  * JSON line per k. The measurement REFUTED the k-dimension hypothesis
  * this tool was built to test: the indexed trainer loses at every
  * measured (k, corpus) cell, from 0.2 GB to 52 GB
  * (BPE_CROSSOVER_r12{,_sf10}.json, BPE_CROSSOVER_r13_{sf100,sf250}
  * .json). r12 blamed a fixed per-round overhead and extrapolated a
  * ~10 GiB byte break-even; the r13 cells past that point (21 GB,
  * 52 GB) refuted it — the indexed trainer's SLOPE in corpus bytes is
  * the worse one, so no crossover exists in k or bytes and
  * `BpeOps.TRAINER_CROSSOVER_BYTES` is `Long.MaxValue` (auto path
  * never picks indexed). `crossover_k` in the artifact records -1
  * (no measured k favors indexed). BpeIndexedTrainerSpec's gate
  * asserts the committed artifacts still support that direction.
  *
  * Usage: runMain graft.tools.BpeCrossoverProbe [sfDir k1,k2,... buckets]
  * Env:   BPE_CROSSOVER_OUT=<path> writes the JSON artifact
  *        (BPE_CROSSOVER_r{N}.json).
  */
object BpeCrossoverProbe {
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val ks = (if (args.length > 1) args(1) else "3,6,12,24")
      .split(",").map(_.trim.toLong).toSeq
    val buckets = if (args.length > 2) args(2).toInt else 64
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus0 = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_raw"))
    val nDocs = corpus0.count()
    // this probe prices the DISTRIBUTED recount/delta trainer against the
    // indexed trainer — force past the r15 driver fast path, which would
    // otherwise capture the sub-64 MB cells and price the wrong engine
    spark.conf.set(graft.ops.BpeOps.BPE_DRIVER_MAX_KEY, "0")
    // one untimed warmup (codegen + JIT for both trainers' plans)
    graft.queries.MiningQueries.bpeTrainOn(spark, corpus0, 1L)
    graft.ops.SessionOps.dropCachedBlocks(spark)

    val rows = ks.map { k =>
      val t0 = System.nanoTime()
      val (m1, _, _) = graft.queries.MiningQueries.bpeTrainOn(spark, corpus0, k)
      val nMerges = m1.count()
      val recountS = (System.nanoTime() - t0) / 1e9
      graft.ops.SessionOps.dropCachedBlocks(spark)

      val root = java.nio.file.Files.createTempDirectory("graft_bpe_xover").toString
      val t1 = System.nanoTime()
      val (m2, _, _, _) =
        graft.ops.BpeIndexedTrainer.train(spark, corpus0, k, root, buckets, buckets)
      val nMerges2 = m2.count()
      val indexedS = (System.nanoTime() - t1) / 1e9
      graft.ops.SessionOps.dropCachedBlocks(spark)
      deleteRecursively(new java.io.File(root))

      require(nMerges == nMerges2, s"trainer merge counts diverged at k=$k")
      println(f"k=$k%3d recount=${recountS}%7.2f s  indexed=${indexedS}%7.2f s  " +
        f"(${nMerges} merges)")
      (k, recountS, indexedS, nMerges)
    }

    val crossover = rows.find { case (_, r, i, _) => i < r }.map(_._1)
    println(s"crossover (first k where indexed < recount): " +
      crossover.map(_.toString).getOrElse("beyond measured range"))

    sys.env.get("BPE_CROSSOVER_OUT").foreach { out =>
      val json =
        s"""{"sf_dir":"$sfDir","n_docs":$nDocs,"buckets":$buckets,
           |"note":"each cell is a FULL from-scratch train of the same corpus; recount = MiningQueries.bpeTrainOn (delta/recount gate active), indexed = BpeIndexedTrainer.train incl. index build; crossover = first measured k where indexed wins",
           |"crossover_k":${crossover.getOrElse(-1L)},
           |"rows":[${rows.map { case (k, r, i, m) =>
              f"""{"k":$k,"recount_s":$r%.2f,"indexed_s":$i%.2f,"merges":$m}"""
            }.mkString(",")}]}""".stripMargin.replace("\n", "")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        json.getBytes("UTF-8"))
      println(s"[probe] wrote $out")
    }
    spark.stop()
  }
}
