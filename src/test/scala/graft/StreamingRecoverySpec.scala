package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, FilterOps}

/** Checkpoint-RECOVERY proof (the r10 verdict's top item): where
  * StreamingParitySpec proves the transform families fold correctly
  * across micro-batches, this suite proves they survive a RESTART — the
  * first production incident every streaming user hits, and the one
  * durability property the reference claims through its idempotent
  * upsert (consumer.py:176-181) that the repo had never executed.
  *
  * Each family runs as a REAL streaming query over a file source (the
  * replayable-source stand-in for Kafka) with a `checkpointLocation`,
  * folding batches into a DURABLE versioned parquet store in
  * foreachBatch — no JVM state carries the answer across restarts; only
  * the checkpoint and the store do. Three phases per family:
  *
  *  1. '''run''': two chunks stream in, the query STOPS;
  *  2. '''restart''': a third chunk lands, a fresh query starts from the
  *     same checkpoint — it must resume at the recorded offset
  *     (reprocessing nothing, missing nothing);
  *  3. '''crash-replay''': the checkpoint's LAST COMMIT entry is deleted
  *     (the crash window between the offset-log write and the
  *     commit-log write — exactly the at-least-once gap Structured
  *     Streaming's recovery contract leaves to the sink), a fourth chunk
  *     lands, and the restarted query RE-DELIVERS the uncommitted batch
  *     with its original batch id before processing the new chunk. The
  *     sink must absorb the duplicate: idempotent merge for the fold
  *     families, the `_MAINT` batch-id marker for the IVF maintainer.
  *
  * Final assert: the store equals the REGISTRY query's batch answer on
  * the same fixture, bit-equal JSON — recovery chains to oracle parity,
  * same as the parity sweep. The observed batch-id sequence is asserted
  * too, so the replay actually happened (a test that never redelivers
  * would prove nothing).
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private val CHUNKS = 4

  /** Canonical row-set serialization (column-sorted, row-sorted JSON). */
  private def canon(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(col).toIndexedSeq: _*)
      .toJSON.collect().sorted.toSeq

  /** Split `fixture` into CHUNKS deterministic JSON-line chunks (hash of
    * `chunkKey`) — the same transport as StreamingParitySpec, but landed
    * as FILES so the source is durable and replayable across restarts. */
  private def jsonChunks(fixture: DataFrame, chunkKey: Column): Seq[Seq[String]] = {
    val chunks = fixture
      .withColumn("__c", pmod(xxhash64(chunkKey), lit(CHUNKS)))
      .select(col("__c"),
        to_json(struct(fixture.columns.map(col).toIndexedSeq: _*)).as("j"))
      .collect().groupBy(_.getLong(0)).toSeq.sortBy(_._1)
      .map(_._2.map(_.getString(1)).toSeq)
    assert(chunks.size == CHUNKS, s"fixture must fill all $CHUNKS chunks")
    chunks
  }

  private def writeChunk(inDir: String, idx: Int, rows: Seq[String]): Unit = {
    Files.write(Paths.get(inDir, f"chunk-$idx%03d.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    ()
  }

  /** Start the family's streaming query: file JSON source (1 file per
    * trigger = 1 chunk per batch) -> foreachBatch sink, checkpointed. */
  private def startQuery(inDir: String, ckpt: String, schema: StructType)(
      onBatch: (DataFrame, Long) => Unit) =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch(onBatch)
      .start()

  /** Delete the newest commit-log entry — the injected crash between
    * offset commit and batch commit. Returns the batch id Spark must now
    * re-deliver on restart. */
  private def dropLastCommit(ckpt: String): Long = {
    val dir = new File(ckpt, "commits")
    val entries = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(entries.nonEmpty, "no commits recorded — nothing to crash")
    val last = entries.last
    assert(last.delete(), s"could not delete ${last.getPath}")
    // ChecksumFs shadows every entry with .<n>.crc; the re-written commit
    // renames its own crc into place and collides if the stale one stays.
    val crc = new File(dir, s".${last.getName}.crc")
    if (crc.exists()) { crc.delete(); () }
    last.getName.toLong
  }

  /** The durable store: versioned parquet dirs `v<batchId>`; the newest
    * version is the current state. A replayed batch overwrites its OWN
    * version with the re-merged (identical, by merge idempotence)
    * content — the store never regresses. */
  private def latestVersion(storeDir: String): Option[Long] =
    Option(new File(storeDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
      .map(_.getName.drop(1).toLong).maxOption

  private def readStore(storeDir: String, schema: StructType): DataFrame =
    latestVersion(storeDir) match {
      case Some(v) => spark.read.parquet(s"$storeDir/v$v")
      case None => spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    }

  private def events = graft.model.Tables.events(spark, sf)
  private def emb = graft.model.Tables.embeddings(spark, sf)

  /** Same families as StreamingParitySpec (its fold-exactness argument
    * is what makes the final equality meaningful here). */
  private case class Family(
      registryName: String,
      fixture: () => DataFrame,
      chunkKey: Column,
      outCols: Seq[String],
      merge: (DataFrame, DataFrame) => DataFrame)

  private val families = Seq(
    Family("dedup_latest_wins",
      () => events.withColumn("id", col("event_id") % 1000),
      col("event_id"),
      Seq("id", "event_id", "user_id", "ts", "value"),
      (s, b) => DedupOps.latestWins(s.unionByName(b),
        id = col("id"), order = Seq(col("ts").desc, col("event_id").desc))),
    Family("stream_dedup_state",
      () => events.withColumn("id", col("event_id") % 500),
      col("event_id"),
      Seq("id", "event_id", "user_id", "ts", "value"),
      (s, b) => DedupOps.keepFirst(s.unionByName(b),
        keys = Seq(col("id")), order = Seq(col("ts"), col("event_id")))),
    Family("retention_ttl",
      () => events,
      col("event_id"),
      Seq("event_id", "user_id", "ts", "event_type", "value"),
      // The raw retention fold (ParitySpec's merge) is NOT replay-
      // idempotent: a redelivered chunk unions its rows in AGAIN and
      // nothing dedups them — this suite found that. A replay-safe
      // retention sink therefore keys the union on the unique event id
      // first (the reference's own at-least-once answer: idempotent
      // upsert by id, consumer.py:176-181), then applies the TTL; on
      // exactly-once delivery the dedup is a no-op, so ParitySpec's
      // fold-exactness argument is untouched.
      (s, b) => FilterOps.retentionDelete(
        DedupOps.keepFirst(s.unionByName(b),
          keys = Seq(col("event_id")), order = Seq(col("ts"), col("event_id"))),
        col("event_type"), "click", col("ts"), 20)),
    Family("upsert_vectors",
      () => emb.withColumn("id", col("vec_id") % 100),
      col("vec_id"),
      Seq("id", "vec_id", "label"),
      (s, b) => DedupOps.latestWins(s.unionByName(b),
        id = col("id"), order = Seq(col("vec_id").desc))))

  families.foreach { f =>
    test(s"${f.registryName}: stop / restart-from-checkpoint / crash-replay == batch answer") {
      val base = Files.createTempDirectory(s"graft_rec_${f.registryName}").toString
      val (inDir, ckpt, storeDir) = (s"$base/in", s"$base/ckpt", s"$base/store")
      Seq(inDir, storeDir).foreach(d => { new File(d).mkdirs(); () })
      val fixture = f.fixture()
      val schema = fixture.schema
      val chunks = jsonChunks(fixture, f.chunkKey)
      val seenBatches = scala.collection.mutable.ArrayBuffer[Long]()
      def start() = startQuery(inDir, ckpt, schema) { (b, id) =>
        seenBatches.synchronized { seenBatches += id; () }
        val merged = f.merge(readStore(storeDir, schema), b).localCheckpoint()
        merged.write.mode("overwrite").parquet(s"$storeDir/v$id")
      }

      // phase 1: two chunks stream in, then a clean stop
      writeChunk(inDir, 0, chunks(0))
      writeChunk(inDir, 1, chunks(1))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()

      // phase 2: restart from the checkpoint — only the NEW chunk runs
      writeChunk(inDir, 2, chunks(2))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      // phase 3: crash-replay — drop the last commit, restart: the
      // uncommitted batch re-delivers FIRST (same id), then the new chunk
      val redelivered = dropLastCommit(ckpt)
      writeChunk(inDir, 3, chunks(3))
      val q3 = start()
      try q3.processAllAvailable() finally q3.stop()

      val ids = seenBatches.synchronized(seenBatches.toList)
      assert(ids == List(0L, 1L, 2L, 2L, 3L),
        s"expected batch 2 redelivered once then batch 3, saw $ids")
      assert(redelivered == 2L, s"the dropped commit should be batch 2, was $redelivered")

      val got = canon(readStore(storeDir, schema)
        .select(f.outCols.map(col).toIndexedSeq: _*))
      val want = canon(SparkEntry.queries(f.registryName)(spark, sf)
        .select(f.outCols.map(col).toIndexedSeq: _*))
      assert(got.size == want.size,
        s"${f.registryName}: ${got.size} recovered rows vs ${want.size} batch rows")
      assert(got == want,
        s"${f.registryName}: store after stop/restart/replay diverges from batch")
    }
  }

  test("task-attempt retry inside the sink write leaves the store exactly-once") {
    // A DIFFERENT failure class from the crash-replay phases above:
    // there the whole BATCH re-delivers (source replay, sink-level
    // idempotence); here a single TASK of the store-write job fails on
    // its first attempt and Spark retries it (local[4,2]). The write
    // commit protocol must discard the failed attempt's partial output —
    // a sink that double-committed would show duplicate rows even though
    // no batch was ever replayed. Same merge family and final
    // batch-equality bar as the family tests.
    val f = families.head // dedup_latest_wins
    val base = Files.createTempDirectory("graft_rec_retry").toString
    val (inDir, ckpt, storeDir) = (s"$base/in", s"$base/ckpt", s"$base/store")
    Seq(inDir, storeDir).foreach(d => { new File(d).mkdirs(); () })
    val fixture = f.fixture()
    val schema = fixture.schema
    val chunks = jsonChunks(fixture, f.chunkKey)
    TaskFailOnce.fired.set(false)
    // The ONLY sanctioned retry producer in the test JVM: declare the
    // window to the session-wide audit, so the assertion below can hold
    // every suite that ran before this one to zero silent retries.
    SparkTest.RetryAudit.allowWhile {
      val q = startQuery(inDir, ckpt, schema) { (b, id) =>
        val merged = f.merge(readStore(storeDir, schema), b).localCheckpoint()
        // arm the injection on batch 1 only: by then the store is
        // non-trivial, so a double-commit would actually corrupt it
        val out =
          if (id == 1L)
            spark.createDataFrame(merged.rdd.mapPartitions { it =>
              if (!TaskFailOnce.fired.getAndSet(true))
                throw new RuntimeException("injected task failure (attempt 0)")
              it
            }, merged.schema)
          else merged
        out.write.mode("overwrite").parquet(s"$storeDir/v$id")
      }
      chunks.zipWithIndex.foreach { case (c, i) => writeChunk(inDir, i, c) }
      try q.processAllAvailable() finally q.stop()
    }
    assert(TaskFailOnce.fired.get(), "the injected task failure never fired")
    // The flip side of local[4, 2]: any OTHER task retry in the suites
    // run so far was a nondeterministic failure that silently passed on
    // attempt 2 — fail loudly instead of masking the flake.
    val stray = SparkTest.RetryAudit.unexpected.toArray.mkString("; ")
    assert(stray.isEmpty, s"unexpected task retries outside the injection window: $stray")

    val got = canon(readStore(storeDir, schema)
      .select(f.outCols.map(col).toIndexedSeq: _*))
    val want = canon(SparkEntry.queries(f.registryName)(spark, sf)
      .select(f.outCols.map(col).toIndexedSeq: _*))
    assert(got == want,
      s"${f.registryName}: store after a task-level retry diverges from batch")
  }

  // ---- state-STORE recovery: the other half of the durability story ----
  // The family tests above prove SOURCE replay + SINK idempotence; these
  // prove the keyed operator state itself (HDFS-backed and RocksDB state
  // stores) reloads from the checkpoint — the property that makes
  // flatMapGroupsWithState/transformWithState restartable at all.

  test("flatMapGroupsWithState: latest-snapshot state survives a restart") {
    import graft.streaming.{SnapshotMsg, StreamOps}
    val base = Files.createTempDirectory("graft_rec_state").toString
    val (inDir, ckpt) = (s"$base/in", s"$base/ckpt")
    new File(inDir).mkdirs()
    implicit val enc = org.apache.spark.sql.Encoders.product[SnapshotMsg]
    val schema = enc.schema
    val emitted = scala.collection.mutable.ArrayBuffer[SnapshotMsg]()
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir).as[SnapshotMsg]
      .transform(StreamOps.latestSnapshotStream)
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[SnapshotMsg], _: Long) =>
        val rows = b.collect()
        emitted.synchronized { emitted ++= rows; () }
      }.start()

    def msg(t: String, pt: Long, p: Double) =
      s"""{"ticker":"$t","publish_time":$pt,"current_price":$p}"""
    // chunk 0 establishes per-key state: X's latest is (200, 2.0)
    writeChunk(inDir, 0, Seq(msg("X", 100, 1.0), msg("X", 200, 2.0), msg("Y", 50, 5.0)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // chunk 1 after a RESTART: a LATE X arrival (150 < 200). Recovered
    // state must beat it — a query that lost its state would emit the
    // late row as the new "latest", which is exactly the corruption a
    // restart must not introduce.
    writeChunk(inDir, 1, Seq(msg("X", 150, 9.9)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val lastX = emitted.synchronized(emitted.filter(_.ticker == "X").last)
    assert(lastX == SnapshotMsg("X", 200L, 2.0),
      s"restart lost the keyed snapshot state: latest X after replay = $lastX")
  }

  test("fuzzy dedup stream: claimant state survives a restart") {
    import graft.streaming.StreamOps
    val base0 = Files.createTempDirectory("graft_rec_fuzzy").toString
    val (inDir, ckpt) = (s"$base0/in", s"$base0/ckpt")
    new File(inDir).mkdirs()
    val kept = scala.collection.mutable.ArrayBuffer[Long]()
    def start() = spark.readStream.schema(
        new StructType().add("doc_id", "long").add("text", "string")
          .add("lang", "string"))
      .option("maxFilesPerTrigger", 1).json(inDir)
      .transform(df => StreamOps.fuzzyDedupStream(df, r = 2))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        val ids = b.select("doc_id").collect().map(_.getLong(0))
        kept.synchronized { kept ++= ids; () }
      }.start()
    val text = "a long enough document about stream recovery semantics " +
      "and checkpointed claimant state in fuzzy dedup"
    def row(id: Long, t: String) =
      s"""{"doc_id":$id,"text":"$t","lang":"en"}"""
    // chunk 0: the claimant lands, plus one unrelated doc
    writeChunk(inDir, 0, Seq(row(1, text),
      row(2, "entirely different content on join reordering and pushdown")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // chunk 1 after a RESTART: an exact dup of doc 1 — the RECOVERED
    // claimant must drop it (a query that lost state would keep it),
    // while a fresh unique doc is kept.
    writeChunk(inDir, 1, Seq(row(3, text),
      row(4, "another unique payload about adaptive query execution")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = kept.synchronized(kept.sorted.toSeq)
    assert(got == Seq(1L, 2L, 4L),
      s"restart lost fuzzy claimant state: kept = $got")
  }

  test("transformWithState (RocksDB): running per-key counters survive a restart") {
    import graft.streaming.{SnapshotMsg, StreamOps, TickerStats}
    val base = Files.createTempDirectory("graft_rec_tws").toString
    val (inDir, ckpt) = (s"$base/in", s"$base/ckpt")
    new File(inDir).mkdirs()
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val enc = org.apache.spark.sql.Encoders.product[SnapshotMsg]
      val schema = enc.schema
      val emitted = scala.collection.mutable.ArrayBuffer[TickerStats]()
      def start() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(inDir).as[SnapshotMsg]
        .transform(StreamOps.tickerStatsStream)
        .writeStream.option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[TickerStats], _: Long) =>
          val rows = b.collect()
          emitted.synchronized { emitted ++= rows; () }
        }.start()

      def msg(t: String, pt: Long, p: Double) =
        s"""{"ticker":"$t","publish_time":$pt,"current_price":$p}"""
      writeChunk(inDir, 0, Seq(msg("X", 100, 1.0), msg("X", 200, 2.0), msg("X", 300, 1.5)))
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      writeChunk(inDir, 1, Seq(msg("X", 400, 0.5), msg("X", 250, 8.0)))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val lastX = emitted.synchronized(emitted.filter(_.ticker == "X").last)
      // n = 5 proves the counter RECOVERED (a fresh state would say 2);
      // latest = the post-restart (400, 0.5) and max = 8.0 (the late 250
      // arrival still raises the running max — max is event-time-blind by
      // design) prove the value state folded new batches onto the
      // recovered snapshot, not onto an empty one.
      assert(lastX == TickerStats("X", 5L, 400L, 0.5, 8.0),
        s"restart lost the transformWithState counters: $lastX")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("IVF maintainer: stop / restart / crash-replay leaves the store exactly-once") {
    val base = Files.createTempDirectory("graft_rec_ivf").toString
    val (inDir, ckpt) = (s"$base/in", s"$base/ckpt")
    new File(inDir).mkdirs()
    val storeDir = s"$base/store"
    // Synthetic assignment rows, one per vector (the ParitySpec fixture):
    // chunk 0 seeds the store directly; chunks 1-3 stream through the
    // maintainer.
    val assigns = emb.select(col("vec_id"),
      (col("vec_id") % 2).cast("int").as("s"),
      (col("vec_id") % 7).as("code"),
      (col("vec_id") % 5).as("c_id"))
    val chunkCol = pmod(xxhash64(col("vec_id")), lit(4))
    assigns.filter(chunkCol === 0).write.partitionBy("c_id").parquet(storeDir)
    val streamed = assigns.filter(chunkCol =!= 0)
    val schema = assigns.schema
    // Seed took group 0, so the stream carries groups 1-3: three chunks,
    // landed as files 0-2.
    val chunks: Seq[Seq[String]] = {
      val rows = streamed.select(
        to_json(struct(streamed.columns.map(col).toIndexedSeq: _*)).as("j"),
        chunkCol.as("g")).collect()
      (1 to 3).map(g => rows.filter(_.getLong(1) == g).map(_.getString(0)).toSeq)
    }
    assert(chunks.forall(_.nonEmpty), "every streamed chunk must carry rows")
    val applied = scala.collection.mutable.ArrayBuffer[(Long, Boolean)]()
    def start() = startQuery(inDir, ckpt, schema) { (b, id) =>
      val did = graft.streaming.StreamOps.ivfMaintainBatch(spark, storeDir, b, id)
      applied.synchronized { applied += ((id, did)); () }
    }

    writeChunk(inDir, 0, chunks(0))
    writeChunk(inDir, 1, chunks(1))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    writeChunk(inDir, 2, chunks(2))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    // crash-replay: no new file this time — the restart's ONLY work is
    // re-delivering batch 2, and the _MAINT marker must make the
    // duplicate application a no-op (applied = false).
    val redelivered = dropLastCommit(ckpt)
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()

    val log = applied.synchronized(applied.toList)
    assert(redelivered == 2L)
    assert(log == List((0L, true), (1L, true), (2L, true), (2L, false)),
      s"maintainer must apply each batch once and no-op the replay, saw $log")

    val got = canon(spark.read.parquet(storeDir)
      .select(col("vec_id"), col("s"), col("code"), col("c_id").cast("long")))
    assert(got == canon(assigns),
      "recovered IVF store diverged from the full assignment table")
  }
}

/** One-shot task-failure latch for the retry test: file-level object so
  * the task closure captures it without dragging the spec instance in;
  * local mode shares the JVM, so executor tasks see the same atomic. */
private object TaskFailOnce {
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
}
