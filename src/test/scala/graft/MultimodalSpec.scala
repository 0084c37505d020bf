package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the multimodal kernels that sf-testdata can't reach
  * (every documents.text is >= 48 chars): empty payloads, payloads shorter
  * than one frame, and exact frame-boundary lengths. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private def frameSample(rows: Seq[(Long, String)]) = {
    val ds = rows.toDF("doc_id", "text").as[(Long, String)]
    ds.mapPartitions(_.flatMap { case (id, text) =>
      val nFrames = (text.length + 15) / 16
      (0 until nFrames).iterator.filter(_ % 4 == 0).map { i =>
        (id, i.toLong, text.substring(i * 16, math.min(text.length, i * 16 + 16)))
      }
    }).toDF("doc_id", "frame_idx", "frame")
  }

  test("frame sampler: empty payload yields zero frames") {
    assert(frameSample(Seq((1L, ""))).count() === 0)
  }

  test("frame sampler: sub-frame payload yields one short frame") {
    val rows = frameSample(Seq((1L, "abc"))).collect()
    assert(rows.map(r => (r.getLong(1), r.getString(2))).toSeq === Seq((0L, "abc")))
  }

  test("frame sampler: 64-char payload samples frames 0 (of 0..3)") {
    val text = "x" * 64
    val rows = frameSample(Seq((1L, text))).collect()
    assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(0L))
  }

  test("frame sampler: 65-char payload gets frames 0 and 4, frame 4 short") {
    val text = ("a" * 64) + "z"
    val rows = frameSample(Seq((1L, text))).collect()
      .map(r => (r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((0L, "a" * 16), (4L, "z")))
  }

  test("resize: 16-slot thumbnail, short payloads clamp") {
    val thumb = expr(
      "array_join(transform(sequence(0, 15), " +
        "i -> substr(text, CAST(i * ((length(text) + 15) div 16) + 1 AS INT), 1)), '')")
    val out = Seq((1L, "abcdefgh"), (2L, "q" * 160)).toDF("doc_id", "text")
      .select(col("doc_id"), thumb.as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // stride 1 for len 8: first 8 chars then clamped-empty slots
    assert(out(1L) === "abcdefgh")
    // stride 10 for len 160: 16 samples, all 'q'
    assert(out(2L) === "q" * 16)
  }

  test("multimodal_exact_dedup: identical blobs collapse, ledger is complete") {
    val out = graft.queries.EnrichmentQueries
      .queries("multimodal_exact_dedup")(spark, "/root/testdata/sf0.001").cache()
    val docs = graft.model.Tables.documents(spark, "/root/testdata/sf0.001")
    // one group per distinct payload; every doc accounted for exactly once
    assert(out.count() == docs.select(col("text")).distinct().count())
    assert(out.agg(sum(col("n_copies"))).head().getLong(0) == docs.count())
    // keep_id is a real doc and the group minimum by construction
    assert(out.join(docs, out("keep_id") === docs("doc_id"), "left_anti").count() == 0)
  }

  test("multimodal_phash_neardup: Hamming banding is lossless vs brute force") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.EnrichmentQueries
      .queries("multimodal_phash_neardup")(spark, sf)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.forall(_._3 <= 3), "every emitted pair within the Hamming radius")

    // brute force the same signatures all-pairs
    import org.apache.spark.sql.functions._
    val nf = greatest(lit(1), floor((length(col("text")) + 15) / 16).cast("int"))
    val sig = graft.model.Tables.documents(spark, sf)
      .withColumn("fh", transform(sequence(lit(0), nf - 1),
        i => graft.ops.TextOps.polyHash(col("text").substr(i * 16 + 1, lit(16)))))
      .select(col("doc_id"), graft.ops.TextOps.simHash(col("fh")).as("ph"))
    val brute = sig.select(col("doc_id").as("a_id"), col("ph").as("a_ph"))
      .crossJoin(sig.select(col("doc_id").as("b_id"), col("ph").as("b_ph")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("a_ph").bitwiseXOR(col("b_ph"))).cast("int"))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"banded result must equal all-pairs: missing=${brute -- got}, extra=${got -- brute}")
  }
}
