package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** split_leakage_safe: the split is assigned at near-dup-cluster
  * granularity, so near-duplicates can never straddle train/test. Values
  * are oracle-checked by the driver; these specs pin the leakage guarantee
  * itself and the deterministic bucket rule. */
class SplitLeakageSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val SF = "/root/testdata/sf0.001"

  private lazy val out =
    SparkEntry.queries("split_leakage_safe")(spark, SF).cache()

  test("no near-dup pair straddles a split boundary") {
    val splits = out.select(col("doc_id"), col("split"))
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, SF)
      .select(col("a_id"), col("b_id"))
    val straddling = pairs
      .join(splits.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "a_split"), "a_id")
      .join(splits.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "b_split"), "b_id")
      .filter(col("a_split") =!= col("b_split"))
    assert(pairs.count() > 0, "testdata must contain near-dup pairs")
    assert(straddling.count() == 0)
    // ... and more strongly: one split per whole component.
    val mixed = out.groupBy(col("comp"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1)
    assert(mixed.count() == 0)
  }

  test("split is the deterministic sampleKey bucket of the representative") {
    val P = 1000000007L
    for ((comp, split) <- out.select("comp", "split").distinct()
        .collect().map(r => (r.getLong(0), r.getString(1)))) {
      val b = ((comp % P) * (2654435761L % P)) % P % 10
      val want = if (b < 8) "train" else if (b == 8) "valid" else "test"
      assert(split == want, s"comp $comp: $split vs $want (bucket $b)")
    }
    // All docs covered, exactly once.
    assert(out.count() ==
      graft.model.Tables.documents(spark, SF).count())
    assert(out.select("doc_id").distinct().count() == out.count())
  }

  test("train_shard_pipeline composes its stages without drift") {
    val pipe = SparkEntry.queries("train_shard_pipeline")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(pipe.nonEmpty)

    // Every emitted doc is a TRAIN cluster representative...
    val reps = out.filter(col("split") === "train" && col("doc_id") === col("comp"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pipe.forall(p => reps.contains(p._1)))

    // ...the per-source admitted token mass respects the budget...
    for ((_, tot) <- pipe.groupBy(_._2).map { case (s, rs) => (s, rs.map(_._3).sum) })
      assert(tot <= 600L)

    // ...and packing is the exact running-sum layout per shard.
    for ((_, rows) <- pipe.groupBy(_._4)) {
      var cum = 0L
      for ((_, _, n, _, seqIdx, offset) <- rows.sortBy(_._1)) {
        assert(seqIdx == cum / 512 && offset == cum % 512)
        cum += n
      }
    }
  }
}
