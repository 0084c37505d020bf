package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Robustness sweep #2: run every registry query against a twin of the
  * smallest test SF where ~10% of EVERY column's values are replaced by
  * NULL (deterministically, keyed on the value's own hash — reruns see
  * the same rows nulled).
  *
  * Raw corpus data carries nulls everywhere — scraped documents with no
  * text, events with no value, embeddings that failed to compute. The
  * engine's contract is the relational one: nulls propagate (null in →
  * null/absent out), they never crash a native expression's eval loop,
  * a typed encoder boundary, a driver-side collect, or a store build.
  * Like the other sweeps this classifies ok/FAIL only (no oracle — null
  * semantics are the oracle-backed queries' job on the real data).
  *
  * Usage: runMain graft.tools.NullFuzzProbe [srcSf] [dstDir] [q1,q2]
  * The pinned contract is NullFuzzSpec (zero failures, whole registry).
  */
object NullFuzzProbe {

  def stageNullTwin(spark: SparkSession, srcSf: String, dst: String): Unit =
    RegistrySweep.stageTwin(spark, srcSf, dst, "_NULL_TWIN_OK") { raw =>
      raw.columns.foldLeft(raw) { (df, c) =>
        // hash(value) keys the choice so the same logical value is
        // nulled on every restage; the seed mixes the column name so
        // correlated columns don't null in lockstep.
        df.withColumn(c,
          when(pmod(hash(col(c), lit(c)), lit(10)) === 0,
            lit(null).cast(df.schema(c).dataType))
            .otherwise(col(c)))
      }
    }

  def main(args: Array[String]): Unit =
    RegistrySweep.probeMain(args, "/tmp/graft_nullfuzz_sf", "null-fuzz")(stageNullTwin)
}
