package graft.plans

import org.apache.spark.sql.SparkSession

import graft.expressions.CosineSimilarity

/** Registers graft's SQL functions on an ALREADY-BUILT session (the
  * driver constructs the SparkSession in this harness, so the
  * `.withExtensions` path of [[GraftExtensions]] isn't always available). */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "squared_distance",
      exprs => graft.expressions.SquaredDistance(exprs(0), exprs(1)))
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "jaccard_sim",
      exprs => graft.expressions.JaccardSimilarity(exprs(0), exprs(1)))
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "bigram_l1",
      exprs => graft.expressions.BigramL1(exprs(0), exprs(1)))
  }
}
