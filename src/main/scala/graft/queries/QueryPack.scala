package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One themed group of driver-contract queries: SURVEY §2 operator name →
  * DataFrame transform, plus the matching DuckDB oracle SQL (omitted only
  * for non-SQL-expressible operators, which the driver rows-only-checks). */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  /** Guarded pct-change SQL fragment — mirrors MarketOps.pctChange. */
  protected def pctSql(cur: String, prev: String): String =
    s"CASE WHEN $prev <> 0 THEN ($cur - $prev) / $prev * 100 ELSE 0.0 END"
}
