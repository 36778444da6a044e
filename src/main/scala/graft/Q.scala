package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL over the same parquet tables (bare table
  * names; the driver registers views). `oracle = None` → driver records a
  * weaker rows-only check (SURVEY.md §5.2).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
}
