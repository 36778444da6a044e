package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates exposed by the engine (SURVEY.md §2.2
  * "aggregations"). These are deliberately NOT oracle-declared — sketch
  * results are implementation-defined and differ from DuckDB's sketches —
  * so they are tested by tolerance in ScalaTest ([[graft.SketchSpec]])
  * instead of by hash match.
  *
  * Scale rationale: exact `count(DISTINCT x)` needs a full dedup shuffle of
  * the key space; the HLL++ sketch is O(1) state per group, merges
  * associatively across partitions, and is the only viable distinct count
  * when the key space itself is 10^9+ at 100 TB.
  */
object Sketches {

  /** HyperLogLog++ distinct count (relative error defaults to 5%). */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Per-group approximate distinct users — the sketch variant of the exact
    * q17 (`count(DISTINCT user_id)` per event_type). */
  def approxUsersByType(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))

  /** Approximate percentiles over a value column (t-digest style sketch —
    * accuracy bound by 1/accuracy). */
  def approxQuantiles(df: DataFrame, column: String,
      probabilities: Array[Double]): Array[Double] =
    df.stat.approxQuantile(column, probabilities, 0.01)
}
