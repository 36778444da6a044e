package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream joins — the streaming face of the batch interval join
  * (oracle-checked q37). Both sides are watermarked, so the join state each
  * side buffers is BOUNDED: a left row can only ever match right rows in
  * `[leftTs, leftTs + within]`, and once the watermark passes that range the
  * row's state is dropped — the property that makes a stream-stream join
  * runnable forever at 100 TB/day (unbounded state is the alternative).
  */
object StreamJoins {

  /** Inner interval join: every (left, right) pair with equal keys where
    * `rightTs ∈ [leftTs, leftTs + within]`. Column names must be distinct
    * across the two sides (rename before joining, as with any self-join).
    *
    * @param within SQL interval literal body, e.g. "10 seconds"
    * @param delay  watermark delay for BOTH sides
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      within: String, delay: String = "300 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"interval $within"))
  }
}
