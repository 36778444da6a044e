package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Q1 — queryable state (mirror of the reference's
  * `QueryableStateClientTest.java:16-46`, which polls a Flink job's keyed
  * `folding-state` by key over the QueryableStateClient RPC).
  *
  * Structured Streaming's analog is the memory sink: [[serve]] keeps a
  * streaming aggregation's CURRENT result registered as an in-memory table
  * (complete mode re-publishes the full state each trigger), and
  * [[lookup]]/[[snapshot]] are the client side — point reads against live
  * state with no second pipeline, exactly the ad-hoc "what is the count for
  * key X right now" the reference test performs.
  *
  * Scale posture: the served STATE itself lives in the executors' state
  * store; the memory sink materializes only the aggregation RESULT on the
  * driver — appropriate for the reference's use (one row per hashtag
  * window, human-queried). A result too large for the driver belongs in an
  * external keyed store (the [[InfluxHttpWriter]] path), not in queryable
  * state — same division Flink draws between queryable state and sinks.
  */
object QueryableState {

  /** Start serving `df` (a streaming aggregation) as live queryable state
    * under `name`. Complete mode by default: every trigger atomically
    * replaces the table with the aggregation's full current state.
    */
  def serve(df: DataFrame, name: String, outputMode: String = "complete",
      trigger: Trigger = Trigger.ProcessingTime(0),
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).trigger(trigger)
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start()
  }

  /** Full current state — the table the memory sink maintains. */
  def snapshot(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Point lookup: rows of the served state where `keyCol` = `key` (the
    * reference client's `getKvState(jobId, "word", key, …)` shape). */
  def lookup(spark: SparkSession, name: String, keyCol: String, key: Any): DataFrame =
    snapshot(spark, name).filter(col(keyCol) === lit(key))
}
