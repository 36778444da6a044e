package graft.operators

import org.apache.spark.sql.DataFrame

/** Collects the `persist()`s a composed pipeline takes, so the pipeline's
  * release handle can drop them ALL — not just the ones its top-level
  * function happened to create. Round 7's leak audit (DedupSpec's id-diff
  * release gates) showed [[Dedup.deduplicateReleasable]]'s handle covered
  * its own survivor cache and the components label leaf but not the four
  * intermediates [[TierFour.minhashPairs]] pins internally; threading one
  * of these through the call chain closes that class of leak structurally.
  *
  * Single-threaded builder use; release is idempotent. Queries driven by
  * Verify/Bench don't need it (their per-query sweep unpersists
  * everything), so the convenience entry points default to a throwaway
  * collector.
  */
final class Pins {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and remember it for [[release]]. */
  def apply(df: DataFrame): DataFrame = { buf += df.persist(); df }

  /** Remember an ALREADY-persisted `df` for [[release]] (for callees that
    * manage their own persist but delegate release, e.g.
    * [[Cumulative.rowNumber]]'s range-boundary cache). */
  def track(df: DataFrame): DataFrame = { buf += df; df }

  def release(): Unit = {
    buf.foreach(_.unpersist(blocking = false))
    buf.clear()
  }
}

/** The single-shot auto-release shape shared by the library pipelines
  * ([[Dedup.deduplicate]], the [[Graph]] engines): fire a release handle
  * once, after the first query execution that materializes the returned
  * plan. Extracted in round 9 from Dedup (round 7's VERDICT #5 fix) so
  * every releasable engine gets the identical listener semantics. */
object Release {

  /** Register a one-shot query-completion listener firing `release` after
    * the first execution whose analyzed plan contains `df`'s — matched by
    * node identity, so derived frames (`df.select(…)`, a parquet write of
    * a join over it) trigger too. Fires on success OR failure, then
    * unregisters. Returns `df` for call-site chaining.
    *
    * Contract: `df` becomes single-shot — execute once and keep the
    * OUTPUT; callers that materialize several times (or want release
    * timing control) use the engine's releasable variant instead. */
  def onFirstExecution(df: DataFrame, release: () => Unit): DataFrame = {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val spark = df.sparkSession
    // match on the ANALYZED tree: actions compose over Dataset.logicalPlan
    // (= the analyzed/commandExecuted plan), so the raw logical nodes never
    // appear in a derived action's execution
    val marker = df.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def fire(qe: QueryExecution): Unit =
        if (qe.analyzed.exists(_ eq marker) && done.compareAndSet(false, true)) {
          release()
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        fire(qe)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        fire(qe)
    }
    spark.listenerManager.register(listener)
    df
  }
}
