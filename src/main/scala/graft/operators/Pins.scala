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
