package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The deduplication pipeline as a LIBRARY surface — the composable calls
  * a training-data job strings together, each one the semantics of an
  * oracle-checked query (cited per method). All methods take any
  * `(doc_id BIGINT, text STRING, …)` frame and preserve the caller's
  * extra columns where they return document rows.
  *
  * Production ordering ([[TierFour.q26]] degenerate-bucket caveat): exact
  * dedup FIRST — identical documents share every LSH band, so sketching
  * before exact dedup creates K²/2-pair buckets. [[deduplicate]] encodes
  * that ordering.
  *
  * Cluster-keep-min vs pairwise drop: dropping `doc_b` of every near-dup
  * pair (q53) keeps any document with no SMALLER similar neighbor — on
  * chained similarity (A≈B≈C, A̸≈C) it under-deduplicates relative to
  * one-survivor-per-cluster. [[deduplicate]] keeps exactly each
  * connected component's min doc_id ([[TierSeven.q58]] oracle-checks the
  * full composition).
  */
object Dedup {

  /** Exact dedup survivors — q22 semantics: one document per distinct
    * `text`, min doc_id wins. The shuffle key is the fixed-width sha2
    * digest, never the payload; survivors come back row-complete via a
    * semi join. */
  def exactSurvivors(docs: DataFrame): DataFrame = {
    val surv = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    docs.join(surv, Seq("doc_id"), "left_semi")
  }

  /** Near-duplicate pairs `(doc_a, doc_b, jaccard)`, doc_a < doc_b —
    * q26's exact MinHash+LSH pipeline (bucketed candidates, exact
    * verification, never all-pairs). */
  def nearDupPairs(docs: DataFrame): DataFrame = nearDupPairs(docs, new Pins)

  private def nearDupPairs(docs: DataFrame, pins: Pins): DataFrame =
    TierFour.minhashPairs(TextOps.tokOf(docs.select("doc_id", "text")), pins)

  /** Near-dup cluster labels `(doc_id, cluster)` — cluster = min doc_id
    * of the connected component over [[nearDupPairs]] (q55's labeling;
    * singletons label themselves). */
  def clusters(docs: DataFrame): DataFrame = clusters(docs, new Pins)

  private def clusters(docs: DataFrame, pins: Pins): DataFrame =
    Components.connected(
        docs.select(col("doc_id").as("id")),
        nearDupPairs(docs, pins).select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("id").as("doc_id"), col("lbl").as("cluster"))

  /** The full dedup APPLY: exact dedup, then one survivor (min doc_id)
    * per near-dup cluster of the distinct corpus. Returns surviving rows
    * with all caller columns — q58 semantics — PLUS a release handle that
    * drops everything this pipeline pins: the survivor cache AND the
    * connected-components label leaf (a localCheckpoint whose blocks
    * otherwise live until session end). FINALITY: the labels' lineage is
    * truncated, so after release the returned plan cannot be re-executed —
    * call the handle only once the survivors (and anything derived from
    * them) are materialized.
    */
  def deduplicateReleasable(docs: DataFrame): (DataFrame, () => Unit) = {
    val pins = new Pins
    // three consumers (pair detection, the cluster node set, the final
    // semi join) each materialize independently — cache the survivors or
    // the corpus-wide sha2 groupBy + semi join runs three times.
    val distinctDocs = pins(exactSurvivors(docs))
    // a cluster's label IS its min doc_id (Components labels each node
    // with the component min, and the min labels itself) — survivors are
    // simply the self-labeled rows, no extra aggregation shuffle
    val keep = clusters(distinctDocs, pins)
      .filter(col("doc_id") === col("cluster"))
      .select("doc_id")
    val out = distinctDocs.join(keep, Seq("doc_id"), "left_semi")
    (out, () => {
      // the detector's internal intermediates too (minhashPairs' four
      // persists — the round-7 leak the id-diff spec caught), not just
      // this function's own survivor cache + label leaf
      pins.release()
      org.apache.spark.sql.GraftSqlBridge.releaseLeaves(out)
    })
  }

  /** [[deduplicateReleasable]] with the handle wired to a one-shot
    * query-completion listener (VERDICT r7 item #5: the bare wrapper used
    * to DISCARD the handle, silently pinning the survivor cache + the
    * components label leaf for the session lifetime). The first execution
    * that materializes the returned plan — a write, collect, or any action
    * on a frame derived from it — releases everything on completion
    * (success OR failure), then unregisters itself.
    *
    * Contract: the returned frame is single-shot. Execute it once and keep
    * the OUTPUT; re-executing the same object afterwards fails (the label
    * leaf is a lineage-truncated localCheckpoint — same finality as
    * [[deduplicateReleasable]]'s handle). Callers that materialize several
    * times from one plan (or want to control release timing) use
    * [[deduplicateReleasable]].
    */
  def deduplicate(docs: DataFrame): DataFrame = {
    val (out, release) = deduplicateReleasable(docs)
    Release.onFirstExecution(out, release)
  }
}
