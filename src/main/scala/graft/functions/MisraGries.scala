package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Misra–Gries frequent-items summary (Misra & Gries 1982; mergeable
  * form per Agarwal et al., PODS 2012) — the candidate phase of the
  * two-phase exact heavy-hitter plan (q192).
  *
  * A k-counter summary undercounts every item by at most n/(k+1), so
  * any item with true frequency > n/(k+1) survives with a positive
  * counter. Distributed, the guarantee composes by pigeonhole: if an
  * item's GLOBAL count exceeds N/(k+1) = Σp Np/(k+1), some partition p
  * has a local count above Np/(k+1), so the item survives that
  * partition's summary and the UNION of per-partition survivors is a
  * guaranteed superset of the global heavy hitters — regardless of row
  * order or partition layout (TierFiftyFourSpec pins this under
  * adversarial repartitions). The union is bounded at k rows per
  * partition: bounded driver-free state at any corpus size, no shuffle
  * of the token stream.
  *
  * Reference mapping: none (SURVEY.md §2.1) — the reference's trending
  * hashtag windows (TweetHashtagCountStream.java:60-76) always group
  * the full key space; this is the bounded-state alternative a 100 TB
  * vocabulary needs.
  */
object MisraGries {

  /** Fold one partition's tokens into a k-counter summary. Every
    * decrement burst removes ≥1 counter and charges k decrements
    * against the ≤n total increments, so the fold is O(n + k·n/k) =
    * O(n) amortized with O(k) state. */
  private[graft] def summary(it: Iterator[String], k: Int): mutable.HashMap[String, Long] = {
    require(k > 0, s"Misra-Gries needs k > 0, got $k")
    val c = mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      c.get(t) match {
        case Some(v) => c.update(t, v + 1)
        case None if c.size < k => c.update(t, 1L)
        case None =>
          c.mapValuesInPlace((_, v) => v - 1)
          c.filterInPlace((_, v) => v > 0)
      }
    }
    c
  }

  /** Merge two summaries back into k counters: sum counts, then subtract
    * the (k+1)-largest merged count from every entry and drop the
    * non-positives (Agarwal et al. §3.1) — undercount bounds add, so a
    * merge tree over partition summaries keeps the global n/(k+1)
    * guarantee. */
  private[graft] def merge(a: collection.Map[String, Long], b: collection.Map[String, Long],
      k: Int): mutable.HashMap[String, Long] = {
    val m = mutable.HashMap.empty[String, Long]
    a.foreach { case (t, v) => m.update(t, m.getOrElse(t, 0L) + v) }
    b.foreach { case (t, v) => m.update(t, m.getOrElse(t, 0L) + v) }
    if (m.size > k) {
      val d = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      m.mapValuesInPlace((_, v) => v - d)
      m.filterInPlace((_, v) => v > 0)
    }
    m
  }

  /** The distributed candidate set: per-partition k-counter survivors,
    * unioned (distinct over ≤ k·partitions short rows). Input = any
    * single-string-column frame; output column `token`. */
  def candidates(tokens: DataFrame, k: Int): DataFrame = {
    val s = tokens.sparkSession
    import s.implicits._
    tokens.select(col(tokens.columns.head).cast("string")).as[String]
      .mapPartitions(it => summary(it, k).keysIterator)
      .toDF("token").distinct()
  }
}
