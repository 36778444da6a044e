package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bottom-`k` DISTINCT values as a typed `Aggregator` — the mergeable
  * core of the KMV/bottom-k distinct-count sketch (q242): keep the `k`
  * smallest distinct hash values seen; the k-th smallest estimates the
  * distinct count as `(k−1)·M / h_k` over a hash space of size `M`
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007).
  *
  * The buffer is a sorted distinct `Seq[Long]` of size ≤ k, so state is
  * O(k) regardless of input volume, `reduce` runs map-side per
  * partition and `merge` after the shuffle (the [[TypedSum]] contract —
  * Catalyst's partial+final shape), and merging two sketches of two
  * datasets equals the sketch of their union (the append ≡ rebuild law,
  * pinned in TierEightyOneSpec). Dedup needs only the kept window: a
  * duplicate either collides inside the buffer (dropped by the
  * `contains` probe) or is ≥ the current k-th value (dropped anyway).
  */
final class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1, s"bottom-k needs k >= 1, got $k")
  override def zero: Seq[Long] = Vector.empty
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[Long]): Seq[Long] = r
  private def insert(b: Seq[Long], a: Long): Seq[Long] =
    if (b.length == k && a >= b.last) b          // can't displace anything
    else if (b.contains(a)) b                    // O(k) — k is a small constant
    else if (b.length < k) (b :+ a).sorted
    else ((b :+ a).sorted).init                  // insert + drop the new max
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
