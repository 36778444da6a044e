package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row linear-classifier score over a space-tokenized
  * STRING — the engine's hashed-feature quality gate
  * ([[graft.operators.TierEleven.scoreCol]]) as ONE static call per row,
  * replacing the `aggregate`-HOF fold that round 6 flagged as
  * CodegenFallback in the s22/s24/Prepare ingest hot path (the graft_dot
  * lesson: interpreted lambda trees cost ~100× a native expression).
  *
  * Semantics (shared with the HOF reference,
  * [[graft.operators.TierEleven.scoreColReference]]): tokens are maximal
  * non-space byte runs (space is single-byte in UTF-8, never part of a
  * multibyte sequence); each token is xxhash64'd in place (seed 42 —
  * identical to the `xxhash64` SQL function), bucketed
  * `pmod(h, weights.length)`, and the bucket weights sum as BIGINT.
  * Token-less input scores 0; null in, null out. The weight table is a
  * model PARAMETER baked into the expression tree (broadcast once with
  * the plan, like the Bloom packed-literal pattern), so the gate stays a
  * pure stateless column — the same plan screens a live stream.
  *
  * `weights.length` must be a power of two (the fastText-style hashing
  * trick uses a mask, and the q83 model is 4096 buckets).
  */
case class ClassifierScore(child: Expression, weights: Seq[Long])
    extends UnaryExpression {

  require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
    s"graft_classifier_score: weights length must be a power of two, got ${weights.length}")

  // the hot-path lookup table; Seq on the case-class field keeps
  // expression equality structural (Array would compare by reference and
  // defeat subexpression elimination)
  private lazy val table: Array[Long] = weights.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_classifier_score requires a STRING argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_classifier_score"

  override def nullSafeEval(s: Any): Any =
    ClassifierScore.compute(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("classifierWeights", table, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.ClassifierScore.compute($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClassifierScore {

  /** One row's score; called from generated code (static forwarder).
    * `weights.length` is a power of two (enforced at construction). */
  def compute(s: UTF8String, weights: Array[Long]): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val mask = weights.length - 1
    var acc = 0L
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      while (i < n && Platform.getByte(base, off + i) != 0x20) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        // pmod(h, 2^k) == h & (2^k - 1) in two's complement
        acc += weights((h & mask).toInt)
      }
    }
    acc
  }
}
