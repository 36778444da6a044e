package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row SimHash signature over a space-tokenized STRING — the
  * engine's second native expression (after [[DotProduct]]), and the same
  * lesson: the declarative form ([[graft.operators.TextOps.simhashColReference]],
  * `aggregate`/`zip_with`/`transform` over 63 bit lanes) is semantically
  * right but Spark's higher-order functions are CodegenFallback — every
  * token walks an interpreted lambda tree 63 times. This expression is one
  * static call per row: scan the UTF-8 bytes for space-delimited tokens
  * (space is single-byte in UTF-8, never part of a multibyte sequence),
  * xxhash64 each token slice IN PLACE (seed 42 — identical to the
  * `xxhash64` SQL function), and fold the 63 affine bit lanes in a tight
  * long loop. Bit-identical to the reference composition (differential in
  * SimhashPairSpec); ~interpreter-free, so ingest-rate signing and batch
  * backfills share one plan.
  *
  * Semantics (shared with the reference composition): token lanes are
  * `bit_j = ((A0·j mod P)·(xxhash64(tok) pmod P) + (B0·j mod P)) mod P mod 2`,
  * margins accumulate ±1 per OCCURRENCE, signature bit j−1 set iff the
  * margin is positive; token-less input signs as 0; null in, null out.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a STRING argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(s: Any): Any =
    SimHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  private val P = 2147483647L
  private val A0 = 2654435761L
  private val B0 = 40503L
  // lane coefficients, index 1..63 (lane j uses A0·j mod P / B0·j mod P —
  // the shared affine family; the Column reference multiplies (j+1) over
  // a 1-based sequence, which is the same j = 1..63)
  private val AJ: Array[Long] = Array.tabulate(64)(j => A0 * j % P)
  private val BJ: Array[Long] = Array.tabulate(64)(j => B0 * j % P)

  /** One row's signature; called from generated code (static forwarder). */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val acc = new Array[Long](64)
    var i = 0
    while (i < n) {
      while (i < n && Platform.getByte(base, off + i) == 0x20) i += 1
      val start = i
      while (i < n && Platform.getByte(base, off + i) != 0x20) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        var hm = h % P
        if (hm < 0) hm += P
        var j = 1
        while (j <= 63) {
          if ((AJ(j) * hm + BJ(j)) % P % 2 == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 1
    while (j <= 63) {
      if (acc(j) > 0) sig |= 1L << (j - 1)
      j += 1
    }
    sig
  }
}
