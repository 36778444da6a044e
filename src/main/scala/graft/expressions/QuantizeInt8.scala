package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Codegen'd symmetric per-vector int8 quantization over ARRAY<DOUBLE> —
  * `code_i = round(127 · v_i / max|v|)` — the third native expression, and
  * the same CodegenFallback lesson a third time: the declarative form
  * (`transform` whose lambda references an `aggregate` over the same
  * array) re-evaluates the O(d) max-abs aggregate for EVERY element —
  * O(d²) interpreted steps per row, ~10⁶ lambda evaluations per row at
  * production embedding widths. This is two tight passes (max-abs, then
  * codes) in one static call. The all-zero vector codes to all-zero;
  * null in, null out; elements are assumed non-null (dense embeddings).
  * Rounding is HALF_UP AWAY FROM ZERO (−63.5 → −64), matching SQL
  * `round()` — NOT Java `Math.round`, whose half-up-toward-+∞ would code
  * negative exact halves one step differently; pinned by an independent
  * Scala brute force in ExpressionSpec. Engine-side only, not
  * oracle-declared ([[graft.operators.Ann.quantizeInt8]] documents why).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize_int8 requires ARRAY<DOUBLE>, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_quantize_int8"

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.QuantizeInt8.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8 {
  /** Two passes over the array in one static call (used by codegen). */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i))
      if (v > m) m = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (m > 0.0) {
      i = 0
      while (i < n) {
        val x = a.getDouble(i) * 127.0 / m
        // HALF_UP away from zero (SQL round semantics)
        out(i) = (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
