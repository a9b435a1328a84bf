package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays as a
  * strict left fold (`acc += a[i] * b[i]`, ascending i) — the operand
  * order every cosine in this engine relies on for cross-engine bit
  * parity (DuckDB `list_reduce` twin; see Det.dot, the composed
  * reference formulation that NativeExprSpec pins this against).
  *
  * Replaces `aggregate(zip_with(a, b, *), 0.0, +)` in the pair-scoring
  * hot paths (q22/q27/q28): the HOF composition allocates a zipped array
  * and dispatches ~10 boxed nodes per element; this is one primitive
  * loop, eval and codegen shared.
  */
case class FoldDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"fold_dot expects (array<double>, array<double>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "fold_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    FoldDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FoldDot.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FoldDot =
    copy(left = l, right = r)
}

object FoldDot {
  /** Null elements contribute 0 to the sum — explicitly skipped, rather
    * than relying on UnsafeArrayData's accidental 0.0-for-null read
    * (GenericArrayData would NPE on the same input). Embedding columns
    * are null-free; this guards the session-registered function surface.
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
