package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED DISTINCT long
  * arrays (the shape ShingleHashes emits) via a linear merge — no hash
  * set, no materialized intersection array. Jaccard then needs no
  * `array_union` either: |A ∪ B| = |A| + |B| − |A ∩ B|.
  *
  * The built-in `array_intersect` + `array_union` pair builds two fresh
  * arrays per compared pair just to take their sizes — at hundreds of
  * thousands of candidate pairs (q26's blocked self-join) that
  * allocation dominated the query and made its runtime swing with GC
  * pressure. This is a zero-allocation two-pointer count.
  */
case class SortedOverlap(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_overlap expects (array<bigint>, array<bigint>) sorted distinct, got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedOverlap.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedOverlap.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlap =
    copy(left = l, right = r)
}

object SortedOverlap {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}
