package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket ids (one
  * 6-bit bucket per table, 4 tables) for a 64-dim double vector.
  *
  *   w(t,k,d)    = (((t*6+k)*64+d) * 2654435761 mod 2^32) / 2^31 - 1
  *   bit(t,k)    = [ Σ_d w(t,k,d) * v[d-1]  >=  0 ]      (left fold, d = 1..64)
  *   bucket(t)   = Σ_k bit(t,k) << k
  *
  * Same escalation rationale as MinHashSig: the built-in nested-HOF
  * composition of this formula (~12k interpreted expression-node evals
  * per row) dominated the ANN query's runtime; this is one primitive
  * loop, identical arithmetic (integer-derived hyperplanes, strict
  * d-order accumulation) so the DuckDB oracle twin stays bit-identical.
  */
case class LshBuckets(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets expects array<double>, got ${other.simpleString(10)}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LshBuckets.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  val Tables = 4
  val Bits = 6
  val Dims = 64

  def compute(v: ArrayData): GenericArrayData = {
    val n = math.min(v.numElements(), Dims)
    val out = new Array[Long](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0L
      var k = 0
      while (k < Bits) {
        val base = (t * Bits + k) * Dims
        var acc = 0.0
        var d = 1
        while (d <= n) {
          val w = (((base + d) * 2654435761L) % 4294967296L).toDouble / 2147483648.0 - 1.0
          acc += w * v.getDouble(d - 1)
          d += 1
        }
        if (acc >= 0.0) bucket |= (1L << k)
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
