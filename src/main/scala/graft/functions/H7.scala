package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native Catalyst expression: the library's canonical 28-bit string
  * hash — the first 7 hex digits of md5 as a BIGINT, numerically
  * identical to `CAST(concat('0x', substring(md5(s), 1, 7)) AS BIGINT)`
  * and to DuckDB's spelling of the same (the Det.h7 rule every oracle
  * twin is written against).
  *
  * Why a custom `Expression` (escalation path (b)): the built-in
  * composition materializes a 32-char hex STRING per input (md5 returns
  * hex text), substrings it, then re-parses the hex via `conv` — three
  * UTF8String allocations per value on the hot token path. This
  * expression digests the raw bytes and assembles the 28-bit value
  * directly (MinHashSig.h7, thread-local digest, zero intermediate
  * strings). Used by the hashed-bucket featurizers (q226's DSIR grams)
  * where the hash runs once per token instance — the dominant per-row
  * cost of those scans.
  */
case class H7(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"h7 expects a string, got ${other.simpleString(10)}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "h7"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.h7(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.h7($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): H7 =
    copy(child = newChild)
}
