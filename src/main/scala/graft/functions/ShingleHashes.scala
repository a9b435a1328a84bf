package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: DISTINCT n-token shingle hashes of a
  * token array (here fixed n=2 — the bigram-set feed for the n-gram
  * Jaccard dedup).
  *
  *   th[i] = first 28 bits of md5(token_i)
  *   sh[i] = (th[i] * 31 + th[i+1]) mod P,   P = 2^31-1
  *   result = sorted distinct sh
  *
  * (fewer than 2 tokens: the single hash of the space-joined tokens).
  *
  * Replaces a string-array pipeline (build bigram strings → distinct →
  * `array_intersect` on strings): set algebra over int64 hashes makes
  * the downstream intersect/union ~10x cheaper per pair and the arrays
  * ~6x smaller, while hash collisions (p ≈ n²/2³¹ per document) are
  * negligible for similarity estimation. DuckDB twin spells out the same
  * md5/combine formula.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects array<string> tokens, got ${other.simpleString(10)}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  val P = 2147483647L

  def compute(tokens: ArrayData): GenericArrayData = {
    val toks = MinHashSig.nonNullStrings(tokens) // null tokens are skipped
    val n = toks.length
    val raw =
      if (n >= 2) {
        val th = new Array[Long](n)
        var i = 0
        while (i < n) {
          th(i) = MinHashSig.h7(toks(i).getBytes)
          i += 1
        }
        val s = new Array[Long](n - 1)
        var k = 0
        while (k < n - 1) {
          s(k) = (th(k) * 31L + th(k + 1)) % P
          k += 1
        }
        s
      } else {
        val joined = new StringBuilder
        var k = 0
        while (k < n) {
          if (k > 0) joined.append(' ')
          joined.append(toks(k).toString)
          k += 1
        }
        Array(MinHashSig.h7(joined.toString.getBytes("UTF-8")))
      }
    // sorted distinct (set semantics for downstream Jaccard algebra)
    java.util.Arrays.sort(raw)
    var uniq = 0
    var i = 0
    while (i < raw.length) {
      if (i == 0 || raw(i) != raw(i - 1)) { raw(uniq) = raw(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, uniq))
  }
}
