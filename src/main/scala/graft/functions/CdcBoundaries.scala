package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native Catalyst expression: content-defined-chunking boundary
  * positions of a token array (the q174 hot path).
  *
  * A position i (1-based, window <= i <= n) is a NATURAL boundary when
  * the first 28 bits of md5 of the space-joined `window`-token slice
  * ending at i are ≡ 0 (mod `mod`):
  *
  *   h7(toks[i-window+1 .. i] joined by ' ') % mod == 0
  *
  * The document end n is always a boundary, so every token lands in
  * exactly one chunk. Result: sorted distinct int positions.
  *
  * Numerically identical to the declarative HOF it replaces
  * (`filter(sequence(...), i -> conv(substring(md5(concat_ws(' ',
  * slice(toks, i-3, 4))), 1, 7), 16, 10) % 16 = 0)`) and to the DuckDB
  * twin's `CAST(concat('0x', substring(md5(...),1,7)) AS BIGINT) % 16`
  * — but compiled: the HOF ran interpreted (no codegen inside lambdas,
  * boxing per position, a fresh concat string per position) and was the
  * suite's slowest query at 9x DuckDB. Here token bytes are encoded
  * once and STREAMED into one reused MessageDigest per position — no
  * per-position string building, no boxing, whole-stage codegen outside.
  * Scale shape unchanged: stateless per-position predicate, no
  * sequential scan state, one pass per document.
  */
case class CdcBoundaries(tokens: Expression, windowExpr: Expression,
    modExpr: Expression) extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = windowExpr
  override def third: Expression = modExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, windowExpr.dataType, modExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if windowExpr.foldable && modExpr.foldable =>
        (windowExpr.eval(), modExpr.eval()) match {
          case (w: Int, m: Int) if w >= 1 && m >= 1 => TypeCheckResult.TypeCheckSuccess
          case (w, m) => TypeCheckResult.TypeCheckFailure(
            s"cdc_boundaries window and mod must be literals >= 1, got ($w, $m)")
        }
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "cdc_boundaries window and mod must be literals")
      case (t, w, m) => TypeCheckResult.TypeCheckFailure(
        s"cdc_boundaries expects (array<string>, int, int), got " +
          s"(${t.simpleString(10)}, ${w.simpleString(10)}, ${m.simpleString(10)})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def nullSafeEval(toks: Any, w: Any, m: Any): Any =
    CdcBoundaries.compute(toks.asInstanceOf[ArrayData],
      w.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, m) =>
      s"${ev.value} = graft.functions.CdcBoundaries.compute($t, $w, $m);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): CdcBoundaries = copy(tokens = f, windowExpr = s, modExpr = t)
}

object CdcBoundaries {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val SPACE = Array[Byte](' ')

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, window: Int, mod: Int): GenericArrayData = {
    val toks = MinHashSig.nonNullStrings(tokens) // null tokens skipped
    val n = toks.length
    // encode each token's bytes ONCE; every window streams slices of
    // these into the digest (the HOF rebuilt the joined string per
    // position: O(n * window) fresh allocations)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { tb(i) = toks(i).getBytes; i += 1 }
    val d = digest.get()
    val out = new Array[Int](math.max(n - window + 2, 1))
    var m = 0
    i = window // 1-based position of the window END
    while (i <= n) {
      d.reset()
      var j = i - window
      while (j < i) {
        if (j > i - window) d.update(SPACE)
        d.update(tb(j))
        j += 1
      }
      val md = d.digest()
      val h = ((md(0) & 0xffL) << 20) | ((md(1) & 0xffL) << 12) |
        ((md(2) & 0xffL) << 4) | ((md(3) & 0xffL) >>> 4)
      if (h % mod == 0 && i != n) { out(m) = i; m += 1 }
      i += 1
    }
    out(m) = n // the end is always a boundary (even for n < window)
    m += 1
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
