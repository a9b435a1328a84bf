package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity between two
  * strings — the record-linkage scoring function (Winkler 1990, the
  * US Census Bureau's string comparator), bit-compatible with DuckDB's
  * `jaro_winkler_similarity` so the oracle twin compares EXACT doubles:
  *
  *   - comparison runs over UTF-8 BYTES (DuckDB semantics — 'héllo' vs
  *     'hello' scores as a 6-vs-5-byte pair, verified empirically);
  *   - either side empty → 0.0 (including both empty — DuckDB returns 0,
  *     not the textbook 1);
  *   - match window = max(n1,n2)/2 − 1 (floored at 0), half-transpositions
  *     halved, jaro = (m/n1 + m/n2 + (m−t)/m) / 3;
  *   - Winkler prefix boost (common-prefix bytes capped at 4, scale 0.1)
  *     applies only when jaro > 0.7 (verified: jaro 0.6 with a 4-byte
  *     common prefix stays 0.6).
  *
  * Why native (escalation path (b)): Spark ships `levenshtein` but no
  * Jaro-Winkler, and the composed-from-builtins form needs a positional
  * double loop that higher-order functions express only via sequence +
  * aggregate with O(n²) array churn per row, outside codegen. This is a
  * single static call inside whole-stage codegen, O(n·window) time and
  * two small boolean scratch arrays per row. Registered as
  * `jaro_winkler` via [[GraftExtensions]].
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($l, $r);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaroWinkler =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Shared by interpreted eval and generated code. */
  def compute(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val n1 = a.length
    val n2 = b.length
    if (n1 == 0 || n2 == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0

    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val aMatch = new Array[Boolean](n1)
    val bMatch = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // half-transpositions: walk the matched bytes of both sides in order
    var halfT = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) halfT += 1
        k += 1
      }
      i += 1
    }
    val t = halfT / 2
    val jaro = (m.toDouble / n1 + m.toDouble / n2 + (m - t).toDouble / m) / 3.0

    if (jaro <= 0.7) return jaro
    // Winkler boost: common prefix in BYTES, capped at 4
    var p = 0
    val pMax = math.min(4, math.min(n1, n2))
    while (p < pMax && a(p) == b(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
