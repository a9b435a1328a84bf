package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: DISTINCT w-token shingle hashes of a
  * token array (w defaults to 2 — the bigram-set feed for the n-gram
  * Jaccard dedup; q128's exact prefix-filter join asks for w=4).
  *
  *   th[i] = first 28 bits of md5(token_i)
  *   sh[i] = fold of th[i..i+w-1]:  acc -> (acc * 31 + th[k]) mod P,
  *           acc seeded with th[i],  P = 2^31-1
  *   result = sorted distinct sh
  *
  * (fewer than w tokens: the single hash of the space-joined tokens).
  *
  * Replaces a string-array pipeline (build shingle strings → distinct →
  * `array_intersect` on strings): set algebra over int64 hashes makes
  * the downstream intersect/union ~10x cheaper per pair and the arrays
  * ~6x smaller, while hash collisions (p ≈ n²/2³¹ per document) are
  * negligible for similarity estimation. Width matters at scale: the
  * shingle SPACE must dwarf the corpus's shingle slots or posting lists
  * grow linearly with the corpus (and candidate pairs quadratically) —
  * w is the knob that keeps per-shingle df bounded as the corpus grows.
  * DuckDB twin spells out the same md5/combine formula.
  */
case class ShingleHashes(child: Expression, widthExpr: Expression)
    extends BinaryExpression {

  def this(child: Expression) = this(child, Literal(2))

  override def left: Expression = child
  override def right: Expression = widthExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, widthExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if widthExpr.foldable =>
        // evaluate the foldable width HERE so an invalid literal is an
        // analysis error, not a mid-query runtime require() failure
        widthExpr.eval() match {
          case w: Int if w >= 2 => TypeCheckResult.TypeCheckSuccess
          case null => TypeCheckResult.TypeCheckFailure(
            "shingle_hashes width must not be null")
          case w => TypeCheckResult.TypeCheckFailure(
            s"shingle_hashes width must be >= 2, got $w")
        }
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "shingle_hashes width must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (array<string>, int width), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(tokens: Any, w: Any): Any =
    ShingleHashes.compute(tokens.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, w) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $w);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashes =
    copy(child = l, widthExpr = r)
}

object ShingleHashes {
  val P = 2147483647L

  def apply(child: Expression): ShingleHashes = new ShingleHashes(child)

  def compute(tokens: ArrayData, width: Int): GenericArrayData = {
    require(width >= 2, s"shingle width must be >= 2, got $width")
    val toks = MinHashSig.nonNullStrings(tokens) // null tokens are skipped
    val n = toks.length
    val raw =
      if (n >= width) {
        val th = new Array[Long](n)
        var i = 0
        while (i < n) {
          th(i) = MinHashSig.h7(toks(i).getBytes)
          i += 1
        }
        val s = new Array[Long](n - width + 1)
        var k = 0
        while (k < n - width + 1) {
          var acc = th(k)
          var j = 1
          while (j < width) {
            acc = (acc * 31L + th(k + j)) % P
            j += 1
          }
          s(k) = acc
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
