package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, CollectionGenerator, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (table-generating function) — the last rung
  * of the extension ladder after scalar expressions, an Aggregator,
  * optimizer rules, a planner strategy + physical operator, and a DSv2
  * source: one input row fans out to many output rows inside the
  * operator, like `posexplode`.
  *
  * `shingle_windows(tokens, w)` emits one row per w-token sliding window
  * of a token array: `(pos, shingle)` with 1-based `pos` and the window's
  * tokens joined by a single space. Fewer than w tokens emit nothing.
  * Null tokens are skipped before windowing (matching [[ShingleHashes]]).
  *
  * Why a Generator and not `explode(transform(sequence(...)))`: the
  * composed spelling materializes an intermediate lambda-driven array
  * per row with per-element null handling, and its plan carries three
  * nested higher-order functions. The generator IS the collection —
  * [[CollectionGenerator]] with `inline=true` hands GenerateExec an
  * ArrayData of struct rows that whole-stage codegen iterates directly
  * ([[doGenCode]] emits one static call), keeping the fan-out inside the
  * codegen'd stage. Scale shape: output rows ≈ input tokens (linear,
  * streamed by GenerateExec) — never a driver-side or per-partition
  * buffer beyond one document's windows.
  */
case class ShingleWindows(child: Expression, widthExpr: Expression)
    extends BinaryExpression with CollectionGenerator {

  def this(child: Expression) = this(child, Literal(3))

  override def left: Expression = child
  override def right: Expression = widthExpr

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, widthExpr.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if widthExpr.foldable =>
        widthExpr.eval() match {
          case w: Int if w >= 1 => TypeCheckResult.TypeCheckSuccess
          case null => TypeCheckResult.TypeCheckFailure(
            "shingle_windows width must not be null")
          case w => TypeCheckResult.TypeCheckFailure(
            s"shingle_windows width must be >= 1, got $w")
        }
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(
          "shingle_windows width must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"shingle_windows expects (array<string>, int width), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("shingle", StringType, nullable = false)

  override val inline: Boolean = true
  override val position: Boolean = false
  override def collectionType: DataType =
    ArrayType(elementSchema, containsNull = false)

  override def prettyName: String = "shingle_windows"

  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) Nil
    else ShingleWindows.rows(t.asInstanceOf[ArrayData], width)
  }

  // GenerateExec's CollectionGenerator codegen protocol: this expression
  // generates the COLLECTION (ArrayData of struct rows); the exec node
  // emits the loop that inlines each element — whole-stage end to end.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, w) =>
      s"${ev.value} = graft.functions.ShingleWindows.compute($toks, $w);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleWindows =
    copy(child = l, widthExpr = r)
}

object ShingleWindows {
  def apply(child: Expression): ShingleWindows = new ShingleWindows(child)

  def rows(tokens: ArrayData, width: Int): Array[InternalRow] = {
    // Generator.nullable is hard-wired false, so codegen skips the usual
    // null guards and a null child value reaches this call directly —
    // null in, zero rows out (the eval path's Nil).
    if (tokens == null) return Array.empty[InternalRow]
    val toks = MinHashSig.nonNullStrings(tokens) // null tokens are skipped
    val n = toks.length
    if (n < width) return Array.empty[InternalRow]
    val out = new Array[InternalRow](n - width + 1)
    var i = 0
    while (i <= n - width) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j).toString)
        j += 1
      }
      out(i) = new GenericInternalRow(
        Array[Any](i + 1, UTF8String.fromString(sb.toString)))
      i += 1
    }
    out
  }

  def compute(tokens: ArrayData, width: Int): ArrayData =
    new GenericArrayData(rows(tokens, width).asInstanceOf[Array[Any]])
}
