package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: product-quantization encoder.
  *
  * `pq_encode(v, codebook, sub, dims)` splits the `sub * dims`-long
  * vector `v` into `sub` subvectors and returns, per subspace j, the
  * index of the nearest codebook centroid (squared L2, ties to the
  * lowest index). `codebook` is the flattened `cb[j][c][d]` array
  * (length `sub * k * dims`, k derived); per-subspace distance is the
  * strict left fold Σ_d (v[j·dims+d] − cb[...d])² in ascending d — the
  * same operand order as the DuckDB oracle's `list_reduce` twin, and as
  * the composed Column formulation NativeExprSpec pins this against.
  *
  * Exists for DRIVER-side plan economy as much as executor speed: the
  * composed argmin (8 subspaces × 16 centroids × 8-term squared diffs +
  * struct sorts) is a ~3000-node Column tree that costs over a second
  * of analyzer time PER QUERY CONSTRUCTION; this is 4 nodes. One
  * codegen'd loop at execution, eval and codegen shared.
  */
case class PqEncode(first: Expression, second: Expression,
                    third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<double>, array<double>, int, int), got $other")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(v: Any, cb: Any, sub: Any, dims: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      sub.asInstanceOf[Int], dims.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, sub, dims) =>
      s"${ev.value} = graft.functions.PqEncode.compute($v, $cb, $sub, $dims);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): PqEncode =
    copy(first = f, second = s, third = t, fourth = q)
}

object PqEncode {
  def compute(v: ArrayData, cb: ArrayData, sub: Int, dims: Int): ArrayData = {
    // Geometry validation the type check cannot do (lengths are runtime
    // values): without it a non-multiple codebook silently truncates and
    // a short vector throws an opaque out-of-bounds mid-loop.
    if (sub <= 0 || dims <= 0)
      throw new IllegalArgumentException(
        s"pq_encode: sub and dims must be positive, got sub=$sub dims=$dims")
    if (v.numElements() != sub * dims)
      throw new IllegalArgumentException(
        s"pq_encode: vector length ${v.numElements()} != sub*dims = ${sub * dims}")
    if (cb.numElements() == 0 || cb.numElements() % (sub * dims) != 0)
      throw new IllegalArgumentException(
        s"pq_encode: codebook length ${cb.numElements()} is not a positive " +
          s"multiple of sub*dims = ${sub * dims}")
    val k = cb.numElements() / (sub * dims)
    val codes = new Array[Int](sub)
    var j = 0
    while (j < sub) {
      var bestD = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        var acc = 0.0
        var d = 0
        val cbOff = (j * k + c) * dims
        val vOff = j * dims
        while (d < dims) {
          val diff = v.getDouble(vOff + d) - cb.getDouble(cbOff + d)
          acc += diff * diff
          d += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }
}
