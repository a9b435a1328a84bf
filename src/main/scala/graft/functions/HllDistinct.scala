package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hll_distinct(s)` — a native HyperLogLog distinct-count AGGREGATE,
  * the one Catalyst extension rung the library's scalar expressions
  * (h7, minhash_sig, …) didn't cover: `TypedImperativeAggregate`, the
  * API behind Spark's own `percentile`/`collect_*`/datasketches aggs.
  *
  * Why this rung matters at 100 TB: a native aggregate gets Spark's
  * FULL distributed aggregation protocol for free — map-side PARTIAL
  * sketches (each task folds its rows into a 256-byte register array),
  * a shuffle that moves only the serialized sketches (256 bytes per
  * group per task, independent of row count), and a MERGE stage that
  * max-combines registers. `count(distinct x)` shuffles every distinct
  * value; this shuffles a fixed-size summary — the entire point of
  * sketch-based cardinality at scale, expressed as a first-class
  * aggregate instead of the q36/q181 composed-query harnesses.
  *
  * Determinism (the Det discipline, applied to a "randomized" sketch):
  * the hash is md5 — h15 = first 15 hex chars = 60 bits, the q25
  * spelling — so registers are a pure function of the input SET.
  * p = 8 (m = 256 buckets from the LOW 8 bits), ρ = position of the
  * first set bit in the remaining 52 bits (53 when zero). The estimate
  * keeps the raw-HLL path only (no small/large-range corrections whose
  * ln() could differ between engines' libm): the register sum is the
  * EXACT integer S = Σⱼ 2^(53−Mⱼ) (≤ 256·2^53 < 2^62, no overflow)
  * and the readout is ONE IEEE division C / S with C a shared literal
  * (alpha·m²·2^53) — so a DuckDB oracle can replay the register
  * algebra bit-exactly (group by bucket, max ρ via integer bit-length,
  * same shifted sum, same literal). Raw HLL needs the cardinality to
  * sit comfortably above 2.5·m = 640, which the paired query's groups
  * do at every oracle SF.
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import HllDistinct._

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_distinct expects a string, got ${other.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = MinHashSig.h15(v.asInstanceOf[UTF8String].getBytes)
      val bucket = (h & (M - 1)).toInt
      val w = h >>> P // remaining 52 bits
      val rho = if (w == 0L) MaxRho
        else java.lang.Long.numberOfLeadingZeros(w) - 11 // 64-52=12; +1
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) {
      if (other(j) > buffer(j)) buffer(j) = other(j)
      j += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    // exact integer register sum: S = sum_j 2^(53 - M_j)  (M_j in
    // [0, 53]; 256 terms of <= 2^53 stay far under int64)
    var s = 0L
    var any = false
    var j = 0
    while (j < M) {
      if (buffer(j) != 0) any = true
      s += 1L << (MaxRho - buffer(j))
      j += 1
    }
    // an untouched buffer (empty relation / all-null input) uniquely
    // identifies zero distinct values: any non-null update sets at
    // least one register to rho >= 1. Without this branch the raw-HLL
    // readout would report the alpha*m floor (~183.9) for zero rows.
    if (!any) 0.0
    else C / s.toDouble // one IEEE division over exact operands
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

object HllDistinct {
  val P = 8
  val M: Int = 1 << P // 256 registers
  val MaxRho = 53 // 60-bit hash minus 8 bucket bits, zero word -> 52+1

  /** alpha_m * m^2 * 2^53 — the raw-HLL numerator. The DuckDB oracle
    * embeds `C.toString` (shortest round-trip decimal), which parses
    * back to this exact double, so the C / S readout is bit-identical
    * across engines.
    */
  val C: Double = 0.7213 / (1.0 + 1.079 / M) * M.toDouble * M.toDouble *
    9007199254740992.0 // 2^53
}
