package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k-by-value aggregator (`Aggregator[IN, BUF, OUT]`) — the
  * canonical scale-correct top-k-per-group: each partition keeps at most
  * k (value, id) pairs in its buffer, partial buffers merge associatively,
  * so the shuffle moves k rows per group per partition instead of the
  * whole group (a window + row_number over the same data sorts every row
  * of every group). Deterministic ordering: value descending, id
  * ascending as the tie-break.
  *
  * Buffers are small sorted lists (k is small by contract); inputs fold
  * in O(k) per row. Used by q47; oracle twin is the window formulation,
  * which must produce identical rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ x)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
