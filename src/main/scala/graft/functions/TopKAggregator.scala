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
  * The buffer is kept sorted at all times, so `reduce` is a constant-time
  * reject on the common path (row doesn't beat the current k-th) and an
  * O(k) insert otherwise — no per-row sort, no allocation unless the
  * buffer actually changes. `merge` is a linear two-pointer merge of two
  * already-sorted buffers. Used by q47; oracle twin is the window
  * formulation, which must produce identical rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** true iff `a` ranks strictly before `b` (value desc, id asc). */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Nil

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && !before(x, buf.last)) buf
    else {
      val (hi, lo) = buf.span(before(_, x))
      ((hi :+ x) ++ lo).take(k)
    }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      val (ia, ib) = (a.iterator.buffered, b.iterator.buffered)
      while (out.length < k && (ia.hasNext || ib.hasNext)) {
        if (!ib.hasNext || (ia.hasNext && before(ia.head, ib.head))) out += ia.next()
        else out += ib.next()
      }
      out.toSeq
    }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}
