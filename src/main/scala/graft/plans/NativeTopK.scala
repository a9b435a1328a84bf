package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (the rung above native expressions):
  * a NATIVE grouped top-k — custom logical node, optimizer rewrite,
  * planner strategy and physical operator, all registered through
  * `SparkSessionExtensions` (GraftExtensions).
  *
  * Why: Spark plans the declarative per-group top-k idiom
  *
  * {{{ row_number().over(partitionBy(g).orderBy(o)) <= k }}}
  *
  * as exchange + two full SORTS + a window pass (WindowGroupLimit trims
  * rows but still sorts each partition first). Sorting a partition is
  * O(n log n) with spill risk; selecting k is O(n log k) in fixed memory.
  * This operator streams each input partition once through per-group
  * bounded heaps (partial), shuffles only the ≤ k survivors per (group,
  * partition), and heap-merges per group (final). At 100 TB the shuffle
  * carries k rows per group per task instead of every row, and no sort
  * buffer ever materializes a partition. The rewrite is transparent:
  * users keep writing the standard row_number idiom (same plan the
  * DuckDB oracle runs); sessions without the extension keep Spark's
  * stock plan — semantics identical either way.
  *
  * Memory bound: (groups per task) × k row copies — the same class as
  * hash aggregation state but without its spill path, which is why the
  * rewrite is gated at k ≤ [[RewriteRankLimitToNativeTopK.maxK]] and on
  * a deterministic total order. Degenerate-cardinality inputs (every row
  * its own group) pay one heap per row exactly like a hash aggregate
  * pays one state slot per key.
  *
  * Reference analogue: top-n per group over the reference's monthly agg
  * (wallmart_pipeline.py:117-119 computes the mean per month; "best k
  * months/items per group" is its immediate reporting extension).
  */
case class LocalTopKPerGroup(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalTopKPerGroup =
    copy(child = newChild)
}

/** Rewrites `Project(p, Filter(rank-cond, Window(row_number, ...)))` into
  * [[LocalTopKPerGroup]] when the rank column is consumed ONLY by the
  * filter (the Project above must drop it — the canonical
  * `.filter(rn <= k).drop("rn")` shape). Conservative by design:
  *
  *  - only `row_number` (rank/dense_rank admit > k rows under ties);
  *  - only `<= k` / `< k+1` / `= 1` bounds with literal k ≤ [[maxK]];
  *  - partition and order expressions must be deterministic, and the
  *    order must be non-empty (row_number requires it);
  *  - fires on the already-group-limited form too (WindowGroupLimit
  *    below the Window) in case Spark's own inference ran first.
  */
object RewriteRankLimitToNativeTopK extends Rule[LogicalPlan] {
  val maxK = 1024

  private def rankBound(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private def isRowNumberFrame(spec: WindowSpecDefinition): Boolean = spec.frameSpecification match {
    case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)), partSpec, orderSpec, wChild, _)))
        if orderSpec.nonEmpty && isRowNumberFrame(spec) &&
          partSpec.forall(_.deterministic) && orderSpec.forall(_.deterministic) &&
          rankBound(cond, alias.toAttribute).exists(k => k >= 1 && k <= maxK) &&
          projList.forall(!_.references.contains(alias.toAttribute)) =>
      val k = rankBound(cond, alias.toAttribute).get
      // Spark may already have inserted its own group limit below the
      // window; the native operator subsumes it
      val input = wChild match {
        case WindowGroupLimit(p2, o2, _, l2, grandChild)
            if p2 == partSpec && o2 == orderSpec && l2 >= k => grandChild
        case other => other
      }
      Project(projList, LocalTopKPerGroup(partSpec, orderSpec, k, input))
  }
}

/** Plans [[LocalTopKPerGroup]] as partial heaps → exchange (inserted by
  * EnsureRequirements iff the child is not already clustered on the
  * group key — bucketed or pre-partitioned inputs skip it) → final
  * heap-merge.
  */
object NativeTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalTopKPerGroup(partSpec, orderSpec, k, child) =>
      val partial = TopKPerGroupExec(partSpec, orderSpec, k, partial = true, planLater(child))
      TopKPerGroupExec(partSpec, orderSpec, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Heap-based per-group top-k. Each task streams its input once,
  * keeping at most `limit` rows per group in a bounded max-at-head
  * priority queue (head = worst row retained; a new row enters only if
  * it orders strictly before the head). Partial mode runs on raw input
  * partitions; final mode runs after clustering on the group key and
  * merges the partial survivors with the identical loop. Output order
  * within a group is unspecified, as with any hash-based operator — a
  * parent Sort imposes presentation order.
  */
case class TopKPerGroupExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    limit: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val partSpec = partitionSpec
    val order = orderSpec
    val attrs = child.output
    val k = limit
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partSpec, attrs)
      val rowProj = UnsafeProjection.create(attrs, attrs)
      val ord = new InterpretedOrdering(order, attrs)
      // head of each queue = the WORST retained row (reverse ordering)
      val worstAtHead = ord.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = rowProj(iter.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](k, worstAtHead)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < k) {
          heap.add(row.copy())
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }
}
