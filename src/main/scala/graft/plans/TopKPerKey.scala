package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k pushdown — the full custom-operator ladder (SURVEY.md
  * §2.10 / builder-brief option (c)): a `Rule[LogicalPlan]` rewrites the
  * ubiquitous `Filter(row_number() <= k over (partition by p order by o))`
  * pattern into a dedicated logical node, an injected `Strategy` plans it,
  * and the physical operator keeps a bounded heap per key instead of
  * fully sorting every partition the way `WindowExec` must.
  *
  * Hive's analogue is `TopNHash` inside ReduceSinkOperator (map-side top-N
  * for ORDER BY LIMIT); this is its per-key generalization.
  *
  * Scale: memory is O(distinct-keys-per-partition × k) instead of a full
  * per-partition sort buffer; input needs hash partitioning on the keys
  * but NO sort — at 100 TB this removes the dominant n·log n term and the
  * spill pressure of sort-based windowing for top-k queries.
  *
  * Memory bound, stated precisely: a HOT KEY costs nothing extra — its
  * heap never holds more than k rows however many billions stream
  * through it (ExtensionsSpec drives 1M wide rows through one key under
  * a heap that could not hold them). What the operator retains per
  * partition is exactly its OUTPUT for that partition (≤ k rows per
  * distinct key), so the only way to exceed memory is an output that
  * would not fit either — a high-distinct-key partition, mitigated by
  * raising shuffle partitions (keys redistribute; per-key cost is
  * unaffected). Unlike WindowExec this operator does NOT spill: that is
  * the deliberate trade — the rewrite only fires on literal small k,
  * where retained-equals-output makes a spill path dead weight. If a
  * spilling variant is ever needed, fall back is trivial (the rewrite
  * is a Rule; removing it re-plans the same query as WindowExec, which
  * spills).
  *
  * All registered via [[graft.GraftExtensions]]; semantics are covered by
  * the oracle gate because the test session runs with the extension on.
  */
case class TopKPerKeyNode(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rnAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** The bounded per-key heap pass shared by the partial and final
  * phases: one LinkedHashMap of k+1-capacity max-heaps (head = worst
  * retained row), hot keys cost nothing beyond their k retained rows. */
private[plans] object TopKHeaps {
  def run(it: Iterator[InternalRow], kLocal: Int,
      partExprs: Seq[Expression], sortOrder: Seq[SortOrder],
      childOutput: Seq[Attribute])
  : java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]] = {
    val keyProj = UnsafeProjection.create(partExprs, childOutput)
    val ord = GenerateOrdering.generate(
      sortOrder.map(BindReferences.bindReference(_, childOutput)))
    val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    val cmp = new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
    }
    while (it.hasNext) {
      val row = it.next()
      val key = keyProj(row)
      var pq = heaps.get(key)
      if (pq == null) {
        pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, cmp)
        heaps.put(key.copy(), pq)
      }
      if (pq.size() < kLocal) {
        pq.add(row.copy())
      } else if (ord.compare(row, pq.peek()) < 0) {
        pq.poll(); pq.add(row.copy())
      }
    }
    heaps
  }
}

/** Map-side partial phase (the TakeOrderedAndProject pattern, per-key):
  * runs the SAME bounded heaps over each INPUT partition BEFORE the
  * exchange, so the shuffle ships ≤ input-partitions × keys-per-
  * partition × k rows instead of the full row set — a skewed key
  * (one dominant source in `llm_source_cap`, dedup keepers, the
  * boilerplate top-1) no longer sends its entire row population to
  * one reducer (r18 verdict item 4). Emits retained rows unranked;
  * the final phase re-heaps and assigns rn. Correct because any row
  * in a key's GLOBAL top-k is necessarily in the top-k of its own
  * input partition. */
case class TopKPerKeyPartialExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  // no required distribution — this phase runs wherever the child is
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    child.execute().mapPartitions({ it =>
      val heaps = TopKHeaps.run(it, kLocal, partExprs, sortOrder, childOutput)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { pq =>
        pq.iterator().asScala // heap order is fine — the final phase re-ranks
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  // deliberately NO requiredChildOrdering — avoiding the sort is the point

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    child.execute().mapPartitions ({ it =>
      val heaps = TopKHeaps.run(it, kLocal, partExprs, sortOrder, childOutput)
      val outProj = UnsafeProjection.create(childOutput :+ rnAttr, childOutput :+ rnAttr)
      val rnRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { pq =>
        val rows = new Array[InternalRow](pq.size())
        var i = rows.length - 1
        while (i >= 0) { rows(i) = pq.poll(); i -= 1 } // drain: worst-first → reverse fill
        rows.iterator.zipWithIndex.map { case (r, idx) =>
          rnRow.setInt(0, idx + 1)
          outProj(joined(r, rnRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Rewrites `Filter(rn <= k)` / `Filter(rn < k+1)` / `Filter(rn = 1)` over
  * a single-function `row_number()` Window into [[TopKPerKeyNode]]. */
object TopKRewrite extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, _)) if a.semanticEquals(rn) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, _)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, _), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, _), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, _)), _)), partitionSpec, orderSpec, child, _)) =>
      limitFrom(cond, alias.toAttribute) match {
        case Some(k) if k > 0 && orderSpec.nonEmpty =>
          TopKPerKeyNode(k, partitionSpec, orderSpec, alias.toAttribute, child)
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(k, part, order, rn, child) =>
      // partial → (exchange inserted by EnsureRequirements) → final;
      // when the child is ALREADY clustered on the keys the exchange
      // elides and the partial is a cheap co-located pre-pass.
      TopKPerKeyExec(k, part, order, rn,
        TopKPerKeyPartialExec(k, part, order, planLater(child))) :: Nil
    case _ => Nil
  }
}
