package graft.plans

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * Memory posture, stated precisely: a HOT KEY costs nothing extra — its
  * heap never holds more than k rows however many billions stream
  * through it (ExtensionsSpec drives 1M wide rows through one key under
  * a heap that could not hold them). What the operator retains per
  * partition is its OUTPUT for that partition (≤ k rows per distinct
  * key) — bounded for value-domain keys, but PARTITION-SIZED when the
  * key is data-sized (keys ≈ rows: tf-idf per-doc tops, dedup keepers).
  * The r19 verdict flagged exactly that adopter class, so retention is
  * now bounded on BOTH phases instead of documented away:
  *
  *  - The PARTIAL (map-side) phase watches its distinct-keys/seen ratio
  *    over a sample prefix and abandons the heaps for pass-through when
  *    the pre-pass is not cutting the shuffle (keys > half of seen, the
  *    keys≈rows signature) or when retention hits the absolute cap.
  *    Always safe — the final phase re-ranks whatever reaches it; the
  *    bail merely forfeits a map-side reduction that wasn't happening.
  *  - The FINAL phase caps retention at `spark.graft.topk.maxRetained`
  *    rows; past the cap it hands the partition to an
  *    [[UnsafeExternalRowSorter]] (the spilling sort machinery
  *    `SortExec` itself rides) ordered on (keys, order) and streams
  *    ranks off the grouped runs — exactly the WindowExec shape, chosen
  *    ONLY on partitions where retained-equals-output stopped being a
  *    memory bound. Small-k/value-domain adopters never hit either
  *    path and keep the sort-free plan.
  *
  * Both bailouts surface as SQLMetrics (`passThroughParts`,
  * `spilledParts`) so a plan that silently degraded to sort is visible
  * in the UI and assertable in tests.
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

/** Session-conf knobs shared by both phases (read at doExecute time on
  * the driver, so tests and tuning sessions can set them per-query). */
private[plans] object TopKConf {
  val MaxRetainedKey = "spark.graft.topk.maxRetained"
  val SampleRowsKey = "spark.graft.topk.partialSampleRows"
  val MaxRetainedDefault = 4000000L
  val SampleRowsDefault = 4096L
}

/** The bounded per-key heap pass shared by the partial and final phases:
  * one LinkedHashMap of k+1-capacity max-heaps (head = worst retained
  * row), hot keys cost nothing beyond their k retained rows. Tracks
  * `seen`/`retained` so callers can bail when retention stops being a
  * reduction. */
private[plans] final class TopKHeaps(
    kLocal: Int, partExprs: Seq[Expression],
    sortOrder: Seq[SortOrder], childOutput: Seq[Attribute]) {

  private val keyProj = UnsafeProjection.create(partExprs, childOutput)
  private[plans] val ord = GenerateOrdering.generate(
    sortOrder.map(BindReferences.bindReference(_, childOutput)))
  private val cmp = new java.util.Comparator[InternalRow] {
    override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
  }
  private[plans] val heaps =
    new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
  var seen = 0L
  var retained = 0L

  def insert(row: InternalRow): Unit = {
    seen += 1
    val key = keyProj(row)
    var pq = heaps.get(key)
    if (pq == null) {
      pq = new java.util.PriorityQueue[InternalRow](kLocal + 1, cmp)
      heaps.put(key.copy(), pq)
    }
    if (pq.size() < kLocal) {
      pq.add(row.copy())
      retained += 1
    } else if (ord.compare(row, pq.peek()) < 0) {
      pq.poll(); pq.add(row.copy())
    }
  }

  /** Retained rows, heap order (callers re-rank). */
  def retainedIterator: Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
  }

  /** Retained rows ranked 1..k per key (drains the heaps). */
  def rankedIterator(rnAttr: Attribute): Iterator[InternalRow] = {
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
  * input partition.
  *
  * Data-sized keys (r19 verdict item 1): after `partialSampleRows`
  * rows, a distinct-keys/seen ratio above 1/2 means nearly every row is
  * its own key and the pre-pass cannot reduce the shuffle — abandon the
  * heaps and PASS THROUGH (emit what is held, then stream the rest
  * untouched; the final phase re-ranks, so this is always correct). An
  * absolute `maxRetained` cap backstops inputs whose retention only
  * degrades late. */
case class TopKPerKeyPartialExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  // no required distribution — this phase runs wherever the child is
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "passThroughParts" -> SQLMetrics.createMetric(sparkContext,
      "partitions bailed to pass-through (data-sized keys)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val sampleRows = conf.getConfString(
      TopKConf.SampleRowsKey, TopKConf.SampleRowsDefault.toString).toLong
    val maxRetained = conf.getConfString(
      TopKConf.MaxRetainedKey, TopKConf.MaxRetainedDefault.toString).toLong
    val passThroughParts = longMetric("passThroughParts")
    child.execute().mapPartitions({ it =>
      val h = new TopKHeaps(kLocal, partExprs, sortOrder, childOutput)
      var bail = false
      while (it.hasNext && !bail) {
        h.insert(it.next())
        // keys/seen — not retained/seen — is the discriminator: a
        // few-keys × large-k partition legitimately retains its whole
        // sample prefix while the heaps fill, but its KEY count
        // plateaus immediately; only data-sized keys track `seen`.
        bail = (h.seen >= sampleRows && h.heaps.size().toLong * 2 > h.seen) ||
          h.retained > maxRetained
      }
      if (bail && it.hasNext) {
        passThroughParts += 1
        h.retainedIterator ++ it // final phase re-ranks; no copies for the rest
      } else {
        // a bail decision landing on the partition's LAST row passed
        // nothing through — the output is identical to the no-bail
        // outcome, so the metric must not count it (r20 review)
        h.retainedIterator
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
  // on the heap path; the spill fallback sorts ONLY the partitions whose
  // retention tripped the cap.

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "spilledParts" -> SQLMetrics.createMetric(sparkContext,
      "partitions handed to the spilling sort (retention cap hit)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val sortOrder = order
    val rn = rnAttr
    val maxRetained = conf.getConfString(
      TopKConf.MaxRetainedKey, TopKConf.MaxRetainedDefault.toString).toLong
    val spilledParts = longMetric("spilledParts")
    child.execute().mapPartitions ({ it =>
      val h = new TopKHeaps(kLocal, partExprs, sortOrder, childOutput)
      var overflow = false
      while (it.hasNext && !overflow) {
        h.insert(it.next())
        overflow = h.retained > maxRetained
      }
      if (!overflow) {
        h.rankedIterator(rn)
      } else {
        // Data-sized keys: retained-equals-output is no longer a memory
        // bound. Hand the partition to the spilling external sorter on
        // (keys, order) and stream row_number off the grouped runs —
        // the WindowExec shape, paid only where the heap posture broke.
        spilledParts += 1
        val schema = StructType(childOutput.map(a =>
          StructField(a.name, a.dataType, a.nullable)))
        val fullOrd = GenerateOrdering.generate(
          (partExprs.map(SortOrder(_, Ascending)) ++ sortOrder)
            .map(BindReferences.bindReference(_, childOutput)))
        val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
          : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            p.value = 0L; p.isNull = false; p
          }
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, fullOrd, PrefixComparators.LONG, prefixComputer,
          4L * 1024 * 1024, false)
        Option(TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => sorter.cleanupResources()))
        val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
        // Drain each heap INTO the sorter as it is consumed and drop it
        // immediately: copying all retained rows first and clearing after
        // would transiently hold ~2× maxRetained (heap copies + sorter
        // pages) at exactly the memory-pressure moment the spill exists
        // to relieve; this bounds the overlap to one queue (r20 review).
        val heapIt = h.heaps.values().iterator()
        while (heapIt.hasNext) {
          val pq = heapIt.next()
          while (!pq.isEmpty) sorter.insertRow(toUnsafe(pq.poll()))
          heapIt.remove()
        }
        while (it.hasNext) sorter.insertRow(toUnsafe(it.next()))
        val keyProj = UnsafeProjection.create(partExprs, childOutput)
        val outProj = UnsafeProjection.create(childOutput :+ rn, childOutput :+ rn)
        val rnRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        var curKey: UnsafeRow = null
        var rank = 0
        sorter.sort().flatMap { row =>
          val key = keyProj(row)
          if (curKey == null || key != curKey) {
            curKey = key.copy(); rank = 1
          } else {
            rank += 1
          }
          if (rank <= kLocal) {
            rnRow.setInt(0, rank)
            Some(outProj(joined(row, rnRow)))
          } else None
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
