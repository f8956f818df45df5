package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast,
  Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression,
  RowNumber, SortOrder, SpecifiedWindowFrame, UnsafeProjection,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Whole-operator extension: top-k-per-key.
  *
  * The declarative form every ranked query in this library uses —
  * `row_number().over(Window.partitionBy(keys).orderBy(ord))` followed by
  * `filter(rnk <= k)` — plans as WindowExec, which requires a FULL SORT of
  * every key group (Exchange + SortExec + windowed rank) even though only
  * k rows per key survive. At 100 TB that sort is the dominant cost of
  * per-group curation (`text_top_quality_by_lang`, the ANN reranks).
  *
  * [[RewriteWindowTopK]] (a `Rule[LogicalPlan]`) recognizes the pattern
  * and replaces it with the [[TopKPerKey]] logical operator;
  * [[TopKStrategy]] (a `SparkStrategy`) plans [[TopKPerKeyExec]], which
  * keeps a bounded heap of k rows per key — O(n log k) comparisons, O(#keys
  * × k) memory, NO sort, and the same single hash Exchange on the keys
  * (`requiredChildDistribution = ClusteredDistribution(keys)`).
  *
  * Registration: `GraftExtensions` injects both via
  * `SparkSessionExtensions` (`spark.sql.extensions` deployment path);
  * `TopKPlanning.register(spark)` wires an existing session through the
  * public `spark.experimental` hooks. The rewrite is semantics-preserving
  * (`TopKPerKeySpec` pins plan shape AND result equality against the
  * window form), only row order within the result differs.
  */

/** Logical top-k-per-key: child rows grouped by `partitionExprs`, the k
  * smallest under `orderSpec` kept per group, rank (1..k) appended as
  * `rankAttr`. */
case class TopKPerKey(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Rewrites `Filter(rnk <= k, Window(row_number() as rnk))` (with an
  * optional Cast around the row_number) into [[TopKPerKey]]. Conservative:
  * fires only on the exact single-window-expression, default-frame,
  * ordered pattern with a foldable positive bound, so it can be registered
  * session-wide. */
object RewriteWindowTopK extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** The alias must be row_number() over the default running frame,
    * optionally cast (int → long keeps rank values identical). */
  private def isRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(Cast(we: WindowExpression, LongType, _, _), _) => isRowNumberWin(we)
    case Alias(we: WindowExpression, _) => isRowNumberWin(we)
    case _ => false
  }

  private def isRowNumberWin(we: WindowExpression): Boolean = we match {
    case WindowExpression(RowNumber(),
        WindowSpecDefinition(_, order, _: SpecifiedWindowFrame)) =>
      // row_number's frame is fixed (rows unbounded-preceding..current);
      // an ordered spec is required for a deterministic rank
      order.nonEmpty
    case _ => false
  }

  /** Tightest rank upper bound implied by any conjunct of the filter:
    * `rnk <= k`, `rnk < k`, `rnk = k`, and the reversed forms. The
    * original filter stays on top as a residual, so ANY condition that
    * bounds the rank (argmax `rnk = 1`, `rnk <= 3 AND lang = 'en'`, …)
    * benefits — top-k prunes, the residual re-checks for free. */
  private def bound(cond: Expression, rank: Attribute): Option[Int] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, GreaterThan,
      GreaterThanOrEqual, LessThan, LessThanOrEqual}
    def lit(e: Expression): Option[Long] = e match {
      case Literal(i: Int, IntegerType) => Some(i.toLong)
      case Literal(l: Long, LongType) => Some(l)
      case _ => None
    }
    def one(c: Expression): Option[Long] = c match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rank) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rank) => lit(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rank) => lit(l)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rank) => lit(l)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rank) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rank) => lit(l).map(_ - 1)
      case _ => None
    }
    val bounds = splitConjunctivePredicates(cond).flatMap(one)
    if (bounds.isEmpty) None
    else Some(bounds.min.min(Int.MaxValue).toInt)
  }

  /** Spark's own InferWindowGroupLimit (3.5+) may already have inserted a
    * WindowGroupLimit under the Window — a sorted partial/final limit that
    * still fully sorts every input partition. The bounded heap subsumes
    * it, so strip any chain of them from the child. */
  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
      stripGroupLimit(wgl.child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias: NamedExpression), partitionSpec, orderSpec, child, _))
        if isRowNumber(alias) =>
      val rankAttr = alias.toAttribute
      bound(cond, rankAttr) match {
        case Some(k) if k >= 1 =>
          // keep the full condition as a residual: for the bare `rnk <= k`
          // it passes everything top-k emits; for conjunctions it applies
          // the remaining predicates
          Filter(cond,
            TopKPerKey(partitionSpec, orderSpec, k, rankAttr, stripGroupLimit(child)))
        case _ => f
      }
  }
}

/** Plans [[TopKPerKey]] as [[TopKPerKeyExec]]. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(pe, os, k, rank, child) =>
      TopKPerKeyExec(pe, os, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. One hash map of per-key heaps per input
  * partition (the required clustering puts each key in exactly one
  * partition); each heap holds at most k row copies. */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of distinct keys"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rankIsLong = rankAttr.dataType == LongType
    val numOutputRows = longMetric("numOutputRows")
    val numKeys = longMetric("numKeys")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partitionExprs, child.output)
      val ord = GenerateOrdering.generate(orderSpec, child.output)
      // scala PriorityQueue dequeues the MAX first → the heap root is the
      // worst retained row; a new row replaces it iff strictly better
      val heaps = new java.util.HashMap[InternalRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next().copy()
        val key = keyProj(row).copy()
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          heaps.put(key, heap)
        }
        if (heap.size < k) heap.enqueue(row)
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row)
        }
      }
      import scala.jdk.CollectionConverters._
      numKeys += heaps.size()
      heaps.values().iterator().asScala.flatMap { heap =>
        val ascending = heap.dequeueAll.reverseIterator
        ascending.zipWithIndex.map { case (row, i) =>
          val rank: Any = if (rankIsLong) (i + 1).toLong else i + 1
          numOutputRows += 1
          new JoinedRow(row, new GenericInternalRow(Array[Any](rank)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Wires the rewrite + strategy into an EXISTING session via the public
  * `spark.experimental` hooks (idempotent). The session-build path is
  * `GraftExtensions` (`spark.sql.extensions`). */
object TopKPlanning {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  def unregister(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteWindowTopK)
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies.filterNot(_ == TopKStrategy)
  }
}
