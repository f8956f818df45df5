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

/** Plans [[TopKPerKey]] as a PARTIAL [[TopKPerKeyExec]] (map-side, no
  * distribution requirement — each input partition keeps at most k rows
  * per key, the ranked-window analogue of partial aggregation) under the
  * FINAL exec (clustered, assigns ranks). The exchange EnsureRequirements
  * inserts between them then carries ≤ k rows per (key, map partition)
  * instead of every candidate row — for the ANN preselect/rerank windows
  * that is the difference between shuffling the full candidate join
  * output and shuffling ≤ k·|keys| rows (guide §2.3: aggregate before
  * you shuffle). When the child is already clustered no exchange is
  * inserted and the partial pass is a cheap no-op re-heap. Final-over-
  * partial top-k selects the identical row set as single-pass top-k:
  * the per-key orderings used here are total (unique tie-break columns),
  * so the k best of a union of per-partition k-bests are the global k
  * best. */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(pe, os, k, rank, child) =>
      TopKPerKeyExec(pe, os, k, rank,
        TopKPerKeyExec(pe, os, k, rank, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per key. One hash map of per-key heaps per input
  * partition (the required clustering puts each key in exactly one
  * partition); each heap holds at most k row copies.
  *
  * Memory contract: retained state is O(min(#keys-in-partition × k,
  * spill threshold)) rows. The intended use is curation-shaped top-k
  * (#keys = languages / strata / tokens), where the state is tiny; for a
  * HIGH-cardinality key (top-k per user), the retained set approaches
  * (#keys × k) = the operator's own output size — so once it exceeds
  * `spark.graft.topk.spillRows` (default 2²¹ rows per partition) the heap
  * map is flushed to a key-sorted run on local disk and rebuilt empty.
  * Runs merge at the end (streaming k-way merge by key bytes; per-key
  * partial heaps re-combine under the same ordering, each ≤ k rows), so
  * peak heap memory stays at the threshold regardless of key cardinality
  * — the same buffered-rows-spill discipline WindowExec gets from
  * ExternalAppendOnlyUnsafeRowArray, adapted to per-key heaps.
  * `TopKSpillSpec` forces a 16-row threshold over a unique key and pins
  * bit-equality with the in-memory path.
  *
  * Output rows are re-projected through `UnsafeProjection` so downstream
  * exchanges / byte-array collectors get the UnsafeRow they assume even
  * when no codegen stage re-projects above this operator. */
case class TopKPerKeyExec(
    partitionExprs: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] =
    if (partial) child.output else child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical
        .UnspecifiedDistribution :: Nil
    else if (partitionExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionExprs) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  override def outputPartitioning = child.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numKeys" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of distinct keys"),
    "spillCount" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of heap-map spills"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rankIsLong = rankAttr.dataType == LongType
    val numOutputRows = longMetric("numOutputRows")
    val numKeys = longMetric("numKeys")
    val spillCount = longMetric("spillCount")
    val spillRows = conf.getConfString("spark.graft.topk.spillRows",
      (1 << 21).toString).toLong
    val kLocal = k
    val childOutput = child.output
    val partExprs = partitionExprs
    val order = orderSpec
    val isPartial = partial
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = GenerateOrdering.generate(order, childOutput)
      val merger = new TopKPartitionMerger(kLocal, ord, rowProj,
        childOutput.size, spillRows, () => spillCount += 1)
      while (iter.hasNext) {
        val row = iter.next()
        merger.insert(keyProj(row), row)
      }
      if (isPartial) {
        // map-side pass: emit the retained rows unranked (order within
        // a key is irrelevant — the final exec re-heaps and ranks)
        merger.result().flatMap { case (_, heap) =>
          numKeys += 1
          heap.iterator.map { row => numOutputRows += 1; row }
        }
      } else {
        val outProj = UnsafeProjection.create(
          childOutput :+ rankAttr, childOutput :+ rankAttr)
        val joined = new JoinedRow
        merger.result().flatMap { case (_, heap) =>
          numKeys += 1
          val ascending = heap.dequeueAll.reverseIterator
          ascending.zipWithIndex.map { case (row, i) =>
            val rank: Any = if (rankIsLong) (i + 1).toLong else i + 1
            numOutputRows += 1
            outProj(joined(row, new GenericInternalRow(Array[Any](rank))))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Per-partition top-k state for [[TopKPerKeyExec]]: an in-memory map of
  * per-key bounded heaps that spills itself to key-sorted runs on local
  * disk when it exceeds `spillRows` retained rows, then streams a k-way
  * merge of the runs plus the final in-memory map. All spilled data is
  * UnsafeRow bytes; temp files delete on JVM exit and eagerly after the
  * merge. */
private[plans] class TopKPartitionMerger(
    k: Int,
    ord: Ordering[InternalRow],
    rowProj: UnsafeProjection,
    numRowFields: Int,
    spillRows: Long,
    onSpill: () => Unit) {

  import org.apache.spark.sql.catalyst.expressions.UnsafeRow

  private type Heap = scala.collection.mutable.PriorityQueue[InternalRow]

  private val heaps = new java.util.HashMap[UnsafeRow, Heap]()
  private var retained = 0L
  private val spills = scala.collection.mutable.ArrayBuffer.empty[java.io.File]

  /** scala PriorityQueue dequeues the MAX first → the heap root is the
    * worst retained row; a new row replaces it iff strictly better. */
  def insert(key: UnsafeRow, row: InternalRow): Unit = {
    var heap = heaps.get(key)
    if (heap == null) {
      val keyCopy = key.copy()
      heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
      heaps.put(keyCopy, heap)
    }
    if (heap.size < k) {
      heap.enqueue(row.copy())
      retained += 1
      if (retained >= spillRows) spill()
    } else if (ord.compare(row, heap.head) < 0) {
      heap.dequeue()
      heap.enqueue(row.copy())
    }
  }

  /** Unsigned-lexicographic byte order (then length) — any total order
    * shared by all runs works; identical keys serialize identically. */
  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def spill(): Unit = {
    if (heaps.isEmpty) return
    onSpill()
    val file = java.io.File.createTempFile("graft-topk-spill", ".bin")
    file.deleteOnExit()
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(file), 1 << 16))
    try {
      import scala.jdk.CollectionConverters._
      val sorted = heaps.entrySet().iterator().asScala.toArray
        .map(e => (e.getKey.getBytes, e.getValue))
      java.util.Arrays.sort(sorted,
        (x: (Array[Byte], Heap), y: (Array[Byte], Heap)) =>
          compareBytes(x._1, y._1))
      for ((keyBytes, heap) <- sorted) {
        out.writeInt(keyBytes.length)
        out.write(keyBytes)
        out.writeInt(heap.size)
        // heap iteration order is arbitrary — fine, the merge re-heaps
        for (row <- heap) {
          val u = rowProj(row)
          out.writeInt(u.getSizeInBytes)
          out.write(u.getBytes)
        }
      }
    } finally out.close()
    spills += file
    heaps.clear()
    retained = 0
  }

  /** One spilled run: a key-sorted stream of (keyBytes, rows ≤ k). */
  private final class Run(file: java.io.File) {
    private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16))
    var currentKey: Array[Byte] = _
    var currentRows: Array[InternalRow] = _
    advance()
    def advance(): Unit = {
      val keyLen = try in.readInt() catch {
        case _: java.io.EOFException => in.close(); file.delete()
          currentKey = null; currentRows = null; return
      }
      currentKey = new Array[Byte](keyLen)
      in.readFully(currentKey)
      val n = in.readInt()
      currentRows = Array.fill(n) {
        val len = in.readInt()
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        val u = new UnsafeRow(numRowFields)
        u.pointTo(bytes, len)
        u
      }
    }
    def exhausted: Boolean = currentKey == null
  }

  /** The per-key heaps, spill-merged if any spill happened. Call exactly
    * once, after the last [[insert]]. */
  def result(): Iterator[(Array[Byte], Heap)] = {
    import scala.jdk.CollectionConverters._
    if (spills.isEmpty) {
      heaps.entrySet().iterator().asScala.map(e => (e.getKey.getBytes, e.getValue))
    } else {
      spill() // the in-memory remainder becomes the final run
      val runs = spills.map(new Run(_)).filterNot(_.exhausted)
      new Iterator[(Array[Byte], Heap)] {
        private val live = scala.collection.mutable.ArrayBuffer(runs.toSeq: _*)
        override def hasNext: Boolean = live.nonEmpty
        override def next(): (Array[Byte], Heap) = {
          // smallest current key across runs; merge every run holding it
          var minKey: Array[Byte] = null
          for (r <- live) {
            if (minKey == null || compareBytes(r.currentKey, minKey) < 0)
              minKey = r.currentKey
          }
          val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
          var i = 0
          while (i < live.length) {
            val r = live(i)
            if (compareBytes(r.currentKey, minKey) == 0) {
              for (row <- r.currentRows) {
                if (heap.size < k) heap.enqueue(row)
                else if (ord.compare(row, heap.head) < 0) {
                  heap.dequeue(); heap.enqueue(row)
                }
              }
              r.advance()
              if (r.exhausted) { live.remove(i); i -= 1 }
            }
            i += 1
          }
          (minKey, heap)
        }
      }
    }
  }
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
