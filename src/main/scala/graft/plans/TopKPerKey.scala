package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graft.DatasetBridge
import org.apache.spark.sql.types.IntegerType

import scala.collection.mutable

/** Exact top-k-per-key as a first-class operator: logical node + planner
  * strategy + physical exec (the (c) rung of the extension ladder —
  * SURVEY.md §2.10 / builder brief).
  *
  * Semantics are identical to
  * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`
  * for a *total* ordering — but the physical plan keeps a size-k bounded
  * heap per key instead of sorting whole partitions the way `WindowExec`
  * must: per-partition memory is O(#keys·k) rows rather than O(partition),
  * and spill pressure disappears for small k.
  *
  * Memory safety: both stages run under a hard held-row budget
  * (`graft.topk.budgetRows` SQL conf, default 2^20). The partial stage
  * flushes-and-resets past the budget (output is a candidate superset —
  * still correct); the final stage falls back to an external sort-merge
  * rank ([[TopKSpill]]) so near-unique keys complete in O(budget) memory.
  */
object TopKPerKey {

  /** Sort key: column name + direction (desc=true ⇒ descending). */
  case class Order(name: String, desc: Boolean = false)

  /** DataFrame API: rank rows per key, keep ranks 1..k (rank column
    * appended as `rankName`). Ordering must be total for deterministic
    * output — add a unique tie-break column, as with any window rank.
    * Keys/order are resolved eagerly against the analyzed child (Spark 4
    * Column nodes don't resolve inside foreign logical nodes). */
  def apply(
      df: DataFrame,
      keys: Seq[String],
      order: Seq[Order],
      k: Int,
      rankName: String = "rn"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(keys.nonEmpty && order.nonEmpty, "keys and order must be non-empty")
    val spark = df.sparkSession
    // register the planner strategy (synchronized: the read-modify-write on
    // extraStrategies is not atomic; a duplicate would only waste planner
    // work, but there is no reason to allow one)
    TopKPerKey.synchronized {
      if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[TopKStrategy]))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ new TopKStrategy
    }
    val analyzed = df.queryExecution.analyzed
    // session-conf resolver: case-insensitive by default, and ambiguity is
    // an error rather than a silent first-match bind
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute =
      analyzed.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.mkString(", ")}")
      }
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    val plan = TopKPerKeyNode(
      keys.map(attr),
      order.map(o => SortOrder(attr(o.name), if (o.desc) Descending else Ascending)),
      k,
      AttributeReference(rankName, IntegerType, nullable = false)(),
      analyzed)
    DatasetBridge.ofRows(spark, plan)
  }
}

case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      // map-side partial top-k below the exchange: each input partition
      // forwards at most k rows per key, so the shuffle moves ≤ k·keys·parts
      // rows instead of everything (the aggregate partial/final pattern,
      // applied to ranking)
      val budget = org.apache.spark.sql.internal.SQLConf.get.getConfString(
        "graft.topk.budgetRows", TopKHeaps.DefaultBudgetRows.toString).toInt
      TopKPerKeyExec(keys, order, k, rankAttr, budget,
        TopKPartialExec(keys, order, k, budget, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded per-key heap accumulation with a hard memory budget.
  *
  * Both exec nodes hold at most `budgetRows` copied rows in heaps. What
  * happens past the budget differs by stage:
  *  - partial stage ([[TopKPartialExec]]): flush-and-reset. Emitting the
  *    current heaps and starting fresh is correct because partial output is
  *    only a *candidate superset* — the final stage re-ranks. Degrades
  *    gracefully toward "forward everything" (stock-window shuffle volume)
  *    as key cardinality approaches partition size.
  *  - final stage ([[TopKPerKeyExec]]): external sort-based ranking. Heap
  *    contents (a provably rank-safe subset: every dropped row was beaten
  *    by k better rows of its key) plus the remaining input are spilled to
  *    sorted local chunk files keyed by the UnsafeProjection key bytes, then
  *    k-way merged; ranks stream out of the merge with O(budget) memory.
  */
private[plans] object TopKHeaps {

  /** Default per-task row budget (heap rows, not bytes). Override with the
    * SQL conf `graft.topk.budgetRows` (read at planning time). */
  val DefaultBudgetRows: Int = 1 << 20

  private type Heaps = mutable.LinkedHashMap[InternalRow, mutable.PriorityQueue[InternalRow]]

  private def accumulate(
      row: InternalRow,
      heaps: Heaps,
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      k: Int,
      heldRows: Long): Long = {
    // probe with the reused projection row; copy the key only on a miss
    val probe = keyProj(row)
    val heap = heaps.get(probe) match {
      case Some(h) => h
      case None =>
        val h = mutable.PriorityQueue.empty[InternalRow](ordering)
        heaps.put(probe.copy(), h)
        h
    }
    if (heap.size < k) { heap.enqueue(row.copy()); heldRows + 1 }
    else if (ordering.compare(row, heap.head) < 0) {
      heap.dequeue()
      heap.enqueue(row.copy())
      heldRows
    } else heldRows
  }

  private def drain(heaps: Heaps): Iterator[Seq[InternalRow]] =
    heaps.valuesIterator.map { heap =>
      val worstFirst: Seq[InternalRow] = heap.dequeueAll
      worstFirst.reverse
    }

  /** Partial-stage accumulation: per-key top-k heaps, flushed whenever the
    * held-row budget is hit (each flush is a correct candidate superset). */
  def partialTopK(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      childOutput: Seq[Attribute],
      k: Int,
      budgetRows: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val ordering = GenerateOrdering.generate(order, childOutput)
    val budget = math.max(budgetRows, k).toLong
    var heaps: Heaps = mutable.LinkedHashMap.empty
    var held = 0L
    val chunks = new Iterator[Iterator[InternalRow]] {
      override def hasNext: Boolean = iter.hasNext || heaps.nonEmpty
      override def next(): Iterator[InternalRow] = {
        while (iter.hasNext && held < budget)
          held = accumulate(iter.next(), heaps, keyProj, ordering, k, held)
        val out = drain(heaps).flatten
        heaps = mutable.LinkedHashMap.empty
        held = 0L
        out
      }
    }
    chunks.flatten
  }

  /** Final-stage accumulation: exact per-key top-k with ranks. Stays on the
    * heap fast path while the budget holds; switches to an external
    * sort-merge past it. */
  def finalTopK(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      childOutput: Seq[Attribute],
      k: Int,
      budgetRows: Int): Iterator[(InternalRow, Int)] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val ordering = GenerateOrdering.generate(order, childOutput)
    val budget = math.max(budgetRows, k).toLong
    val heaps: Heaps = mutable.LinkedHashMap.empty
    var held = 0L
    var overflow = false
    while (iter.hasNext && !overflow) {
      held = accumulate(iter.next(), heaps, keyProj, ordering, k, held)
      overflow = held >= budget && iter.hasNext
    }
    if (!overflow) {
      drain(heaps).flatMap(_.iterator.zipWithIndex.map { case (r, i) => (r, i + 1) })
    } else {
      // rank-safe: heap contents are each key's best-so-far; dropped rows
      // were beaten by ≥ k better rows of the same key, so the spill input
      // still contains every true top-k row with its true rank
      TopKSpill.sortedRank(
        drain(heaps).flatten ++ iter, keyProj, ordering, childOutput, k,
        math.max(budgetRows, k))
    }
  }
}

/** External sort-merge fallback for [[TopKHeaps.finalTopK]]: chunks of at
  * most `chunkRows` rows are sorted by (key bytes, order) and spilled to
  * local temp files; a loser-tree-style priority-queue merge streams rows
  * grouped by key, emitting ranks 1..k per key group. Key equality uses the
  * UnsafeProjection byte image (deterministic per value), so byte-order is
  * an arbitrary-but-consistent grouping order — semantic key order is not
  * required, only that equal keys are adjacent. */
private[plans] object TopKSpill {

  private final case class Spilled(file: java.io.File, rows: Int)

  def sortedRank(
      input: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: Ordering[InternalRow],
      childOutput: Seq[Attribute],
      k: Int,
      chunkRows: Int): Iterator[(InternalRow, Int)] = {
    val numFields = childOutput.size
    val toUnsafe = UnsafeProjection.create(
      childOutput.map(_.asInstanceOf[Expression]), childOutput)

    // total per-row comparator: key bytes, then the rank ordering
    def cmp(a: (Array[Byte], InternalRow), b: (Array[Byte], InternalRow)): Int = {
      val c = java.util.Arrays.compareUnsigned(a._1, b._1)
      if (c != 0) c else ordering.compare(a._2, b._2)
    }

    val files = mutable.ArrayBuffer.empty[Spilled]
    val buf = mutable.ArrayBuffer.empty[(Array[Byte], InternalRow)]
    def flush(): Unit = if (buf.nonEmpty) {
      val sorted = buf.sortWith(cmp(_, _) < 0)
      // spill to Spark's configured local scratch dirs, not java.io.tmpdir:
      // on clusters /tmp is commonly a small tmpfs while the shuffle disks
      // are where SPARK_LOCAL_DIRS / LOCAL_DIRS (YARN, K8s) point — those
      // env overrides beat spark.local.dir, so resolution goes through
      // Utils.getLocalDir (via LocalDirBridge), the same path Spark's own
      // spill code uses; the near-unique-keys case this fallback exists
      // for would otherwise fill /tmp and die on ENOSPC
      val dir = new java.io.File(
        org.apache.spark.sql.graft.LocalDirBridge.scratchDir())
      val f = java.io.File.createTempFile("graft-topk-", ".spill", dir)
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        new java.io.FileOutputStream(f), 1 << 16))
      try {
        sorted.foreach { case (kb, row) =>
          val u = row.asInstanceOf[org.apache.spark.sql.catalyst.expressions.UnsafeRow]
          val rb = u.getBytes
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(rb.length); out.write(rb)
        }
      } finally out.close()
      files += Spilled(f, sorted.length)
      buf.clear()
    }

    input.foreach { row =>
      val u = toUnsafe(row).copy()
      buf += ((keyProj(u).copy().getBytes, u))
      if (buf.length >= chunkRows) flush()
    }
    flush()

    final class ChunkIter(s: Spilled) {
      private val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(s.file), 1 << 16))
      private var remaining = s.rows
      private var closed = false
      var head: (Array[Byte], InternalRow) = _
      def close(): Unit = if (!closed) { closed = true; in.close() }
      def advance(): Boolean =
        if (remaining == 0) { close(); head = null; false }
        else {
          val kb = new Array[Byte](in.readInt()); in.readFully(kb)
          val rb = new Array[Byte](in.readInt()); in.readFully(rb)
          val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(numFields)
          row.pointTo(rb, rb.length)
          head = (kb, row)
          remaining -= 1
          true
        }
    }

    val pq = mutable.PriorityQueue.empty[ChunkIter](
      Ordering.fromLessThan[ChunkIter]((x, y) => cmp(x.head, y.head) > 0))
    val iters = mutable.ArrayBuffer.empty[ChunkIter]
    files.foreach { s =>
      val c = new ChunkIter(s); iters += c; if (c.advance()) pq.enqueue(c)
    }

    // close every chunk stream (not only exhausted ones — a downstream
    // LIMIT may stop the merge early) and delete the spill files; runs on
    // merge exhaustion and again from the task-completion listener, which
    // is the cleanup authority for partially-consumed iterators
    val cleanup = () => {
      iters.foreach(_.close())
      files.foreach(s => { s.file.delete(); () })
    }
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => cleanup()))

    new Iterator[(InternalRow, Int)] {
      private var curKey: Array[Byte] = null
      private var rank = 0
      private var nextOut: (InternalRow, Int) = null
      private def computeNext(): Unit = {
        nextOut = null
        while (nextOut == null && pq.nonEmpty) {
          val c = pq.dequeue()
          val (kb, row) = c.head
          if (c.advance()) pq.enqueue(c)
          if (curKey == null || java.util.Arrays.compareUnsigned(curKey, kb) != 0) {
            curKey = kb; rank = 1
          } else rank += 1
          if (rank <= k) nextOut = (row, rank)
        }
        if (nextOut == null) cleanup()
      }
      computeNext()
      override def hasNext: Boolean = nextOut != null
      override def next(): (InternalRow, Int) = {
        val r = nextOut; computeNext(); r
      }
    }
  }
}

/** Pre-shuffle pruning: emits each input partition's local top-k per key
  * (no rank — ranks are only meaningful after the final merge). */
case class TopKPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    budgetRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk, budget) = (keys, order, k, budgetRows)
    child.execute().mapPartitions { iter =>
      TopKHeaps.partialTopK(iter, ks, os, childOutput, kk, budget)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    budgetRows: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk, budget) = (keys, order, k, budgetRows)
    val outputLocal = output
    child.execute().mapPartitions { iter =>
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outputLocal, outputLocal)
      TopKHeaps.finalTopK(iter, ks, os, childOutput, kk, budget).map {
        case (r, rank) =>
          rankRow.setInt(0, rank)
          outProj(joined(r, rankRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
