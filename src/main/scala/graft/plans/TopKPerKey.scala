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
  * Known limit (round-2 item, documented in COVERAGE.md): the heaps do not
  * spill — with near-unique keys, per-partition state approaches the
  * partition size where WindowExec's external sort would spill. Use the
  * stock window plan (or raise partition counts) for high-cardinality keys.
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
      TopKPerKeyExec(keys, order, k, rankAttr,
        TopKPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded per-key heap accumulation. Returns per-key rows,
  * best-first. */
private[plans] object TopKHeaps {
  def topKPerKey(
      iter: Iterator[InternalRow],
      keys: Seq[Expression],
      order: Seq[SortOrder],
      childOutput: Seq[Attribute],
      k: Int): Iterator[Seq[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, childOutput)
    val ordering = GenerateOrdering.generate(order, childOutput)
    // max-heap under `ordering` so the worst kept row is on top
    val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      // probe with the reused projection row; copy the key only on a miss
      val probe = keyProj(row)
      val heap = heaps.get(probe) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ordering)
          heaps.put(probe.copy(), h)
          h
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (ordering.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.map { heap =>
      val worstFirst: Seq[InternalRow] = heap.dequeueAll
      worstFirst.reverse
    }
  }
}

/** Pre-shuffle pruning: emits each input partition's local top-k per key
  * (no rank — ranks are only meaningful after the final merge). */
case class TopKPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk) = (keys, order, k)
    child.execute().mapPartitions { iter =>
      TopKHeaps.topKPerKey(iter, ks, os, childOutput, kk).flatten
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
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (ks, os, kk) = (keys, order, k)
    val outputLocal = output
    child.execute().mapPartitions { iter =>
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outputLocal, outputLocal)
      TopKHeaps.topKPerKey(iter, ks, os, childOutput, kk).flatMap { bestFirst =>
        bestFirst.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setInt(0, i + 1)
          outProj(joined(r, rankRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
