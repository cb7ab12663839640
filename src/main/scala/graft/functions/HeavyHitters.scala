package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra-Gries heavy-hitters sketch as a typed Aggregator: at most `k`
  * counters of bounded memory summarize an arbitrarily long stream, with
  * the classic guarantees after any sequence of reduces and merges over a
  * total of n items (Misra & Gries 1982; mergeability per Agarwal et al.,
  * PODS'12):
  *
  *  - every item with true frequency > n/(k+1) is present in the summary;
  *  - each reported count underestimates the true frequency by at most
  *    n/(k+1) (and never overestimates).
  *
  * Merge-associative partial aggregation: partitions fold locally into k
  * counters, partials merge pairwise by summing counters then subtracting
  * the (k+1)-th largest count from all (the merge-side decrement step) —
  * the map-side-combine shape that makes a top-talkers query one shuffle
  * of O(partitions·k) rows regardless of input size or key cardinality,
  * where an exact groupBy would shuffle every distinct key.
  *
  * The exact twin (full groupBy + count + filter) is the oracle-side
  * verification in `HeavyHittersSpec`; the sketch itself is engine-side
  * only (its counter values depend on merge order, only its guarantees are
  * deterministic).
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[HeavyHitters.Hit]] {
  import HeavyHitters.Hit
  require(k >= 1, s"k must be >= 1: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    // SQL-aggregate convention: nulls carry no information and are skipped.
    // Typed Aggregators do NOT get the declarative null-skip for free — an
    // unguarded null would become a real counter, surface as a reported
    // "heavy hitter" item, and NPE finish's item tie-break ordering.
    if (x == null) m
    else m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None => // decrement-all step: drop counters that reach zero
        m.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (i, c)) =>
      acc.updated(i, acc.getOrElse(i, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      val d = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (i, c) => if (c > d) Some(i -> (c - d)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[Hit] =
    m.toSeq.map { case (i, c) => Hit(i, c) }
      .sortBy(h => (-h.count, h.item))

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[Hit]] =
    ExpressionEncoder[Seq[Hit]]()
}

object HeavyHitters {
  case class Hit(item: String, count: Long)
}
