package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {

  test("connected components: chains, cliques, and singletons-in-pairs resolve to min-id clusters") {
    import spark.implicits._
    // components: {1,2,3,4} (a chain), {10,11,12} (a triangle), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L)).toDF("id_a", "id_b")
    val cc = Cluster.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
    val reps = Cluster.representatives(
      Cluster.connectedComponents(pairs, "id_a", "id_b"))
      .collect().map(_.getLong(0)).toSet
    assert(reps == Set(1L, 10L, 20L))
  }

  test("long path needs multiple propagation rounds and still converges") {
    import spark.implicits._
    // a 30-node path: diameter forces several label-propagation rounds
    val pairs = (0L until 29L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Cluster.connectedComponents(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(cc.length == 30 && cc.forall(_._2 == 0L))
  }

  test("end-to-end: minhash pairs → clusters keep one representative per dup group") {
    import spark.implicits._
    // 3 near-identical variants of one doc + 2 of another + distinct noise
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      1L -> base, 2L -> (base + " x"), 3L -> ("y " + base),
      10L -> "completely different words forming another sentence entirely here now",
      11L -> "completely different words forming another sentence entirely here soon",
      20L -> "unrelated singleton content with no duplicate partner in this corpus")
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs)
    assert(pairs.count() > 0)
    val cc = Cluster.connectedComponents(pairs, "doc_a", "doc_b")
    // every cluster label is itself labeled with that same cluster (fixpoint)
    val bad = cc.as("c").join(cc.as("l"),
      col("c.cluster") === col("l.id") && col("c.cluster") =!= col("l.cluster"))
    assert(bad.count() == 0)
    val reps = Cluster.representatives(cc).collect().map(_.getLong(0)).toSet
    // the {1,2,3} group survives as exactly one representative: doc 1
    assert(reps.contains(1L) && !reps.contains(2L) && !reps.contains(3L))
  }
}
