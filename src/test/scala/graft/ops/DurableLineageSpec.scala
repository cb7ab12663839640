package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The durable-lineage mode of [[Lineage]] (reliable checkpoints + interim
  * persists when the session has a checkpoint dir) must be RESULT-INVISIBLE:
  * every iterated op produces bit-identical output in both modes, the mode
  * is picked purely by config, and the checkpoint dir really gets written
  * (proving the cuts are durable, not silently falling back to
  * executor-local blocks). Recovery semantics documented on [[Lineage]]:
  * interim rounds keep their lineage, so a lost block recomputes from the
  * last reliable checkpoint — the recompute window is < `every` rounds. */
class DurableLineageSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("a", "b")
  }

  /** Run `body` with a reliable checkpoint dir configured, restore the
    * no-dir default after (other suites share the SparkContext). */
  private def withCheckpointDir[A](body: java.io.File => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-durable-ckpt").toFile
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "suite session must start without a checkpoint dir")
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    try body(dir)
    finally {
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
    }
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // random-ish sparse digraph, some dangling sinks, a few hubs
  private def linkGraph(): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 400).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(80).toLong)
    }.distinct.filter { case (s, d) => s != d }.toDF("src", "dst")
  }

  test("pageRank: durable mode is bit-identical and actually writes checkpoints") {
    val g = linkGraph()
    val base = sortedRows(
      Graph.pageRank(g, iters = 9, redistributeDangling = true))
    val durable = withCheckpointDir { dir =>
      val rows = sortedRows(
        Graph.pageRank(g, iters = 9, redistributeDangling = true))
      // 9 iterations → state cuts at i=2,4,6,8 → cuts 4 is the reliable one
      // (every=4); plus the three eager invariant checkpoints
      val written = org.apache.commons.io.FileUtils.listFiles(
        dir, null, true)
      assert(written.size() > 0, "durable mode must write checkpoint files")
      rows
    }
    assert(durable == base, "durable pageRank diverged from default mode")
  }

  test("triangleCount: durable mode is bit-identical") {
    val k4plus = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    val base = Graph.triangleCount(k4plus).collect().head.getLong(0)
    val durable = withCheckpointDir { _ =>
      Graph.triangleCount(k4plus).collect().head.getLong(0)
    }
    assert(durable == base && base == 5L)
  }

  test("connected components: durable mode is bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 200).map { _ =>
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
    }.filter { case (a, b) => a != b }.distinct.toDF("doc_a", "doc_b")
    val base = sortedRows(Cluster.connectedComponents(pairs, "doc_a", "doc_b"))
    val durable = withCheckpointDir { _ =>
      sortedRows(Cluster.connectedComponents(pairs, "doc_a", "doc_b"))
    }
    assert(durable == base, "durable connected components diverged")
  }

  test("coreset + span-dedup fixpoint: durable mode is bit-identical") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextInt(100).toLong))
    }.toDF("vec_id", "qv")
    def coreset() = {
      val (assigned, centers) = Coreset.selectFull(vecs, k = 4)
      (sortedRows(assigned), centers)
    }
    val block = "the same sixty-four character duplicated block appears here verbatim!"
    val docs = Seq(
      (1L, s"alpha $block beta"),
      (2L, s"gamma $block delta"),
      (3L, "clean text with no duplication at all")).toDF("doc_id", "text")
    def fixpoint() = sortedRows(Dedup.cutDuplicatedSpansFixpoint(docs))
    val (baseC, baseF) = (coreset(), fixpoint())
    val (durC, durF) = withCheckpointDir(_ => (coreset(), fixpoint()))
    assert(durC._1 == baseC._1 && durC._2 == baseC._2,
      "durable coreset diverged")
    assert(durF == baseF, "durable span-dedup fixpoint diverged")
  }

  test("cachedView survives losing its blocks (the recoverability claim)") {
    // the property the durability sweep rests on, proven directly: a
    // cachedView's blocks can vanish (executor loss; simulated here by
    // unpersisting the backing RDD) and consumers still compute correct
    // results by recomputing through the intact RDD lineage — exactly
    // where a localCheckpoint would abort with missing-checkpoint blocks
    import spark.implicits._
    import org.apache.spark.sql.functions.{expr, sum}
    val src = (1L to 1000L).toDF("id")
      .groupBy(expr("id % 10").as("k")).agg(sum("id").as("s"))
    val (view, release) =
      org.apache.spark.sql.graft.RddCacheBridge.cachedViewWithRelease(src)
    val before = view.collect().map(_.toString).sorted.toSeq
    release() // all blocks gone
    val after = view.collect().map(_.toString).sorted.toSeq
    assert(after == before, "recompute after block loss diverged")
    assert(before.size == 10)
  }

  test("bpe train + segment: durable mode is bit-identical") {
    import spark.implicits._
    val docs = Seq(
      1L -> "low low low low low lower lowest",
      2L -> "newest newest newer new news",
      3L -> "widest wide widen low newest").toDF("doc_id", "text")
    def run(): (Seq[String], Seq[String]) = {
      val merges = Bpe.train(docs, rounds = 6)
      val table = merges.collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val segmented = Bpe.segment(
        Bpe.wordCounts(docs).selectExpr("word", "cnt", "split(word, '') AS syms"),
        table)
      (sortedRows(merges), sortedRows(segmented))
    }
    val base = run()
    val durable = withCheckpointDir(_ => run())
    assert(durable._1 == base._1, "durable merge table diverged")
    assert(durable._2 == base._2, "durable segmentation diverged")
  }
}
