package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The continuous-curation loop, end to end: a raw manifested table
  * receives appends; a consumer tails it (`consumeNew`), dedups each
  * delivery against the persisted band index (`minhashIncrement`), and
  * appends survivors to the curated corpus and their entries to the index
  * — both with RANGE-KEYED file names, so a crashed-and-replayed delivery
  * converges instead of duplicating (the exactly-once recipe the
  * consumeNew scaladoc documents). */
class IncrementalCurationSpec extends SparkSpec {

  import spark.implicits._

  private def newDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Append `df` to manifested `dir` under a DETERMINISTIC file name —
    * replays of the same logical append become no-ops (the name is
    * already listed), which is what makes the at-least-once delivery
    * exactly-once in effect. */
  private def idempotentAppend(dir: String, df: DataFrame, tag: String): Unit = {
    val name = s"append-$tag.parquet"
    val target = new java.io.File(dir, name)
    val head = TableManifest.read(spark, dir)
    if (head.exists(_._2.contains(name))) return // already committed
    if (!target.exists()) {
      val tmp = newDir("cur-tmp-")
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, target.toPath)
    }
    var done = false
    while (!done) {
      val (v, files) = TableManifest.read(spark, dir)
        .getOrElse((0L, Seq.empty[String]))
      done = files.contains(name) ||
        TableManifest.commitIf(spark, dir, files :+ name, v).isDefined
    }
  }

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** One curation turn; `crashAfterEffects` simulates dying after the
    * corpus/index appends but before the consumer marker advances. */
  private def curate(raw: String, corpus: String, index: String,
      crashAfterEffects: Boolean = false): Unit =
    try {
      TableManifest.consumeNew(spark, raw, "curator") { (df, from, to) =>
        val delivery = df.localCheckpoint()
        val idx = TableManifest.read(spark, index) match {
          case Some(_) => TableManifest.readTable(spark, index)
          case None => Dedup.minhashIndexEntries(docsDf()) // empty, typed
        }
        val matched = Dedup.minhashIncrement(delivery, idx)
        val accepted = delivery
          .join(matched.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        idempotentAppend(corpus, accepted, s"$from-$to")
        idempotentAppend(index, Dedup.minhashIndexEntries(accepted),
          s"$from-$to")
        if (crashAfterEffects) sys.error("simulated crash before marker")
      }
      ()
    } catch { case e: RuntimeException if e.getMessage.contains("simulated") => () }

  test("appends curate incrementally; duplicates never reach the corpus") {
    val (raw, corpus, index) = (newDir("raw-"), newDir("corp-"), newDir("idx-"))
    docsDf(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five")
      .repartition(1).write.mode("overwrite").parquet(raw)
    TableManifest.init(spark, raw)
    curate(raw, corpus, index)
    // batch 1: one dup of an indexed doc, one fresh
    idempotentAppend(raw, docsDf(
      10L -> "alpha beta gamma delta epsilon",
      11L -> "totally fresh unique words here"), "b1")
    curate(raw, corpus, index)
    // batch 2: dup of a batch-1 survivor, an internal dup pair, one fresh
    idempotentAppend(raw, docsDf(
      20L -> "totally fresh unique words here",
      21L -> "brand new content appears now",
      22L -> "brand new content appears now"), "b2")
    curate(raw, corpus, index)
    val kept = TableManifest.readTable(spark, corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 11L, 21L), s"curated corpus: $kept")
  }

  test("crash after effects but before the marker: replay converges") {
    val (raw, corpus, index) = (newDir("raw-"), newDir("corp-"), newDir("idx-"))
    docsDf(1L -> "alpha beta gamma delta epsilon")
      .repartition(1).write.mode("overwrite").parquet(raw)
    TableManifest.init(spark, raw)
    curate(raw, corpus, index, crashAfterEffects = true)
    assert(TableManifest.consumerVersion(spark, raw, "curator") == 0L,
      "marker must not advance past the crash")
    curate(raw, corpus, index) // replay of the SAME delivery
    val rows = TableManifest.readTable(spark, corpus)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "alpha beta gamma delta epsilon")),
      s"no duplicates, no loss after replay: $rows")
    // and the loop still works after convergence
    idempotentAppend(raw, docsDf(2L -> "one two three four five"), "b1")
    curate(raw, corpus, index)
    assert(TableManifest.readTable(spark, corpus).count() == 2L)
  }
}
