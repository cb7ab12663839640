package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental consumption of a manifested table: delta-only delivery,
  * durable per-consumer markers, failure re-delivery, independent
  * consumers, and the end-to-end composition with maintainAgg — an
  * incrementally maintained view that tails the table's commits. */
class ConsumeNewSpec extends SparkSpec {

  import spark.implicits._

  private def newTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("consume-").toString
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
      .repartition(1).write.mode("overwrite").parquet(dir)
    TableManifest.init(spark, dir)
    dir
  }

  /** Append one data file holding `rows` and commit it as the next version. */
  private def append(dir: String, rows: (String, Long)*): Long = {
    val tmp = java.nio.file.Files.createTempDirectory("consume-add-").toString
    rows.toDF("k", "v").repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir,
      s"added-${java.util.UUID.randomUUID()}.parquet")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files :+ target.getName, head).get
  }

  test("first consume delivers the snapshot, later consumes only the delta") {
    val dir = newTable()
    var seen = Seq.empty[(String, Long)]
    def sink(df: org.apache.spark.sql.DataFrame, from: Long, to: Long): Unit =
      seen = df.as[(String, Long)].collect().toSeq.sorted
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == Some((0L, 1L)))
    assert(seen == Seq(("a", 1L), ("b", 2L)))
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == None,
      "nothing new: no delivery")
    append(dir, ("c", 3L))
    assert(TableManifest.consumeNew(spark, dir, "c1")(sink) == Some((1L, 2L)))
    assert(seen == Seq(("c", 3L)), "second delivery is the delta only")
  }

  test("a failing processor leaves the marker alone; the range re-delivers") {
    val dir = newTable()
    intercept[RuntimeException] {
      TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) =>
        sys.error("downstream crashed")
      }
    }
    assert(TableManifest.consumerVersion(spark, dir, "c1") == 0L)
    var n = -1L
    TableManifest.consumeNew(spark, dir, "c1") { (df, _, _) => n = df.count() }
    assert(n == 2L, "same range delivered again after the crash")
  }

  test("independent consumers tail at their own pace") {
    val dir = newTable()
    TableManifest.consumeNew(spark, dir, "fast") { (_, _, _) => () }
    append(dir, ("c", 3L))
    var fastRows, slowRows = -1L
    TableManifest.consumeNew(spark, dir, "fast") { (df, _, _) => fastRows = df.count() }
    TableManifest.consumeNew(spark, dir, "slow") { (df, _, _) => slowRows = df.count() }
    assert(fastRows == 1L, "fast consumer sees only the delta")
    assert(slowRows == 3L, "slow consumer starts from the full snapshot")
  }

  test("a delete-only commit advances the marker without a poison delivery") {
    val dir = newTable()
    TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) => () }
    // retention: drop a file from the manifest, adding nothing
    val (head, files) = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, files.tail, head).get
    var called = false
    val got = TableManifest.consumeNew(spark, dir, "c1") { (_, _, _) =>
      called = true
    }
    assert(got == None && !called, "no rows added: nothing to deliver")
    assert(TableManifest.consumerVersion(spark, dir, "c1") == head + 1,
      "marker must advance past the delete-only range, not wedge on it")
    append(dir, ("z", 9L))
    var n = -1L
    TableManifest.consumeNew(spark, dir, "c1") { (df, _, _) => n = df.count() }
    assert(n == 1L, "the next append delivers normally")
  }

  test("maintained view tailing the table equals a scratch recompute") {
    val dir = newTable()
    var state = Seq.empty[(String, Long, Long)].toDF("k", "cnt", "sum_v")
    def refresh(): Unit =
      TableManifest.consumeNew(spark, dir, "view") { (df, _, _) =>
        state = Merge.maintainAgg(state,
          df.withColumn("op", lit(1L)), Seq("k"), Seq("v"))
          .localCheckpoint() // state must survive the source moving on
      }
    refresh()
    append(dir, ("a", 10L), ("c", 5L))
    refresh()
    append(dir, ("c", 7L))
    refresh()
    val got = state.orderBy("k").as[(String, Long, Long)].collect().toSeq
    val want = TableManifest.readTable(spark, dir)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == want, s"maintained $got != recompute $want")
  }
}
