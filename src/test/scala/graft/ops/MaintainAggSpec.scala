package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retractable incremental aggregate maintenance: hand-checked
  * insert/delete/vanish/new-key cases, exact decimal cancellation,
  * over-retraction visibility, differential equivalence with a scratch
  * recompute, and the manifest change-capture feed. */
class MaintainAggSpec extends SparkSpec {

  import spark.implicits._

  private def state(rows: (String, Long, java.math.BigDecimal)*): DataFrame =
    rows.toDF("k", "cnt", "sum_v")

  private def dec(s: String) = new java.math.BigDecimal(s).setScale(2)

  private def changes(rows: (String, String, Long)*): DataFrame =
    rows.map { case (k, v, op) => (k, dec(v), op) }.toDF("k", "v", "op")

  test("insert, retract, vanish, and brand-new key in one refresh") {
    val st = state(("a", 2L, dec("10.50")), ("b", 1L, dec("3.25")))
    val ch = changes(
      ("a", "2.00", 1L),   // a: 3 rows, 12.50
      ("b", "3.25", -1L),  // b: emptied, vanishes
      ("d", "7.00", 1L))   // d: created by the delta
    val got = Merge.maintainAgg(st, ch, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString))).toMap
    assert(got.keySet == Set("a", "d"), s"b must vanish: ${got.keySet}")
    assert(got("a") == ((3L, "12.5")))
    assert(got("d") == ((1L, "7")))
  }

  test("retractions cancel decimal sums exactly") {
    val st = state(("a", 3L, dec("0.30")))
    // three 0.10 retractions: floats would leave ~1e-17 residue
    val ch = changes(("a", "0.10", -1L), ("a", "0.10", -1L), ("a", "0.10", -1L))
    assert(Merge.maintainAgg(st, ch, Seq("k"), Seq("v")).isEmpty,
      "count and decimal sum both reach exactly zero")
  }

  test("over-retraction stays visible as a negative count, never clamped") {
    val st = state(("a", 1L, dec("5.00")))
    val ch = changes(("a", "5.00", -1L), ("a", "5.00", -1L))
    val got = Merge.maintainAgg(st, ch, Seq("k"), Seq("v")).collect()
    assert(got.length == 1 && got(0).getLong(1) == -1L,
      "corrupted CDC must surface, not disappear")
  }

  test("differential: maintained view equals scratch recompute on seeded data") {
    val rnd = new scala.util.Random(7)
    val baseRows = (1 to 400).map(i =>
      (s"k${rnd.nextInt(20)}", dec(s"${rnd.nextInt(1000)}.${10 + rnd.nextInt(90)}"), i))
    val base = baseRows.toDF("k", "v", "row_id")
    val st = base.groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
    val dels = base.filter($"row_id" % 3 === 0)
      .select($"k", $"v").withColumn("op", lit(-1L))
    val ins = (1 to 100).map(i =>
      (s"k${rnd.nextInt(25)}", dec(s"${rnd.nextInt(1000)}.50"))).toDF("k", "v")
      .withColumn("op", lit(1L))
    val maintained = Merge.maintainAgg(st, dels.unionByName(ins), Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros))).toMap
    val scratch = base.filter($"row_id" % 3 =!= 0).select($"k", $"v")
      .unionByName(ins.select($"k", $"v"))
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros))).toMap
    assert(maintained == scratch, "delta refresh must equal full recompute")
  }

  test("manifest change capture feeds the refresh: appended files as inserts") {
    val dir = java.nio.file.Files.createTempDirectory("maintain-agg-").toString
    val v0 = Seq(("a", dec("1.00")), ("b", dec("2.00"))).toDF("k", "v")
    v0.repartition(1).write.mode("overwrite").parquet(dir)
    val v1 = TableManifest.init(spark, dir)
    val st = TableManifest.readTable(spark, dir)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .localCheckpoint() // pin the pre-append state
    // append a new data file and commit it as the next version
    val add = Seq(("a", dec("4.00")), ("c", dec("9.00"))).toDF("k", "v")
    val tmp = java.nio.file.Files.createTempDirectory("maintain-add-").toString
    add.repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val target = new java.io.File(dir, s"added-${part.getName}")
    java.nio.file.Files.copy(part.toPath, target.toPath)
    val head = TableManifest.read(spark, dir).get
    TableManifest.commitIf(spark, dir, head._2 :+ target.getName, v1)
    val inserts = TableManifest.addedBetween(spark, dir, v1, v1 + 1)
      .withColumn("op", lit(1L))
    val got = Merge.maintainAgg(st, inserts, Seq("k"), Seq("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString))).toMap
    assert(got == Map("a" -> ((2L, "5")), "b" -> ((1L, "2")), "c" -> ((1L, "9"))),
      s"got $got")
  }
}
