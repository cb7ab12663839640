package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("morton key matches hand-computed small values") {
    import spark.implicits._
    val out = Seq((1L, 0L), (0L, 1L), (1L, 1L), (2L, 2L), (3L, 5L))
      .toDF("a", "b")
      .withColumn("z", Layout.mortonKey(col("a"), col("b")))
      .collect().map(_.getLong(2)).toSeq
    // z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12, z(3,5)=0b100111=39
    assert(out == Seq(1L, 2L, 3L, 12L, 39L))
  }

  test("morton encode/decode round-trips 31-bit coordinates") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val pairs = Seq.fill(500)((rnd.nextLong(1L << 31), rnd.nextLong(1L << 31)))
    val df = pairs.toDF("a", "b")
      .withColumn("z", Layout.mortonKey(col("a"), col("b")))
    val (da, db) = Layout.mortonDecode(col("z"))
    val bad = df.select(col("a"), col("b"), da.as("ra"), db.as("rb"))
      .filter(col("a") =!= col("ra") || col("b") =!= col("rb"))
    assert(bad.count() == 0)
    // and all keys are non-negative (31-bit inputs never reach the sign bit)
    assert(df.filter(col("z") < 0).count() == 0)
  }

  test("3-D and 4-D morton keys round-trip and interleave disjoint bit lanes") {
    import spark.implicits._
    val rnd = new scala.util.Random(3L)
    val triples = Seq.fill(300)(
      (rnd.nextLong(1L << 21), rnd.nextLong(1L << 21), rnd.nextLong(1L << 21)))
    val df3 = triples.toDF("a", "b", "c")
      .withColumn("z", Layout.mortonKey3(col("a"), col("b"), col("c")))
    val (ra, rb, rc) = Layout.mortonDecode3(col("z"))
    assert(df3.filter(col("a") =!= ra || col("b") =!= rb || col("c") =!= rc)
      .count() == 0)
    // hand value: a=1,b=0,c=0 → z=1; a=0,b=1 → z=2; a=0,b=0,c=1 → z=4
    val h = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (1L, 1L, 1L))
      .toDF("a", "b", "c")
      .select(Layout.mortonKey3(col("a"), col("b"), col("c")))
      .collect().map(_.getLong(0)).toSeq
    assert(h == Seq(1L, 2L, 4L, 7L))

    val quads = Seq.fill(300)((rnd.nextLong(1L << 16), rnd.nextLong(1L << 16),
      rnd.nextLong(1L << 16), rnd.nextLong(1L << 16)))
    val df4 = quads.toDF("a", "b", "c", "d")
      .withColumn("z", Layout.mortonKey4(col("a"), col("b"), col("c"), col("d")))
    val (qa, qb, qc, qd) = Layout.mortonDecode4(col("z"))
    assert(df4.filter(
      col("a") =!= qa || col("b") =!= qb || col("c") =!= qc || col("d") =!= qd)
      .count() == 0)
  }

  test("z-order clustered files prune a 2-D box predicate; shuffled files do not") {
    import spark.implicits._
    import org.apache.spark.sql.execution.FileSourceScanExec
    // 256x256 grid, one point per cell
    val pts = spark.range(1L << 16).select(
      (col("id") % 256).as("x"),
      expr("id DIV 256").as("y"),
      col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft-skip").toString
    // repartitionByRange boundaries come from a 100-rows-per-partition
    // reservoir sample by default — sloppy boundaries let the box straddle
    // an extra file run-to-run (the historical flake in this test). A big
    // sample makes the quantiles near-exact, so each output file is ~4096
    // contiguous z-codes and the assertions below are deterministic.
    val sampleKey = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prevSample = spark.conf.getOption(sampleKey)
    spark.conf.set(sampleKey, "20000")
    try Layout.writeClustered(pts, "x", "y", numFiles = 16, s"$base/clustered")
    finally prevSample match {
      case Some(v) => spark.conf.set(sampleKey, v)
      case None => spark.conf.unset(sampleKey)
    }
    pts.repartition(16).write.mode("overwrite").parquet(s"$base/shuffled")

    def scanDecodedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("x") < 32 && col("y") < 32)
      assert(df.collect().length == 32 * 32)
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val clustered = scanDecodedRows(s"$base/clustered")
    val shuffled = scanDecodedRows(s"$base/shuffled")
    // clustered: the 1024-cell box lives in one narrow z-range file whose
    // row-group stats admit it; every other file's x- or y-stats exclude it.
    // shuffled: every file spans the full (x, y) range → nothing prunes.
    // Relative bound: repartitionByRange samples its boundaries, so one
    // extra row group can straddle the box run-to-run; what matters is the
    // order-of-magnitude skipping vs the unclustered layout.
    assert(clustered * 6 < shuffled,
      s"clustered scan decoded $clustered rows vs shuffled $shuffled — " +
        "expected >6x row-group skipping from the z-order layout")
    // absolute backstop, tighter than what the relative bound already
    // implies (clustered < 65536/6 ≈ 10923): the 1024-cell box fits one
    // 4096-row file, so even with one straddling file the clustered scan
    // must stay within 2 files' worth
    assert(clustered <= 8192,
      s"clustered scan decoded $clustered rows — z-order skipping regressed")
    assert(shuffled >= 60000, s"shuffled scan should decode ~all rows, got $shuffled")
  }

  test("range-partitioning by zkey gives disjoint per-partition key ranges") {
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    val df = Seq.fill(2000)((rnd.nextLong(1024), rnd.nextLong(1024)))
      .toDF("a", "b")
      .withColumn("z", Layout.mortonKey(col("a"), col("b")))
      .repartitionByRange(4, col("z"))
    val ranges = df
      .groupBy(spark_partition_id().as("p"))
      .agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping zkey ranges: $hi1 > $lo2")
      case _ =>
    }
  }
}
