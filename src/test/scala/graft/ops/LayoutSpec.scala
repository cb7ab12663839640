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
