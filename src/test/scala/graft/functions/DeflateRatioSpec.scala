package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compressibility signal: repetitive text compresses far below natural
  * text, random junk barely compresses, and the expression matches a
  * driver-side Deflater byte-for-byte. */
class DeflateRatioSpec extends SparkSpec {

  test("expression equals a driver-side Deflater; edge cases total") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spam spam spam spam spam spam spam spam spam spam",
      "", "x", "日本語のテキストです 日本語のテキストです")
    val got = texts.toDF("text")
      .select(col("text"), DeflateSize.of(col("text")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      val want = DeflateRatioUtil.compressedSize(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(got(t) == want, s"'$t': got ${got(t)}, want $want")
    }
    assert(got("") == 0L)
    // null input → 0, no NPE
    val n = Seq[Option[String]](None).toDF("text")
      .select(DeflateSize.of(col("text"))).collect()(0).getLong(0)
    assert(n == 0L)
  }

  test("ratio separates repetitive, natural, and incompressible text") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val repetitive = "lorem ipsum " * 200
    val natural = ("the union of distributed aggregation and columnar " +
      "execution yields scalable analytics over immutable parquet files " +
      "with pushdown filters and pruned schemas ") * 3
    val junk = Array.fill(2000)((rnd.nextInt(94) + 33).toChar).mkString
    val rows = Seq(("rep", repetitive), ("nat", natural), ("junk", junk))
    val ppm = rows.toDF("k", "text")
      .select(col("k"), DeflateSize.ratioPpm(col("text")).as("ppm"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppm("rep") < 100000L, s"repeated template must crush: $ppm")
    assert(ppm("nat") > ppm("rep") && ppm("nat") < 700000L,
      s"natural text sits in the middle band: $ppm")
    assert(ppm("junk") > 700000L, s"random junk barely compresses: $ppm")
  }

  test("stays inside whole-stage codegen over a real scan") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val plan = docs.select(DeflateSize.ratioPpm(col("text")).as("ppm"))
      .filter(col("ppm") > 0)
    val phys = plan.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    assert(phys.linesIterator.exists(l =>
      l.contains("*(") && l.contains("deflatesize")),
      s"expression must not fence codegen:\n$phys")
    assert(plan.count() > 0)
  }
}
