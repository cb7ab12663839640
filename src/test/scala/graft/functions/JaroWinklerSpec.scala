package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Values pinned against DuckDB's jaro_winkler_similarity (the oracle
  * engine), probed on the canonical textbook pairs. */
class JaroWinklerSpec extends SparkSpec {

  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0), // DuckDB convention: empty → 0, not 1
    ("ab", "ba", 0.0),
    ("crate", "trace", 0.7333333333333334),
    ("dwayne", "duane", 0.8400000000000001),
    ("frog", "fog", 0.925),
    ("hello", "hallo", 0.88),
    ("aa", "aaaa", 0.8666666666666667))

  test("matches DuckDB's jaro_winkler_similarity on pinned pairs") {
    import spark.implicits._
    val out = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", JaroWinkler.of(col("a"), col("b")))
      .collect().map(_.getDouble(2))
    cases.zip(out).foreach { case ((a, b, want), got) =>
      assert(math.abs(got - want) < 1e-12, s"jw($a, $b) = $got, want $want")
    }
  }

  test("interpreted eval equals codegen path") {
    import spark.implicits._
    // force interpreted evaluation through the Util directly
    import org.apache.spark.unsafe.types.UTF8String
    cases.foreach { case (a, b, want) =>
      val got = JaroWinklerUtil.jw(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-12, s"util jw($a, $b) = $got")
    }
  }

  test("symmetry and identity properties on random token soup") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val strs = Seq.fill(50)(
      Seq.fill(rnd.nextInt(8) + 1)(words(rnd.nextInt(words.size))).mkString(" "))
    val pairs = strs.zip(strs.reverse)
    val df = pairs.toDF("a", "b")
      .withColumn("ab", JaroWinkler.of(col("a"), col("b")))
      .withColumn("ba", JaroWinkler.of(col("b"), col("a")))
      .withColumn("aa", JaroWinkler.of(col("a"), col("a")))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3), "jw must be symmetric")
      assert(r.getDouble(4) == 1.0, "jw(x, x) must be 1")
    }
  }
}
