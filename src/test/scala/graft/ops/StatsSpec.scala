package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-scan correlation matrix ([[Stats.corrMatrix]]). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("perfect, inverse, and known hand-computed correlations") {
    val df = Seq((1L, 2L, 9L), (2L, 4L, 7L), (3L, 6L, 8L), (4L, 8L, 4L))
      .toDF("x", "y", "z")
    val out = Stats.corrMatrix(df,
        Seq("x" -> col("x"), "y" -> col("y"), "z" -> col("z")))
      .as[(String, String, Long, Double)].collect()
      .map(r => ((r._1, r._2), r._4)).toMap
    assert(out(("x", "y")) === 1.0)             // y = 2x exactly
    // corr(x,z): n=4 Sx=10 Sz=28 Sxz=63 Sxx=30 Szz=210
    // cov=4*63-280=-28; varx=4*30-100=20; varz=4*210-784=56 → -28/sqrt(1120)
    assert(math.abs(out(("x", "z")) - -28.0 / math.sqrt(20.0 * 56.0)) < 1e-6)
    assert(out(("y", "z")) === out(("x", "z"))) // y is affine in x
  }

  test("ksDrift: identical groups drift 0; disjoint halves drift 500000 ppm") {
    // a,b identical distributions → F_g == F everywhere → D = 0
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val s = Stats.ksDrift(same, "g", "v")
      .as[(String, Long, Long)].collect()
    assert(s === Array(("a", 2L, 0L), ("b", 2L, 0L)))

    // a entirely below b: at a's top value F_a = 1, F = 1/2 → D = 1/2
    val split = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val d = Stats.ksDrift(split, "g", "v")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(d === Map("a" -> 500000L, "b" -> 500000L))
  }

  test("ksDrift exact ppm when ng*nAll overflows Long (counts regime)") {
    // Two groups with counts near 4e18 each: nAll ≈ 8e18 still fits a Long,
    // but ng·nAll ≈ 3.2e37 > 2^63 and dmax·10⁶ ≫ 2^63 — the pre-DECIMAL
    // Long math returned silently wrong/negative ppm here.
    val big = 4000000000000000000L // 4e18
    val counts = Seq(
      ("a", 1L, big), ("a", 2L, 1L),
      ("b", 1L, 1L), ("b", 2L, big)).toDF("g", "v", "c")
    intercept[IllegalArgumentException](Stats.ksDriftFromCounts(counts))

    // Within the guarded range but far past Long-product overflow:
    // ng = 4e15 each, nAll = 8e15; ng·nAll = 3.2e31 > 2^63.
    val n = 4000000000000000L // 4e15
    val c2 = Seq(
      ("a", 1L, n - 1L), ("a", 2L, 1L),
      ("b", 1L, 1L), ("b", 2L, n - 1L)).toDF("g", "v", "c")
    val out = Stats.ksDriftFromCounts(c2)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // Exact oracle via BigInt: D at v=1 for group a is
    // |cumg·nAll − cumc·ng| = |(n−1)·2n − n·n| = n² − 2n, over ng·nAll = 2n².
    val nB = BigInt(n)
    val expected =
      ((nB * nB - 2 * nB) * 1000000 / (2 * nB * nB)).toLong
    assert(out === Map("a" -> expected, "b" -> expected))
    assert(expected == 499999L) // ≈ half, minus the 1-row leak per group
  }

  test("ksTwoSample: identical → 0, disjoint → 1e6, hand-computed middle") {
    def cnt(rows: (Long, Long)*) = rows.toDF("v", "c")
    def ks(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Stats.ksTwoSample(a, b).as[(Long, Long, Long)].collect()(0)

    assert(ks(cnt(1L -> 3L, 2L -> 7L), cnt(1L -> 6L, 2L -> 14L))
      == ((10L, 20L, 0L)), "identical shapes (scaled) drift 0")
    assert(ks(cnt(1L -> 5L), cnt(9L -> 4L)) == ((5L, 4L, 1000000L)),
      "disjoint supports drift 1.0")
    // F_a at v=1: 2/4; F_b: 1/4 → D = 1/4; at v=2: 4/4 vs 2/4 → 1/2 (sup)
    assert(ks(cnt(1L -> 2L, 2L -> 2L), cnt(1L -> 1L, 2L -> 1L, 3L -> 2L))
      == ((4L, 4L, 500000L)))
    // guard: huge counts fail loudly rather than overflowing silently
    intercept[IllegalArgumentException](
      ks(cnt(1L -> 20000000000000000L), cnt(1L -> 1L)))
  }

  test("DECIMAL cap is strict: exactly 1e16 rows fails loudly, never nulls") {
    // at na = nb = 1e16 with disjoint supports, dmax·10⁶ = 10³⁸ which is
    // one past DECIMAL(38,0)'s max — Spark would null the overflow, so an
    // inclusive cap would ship ks_ppm = null silently
    def cnt(rows: (Long, Long)*) = rows.toDF("v", "c")
    val cap = 10000000000000000L // 1e16
    intercept[IllegalArgumentException](
      Stats.ksTwoSample(cnt(1L -> cap), cnt(9L -> cap)))
    intercept[IllegalArgumentException](
      Stats.ksDriftFromCounts( // nAll = exactly 1e16
        Seq(("a", 1L, cap - 1L), ("b", 9L, 1L)).toDF("g", "v", "c")))
    // one under the cap still computes (and exactly)
    val r = Stats.ksTwoSample(cnt(1L -> (cap - 1L)), cnt(9L -> (cap - 1L)))
      .as[(Long, Long, Long)].collect()(0)
    assert(r == ((cap - 1L, cap - 1L, 1000000L)))
  }

  test("matches Spark's built-in corr on lineitem to the 6dp rounding") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice")).cast("long").as("price"))
    val ours = Stats.corrMatrix(li,
        Seq("qty" -> col("qty"), "price" -> col("price")))
      .as[(String, String, Long, Double)].collect()(0)._4
    val builtin = li.agg(corr(col("qty"), col("price"))).as[Double].collect()(0)
    assert(math.abs(ours - builtin) <= 2e-6)
  }

  test("corrMatrix: a constant column yields null corr rows, not a query-killing error") {
    import spark.implicits._
    val df = Seq((1L, 7L, 10L), (2L, 7L, 20L), (3L, 7L, 35L))
      .toDF("x", "const", "y")
    val out = Stats.corrMatrix(df,
        Seq("x" -> col("x"), "const" -> col("const"), "y" -> col("y")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(("x", "const")).isEmpty, "undefined corr must be null")
    assert(out(("const", "y")).isEmpty, "undefined corr must be null")
    val xy = out(("x", "y"))
    assert(xy.exists(v => v > 0.99 && v <= 1.0),
      s"the defined pair still reports: $xy")
  }

  test("madOutliers: hand-computed medians, MAD-0 degeneracy, outlier count") {
    import spark.implicits._
    // group a: {10,10,20,30,1000} → med 20, devs {10,10,0,10,980} →
    //   mad 10, 5·mad = 50 → exactly the 1000 row flags; max_dev 980.
    //   The classic case mean/stddev misses: 1000 drags mean to 214 and
    //   stddev past 400, z-scoring its own outlier back under 2.
    // group b: {7,7,7,9} → med 7, devs {0,0,0,2} → mad 0 → every
    //   off-median row (the single 9) flags — degenerate reading.
    val df = Seq(
      ("a", 10L), ("a", 10L), ("a", 20L), ("a", 30L), ("a", 1000L),
      ("b", 7L), ("b", 7L), ("b", 7L), ("b", 9L))
      .toDF("g0", "v0")
    val out = Stats.madOutliers(df, "g0", "v0", k = 5.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    assert(out("a") == ((5L, 20.0, 10.0, 1L, 980.0)), s"group a: ${out("a")}")
    assert(out("b") == ((4L, 7.0, 0.0, 1L, 2.0)), s"group b: ${out("b")}")
    val err = intercept[IllegalArgumentException](
      Stats.madOutliers(df, "g0", "v0", k = 0.0))
    assert(err.getMessage.contains("k must be > 0"))
    // the null group is a group: a quality sweep dropping NULL-keyed rows
    // understates outliers exactly where the data is worst
    val withNull = Seq((null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 1L), (null.asInstanceOf[String], 100L))
      .toDF("g0", "v0").union(df)
    val nullRow = Stats.madOutliers(withNull, "g0", "v0", k = 5.0)
      .filter(col("g").isNull).collect()
    assert(nullRow.length == 1 && nullRow(0).getLong(1) == 3L,
      s"null group must report its 3 rows: ${nullRow.toSeq}")
  }

  test("equiDepthHistogram: balanced buckets, skew-proof, nulls excluded") {
    import org.apache.spark.sql.functions._
    // 8 rows, heavy skew: six copies of 5 (distinct ties), plus 1 and 100
    val df = Seq[(java.lang.Long, Long)](
      (1L, 1L), (5L, 2L), (5L, 3L), (5L, 4L), (5L, 5L), (5L, 6L),
      (100L, 7L), (null, 8L)).toDF("v", "tie")
    val h = Stats.equiDepthHistogram(df, "v", "tie", k = 4, buckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // ranks 1..7 (null excluded) -> buckets of (rank-1)*4 DIV 7
    assert(h == Seq((0L, 2L, 1L, 5L), (1L, 2L, 5L, 5L),
      (2L, 2L, 5L, 5L), (3L, 1L, 100L, 100L)), s"got $h")
    // counts differ by at most 1 between buckets — the equi-depth contract
    val counts = h.map(_._2)
    assert(counts.max - counts.min <= 1)
  }
}
