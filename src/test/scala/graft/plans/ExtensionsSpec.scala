package graft.plans

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  extract_price('899USD$8.99') AS p,
        |  cosine_sim(array(1d, 0d), array(1d, 0d)) AS cs,
        |  dot_product(array(1d, 2d), array(3d, 4d)) AS dp,
        |  h60('hello') AS h,
        |  minhash_sig(ngram_hashes(array('a','b','c','d'), 3), 4) AS sig,
        |  ngram_hashes(array('a','b','c','d'), 3) AS ng,
        |  lsh_bucket(array_repeat(1.0d, 64), 8, 64) AS bkt,
        |  jaro_winkler('martha', 'marhta') AS jw
        |""".stripMargin).collect()(0)
    assert(r.getFloat(0) == 8.99f)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 11.0)
    // value-identity with conv(substring(md5(s),1,15),16,10)
    assert(r.getLong(3) == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
    assert(r.getSeq[Long](4).length == 4)
    assert(r.getSeq[Long](5).length == 2)
    assert(r.getLong(6) >= 0 && r.getLong(6) < 256)
    assert(math.abs(r.getDouble(7) - 0.9611111111111111) < 1e-12)
  }

  test("h60 SQL function matches the declarative conv/md5 composition") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT x, h60(x) AS native,
        |  CAST(conv(substring(md5(CAST(x AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS declarative
        |FROM VALUES ('a'), ('hello world'), (''), ('日本語') AS t(x)""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"mismatch for ${r.getString(0)}"))
  }
}
