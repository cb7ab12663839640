package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native NFC normalization expression ([[NfcNormalize]]). All fixture
  * strings use explicit \\u escapes — visually-identical source literals
  * are exactly the ambiguity the expression exists to remove. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composedCafe = "caf\u00e9"
  private val decomposedCafe = "cafe\u0301"
  private val composedA = "\u00c5"
  private val decomposedA = "A\u030a"

  test("composes decomposed sequences; already-NFC and ASCII pass through") {
    val rows = Seq(
      decomposedCafe,
      composedCafe,
      decomposedA + "ngstr\u00f6m",
      "plain ascii",
      "")
      .toDF("s")
      .select(NfcNormalize.of(col("s")).as("n"))
      .as[String].collect()
    assert(rows === Array(
      composedCafe, composedCafe, composedA + "ngstr\u00f6m",
      "plain ascii", ""))
  }

  test("null propagates; expression is idempotent") {
    val out = Seq(Option(decomposedCafe), None).toDF("s")
      .select(NfcNormalize.of(NfcNormalize.of(col("s"))).as("n"))
      .as[Option[String]].collect()
    assert(out === Array(Some(composedCafe), None))
  }

  test("registered as a SQL function and matches java.text.Normalizer") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(s"SELECT nfc_normalize('$decomposedCafe' || ' ' || '$decomposedA')")
      .as[String].collect()(0)
    assert(got === java.text.Normalizer.normalize(
      s"$decomposedCafe $decomposedA", java.text.Normalizer.Form.NFC))
    assert(got === s"$composedCafe $composedA")
  }
}
