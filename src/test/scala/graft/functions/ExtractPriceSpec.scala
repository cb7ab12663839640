package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class ExtractPriceSpec extends SparkSpec {

  private def ex(s: String): Float =
    ExtractPriceUtil.extract(if (s == null) null else UTF8String.fromString(s))

  test("reference semantics: last $-token as float, else 0.0") {
    assert(ex("899USD$8.99") == 8.99f) // the canonical dirty form (SURVEY §8.3)
    assert(ex("$12.50") == 12.5f)
    assert(ex("1$2$3.5") == 3.5f) // split('$') takes the LAST token
    assert(ex("12.50") == 0.0f) // no '$' ⇒ 0.0
    assert(ex("abc$xyz") == 0.0f) // unparsable ⇒ 0.0
    assert(ex("8.99$") == 0.0f) // trailing '$' ⇒ empty token ⇒ 0.0
    assert(ex("") == 0.0f)
    assert(ex(null) == 0.0f)
  }

  test("total function: never throws on arbitrary input") {
    val rnd = new scala.util.Random(42)
    val alphabet = "0123456789.$-+eE aZé中"
    (1 to 5000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
      ex(s) // must not throw
    }
    succeed
  }

  test("codegen path through a DataFrame matches eval") {
    import spark.implicits._
    val inputs = Seq("899USD$8.99", "$1", "junk", null, "", "a$b$4.25")
    val out = inputs.toDF("p")
      .select(ExtractPrice.of($"p").as("price"))
      .collect().map(_.getFloat(0))
    assert(out.sameElements(inputs.map(ex)))
  }
}
