package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Gopher rule battery: each rule's verdict hand-checked on documents
  * engineered to fail exactly that rule, plus integer-exactness edge cases
  * (boundary word counts, cross-multiplied mean-length bounds, greedy
  * non-overlapping ellipsis counting). */
class GopherRulesSpec extends SparkSpec {

  private def rules(rows: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    TextStats.gopherRules(rows.toDF("doc_id", "text"), minWords = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("each junk shape fails exactly its targeted rule") {
    val good = "the cat sat of the mat and that dog have fun with it"
    // 'the and' (not 'the of'): mean word length must stay >= 3
    val short = "the and"
    // hashes embedded in alpha words, so only the symbol rule trips
    val symbols = "the of and that have ax# bx# cx# the of"
    val digits = "the of 11111 22222 33333 44444 55555 66666 77777 88888"
    val longWords = "the of " + ("abcdefghijklmnop " * 8).trim
    val r = rules(1L -> good, 2L -> short, 3L -> symbols,
      4L -> digits, 5L -> longWords)
    def oks(row: Row): Seq[Boolean] =
      (6 to 10).map(row.getBoolean) // the five ok_* columns in select order
    assert(oks(r(1L)) == Seq(true, true, true, true, true) &&
      r(1L).getBoolean(11), "clean doc passes all rules")
    assert(oks(r(2L)) == Seq(false, true, true, true, true), "short: word count only")
    assert(oks(r(3L)) == Seq(true, true, false, true, true), "symbols: ratio only")
    assert(oks(r(4L)) == Seq(true, true, true, false, true), "digits: alpha only")
    assert(oks(r(5L)) == Seq(true, false, true, true, true), "long words: mean len only")
    assert(!r(2L).getBoolean(11) && !r(3L).getBoolean(11), "any failure fails pass")
  }

  test("mean word length bounds are inclusive cross-multiplied integers") {
    val r = rules(
      // 5 words × exactly 3 chars: 3·5 ≤ 15 holds inclusively
      1L -> "the abc def ghi jkl",
      // 43 chars over 5 words: inside (3, 10·5]
      2L -> "the abcdefghij bcdefghijk cdefghijkl defghijklm",
      // 5 words × 11 chars = 55 > 10·5: out of range
      3L -> "abcdefghijk bcdefghijka cdefghijkab defghijkabc efghijkabcd")
    assert(r(1L).getBoolean(7), "mean exactly 3 is in range")
    assert(r(2L).getBoolean(7), "mean within (3,10] passes")
    assert(!r(3L).getBoolean(7), "mean above 10 fails")
  }

  test("ellipsis counting is greedy non-overlapping (4 dots = one ellipsis)") {
    // 5 words, one '....' run → 1 symbol; 10·1 > 5 → fails ratio
    val r = rules(1L -> "the of and that ....")
    assert(r(1L).getLong(5) == 1L, s"n_symbols ${r(1L).getLong(5)}")
    assert(!r(1L).getBoolean(8), "1 symbol over 5 words fails the 10% ratio")
  }

  test("stop-word rule counts distinct stop words, not occurrences") {
    // 'the' ×10 = one distinct stop word → fails; 'the'+'of' passes
    val r = rules(
      1L -> "the the the the the the the the the the",
      2L -> "the of cat cat cat cat cat cat cat cat")
    assert(!r(1L).getBoolean(10), "repeated single stop word is not >= 2")
    assert(r(2L).getBoolean(10), "two distinct stop words pass")
  }
}
