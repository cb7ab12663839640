package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

/** C4 line/page cleaning: each line rule and page rule hand-checked, byte
  * accounting of the reassembled text, and the zero-shuffle plan shape. */
class C4CleanSpec extends SparkSpec {

  private def clean(rows: (Long, String)*): Map[Long, Row] = {
    import spark.implicits._
    TextOps.c4Clean(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("line rules: terminal punctuation, min words, javascript mention") {
    val r = clean(1L -> Seq(
      "this sentence survives the filter.", // kept
      "does it survive a question mark?",   // kept
      "no terminal punctuation here",       // punct rule
      "too short.",                         // word rule
      "please enable JavaScript today.",    // javascript rule (case-folded)
      "he said \"keep quoted endings\""     // kept (quote ending)
    ).mkString("\n"))
    val row = r(1L)
    assert(row.getLong(1) == 6L && row.getLong(2) == 3L,
      s"6 lines in, 3 kept: ${row.getLong(1)}/${row.getLong(2)}")
    assert(!row.getBoolean(3), "page itself survives")
    assert(row.getString(4) ==
      Seq("this sentence survives the filter.",
        "does it survive a question mark?",
        "he said \"keep quoted endings\"").mkString("\n"),
      "kept lines reassemble in order, byte-identical")
  }

  test("page rules: lorem ipsum, braces, and zero surviving lines drop the page") {
    val r = clean(
      1L -> "a fine lorem ipsum generator sentence.",
      2L -> "some code { with braces } inside.",
      3L -> "every line here lacks punctuation\nso does this one",
      4L -> "a perfectly ordinary sentence survives.")
    assert(r(1L).getBoolean(3) && r(2L).getBoolean(3) && r(3L).getBoolean(3),
      "lorem / brace / empty-remainder pages all flagged")
    assert(!r(4L).getBoolean(3), "ordinary page kept")
    assert(r(3L).getLong(2) == 0L && r(3L).getString(4) == "",
      "zero kept lines reassemble to the empty string")
  }

  test("cleaning is row-local: the physical plan has no exchange") {
    import spark.implicits._
    val df = TextOps.c4Clean(
      Seq(1L -> "a fine ordinary sentence survives.").toDF("doc_id", "text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
