package graft.ops

import graft.SparkSpec

/** Boilerplate line removal: lines recurring across >= minDocs distinct
  * documents are cut, everything else survives byte-identically and in
  * order; all-boilerplate docs come back empty rather than vanishing. */
class BoilerplateSpec extends SparkSpec {

  private val nav = "=== SITE NAV ==="
  private val foot = "(c) 2026 Example Corp"

  test("frequent lines cut, rare and short lines kept, order preserved") {
    import spark.implicits._
    val docs = Seq(
      1L -> s"$nav\nunique body one\n\nsecond paragraph\n$foot",
      2L -> s"$nav\nanother body\nrare shared line\n$foot",
      3L -> s"$nav\nthird body\nrare shared line\n$foot",
      // repeated within ONE doc only: within-doc repetition is not
      // boilerplate (countDistinct doc_id = 1)
      4L -> s"$nav\nrefrain\nrefrain\nrefrain\n$foot")
      .toDF("doc_id", "text")
    val out = TextOps.removeBoilerplateLines(docs, minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(out(1L) == "unique body one\n\nsecond paragraph",
      "header/footer cut; empty line and order kept")
    assert(out(2L) == "another body\nrare shared line",
      "a line in only 2 of 4 docs stays")
    assert(out(3L) == "third body\nrare shared line")
    assert(out(4L) == "refrain\nrefrain\nrefrain",
      "within-doc repetition alone never qualifies as boilerplate")
  }

  test("a document that is pure boilerplate survives as the empty string") {
    import spark.implicits._
    val docs = Seq(
      1L -> s"$nav\nbody a\n$foot",
      2L -> s"$nav\nbody b\n$foot",
      3L -> s"$nav\n$foot")
      .toDF("doc_id", "text")
    val out = TextOps.removeBoilerplateLines(docs, minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "every doc_id survives")
    assert(out(3L) == "", "all-boilerplate doc becomes empty, not dropped")
    assert(out(1L) == "body a" && out(2L) == "body b")
  }

  test("minLineLen shields short lines from removal") {
    import spark.implicits._
    val docs = Seq(
      1L -> "--\nbody one\n--",
      2L -> "--\nbody two\n--",
      3L -> "--\nbody three\n--")
      .toDF("doc_id", "text")
    // "--" recurs in all 3 docs but is under minLineLen=3
    val out = TextOps.removeBoilerplateLines(docs, minDocs = 2, minLineLen = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "--\nbody one\n--", "short separator lines protected")
  }
}
