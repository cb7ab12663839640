package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine multinomial NB: separable vocabularies classify correctly,
  * smoothing keeps one-class-only tokens finite, priors lean the empty
  * evidence case, and the fit is partition-independent. */
class NaiveBayesSpec extends SparkSpec {

  private val posDocs = Seq(
    1L -> "good great fine good", 2L -> "great good solid fine",
    3L -> "fine fine great good")
  private val negDocs = Seq(
    11L -> "bad awful poor bad", 12L -> "awful bad dismal poor",
    13L -> "poor poor awful bad")

  test("null/empty text scores its prior instead of vanishing") {
    import spark.implicits._
    val docs = ((posDocs ++ negDocs).map { case (id, t) => (id, Option(t)) }
      :+ (20L -> Option.empty[String])).toDF("doc_id", "text")
    val labels = (posDocs.map(_._1 -> true) ++ negDocs.map(_._1 -> false)
      :+ (20L -> true)).toDF("doc_id", "y")
    val out = NaiveBayes.fitScore(docs, labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(20L),
      s"null-text doc must still be scored: ${out.keySet}")
    // balanced priors here → ln(4/3)·10⁴ prior, zero token evidence
    assert(out(20L) == math.round(math.log(4.0 / 3.0) * 10000),
      s"null-text doc scores exactly its prior: ${out(20L)}")
  }

  test("separable vocab: every training doc classified to its own class") {
    import spark.implicits._
    val docs = (posDocs ++ negDocs).toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"), (col("doc_id") < 10L).as("y"))
    val out = NaiveBayes.fitScore(docs, labels)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    posDocs.foreach { case (id, _) =>
      assert(out(id)._2 && out(id)._1 > 0, s"doc $id should score positive: ${out(id)}")
    }
    negDocs.foreach { case (id, _) =>
      assert(!out(id)._2 && out(id)._1 < 0, s"doc $id should score negative: ${out(id)}")
    }
  }

  test("smoothing: a token seen only in one class yields a finite LLR") {
    import spark.implicits._
    // "unicorn" appears only in the positive class; without Laplace
    // smoothing its negative-class probability would be 0 → infinite LLR
    val docs = (posDocs.map { case (id, t) => (id, t + " unicorn") } ++ negDocs)
      .toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"), (col("doc_id") < 10L).as("y"))
    val scores = NaiveBayes.fitScore(docs, labels)
      .collect().map(r => r.getLong(1))
    assert(scores.forall(s => math.abs(s) < 1000000L),
      s"all scores finite and bounded: ${scores.toSeq}")
  }

  test("fit is partition-independent; skewed priors lean borderline docs") {
    import spark.implicits._
    val docs = (posDocs ++ negDocs).toDF("doc_id", "text")
    val labels = docs.select(col("doc_id"), (col("doc_id") < 10L).as("y"))
    val a = NaiveBayes.fitScore(docs, labels)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = NaiveBayes.fitScore(docs.repartition(7), labels.repartition(3))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.sameElements(b), "repartitioning must not change scores")
  }
}
