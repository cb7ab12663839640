package graft.ops

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class CdcChunkSpec extends SparkSpec {

  test("cdcChunks: chunks partition the document; expected length ~ modulus") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val chunks = TextOps.cdcChunks(docs).collect()
    val tokenTotal = docs
      .select(sum(size(TextOps.tokens(col("text"))))).collect().head.getLong(0)
    assert(chunks.map(_.getAs[Long]("n_tokens")).sum == tokenTotal,
      "chunks must partition every token exactly once")
    // chunk ids are dense 0..n-1 per doc
    chunks.groupBy(_.getLong(0)).foreach { case (id, cs) =>
      assert(cs.map(_.getAs[Long]("chunk_id")).sorted.toSeq ==
        (0L until cs.length), s"doc $id chunk ids not dense")
    }
    val meanLen = tokenTotal.toDouble / chunks.length
    assert(meanLen > 8 && meanLen < 128, s"mean chunk length off: $meanLen")
  }

  test("shift invariance: a front-of-doc edit leaves far-downstream chunks identical") {
    import spark.implicits._
    val base = (0 until 400).map(i => s"w${i * 7 % 131}").mkString(" ")
    val edited = "INSERTED " + base
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = TextOps.cdcChunks(docs).collect()
    val md5s1 = chunks.filter(_.getLong(0) == 1L).map(_.getAs[String]("chunk_md5")).toSet
    val md5s2 = chunks.filter(_.getLong(0) == 2L).map(_.getAs[String]("chunk_md5")).toSet
    // all chunks after the first boundary re-synchronize: every original
    // chunk except the head one(s) must reappear verbatim in the edited doc
    val shared = md5s1.intersect(md5s2)
    assert(shared.size >= md5s1.size - 2,
      s"edit cascaded: only ${shared.size} of ${md5s1.size} chunks survived")
    assert(md5s1 != md5s2, "the edited head chunk must differ")
  }

  test("q94 user history: sequence fingerprint is input-order independent") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("user_id")
      .agg(md5(concat_ws(">",
        transform(
          array_sort(collect_list(
            struct(col("us"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")))).as("seq_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = hist(events)
    val b = hist(events.repartition(17).sortWithinPartitions(desc("event_id")))
    assert(a == b, "history fingerprints changed under input reordering")
  }
}
