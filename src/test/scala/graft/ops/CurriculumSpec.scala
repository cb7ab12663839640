package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interleaved training order: the closed-form position equals the naive
  * global window, forms a permutation, round-robins live keys, and is
  * partition-independent. */
class CurriculumSpec extends SparkSpec {

  test("closed-form pos equals the global-window form on unequal groups") {
    import spark.implicits._
    val rows = (1L to 17L).map(i => (i, s"k${i % 3}")) ++
      (100L to 104L).map(i => (i, "k9")) // a small late key
    val df = rows.toDF("id", "key")
    val out = Curriculum.interleave(df, "key", "id")
      .select("id", "key", "mix_rank", "pos")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // permutation 1..N
    assert(out.map(_._4).sorted.toSeq == (1L to rows.size).toSeq)
    // equality with the naive form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key")
      .orderBy(graft.functions.H60.of(col("id").cast("string")), col("id"))
    val naive = df.withColumn("mix_rank", row_number().over(w).cast("long"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy("mix_rank", "key")).cast("long"))
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (id, _, _, pos) =>
      assert(naive(id) == pos, s"id $id: closed-form $pos vs naive ${naive(id)}")
    }
    // while every key is live, each round of #keys positions hits each key once
    val byPos = out.sortBy(_._4).map(_._2)
    val fullRounds = out.groupBy(_._2).map(_._2.size).min
    byPos.take(4 * fullRounds.toInt).grouped(4).foreach { g =>
      assert(g.toSet.size == 4, s"round not interleaved: ${g.toSeq}")
    }
  }

  test("non-string keys interleave via their string form; null keys fail loudly") {
    import spark.implicits._
    val intKeyed = (1L to 12L).map(i => (i, (i % 3).toInt)).toDF("id", "key")
    val out = Curriculum.interleave(intKeyed, "key", "id")
    assert(out.select("pos").collect().map(_.getLong(0)).sorted.toSeq
      == (1L to 12L).toSeq, "int keys form a full permutation")
    assert(out.columns.toSet ==
      Set("id", "key", "mix_rank", "pos"), s"${out.columns.toSeq}")
    val withNull = intKeyed.withColumn("key",
      when(col("id") === 1L, lit(null)).otherwise(col("key").cast("string")))
    val e = intercept[IllegalArgumentException](
      Curriculum.interleave(withNull, "key", "id"))
    assert(e.getMessage.contains("null"), e.getMessage)
  }

  test("interleave is partition-independent") {
    import spark.implicits._
    val rows = (1L to 40L).map(i => (i, s"s${i % 5}"))
    val a = Curriculum.interleave(rows.toDF("id", "key"), "key", "id")
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Curriculum.interleave(
      rows.toDF("id", "key").repartition(11, col("id")), "key", "id")
      .select("id", "pos").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }
}
