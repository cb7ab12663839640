package graft.ops

import graft.SparkSpec

/** Privacy audits ([[Audit.kAnonymity]] / [[Audit.lDiversity]]) on
  * hand-computed fixtures: class sizes, NULL-QI grouping, the
  * NULL-sensitive-counts-as-one-value rule, and the half-up ppm.
  */
class AuditPrivacySpec extends SparkSpec {
  import spark.implicits._

  // classes: (30,M)x3, (30,F)x1 unique, (40,M)x2, (NULL,M)x2 — NULLs group
  private def people = Seq[(java.lang.Long, String, String)](
    (30L, "M", "flu"), (30L, "M", "flu"), (30L, "M", "cold"),
    (30L, "F", "flu"),
    (40L, "M", "flu"), (40L, "M", "flu"),
    (null, "M", "flu"), (null, "M", null))
    .toDF("age", "sex", "dx")

  test("kAnonymity: class sizes, unique rows, risky ppm") {
    val r = Audit.kAnonymity(people, Seq("age", "sex"), 3L).head()
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_classes") == 4L)
    assert(r.getAs[Long]("min_k") == 1L)
    assert(r.getAs[Long]("n_unique_rows") == 1L)
    // k<3 classes: (30,F)=1, (40,M)=2, (NULL,M)=2 → 5 risky rows
    assert(r.getAs[Long]("n_risky_rows") == 5L)
    // 5/8 = 625000 ppm exactly
    assert(r.getAs[Long]("risky_ppm") == 625000L)
  }

  test("lDiversity: NULL sensitive is one distinct value; exposed rows") {
    val r = Audit.lDiversity(people, Seq("age", "sex"), "dx", 2L).head()
    // l per class: (30,M)={flu,cold}=2, (30,F)={flu}=1, (40,M)={flu}=1,
    // (NULL,M)={flu,NULL}=2
    assert(r.getAs[Long]("n_rows") == 8L)
    assert(r.getAs[Long]("n_classes") == 4L)
    assert(r.getAs[Long]("min_l") == 1L)
    assert(r.getAs[Long]("n_low_classes") == 2L)
    assert(r.getAs[Long]("n_exposed_rows") == 3L)
    // 3/8 = 375000 ppm
    assert(r.getAs[Long]("exposed_ppm") == 375000L)
  }

  test("empty input: zero rows, no division error") {
    import org.apache.spark.sql.functions.lit
    val e = people.filter(lit(false))
    val k = Audit.kAnonymity(e, Seq("age"), 2L).head()
    assert(k.getAs[Long]("n_rows") == 0L && k.getAs[Long]("risky_ppm") == 0L)
    assert(k.isNullAt(k.fieldIndex("min_k")))
    val l = Audit.lDiversity(e, Seq("age"), "dx", 2L).head()
    assert(l.getAs[Long]("n_rows") == 0L && l.getAs[Long]("exposed_ppm") == 0L)
  }

  test("profile: one row per column, nulls/distinct/bounds; exact == approx shape") {
    val df = Seq[(java.lang.Long, String)]((1L, "b"), (2L, null), (2L, "a"))
      .toDF("id", "s")
    val rows = Audit.profile(df, Seq("id", "s")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("id", "s"))
    val id = rows(0)
    assert(id.getAs[Long]("n_rows") == 3L && id.getAs[Long]("n_nulls") == 0L)
    assert(id.getAs[Long]("n_distinct") == 2L)
    assert(id.getAs[String]("min_s") == "1" && id.getAs[String]("max_s") == "2")
    val s2 = rows(1)
    assert(s2.getAs[Long]("n_nulls") == 1L && s2.getAs[Long]("n_distinct") == 2L)
    assert(s2.getAs[String]("min_s") == "a" && s2.getAs[String]("max_s") == "b")
    // approx path: same schema and row set, cardinalities within HLL error
    val ap = Audit.profile(df, Seq("id", "s"), exact = false).collect()
    assert(ap.map(_.getString(0)).toSeq == Seq("id", "s"))
    assert(ap.forall(r => math.abs(r.getAs[Long]("n_distinct") - 2L) <= 1L))
  }

  test("temporalLeakage: groups crossing the cutoff; null ts excluded") {
    import org.apache.spark.sql.functions._
    val df = Seq[(String, java.lang.Long)](
      ("u1", 10L), ("u1", 20L),          // leaked: both sides
      ("u2", 5L),                        // train only
      ("u3", 30L), ("u3", 40L),          // test only
      ("u4", null))                      // null ts: neither side
      .toDF("user", "t")
    val r = Sampling.temporalLeakage(df, "t", lit(15L), "user").head()
    assert(r.getAs[Long]("n_train") == 2L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("n_groups_train") == 2L)
    assert(r.getAs[Long]("n_groups_test") == 2L)
    assert(r.getAs[Long]("n_leaked_groups") == 1L)
    assert(r.getAs[Long]("leaked_ppm") == 500000L)
  }

  test("groupKFold: group-disjoint, deterministic, NULL group -> NULL fold") {
    import org.apache.spark.sql.functions._
    val df = Seq[(java.lang.Long, Long)](
      (1L, 10L), (1L, 11L), (2L, 12L), (3L, 13L), (null, 14L))
      .toDF("g", "x")
    val f = Sampling.groupKFold(df, "g", 3)
    // every group maps to exactly one fold
    val perGroup = f.filter(col("g").isNotNull)
      .groupBy("g").agg(countDistinct(col("fold")).as("nf")).collect()
    assert(perGroup.forall(_.getAs[Long]("nf") == 1L))
    assert(f.filter(col("g").isNull).select("fold").head().isNullAt(0))
    // deterministic across re-runs and matches the md5 definition
    val f1 = f.select("g", "fold").distinct().collect().toSet
    val f2 = Sampling.groupKFold(df, "g", 3)
      .select("g", "fold").distinct().collect().toSet
    assert(f1 == f2)
    // zero-shuffle: the assignment plan has no exchange
    val plan = f.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fold assignment must not shuffle:\n$plan")
  }

  test("referentialIntegrity: orphans vs null fks; dedup'd parent") {
    val child = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "orphan"), (null, "nullfk"), (1L, "ok2"))
      .toDF("fk", "tag")
    val parent = Seq(1L, 1L, 3L).toDF("pk") // duplicate parent keys
    val r = Audit.referentialIntegrity(child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_child") == 4L)
    assert(r.getAs[Long]("n_orphans") == 1L)
    assert(r.getAs[Long]("n_null_fk") == 1L)
    assert(r.getAs[Long]("orphan_ppm") == 250000L)
  }

  test("kAnonymityBy: per-partition profiles equal the global audit per slice") {
    val df = Seq(
      ("d1", 30L, "M"), ("d1", 30L, "M"), ("d1", 40L, "F"),
      ("d2", 30L, "M"))
      .toDF("day", "age", "sex")
    val by = Audit.kAnonymityBy(df, Seq("day"), Seq("age", "sex"), 2L)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))).toMap
    // d1: classes (30,M)=2, (40,F)=1 -> risky 1 row; d2: one unique row
    assert(by("d1") == Seq(Some(3L), Some(2L), Some(1L), Some(1L),
      Some(1L), Some(333333L)))
    assert(by("d2") == Seq(Some(1L), Some(1L), Some(1L), Some(1L),
      Some(1L), Some(1000000L)))
    // and each slice equals the global audit over that slice
    import org.apache.spark.sql.functions.col
    val g = Audit.kAnonymity(df.filter(col("day") === "d1")
      .select("age", "sex"), Seq("age", "sex"), 2L).head()
    assert((0 until 6).map(i => g.getLong(i)) ==
      by("d1").map(_.get))
    // overlapping by/qi fails loudly
    intercept[IllegalArgumentException](
      Audit.kAnonymityBy(df, Seq("day"), Seq("day", "age"), 2L))
  }

  test("lDiversityBy: per-partition diversity equals the global audit per slice") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("s1", 30L, "flu"), ("s1", 30L, "cold"), ("s1", 40L, "flu"),
      ("s2", 30L, "flu"), ("s2", 30L, "flu"))
      .toDF("src", "age", "dx")
    val by = Audit.lDiversityBy(df, Seq("src"), Seq("age"), "dx", 2L)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(r.getLong(_)).toSeq).toMap
    // s1: class 30 -> l=2, class 40 -> l=1 (1 exposed row); s2: l=1 (2 rows)
    assert(by("s1") == Seq(3L, 2L, 1L, 1L, 1L, 333333L))
    assert(by("s2") == Seq(2L, 1L, 1L, 1L, 2L, 1000000L))
    val g = Audit.lDiversity(df.filter(col("src") === "s1")
      .select("age", "dx"), Seq("age"), "dx", 2L).head()
    assert((0 until 6).map(g.getLong(_)) == by("s1"))
    intercept[IllegalArgumentException](
      Audit.lDiversityBy(df, Seq("src"), Seq("src"), "dx", 2L))
  }

  test("pseudonymize: stable keyed surrogates, NULL passthrough, secret rotation") {
    val df = Seq[(java.lang.Long, String)]((7L, "x"), (7L, "y"), (null, "z"))
      .toDF("id", "payload")
    val t1 = Audit.pseudonymize(df, Seq("id"), "k1")
    val toks = t1.orderBy("payload").select("id").collect().map(_.getString(0))
    assert(toks(0) == toks(1), "same id, same secret -> same token")
    assert(toks(0).length == 32 && toks(0).matches("[0-9a-f]+"))
    assert(toks(2) == null, "NULL stays NULL")
    assert(toks(0) != "7", "token is not the identifier")
    // rotation severs linkage
    val t2 = Audit.pseudonymize(df, Seq("id"), "k2")
      .orderBy("payload").select("id").head().getString(0)
    assert(t2 != toks(0))
    // guards
    intercept[IllegalArgumentException](Audit.pseudonymize(df, Seq("id"), ""))
    intercept[IllegalArgumentException](Audit.pseudonymize(df, Seq("id"), "a|b"))
  }

  test("alias-collision and foldCol guards fail loudly") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2L)).toDF("__k", "fold")
    intercept[IllegalArgumentException](Audit.kAnonymity(df, Seq("__k"), 2L))
    intercept[IllegalArgumentException](
      Audit.lDiversity(df, Seq("__k"), "fold", 2L))
    intercept[IllegalArgumentException](
      Sampling.temporalLeakage(df.withColumnRenamed("__k", "__tr"),
        "fold", lit(0L), "__tr"))
    intercept[IllegalArgumentException](Sampling.groupKFold(df, "__k", 3))
    // and a caller-chosen output column resolves the clash
    assert(Sampling.groupKFold(df, "__k", 3, "fold2").columns.contains("fold2"))
  }
}
