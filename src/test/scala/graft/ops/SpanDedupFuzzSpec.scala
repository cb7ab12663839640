package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Differential fuzz for the span-dedup pair: [[Dedup.cutDuplicatedSpans]]'
  * interval merge / keep-subtraction / splice run as Catalyst `aggregate`
  * expressions, which fixtures alone can't trust — so every random corpus
  * is checked against an independent plain-Scala implementation of the
  * same policy (windows → repeated hashes → keep-first → merge cuts →
  * subtract keeps → splice). A two-letter alphabet with a 4-char window
  * makes duplication pervasive (16 possible windows), stressing exactly
  * the overlap webs the fixtures can't enumerate. Seeded, so failures
  * reproduce. */
class SpanDedupFuzzSpec extends SparkSpec {

  private val window = 4

  /** Plain-Scala reference of the documented policy. */
  private def refCut(docs: Seq[(Long, String)], stride: Int): Map[Long, String] = {
    case class Win(doc: Long, p: Int, key: String)
    val wins = docs.flatMap { case (id, t) =>
      if (t.length < window) Seq.empty
      else (1 to t.length - window + 1 by stride)
        .map(p => Win(id, p, t.substring(p - 1, p - 1 + window)))
    }
    val counts = wins.groupBy(_.key).view.mapValues(_.size).toMap
    val flagged = wins.filter(w => counts(w.key) > 1)
    val keeper = flagged.groupBy(_.key).view
      .mapValues(ws => ws.map(w => (w.doc, w.p)).min).toMap
    val keepsByDoc = keeper.values.toSeq.groupBy(_._1).view
      .mapValues(_.map { case (_, p) => (p, p + window) }.sorted.toSeq).toMap
    val cutsByDoc = flagged
      .filter(w => keeper(w.key) != ((w.doc, w.p)))
      .groupBy(_.doc).view
      .mapValues(_.map(w => (w.p, w.p + window)).sorted.toSeq).toMap
    docs.map { case (id, t) =>
      val cuts = cutsByDoc.getOrElse(id, Seq.empty)
      if (cuts.isEmpty) id -> t
      else {
        val merged = cuts.foldLeft(List.empty[(Int, Int)]) {
          case ((s0, e0) :: rest, (s, e)) if e0 >= s =>
            (s0, math.max(e0, e)) :: rest
          case (acc, iv) => iv :: acc
        }.reverse
        val keeps = keepsByDoc.getOrElse(id, Seq.empty)
        val prot = merged.flatMap { case (cs, ce) =>
          val segs = scala.collection.mutable.Buffer.empty[(Int, Int)]
          var pos = cs
          keeps.filter(k => k._1 < ce && k._2 > cs).foreach { case (s, e) =>
            if (s > pos) segs += ((pos, s))
            pos = math.max(pos, e)
          }
          if (pos < ce) segs += ((pos, ce))
          segs
        }
        val sb = new StringBuilder
        var pos = 1
        prot.foreach { case (s, e) =>
          sb.append(t.substring(pos - 1, s - 1)); pos = e
        }
        sb.append(t.substring(math.min(pos - 1, t.length)))
        id -> sb.toString
      }
    }.toMap
  }

  private def fuzzOnce(stride: Int, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(25))(if (rnd.nextBoolean()) 'a' else 'b').mkString
    }
    val expected = refCut(docs, stride)
    val got = Dedup.cutDuplicatedSpans(docs.toDF("doc_id", "text"),
      window = window, stride = stride)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    val diffs = docs.collect {
      case (id, orig) if got(id) != expected(id) =>
        s"doc $id: in='$orig' spark='${got(id)}' ref='${expected(id)}'"
    }
    assert(diffs.isEmpty,
      s"stride=$stride seed=$seed mismatches:\n${diffs.mkString("\n")}")
    // conservation: the engine never invents text
    assert(got.keySet == docs.map(_._1).toSet)
  }

  test("random two-letter corpora: engine matches the reference (stride 1)") {
    Seq(42, 1337, 2026).foreach(fuzzOnce(1, _))
  }

  test("random two-letter corpora: engine matches the reference (stride 2)") {
    Seq(7, 99).foreach(fuzzOnce(2, _))
  }

  // ------------------------------------------------------- anchored variant

  /** Plain-Scala h60 (MD5 first 15 hex digits), the cross-engine hash the
    * operators are built on — recomputed independently here. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Independent reference of the content-anchored detector. */
  private def refAnchored(docs: Seq[(Long, String)], window: Int,
      stride: Int, g: Int): Set[(Long, Long, Long, Boolean)] = {
    val wins = docs.flatMap { case (id, t) =>
      if (t.length < window) Seq.empty
      else (1 to t.length - window + 1)
        .filter(p => h60(t.substring(p - 1, p - 1 + g)) % stride == 0)
        .map(p => (id, p.toLong, h60(t.substring(p - 1, p - 1 + window))))
    }
    val counts = wins.groupBy(_._3).view.mapValues(_.size).toMap
    wins.map { case (id, p, h) => (id, p, h, counts(h) > 1) }.toSet
  }

  private def randWord(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString

  test("anchored: engine matches an independent reference on random corpora") {
    import spark.implicits._
    Seq(11, 404).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // 26-letter random docs with a duplicated passage sprinkled in at
      // arbitrary offsets, so both dup and non-dup windows are exercised
      val passage = randWord(rnd, 120)
      val docs = (1L to 30L).map { id =>
        val t = randWord(rnd, 40 + rnd.nextInt(200))
        val withDup = if (id % 3 == 0) {
          val at = rnd.nextInt(t.length)
          t.substring(0, at) + passage + t.substring(at)
        } else t
        id -> withDup
      }
      val expected = refAnchored(docs, window = 32, stride = 8, g = 4)
      val got = Dedup.duplicatedSpansAnchored(docs.toDF("doc_id", "text"),
          window = 32, stride = 8, anchorGram = 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("p"),
          r.getAs[Long]("h"), r.getAs[Boolean]("is_dup"))).toSet
      assert(got == expected, s"seed=$seed anchored mismatch: " +
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("anchored catches misaligned duplicates that fixed-stride provably misses") {
    import spark.implicits._
    val rnd = new scala.util.Random(2027)
    // A 300-char passage shared by two documents at offsets differing by
    // 37 (37 % 32 != 0): fixed-stride-32 sampling can never hash the same
    // passage substring in both documents, content anchoring always can.
    val passage = randWord(rnd, 300)
    val docA = randWord(rnd, 100) + passage + randWord(rnd, 150)
    val docB = randWord(rnd, 137) + passage + randWord(rnd, 150)
    val noise = (3L to 12L).map(id => id -> randWord(rnd, 260))
    val docs = (Seq(1L -> docA, 2L -> docB) ++ noise).toDF("doc_id", "text")

    val fixedDups = Dedup.duplicatedSpans(docs, window = 64, stride = 32)
      .filter(col("is_dup")).collect()
    assert(fixedDups.isEmpty,
      s"fixed-stride unexpectedly paired misaligned copies: ${fixedDups.take(3).mkString}")

    val anchoredDups = Dedup.duplicatedSpansAnchored(
        docs, window = 64, stride = 32, anchorGram = 8)
      .filter(col("is_dup"))
      .select("doc_id", "p").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("p"))
    val inA = anchoredDups.collect { case (1L, p) => p }
    val inB = anchoredDups.collect { case (2L, p) => p }
    assert(inA.nonEmpty && inB.nonEmpty,
      s"anchored found no duplicates in both carriers: A=${inA.length} B=${inB.length}")
    // every flagged window sits inside the shared passage, at offsets
    // differing by exactly the 37-char shift
    assert(inA.forall(p => p > 100 && p + 64 <= 101 + passage.length))
    assert(inB.forall(p => p > 137 && p + 64 <= 138 + passage.length))
    assert(inA.map(_ + 37).toSet == inB.toSet)
  }

  // ------------------------------------------------------------- fixpoint

  test("fixpoint cut leaves zero residual duplicated windows") {
    import spark.implicits._
    Seq(5, 81).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 40L).map { id =>
        id -> Seq.fill(rnd.nextInt(22))(if (rnd.nextBoolean()) 'a' else 'b').mkString
      }
      val out = Dedup.cutDuplicatedSpansFixpoint(
        docs.toDF("doc_id", "text"), window = window, stride = 1,
        maxRounds = 16)
      val residual = Dedup.duplicatedSpans(out, window = window, stride = 1)
        .filter(col("is_dup")).count()
      assert(residual == 0L, s"seed=$seed residual duplicated windows: $residual")
      // no documents invented or lost
      val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == docs.map(_._1).toSet)
    }
  }

  test("fixpoint is the identity on an already-clean corpus") {
    import spark.implicits._
    val docs = Seq(1L -> "abcdefgh", 2L -> "ijklmnop", 3L -> "qrstuvwx")
    val out = Dedup.cutDuplicatedSpansFixpoint(
        docs.toDF("doc_id", "text"), window = 4, stride = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == docs.toMap)
  }
}
