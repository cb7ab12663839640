package graft.ops

import graft.SparkSpec

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
}
