package graft.ops

import java.nio.file.Files

import graft.SparkSpec

/** Round-trip fuzz of the manifest body: the parser is deliberately
  * regex+depth-count (no JSON library), so every field the renderer can
  * emit — files, hwm, long stats, string stats, in any combination — must
  * survive commitIf → readHead/readStats/readStringStats bit-identically.
  * Deterministic seeded generation (no scalacheck bridge in the offline
  * cache); this is the spec that breaks FIRST if a future format change
  * and the parser drift apart. */
class ManifestJsonFuzzSpec extends SparkSpec {

  private val rng = new scala.util.Random(0xC0FFEE)

  private def pick(chars: Seq[Char], lo: Int, hi: Int): String = {
    val n = lo + rng.nextInt(hi - lo + 1)
    Seq.fill(n)(chars(rng.nextInt(chars.size))).mkString
  }

  private val fileChars = ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '_', '.')
  private val colChars = ('a' to 'z') :+ '_'
  private val safeChars = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
    Seq('_', '.', ':', '/', '+', '=', '@', '%', '-')

  private def fileName() = "f-" + pick(fileChars, 4, 24)
  private def colName() = "c" + pick(colChars, 1, 12)

  private def longRange(): (Long, Long) = {
    val a = rng.nextLong(); val b = rng.nextLong()
    (math.min(a, b), math.max(a, b))
  }

  private def strRange(): (String, String) = {
    val a = pick(safeChars, 0, 24); val b = pick(safeChars, 0, 24)
    if (a <= b) (a, b) else (b, a)
  }

  private def statsGen[R](range: () => R): Map[String, Map[String, R]] =
    Seq.fill(rng.nextInt(5))(
      fileName() -> Seq.fill(1 + rng.nextInt(3))(colName() -> range()).toMap
    ).toMap

  private def hexValue(): String =
    pick("0123456789abcdef".toSeq, 0, 64)

  test("render → parse round-trips arbitrary files/hwm/stats/sstats/bloom") {
    (1 to 60).foreach { _ =>
      val stats = statsGen(longRange _)
      val sstats = statsGen(strRange _)
      val bloom = statsGen(hexValue _)
      val extra = Seq.fill(rng.nextInt(4))(fileName())
      val all = (extra ++ stats.keys ++ sstats.keys ++ bloom.keys).distinct
      val hwm = if (rng.nextBoolean()) Some(rng.nextLong()) else None
      val dir = Files.createTempDirectory("graft-json-fuzz").toString
      val v = TableManifest.commitIf(spark, dir, all, expectedHead = 0L,
        hwm = hwm, stats = stats, sstats = sstats, bloom = bloom)
      assert(v.contains(1L))
      val (gotV, gotFiles, gotHwm) = TableManifest.readHead(spark, dir).get
      assert(gotV == 1L)
      assert(gotFiles.sorted == all.sorted)
      assert(gotHwm == hwm)
      assert(TableManifest.readStats(spark, dir) == stats)
      assert(TableManifest.readStringStats(spark, dir) == sstats)
      assert(TableManifest.readBloom(spark, dir) == bloom)
    }
  }

  test("a second commit carries stats forward only for surviving files") {
    (1 to 20).foreach { _ =>
      val stats = statsGen(longRange _)
      if (stats.nonEmpty) {
        val dir = Files.createTempDirectory("graft-json-carry").toString
        val files = stats.keys.toSeq.sorted
        TableManifest.commitIf(spark, dir, files, 0L, stats = stats)
        val keep = files.take(math.max(1, files.size / 2))
        TableManifest.commitIf(spark, dir, keep :+ "f-new.parquet", 1L)
        val carried = TableManifest.readStats(spark, dir)
        assert(carried == stats.filter(kv => keep.contains(kv._1)))
      }
    }
  }
}
