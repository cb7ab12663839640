package graft.ops

import graft.SparkSpec

/** ANN recall floors at SCALED corpus size (32× = 64,000 vectors) — the
  * quality companion to the wall-time ScaleDrill: an index change that
  * stays fast but silently stops retrieving near-duplicates fails here.
  *
  * Everything is deterministic (closed-form hashes/centroids, fixed
  * testdata, fixed perturbations), so the measured values are exactly
  * reproducible; the floors sit a margin under them to absorb only
  * intentional parameter retuning. Measured at 64k/k=10/20 probes
  * (graft.AnnRecallDrill, recorded in COVERAGE.md):
  *
  *   method          recall@10   planted
  *   quantized         1.000      1.000
  *   pq                0.945      1.000
  *   ivf_pq            0.940      1.000
  *   ivf               0.860      0.970
  *   lsh_multiprobe    0.805      0.970
  *   lsh (1-probe)     0.495      0.670
  *
  * `planted` — recall over per-probe planted near-duplicates (cos ≈
  * 0.97–0.999) — is the floor that matters: it is the dedup/similarity
  * payload these indexes exist for. Full-top-10 recall on this
  * near-random corpus is structurally hard for angular LSH (documented in
  * SimilarityScaleSpec) and floors only guard degradation. */
class AnnRecallScaleSpec extends SparkSpec {

  test("recall floors hold on the 32x (64k-vector) corpus") {
    val rec = graft.AnnRecallDrill.measure(spark, "/root/testdata/sf0.1", 32)
    // (method, overall floor, planted floor)
    val floors = Seq(
      ("quantized", 0.95, 0.99),
      ("pq", 0.85, 0.95),
      ("ivf_pq", 0.85, 0.95),
      ("ivf", 0.75, 0.90),
      ("lsh_multiprobe", 0.65, 0.90),
      ("lsh", 0.35, 0.50))
    val broken = floors.flatMap { case (m, fo, fp) =>
      val (r, p) = rec(m)
      if (r < fo || p < fp)
        Some(f"$m: recall $r%.3f (floor $fo) planted $p%.3f (floor $fp)")
      else None
    }
    assert(broken.isEmpty, s"recall degradation at scale:\n${broken.mkString("\n")}")
  }

  test("bandedNearDupPairs planted-pair recall floor holds at 32x") {
    // the banded op's count-adaptive band width trades candidate volume
    // against borderline-pair recall; this floor stops a retune from
    // silently trading away the near-duplicates the op exists to find.
    // Measured at 64k (deterministic, reproduces exactly): recall 0.952
    // over 292 true pairs at cos >= 0.95 within the planted family — the
    // ~5% misses are borderline plant-plant pairs just above the 0.95
    // threshold, the documented recall falloff region (COVERAGE.md).
    val (recall, truthPairs) =
      graft.AnnRecallDrill.measureBandedPairs(spark, "/root/testdata/sf0.1", 32)
    assert(truthPairs >= 100L,
      s"planted family produced too few true pairs: $truthPairs")
    assert(recall >= 0.90,
      f"banded planted-pair recall degraded at scale: $recall%.3f (floor 0.90)")
  }
}
