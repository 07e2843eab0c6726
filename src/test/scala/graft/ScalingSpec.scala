package graft

import graft.tools.ScalingCurve
import org.scalatest.funsuite.AnyFunSuite

/** The scaling-curve harness is a regression GATE, so its math and its
  * committed measurement record are both pinned: the exponent fit must be
  * exact on synthetic curves, the classification bands must catch the
  * superlinear class (the r11 PageRank lineage bug read e ≈ 2), and the
  * checked-in `scaling_out.json` — the round's actual measurement — must
  * stay under the bound and cover the asymptotic-sensitive subset. */
class ScalingSpec extends AnyFunSuite {

  test("exponent fit is exact on synthetic power-law curves") {
    assert(math.abs(ScalingCurve.exponent(1.0, 10.0, 10.0) - 1.0) < 1e-12,
      "10x time over 10x data is linear")
    assert(math.abs(ScalingCurve.exponent(1.0, 100.0, 10.0) - 2.0) < 1e-12,
      "100x time over 10x data is quadratic")
    assert(math.abs(ScalingCurve.exponent(0.5, 0.5, 10.0)) < 1e-12,
      "flat time is constant")
    assert(ScalingCurve.exponent(1.0, 0.8, 10.0) < 0,
      "time can shrink (AQE coalescing at tiny sf) — negative exponent, not an error")
    intercept[IllegalArgumentException] { ScalingCurve.exponent(0.0, 1.0, 10.0) }
  }

  test("classification bands: the superlinear class is caught, the floor is not") {
    assert(ScalingCurve.classify(0.05) == "constant")
    assert(ScalingCurve.classify(0.5) == "sublinear")
    assert(ScalingCurve.classify(1.0) == "linear")
    assert(ScalingCurve.classify(ScalingCurve.Bound) == "linear", "bound is inclusive")
    assert(ScalingCurve.classify(1.9) == "SUPERLINEAR",
      "a quadratic plan (~e=2 per 10x step) must classify as a regression")
  }

  test("the committed 4-point record keeps the worst entries sublinear over a fourth decade") {
    // tools.ScaleUp synthesizes a local 10x corpus (customer/lineitem/
    // documents — Caesar-rotated text keeps the duplicate rate constant,
    // plain duplication would measure a pair-explosion artifact) and the
    // harness extends the FIVE worst r12 exponents to a 4th point; the
    // recorded exponent is the largest decade's (sf0.1 -> sf1).
    val p = java.nio.file.Paths.get("/root/repo/scaling_out4.json")
    assume(java.nio.file.Files.exists(p), "no scaling_out4.json committed yet")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val worst = """"worst":\{"entry":"[^"]+","exponent":(-?[0-9.]+)\}""".r
      .findFirstMatchIn(text).map(_.group(1).toDouble)
    assert(worst.nonEmpty && worst.get <= ScalingCurve.Bound,
      s"4-point record superlinear (worst=$worst)")
    assert(text.contains(""""failed":[]"""), "4-point record contains failed entries")
    val expected = Seq("rq75_group_median", "gx_corpus_triangles",
      "dd_containment", "dd_source_overlap", "dd_edit_distance")
    val missing = expected.filterNot(n => text.contains("\"" + n + "\""))
    assert(missing.isEmpty, s"4-point record lost entries: $missing")
    // Four sf dirs → four time points per entry.
    val times = """"times":\[([^\]]+)\]""".r.findAllMatchIn(text)
      .map(_.group(1).split(',').length).toSeq
    assert(times.nonEmpty && times.forall(_ == 4),
      s"4-point record must hold 4 times per entry, got $times")
  }

  test("the committed scaling record stays under the bound and covers the subset") {
    val p = java.nio.file.Paths.get("/root/repo/scaling_out.json")
    assume(java.nio.file.Files.exists(p), "no scaling_out.json committed yet")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // Worst exponent recorded by the harness itself.
    val worst = """"worst":\{"entry":"[^"]+","exponent":(-?[0-9.]+)\}""".r
      .findFirstMatchIn(text).map(_.group(1).toDouble)
    assert(worst.nonEmpty, "scaling_out.json lost its worst-exponent record")
    assert(worst.get <= ScalingCurve.Bound,
      s"committed scaling record shows a superlinear entry (worst=${worst.get}) — " +
        "re-run graft.tools.ScalingCurve and fix the plan before re-recording")
    assert(text.contains(""""failed":[]"""),
      "committed scaling record contains failed entries")
    // Every default entry must appear in the record (no silent coverage drop).
    val missing = ScalingCurve.DefaultEntries.filterNot(n => text.contains("\"" + n + "\""))
    assert(missing.isEmpty, s"scaling record lost entries: $missing")
  }

  test("the committed skipping-ladder record: planning stays metadata-flat over three decades") {
    // tools.SkipScale isolates the PROBE phases of the storage skipping
    // tiers (bucket blooms, zone maps, hidden day partitioning) from the
    // honest-linear table build, across sf0.01 → sf0.1 → synthetic sf1.
    // The claim under pin: scan PLANNING is metadata work — O(buckets +
    // admitted files) — so a 10× data step must not move it by more than
    // the sublinear band, and the pruned end-to-end probes grow with
    // admitted bytes, never table bytes. A planning exponent near 1
    // means a tier silently stopped refuting (the harness itself caught
    // exactly that once: an undersized, saturated bucket bloom admits
    // every bucket — hence the cardinality-sizing contract).
    val p = java.nio.file.Paths.get("/root/repo/skipscale_out.json")
    assume(java.nio.file.Files.exists(p), "no skipscale_out.json committed yet")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val probes = Seq("plan_bloom_point", "plan_zone_range", "plan_day_range",
      "plan_day_count", "e2e_bloom_point", "e2e_zone_range")
    val recorded = """"([a-z0-9_]+)": \{"times": \[[^\]]+\], "exponent": (-?[0-9.Ee]+)\}""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
    val missing = probes.filterNot(recorded.contains)
    assert(missing.isEmpty, s"skipping-ladder record lost probes: $missing")
    recorded.foreach { case (probe, e) =>
      // Planning is pure metadata work, and its probes are de-noised
      // (2 warmups + min-of-7, side-effect-free) — so the gate holds
      // them near the real ≤0.3 behavior; a looser bound would let a
      // tier that stopped refuting hide inside sampling variance. The
      // e2e probes carry admitted-bytes growth and keep the wider band.
      val bound = if (probe.startsWith("plan_")) 0.3 else 0.75
      assert(e <= bound,
        s"skipping-ladder probe '$probe' grew past its band " +
          s"(exponent $e > $bound) — a pruning tier stopped refuting")
    }
  }
}
