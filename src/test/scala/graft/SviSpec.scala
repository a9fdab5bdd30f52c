package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the [[Svi]] family-normalized suite-vs-isolated classifier on
  * synthetic (suite, isolated, prior, control) fixtures — the r16
  * verdict's lead order. The two headline fixtures are the r16 driver
  * record's FALSE "regression" labels, replayed with the exact numbers
  * bench_line.json recorded: family normalization must flip both to
  * box_reprice while a genuine regression (isolated ≈ suite on a
  * same-box run) must still be called out. */
class SviSpec extends AnyFunSuite {

  // The r16 driver record's box_drift map (bench_line.json,
  // prior_box_mismatch: true, global median 1.424).
  private val r16Drift = Map(
    "ann_ivf_top1" -> 3.283, "neardup_jaccard" -> 1.424,
    "oov_rate" -> 2.034, "doc_chunks" -> 1.06,
    "simhash_pairs" -> 1.194, "minhash_calibration" -> 1.157,
    "ann_rp_multiprobe_top1" -> 1.224,
    "neardup_jaccard_prefix" -> 0.8, "dsir_weights" -> 2.846,
    "ann_ivf_trained_top1" -> 2.258)
  private val r16Global = 1.424

  private def classify(name: String, suite: Double, iso: Double,
      prior: Double, drifts: Map[String, Double] = r16Drift,
      global: Double = r16Global, mismatch: Boolean = true): String = {
    val d = Svi.familyDrift(drifts, Svi.familyOf(name), name, global)
    Svi.verdict(suite, iso, prior, d, mismatch || Svi.driftMismatch(d))
  }

  test("familyOf dispatches ANN before posting before token") {
    assert(Svi.familyOf("ann_lsh_top1") == "embedding")
    assert(Svi.familyOf("lsh_band_planner") == "posting")
    assert(Svi.familyOf("sq8_quantization_audit") == "embedding")
    assert(Svi.familyOf("shingle_df_profile") == "posting")
    assert(Svi.familyOf("winnow_fingerprints") == "posting")
    assert(Svi.familyOf("dsir_weights") == "token")
    assert(Svi.familyOf("doc_chunks") == "token")
    assert(Svi.familyOf("oov_rate") == "token")
    assert(Svi.familyOf("customer_rollup") == "rollup")
    assert(Svi.familyOf("daily_order_analytics") == "rollup")
    assert(Svi.familyOf("layout_pruning_sim") == "rollup")
  }

  test("familyDrift excludes self and falls back to global") {
    // dsir_weights' own 2.846 must not price its own control: the
    // token family without it is {oov_rate 2.034, doc_chunks 1.06}.
    assert(Svi.familyDrift(r16Drift, "token", "dsir_weights",
      r16Global) == 2.034)
    // A family with no sentinel at all gets the global median.
    assert(Svi.familyDrift(r16Drift, "rollup", "customer_rollup",
      r16Global) == r16Global)
  }

  test("r16 false label #1: dsir_weights flips to box_reprice") {
    // r16 driver svi: suite 2.345, isolated 1.787, prior 0.818 —
    // iso/prior = 2.18×, token-family control (oov_rate) at 2.03×.
    // The global-median rule (1.424 × 1.3 = 1.85 bound) called this
    // "regression"; the family rule (2.034 × 1.3 = 2.64 bound) must
    // not.
    assert(classify("dsir_weights", 2.345, 1.787, 0.818)
      == "box_reprice")
  }

  test("r16 false label #2: sq8_quantization_audit flips to box_reprice") {
    // r16 driver svi: suite 0.970, isolated 0.920, prior 0.305 —
    // iso/prior = 3.0×, embedding controls 2.26–3.28×. With
    // ann_rp_multiprobe_top1 retired from the standing set the
    // embedding control median is 3.283; even with it present (the
    // full r16 map, median 2.258) the 2.258 × 1.3 = 2.94 bound is
    // within the ±0.05 s slack of iso = 0.920 (bound 0.305 × 2.258 ×
    // 1.3 + 0.05 = 0.945 ≥ 0.920).
    assert(classify("sq8_quantization_audit", 0.970, 0.920, 0.305)
      == "box_reprice")
  }

  test("a genuine regression still labels as regression") {
    // Same-box run (mismatch down, drifts ≈ 1): isolated ≈ suite at
    // 3× prior is real and must say so.
    val sameBox = r16Drift.map { case (k, _) => k -> 1.0 }
    assert(classify("customer_rollup", 0.66, 0.62, 0.21,
      sameBox, 1.0, mismatch = false) == "regression")
    // And even on a mismatched box, an entry far beyond its family's
    // drift envelope is NOT excused: token control 2.034, but
    // iso/prior = 6×.
    assert(classify("dsir_weights", 5.0, 4.9, 0.818) == "regression")
  }

  test("noise and unclassified bands are unchanged") {
    assert(classify("customer_rollup", 1.5, 0.25, 0.21) == "noise")
    // isolated ≫ suite: the isolated-phase artifact band.
    assert(classify("dsir_weights", 1.0, 4.0, 0.818) == "unclassified")
  }

  test("box_reprice is unreachable on a same-box run") {
    // famDrift ≈ 1 collapses the reprice bound into the noise bound:
    // anything past prior × 1.3 on a same-box run must read as
    // regression or unclassified, never box_reprice.
    val sameBox = r16Drift.map { case (k, _) => k -> 1.0 }
    for (iso <- Seq(0.3, 0.5, 1.0, 2.0);
         suite <- Seq(0.3, 1.0, 3.0)) {
      val v = classify("oov_rate", suite, iso, 0.2, sameBox, 1.0,
        mismatch = false)
      assert(v != "box_reprice", s"iso=$iso suite=$suite → $v")
    }
  }
}
