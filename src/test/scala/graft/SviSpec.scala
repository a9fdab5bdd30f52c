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

  test("familyOf: training memos split from embedding probes (r17 " +
      "verdict order #2); r17 names leave the rollup default") {
    // The iterative trainer memos are their own workload class…
    assert(Svi.familyOf("trained_centroids") == "training")
    assert(Svi.familyOf("pq_index") == "training")
    // …while probe-time queries over the trained artifacts stay
    // embedding (their runtime is index lookup, not training).
    assert(Svi.familyOf("ann_ivf_trained_top1") == "embedding")
    assert(Svi.familyOf("ann_pq_top1") == "embedding")
    assert(Svi.familyOf("pq_distortion") == "embedding")
    // r17 advisor finding: the new corpus-scan names no longer fall
    // to the rollup default.
    assert(Svi.familyOf("quantile_sketch") == "token")
    assert(Svi.familyOf("quantile_sketch_grouped") == "token")
    assert(Svi.familyOf("quantile_sketch_calibration") == "token")
    assert(Svi.familyOf("length_quantile_sketch") == "token")
    assert(Svi.familyOf("dup_graph_pagerank") == "posting")
    assert(Svi.familyOf("embedding_dim_quantiles") == "embedding")
    // The standing sentinel set keeps its family coverage map
    // (Bench.scala's comment): embedding ×2, posting ×2, token ×3,
    // rollup ×1.
    assert(Seq("ann_ivf_top1", "ann_ivf_trained_top1")
      .forall(Svi.familyOf(_) == "embedding"))
    assert(Seq("neardup_jaccard", "neardup_jaccard_prefix")
      .forall(Svi.familyOf(_) == "posting"))
    assert(Seq("oov_rate", "dsir_weights", "doc_chunks")
      .forall(Svi.familyOf(_) == "token"))
    assert(Svi.familyOf("customer_rollup") == "rollup")
  }

  test("every registered query and memo maps to a defined family") {
    val memoNames = Seq("cc_labels", "customer_rollup_memo",
      "exact_top1", "hilbert_lut", "lsh_scored_pairs", "minhash_pairs",
      "neardup_pairs", "pq_index", "product_rollup_memo",
      "rp_multiprobe_shortlist", "mih_shortlist", "rp_shortlist",
      "pq_shortlist", "semantic_cc_labels", "tf_frame",
      "trained_centroids", "winnow_pairs")
    val fams = Set("embedding", "posting", "token", "rollup", "training")
    (SparkEntry.queries.keys ++ memoNames).foreach { n =>
      assert(fams.contains(Svi.familyOf(n)), n)
    }
    // The trainer memos are the only TRAINING members today — a new
    // name landing there must be a deliberate choice, not a pattern
    // accident.
    val training = (SparkEntry.queries.keys ++ memoNames)
      .filter(Svi.familyOf(_) == "training").toSet
    assert(training == Set("trained_centroids", "pq_index"))
  }

  test("r17 unclassified replay: trained_centroids prices against " +
      "the global median once training is its own family") {
    // r17 driver record: trained_centroids memo at suite 3.376 s,
    // prior 1.586 s on a mismatched box (global median 1.955×), with
    // the embedding probe controls drifting only ~1.04× — the
    // embedding-family bound (1.586 × 1.04 × 1.3 + 0.05 ≈ 2.19) left
    // an isolated reading near 2.25 s (below the regression band's
    // 3.376 × 0.7 − 0.05 ≈ 2.31 floor) `unclassified` on untouched
    // code.
    val drifts = Map("ann_ivf_top1" -> 1.04,
      "ann_ivf_trained_top1" -> 1.04, "neardup_jaccard" -> 1.9,
      "oov_rate" -> 2.0, "customer_rollup" -> 1.955)
    val global = 1.955
    // training has no sentinel → familyDrift falls back to the global
    // median → bound 1.586 × 1.955 × 1.3 + 0.05 ≈ 4.08 covers it.
    assert(classify("trained_centroids", 3.376, 2.25, 1.586,
      drifts, global) == "box_reprice")
    // An embedding-family entry with the same numbers is NOT excused —
    // the family split, not a loosened band, is what fixes the label.
    assert(classify("pq_distortion", 3.376, 2.25, 1.586,
      drifts, global) == "unclassified")
  }

  test("famGate: family drift alone cannot excuse a family-wide " +
      "regression on a flat box (r17 advisor finding)") {
    // Global mismatch flag up → gate open regardless of family drift.
    assert(Svi.famGate(1.0, 1.955, priorBoxMismatch = true))
    // Partial box reprice: family 1.8×, global echoes at 1.2× (past
    // the √1.3 weak band but under the 1.3× flag) → open.
    assert(Svi.famGate(1.8, 1.2, priorBoxMismatch = false))
    assert(Svi.famGate(0.6, 0.8, priorBoxMismatch = false))
    // Lone drifting family on a flat box → closed, and flagged.
    assert(!Svi.famGate(1.8, 1.0, priorBoxMismatch = false))
    assert(Svi.familySuspect(1.8, 1.0))
    // Opposite-direction global → closed (no corroboration), but not
    // the suspect signature either (the box DID move, just the other
    // way).
    assert(!Svi.famGate(1.8, 0.75, priorBoxMismatch = false))
    assert(!Svi.familySuspect(1.8, 0.75))
    // In-band family drift is never suspect and opens nothing by
    // itself.
    assert(!Svi.famGate(1.1, 1.2, priorBoxMismatch = false))
    assert(!Svi.familySuspect(1.1, 1.0))
  }

  test("family-wide regression end-to-end: correlated posting drift " +
      "on a flat box labels regression, not box_reprice") {
    // Both posting sentinels slow 1.6× together; every other family
    // and the global median sit at ~1.0 — the r17 advisor's scenario.
    val drifts = Map("ann_ivf_top1" -> 1.0,
      "ann_ivf_trained_top1" -> 1.02, "neardup_jaccard" -> 1.6,
      "neardup_jaccard_prefix" -> 1.62, "oov_rate" -> 0.98,
      "dsir_weights" -> 1.0, "doc_chunks" -> 1.01,
      "customer_rollup" -> 1.0)
    val global = 1.01
    def gateClassify(name: String, suite: Double, iso: Double,
        prior: Double): String = {
      val d = Svi.familyDrift(drifts, Svi.familyOf(name), name, global)
      Svi.verdict(suite, iso, prior, d,
        Svi.famGate(d, global, priorBoxMismatch = false))
    }
    // A posting entry at 1.6× prior with isolated ≈ suite: before the
    // gate this self-excused as box_reprice via its family's own
    // (regression-inflated) drift; now it must read as real.
    assert(gateClassify("minhash_pairs", 3.2, 3.25, 2.0) == "regression")
    // The sentinels themselves (self-excluded, priced by each other)
    // must not excuse each other either.
    assert(gateClassify("neardup_jaccard", 3.2, 3.25, 2.0)
      == "regression")
    // And the family-level medians flag posting as the suspect.
    val famMedians = drifts.groupBy { case (n, _) => Svi.familyOf(n) }
      .map { case (f, m) =>
        val s = m.values.toSeq.sorted; f -> s(s.size / 2) }
    assert(famMedians.filter { case (_, d) =>
      Svi.familySuspect(d, global) }.keySet == Set("posting"))
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
