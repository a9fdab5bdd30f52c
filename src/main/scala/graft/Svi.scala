package graft

/** Suite-vs-isolated (svi) verdict classification, extracted from
  * [[Bench]] so the rules are unit-testable on synthetic fixtures
  * (r16 verdict order #1).
  *
  * The r16 driver run exposed the defect this object fixes: the box
  * fingerprint correctly flagged a machine change (median control
  * drift 1.424×), but per-FAMILY drift spanned 0.8× (posting joins)
  * to 3.28× (ANN/embedding), and classifying every entry against the
  * GLOBAL median let two family-priced entries (`dsir_weights` at
  * 2.18× with its token-family control at 2.03×;
  * `sq8_quantization_audit` at 3.0× with embedding controls at
  * 2.26–3.28×) read as "regression" when the harness's own box_drift
  * map refuted the label. Each entry is now classified against the
  * median drift of ITS family's sentinels (self excluded — a genuine
  * regression in a sentinel must not inflate its own control). */
object Svi {

  /** Measurement family of a query / memo name. Families group
    * workloads the box prices together: a reboot or host move
    * re-prices token-text loops, posting-grain shuffles, embedding
    * arithmetic, and plain rollup scans by DIFFERENT factors (r16:
    * 0.8–3.3× across families on one box move), so drift controls are
    * only comparable within a family. Name-pattern dispatch, first
    * match wins: ANN/vector names before posting names (so
    * `ann_lsh_top1` is embedding while `lsh_band_planner` is posting),
    * posting before token (so `shingle_df_profile` is posting while
    * `doc_chunks` is token). Default is `rollup` — the TPC-H-ish
    * scan/join/agg surface. */
  def familyOf(name: String): String = {
    val n = name.toLowerCase
    def has(ss: String*): Boolean = ss.exists(n.contains)
    // training — the ITERATIVE TRAINER memos (Lloyd rounds, PQ
    // codebook k-means). Matched before embedding: their cost is
    // dominated by repeated fit/assign rounds over checkpointed
    // frames, a workload class a box re-prices independently of
    // probe-time vector arithmetic (r17 driver record:
    // trained_centroids drifted ~2.1× while the embedding probe
    // controls sat at 1.04–1.16×, landing an `unclassified` on
    // untouched code). Probe queries over trained artifacts
    // (ann_ivf_trained_top1, ann_pq_top1, pq_distortion) stay
    // embedding — their runtime is index lookup, not training.
    if (has("centroid", "codebook", "kmeans", "lloyd", "pq_index"))
      "training"
    else if (has("ann_", "ivf", "pq_", "_pq", "embedding", "vector",
        "cosine", "cluster", "knn", "sq8", "quantiz", "mih",
        "recall_at_k"))
      "embedding"
    else if (has("neardup", "minhash", "simhash", "jaccard", "winnow",
        "dedup", "shingle", "lsh", "containment", "ppjoin", "snm_",
        "decontam", "fingerprint", "cross_dup", "span_", "paragraph",
        "pagerank"))
      "posting"
    else if (has("token", "oov", "dsir", "chunk", "pack", "mixture",
        "lang_", "quality", "ngram", "doc_", "text", "bpe",
        "stopword", "perplex", "quantile", "sketch"))
      "token"
    else "rollup"
  }

  /** Median control drift for `family`, over the measured sentinel
    * drifts (current isolated / prior isolated, from the box
    * fingerprint phase), EXCLUDING `self` — the entry being classified
    * must never be its own control. Falls back to `global` (the
    * all-sentinel median) when the family has no other control. Median
    * convention matches the fingerprint's: upper-middle on even
    * counts. */
  def familyDrift(drifts: Map[String, Double], family: String,
      self: String, global: Double): Double = {
    val fam = drifts.collect {
      case (n, d) if n != self && familyOf(n) == family => d
    }.toSeq.sorted
    if (fam.isEmpty) global else fam(fam.size / 2)
  }

  /** Whether a drift factor says "this family was re-priced" — the
    * same 1.3× band (either direction) the global box-mismatch flag
    * uses. */
  def driftMismatch(drift: Double): Boolean =
    drift > 1.3 || drift < 1.0 / 1.3

  /** Weak corroboration band for [[famGate]]: √1.3 ≈ 1.14. A real
    * box move re-prices families UNEVENLY but never in isolation —
    * the global median moves at least somewhat in the same
    * direction. */
  val WeakBand = 1.14

  /** Gate for the box_reprice verdict (r17 advisor finding): a
    * genuine code regression that slows an entire FAMILY moves that
    * family's sentinels together, so the family's own drift being
    * outside the 1.3× band must not, by itself, excuse its members —
    * self-exclusion guards one sentinel, not a correlated family-wide
    * regression. box_reprice is reachable only when the machine
    * corroborates: the global mismatch flag fired, or the family's
    * drift direction is echoed by the global median past the weak
    * √1.3 band (a partial box reprice — r16 recorded per-family
    * drifts 0.8–3.3× around a 1.42× global). A lone drifting family
    * on an otherwise-flat box falls through to the regression band —
    * see [[familySuspect]]. */
  def famGate(famDrift: Double, global: Double,
      priorBoxMismatch: Boolean): Boolean =
    priorBoxMismatch || (driftMismatch(famDrift) &&
      (if (famDrift > 1.0) global > WeakBand
       else global < 1.0 / WeakBand))

  /** The record-level flag the gate's deny branch emits: this
    * family's sentinels drifted together past the 1.3× band while the
    * global median stayed inside the weak band — on a same-box run
    * that correlation is the signature of a family-wide code
    * regression, surfaced for the judge instead of self-excused. */
  def familySuspect(famDrift: Double, global: Double): Boolean =
    driftMismatch(famDrift) &&
      global <= WeakBand && global >= 1.0 / WeakBand

  /** Self-labeled verdict for one svi entry.
    *   noise       — isolated ≈ prior: the suite number was position/
    *                 contention inflation, the code is fine.
    *   box_reprice — isolated ≈ prior × the FAMILY's measured control
    *                 drift: the machine re-priced this workload class,
    *                 not the code. Reachable only when a mismatch is
    *                 up (global flag or the family's own drift outside
    *                 the 1.3× band) — on a same-box run famDrift ≈ 1
    *                 and this bound collapses into the noise bound.
    *   regression  — isolated ≈ suite, both above what the family's
    *                 drift can explain: real.
    *   unclassified— fits no story (e.g. isolated ≫ suite: an
    *                 isolated-phase measurement artifact).
    * The 1.3× band matches the box-mismatch threshold; the 0.05 s
    * floor keeps sub-50 ms queries from flapping on scheduler noise. */
  def verdict(suite: Double, iso: Double, prior: Double,
      famDrift: Double, famMismatch: Boolean): String = {
    val slack = 0.05
    if (iso <= prior * 1.3 + slack) "noise"
    else if (famMismatch &&
        iso <= prior * math.max(1.0, famDrift) * 1.3 + slack)
      "box_reprice"
    else if (iso >= suite * 0.7 - slack && iso <= suite * 1.4 + slack)
      "regression"
    else "unclassified"
  }
}
