package graft

import graft.operators.VectorOps

/** Vector-operator boundary tests. The oracle harness already
  * hash-checks every registered vector query on the real testdata; this
  * suite covers the degenerate geometry the testdata cannot produce —
  * a corpus whose vectors all land in ONE IVF cell. */
class VectorOpsSpec extends GraftSpec {
  import spark.implicits._

  test("IVF cell cap bounds a degenerately clustered corpus") {
    // 300 IDENTICAL vectors: every centroid is the same point, so the
    // argmin tiebreak (lowest cent_id) assigns the whole corpus to one
    // cell — m = 300 ≫ √N ≈ 18, the exact skew case the cap guards.
    val n = 300
    assert(n > VectorOps.CellCap, "fixture must overflow the cap")
    val v = Array.tabulate(VectorOps.Dim)(j => (j % 7 + 1).toFloat)
    val rows = (0 until n).map(i => (i.toLong, v, 0))
    writeTable("embeddings", rows.toDF("vec_id", "embedding", "label"))

    val out = VectorOps.annIvfTop1(spark, scratch).collect()

    // Every vector still queries (the cap never costs query coverage),
    // but candidates come only from the capped membership — the
    // candidate stage did at most n·NProbe·cap pair dots instead of
    // n·(n−1) ≈ 90k.
    assert(out.length == n, s"expected $n query rows, got ${out.length}")
    assert(out.forall(_.getAs[Long]("cent_id") == 0L),
      "all vectors should share the single degenerate cell")
    // Identical vectors → all cosines 1; tiebreak picks the lowest
    // other id within the CAPPED membership (ids 0..cap-1).
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val c = r.getAs[Long]("c_id")
      assert(c < VectorOps.CellCap, s"uncapped candidate $c for q=$q")
      assert(c == (if (q == 0L) 1L else 0L), s"q=$q picked c=$c")
      assert(r.getAs[Double]("cosine") > 0.999)
    }
    assert(out.map(_.getAs[Long]("q_id")).toSet ==
      (0L until n.toLong).toSet)
  }

  test("cluster sample honors the quota against the profile's census") {
    // Real-corpus invariants tying the two trained-quantizer consumers
    // together: the sample must draw from exactly the profile's
    // clusters, take min(quota, n_members) from each, and rank densely
    // from 1 — any drift between the two assignment paths (they share
    // trainedAssignment, but a refactor could fork them) breaks this.
    val dir = "/root/testdata/sf0.001"
    val census = VectorOps.clusterProfile(spark, dir).collect()
      .map(r => r.getAs[Long]("cent_id") -> r.getAs[Long]("n_members"))
      .toMap
    val sample = VectorOps.clusterSample(spark, dir).collect()
    val byCluster = sample.groupBy(_.getAs[Long]("cent_id"))
    assert(byCluster.keySet == census.keySet,
      "sample clusters must match the profile's")
    byCluster.foreach { case (cid, rows) =>
      val expected = math.min(census(cid), VectorOps.SampleQuota.toLong)
      assert(rows.length.toLong == expected,
        s"cluster $cid: ${rows.length} sampled, expected $expected")
      assert(rows.map(_.getAs[Int]("samp_rank")).sorted.toSeq ==
        (1 to rows.length), s"cluster $cid ranks not dense")
    }
    // No vector is sampled twice (quota is per cluster, assignment is
    // a partition of the corpus).
    val ids = sample.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("PQ codes honor the argmin contract against their own LUTs") {
    // 128 DISTINCT vectors (distinct residues mod 257 per subspace —
    // no legitimate ties) → seed stride ⌈128/64⌉ = 2. After the Lloyd
    // round: every vector's code must point at the minimum of its own
    // LUT in every subspace (code = argmin is THE encode contract),
    // codes must index inside the surviving-entry range, and all
    // vectors must agree on each subspace's entry count.
    val n = 128
    val rows = (0 until n).map { i =>
      (i.toLong,
        Array.tabulate(VectorOps.Dim)(j => ((i * 31 + j * 17) % 257 + 1).toFloat),
        0)
    }
    // Own fixture dir: the PQ index memo keys on (session, dir) and the
    // suite's shared scratch is rewritten by the other tests.
    val dir = freshScratch()
    writeTable("embeddings", rows.toDF("vec_id", "embedding", "label"), dir)
    val pq = VectorOps.pqEncode(spark, dir, n.toLong).collect()
    assert(pq.length == n)
    val lutLens = Array.fill(VectorOps.PqSubspaces)(-1)
    pq.foreach { r =>
      (0 until VectorOps.PqSubspaces).foreach { s =>
        val code = r.getAs[Int](s"code$s")
        val lut = r.getAs[collection.Seq[Double]](s"l$s")
        if (lutLens(s) < 0) lutLens(s) = lut.length
        assert(lut.length == lutLens(s),
          s"inconsistent entry count in subspace $s")
        assert(code >= 0 && code < lut.length, s"code$s out of range: $code")
        assert(lut(code) == lut.min,
          s"code$s is not the argmin of its LUT (vec ${r.getAs[Long]("vec_id")})")
      }
    }
  }

  test("PQ ADC is lossless on a corpus of codebook copies") {
    // 15 prototypes × 4 copies: round-0 assignment sends every copy to
    // its prototype's first copy (distance exactly 0, min-rank tie),
    // so each surviving trained entry is the MEAN OF IDENTICAL COPIES
    // = the prototype itself up to the 12-digit decimal mean rounding.
    // Quantization therefore loses (almost) nothing: the top-1 must be
    // a same-prototype copy at ADC ≈ 0 (≤ 1e-9 — the decimal rounding
    // of the means is the only slack), while cross-prototype distances
    // are ≥ 1 by construction.
    val protos = (0 until 15).map(p =>
      Array.tabulate(VectorOps.Dim)(j => ((p * 37 + j * 11) % 17 + 1).toFloat))
    val rows = (0 until 60).map(i => (i.toLong, protos(i / 4), 0))
    // Own fixture dir (PQ memo keys on (session, dir) — see above).
    val dir = freshScratch()
    writeTable("embeddings", rows.toDF("vec_id", "embedding", "label"), dir)
    val out = VectorOps.annPqTop1(spark, dir).collect()
    assert(out.length == 60)
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val c = r.getAs[Long]("c_id")
      assert(c / 4 == q / 4,
        s"q=$q (proto ${q / 4}) matched c=$c (proto ${c / 4})")
      assert(math.abs(r.getAs[Double]("adc_dist")) <= 1e-9,
        s"near-lossless corpus must score ~0, got ${r.getAs[Double]("adc_dist")} for q=$q")
    }
  }

  test("MIH finds exact Hamming-1 neighbors and drops stop buckets") {
    val dir = freshScratch()
    // Base vector: alternating signs. Neighbor: ONE dimension flipped →
    // Hamming 1; pigeonhole guarantees the pair shares 7 of 8 bands, so
    // MIH candidate generation MUST surface it (no luck involved).
    val base = Array.tabulate(VectorOps.Dim)(j =>
      if (j % 2 == 0) 1.0f else -1.0f)
    val flip1 = base.clone(); flip1(5) = -flip1(5)
    // A far vector: first half flipped → Hamming 32 from base, but its
    // SECOND-half bands still equal base's, so it becomes a candidate —
    // verification must rank it behind the true neighbor.
    val far = Array.tabulate(VectorOps.Dim)(j =>
      if (j < 32) -base(j) else base(j))
    writeTable("embeddings", Seq(
      (1L, base, 0), (2L, flip1, 0), (3L, far, 0)
    ).toDF("vec_id", "embedding", "label"), dir)
    val out = VectorOps.annMihTop1(spark, dir).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("c_id"), r.getAs[Int]("hamming"))).toMap
    assert(out(1L) == (2L, 1))  // exact nearest, found by pigeonhole
    assert(out(2L) == (1L, 1))
    // far↔flip1 share the flipped dim 5, so 31 beats far↔base's 32.
    assert(out(3L) == (2L, 31))

    // Stop-bucket guard: a bucket above the cap is dropped WHOLE. With
    // cap+2 identical vectors, every band bucket overflows → no
    // candidates at all, and the query returns empty rather than
    // exploding |bucket|² pairs.
    val dir2 = freshScratch()
    val many = (0 until VectorOps.MihBucketCap + 2).map(i =>
      (i.toLong, base, 0))
    writeTable("embeddings", many.toDF("vec_id", "embedding", "label"), dir2)
    assert(VectorOps.annMihTop1(spark, dir2).count() == 0L)
  }

  test("RP-256 pairs duplicates at Hamming 0 and ranks negations last") {
    val dir = freshScratch()
    // Distinct irrational-ish magnitudes so no projection sums to
    // exactly 0 (the masks are fixed, so this is deterministic once
    // green). A vector and its exact DUPLICATE share all 256 bits;
    // its NEGATION flips every strictly-signed projection, so the
    // duplicate must win the rerank with cosine 1 at hamming 0.
    val base = Array.tabulate(VectorOps.Dim)(j =>
      (math.sqrt(j + 2.0) * (if (j % 3 == 0) -1 else 1)).toFloat)
    val neg = base.map(-_)
    writeTable("embeddings", Seq(
      (1L, base, 0), (2L, base.clone(), 0), (3L, neg, 0)
    ).toDF("vec_id", "embedding", "label"), dir)
    val out = VectorOps.annRpRerankTop1(spark, dir).collect()
      .map(r => r.getAs[Long]("q_id") ->
        ((r.getAs[Long]("c_id"), r.getAs[Int]("hamming"),
          r.getAs[Double]("cosine")))).toMap
    assert(out(1L)._1 == 2L && out(1L)._2 == 0)
    assert(math.abs(out(1L)._3 - 1.0) <= 1e-9)
    assert(out(2L)._1 == 1L && out(2L)._2 == 0)
    // The negation's only candidates are the two (identical) opposites;
    // if any band of ±base agrees the pair surfaces and reranks to
    // cosine −1 — either way vec 3 must never report a positive cosine.
    out.get(3L).foreach { case (_, _, cos) => assert(cos <= 0.0) }

    // Stop-bucket guard, RP flavor: identical vectors overflow every
    // (band, value) bucket past RpBucketCap → dropped whole, no pairs.
    val dir2 = freshScratch()
    val many = (0 until VectorOps.RpBucketCap + 2).map(i =>
      (i.toLong, base, 0))
    writeTable("embeddings", many.toDF("vec_id", "embedding", "label"), dir2)
    assert(VectorOps.annRpRerankTop1(spark, dir2).count() == 0L)
  }

  test("matryoshka audit: every prefix covers all queries and the " +
      "full-dim row is exact by construction") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.Tables.embeddings(spark, dir).count()
    val rows = VectorOps.matryoshkaRecall(spark, dir).collect()
      .map(r => r.getAs[Int]("k_dims") ->
        (r.getAs[Long]("n_queries"), r.getAs[Long]("n_match")))
      .toMap
    assert(rows.keySet == VectorOps.MatryoshkaDims.toSet)
    rows.foreach { case (k, (q, m)) =>
      assert(q == n, s"k=$k must cover all $n queries, saw $q")
      assert(m >= 0 && m <= q, s"k=$k recall count out of range: $m/$q")
    }
    // The k=Dim pick IS the reference pick, so its recall is 1 by
    // construction — a refactor that forks the two pick paths (e.g.
    // different tie-breaks) fails here before it fails cross-engine.
    assert(rows(VectorOps.Dim)._2 == n)
  }

  test("semantic decontam rows respect the hash split and the " +
      "threshold flag") {
    val dir = "/root/testdata/sf0.001"
    // The spec recomputes the split band independently (plain JDK md5,
    // not Spark), so a drifted hash expression cannot hide.
    def band(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val rows = VectorOps.semanticDecontam(spark, dir).collect()
    assert(rows.nonEmpty, "sf0.001 must surface cross-split candidates")
    rows.foreach { r =>
      val (v, t) = (r.getAs[Long]("val_id"), r.getAs[Long]("train_id"))
      assert(band(v) < VectorOps.DecontamValPct, s"val_id $v not in val")
      assert(band(t) >= VectorOps.DecontamValPct, s"train_id $t in val")
      val cos = r.getAs[Double]("cosine")
      assert(cos >= -1.0000001 && cos <= 1.0000001)
      // Flag vs emitted (9 dp-rounded) cosine: only assert away from
      // the threshold, where rounding cannot flip the comparison.
      if (math.abs(cos - VectorOps.NearDupMinCosine) > 1e-6)
        assert(r.getAs[Boolean]("contaminated") ==
          (cos >= VectorOps.NearDupMinCosine))
    }
    // Each val vector reports at most one (its best) train neighbor.
    assert(rows.map(_.getAs[Long]("val_id")).distinct.length == rows.length)
  }

  test("dim quantiles interpolate exactly and the Tukey fences flag the planted spike") {
    // 6 vectors × 2 dims, hand-computable: dim 1 quantizes to
    // [0, 10, 20, 30, 40, 1000] milli-units (n−1 = 5, so every
    // quartile position lands BETWEEN ranks and the integer
    // interpolation path is genuinely exercised: frac = 25/50/75),
    // dim 2 is constant 0.5 (the dead-dimension screen: IQR = 0).
    val d1 = Seq(0f, 0.01f, 0.02f, 0.03f, 0.04f, 1f)
    val rows = d1.zipWithIndex.map { case (v, k) =>
      (k.toLong, Array(v, 0.5f), 0)
    }
    val dir = freshScratch()
    writeTable("embeddings", rows.toDF("vec_id", "embedding", "label"),
      dir)

    val q = VectorOps.embeddingDimQuantiles(spark, dir).collect()
    assert(q.map(_.getAs[Int]("i")).toSeq == Seq(1, 2))
    val byDim = q.map(r => r.getAs[Int]("i") -> r).toMap
    // q25 at pos 1 + 125/100 = rank 2 + 0.25: 10·100 + (20−10)·25.
    assert(byDim(1).getAs[Long]("q25_centi") == 1250L)
    assert(byDim(1).getAs[Long]("q50_centi") == 2500L)
    assert(byDim(1).getAs[Long]("q75_centi") == 3750L)
    assert(byDim(1).getAs[Long]("iqr_centi") == 2500L)
    assert(byDim(2).getAs[Long]("q50_centi") == 50000L)
    assert(byDim(2).getAs[Long]("iqr_centi") == 0L)

    val o = VectorOps.embeddingRobustOutliers(spark, dir).collect()
      .map(r => r.getAs[Int]("i") -> r).toMap
    // dim 1: hi fence (doubled centi) = 2·3750 + 3·2500 = 15000, so
    // only qv = 1000 (200·1000 > 15000) trips it; lo fence is negative.
    assert(o(1).getAs[Long]("n_out_lo") == 0L)
    assert(o(1).getAs[Long]("n_out_hi") == 1L)
    assert(o(1).getAs[Long]("out_mille") == 166L)
    // dim 2: zero IQR collapses both fences onto the constant value —
    // strict inequalities mean a constant dimension NEVER self-flags.
    assert(o(2).getAs[Long]("n_out_lo") == 0L)
    assert(o(2).getAs[Long]("n_out_hi") == 0L)
  }

  test("sq8 audit: error laws hold and smooth data sits near half a step") {
    val dir = "/root/testdata/sf0.001"
    val rows = VectorOps.sq8QuantizationAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("scale_micro") > 0L, s"dead scale: $r")
      val (mean, mx) = (r.getAs[Long]("mean_err_steps_micro"),
        r.getAs[Long]("max_err_steps_micro"))
      // Fractional error lives in [0, 1) quant steps by construction.
      assert(mean >= 0L && mean <= mx && mx < 1000000L)
      // Smooth (non-grid-aligned) data floors to ~uniform fractions:
      // the per-dimension mean must sit near half a step.
      assert(mean > 300000L && mean < 700000L,
        s"mean error off the smooth-data band: $r")
    }
  }
}
