package graft

import graft.operators.{BatchOps, CdcOps, TextOps, VectorOps}

/** Structural invariants of the round-10 curation/robust-stats ops over
  * REAL testdata (sf0.001) — properties the oracle hash cannot state
  * (it only proves cross-engine equality, not that the numbers make
  * sense): clip envelopes contain their means, shares form a
  * distribution, gap counts tie to event counts, and adjacency counts
  * respect their marginals. */
class CurationInvariantsSpec extends GraftSpec {
  private val dir = "/root/testdata/sf0.001"

  test("winsorized stats: means sit inside the clip envelope") {
    val rows = CdcOps.winsorizedStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("lo"); val hi = r.getAs[Double]("hi")
      assert(lo <= hi)
      val mw = r.getAs[Double]("mean_winsor")
      assert(mw >= lo && mw <= hi,
        s"winsorized mean $mw outside [$lo, $hi] for ${r.get(0)}")
      assert(r.getAs[Long]("n_clip_lo") + r.getAs[Long]("n_clip_hi") <=
        r.getAs[Long]("n_events"))
    }
  }

  test("split drift: complete spine, shares sum to 1 per split") {
    val drift = TextOps.splitDrift(spark, dir).collect()
    assert(drift.map(_.getAs[Int]("bin")).toSeq ==
      (0 until TextOps.DriftBins))
    val trainSum = drift.map(_.getAs[Double]("train_share")).sum
    val valSum = drift.map(_.getAs[Double]("val_share")).sum
    assert(math.abs(trainSum - 1.0) < 1e-9, s"train shares sum $trainSum")
    assert(math.abs(valSum - 1.0) < 1e-9, s"val shares sum $valSum")
  }

  test("bot screen: gap count ties to event count per user") {
    CdcOps.botScreen(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_gaps") == r.getAs[Long]("n_events") - 1,
        s"user ${r.get(0)}: gaps != events - 1")
    }
  }

  test("pmi collocations: pair counts respect their marginals") {
    TextOps.pmiCollocations(spark, dir).collect().foreach { r =>
      val c12 = r.getAs[Long]("c12")
      assert(c12 <= r.getAs[Long]("c1") && c12 <= r.getAs[Long]("c2"),
        s"pair (${r.get(0)}, ${r.get(1)}): c12 exceeds a marginal")
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("dup span census: shares are proper fractions") {
    TextOps.dupSpanCensus(spark, dir).collect().foreach { r =>
      val share = r.getAs[Double]("dup_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("n_windows"))
    }
  }

  test("interval-overlap join is lossless vs a naive in-Spark self-join") {
    import graft.operators.BatchOps
    // Independent in-engine oracle (the DuckDB one shares only the
    // synthesis): brute-force all supplier pairs, no bins — the blocked
    // plan must reproduce it exactly.
    val blocked = BatchOps.shipmentOverlaps(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("overlap_days"))).toSeq.sorted
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = graft.Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("lid"),
        datediff(col("l_shipdate").cast("date"),
          to_date(lit("1992-01-01"))).cast("long").as("d0"))
      .withColumn("d1",
        col("d0") + pmod(expr("cast(conv(substring(md5(" +
          "cast(lid as string)), 1, 15), 16, 10) as bigint)"),
          lit(BatchOps.MaxTransitDays.toLong)) + lit(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3)))
    val naive = base.groupBy(_._1).map { case (supp, rows) =>
      val pairs = for {
        a <- rows; b <- rows
        if a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
      } yield math.min(a._4, b._4) - math.max(a._3, b._3) + 1
      (supp, pairs.size.toLong, pairs.sum)
    }.filter(_._2 > 0).toSeq.sorted
    assert(blocked == naive)
  }

  test("record linkage: every match is a true twin, every twin is found") {
    import graft.operators.BatchOps
    val rows = BatchOps.recordLinkage(spark, dir).collect()
    assert(rows.nonEmpty)
    // Precision 1.0 on this fixture (md5 separation) ...
    assert(rows.forall(_.getAs[Boolean]("same_entity")))
    // ... and recall 1.0: one match per injected twin.
    val nTwins = graft.Tables.customer(spark, dir)
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 3 === 0)
      .count()
    assert(rows.length.toLong == nTwins)
  }

  test("curriculum interleave: positions unique and round-robin by source") {
    val rows = TextOps.curriculumInterleave(spark, dir).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source")))
    assert(rows.map(_._1).distinct.length == rows.length)
    // pos mod n_src identifies the source — the round-robin guarantee.
    val srcs = rows.map(_._2).distinct.sorted
    val n = srcs.length.toLong
    val idx = srcs.zipWithIndex.toMap
    rows.foreach { case (pos, src) =>
      assert(pos % n == idx(src),
        s"pos $pos of $src breaks rotation")
    }
  }

  test("quantile sketch: bins ordered and p50 brackets the exact median") {
    val sketch = TextOps.lengthQuantileSketch(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("p50_bin"), r.getAs[Long]("p90_bin"),
          r.getAs[Long]("p99_bin"))).toMap
    assert(sketch.nonEmpty)
    sketch.values.foreach { case (p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99)
    }
    // The exact per-lang median must land INSIDE (or at the edge of)
    // the sketch's p50 bin — the bin-width error bound, verified.
    TextOps.lengthBoxplot(spark, dir).collect().foreach { r =>
      val lang = r.getAs[String]("lang")
      val exactP50 = r.getAs[Double]("p50")
      val bin = sketch(lang)._1
      val lo = bin * TextOps.QSketchWidth
      val hi = (bin + 1) * TextOps.QSketchWidth
      assert(exactP50 >= lo - TextOps.QSketchWidth && exactP50 <= hi,
        s"$lang: exact median $exactP50 outside sketch bin [$lo, $hi)")
    }
  }

  test("merge snapshot: branch accounting ties to base and feed") {
    val rows = CdcOps.mergeSnapshot(spark, dir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("src"))
      .view.mapValues(_.length.toLong).toMap
    val nBase = graft.Tables.customer(spark, dir).count()
    import org.apache.spark.sql.functions._
    val latest = CdcOps.upsertLatestOf(graft.Tables.events(spark, dir))
    val nLive = latest.count() // latest-per-key, deletes dropped
    val nKeys = graft.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val shift = CdcOps.MergeKeyShift
    // Every snapshot row is exactly one branch; untouched = base minus
    // the feed keys that hit the base keyspace.
    val feedKeysInBase = graft.Tables.events(spark, dir)
      .select((col("user_id") + shift).as("k")).distinct()
      .filter(col("k") < nBase).count()
    assert(bySrc.getOrElse("base", 0L) == nBase - feedKeysInBase)
    assert(bySrc.getOrElse("update", 0L) + bySrc.getOrElse("insert", 0L)
      == nLive)
    assert(rows.length.toLong <= nBase + nKeys)
  }

  test("bigram surprisal: bit totals are consistent and flags honest") {
    TextOps.bigramSurprisal(spark, dir).collect().foreach { r =>
      val n = r.getAs[Long]("n_bigrams")
      val bits = r.getAs[Long]("total_bits")
      assert(n > 0 && bits >= n) // every observed bigram scores >= 1 bit
      val avg = r.getAs[Double]("avg_bits")
      assert(math.abs(avg - bits.toDouble / n) < 1e-12)
      assert(r.getAs[Boolean]("templated") ==
        (avg < TextOps.BigramPredictableBits))
    }
  }

  test("lexical profile: count hierarchy and ratio ranges hold") {
    val rows = TextOps.lexicalProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nTyp = r.getAs[Long]("n_types")
      assert(r.getAs[Long]("hapax_count") <= nTyp && nTyp <= nTok)
      val ttr = r.getAs[Double]("type_token_ratio")
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getAs[Double]("avg_word_len") >= 1.0)
      // every token of this corpus contains a vowel, so the syllable
      // proxy is at least one group per token
      assert(r.getAs[Long]("vowel_groups") >= nTok)
    }
  }

  test("source divergence: full pair spine, TV and Jaccard in range") {
    val rows = TextOps.sourceDivergence(spark, dir).collect()
    val nSources = Tables.documents(spark, dir)
      .select("source").distinct().count()
    assert(rows.length.toLong == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_distance")
      assert(tv >= 0.0 && tv <= 1.0, s"tv $tv out of range")
      val j = r.getAs[Double]("vocab_jaccard")
      assert(j > 0.0 && j <= 1.0)
      assert(r.getAs[Long]("vocab_common") <=
        math.min(r.getAs[Long]("vocab_a"), r.getAs[Long]("vocab_b")))
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("zipf slope: negative fit over the full rank window per lang") {
    val rows = TextOps.zipfSlope(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ranks") <= TextOps.ZipfTopRanks)
      // frequencies are non-increasing in rank, so the fit cannot rise
      assert(r.getAs[Double]("zipf_slope") <= 0.0)
    }
  }

  test("time-weighted value: integral brackets and exact tie-out") {
    val rows = CdcOps.timeWeightedValue(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val totalMs = r.getAs[Long]("total_ms")
      assert(totalMs > 0)
      val twa = r.getAs[Double]("twa_value")
      assert(twa >= 0.0 && twa <= 1000.0) // value domain is [0, ~560]
      assert(math.abs(twa - r.getAs[Long]("weighted_cents_ms").toDouble /
        (totalMs.toDouble * 100.0)) < 1e-12)
    }
  }

  test("image phash census: image mass conserved, neighbor counts bounded") {
    val rows = graft.operators.MultiModalOps.imagePhashCensus(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == nDocs,
      "every image must land in exactly one hash group")
    val nbits = graft.operators.MultiModalOps.ResizeGridW *
      graft.operators.MultiModalOps.ResizeGridH
    rows.foreach { r =>
      assert(r.getAs[Long]("n_neighbor_hashes") <= nbits)
      // neighbor mass counts images, so it is at least one per
      // neighboring hash present
      assert(r.getAs[Long]("neighbor_image_mass") >=
        r.getAs[Long]("n_neighbor_hashes"))
    }
    // Hamming-1 adjacency is symmetric: total neighbor-hash edges even
    assert(rows.map(_.getAs[Long]("n_neighbor_hashes")).sum % 2 == 0)
  }

  test("hll merge rollup: day-merged registers equal the direct sketch") {
    val rows = CdcOps.hllMergeRollup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("merged_minus_direct") == 0L,
        s"${r.get(0)}: merged registers diverge from direct")
      assert(r.getAs[Long]("m_hit") <= CdcOps.HllM)
      assert(r.getAs[Long]("n_days") >= 1)
      assert(r.getAs[Double]("hll_est_merged") > 0.0)
    }
  }

  test("gauge resample: grid-aligned, bracketed, convex interpolation") {
    val rows = CdcOps.gaugeResample(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("grid_ms") % CdcOps.ResampleGridMs == 0)
      val sp = r.getAs[Long]("ms_since_prev")
      val tn = r.getAs[Long]("ms_to_next")
      assert(sp >= 0 && tn >= 0)
      // surrounding events bracket the grid point within one user span
      val v = r.getAs[Double]("interp_value")
      assert(v >= 0.0 && v <= 1000.0) // convex combo of cents in [0, 560]
    }
  }

  test("native session windows agree with the island construction") {
    val native = CdcOps.sessionWindowNative(spark, dir).collect()
    val islands = CdcOps.eventSessions(spark, dir).collect()
    // The two operators split at slightly different boundaries (native:
    // µs diff >= gap; islands: ms-truncated diff > gap), so native can
    // only split MORE, never merge more — equality would be fixture
    // luck, the inequality is the semantic property.
    assert(native.length >= islands.length,
      "native session_window merged sessions the island form split")
    // Both partition the same event set: totals must conserve exactly.
    assert(native.map(_.getAs[Long]("n_events")).sum ==
      islands.map(_.getAs[Long]("n_events")).sum)
    native.foreach { r =>
      // close boundary = last event + gap, so every session spans >= gap
      assert(r.getAs[Long]("session_end_ms") -
        r.getAs[Long]("session_start_ms") >= CdcOps.SessionGapMs)
    }
  }

  test("fk orphan audit: clean FKs are clean, the seeded control is not") {
    val rows = BatchOps.fkOrphanAudit(spark, dir).collect()
      .map(r => r.getAs[String]("relationship") ->
        (r.getAs[Long]("n_child_rows"), r.getAs[Long]("n_child_keys"),
          r.getAs[Long]("n_orphan_rows"), r.getAs[Long]("n_orphan_keys")))
      .toMap
    assert(rows.size == 6)
    // generator-maintained FKs hold
    Seq("lineitem_orders", "lineitem_part", "lineitem_supplier",
      "orders_customer").foreach { rel =>
      assert(rows(rel)._3 == 0L && rows(rel)._4 == 0L, s"$rel has orphans")
    }
    // the even-parent control MUST detect orphans (odd-key customers)
    val ctl = rows("control_orders_evencustomer")
    assert(ctl._3 > 0L && ctl._4 > 0L, "seeded control found no orphans")
    assert(ctl._3 <= ctl._1 && ctl._4 <= ctl._2)
  }

  test("minhash calibration: monotone in band collisions, bands in range") {
    val cal = TextOps.minhashCalibration(spark, dir).collect()
    assert(cal.nonEmpty)
    cal.foreach { r =>
      val k = r.getAs[Long]("n_bands")
      assert(k >= 1L && k <= TextOps.MinhashBands.toLong)
      assert(r.getAs[Long]("min_mille") <= r.getAs[Long]("max_mille"))
      assert(r.getAs[Double]("avg_jaccard_mille") >= 0.0)
    }
    // more band collisions ⇒ higher mean exact Jaccard (the property
    // every LSH threshold rests on); compared only across buckets with
    // enough pairs for the mean to be stable at this tiny SF
    val byK = cal.filter(_.getAs[Long]("n_pairs") >= 5)
      .sortBy(_.getAs[Long]("n_bands"))
      .map(_.getAs[Double]("avg_jaccard_mille"))
    assert(byK.zip(byK.drop(1)).forall { case (a, b) => a <= b },
      s"calibration not monotone: ${byK.mkString(", ")}")
  }

  test("cluster-label matrix: both margins sum to 1 exactly") {
    val rows = graft.operators.VectorOps.clusterLabelMatrix(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cent_id")).foreach { case (_, cells) =>
      assert(math.abs(
        cells.map(_.getAs[Double]("cluster_share")).sum - 1.0) < 1e-9)
      assert(cells.map(_.getAs[Long]("n")).sum ==
        cells.head.getAs[Long]("n_cluster"))
    }
    rows.groupBy(_.getAs[Int]("label")).foreach { case (_, cells) =>
      assert(math.abs(
        cells.map(_.getAs[Double]("label_share")).sum - 1.0) < 1e-9)
    }
  }

  test("session copresence: marginals bound pairs, same T from every row") {
    val rows = CdcOps.sessionCopresence(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nAb = r.getAs[Long]("n_together")
      assert(nAb <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("support") <= conf + 1e-12)
    }
    val ts = rows.map(r => r.getAs[Double]("lift") *
      r.getAs[Long]("n_b") / r.getAs[Double]("confidence"))
    assert(ts.forall(t => math.abs(t - ts.head) < 1e-6))
  }

  test("label cohesion: pair counts bounded by the cap, sims in range") {
    val cap = graft.operators.VectorOps.CohesionCap.toLong
    val rows = graft.operators.VectorOps.labelCohesion(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nIntra = r.getAs[Long]("n_intra_pairs")
      assert(nIntra <= cap * (cap - 1) / 2)
      // degenerate labels stay in the report with zeroed means
      if (r.getAs[Long]("n_inter_pairs") == 0)
        assert(r.getAs[Double]("mean_inter_sim") == 0.0)
      if (nIntra == 0) assert(r.getAs[Double]("mean_intra_sim") == 0.0)
      Seq("mean_intra_sim", "mean_inter_sim").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c = $v")
      }
      assert(math.abs(r.getAs[Double]("margin") -
        (r.getAs[Double]("mean_intra_sim") -
          r.getAs[Double]("mean_inter_sim"))) < 1e-12)
    }
  }

  test("hourly seasonality: 24-hour spine, shares form a distribution") {
    val rows = CdcOps.hourlySeasonality(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("hour_of_day")).sorted.toSeq ==
      (0 until 24))
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0)
      < 1e-9)
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, dir).count())
  }

  test("cumulative reach: monotone, conserves the distinct-user total") {
    val rows = CdcOps.cumulativeReach(spark, dir).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cumulative_users"))
    assert(cums.zip(cums.drop(1)).forall { case (a, b) => a <= b })
    assert(cums.last == Tables.events(spark, dir)
      .select("user_id").distinct().count())
    assert(rows.map(_.getAs[Long]("new_users")).sum == cums.last)
  }

  test("dedup waterfall: flags tie out to each stage's survivor query") {
    val rows = TextOps.dedupWaterfall(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val v = r.getAs[String]("verdict")
      // first-stage-wins attribution must agree with the flags
      if (r.getAs[Boolean]("is_exact_dup")) assert(v == "exact")
      else if (r.getAs[Boolean]("is_near_dup")) assert(v == "near")
      else if (r.getAs[Boolean]("is_semantic_dup")) assert(v == "semantic")
      else assert(v == "kept")
    }
    assert(rows.count(!_.getAs[Boolean]("is_exact_dup")).toLong ==
      TextOps.dedupedDocs(spark, dir).count())
    assert(rows.count(!_.getAs[Boolean]("is_near_dup")).toLong ==
      TextOps.nearDupSurvivors(spark, dir).count())
    assert(rows.count(!_.getAs[Boolean]("is_semantic_dup")).toLong ==
      graft.operators.VectorOps.semanticDedupSurvivors(spark, dir).count())
  }

  test("kcore: core degrees bounded by raw degrees, peel is sound") {
    val rows = TextOps.kcoreNearDup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("n_neighbors")
      val core = r.getAs[Long]("core_degree")
      assert(core <= deg)
      if (r.getAs[Boolean]("in_core")) {
        // survivors kept >= k neighbors in the final peel round
        assert(core >= 1)
        assert(deg >= TextOps.KCoreK)
      } else assert(core == 0)
    }
  }

  test("kcore: peel has converged within the unrolled rounds") {
    // in_core documents post-round-N survivorship; this pins that on
    // the real sf0.001 graph the peel is a FIXPOINT by round N — one
    // extra round removes nobody — so the flag is true 2-core
    // membership on shipped data (TextOps.kcoreNearDup scaladoc).
    import org.apache.spark.sql.functions.{col, count, lit}
    val edges = TextOps.kcoreEdges(spark, dir)
    val initDeg = edges.groupBy("src").agg(count(lit(1)).as("deg0"))
    val atN = TextOps.kcoreAliveAfter(edges, initDeg, TextOps.KCorePeelRounds)
    val atN1 = TextOps.kcoreAliveAfter(edges, initDeg, TextOps.KCorePeelRounds + 1)
    assert(atN.count() == atN1.count())
    assert(atN.join(atN1, Seq("id"), "left_anti").count() == 0)
  }

  test("langid confusion: both margins sum to 1, mass equals corpus") {
    val rows = TextOps.langidConfusion(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.documents(spark, dir).count())
    rows.groupBy(_.getAs[String]("labeled_lang")).foreach { case (_, cs) =>
      assert(math.abs(cs.map(_.getAs[Double]("recall_share")).sum - 1.0)
        < 1e-9)
    }
    rows.groupBy(_.getAs[String]("predicted_lang")).foreach {
      case (_, cs) =>
        assert(math.abs(
          cs.map(_.getAs[Double]("precision_share")).sum - 1.0) < 1e-9)
    }
  }

  test("supplier hhi: bounded by 1/n and the top-share square") {
    BatchOps.supplierHhi(spark, dir).collect().foreach { r =>
      val hhi = r.getAs[Double]("hhi")
      val n = r.getAs[Long]("n_suppliers")
      val top = r.getAs[Long]("top_share_mille")
      // HHI >= 1/n (equal split) up to mille-quantization slack, and
      // at least the largest share's square
      assert(hhi >= 1.0 / n - 0.002 * 2, s"hhi $hhi below 1/$n")
      assert(hhi <= 1.0 + 1e-9)
      assert(hhi * 1e6 >= (top.toDouble * top) - 1e-6)
    }
  }

  test("order backlog: non-negative, conserves placed minus completed") {
    val rows = BatchOps.orderBacklog(spark, dir).collect()
    assert(rows.nonEmpty)
    var run = 0L
    rows.foreach { r =>
      run += r.getAs[Long]("n_placed") - r.getAs[Long]("n_completed")
      assert(r.getAs[Long]("open_backlog") == run, "running sum broken")
      assert(run >= 0, "more orders completed than ever placed")
    }
    assert(rows.map(_.getAs[Long]("n_placed")).sum ==
      Tables.orders(spark, dir).count())
  }

  test("weighted median: quantiles ordered, crossing rule is tight") {
    val rows = BatchOps.weightedMedianPrice(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val med = r.getAs[Double]("weighted_median_price")
      val p90 = r.getAs[Double]("weighted_p90_price")
      assert(med <= p90)
      assert(med > 0.0 && r.getAs[Long]("total_weight") > 0)
    }
  }

  test("shipping latency: order statistics bracket, shares bounded") {
    val rows = BatchOps.shippingLatency(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("median_days") <= r.getAs[Long]("p90_days"))
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_lineitems"))
      val share = r.getAs[Double]("late_share")
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("embedding outliers: contiguous ranks, similarity ascends") {
    val byCluster = graft.operators.VectorOps.embeddingOutliers(spark, dir)
      .collect().groupBy(_.getAs[Long]("cent_id"))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (c, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("out_rank"))
      assert(sorted.map(_.getAs[Int]("out_rank")).toSeq ==
        (1 to sorted.length), s"cluster $c ranks not contiguous")
      val sims = sorted.map(_.getAs[Long]("sim_fx"))
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a <= b },
        s"cluster $c outlier similarity not ascending")
    }
  }

  test("basket rules: metric identities hold on every emitted rule") {
    val rows = BatchOps.basketRules(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nAb = r.getAs[Long]("n_ab")
      val nA = r.getAs[Long]("n_a"); val nB = r.getAs[Long]("n_b")
      assert(nAb >= BatchOps.BasketRuleMinCount)
      assert(nAb <= math.min(nA, nB), "pair count exceeds a marginal")
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0.0 && conf <= 1.0)
      assert(r.getAs[Double]("support") <= conf + 1e-12,
        "support cannot exceed confidence (support = conf · nA/T)")
      assert(r.getAs[Double]("lift") > 0.0)
    }
    // lift = confidence · T / n_b ⇒ lift·n_b/confidence recovers the
    // SAME basket total T from every rule — a cross-row identity a
    // botched marginals join would break
    val ts = rows.map(r => r.getAs[Double]("lift") *
      r.getAs[Long]("n_b") / r.getAs[Double]("confidence"))
    assert(ts.forall(t => math.abs(t - ts.head) < 1e-6),
      s"implied basket totals diverge: ${ts.distinct.take(5).mkString(", ")}")
  }

  test("cdc gap audit: offset span ties to intervals plus missing") {
    val rows = CdcOps.cdcGapDetection(spark, dir).collect()
    assert(rows.length == 3) // three routed targets
    rows.foreach { r =>
      val span = r.getAs[Long]("last_offset") - r.getAs[Long]("first_offset")
      // span = observed intervals + offsets missing from this target
      assert(span ==
        r.getAs[Long]("n_intervals") + r.getAs[Long]("missing_total"),
        s"target ${r.get(0)}: span does not tie out")
      assert(r.getAs[Long]("n_gaps") <= r.getAs[Long]("n_intervals"))
      assert(r.getAs[Long]("max_gap") <= r.getAs[Long]("missing_total"))
    }
  }

  test("bitmap set ops reconcile exactly with the KMV overlap's control") {
    // Two INDEPENDENT implementations of audience intersection over the
    // same sets — packed 63-bit-word bitmaps vs the plain distinct
    // self-join kmv_overlap carries as its rel-err control — must agree
    // EXACTLY on every type pair (the bitmap path is exact, unlike the
    // sketch estimate it sits next to). Union reconciles via
    // |A|+|B| = |A∪B|+|A∩B| against per-type distinct counts.
    import org.apache.spark.sql.functions.{col, countDistinct}
    val bm = CdcOps.bitmapMembership(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))).toMap
    val exact = CdcOps.kmvOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_inter_exact")).toMap
    val sizes = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(bm.nonEmpty && bm.keySet == exact.keySet)
    bm.foreach { case (pair @ (a, b), (inter, union)) =>
      assert(inter == exact(pair),
        s"$pair: bitmap $inter != exact ${exact(pair)}")
      assert(union == sizes(a) + sizes(b) - inter,
        s"$pair: union $union does not reconcile")
    }
  }

  test("best-survivor dedup keeps exactly one member per cluster") {
    // Same clusters as nearDupSurvivors, different representative
    // policy — the SURVIVOR COUNT must be identical (one kept per
    // component either way), only the kept ids may differ, and every
    // kept id must be at least as rich as its cluster's min-id pick.
    val minId = TextOps.nearDupSurvivors(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val best = TextOps.dedupBestSurvivors(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best.size == minId.size,
      s"survivor counts differ: best=${best.size} minId=${minId.size}")
  }

  test("bfs levels: seeds at 0, edge endpoints within one hop") {
    val rows = TextOps.bfsLevels(spark, dir).collect()
    val dist = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("hop_distance")).toMap
    rows.foreach { r =>
      val (id, d) = (r.getAs[Long]("doc_id"), r.getAs[Long]("hop_distance"))
      if (id % TextOps.BfsSeedMod == 0) assert(d == 0L, s"seed $id at $d")
      assert(d == -1L || d <= TextOps.BfsRounds)
      assert(r.getAs[Boolean]("reachable") == (d >= 0L))
    }
    // BFS property on the undirected graph: adjacent reachable nodes
    // differ by at most one level, and a node strictly inside the
    // horizon forces its neighbors to be reachable.
    import org.apache.spark.sql.functions.col
    TextOps.kcoreEdges(spark, dir).select(col("src"), col("dst"))
      .collect().foreach { e =>
        val (du, dv) = (dist(e.getLong(0)), dist(e.getLong(1)))
        if (du >= 0 && dv >= 0) assert(math.abs(du - dv) <= 1)
        if (du >= 0 && du < TextOps.BfsRounds)
          assert(dv >= 0 && dv <= du + 1)
      }
  }

  test("lpa communities: labels partition the node set and are nodes") {
    val rows = TextOps.lpaCommunities(spark, dir).collect()
    val nodes = rows.map(_.getAs[Long]("doc_id")).toSet
    val byLbl = rows.groupBy(_.getAs[Long]("community"))
    byLbl.foreach { case (lbl, members) =>
      assert(nodes.contains(lbl), s"community label $lbl is not a node")
      members.foreach(m =>
        assert(m.getAs[Long]("community_size") == members.length))
    }
    assert(byLbl.values.map(_.length).sum == nodes.size)
  }

  test("snapshot diff: row identities and seeded expectations hold") {
    val r = BatchOps.snapshotDiff(spark, dir).collect()(0)
    def g(c: String) = r.getAs[Long](c)
    assert(g("n_v1") == g("n_common") + g("n_deleted"))
    assert(g("n_v2") == g("n_common") + g("n_added"))
    assert(g("n_control_modified") == 0L)
    // Expected counts from the seeded moduli, recomputed independently.
    val keys = Tables.customer(spark, dir).select("c_custkey")
      .collect().map(_.getLong(0))
    import BatchOps.{SnapBalMod, SnapDelMod, SnapInsMod, SnapSegMod}
    assert(g("n_added") ==
      keys.count(k => k % SnapInsMod == 0 && k % SnapDelMod != 0))
    assert(g("n_deleted") ==
      keys.count(k => k % SnapDelMod == 0 && k % SnapInsMod != 0))
    val common = keys.filter(k =>
      k % SnapInsMod != 0 && k % SnapDelMod != 0)
    assert(g("n_common") == common.length)
    assert(g("n_bal_modified") == common.count(_ % SnapBalMod == 0))
    assert(g("n_seg_modified") == common.count(_ % SnapSegMod == 0))
  }

  test("gdpr erasure: zero violations, control re-surfaces every key") {
    val r = CdcOps.gdprErasureAudit(spark, dir).collect()(0)
    def g(c: String) = r.getAs[Long](c)
    assert(g("n_violations") == 0L)
    assert(g("n_control_violations") == g("n_erased"))
    assert(g("n_state_rows") + g("n_erased") == g("n_users"))
  }

  test("abc classification: classes partition parts, shares reconcile") {
    val rows = BatchOps.abcClassification(spark, dir).collect()
    assert(rows.map(_.getAs[String]("abc_class")).toSet
      .subsetOf(Set("A", "B", "C")))
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    assert(nParts == Tables.lineitem(spark, dir)
      .select("l_partkey").distinct().count())
    val share = rows.map(_.getAs[Long]("share_mille")).sum
    assert(share >= 1000 - rows.length && share <= 1000,
      s"floor-mille shares sum to $share")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_cum_mille") <=
        r.getAs[Long]("max_cum_mille"))
    }
  }

  test("mann-kendall: pair accounting closes and tau is bounded") {
    BatchOps.mannKendallTrend(spark, dir).collect().foreach { r =>
      def g(c: String) = r.getAs[Long](c)
      val m = g("n_months")
      assert(g("n_pairs") == m * (m - 1) / 2)
      assert(g("n_pos") + g("n_neg") + g("n_tie") == g("n_pairs"))
      assert(g("s_stat") == g("n_pos") - g("n_neg"))
      val tau = r.getAs[Double]("tau")
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("segment×priority chi2: margins close, contribs match exact form") {
    val rows = BatchOps.segmentPriorityChi2(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("observed")).sum == n)
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, cs) =>
      assert(cs.map(_.getAs[Long]("observed")).sum ==
        cs.head.getAs[Long]("row_tot"))
    }
    rows.groupBy(_.getAs[String]("priority")).foreach { case (_, cs) =>
      assert(cs.map(_.getAs[Long]("observed")).sum ==
        cs.head.getAs[Long]("col_tot"))
    }
    // expected_micro floors: the margin mass re-closes within one
    // micro-unit per cell.
    val expSum = rows.map(r => BigInt(r.getAs[Long]("expected_micro"))).sum
    assert(expSum <= BigInt(n) * 1000000 &&
      expSum > BigInt(n) * 1000000 - rows.length,
      s"expected_micro sums to $expSum for n=$n")
    rows.foreach { r =>
      def g(c: String) = BigInt(r.getAs[Long](c))
      val d = g("observed") * g("n_total") - g("row_tot") * g("col_tot")
      assert(g("contrib_micro") ==
        d * d * 1000000 / (g("n_total") * g("row_tot") * g("col_tot")))
      assert(g("contrib_micro") >= 0)
    }
  }

  test("set-ops audit: inclusion-exclusion and except-complement close") {
    val m = BatchOps.setOpsAudit(spark, dir).collect()
      .map(r => r.getAs[String]("set_op") -> r.getAs[Long]("n_keys")).toMap
    assert(m.keySet == Set("a_1996", "b_1997", "intersect",
      "except_a_minus_b", "union_distinct"))
    assert(m("union_distinct") ==
      m("a_1996") + m("b_1997") - m("intersect"))
    assert(m("except_a_minus_b") == m("a_1996") - m("intersect"))
  }

  test("margins grouping sets: both margins re-total identically") {
    val rows = BatchOps.marginsGroupingSets(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("grain")).toSet == Set(1L, 2L))
    val byGrain = rows.groupBy(_.getAs[Long]("grain"))
    val totals = byGrain.view.mapValues(rs =>
      (rs.map(_.getAs[Long]("n_orders")).sum,
        rs.map(_.getAs[Long]("rev_c")).sum)).toMap
    assert(totals(1L) == totals(2L),
      s"status margin ${totals(1L)} != priority margin ${totals(2L)}")
    rows.foreach { r =>
      val statusNull = r.isNullAt(r.fieldIndex("o_orderstatus"))
      val prioNull = r.isNullAt(r.fieldIndex("o_orderpriority"))
      assert(statusNull != prioNull, "margins-only: exactly one dim set")
    }
  }

  test("promo share q14: promo bounded by total, mille in range") {
    val rows = BatchOps.promoShareQ14(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, t) = (r.getAs[Long]("promo_rev_e4"),
        r.getAs[Long]("total_rev_e4"))
      assert(p >= 0 && p <= t)
      val mille = r.getAs[Long]("promo_mille")
      assert(mille >= 0 && mille <= 1000)
      assert(mille == p * 1000 / t)
    }
  }

  test("segment unpivot: three metrics per segment, long form consistent") {
    val rows = BatchOps.segmentMetricsUnpivot(spark, dir).collect()
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("metric")).sorted.toSeq ==
        Seq("acctbal_cents", "max_acctbal_cents", "n_customers"))
      def v(m: String) =
        rs.find(_.getAs[String]("metric") == m).get.getAs[Long]("value")
      assert(v("n_customers") > 0)
      assert(v("max_acctbal_c".replace("_c", "_cents")) * v("n_customers")
        >= v("acctbal_cents"),
        "max×n bounds the sum from above")
    }
  }

  test("knn confusion: diagonal and margins reconcile with the agreement") {
    val conf = VectorOps.knnConfusion(spark, dir).collect()
    val agree = VectorOps.knnLabelAgreement(spark, dir).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Long]("n_covered"), r.getAs[Long]("n_same"))).toMap
    conf.groupBy(_.getAs[Int]("label")).foreach { case (label, cells) =>
      val (nCov, nSame) = agree(label)
      assert(cells.head.getAs[Long]("n_covered") == nCov)
      assert(cells.map(_.getAs[Long]("n_pairs")).sum == nCov,
        "confusion row mass must equal the covered count")
      val diag = cells.find(_.getAs[Int]("pred_label") == label)
        .map(_.getAs[Long]("n_pairs")).getOrElse(0L)
      assert(diag == nSame,
        s"label $label: confusion diagonal $diag != agreement $nSame")
    }
  }

  test("reorder hazard: life-table accounting closes, survival monotone") {
    val rows = BatchOps.reorderHazard(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.head.getAs[Long]("n_total")
    assert(rows.map(_.getAs[Long]("n_events")).sum == n)
    assert(rows.head.getAs[Long]("n_at_risk") == n,
      "risk set at the smallest gap is the whole population")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_at_risk") > b.getAs[Long]("n_at_risk"))
        assert(a.getAs[Long]("n_at_risk") - a.getAs[Long]("n_events") ==
          b.getAs[Long]("n_at_risk"),
          "risk set shrinks by exactly the events at each gap")
        assert(a.getAs[Long]("survival_mille") >=
          b.getAs[Long]("survival_mille"))
      case _ =>
    }
    rows.foreach { r =>
      val h = r.getAs[Long]("hazard_mille")
      assert(h >= 0 && h <= 1000)
    }
    assert(rows.last.getAs[Long]("survival_mille") == 0,
      "survival hits zero past the largest observed gap")
  }

  test("column profile: census bounds hold, order key is a PK") {
    val rows = BatchOps.columnProfile(spark, dir).collect()
    assert(rows.map(_.getAs[String]("col_name")).toSeq == Seq(
      "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
      "o_orderstatus", "o_totalprice_cents"))
    val nRows = rows.head.getAs[Long]("n_rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      assert(r.getAs[Long]("n_null") + r.getAs[Long]("n_distinct") <=
        nRows)
      assert(r.getAs[Long]("n_distinct") > 0)
    }
    val pk = rows.find(_.getAs[String]("col_name") == "o_orderkey").get
    assert(pk.getAs[Long]("n_distinct") == nRows && pk.getAs[Long]("n_null") == 0)
  }

  test("dedup weights: mass preserved, one row per surviving doc") {
    val rows = TextOps.dedupWeights(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("weight")).sum == nDocs,
      "re-weighting must preserve total sampling mass")
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length)
    assert(rows.forall(_.getAs[Long]("weight") >= 1L))
    assert(rows.exists(_.getAs[Long]("weight") > 1L),
      "the corpus is known to contain near-dup clusters")
    // survivor set matches the hard-drop query's survivors
    val hardDrop = TextOps.nearDupSurvivors(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.toSet == hardDrop,
      "weight carriers must be exactly the hard-drop survivors")
  }

  test("vocab coverage curve: monotone, bounded, checkpoints only") {
    val rows = TextOps.vocabCoverageCurve(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => TextOps.CoverageKs.contains(r.getAs[Int]("k"))))
    val total = rows.head.getAs[Long]("total_tokens")
    var prevCum = 0L
    rows.foreach { r =>
      val cum = r.getAs[Long]("cum_tokens")
      assert(cum > prevCum && cum <= total)
      prevCum = cum
      val cov = r.getAs[Long]("coverage_mille")
      assert(cov >= 0 && cov <= 1000 && cov == cum * 1000 / total)
    }
  }

  test("late fulfilment q4: semi-join counts each order at most once") {
    import org.apache.spark.sql.functions._
    val rows = BatchOps.lateFulfilmentQ4(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recount: distinct late order keys per priority
    val o = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
    val l = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    val expected = o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("sd") > date_add(o("od"), BatchOps.LateFulfilmentGraceDays))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val p = r.getAs[String]("o_orderpriority")
      val late = r.getAs[Long]("n_late_orders")
      assert(late <= r.getAs[Long]("n_orders"))
      assert(late == expected(p),
        s"priority $p: semi-join count $late != distinct recount")
      assert(r.getAs[Long]("late_mille") ==
        late * 1000 / r.getAs[Long]("n_orders"))
    }
  }

  test("window frame audit: RANGE dominates ROWS exactly by peer mass") {
    val rows = BatchOps.windowFrameAudit(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def g(c: String) = r.getAs[Long](c)
      assert(g("range_cum_total_c") ==
        g("rows_cum_total_c") + g("peer_mass_c"))
      assert(g("peer_mass_c") >= 0 && g("max_peer_gap_c") >= 0)
      assert(g("max_peer_gap_c") <= g("peer_mass_c"))
      assert(g("n_tied_rows") <= g("n_orders"))
      if (g("n_tied_rows") == 0)
        assert(g("peer_mass_c") == 0,
          "no date ties means the frames must agree")
      if (g("peer_mass_c") > 0)
        assert(g("n_tied_rows") >= 2,
          "divergent frames require at least one peer group")
    }
    assert(rows.exists(_.getAs[Long]("peer_mass_c") > 0),
      "order dates are known tie-heavy; the audit must catch divergence")
  }

  test("lsh recall@k: monotone in depth, bounded by coverage") {
    val rows = VectorOps.lshRecallAtK(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == VectorOps.RecallKs)
    val nq = rows.head.getAs[Long]("n_queries")
    var prev = -1L
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= prev, "recall must be non-decreasing in k")
      prev = h
      assert(h <= nq)
      assert(r.getAs[Long]("recall_mille") == h * 1000 / nq)
    }
  }

  test("codec integrity screen: classes partition the corpus") {
    val rows = graft.operators.MultiModalOps
      .codecIntegrityScreen(spark, dir).collect()
    val m = rows.map(r =>
      r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    assert(m.keySet == Set("ok", "bad_magic", "truncated"),
      s"unexpected status census: $m")
    val nDocs = rows.head.getAs[Long]("n_docs")
    assert(m.values.sum == nDocs, "statuses must partition the corpus")
    assert(m("ok") > m("bad_magic") + m("truncated"),
      "fault injection touches a strict minority")
    assert(!m.contains("size_mismatch"),
      "the encoder is self-consistent; only injected faults classify")
  }

  test("user value trend: census closes within segment, shares bounded") {
    val rows = BatchOps.userValueTrend(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      Set("up", "down", "flat").contains(r.getAs[String]("trend"))))
    rows.groupBy(_.getAs[String]("segment")).foreach { case (_, rs) =>
      val tot = rs.head.getAs[Long]("segment_total")
      assert(rs.map(_.getAs[Long]("n_customers")).sum == tot)
      val shares = rs.map(_.getAs[Long]("share_mille"))
      assert(shares.forall(s => s >= 0 && s <= 1000))
      val sum = shares.sum
      assert(sum <= 1000 && sum > 1000 - rs.length,
        s"floor-mille shares sum to $sum")
    }
  }

  test("props key timeline: spans bound activity, reconciles with census") {
    val rows = CdcOps.propsKeyTimeline(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val span = r.getAs[Long]("span_days")
      val active = r.getAs[Long]("n_days_active")
      assert(span >= 1 && active >= 1 && active <= span)
      assert(active <= r.getAs[Long]("n_rows"))
      val cov = r.getAs[Long]("coverage_mille")
      assert(cov >= 1 && cov <= 1000 && cov == active * 1000 / span)
      assert(!r.getAs[java.sql.Date]("first_day")
        .after(r.getAs[java.sql.Date]("last_day")))
    }
    // same seeded frame as the census: per-(type, key) row mass agrees
    val census = CdcOps.propsKeyCensus(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("key")) ->
        r.getAs[Long]("n_rows")).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[String]("key"))
      assert(census(k) == r.getAs[Long]("n_rows"),
        s"timeline/census row-mass split at $k")
    }
  }

  test("multiprobe recall@k: monotone cap-tuning curve, bounded by the family") {
    val rows = VectorOps.rpMultiprobeRecallAtK(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == VectorOps.RecallKs)
    val nq = rows.head.getAs[Long]("n_queries")
    var prev = 0L
    rows.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= prev && h <= nq)
      prev = h
      assert(r.getAs[Long]("recall_mille") == h * 1000 / nq)
    }
    // at the full cap the exact rerank promotes every shortlisted true
    // neighbor to the top, so the family's recall@1 (quality report)
    // bounds every curve point from above
    val famCorrect = VectorOps.annQualityReport(spark, dir).collect()
      .find(_.getAs[String]("method") == "rp_multiprobe").get
      .getAs[Long]("n_correct")
    assert(rows.last.getAs[Long]("n_hits") <= famCorrect,
      s"curve at k=20 exceeds the family's full-cap hits $famCorrect")
  }

  test("stickiness: DAU bounded by MAU, reconciles with trailing DAU") {
    val rows = CdcOps.stickinessRatio(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, mau) = (r.getAs[Long]("dau"), r.getAs[Long]("mau"))
      assert(dau >= 1 && dau <= mau)
      val s = r.getAs[Long]("stickiness_mille")
      assert(s >= 1 && s <= 1000 && s == dau * 1000 / mau)
    }
    // the 7d trailing distinct sits between DAU and the 28d MAU
    val t7 = CdcOps.trailingDau(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("day") ->
        (r.getAs[Long]("dau_1d"), r.getAs[Long]("dau_7d"))).toMap
    rows.foreach { r =>
      val (d1, d7) = t7(r.getAs[java.sql.Date]("day"))
      assert(r.getAs[Long]("dau") == d1)
      assert(d7 <= r.getAs[Long]("mau"),
        "7-day actives cannot exceed 28-day actives")
    }
  }

  test("new vs returning: partition closes, first day is all-new") {
    val rows = CdcOps.newVsReturning(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") ==
        r.getAs[Long]("dau"))
      assert(r.getAs[Long]("new_share_mille") ==
        r.getAs[Long]("n_new") * 1000 / r.getAs[Long]("dau"))
    }
    val first = rows.head
    assert(first.getAs[Long]("n_returning") == 0 &&
      first.getAs[Long]("new_share_mille") == 1000,
      "on the earliest day every active user is new")
    assert(rows.map(_.getAs[Long]("n_new")).sum ==
      graft.Tables.events(spark, dir)
        .select("user_id").distinct().count(),
      "each user is new exactly once")
  }

  test("weekday seasonality: ISO domain, weighted indices recompose flat") {
    val rows = BatchOps.weekdaySeasonality(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("iso_weekday")).toSet == (1 to 7).toSet)
    val nTotal = rows.map(_.getAs[Long]("n_days")).sum
    // Σ n_days·index ≈ 1000·n_total (floor loss < 1 per weekday row)
    val weighted = rows.map(r =>
      r.getAs[Long]("n_days") * r.getAs[Long]("index_mille")).sum
    assert(weighted <= 1000L * nTotal &&
      weighted > 1000L * nTotal - rows.map(_.getAs[Long]("n_days")).max * rows.length,
      s"weighted index mass $weighted vs ${1000L * nTotal}")
  }

  test("quality calibration: rank-monotone, endpoints hit global extremes") {
    val rows = TextOps.qualityCalibration(spark, dir).collect()
    val (gMin, gMax) = (rows.map(_.getAs[Long]("n_chars")).min,
      rows.map(_.getAs[Long]("n_chars")).max)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, docs) =>
      val byRank = docs.sortBy(_.getAs[Long]("rank_in_source"))
      val cal = byRank.map(_.getAs[Long]("calibrated_chars"))
      assert(cal.zip(cal.tail).forall { case (a, b) => a <= b },
        "calibrated values not monotone in source rank")
      if (docs.head.getAs[Long]("n_s") > 1) {
        assert(cal.head == gMin, s"first rank maps to ${cal.head}")
        assert(cal.last == gMax, s"last rank maps to ${cal.last}")
      }
    }
  }

  test("national market share: nation slice bounded by the total") {
    val rows = BatchOps.nationalMarketShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, nat) = (r.getAs[Long]("total_rev_c"),
        r.getAs[Long]("nation_rev_c"))
      assert(nat >= 0 && nat <= tot)
      val mille = r.getAs[Long]("share_mille")
      assert(mille == nat * 1000 / tot)
    }
  }

  test("acf profile: correlations bounded, every lag present") {
    val rows = BatchOps.acfProfile(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSet == BatchOps.AcfLags.toSet)
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-12 && a <= 1.0 + 1e-12, s"acf $a")
      assert(r.getAs[Long]("n_pairs") > 0)
    }
  }

  test("readability: components exact, score recomputes from them") {
    TextOps.readabilityScores(spark, dir).collect().foreach { r =>
      val (w, s, sy) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_sentences"), r.getAs[Long]("n_syllables"))
      assert(w >= 1 && s >= 1 && sy >= 0)
      val expected = 206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (sy.toDouble / w.toDouble)
      assert(r.getAs[Double]("flesch") == expected)
    }
  }

  test("embedding covariance: full upper triangle, PSD-consistent cells") {
    val rows = VectorOps.embeddingCovariance(spark, dir).collect()
    val dims = rows.map(_.getAs[Int]("i")).max
    assert(rows.length == dims * (dims + 1) / 2)
    val n = rows.map(_.getAs[Long]("n_vecs")).distinct
    assert(n.length == 1, "n_vecs must be constant across cells")
    val diag = rows.filter(r => r.getAs[Int]("i") == r.getAs[Int]("j"))
      .map(r => r.getAs[Int]("i") -> r.getAs[Long]("cov_num")).toMap
    rows.foreach { r =>
      val (i, j) = (r.getAs[Int]("i"), r.getAs[Int]("j"))
      val c = r.getAs[Long]("cov_num")
      if (i == j) assert(c >= 0, s"negative variance at $i")
      // Cauchy-Schwarz on the scaled covariances.
      else assert(c.toDouble * c.toDouble <=
        diag(i).toDouble * diag(j).toDouble * (1 + 1e-9), s"CS fails $i,$j")
    }
  }

  test("trailing dau: dominates daily, bounded by window sum, seeds equal") {
    val rows = CdcOps.trailingDau(spark, dir).collect()
      .sortBy(_.getAs[java.sql.Date]("day").toString)
    val daily = rows.map(r =>
      r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("dau_1d"))
      .toMap
    rows.zipWithIndex.foreach { case (r, idx) =>
      val (d1, d7) = (r.getAs[Long]("dau_1d"), r.getAs[Long]("dau_7d"))
      assert(d7 >= d1, "7d window must dominate its last day")
      if (idx == 0) assert(d7 == d1, "first day has no history")
    }
    assert(daily.values.sum >= rows.map(_.getAs[Long]("dau_7d")).max)
  }

  test("trending parts: ranks dense, revenue monotone within a day") {
    val byDay = BatchOps.trendingParts7d(spark, dir).collect()
      .groupBy(_.getAs[java.sql.Date]("day").toString)
    byDay.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.length <= BatchOps.TrendTopK)
      assert(sorted.map(_.getAs[Int]("rank")).toSeq ==
        (1 to sorted.length))
      val revs = sorted.map(_.getAs[Long]("rev_7d_c"))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("attribution models: credit conservation, purchase accounting") {
    val rows = CdcOps.attributionModelsCompare(spark, dir).collect()
      .map(r => r.getAs[String]("model") -> r).toMap
    val credited = Set("first_touch", "last_touch", "linear")
      .map(m => rows(m).getAs[Long]("credited_c"))
    assert(credited.size == 1,
      s"non-organic models must credit identical cents, got $credited")
    val attributed = Set("first_touch", "last_touch", "linear")
      .map(m => rows(m).getAs[Long]("n_purchases"))
    assert(attributed.size == 1)
    // Linear credits at least as many distinct clicks as either
    // single-touch model.
    assert(rows("linear").getAs[Long]("n_credited_clicks") >=
      rows("last_touch").getAs[Long]("n_credited_clicks"))
    // Attributed + organic purchases = every purchase in the feed.
    val total = Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") ===
        "purchase").count()
    assert(attributed.head + rows("organic").getAs[Long]("n_purchases")
      == total)
  }

  test("conversion lags: bounded by the lookback, totals close") {
    val rows = CdcOps.conversionLagHistogram(spark, dir).collect()
    val maxMin = CdcOps.AttributionWindowMs / 60000
    rows.foreach { r =>
      val m = r.getAs[Long]("lag_min")
      assert(m >= 0 && m <= maxMin, s"lag bucket $m outside window")
    }
    val total = rows.map(_.getAs[Long]("n_conversions")).sum
    val attributed = CdcOps.purchaseAttribution(spark, dir).count()
    assert(total == attributed,
      s"histogram mass $total != attributed purchases $attributed")
  }

  test("session entry/exit: matrix mass equals the session count") {
    val rows = CdcOps.sessionEntryExit(spark, dir).collect()
    val mass = rows.map(_.getAs[Long]("n_sessions")).sum
    assert(mass == CdcOps.eventSessions(spark, dir).count())
    // Single-event sessions land on the diagonal, so every observed
    // entry type also appears as an exit type somewhere.
    val entries = rows.map(_.getAs[String]("entry_type")).toSet
    val exits = rows.map(_.getAs[String]("exit_type")).toSet
    assert(entries.nonEmpty && exits.nonEmpty)
  }

  test("wow growth: identity recomputes, lag chain is consistent") {
    val rows = BatchOps.wowGrowth(spark, dir).collect()
      .sortBy(_.getAs[Int]("yearweek"))
    rows.zip(rows.tail).foreach { case (prev, cur) =>
      assert(cur.getAs[Long]("prev_rev_c") == prev.getAs[Long]("rev_c"))
    }
    assert(rows.head.isNullAt(rows.head.fieldIndex("growth_mille")))
    rows.tail.foreach { r =>
      val g = r.getAs[Long]("growth_mille")
      val expect = r.getAs[Long]("rev_c") * 1000 /
        r.getAs[Long]("prev_rev_c") - 1000
      assert(g == expect)
    }
  }

  test("seasonal index: day accounting closes, weighted mean ~ 1000") {
    val rows = BatchOps.seasonalIndex(spark, dir).collect()
    assert(rows.map(_.getAs[Int]("month_of_year")).toSet ==
      (1 to 12).toSet)
    // Revenue-weighted reconstruction: sum(month rev) = total rev, and
    // the n_days-weighted index mean sits at 1000 up to floor slack.
    val nDays = rows.map(_.getAs[Long]("n_days")).sum
    val weighted = rows.map(r =>
      r.getAs[Long]("index_mille") * r.getAs[Long]("n_days")).sum
    assert(math.abs(weighted.toDouble / nDays - 1000.0) < 2.0,
      s"weighted index mean ${weighted.toDouble / nDays}")
  }

  test("revenue concentration: gini and share inside their bounds") {
    val r = BatchOps.revenueConcentration(spark, dir).collect()(0)
    val gini = r.getAs[Long]("gini_mille")
    assert(gini >= 0 && gini < 1000, s"gini $gini")
    val share = r.getAs[Long]("top_decile_share_mille")
    // The TOP decile must hold at least its population share.
    val n = r.getAs[Long]("n_customers")
    assert(share >= (n / 10) * 1000 / n && share <= 1000, s"share $share")
  }

  test("temporal dim join: pre-image semantics hold event by event") {
    // Replay each user's chain in order: the enriched prev_version_no
    // must equal the version counter BEFORE the event, cleared by
    // tombstones — an independent sequential re-derivation of the
    // window walk.
    val rows = CdcOps.temporalDimJoin(spark, dir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    rows.foreach { case (_, evs) =>
      var counter = 0L
      var inForce: Option[Long] = None
      evs.sortBy(r => (r.getAs[Long]("ts_ms"), r.getAs[Long]("event_id")))
        .foreach { r =>
          val got = Option(r.getAs[java.lang.Long]("prev_version_no"))
            .map(_.longValue)
          assert(got == inForce,
            s"event ${r.getAs[Long]("event_id")}: $got != $inForce")
          assert(r.getAs[Boolean]("had_prior_state") == inForce.isDefined)
          r.getAs[String]("op") match {
            case "d" => inForce = None
            case _ => counter += 1; inForce = Some(counter)
          }
        }
    }
  }

  test("ann quality: multiprobe dominates single-probe, coverage full") {
    // Multi-probe's candidate set is a SUPERSET of single-probe's
    // (probe 0 is the exact bucket), and the rerank is deterministic,
    // so its recall can never be lower — pinned as data.
    val rows = VectorOps.annQualityReport(spark, dir).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows("rp_multiprobe").getAs[Long]("n_correct") >=
      rows("rp_rerank").getAs[Long]("n_correct"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_covered"))
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_queries"))
    }
  }

  test("psi drift: terms non-negative, bin mass closes per source") {
    val rows = TextOps.psiDrift(spark, dir).collect()
    // (p−q) and ln(p/q) always share sign, so every PSI term is ≥ 0
    // (up to the 6-dp rounding floor).
    rows.foreach(r =>
      assert(r.getAs[Double]("psi_term") >= -1e-6,
        s"negative PSI term: $r"))
    val perSource = rows.groupBy(_.getAs[String]("source"))
    val docs = Tables.documents(spark, dir).count()
    assert(perSource.values.map(_.map(_.getAs[Long]("n_src")).sum).sum
      == docs)
    perSource.values.foreach(rs =>
      assert(rs.length == TextOps.DriftBins))
  }

  test("rank semantics: the three cuts nest exactly as defined") {
    val r = BatchOps.rankSemanticsAudit(spark, dir).collect()(0)
    def g(c: String) = r.getAs[Long](c)
    assert(g("n_row_number") == BatchOps.RankAuditK)
    // rank()<=K stops at the first value class crossing K; dense_rank
    // admits every row of the top K value classes — always a superset.
    assert(g("n_rank") >= g("n_row_number"))
    assert(g("n_dense_rank") >= g("n_rank"))
    assert(g("n_values_in_rn_cut") <= BatchOps.RankAuditK)
  }

  test("dedup rate by source: distinct chains and milles reconcile") {
    val global = TextOps.normalizedDedup(spark, dir).collect()(0)
    val rows = TextOps.dedupRateBySource(spark, dir).collect()
    rows.foreach { r =>
      def g(c: String) = r.getAs[Long](c)
      assert(g("n_norm_distinct") <= g("n_raw_distinct"))
      assert(g("n_raw_distinct") <= g("n_docs"))
      assert(g("exact_dup_mille") ==
        (g("n_docs") - g("n_raw_distinct")) * 1000 / g("n_docs"))
    }
    // Source-level docs close to the corpus row; distincts may only
    // EXCEED the global figure in sum (cross-source duplicates
    // collapse globally).
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      global.getAs[Long]("n_docs"))
    assert(rows.map(_.getAs[Long]("n_raw_distinct")).sum >=
      global.getAs[Long]("n_raw_distinct"))
  }

  test("props key census: shares bounded, invalid class present") {
    val rows = CdcOps.propsKeyCensus(spark, dir).collect()
    assert(rows.map(_.getAs[String]("key")).contains("__invalid__"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("share_mille") <= 1000L)
    }
  }
}
