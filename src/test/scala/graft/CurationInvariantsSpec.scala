package graft

import graft.operators.{CdcOps, TextOps}

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
}
