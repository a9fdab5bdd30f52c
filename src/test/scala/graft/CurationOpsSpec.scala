package graft

import graft.operators.{BatchOps, CdcOps, TextOps}
import graft.streaming.Event

/** Semantics of the round-10 curation additions: PMI collocations,
  * the duplicated-span census, incremental batch-vs-corpus dedup, the
  * deterministic HLL sketch, and the distributed Pareto frontier.
  * (Cross-engine value equality is the DuckDB oracle gate's job; these
  * specs pin the boundary semantics the oracle can't isolate.) */
class CurationOpsSpec extends GraftSpec {
  import spark.implicits._

  /** The operators' own split mechanism: 60-bit md5 band of the
    * doc_id string (mirrors TextOps.h60(...) % 100). */
  private def bucket(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (BigInt(hex.take(15), 16) % 100).toInt
  }

  private def docRow(id: Long, text: String): (Long, String, String, String, Long) =
    (id, text, "en", "web", text.length.toLong)

  // Deterministically chosen ids on each side of the ingest band.
  private lazy val corpusId = (1L to 500L).find(bucket(_) < TextOps.IngestPct).get
  private lazy val batchIds = (1L to 500L).filter(bucket(_) >= TextOps.IngestPct)

  test("pmi collocations: count floor and exact lift") {
    val dir = freshScratch()
    // "x y" ×5: bigram (x,y) appears 5 times (kept), (y,x) 4 (floored).
    writeTable("documents", Seq(
      docRow(1L, "x y x y x y x y x y")
    ).toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val rows = TextOps.pmiCollocations(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[String]("w1") == "x" && r.getAs[String]("w2") == "y")
    assert(r.getAs[Long]("c12") == 5L)
    assert(r.getAs[Long]("c1") == 5L && r.getAs[Long]("c2") == 5L)
    // lift = c12·N/(c1·c2) = 5·10/25 — exactly 2.0 in IEEE doubles.
    assert(r.getAs[Double]("lift") == 2.0)
  }

  test("dup span census: cross-doc spans, self-repeats, short docs") {
    val dir = freshScratch()
    val shared = (1 to 16).map(i => s"t$i").mkString(" ")
    writeTable("documents", Seq(
      // 17 tokens each, same 16-token prefix, different tail: window
      // start 0 is duplicated across docs, start 1 is unique.
      docRow(1L, s"$shared endA"),
      docRow(2L, s"$shared endB"),
      // 32 identical tokens: every window has the same hash — a pure
      // SELF-repeat must count as duplicated (training-loss double
      // counting does not care which doc the second copy lives in).
      docRow(3L, Seq.fill(32)("rep").mkString(" ")),
      // Shorter than the span width: contributes no windows at all.
      docRow(4L, "too short for any span window")
    ).toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val rows = TextOps.dupSpanCensus(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    Seq(1L, 2L).foreach { d =>
      assert(rows(d).getAs[Long]("n_windows") == 2L)
      assert(rows(d).getAs[Long]("n_dup_windows") == 1L)
      assert(rows(d).getAs[Double]("dup_share") == 0.5)
      assert(rows(d).getAs[Boolean]("span_heavy")) // 0.5 >= 0.5
    }
    assert(rows(3L).getAs[Long]("n_windows") == 17L)
    assert(rows(3L).getAs[Double]("dup_share") == 1.0)
  }

  test("dup span removal: overlapping spans fuse into islands, " +
      "residual text is exact, kept + removed = n_tokens") {
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val dir = freshScratch()
    // 20-token passage shared by docs 1, 2, and (twice) doc 5: the 5
    // flagged stride-1 windows per copy OVERLAP pairwise and must fuse
    // into one 20-token island per copy.
    val p = (1 to 20).map(i => s"pp$i").mkString(" ")
    val d1Pre = (1 to 10).map(i => s"ua$i").mkString(" ")
    val d1Post = (1 to 5).map(i => s"za$i").mkString(" ")
    val d2Post = (1 to 8).map(i => s"zb$i").mkString(" ")
    val d3 = (1 to 25).map(i => s"uniq$i").mkString(" ")
    val gap = "gap1 gap2 gap3"
    writeTable("documents", Seq(
      docRow(1L, s"$d1Pre $p $d1Post"),
      docRow(2L, s"$p $d2Post"),
      docRow(3L, d3),                       // no duplication at all
      docRow(4L, "well under the span width"), // < SpanTokens tokens
      docRow(5L, s"$p $gap $p")             // self-repeat, two islands
    ).toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val rows = TextOps.dupSpanRemoval(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // Conservation on every row, including the windowless short doc.
    rows.values.foreach { r =>
      assert(r.getAs[Long]("kept_tokens") +
        r.getAs[Long]("removed_tokens") == r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_dup_windows") <= r.getAs[Long]("n_windows"))
    }
    // Census agreement: the removal pass's window accounting IS the
    // census's, doc for doc (census covers the >= SpanTokens docs).
    val census = TextOps.dupSpanCensus(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    census.foreach { case (d, c) =>
      assert(rows(d).getAs[Long]("n_windows") ==
        c.getAs[Long]("n_windows"))
      assert(rows(d).getAs[Long]("n_dup_windows") ==
        c.getAs[Long]("n_dup_windows"))
    }
    // Doc 1: passage at tokens 10..29 -> one island, exactly the 20
    // passage tokens removed, residual = prefix + suffix verbatim.
    assert(rows(1L).getAs[Long]("n_islands") == 1L)
    assert(rows(1L).getAs[Long]("removed_tokens") == 20L)
    assert(rows(1L).getAs[String]("clean_md5") ==
      md5hex(s"$d1Pre $d1Post"))
    assert(rows(2L).getAs[Long]("n_islands") == 1L)
    assert(rows(2L).getAs[String]("clean_md5") == md5hex(d2Post))
    // Doc 3: untouched — residual is the original text.
    assert(rows(3L).getAs[Long]("removed_tokens") == 0L)
    assert(rows(3L).getAs[String]("clean_md5") == md5hex(d3))
    // Doc 4: shorter than the span width — no windows, keeps all.
    assert(rows(4L).getAs[Long]("n_windows") == 0L)
    assert(rows(4L).getAs[Long]("kept_tokens") ==
      rows(4L).getAs[Long]("n_tokens"))
    // Doc 5: both copies flagged (self-repeat counts), the 3-token gap
    // keeps the islands apart, residual is exactly the gap.
    assert(rows(5L).getAs[Long]("n_islands") == 2L)
    assert(rows(5L).getAs[Long]("removed_tokens") == 40L)
    assert(rows(5L).getAs[String]("clean_md5") == md5hex(gap))
  }

  test("incremental dedup: exact, novel, and batch-only output") {
    val dir = freshScratch()
    val Seq(b1, b2) = batchIds.take(2)
    val corpusText = (1 to 80).map(i => s"w$i").mkString(" ")
    writeTable("documents", Seq(
      docRow(corpusId, corpusText),
      docRow(b1, corpusText), // exact copy of a corpus doc
      docRow(b2, (1 to 80).map(i => s"z$i").mkString(" ")) // novel
    ).toDF("doc_id", "text", "lang", "source", "n_chars"), dir)
    val rows = TextOps.incrementalDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // Corpus docs never appear: the screen reports on the batch only.
    assert(rows.keySet == Set(b1, b2))
    assert(rows(b1).getAs[Boolean]("is_exact_dup"))
    assert(rows(b1).getAs[String]("verdict") == "exact")
    // An exact copy also shares all its chunks.
    assert(rows(b1).getAs[Long]("n_shared_chunks") ==
      rows(b1).getAs[Long]("n_chunks"))
    assert(!rows(b2).getAs[Boolean]("is_exact_dup"))
    assert(rows(b2).getAs[Long]("n_shared_chunks") == 0L)
    assert(rows(b2).getAs[String]("verdict") == "novel")
  }

  test("hll sketch: structural invariants at spec scale") {
    val dir = freshScratch()
    // 40 distinct clickers, 3 signup users; event replays (same user
    // again) must not move the distinct estimate.
    val events =
      (1L to 40L).map(u => Event(u, ts("2024-01-01 10:00:00"), u, "click", 1.0, "{}")) ++
        (1L to 40L).map(u => Event(100 + u, ts("2024-01-01 11:00:00"), u, "click", 1.0, "{}")) ++
        (1L to 3L).map(u => Event(200 + u, ts("2024-01-01 10:30:00"), u, "signup", 0.0, "{}"))
    writeTable("events", spark.createDataset(events).toDF(), dir)
    val rows = CdcOps.hllDistinct(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("click").getAs[Long]("n_exact") == 40L)
    assert(rows("signup").getAs[Long]("n_exact") == 3L)
    rows.values.foreach { r =>
      val mHit = r.getAs[Long]("m_hit")
      // At most one register per distinct user, never more than m.
      assert(mHit <= math.min(r.getAs[Long]("n_exact"), CdcOps.HllM.toLong))
      // Harmonic numerator stays inside its exact-long envelope:
      // every register contributes (0, 2^53] — hit or zero.
      val sumNum = r.getAs[Long]("sum_num")
      assert(sumNum > 0L && sumNum <= CdcOps.HllM.toLong * (1L << 53))
      assert(r.getAs[Double]("hll_est") > 0.0)
    }
    // More distinct users ⇒ strictly smaller harmonic numerator (more
    // registers pulled off zero / deeper rhos).
    assert(rows("click").getAs[Long]("sum_num") <
      rows("signup").getAs[Long]("sum_num"))
  }

  test("pareto frontier: domination includes equal-price larger-size") {
    val dir = freshScratch()
    writeTable("part", Seq(
      (1L, "p1", "B", "T", 1, 3.00),
      (2L, "p2", "B", "T", 1, 5.00),
      (3L, "p3", "B", "T", 2, 2.50),
      (6L, "p6", "B", "T", 2, 2.50),
      (4L, "p4", "B", "T", 3, 4.00),
      (5L, "p5", "B", "T", 3, 2.50)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"), dir)
    val rows = BatchOps.paretoFrontier(spark, dir).collect()
      .map(r => r.getAs[Int]("p_size") -> r).toMap
    assert(rows.keySet == Set(1, 2, 3))
    // Size 3 at 250 cents: nothing larger exists — on the frontier.
    assert(rows(3).getAs[Boolean]("on_frontier"))
    assert(rows(3).getAs[Long]("n_parts_at_min") == 1L)
    // Size 2 also reaches 250, but size 3 matches that price with a
    // strictly larger size — dominated (the equal-price edge case).
    assert(!rows(2).getAs[Boolean]("on_frontier"))
    assert(rows(2).getAs[Long]("n_parts_at_min") == 2L)
    assert(rows(2).getAs[Long]("rep_partkey") == 3L)
    // Size 1's champion (300) is beaten outright by both larger sizes.
    assert(!rows(1).getAs[Boolean]("on_frontier"))
    assert(rows(1).getAs[Long]("min_price_cents") == 300L)
  }
}
