package graft

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.CdcOps
import graft.streaming.Event

/** ScalaCheck-generated property tests (SURVEY §5 item 3) over the CDC
  * operators, driven through the injectable-frame variants so each case
  * is an in-memory frame (no parquet round trip). Cases are drawn from
  * ScalaCheck generators with a FIXED seed: the suite is deterministic,
  * reproducible, and still explores structurally varied inputs
  * (duplicate keys, ties broken by event_id, tombstones in every
  * position). */
class CdcPropertiesSpec extends GraftSpec {
  import spark.implicits._

  private val eventGen: Gen[Event] = for {
    id <- Gen.choose(1L, 500L)
    minute <- Gen.choose(0, 90)
    user <- Gen.choose(1L, 6L)
    etype <- Gen.oneOf("signup", "click", "view", "purchase", "error")
    value <- Gen.choose(0, 40000).map(_ / 100.0)
  } yield Event(id, ts(f"2024-01-01 10:${minute / 60}%02d:${minute % 60}%02d"),
    user, etype, value, "{}")

  private val batchGen: Gen[List[Event]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, eventGen))

  /** Deterministic sample stream from a fixed seed. event_ids are
    * reassigned to be unique per case: two DISTINCT events sharing a
    * (ts, event_id) tie would make the latest-wins pick genuinely
    * ambiguous — uniqueness is the schema's own invariant (replayed
    * duplicates of the SAME event keep the same id, which is the
    * at-least-once case the properties exercise). */
  private def cases(n: Int): Seq[List[Event]] =
    (0 until n).map { i =>
      val raw = batchGen.apply(Gen.Parameters.default, Seed(20260812L + i)).get
      raw.zipWithIndex.map { case (e, j) => e.copy(event_id = j + 1L) }
    }

  private def df(events: Seq[Event]): DataFrame =
    spark.createDataset(events).toDF()

  private def rows(d: DataFrame): Seq[String] =
    d.collect().map(_.toString).sorted.toSeq

  test("property: upsert-latest is idempotent under replay and reorder") {
    val rnd = new scala.util.Random(7)
    cases(8).foreach { events =>
      val base = rows(CdcOps.upsertLatestOf(df(events)))
      // at-least-once delivery: full replay + arbitrary arrival order
      val replayed = rnd.shuffle(events ++ events)
      assert(rows(CdcOps.upsertLatestOf(df(replayed))) == base)
    }
  }

  test("property: minute metrics conserve event count and value total") {
    cases(8).foreach { events =>
      val out = CdcOps.minuteMetricsOf(df(events)).collect()
      assert(out.map(_.getAs[Long]("n_events")).sum == events.size)
      val expected = events.map(e => BigDecimal(e.value).setScale(2)).sum
      val got = out.map(r => BigDecimal(r.getAs[Double]("total_value"))
        .setScale(2)).sum
      assert(got == expected)
    }
  }

  test("property: counters partition the stream (counts sum to input size)") {
    cases(8).foreach { events =>
      val out = CdcOps.eventTypeCountersOf(df(events)).collect()
      assert(out.map(_.getAs[Long]("n_events")).sum == events.size)
      // every (event_type) group appears exactly once per op
      val keys = out.map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("op")))
      assert(keys.distinct.length == keys.length)
    }
  }

  test("property: tombstoned users never appear in membership sets") {
    cases(8).foreach { events =>
      val latestByUser = events.groupBy(_.user_id).map { case (u, es) =>
        u -> es.maxBy(e => (e.ts.getTime, e.event_id)).event_type
      }
      val out = CdcOps.userEventSetsOf(df(events)).collect()
        .map(_.getAs[Long]("user_id")).toSet
      latestByUser.foreach { case (u, lastType) =>
        if (lastType == "error") assert(!out.contains(u))
        else assert(out.contains(u))
      }
    }
  }

  test("property: transitions conserve chains and probabilities sum to 1") {
    cases(8).foreach { events =>
      val rows = CdcOps.eventTransitionsOf(df(events)).collect()
      // Conservation: every user chain of length n contributes exactly
      // n−1 transitions.
      val expected = events.groupBy(_.user_id).values
        .map(_.size - 1).filter(_ > 0).sum
      assert(rows.map(_.getAs[Long]("n_transitions")).sum == expected)
      // Stochastic rows: P(next | prev) sums to 1 for every prev state.
      rows.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rs) =>
        assert(math.abs(rs.map(_.getAs[Double]("p_next")).sum - 1.0) < 1e-12)
      }
    }
  }

  test("property: change log equals the pairwise diff of each version chain") {
    cases(8).foreach { events =>
      // Reference model: per user, sort the chain by (ts, event_id) and
      // keep exactly the consecutive pairs whose value differs.
      val expected = events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        val chain = es.sortBy(e => (e.ts.getTime, e.event_id))
        chain.zip(chain.drop(1)).collect {
          case (a, b) if a.value != b.value =>
            (u, b.event_id, b.value - a.value)
        }
      }.toSet
      val got = CdcOps.changeLogOf(df(events)).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[Double]("delta"))).toSet
      assert(got == expected)
    }
  }

  test("property: cohort retention is anchored and bounded") {
    cases(8).foreach { events =>
      val rows = CdcOps.cohortRetentionOf(df(events)).collect()
      // Offset 0 is every cohort's own week: full retention by
      // construction (a user is active in the week of their first
      // event).
      rows.filter(_.getAs[Int]("week_offset") == 0).foreach { r =>
        assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_users"))
        assert(r.getAs[Double]("retention") == 1.0)
      }
      // No cell exceeds its cohort; cohort sizes partition the users.
      rows.foreach { r =>
        assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_users"))
        assert(r.getAs[Int]("week_offset") >= 0)
      }
      val users = events.map(_.user_id).distinct.size
      assert(rows.filter(_.getAs[Int]("week_offset") == 0)
        .map(_.getAs[Long]("cohort_users")).sum == users)
    }
  }

  test("property: z-scores are centered and zero-variance never flags") {
    cases(8).foreach { events =>
      val rows = CdcOps.dailyAnomalyZscoreOf(df(events)).collect()
      // One row per (type, day) of the input.
      val expected = events
        .map(e => (e.event_type, e.ts.toLocalDateTime.toLocalDate))
        .distinct.size
      assert(rows.length == expected)
      // Standardized scores sum to ~0 within each type (exact decimal
      // moments ⇒ only the final IEEE divisions wiggle).
      rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
        val zs = rs.flatMap(r => Option(r.getAs[java.lang.Double]("zscore")))
        if (zs.nonEmpty)
          assert(math.abs(zs.map(_.toDouble).sum) < 1e-6 * (zs.length + 1))
      }
    }
  }

  test("z-score flags an injected outlier day; constant series never flag") {
    // Type 'click': 9 quiet days + one 100× day. Type 'view': constant —
    // zero variance, z must be null and the flag false.
    val quiet = (1 to 9).map(d => Event(d.toLong,
      ts(f"2024-01-$d%02d 10:00:00"), 1L, "click", 10.0, "{}"))
    val spike = Event(10L, ts("2024-01-10 10:00:00"), 1L, "click",
      1000.0, "{}")
    val flat = (1 to 5).map(d => Event(100L + d,
      ts(f"2024-01-$d%02d 12:00:00"), 2L, "view", 7.0, "{}"))
    val rows = CdcOps.dailyAnomalyZscoreOf(df(quiet ++ Seq(spike) ++ flat))
      .collect()
    val flagged = rows.filter(_.getAs[Boolean]("is_anomaly"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[String]("event_type") == "click")
    assert(flagged.head.getAs[Double]("day_total") == 1000.0)
    rows.filter(_.getAs[String]("event_type") == "view").foreach { r =>
      assert(r.getAs[java.lang.Double]("zscore") == null)
      assert(!r.getAs[Boolean]("is_anomaly"))
    }
  }

  test("MAD flags the masked spike a z-score misses; zero MAD never flags") {
    // Type 'click': 7 ramp days + one 20× day. The spike inflates mean
    // AND stddev; MAD's 50% breakdown point keeps the median estimates
    // where the quiet days are, so the ratio stays diagnostic. Type
    // 'view': 4 identical days + one different — MAD is 0 (majority
    // identical), ratio must be null and the flag false even for the
    // deviating day (the mad=0 guard, mirroring the zero-variance rule).
    val ramp = (1 to 7).map(d => Event(d.toLong,
      ts(f"2024-01-$d%02d 10:00:00"), 1L, "click", d.toDouble, "{}"))
    val spike = Event(8L, ts("2024-01-08 10:00:00"), 1L, "click",
      20.0, "{}")
    val flat = (1 to 4).map(d => Event(100L + d,
      ts(f"2024-01-$d%02d 12:00:00"), 2L, "view", 7.0, "{}")) :+
      Event(105L, ts("2024-01-05 12:00:00"), 2L, "view", 9.0, "{}")
    val rows = CdcOps.madOutliersOf(df(ramp ++ Seq(spike) ++ flat))
      .collect()
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[String]("event_type") == "click")
    assert(flagged.head.getAs[Double]("day_total") == 20.0)
    // click medians: med of 1..7,20 = 4.5; mad of absdevs
    // [3.5,2.5,1.5,.5,.5,1.5,2.5,15.5] = 2.0; ratio = 15.5/2 = 7.75.
    assert(flagged.head.getAs[Double]("mad_ratio") == 7.75)
    rows.filter(_.getAs[String]("event_type") == "view").foreach { r =>
      assert(r.getAs[Double]("mad") == 0.0)
      assert(r.getAs[java.lang.Double]("mad_ratio") == null)
      assert(!r.getAs[Boolean]("is_outlier"))
    }
  }

  test("property: MAD outlier rows cover exactly the input (type, day)s") {
    cases(8).foreach { events =>
      val rows = CdcOps.madOutliersOf(df(events)).collect()
      val expected = events
        .map(e => (e.event_type, e.ts.toLocalDateTime.toLocalDate))
        .distinct.size
      assert(rows.length == expected)
      // At most half of any type's days can sit beyond the MAD cut —
      // the estimator's breakdown-point invariant.
      rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
        val n = rs.length
        assert(rs.count(_.getAs[Boolean]("is_outlier")) <= n / 2)
      }
    }
  }

  test("rolling 7d window is a calendar RANGE frame, not a ROWS frame") {
    // Days 1, 2, then a jump to 10: a ROWS-6 frame at day 10 would
    // reach back and swallow days 1-2; the RANGE frame must see only
    // day 10 itself.
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1L, "click", 5.0, "{}"),
      Event(2, ts("2024-01-02 10:00:00"), 1L, "click", 7.0, "{}"),
      Event(3, ts("2024-01-02 11:00:00"), 2L, "view", 1.0, "{}"),
      Event(4, ts("2024-01-10 10:00:00"), 3L, "purchase", 9.0, "{}"))
    val rows = CdcOps.rolling7dMetricsOf(df(events)).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r).toMap
    assert(rows("2024-01-02").getAs[Long]("events_7d") == 3L)
    assert(rows("2024-01-02").getAs[Long]("days_present_7d") == 2L)
    assert(rows("2024-01-10").getAs[Long]("events_7d") == 1L)
    assert(rows("2024-01-10").getAs[Long]("days_present_7d") == 1L)
    assert(rows("2024-01-10").getAs[Double]("value_7d") == 9.0)
  }

  test("property: rolling 7d totals equal a brute-force calendar window") {
    cases(8).foreach { events =>
      val byDay = events
        .groupBy(e => e.ts.toLocalDateTime.toLocalDate)
        .view.mapValues(_.size).toMap
      val got = CdcOps.rolling7dMetricsOf(df(events)).collect()
      got.foreach { r =>
        val day = r.getAs[java.sql.Date]("day").toLocalDate
        val expected = (0 to 6)
          .map(k => byDay.getOrElse(day.minusDays(k.toLong), 0)).sum
        assert(r.getAs[Long]("events_7d") == expected,
          s"window at $day")
      }
    }
  }

  test("incremental rollup equals a from-scratch aggregate of survivors") {
    // True CDC chains honoring the synthesized-image convention
    // (before = value − 10): create v0, k updates of +10 each, optional
    // delete carrying prev + 10 (so its before retracts exactly prev).
    val rnd = new scala.util.Random(11)
    (0 until 6).foreach { _ =>
      var id = 0L
      var minute = 0
      val alive = scala.collection.mutable.Map.empty[Long, Double]
      val events = (1L to 8L).flatMap { user =>
        val k = rnd.nextInt(4)
        val dead = rnd.nextBoolean()
        val v0 = (rnd.nextInt(10000) + 100) / 100.0
        def next(etype: String, v: Double): Event = {
          id += 1; minute += 1
          Event(id, ts(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"),
            user, etype, v, "{}")
        }
        val chain = scala.collection.mutable.Buffer(next("signup", v0))
        var v = v0
        (1 to k).foreach { _ => v += 10; chain += next("click", v) }
        if (dead) chain += next("error", v + 10)
        else alive(user) = v
        chain
      }
      val got = CdcOps.incrementalRollupOf(df(events)).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Double]("net_value"), r.getAs[Long]("net_rows"))).toMap
      (1L to 8L).foreach { user =>
        val (v, n) = got(user)
        alive.get(user) match {
          case Some(expected) =>
            assert(n == 1L, s"user $user net_rows")
            assert(math.abs(v - expected) < 1e-9, s"user $user net_value")
          case None =>
            assert(n == 0L && math.abs(v) < 1e-9, s"user $user tombstoned")
        }
      }
      // Cross-check against the independent latest-state compaction.
      val survivors = CdcOps.upsertLatestOf(df(events)).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("last_value"))
        .toMap
      assert(survivors.keySet == alive.keySet)
      survivors.foreach { case (u, v) =>
        assert(math.abs(v - got(u)._1) < 1e-9)
      }
    }
  }

  test("property: time-weighted average telescopes and stays bounded") {
    cases(8).foreach { events =>
      val rows = CdcOps.timeWeightedValueOf(df(events)).collect()
      val byUser = events.groupBy(_.user_id)
      rows.foreach { r =>
        val u = r.getAs[Long]("user_id")
        val evs = byUser(u).sortBy(e => (e.ts.getTime, e.event_id))
        // Σ durations telescopes to last - first
        assert(r.getAs[Long]("total_ms") ==
          evs.last.ts.getTime - evs.head.ts.getTime)
        assert(r.getAs[Long]("n_intervals") == evs.length - 1)
        // a time-weighted mean is a convex combination of held values
        val cents = evs.map(e => math.round(e.value * 100))
        val twa = r.getAs[Double]("twa_value")
        assert(twa >= cents.min / 100.0 - 1e-9 &&
          twa <= cents.max / 100.0 + 1e-9)
      }
      // a key whose events all share one timestamp has total_ms = 0;
      // the division guard must emit 0.0, never NaN/Inf
      rows.foreach { r =>
        val twa = r.getAs[Double]("twa_value")
        assert(!twa.isNaN && !twa.isInfinite)
        if (r.getAs[Long]("total_ms") == 0L) assert(twa == 0.0)
      }
    }
  }

  test("property: native session windows equal a first-principles fold") {
    val gapUs = CdcOps.SessionGapMs * 1000
    cases(8).foreach { events =>
      val got = CdcOps.sessionWindowNativeOf(df(events)).collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("session_start_ms"),
          r.getAs[Long]("session_end_ms"),
          r.getAs[Long]("n_events"))).toSet
      val want = events.groupBy(_.user_id).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
        val sessions = sorted.tail.foldLeft(
          List(List(sorted.head))) { (acc, e) =>
          // native rule: new session iff µs diff >= gap
          if ((e.ts.getTime - acc.head.head.ts.getTime) * 1000L >= gapUs)
            List(e) :: acc
          else (e :: acc.head) :: acc.tail
        }
        sessions.map { s =>
          val ms = s.map(_.ts.getTime)
          (u, ms.min, ms.max + CdcOps.SessionGapMs, s.length.toLong)
        }
      }.toSet
      assert(got == want, s"native sessions diverge from the fold")
    }
  }

  test("property: offset audit is invariant under full replay") {
    cases(8).foreach { events =>
      val base = rows(CdcOps.cdcGapDetectionOf(df(events)))
      assert(rows(CdcOps.cdcGapDetectionOf(df(events ++ events))) == base)
    }
  }

  test("property: resampled gauge values are convex and grid-aligned") {
    cases(8).foreach { events =>
      val byUser = events.groupBy(_.user_id)
      CdcOps.gaugeResampleOf(df(events)).collect().foreach { r =>
        val u = r.getAs[Long]("user_id")
        assert(r.getAs[Long]("grid_ms") % CdcOps.ResampleGridMs == 0)
        val cents = byUser(u).map(e => math.round(e.value * 100))
        val v = r.getAs[Double]("interp_value")
        assert(v >= cents.min / 100.0 - 1e-9 &&
          v <= cents.max / 100.0 + 1e-9,
          s"user $u interpolated $v outside value hull")
      }
    }
  }

  test("event funnel: strict-after steps, drop-off, and ties do not advance") {
    val dir = freshScratch()
    // user 1: full ordered funnel. user 2: view then purchase BEFORE
    // any click — must stop at step 1. user 3: view and click at the
    // SAME instant — strict `>` means the click does not qualify.
    // user 4: click+purchase but never viewed — never enters. user 5:
    // purchase before view, click after view, purchase never again —
    // reaches step 2 only (the early purchase precedes its click
    // anchor).
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0, "{}"),
      Event(2, ts("2024-01-01 10:01:00"), 1, "click", 0, "{}"),
      Event(3, ts("2024-01-01 10:02:00"), 1, "purchase", 0, "{}"),
      Event(4, ts("2024-01-01 09:00:00"), 2, "view", 0, "{}"),
      Event(5, ts("2024-01-01 08:00:00"), 2, "purchase", 0, "{}"),
      Event(6, ts("2024-01-01 11:00:00"), 3, "view", 0, "{}"),
      Event(7, ts("2024-01-01 11:00:00"), 3, "click", 0, "{}"),
      Event(8, ts("2024-01-01 12:00:00"), 4, "click", 0, "{}"),
      Event(9, ts("2024-01-01 12:01:00"), 4, "purchase", 0, "{}"),
      Event(10, ts("2024-01-01 07:00:00"), 5, "purchase", 0, "{}"),
      Event(11, ts("2024-01-01 07:30:00"), 5, "view", 0, "{}"),
      Event(12, ts("2024-01-01 07:45:00"), 5, "click", 0, "{}"))
    writeTable("events", spark.createDataset(events).toDF(), dir)
    val rows = CdcOps.eventFunnel(spark, dir).collect()
      .map(r => r.getAs[Int]("step") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("conv_prev_mille")))
      .toMap
    assert(rows(1) == (4L, 1000L)) // users 1, 2, 3, 5 viewed
    assert(rows(2) == (2L, 500L))  // only 1 and 5 clicked after view
    assert(rows(3) == (1L, 500L))  // only 1 purchased after that click
  }

  test("envelopeNested emits globally event_id-ordered rows without a terminal sort") {
    // r15 moved the presentation sort BEFORE the to_json->from_json
    // round trip (the range exchange samples its child, so a terminal
    // sort executed the whole pipeline twice). The emitted order now
    // rides order PRESERVATION through narrow json projections — a
    // property the DataFrame API does not guarantee for non-terminal
    // sorts in general — and the DuckDB gate compares rows in emitted
    // order, so a Spark upgrade that legally reorders must fail HERE,
    // not as an unexplained hash mismatch at the next gate run.
    val ids = CdcOps.envelopeNested(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Long]("event_id"))
    assert(ids.nonEmpty)
    assert(ids.sameElements(ids.sorted),
      "envelopeNested output is no longer globally ordered by event_id " +
        "- restore a terminal orderBy (and re-measure the resample cost)")
    // piiScrub adopted the same input-side sort; same pin.
    val dids = graft.operators.TextOps
      .piiScrub(spark, "/root/testdata/sf0.001")
      .collect().map(_.getAs[Long]("doc_id"))
    assert(dids.nonEmpty)
    assert(dids.sameElements(dids.sorted),
      "piiScrub output is no longer globally ordered by doc_id")
  }
}
