package graft

import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.BatchOps

/** ScalaCheck property tests for the round-12 statistics operators,
  * driven through the injectable-frame variants and compared row-for-row
  * against plain-Scala BigInt references — the same fixed-seed
  * discipline as CdcPropertiesSpec: deterministic, reproducible, and
  * structurally varied (tied dates, single-order customers, skewed
  * cells, 1×1 contingency tables). */
class StatPropertiesSpec extends GraftSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ------------------------------------------------------------------
  // chi-square: Spark cells vs a BigInt reference over random pairs
  // ------------------------------------------------------------------

  private val pairGen: Gen[(String, String)] = for {
    s <- Gen.oneOf("AUTO", "HOUSE", "MACH")
    p <- Gen.oneOf("1-URG", "2-HIGH", "3-MED", "4-LOW")
  } yield (s, p)

  test("property: chi2 cells match the exact BigInt closed form") {
    (0 until 8).foreach { i =>
      val pairs = gen(Gen.chooseNum(1, 80)
        .flatMap(n => Gen.listOfN(n, pairGen)), 20260814L + i)
      val got = BatchOps
        .segmentPriorityChi2Of(pairs.toDF("segment", "priority"))
        .collect()
      // reference: exact integer arithmetic straight from the counts
      val o = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val row = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val colT = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = pairs.size.toLong
      assert(got.length == o.size)
      got.foreach { r =>
        val key = (r.getAs[String]("segment"), r.getAs[String]("priority"))
        assert(r.getAs[Long]("observed") == o(key))
        assert(r.getAs[Long]("row_tot") == row(key._1))
        assert(r.getAs[Long]("col_tot") == colT(key._2))
        assert(r.getAs[Long]("n_total") == n)
        val (rt, ct) = (BigInt(row(key._1)), BigInt(colT(key._2)))
        assert(BigInt(r.getAs[Long]("expected_micro")) ==
          rt * ct * 1000000 / n)
        val d = BigInt(o(key)) * n - rt * ct
        assert(BigInt(r.getAs[Long]("contrib_micro")) ==
          d * d * 1000000 / (BigInt(n) * rt * ct))
      }
    }
  }

  // ------------------------------------------------------------------
  // reorder hazard: Spark life table vs a plain-Scala reference
  // ------------------------------------------------------------------

  private val orderGen: Gen[(Long, Long, Int)] = for {
    cust <- Gen.choose(1L, 6L)
    day <- Gen.choose(0, 120)
  } yield (cust, 0L, day) // orderkey reassigned unique below

  test("property: user value trend census matches scala Mann-Kendall") {
    (0 until 6).foreach { i =>
      val raw = gen(Gen.chooseNum(5, 60).flatMap(n => Gen.listOfN(n, for {
        cust <- Gen.choose(1L, 6L)
        day <- Gen.choose(0, 360)
        cents <- Gen.choose(100L, 900000L)
      } yield (cust, day, cents))), 20260816L + i)
      val orders = raw.map { case (c, d, cents) =>
        (c, Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
          .plusDays(d).atStartOfDay()), cents / 100.0)
      }
      val segs = (1L to 6L).map(c => (c, if (c % 2 == 0) "AUTO" else "HOUSE"))
      val got = BatchOps.userValueTrendOf(
        orders.toDF("o_custkey", "o_orderdate", "o_totalprice"),
        segs.toDF("c_custkey", "c_mktsegment")).collect()
      // reference: per-customer monthly cents → pairwise sign S → class
      val trends = orders.groupBy(_._1).view.mapValues { os =>
        val byMonth = os.groupBy { o =>
          val d = o._2.toLocalDateTime.toLocalDate
          d.getYear * 12 + d.getMonthValue
        }.view.mapValues(_.map(o => math.round(o._3 * 100)).sum)
          .toSeq.sortBy(_._1).map(_._2)
        val pairs = for {
          i <- byMonth.indices; j <- byMonth.indices if i < j
        } yield java.lang.Long.signum(byMonth(j) - byMonth(i)).toLong
        (pairs.size, pairs.sum)
      }.toMap.collect { case (c, (np, s)) if np >= 3 =>
        c -> (if (s > 0) "up" else if (s < 0) "down" else "flat")
      }
      val expected = trends.groupBy { case (c, t) =>
        (segs.find(_._1 == c).get._2, t)
      }.view.mapValues(_.size.toLong).toMap
      assert(got.length == expected.size)
      got.foreach { r =>
        val k = (r.getAs[String]("segment"), r.getAs[String]("trend"))
        assert(r.getAs[Long]("n_customers") == expected(k),
          s"census mismatch at $k")
      }
    }
  }

  test("property: reorder hazard matches the scala life table") {
    (0 until 8).foreach { i =>
      val raw = gen(Gen.chooseNum(1, 60)
        .flatMap(n => Gen.listOfN(n, orderGen)), 20260815L + i)
      val orders = raw.zipWithIndex.map { case ((c, _, d), j) =>
        (c, j + 1L, Timestamp.valueOf(f"2024-01-01 00:00:00")
          .toLocalDateTime.plusDays(d))
      }.map { case (c, k, ldt) => (c, k, Timestamp.valueOf(ldt)) }
      val got = BatchOps
        .reorderHazardOf(orders.toDF("o_custkey", "o_orderkey",
          "o_orderdate"))
        .collect()
      // reference: gaps from per-customer sorted day sequences
      val gaps = orders.groupBy(_._1).values.flatMap { os =>
        val days = os.map(_._3.toLocalDateTime.toLocalDate.toEpochDay)
          .sorted
        days.zip(days.tail).map { case (a, b) => (b - a).toInt }
      }.toSeq
      if (gaps.isEmpty) assert(got.isEmpty)
      else {
        val events = gaps.groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        val total = gaps.size.toLong
        val sortedGaps = events.keys.toSeq.sorted
        assert(got.map(_.getAs[Int]("gap_days")).toSeq == sortedGaps)
        got.foreach { r =>
          val g = r.getAs[Int]("gap_days")
          val atRisk = sortedGaps.filter(_ >= g).map(events).sum
          assert(r.getAs[Long]("n_events") == events(g))
          assert(r.getAs[Long]("n_at_risk") == atRisk)
          assert(r.getAs[Long]("n_total") == total)
          assert(r.getAs[Long]("hazard_mille") ==
            events(g) * 1000 / atRisk)
          assert(r.getAs[Long]("survival_mille") ==
            (atRisk - events(g)) * 1000 / total)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // Cramér's V: the aggregate over chi2 cells vs a BigInt reference
  // ------------------------------------------------------------------

  test("property: cramers V matches the BigInt chi2 total") {
    (0 until 6).foreach { i =>
      val pairs = gen(Gen.chooseNum(2, 80)
        .flatMap(n => Gen.listOfN(n, pairGen)), 20260901L + i)
      val r = BatchOps
        .cramersVOf(BatchOps.segmentPriorityChi2Of(
          pairs.toDF("segment", "priority")))
        .head()
      val o = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val row = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val colT = pairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = BigInt(pairs.size)
      val chi2 = o.map { case ((s, p), obs) =>
        val (rt, ct) = (BigInt(row(s)), BigInt(colT(p)))
        val d = BigInt(obs) * n - rt * ct
        d * d * 1000000 / (n * rt * ct)
      }.sum
      assert(BigInt(r.getAs[Long]("chi2_micro")) == chi2)
      assert(r.getAs[Long]("n_rows") == row.size.toLong)
      assert(r.getAs[Long]("n_cols") == colT.size.toLong)
      assert(r.getAs[Long]("dof") ==
        (row.size - 1).toLong * (colT.size - 1))
      val dofMin = BigInt(math.min(row.size, colT.size) - 1)
      if (dofMin > 0)
        assert(BigInt(r.getAs[Long]("v2_micro")) == chi2 / (n * dofMin))
      else assert(r.isNullAt(r.fieldIndex("v2_micro")))
    }
  }

  // ------------------------------------------------------------------
  // penny allocation: conservation + per-line values vs BigInt reference
  // ------------------------------------------------------------------

  test("property: penny allocation conserves totals and matches the " +
    "largest-remainder reference") {
    (0 until 6).foreach { i =>
      // a handful of orders, 1..6 positive-price lines each
      val orders = gen(Gen.chooseNum(1, 10).flatMap(n =>
        Gen.listOfN(n, for {
          nl <- Gen.choose(1, 6)
          prices <- Gen.listOfN(nl, Gen.choose(1L, 99999L))
          total <- Gen.choose(1L, 500000L)
        } yield (prices, total))), 20261001L + i)
        .zipWithIndex.map { case ((ps, t), k) => (k.toLong + 1, ps, t) }
      val lines = orders.flatMap { case (ok, ps, t) =>
        ps.zipWithIndex.map { case (p, j) => (ok, j.toLong + 1, p, t) }
      }
      val got = BatchOps.pennyAllocationAuditOf(
          lines.toDF("l_orderkey", "ln", "price_c", "total_c"))
        .collect()
        .map(r => r.getAs[Long]("l_orderkey") ->
          (r.getAs[Long]("alloc_sum_c"), r.getAs[Long]("n_bumped"),
            r.getAs[Long]("alloc_checksum"))).toMap
      orders.foreach { case (ok, ps, t) =>
        val sumC = BigInt(ps.sum)
        val base = ps.map(p => (BigInt(t) * p / sumC))
        val frac = ps.map(p => (BigInt(t) * p % sumC))
        val r = BigInt(t) - base.sum
        val bump = frac.zipWithIndex
          .sortBy { case (f, j) => (-f, j) }.take(r.toInt)
          .map(_._2).toSet
        val alloc = base.zipWithIndex.map { case (b, j) =>
          b + (if (bump(j)) 1 else 0) }
        val (gotSum, gotBumped, gotCk) = got(ok)
        assert(BigInt(gotSum) == alloc.sum && alloc.sum == BigInt(t))
        assert(gotBumped == r.toLong)
        assert(BigInt(gotCk) ==
          alloc.zipWithIndex.map { case (a, j) => a * (j + 1) }.sum)
      }
    }
  }

  // ------------------------------------------------------------------
  // two-sample KS: Spark sup-norm vs a plain-Scala BigInt reference
  // ------------------------------------------------------------------

  test("property: KS drift matches the BigInt sup-norm reference") {
    (0 until 6).foreach { i =>
      val obs = gen(Gen.chooseNum(4, 120).flatMap(n => Gen.listOfN(n, for {
        src <- Gen.oneOf("a", "b", "c")
        len <- Gen.choose(1L, 40L)
      } yield (src, len))), 20260910L + i)
      // need at least two sources, else m_s = 0 divides by zero
      val all = if (obs.map(_._1).distinct.size < 2)
        obs ++ Seq(("a", 1L), ("b", 2L)) else obs
      val got = graft.operators.TextOps
        .ksDriftOf(all.toDF("source", "len"))
        .collect()
      val bySrc = all.groupBy(_._1)
      val nAll = BigInt(all.size)
      val gridLens = all.map(_._2).distinct.sorted
      assert(got.map(_.getAs[String]("source")).toSeq ==
        bySrc.keys.toSeq.sorted)
      got.foreach { r =>
        val src = r.getAs[String]("source")
        val ns = BigInt(bySrc(src).size)
        val ms = nAll - ns
        assert(BigInt(r.getAs[Long]("n_s")) == ns)
        assert(BigInt(r.getAs[Long]("m_s")) == ms)
        val dNum = gridLens.map { v =>
          val cumS = BigInt(bySrc(src).count(_._2 <= v))
          val cumRest = BigInt(all.count(o => o._1 != src && o._2 <= v))
          (cumS * ms - cumRest * ns).abs
        }.max
        assert(BigInt(r.getAs[Long]("d_micro")) ==
          dNum * 1000000 / (ns * ms))
      }
    }
  }
}
