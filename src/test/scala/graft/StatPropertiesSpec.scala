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
}
