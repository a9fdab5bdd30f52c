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
}
