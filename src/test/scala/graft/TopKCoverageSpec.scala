package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.BatchOps
import graft.functions.TopKAggregator

/** The bounded-heap top-k aggregate and the interval-coverage sweep:
  * algebraic properties of the aggregator (the partial-merge contract
  * Spark relies on), result-equality against the window-rank
  * formulation, a brute-force day-set union reference for the sweep,
  * and the plan shapes that make both scale. */
class TopKCoverageSpec extends GraftSpec {
  private val dir = "/root/testdata/sf0.001"

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def bruteTopK(xs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.distinct.sortBy(t => (-t._1, t._2)).take(k)

  test("property: TopKAggregator reduce/merge match brute force " +
    "under any partitioning and merge order") {
    (0 until 10).foreach { i =>
      val seed = 20260920L + i
      val xs = gen(Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, for {
        v <- Gen.choose(0L, 20L) // narrow domain → many ties
        id <- Gen.choose(1L, 500L)
      } yield (v, id))), seed).distinct
      val k = 1 + (i % 5)
      val agg = new TopKAggregator(k)
      // random partitioning into chunks, each reduced independently
      val nChunks = 1 + gen(Gen.choose(0, 4), seed * 31)
      val chunks = xs.zipWithIndex.groupBy(_._2 % nChunks).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce)).toSeq
      // fold partials in a rotated (arbitrary) order
      val rotated = if (chunks.isEmpty) chunks
        else chunks.drop(i % chunks.size) ++ chunks.take(i % chunks.size)
      val merged = rotated.foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == bruteTopK(xs, k),
        s"k=$k xs=$xs")
    }
  }

  test("nation top customers equals the window-rank formulation") {
    val got = BatchOps.nationTopCustomers(spark, dir).collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("rank"),
        r.getAs[Long]("c_custkey"), r.getAs[Long]("spend_c"))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name")
      .orderBy(col("spend_c").desc, col("c_custkey"))
    val ref = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long"))
        .as("spend_c"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= BatchOps.TopCustomersK)
      .select("n_name", "rank", "c_custkey", "spend_c")
      .collect()
      .map(r => (r.getAs[String]("n_name"), r.getAs[Long]("rank"),
        r.getAs[Long]("c_custkey"), r.getAs[Long]("spend_c"))).toSeq
    assert(got.sorted == ref.sorted && got.nonEmpty)
  }

  test("top-k aggregate plans as ObjectHashAggregate with partial merge") {
    val df = BatchOps.nationTopCustomers(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ObjectHashAggregate"),
      s"typed aggregate fell back to sort-based:\n$plan")
    assert(plan.contains("partial_topkaggregator") ||
      plan.contains("merge_topkaggregator") ||
      plan.split("\n").count(_.contains("ObjectHashAggregate")) >= 2,
      s"no partial/merge split — map-side combine lost:\n$plan")
  }

  test("recursive hierarchy census matches the closed-form depth") {
    val rows = BatchOps.keyHierarchyRollup(spark, dir).collect()
    val keys = Tables.customer(spark, dir)
      .select("c_custkey").collect().map(_.getLong(0))
    def depth(k: Long): Int = {
      var (c, d) = (k, 0)
      while (c >= BatchOps.HierarchyFanout) {
        c /= BatchOps.HierarchyFanout; d += 1
      }
      d
    }
    val census = keys.groupBy(depth).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r.getAs[Int]("depth") ->
      r.getAs[Long]("n_customers")).toMap == census)
    // every key reached exactly once: the recursion neither loses
    // subtrees nor revisits them
    assert(rows.map(_.getAs[Long]("n_customers")).sum == keys.length)
    rows.foreach(r => assert(r.getAs[Long]("n_roots") <=
      BatchOps.HierarchyFanout))
  }

  test("variant payload census reconciles with the fault-injection rule") {
    val rows = graft.operators.CdcOps.propsVariantStats(spark, dir).collect()
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id")))
    val byType = ev.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet == byType.keySet)
    rows.foreach { r =>
      val ids = byType(r.getAs[String]("event_type")).map(_._2)
      assert(r.getAs[Long]("n_events") == ids.length.toLong)
      // %13 corruption truncates the JSON → invalid; %17 (and not %13)
      // swaps in a k-less object → valid but missing
      assert(r.getAs[Long]("n_invalid") == ids.count(_ % 13 == 0).toLong)
      assert(r.getAs[Long]("n_missing_k") ==
        ids.count(id => id % 13 != 0 && id % 17 == 0).toLong)
      assert(r.getAs[Long]("min_k") >= 0 &&
        r.getAs[Long]("max_k") <= 100)
    }
  }

  test("transit coverage matches a brute-force day-set union") {
    val got = BatchOps.supplierTransitCoverage(spark, dir).collect()
    // reference: materialize each supplier's covered day SET
    val md = java.security.MessageDigest.getInstance("MD5")
    def transit(lid: Long): Long = {
      val hex = md.digest(lid.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      BigInt(hex, 16).toLong % BatchOps.MaxTransitDays + 1
    }
    val epoch = java.time.LocalDate.of(1992, 1, 1).toEpochDay
    val spans = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("sd"))
      .collect()
      .map { r =>
        val lid = r.getAs[Long]("l_orderkey") * 8 + r.getAs[Int]("l_linenumber")
        val d0 = r.getAs[java.sql.Date]("sd").toLocalDate.toEpochDay - epoch
        (r.getAs[Long]("l_suppkey"), d0, d0 + transit(lid))
      }
    val ref = spans.groupBy(_._1).view.mapValues { ss =>
      val days = ss.flatMap { case (_, a, b) => a to b }.toSet
      (ss.size.toLong, days.size.toLong)
    }.toMap
    assert(got.map(_.getAs[Long]("l_suppkey")).toSet == ref.keySet)
    got.foreach { r =>
      val (nShip, covered) = ref(r.getAs[Long]("l_suppkey"))
      assert(r.getAs[Long]("n_shipments") == nShip)
      assert(r.getAs[Long]("covered_days") == covered)
      assert(r.getAs[Long]("covered_days") <= r.getAs[Long]("span_days"))
      assert(r.getAs[Long]("n_islands") >= 1 &&
        r.getAs[Long]("n_islands") <= r.getAs[Long]("n_shipments"))
      assert(r.getAs[Long]("busy_mille") <= 1000)
    }
  }
}
