package graft

import org.apache.spark.sql.functions._
import graft.operators.TpchOps

/** Invariants for the adapted TPC-H classics in [[TpchOps]] — each test
  * pins a property the DuckDB oracle can't see (cross-query
  * reconciliation, an independent Spark-SQL formulation, tie semantics)
  * plus the plan shapes that make the queries scale. */
class TpchOpsSpec extends GraftSpec {
  private val dir = "/root/testdata/sf0.001"

  private def reg(name: String): Unit =
    Tables.table(spark, dir, name).createOrReplaceTempView(name)

  test("Q7: exactly the two directed focus pairs, positive volumes") {
    // sf0.01: the directed NATION_1↔NATION_2 pair sample is empty at
    // sf0.001 (2/25ths of suppliers × 2/25ths of customers).
    val rows = TpchOps.tradeVolumeQ7(spark, "/root/testdata/sf0.01").collect()
    val pairs = rows.map(r =>
      (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    val legal = Set(
      (TpchOps.TradeNationA, TpchOps.TradeNationB),
      (TpchOps.TradeNationB, TpchOps.TradeNationA))
    assert(pairs.subsetOf(legal) && pairs.nonEmpty)
    rows.foreach { r =>
      assert(Set(1996, 1997).contains(r.getAs[Int]("l_year")))
      assert(r.getAs[Long]("rev_c") > 0 && r.getAs[Long]("n_lines") > 0)
    }
  }

  test("Q13: histogram masses reconcile to customer and order counts") {
    val rows = TpchOps.customerOrderDistQ13(spark, dir).collect()
    val nCust = Tables.customer(spark, dir).count()
    val nOrders = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= TpchOps.DistExcludedPriority)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(rows.map(_.getAs[Long]("custdist")).sum === nCust)
    assert(rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum === nOrders)
  }

  test("Q15: every emitted supplier sits at the exact maximum") {
    val rows = TpchOps.topSupplierQ15(spark, dir).collect()
    assert(rows.nonEmpty)
    // Independent per-supplier revenue via SQL over the raw table.
    reg("lineitem")
    val mx = spark.sql(
      s"""SELECT max(rev) FROM (
         |  SELECT CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
         |    * 100) AS BIGINT)) AS BIGINT) AS rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '${TpchOps.TopSupplierFrom} 00:00:00'
         |    AND l_shipdate < TIMESTAMP '${TpchOps.TopSupplierUntil} 00:00:00'
         |  GROUP BY l_suppkey)""".stripMargin).head().getLong(0)
    rows.foreach(r => assert(r.getAs[Long]("total_rev_c") === mx))
  }

  test("Q17: floor-div relation holds; empty slice degrades to null row") {
    val r = TpchOps.smallQtyRevenueQ17(spark, dir).head()
    if (r.isNullAt(r.fieldIndex("total_price_c"))) {
      // sf0.001 has no Brand#12 part in the size band — the global
      // aggregate must still emit its single all-null/zero row.
      assert(r.getAs[Long]("n_lines") === 0L)
    } else {
      assert(r.getAs[Long]("avg_yearly_c") ===
        r.getAs[Long]("total_price_c") / 7)
      assert(r.getAs[Long]("n_lines") > 0)
    }
  }

  test("Q19: branch masses total the disjunction; labels well-formed") {
    val rows = TpchOps.discountedRevenueQ19(spark, dir).collect()
    assert(rows.map(_.getAs[String]("branch")).toSet
      .subsetOf(Set("A", "B", "C")))
    val orCount = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .filter(TpchOps.Q19Branches.map { case (_, b, sz, qLo, qHi) =>
        col("p_brand") === b && col("p_size").between(1, sz) &&
          col("l_quantity").between(qLo, qHi)
      }.reduce(_ || _))
      .count()
    assert(rows.map(_.getAs[Long]("n_lines")).sum === orCount)
  }

  test("Q21: decorrelated aggregate matches Spark's own correlated form") {
    Seq("lineitem", "orders", "supplier").foreach(reg)
    // The EXISTS/NOT-EXISTS original, planned by Spark itself — an
    // independent plan (subquery rewrite) over the same session.
    val sql = spark.sql(
      s"""SELECT s.s_name, count(*) AS numwait
         |FROM supplier s
         |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
         |JOIN orders o ON o.o_orderkey = l1.l_orderkey
         |WHERE o.o_orderstatus = 'F'
         |  AND datediff(CAST(l1.l_shipdate AS DATE),
         |    CAST(o.o_orderdate AS DATE)) > ${TpchOps.WaitingLagDays}
         |  AND EXISTS (
         |    SELECT 1 FROM lineitem l2
         |    WHERE l2.l_orderkey = l1.l_orderkey
         |      AND l2.l_suppkey <> l1.l_suppkey)
         |  AND NOT EXISTS (
         |    SELECT 1 FROM lineitem l3, orders o3
         |    WHERE l3.l_orderkey = l1.l_orderkey
         |      AND o3.o_orderkey = l3.l_orderkey
         |      AND l3.l_suppkey <> l1.l_suppkey
         |      AND datediff(CAST(l3.l_shipdate AS DATE),
         |        CAST(o3.o_orderdate AS DATE)) > ${TpchOps.WaitingLagDays})
         |GROUP BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val ours = TpchOps.waitingSuppliersQ21(spark, dir).collect()
      .map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toMap
    assert(ours === sql)
    assert(ours.nonEmpty)
  }

  test("Q22: members are in the focus nations, each group above the mean") {
    val rows = TpchOps.globalSalesOppQ22(spark, dir).collect()
    assert(rows.nonEmpty)
    val cust = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin(TpchOps.OppNations: _*))
      .select(round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      .filter(col("bal_c") > 0)
      .agg(sum("bal_c"), count(lit(1))).head()
    val (sumPos, nPos) = (cust.getLong(0), cust.getLong(1))
    rows.foreach { r =>
      assert(TpchOps.OppNations.contains(r.getAs[String]("n_name")))
      val (n, tot) = (r.getAs[Long]("numcust"), r.getAs[Long]("totacctbal_c"))
      assert(n > 0)
      // Every member is strictly above the positive mean, so the group
      // total must be too: tot·n_pos > n·Σpos.
      assert(tot * nPos > n * sumPos)
    }
  }

  test("plans: Q17 broadcasts both sides; Q22 anti-join; Q21 no cartesian") {
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val q17 = planOf(TpchOps.smallQtyRevenueQ17(spark, dir))
    assert(!q17.contains("SortMergeJoin"), s"fact shuffled for dims:\n$q17")
    val q22 = planOf(TpchOps.globalSalesOppQ22(spark, dir))
    assert(q22.contains("LeftAnti"), s"anti-join missing:\n$q22")
    val q21 = planOf(TpchOps.waitingSuppliersQ21(spark, dir))
    assert(!q21.contains("CartesianProduct") &&
      !q21.contains("BroadcastNestedLoopJoin"),
      s"correlation not decorrelated:\n$q21")
  }
}
