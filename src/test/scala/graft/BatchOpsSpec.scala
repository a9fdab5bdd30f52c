package graft

import org.apache.spark.sql.functions.md5
import graft.operators.{BatchOps, CdcOps}

/** Boundary semantics of the batch operators (SURVEY §5 item 2): percentile
  * edges, CASE precedence, zero/null guards — the places where the
  * reference's pandas overwrite order and COALESCE defaults are easy to get
  * wrong in a `when` chain. */
class BatchOpsSpec extends GraftSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    // 6 customers; c6 has no orders (A1 coalesce case). With n=6, exact
    // percentile index 0.8*(6-1) = 4.0 → p80 is EXACTLY the 5th-smallest
    // value (no interpolation), so one customer can sit precisely on the
    // threshold. Spends sorted: [0,100,200,300,350,400] → p80 = 350,
    // p60 (idx 3.0) = 300. Order counts sorted: [0,1,1,1,2,2] → p80 = 2.
    writeTable("customer", Seq(
      (1L, "c1", "SEG_A", 0L),
      (2L, "c2", "SEG_A", 0L),
      (3L, "c3", "SEG_B", 1L),
      (4L, "c4", "SEG_B", 1L),
      (5L, "c5", "SEG_B", 2L),
      (6L, "c6", "SEG_B", 2L)
    ).toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
    writeTable("orders", Seq(
      (10L, 1L, "O", 100.0, ts("2024-03-01 00:00:00")),
      (11L, 2L, "O", 200.0, ts("2024-03-05 00:00:00")),
      (12L, 3L, "F", 300.0, ts("2024-02-01 00:00:00")),
      (13L, 4L, "F", 150.0, ts("2024-03-08 00:00:00")),
      (14L, 4L, "O", 200.0, ts("2024-03-10 00:00:00")),
      (15L, 5L, "F", 250.0, ts("2024-01-01 00:00:00")),
      (16L, 5L, "O", 150.0, ts("2024-03-09 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate"))
    // parts: p_size drives C6 precedence (0 → Out of Stock beats Low
    // Stock; 10 → Low Stock; 40 → Overstock) and C4 (p1 has no lineitem →
    // units_sold 0 → divide guard).
    writeTable("part", Seq(
      (1L, "p1", "B1", "T1", 0),
      (2L, "p2", "B1", "T1", 10),
      (3L, "p3", "B2", "T2", 40),
      (4L, "p4", "B2", "T2", 20)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size"))
    writeTable("lineitem", Seq(
      (10L, 2L, 5.0, 100.0, 0.0, ts("2024-03-01 00:00:00")),
      (11L, 3L, 2.0, 50.0, 0.5, ts("2024-03-05 00:00:00")),
      (12L, 4L, 1.0, 30.0, 0.0, ts("2024-02-01 00:00:00"))
    ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate"))
  }

  private lazy val segments =
    BatchOps.customerSegments(spark, scratch).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("A1: customer without orders gets count 0, spent 0.0, null date") {
    val roll = BatchOps.customerOrdersRollup(spark, scratch)
      .filter($"c_custkey" === 6L).collect()
    assert(roll.length == 1)
    val r = roll.head
    assert(r.getAs[Long]("total_orders") == 0L)
    assert(r.getAs[Double]("total_spent") == 0.0)
    assert(r.getAs[java.sql.Timestamp]("last_order_date") == null)
  }

  test("C1: spend EXACTLY at p80 and orders EXACTLY at p80 is Gold (>=)") {
    // c4: spent 350 = p80_spent, orders 2 = p80_orders → both >= → Gold.
    assert(segments(4L).getAs[String]("segment") == "Gold")
    assert(segments(5L).getAs[String]("segment") == "Gold") // 400, 2
  }

  test("C1: spend exactly at p60 (but below p80) is Silver") {
    // c3: spent 300 = p60_spent exactly, 1 order < 2 → Silver.
    assert(segments(3L).getAs[String]("segment") == "Silver")
    assert(segments(2L).getAs[String]("segment") == "Bronze") // 200 < p60
    assert(segments(6L).getAs[String]("segment") == "Bronze") // no orders
  }

  test("C3: null last_order_date → 999 days → Inactive") {
    val c6 = segments(6L)
    assert(c6.getAs[Int]("days_since_last_order") == 999)
    assert(c6.getAs[String]("recency_segment") == "Inactive")
  }

  test("C3: recency bands are checked most-recent-first (≤7 before ≤30)") {
    // anchor = 2024-03-10 (max order date). c4 last order 03-10 → 0 days
    // → Very Active; c1 last order 03-01 → 9 days → Active (not Very);
    // c3 last order 02-01 → 38 days → Inactive.
    assert(segments(4L).getAs[String]("recency_segment") == "Very Active")
    assert(segments(1L).getAs[String]("recency_segment") == "Active")
    assert(segments(3L).getAs[Int]("days_since_last_order") == 38)
    assert(segments(3L).getAs[String]("recency_segment") == "Inactive")
  }

  test("C2: estimated_clv is exactly 2x total_spent") {
    assert(segments(4L).getAs[Double]("estimated_clv") == 700.0)
  }

  private lazy val perf =
    BatchOps.productPerformance(spark, scratch).collect()
      .map(r => r.getLong(0) -> r).toMap

  test("C6: stock-status precedence — Out of Stock beats Low Stock") {
    assert(perf(1L).getAs[String]("stock_status") == "Out of Stock")
    assert(perf(2L).getAs[String]("stock_status") == "Low Stock")
    assert(perf(3L).getAs[String]("stock_status") == "Overstock")
    assert(perf(4L).getAs[String]("stock_status") == "Normal")
  }

  test("C4: zero units_sold divides by 1, not 0") {
    val p1 = perf(1L)
    assert(p1.getAs[Double]("units_sold") == 0.0)
    assert(p1.getAs[Double]("revenue_per_unit") == 0.0) // 0.0 / 1
    assert(!p1.getAs[Double]("revenue_per_unit").isNaN)
  }

  test("A7: status re-aggregation matches direct aggregation") {
    val dist = BatchOps.statusDistribution(spark, scratch).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(dist("O") == ((4L, 650.0)))
    assert(dist("F") == ((3L, 700.0)))
  }

  test("O2: deterministic pick is identical across partitionings") {
    val viaOperator = BatchOps.randomOrderPick(spark, scratch)
      .collect().map(_.getLong(0)).toSeq
    val repartitioned = Tables.orders(spark, scratch)
      .repartition(7)
      .orderBy(md5($"o_orderkey".cast("string")), $"o_orderkey").limit(1)
      .collect().map(_.getAs[Long]("o_orderkey")).toSeq
    assert(viaOperator == repartitioned)
  }

  test("RFM scores are quintile-valued and the cell composes them") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.rfmScores(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rs, fs, ms) = (r.getAs[Int]("r_score"),
        r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))
      assert((1 to 5).contains(rs) && (1 to 5).contains(fs) &&
        (1 to 5).contains(ms))
      assert(r.getAs[Int]("rfm_cell") == rs * 100 + fs * 10 + ms)
    }
    // ntile(5) quintiles differ in size by at most one customer.
    val sizes = rows.groupBy(_.getAs[Int]("m_score")).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("co-purchase pairs are ordered, distinct, and truly co-ordered") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.partCopurchase(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= BatchOps.CopurchaseTopK)
    rows.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("n_orders") >= 1L)
    }
    // Spot-check the top pair really shares that many orders.
    val top = rows.head
    val n = Tables.lineitem(spark, dir)
      .filter($"l_partkey" === top.getAs[Long]("part_a") ||
        $"l_partkey" === top.getAs[Long]("part_b"))
      .select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_orderkey").count().filter($"count" === 2).count()
    assert(n == top.getAs[Long]("n_orders"))
  }

  test("linear attribution credits per purchase sum to the purchase value") {
    val dir = "/root/testdata/sf0.001"
    val rows = CdcOps.attributionLinear(spark, dir).collect()
    assert(rows.nonEmpty)
    val values = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.groupBy(_.getAs[Long]("purchase_id")).foreach { case (pid, rs) =>
      // Every touch shares equally...
      assert(rs.map(_.getAs[Int]("n_touches")).distinct.length == 1)
      assert(rs.head.getAs[Int]("n_touches") == rs.length)
      // ...and the credits reassemble the purchase value.
      val total = rs.map(_.getAs[Double]("credit")).sum
      assert(math.abs(total - values(pid)) < 1e-6,
        s"purchase $pid: credits $total vs value ${values(pid)}")
    }
  }

  test("skew-safe sharded distinct equals direct countDistinct") {
    // The value-space sharding must be exactly lossless: shards
    // partition the distinct values (each value lands in one shard), so
    // shard subtotals sum to the true distinct count for every key.
    import org.apache.spark.sql.functions.{countDistinct, col}
    val e = Tables.events(spark, "/root/testdata/sf0.01")
    val direct = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sharded = BatchOps
      .skewSafeDistinct(e, Seq("event_type"), "user_id", "n_users")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sharded == direct)
  }

  test("approx sketches track exact aggregates within tolerance") {
    // The 100 TB forms of COUNT DISTINCT and percentiles are sketches
    // (HLL++, approx_percentile) — exact forms shuffle every distinct
    // value / sort every group. No DuckDB oracle can referee an
    // approximate answer, so the spec pins the error bound instead:
    // HLL++ at default precision is specified to ~2% standard error,
    // and approx_percentile with accuracy 1000 lands within 1/1000 of
    // the rank space. Real testdata (sf0.01), not the scratch fixture.
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, expr, col}
    val e = Tables.events(spark, "/root/testdata/sf0.01")
    val r = e.agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      expr("percentile(value, 0.5)").as("exact_p50"),
      expr("approx_percentile(value, 0.5, 1000)").as("approx_p50")).head()
    val exactUsers = r.getAs[Long]("exact_users").toDouble
    val approxUsers = r.getAs[Long]("approx_users").toDouble
    assert(math.abs(approxUsers - exactUsers) / exactUsers <= 0.05,
      s"HLL drift: $approxUsers vs $exactUsers")
    val exactP50 = r.getAs[Double]("exact_p50")
    val approxP50 = r.getAs[Double]("approx_p50")
    assert(math.abs(approxP50 - exactP50) / math.abs(exactP50) <= 0.05,
      s"percentile drift: $approxP50 vs $exactP50")
  }

  test("salted join rollup equals the plain unsalted join, in-engine") {
    import org.apache.spark.sql.functions.{col, count, countDistinct,
      lit, round, sum}
    val dir = "/root/testdata/sf0.001"
    // Twin computed WITHOUT salt or shard decomposition — losslessness
    // of both skew tricks (join salt fan-out, distinct sharding)
    // asserted inside the engine, independent of the DuckDB oracle.
    val plain = graft.Tables.events(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("amount_cents"),
        countDistinct(col("user_id")).as("n_users"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("amount_cents"),
          r.getAs[Long]("n_users"))).toMap
    val salted = BatchOps.saltedJoinRollup(spark, dir).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("amount_cents"),
          r.getAs[Long]("n_users"))).toMap
    assert(salted == plain)
  }

  test("hilbert walk is a bijection on the full grid with perfectly " +
      "balanced buckets") {
    import org.apache.spark.sql.functions.{col, countDistinct, max, min}
    val n = 1 << BatchOps.ZorderBits
    // Every cell of the 256×256 grid exactly once: the curve index must
    // be a permutation of [0, n²) — any transcription slip in any of
    // the 8 unrolled rotation levels collapses distinct cells and
    // fails the distinct count.
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n).cast("long").as("hx"),
        (col("id") / n).cast("long").as("hy"))
    val enc = BatchOps.hilbertBucketed(grid)
    val row = enc.agg(countDistinct(col("h")).as("d"),
      min(col("h")).as("lo"), max(col("h")).as("hi")).collect()(0)
    assert(row.getAs[Long]("d") == n.toLong * n)
    assert(row.getAs[Long]("lo") == 0L && row.getAs[Long]("hi") ==
      n.toLong * n - 1)
    // A space-filling curve fills: equal-width cuts of curve space hold
    // exactly equal cell counts on the full grid.
    val buckets = enc.groupBy("h_bucket").count().collect()
    assert(buckets.length == (1 << BatchOps.ZorderBucketLog))
    assert(buckets.forall(_.getAs[Long]("count") ==
      n.toLong * n / (1 << BatchOps.ZorderBucketLog)))
  }

  test("k-anonymity audit: classes partition the dimension, risk exact") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.kAnonymityAudit(spark, dir).collect()
    val total = graft.Tables.customer(spark, dir).count()
    // Equivalence classes are a partition: sizes sum to the table.
    assert(rows.map(_.getAs[Long]("n_members")).sum == total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(n >= 1)
      assert(r.getAs[Long]("risk_mille") == 1000L / n)
      assert(r.getAs[Boolean]("suppress") == (n < BatchOps.KAnonK))
    }
    // Sorted ascending by class size → row 1 carries the release's
    // k-anonymity level.
    val sizes = rows.map(_.getAs[Long]("n_members")).toSeq
    assert(sizes == sizes.sorted)
  }

  test("status path listagg: one char per order, chronological bounds") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.statusPathListagg(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      // o_orderstatus is a single char, so the undelimited WITHIN GROUP
      // concatenation must be exactly one char per order — a dropped or
      // doubled element (the classic non-deterministic-agg bug) shows
      // up as a length mismatch.
      assert(r.getAs[String]("status_path").length.toLong == n)
      assert(r.getAs[String]("priority_path").split(">").length.toLong == n)
      assert(!r.getAs[java.sql.Date]("first_order")
        .after(r.getAs[java.sql.Date]("last_order")))
    }
  }

  test("neyman allocation conserves the budget and the draw honors quota and stratum size") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.neymanSample(spark, dir).collect()
    val quotas = rows.map(r => r.getAs[String]("seg") ->
      r.getAs[Long]("quota")).distinct.toMap
    // Largest-remainder conservation: the per-stratum quotas sum to
    // exactly the budget, regardless of the weights' fractional parts.
    assert(quotas.values.sum == BatchOps.NeymanBudget.toLong,
      s"quotas $quotas don't sum to ${BatchOps.NeymanBudget}")
    // The draw per stratum is contiguous ranks 1..n with
    // n = min(quota, stratum size): at sf0.001 strata are SMALLER than
    // their quotas, so this exercises the truncation side too.
    val census = spark.read.parquet(s"$dir/customer.parquet")
      .groupBy(col("c_mktsegment").as("seg"))
      .count().collect()
      .map(r => r.getAs[String]("seg") -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.getAs[String]("seg")).foreach { case (seg, rs) =>
      val expected = math.min(quotas(seg), census(seg))
      val rks = rs.map(_.getAs[Long]("rk")).sorted
      assert(rks.toSeq == (1L to expected),
        s"$seg ranks not contiguous 1..$expected")
    }
    // Determinism: a second evaluation draws the identical sample.
    val again = BatchOps.neymanSample(spark, dir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("allocation variance audit: Neyman is the minimal design") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.allocationVarianceAudit(spark, dir).collect()
    assert(rows.length == 15, "3 allocations x 5 strata")
    val totals = rows.groupBy(_.getAs[String]("allocation"))
      .view.mapValues(_.map(_.getAs[Long]("term_milli")).sum).toMap
    assert(totals.keySet == Set("equal", "proportional", "neyman"))
    // Cauchy-Schwarz: Neyman minimizes Σ (W_h σ_h)²/n_h over integer
    // budgets up to the largest-remainder rounding — each floor-milli
    // term under-reports by < 1, so allow a 5-milli slack across the
    // 5 strata.
    assert(totals("neyman") <= totals("proportional") + 5L,
      s"totals $totals")
    assert(totals("neyman") <= totals("equal") + 5L, s"totals $totals")
    // Each design's quotas conserve the budget.
    rows.groupBy(_.getAs[String]("allocation")).foreach { case (a, rs) =>
      assert(rs.map(_.getAs[Long]("quota")).sum ==
        BatchOps.NeymanBudget.toLong, s"$a quotas don't conserve")
    }
  }

  test("pruning simulation is sound: every scanned set covers the matching set") {
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.layoutPruningSim(spark, dir).collect()
    // 6 bands × 3 layouts, equal bucket budgets — the comparison is
    // box QUALITY, never box count.
    assert(rows.length == BatchOps.PruningSimBandDefs.length * 3)
    assert(rows.map(_.getAs[Long]("n_buckets")).toSet.size == 1,
      "layouts must use the same bucket count")
    rows.foreach { r =>
      // min/max pruning is conservative: a layout may over-scan but can
      // NEVER skip a bucket containing a matching row.
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matching"),
        s"unsound skip in $r")
      assert(r.getAs[Long]("n_scanned_buckets") <= r.getAs[Long]("n_buckets"))
    }
    // The advisor's point on any non-adversarial corpus: the
    // space-filling cuts never scan MORE than the single-key sort for
    // the conjunctive band (both keys bounded per bucket vs one).
    val byBand = rows.groupBy(_.getAs[Int]("band"))
    byBand.foreach { case (band, rs) =>
      val scan = rs.map(r => r.getAs[String]("layout") ->
        r.getAs[Long]("rows_scanned")).toMap
      assert(scan("zorder") <= scan("linear_pk"),
        s"band $band: zorder scanned more than linear")
      assert(scan("hilbert") <= scan("linear_pk"),
        s"band $band: hilbert scanned more than linear")
    }
  }

  test("driver-side hilbertIndex equals the SQL rotation walk on every grid cell") {
    import org.apache.spark.sql.functions.{col, expr}
    // layoutPruningSim's broadcast LUT and the hilbertStats /
    // hilbertBucketed SQL walk (which the DuckDB oracle replays as
    // CTEs) must be the SAME curve — pin them equal over the entire
    // code-bounded 256² domain, not a sample.
    val n = 1 << BatchOps.ZorderBits
    val shift = 2 * BatchOps.ZorderBits - BatchOps.ZorderBucketLog
    val cells = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("hx"),
        (col("id") % n).cast("long").as("hy"))
      .withColumn("x", col("hx")).withColumn("y", col("hy"))
    val sqlWalk = BatchOps.hilbertBucketed(cells)
      .select(col("x"), col("y"), col("h_bucket")).collect()
    assert(sqlWalk.length == n * n)
    sqlWalk.foreach { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) ==
        (BatchOps.hilbertIndex(x.toInt, y.toInt) >> shift),
        s"cell ($x,$y): SQL walk ${r.getLong(2)} != driver index")
    }
  }

  test("neyman weights survive the 2^62 scaled-sqrt branch (r15 advisory)") {
    // The testdata corpora keep var_num < 2^62 (branch 1 of the
    // BIGINT-safe reduction), so the oracle gate never exercises the
    // scaled branches where DuckDB's two-limb HUGEINT→DOUBLE cast used
    // to double-round. Engineer a corpus into branch 2 (v ≈ 2e9 over
    // 12 customers/segment ⇒ var_num ≈ 1e20) and pin the full
    // pipeline — exact moments → scaled √ → largest-remainder split —
    // against an independent BigInt/Double replication of the same
    // recipe.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = freshScratch()
    // acctbal = k · 831250.25 → v = k · 83125025 exactly (no rounding
    // ties); alternating sign spreads the variance.
    val rows = (1 to 24).map { k =>
      val seg = if (k % 2 == 0) "SEG_A" else "SEG_B"
      (k.toLong, seg,
        k.toDouble * 831250.25 * (if (k % 3 == 0) -1 else 1))
    }
    writeTable("customer",
      rows.toDF("c_custkey", "c_mktsegment", "c_acctbal"), dir)
    // Independent replication of the shipped recipe. The scale-back
    // multiplier is √(reduction): 2^16 after div 2^32, 2^32 after div
    // 2^64 (the r16 advisory caught 2^32/2^64 here — 65536× inflation).
    val p62 = BigInt("4611686018427387904")
    val p94 = BigInt("19807040628566084398385987584")
    def weightMilli(varNum: BigInt): Long = {
      val (mult, m) =
        if (varNum < p62) (1.0, varNum)
        else if (varNum < p94)
          (65536.0, varNum / BigInt("4294967296"))
        else (4294967296.0, varNum / BigInt("18446744073709551616"))
      // Same association as the shipped SQL: 1000 · (mult · √m).
      math.round(1000.0 * (mult * math.sqrt(m.toLong.toDouble)))
    }
    // Ground truth, independent of the branch device entirely:
    // 1000·√var_num at BigDecimal precision. The scaled form loses
    // < 2^-30 relative, so both the replication and the operator must
    // land within ~3e-9 relative of this.
    def weightTrue(varNum: BigInt): BigDecimal = BigDecimal(
      new java.math.BigDecimal(varNum.bigInteger)
        .sqrt(java.math.MathContext.DECIMAL64)) * 1000
    def assertNearTrue(w: Long, varNum: BigInt): Unit = {
      val t = weightTrue(varNum)
      assert((BigDecimal(w) - t).abs <= t * 3e-9 + 1,
        s"weight_milli $w vs true 1000·sqrt($varNum) = $t")
    }
    val bySeg = rows.groupBy(_._2).view.mapValues { rs =>
      val vs = rs.map(r => BigInt(math.round(r._3 * 100)))
      val n = BigInt(vs.length)
      n * vs.map(v => v * v).sum - vs.sum * vs.sum
    }.toMap
    // The corpus must actually land in branch 2, or this test silently
    // degrades to re-testing branch 1 — and the replicated weight must
    // match the TRUE √, not merely the shipped expression (the r16
    // advisory: a replication of a wrong multiplier self-validates).
    bySeg.values.foreach { vn =>
      assert(vn >= p62 && vn < p94,
        s"engineered var_num $vn missed branch 2")
      assertNearTrue(weightMilli(vn), vn)
    }
    // BigInt split arithmetic: budget × weight ≈ 5e20 overflows Long —
    // the operator rides DECIMAL(38) here for exactly this reason.
    val w = bySeg.view.mapValues(v => BigInt(weightMilli(v))).toMap
    val wTotal = w.values.sum
    val budget = BigInt(BatchOps.NeymanBudget)
    val base = w.view.mapValues(x => (budget * x / wTotal).toLong).toMap
    val frac = w.view.mapValues(x => budget * x % wTotal).toMap
    val leftover = budget.toLong - base.values.sum
    val order = w.keys.toSeq.sortBy(s => (-frac(s), s))
    val expected = order.zipWithIndex.map { case (s, i) =>
      s -> (base(s) + (if (i < leftover) 1L else 0L)) }.toMap
    val got = BatchOps.neymanSample(spark, dir).collect()
      .groupBy(_.getAs[String]("seg"))
      .map { case (s, rs) => s -> rs.head.getAs[Long]("quota") }
    expected.filter(_._2 > 0).foreach { case (s, q) =>
      assert(got.get(s).contains(q),
        s"segment $s: expected quota $q, got ${got.get(s)}")
    }
    assert(expected.values.sum == budget.toLong,
      "replication lost the budget")
  }

  test("scaled-sqrt weight is continuous across the 2^62 and 2^94 " +
      "branch thresholds (r16 advisory)") {
    // Evaluate the shipped expression directly on the four values that
    // straddle each branch boundary. Matching the BigDecimal truth
    // within the documented 3e-9 relative loss ON BOTH SIDES of each
    // threshold IS the continuity proof — the r16 advisory's 65536×
    // branch-2 discontinuity would fail this by 4-5 orders of
    // magnitude.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val vals = Seq(
      "4611686018427387903", "4611686018427387904", // 2^62 − 1, 2^62
      "19807040628566084398385987583", // 2^94 − 1
      "19807040628566084398385987584") // 2^94
    val got = vals.toDF("s")
      .select(expr("CAST(s AS DECIMAL(38,0))").as("var_num"))
      .select(col("var_num"), expr(
        BatchOps.weightMilliSql("var_num", "DECIMAL(38,0)", "div"))
        .as("w"))
      .collect()
      .map(r => BigInt(r.getDecimal(0).toBigInteger) -> r.getLong(1))
    assert(got.length == 4)
    got.foreach { case (vn, w) =>
      val t = BigDecimal(new java.math.BigDecimal(vn.bigInteger)
        .sqrt(java.math.MathContext.DECIMAL64)) * 1000
      assert((BigDecimal(w) - t).abs <= t * 3e-9 + 1,
        s"var_num $vn: weight $w vs true $t")
    }
  }

  test("mixed-branch strata: Neyman quotas track true sigma ratios " +
      "(r16 advisory)") {
    // One stratum just BELOW 2^62 (branch 1), one just ABOVE (branch
    // 2), with true N·σ within 9% of each other — the exact shape the
    // r16 advisory said the old 65536× branch-2 multiplier corrupts
    // (it would hand branch 2 the whole budget, (0, 500) instead of
    // (~240, ~260)). Expected quotas come from BigDecimal √var_num —
    // the branch device never enters the expectation.
    import spark.implicits._
    val dir = freshScratch()
    // v = j·115000025 / j·125000025 exactly (acctbal a multiple of
    // 0.25, products < 2^53): var_num = c²·(8·Σj² − (Σj)²) = c²·336.
    val rows = (1 to 8).flatMap { j =>
      Seq((j.toLong, "SEG_LO", j * 1150000.25),
        (100L + j, "SEG_MID", j * 1250000.25))
    }
    writeTable("customer",
      rows.toDF("c_custkey", "c_mktsegment", "c_acctbal"), dir)
    val vnLo = BigInt("115000025").pow(2) * 336
    val vnMid = BigInt("125000025").pow(2) * 336
    val p62 = BigInt("4611686018427387904")
    assert(vnLo < p62, s"SEG_LO $vnLo must sit in branch 1")
    assert(vnMid >= p62, s"SEG_MID $vnMid must sit in branch 2")
    def tw(vn: BigInt): BigDecimal = BigDecimal(
      new java.math.BigDecimal(vn.bigInteger)
        .sqrt(java.math.MathContext.DECIMAL64))
    val (wLo, wMid) = (tw(vnLo), tw(vnMid))
    val budget = BigDecimal(BatchOps.NeymanBudget)
    val expLo = (budget * wLo / (wLo + wMid))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = BatchOps.neymanSample(spark, dir).collect()
      .groupBy(_.getAs[String]("seg"))
      .map { case (s, rs) => s -> rs.head.getAs[Long]("quota") }
    // ±2 absorbs milli-quantization and the largest-remainder ±1.
    assert(math.abs(got("SEG_LO") - expLo) <= 2,
      s"SEG_LO quota ${got("SEG_LO")} vs true-σ share $expLo")
    assert(got.values.sum == BatchOps.NeymanBudget.toLong,
      "quotas must spend the budget exactly")
  }

  test("all-zero-weight strata degrade to an equal split that still " +
      "spends the budget (r16 advisory)") {
    // Constant acctbal per segment ⇒ var_num = 0 ⇒ every Neyman weight
    // is 0. The old greatest(1, w_total) device left base_q = 0
    // everywhere and the +1 pass summed quotas to |strata|, not the
    // budget; the equal-weight fallback must spend all 500.
    import spark.implicits._
    val rows = (1 to 12).map { k =>
      val seg = if (k % 2 == 0) "SEG_A" else "SEG_B"
      (k.toLong, seg, if (k % 2 == 0) 5.0 else 7.0)
    }
    val dir = freshScratch()
    writeTable("customer",
      rows.toDF("c_custkey", "c_mktsegment", "c_acctbal"), dir)
    val got = BatchOps.neymanSample(spark, dir).collect()
      .groupBy(_.getAs[String]("seg"))
      .map { case (s, rs) => s -> rs.head.getAs[Long]("quota") }
    assert(got == Map("SEG_A" -> 250L, "SEG_B" -> 250L),
      s"equal fallback expected (250, 250), got $got")
  }

  test("t-closeness TVD matches a plain BigInt reference on the real corpus") {
    import org.apache.spark.sql.functions.{col, floor}
    val dir = "/root/testdata/sf0.001"
    // Independent reference: group the raw rows in driver memory and
    // fold the DENSE definition ½·Σ_s |N·c_gs − n_g·C_s| (every
    // segment, absent ones included) — the operator's sparse-present +
    // closed-form-complement decomposition must agree exactly.
    val raw = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("band"),
        col("c_mktsegment"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val n = BigInt(raw.length)
    val segTotals = raw.groupBy(_._3).view.mapValues(v => BigInt(v.length))
    val expected = raw.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val ng = BigInt(rows.length)
      val numer = segTotals.map { case (seg, cs) =>
        val cgs = BigInt(rows.count(_._3 == seg))
        (n * cgs - ng * cs).abs
      }.sum
      k -> (BigInt(1000000) * numer / (2 * ng * n)).toLong
    }
    val got = BatchOps.tClosenessAudit(spark, dir).collect()
      .map(r => (r.getAs[Number]("c_nationkey").longValue(),
        r.getAs[Int]("acctbal_band")) -> r.getAs[Long]("tvd_micro"))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"class $k: got ${got(k)}, expected $v")
      assert(got(k) >= 0L && got(k) <= 1000000L)
    }
  }

  test("RLE advisor obeys the run-count laws on the real corpus") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val dir = "/root/testdata/sf0.001"
    val rows = BatchOps.rleSortAdvisor(spark, dir).collect()
    assert(rows.length ==
      BatchOps.RleSortOrders.length * BatchOps.RleColumns.length)
    val nDistinct = BatchOps.RleColumns.map { case (n, sql) =>
      n -> spark.read.parquet(s"$dir/lineitem.parquet")
        .select(org.apache.spark.sql.functions.expr(sql).as(n))
        .agg(countDistinct(col(n))).head().getLong(0)
    }.toMap
    rows.foreach { r =>
      val (c, runs, n) = (r.getAs[String]("column_name"),
        r.getAs[Long]("n_runs"), r.getAs[Long]("n_rows"))
      // Runs are bounded below by the distinct count (each value needs
      // at least one run) and above by the row count.
      assert(runs >= nDistinct(c), s"$r violates runs >= distinct")
      assert(runs <= n, s"$r violates runs <= rows")
    }
    // The advisor's point: a sort CLUSTERED on a column collapses it to
    // exactly its distinct count — the RLE floor.
    val clustered = rows.filter(r =>
      r.getAs[String]("sort_order") == "by_flag_status_date")
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_runs"))
      .toMap
    assert(clustered("returnflag") == nDistinct("returnflag"))
    val dateOrder = rows.filter(r =>
      r.getAs[String]("sort_order") == "by_shipdate")
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_runs"))
      .toMap
    assert(dateOrder("returnflag") > clustered("returnflag"),
      "date order should not cluster returnflag")
    // The byte estimate is internally consistent with the run counts
    // and prices the decision: under the clustered order returnflag's
    // RLE size collapses to ~|domain| words (bytes_ratio ≪ 1000 and
    // far below the date order's near-random ratio), while under the
    // date order a 1-byte column RLE-encodes ABOVE plain size — the
    // "don't bother" read-out.
    val byKey = rows.map(r => (r.getAs[String]("sort_order"),
      r.getAs[String]("column_name")) -> r).toMap
    rows.foreach { r =>
      val w = BatchOps.RleColWidthBytes(r.getAs[String]("column_name"))
      assert(r.getAs[Long]("rle_bytes") ==
        r.getAs[Long]("n_runs") * (w + BatchOps.RleRunLenBytes))
      assert(r.getAs[Long]("plain_bytes") ==
        w * r.getAs[Long]("n_rows"))
    }
    val clusteredRatio = byKey(("by_flag_status_date", "returnflag"))
      .getAs[Long]("bytes_ratio_mille")
    val dateRatio = byKey(("by_shipdate", "returnflag"))
      .getAs[Long]("bytes_ratio_mille")
    assert(clusteredRatio * 10 < dateRatio,
      s"clustered returnflag should compress ≫ date order " +
        s"($clusteredRatio vs $dateRatio)")
    assert(clusteredRatio < 1000L, "clustered RLE must beat plain")
  }
}
