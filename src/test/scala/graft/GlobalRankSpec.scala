package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** [[GlobalRank]] must be BIT-IDENTICAL to the unpartitioned window
  * functions it replaces — row_number / ntile / running sum over a total
  * order — while never funneling the frame through one task. Equivalence
  * is checked against Spark's own single-partition windows on data whose
  * keys straddle range-partition boundaries (duplicated low-cardinality
  * prefixes + a unique tie-break, the engine's standing total-order
  * rule), at an awkward row count (neither divisible by the partition
  * count nor by the ntile k). */
class GlobalRankSpec extends GraftSpec {

  import spark.implicits._

  /** AQE coalesces every small range shuffle down to ONE partition at
    * test sizes — which silently skips the cross-partition offset
    * arithmetic these tests exist to cover (a max-vs-last-prefix bug
    * once passed green exactly this way). Every equivalence test runs
    * with partition coalescing OFF and asserts the frame actually
    * spans multiple partitions. */
  private def withCoalesceOff[A](f: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Proof the offset path is genuinely exercised: the ranked output
    * (whose layout is the checkpointed range partitioning) must span
    * more than one partition. */
  private def assertMultiPartition(out: org.apache.spark.sql.DataFrame): Unit =
    assert(out.select(spark_partition_id()).distinct().count() > 1,
      "offset path not exercised: frame landed in a single partition")

  // 403 rows, keys deliberately collidy: 13 distinct k1 values so every
  // range partition holds boundary-straddling duplicate prefixes.
  private lazy val df = spark.range(403)
    .select((col("id") % 13).as("k1"), col("id").as("tie"),
      ((col("id") * 7) % 11 + 1).cast("long").as("v"))
    .repartition(7) // start from an arbitrary layout
    .localCheckpoint()

  private val sortCols = Seq(col("k1"), col("tie"))

  test("withRowNumber equals row_number over the naive global window") {
    withCoalesceOff {
      val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(col("k1"), col("tie"))).cast("long"))
      val fast = GlobalRank.withRowNumber(df, "rn", sortCols)
      assertMultiPartition(fast)
      assert(fast.orderBy("rn").collect().toSeq ==
        naive.orderBy("rn").collect().toSeq)
    }
  }

  test("withNtile equals ntile(k) for k that divides unevenly") {
    withCoalesceOff {
      for (k <- Seq(2, 10, 13, 403, 500)) {
        val naive = df.withColumn("b",
          ntile(k).over(Window.orderBy(col("k1"), col("tie"))))
        val fast = GlobalRank.withNtile(df, "b", k, sortCols)
        assertMultiPartition(fast)
        assert(fast.orderBy("tie").collect().toSeq ==
          naive.orderBy("tie").collect().toSeq, s"k=$k")
      }
    }
  }

  test("withRunningSum equals sum over rows-unbounded-preceding") {
    withCoalesceOff {
      val naive = df.withColumn("cs",
        sum(col("v")).over(Window.orderBy(col("k1"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val fast = GlobalRank.withRunningSum(df, "v", "cs", sortCols)
      assertMultiPartition(fast)
      assert(fast.orderBy("tie").collect().toSeq ==
        naive.orderBy("tie").collect().toSeq)
    }
  }

  test("withRunningSum is exact on NEGATIVE values across partition boundaries") {
    // The regression that motivated the multi-partition discipline: a
    // local prefix sum over negative values is non-monotone, so a
    // max-based per-partition total silently corrupts every partition
    // after the first. CDC-shaped +1/−1 deltas, coalescing off.
    withCoalesceOff {
      val d = spark.range(400)
        .select(col("id").as("tie"),
          when(col("id") % 3 === 0, -7L)
            .otherwise((col("id") % 5) - 1).as("v"))
        .repartition(7).localCheckpoint()
      val naive = d.withColumn("cs",
        sum(col("v")).over(Window.orderBy(col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val fast = GlobalRank.withRunningSum(d, "v", "cs", Seq(col("tie")))
      assertMultiPartition(fast)
      assert(fast.orderBy("tie").collect().toSeq ==
        naive.orderBy("tie").collect().toSeq)
    }
  }

  test("running sum treats null values as zero") {
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)))
      .toDF("tie", "v")
    val out = GlobalRank.withRunningSum(d, "v", "cs", Seq(col("tie")))
      .orderBy("tie").select("cs").as[Long].collect().toSeq
    assert(out == Seq(5L, 5L, 7L))
  }

  test("withGroupedRowNumber equals the keyed row_number window") {
    // Groups deliberately skewed (k1 = 0 holds ~40% of rows — the
    // degenerate regime the grouped form exists for) and interleaved
    // across range-partition boundaries.
    withCoalesceOff {
      val d = spark.range(500)
        .select((col("id") % 25).as("tie2"),
          when(col("id") % 5 < 2, 0L).otherwise(col("id") % 7).as("g"),
          col("id").as("tie"))
        .repartition(7).localCheckpoint()
      val naive = d.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("tie2"), col("tie"))).cast("long"))
      val fast = GlobalRank.withGroupedRowNumber(d, "rn",
        Seq(col("g")), Seq(col("tie2"), col("tie")))
      assertMultiPartition(fast)
      // The helper reorders columns — compare on an explicit column
      // order (callers select by name, never position).
      val cols = Seq("tie2", "g", "tie", "rn").map(col)
      assert(fast.select(cols: _*).orderBy("tie").collect().toSeq ==
        naive.select(cols: _*).orderBy("tie").collect().toSeq)
    }
  }

  test("withGroupedRowNumber keeps NULL group keys as their own partition") {
    // A plain using-join would DROP null-keyed rows; the keyed window
    // treats NULL as one more partition. The null-safe join must match.
    withCoalesceOff {
      val d = spark.range(300)
        .select(
          when(col("id") % 4 === 0, lit(null).cast("long"))
            .otherwise(col("id") % 3).as("g"),
          col("id").as("tie"))
        .repartition(5).localCheckpoint()
      val naive = d.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("tie"))).cast("long"))
      val fast = GlobalRank.withGroupedRowNumber(d, "rn",
        Seq(col("g")), Seq(col("tie")))
      assert(fast.count() == 300L, "null-keyed rows must not be dropped")
      val cols = Seq("g", "tie", "rn").map(col)
      assert(fast.select(cols: _*).orderBy("tie").collect().toSeq ==
        naive.select(cols: _*).orderBy("tie").collect().toSeq)
    }
  }

  test("withGroupedRunningSum equals the keyed rows-frame cumsum, negatives and nulls included") {
    withCoalesceOff {
      val d = spark.range(460)
        .select(
          when(col("id") % 6 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("g"), col("id") % 4)).as("g"),
          col("id").as("tie"),
          when(col("id") % 9 === 0, lit(null).cast("long"))
            .otherwise((col("id") % 11) - 5).as("v"))
        .repartition(7).localCheckpoint()
      val naive = d.withColumn("cs",
        coalesce(sum(col("v")).over(
          Window.partitionBy("g").orderBy(col("tie"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)))
      val fast = GlobalRank.withGroupedRunningSum(d, "v", "cs",
        Seq(col("g")), Seq(col("tie")))
      assertMultiPartition(fast)
      assert(fast.count() == 460L)
      val cols = Seq("g", "tie", "v", "cs").map(col)
      assert(fast.select(cols: _*).orderBy("tie").collect().toSeq ==
        naive.select(cols: _*).orderBy("tie").collect().toSeq)
    }
  }

  test("withGroupedNtile equals the keyed ntile window, including groups smaller than k") {
    withCoalesceOff {
      // Group sizes deliberately straddle k: g=0 huge (skew), g=6 has
      // ~1 row (n < k — every formula branch with q = 0), nulls their
      // own partition.
      val d = spark.range(450)
        .select(
          when(col("id") % 11 === 0, lit(null).cast("long"))
            .otherwise(when(col("id") % 3 === 0, 0L)
              .otherwise(col("id") % 7)).as("g"),
          col("id").as("tie"))
        .repartition(6).localCheckpoint()
      for (k <- Seq(2, 4, 10, 500)) {
        val naive = d.withColumn("b", ntile(k).over(
          Window.partitionBy("g").orderBy(col("tie"))))
        val fast = GlobalRank.withGroupedNtile(d, "b", k,
          Seq(col("g")), Seq(col("tie")))
        assertMultiPartition(fast)
        val cols = Seq("g", "tie", "b").map(col)
        assert(fast.select(cols: _*).orderBy("tie").collect().toSeq ==
          naive.select(cols: _*).orderBy("tie").collect().toSeq, s"k=$k")
      }
    }
  }

  test("withGroupedRowNumberAndRunningSum: both statistics from one pass") {
    withCoalesceOff {
      val d = spark.range(380)
        .select((col("id") % 5).as("g"), col("id").as("tie"),
          ((col("id") * 3) % 13 - 6).as("v"))
        .repartition(6).localCheckpoint()
      val w = Window.partitionBy("g").orderBy(col("tie"))
      val naive = d
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cs", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val fast = GlobalRank.withGroupedRowNumberAndRunningSum(
        d, "rn", "v", "cs", Seq(col("g")), Seq(col("tie")))
      assertMultiPartition(fast)
      val cols = Seq("g", "tie", "v", "rn", "cs").map(col)
      assert(fast.select(cols: _*).orderBy("tie").collect().toSeq ==
        naive.select(cols: _*).orderBy("tie").collect().toSeq)
    }
  }

  test("property: two-phase rank/ntile/cumsum equal the naive windows on random frames") {
    withCoalesceOff {
    // ScalaCheck-generated frames: random sizes (incl. tiny), HEAVY key
    // collisions (domain 0-6 so every range partition straddles tie
    // runs), random values incl. negatives, and random ntile k both
    // below and above the row count. Seeded — failures reproduce.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def gen[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val rowGen = for {
      k1 <- Gen.choose(0L, 6L)
      v <- Gen.choose(-50L, 50L)
    } yield (k1, v)
    for (i <- 0 until 8) {
      val rows = gen(Gen.chooseNum(1, 120)
        .flatMap(n => Gen.listOfN(n, rowGen)), 20260815L + i)
        .zipWithIndex.map { case ((k1, v), tie) => (k1, v, tie.toLong) }
      val k = gen(Gen.chooseNum(1, 15), 40L + i)
      val d = rows.toDF("k1", "v", "tie").repartition(5).localCheckpoint()
      val sort = Seq(col("k1"), col("tie"))
      val w = Window.orderBy(col("k1"), col("tie"))
      val naive = d
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("b", ntile(k).over(w))
        .withColumn("cs", sum(col("v")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select("tie", "rn", "b", "cs").orderBy("tie").collect().toSeq
      val fast = {
        val r1 = GlobalRank.withRowNumber(d, "rn", sort)
        val r2 = GlobalRank.withNtile(r1, "b", k, sort)
        GlobalRank.withRunningSum(r2, "v", "cs", sort)
          .select("tie", "rn", "b", "cs").orderBy("tie").collect().toSeq
      }
      assert(fast == naive, s"iteration $i (k=$k, n=${rows.length})")
    }
    }
  }

  test("property: grouped rank/ntile/cumsum equal the keyed windows on random frames") {
    // The grouped-variant mirror of the global property test: random
    // sizes, group keys with heavy collisions AND nulls, values with
    // negatives, ntile k straddling group sizes. Seeded — reproduces.
    withCoalesceOff {
      import org.scalacheck.Gen
      import org.scalacheck.rng.Seed
      def gen[A](g: Gen[A], seed: Long): A =
        g.apply(Gen.Parameters.default, Seed(seed)).get
      val rowGen = for {
        g <- Gen.option(Gen.choose(0L, 3L))
        v <- Gen.choose(-40L, 40L)
      } yield (g, v)
      for (i <- 0 until 6) {
        val rows = gen(Gen.chooseNum(1, 140)
          .flatMap(n => Gen.listOfN(n, rowGen)), 20260815100L + i)
          .zipWithIndex.map { case ((g, v), tie) => (g, v, tie.toLong) }
        val k = gen(Gen.chooseNum(1, 12), 77L + i)
        val d = rows.toDF("g", "v", "tie").repartition(5).localCheckpoint()
        val w = Window.partitionBy("g").orderBy(col("tie"))
        val naive = d
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("b", ntile(k).over(w))
          .withColumn("cs", sum(col("v")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("g", "tie", "rn", "b", "cs").orderBy("tie")
          .collect().toSeq
        val fast = {
          val r1 = GlobalRank.withGroupedRowNumber(d, "rn",
            Seq(col("g")), Seq(col("tie")))
          val r2 = GlobalRank.withGroupedNtile(r1, "b", k,
            Seq(col("g")), Seq(col("tie")))
          GlobalRank.withGroupedRunningSum(r2, "v", "cs",
              Seq(col("g")), Seq(col("tie")))
            .select("g", "tie", "rn", "b", "cs").orderBy("tie")
            .collect().toSeq
        }
        assert(fast == naive, s"iteration $i (k=$k, n=${rows.length})")
      }
    }
  }

  test("empty and single-row frames") {
    val empty = df.filter(col("tie") < 0)
    assert(GlobalRank.withRowNumber(empty, "rn", sortCols).count() == 0L)
    val one = df.filter(col("tie") === 0)
    val r = GlobalRank.withNtile(one, "b", 10, sortCols).collect()
    assert(r.length == 1 &&
      r(0).getInt(r(0).fieldIndex("b")) == 1)
  }
}
