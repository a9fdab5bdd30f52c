package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Exact GLOBAL order statistics (row_number / ntile / running sum over
  * a total order) WITHOUT a single-partition exchange.
  *
  * Spark compiles `Window.orderBy(...)` with an empty partition spec to
  * `Exchange SinglePartition` — every row of the frame flows through ONE
  * task, which sorts and scans the whole input ("No Partition Defined
  * for Window operation" warning). Fine for a bounded side frame; fatal
  * at fact/corpus grain on 100 TB. This helper is the scale-safe exact
  * replacement, the classic two-phase rank:
  *
  *  1. `repartitionByRange` on the sort key — ONE range exchange, the
  *     same shuffle any global ORDER BY performs; every partition holds
  *     a contiguous, disjoint key range and partitions are ordered by
  *     index.
  *  2. `sortWithinPartitions` + one narrow `mapPartitions` pass assigns
  *     each row its partition id and LOCAL 1-based row number (and,
  *     when asked, the local prefix sum of a value column). No second
  *     shuffle — the pass runs where the range exchange left the data.
  *  3. Per-partition row/value totals (≤ numShufflePartitions rows — a
  *     CLUSTER-CONFIG bound, not a data bound, the same contract as
  *     `RDD.zipWithIndex`) are collected, prefix-summed on the driver,
  *     and rejoined as a broadcast: `global = local + offset(pid)`.
  *
  * The result is EXACT — identical to the unpartitioned window, row for
  * row, so oracle SQL written against the naive form stays green — and
  * the plan contains no `Exchange SinglePartition` at all (step 3's
  * prefix sum runs on ≤ P numbers driver-side, not as a window).
  *
  * Determinism note: the frame is `localCheckpoint`ed after step 2.
  * `RangePartitioner` samples its input to pick boundaries, so two
  * separate materializations of the same logical plan could legally pick
  * DIFFERENT boundaries; the per-partition counts must describe the SAME
  * physical partitioning the ranked rows carry. Checkpointing pins one
  * materialization for both consumers (counts + output), exactly the
  * multi-consumer rule the engine applies elsewhere (dsir docFeats,
  * epoch ranks).
  *
  * THE CHECKPOINT'S STORAGE BILL, honestly: `localCheckpoint`
  * materializes the ENTIRE ranked frame to executor block storage
  * (memory, spilling to local disk) — at 100 TB input that is a
  * deliberate one-pass write of ~the projected frame size, paid once,
  * bounded by the input size, and reclaimed when the RDD is GC'd. It
  * buys (a) boundary determinism for the two consumers and (b) single
  * computation of the upstream plan (the offsets aggregate + the output
  * join would otherwise each recompute it). The recompute-tolerant
  * alternative — skip the checkpoint when the input is itself a
  * DETERMINISTIC scan (pure parquet read, no shuffle-order dependence,
  * no sampling upstream) and let the two consumers recompute — trades
  * that I/O for a second full scan+sort and is only sound because
  * `repartitionByRange` re-samples identically over identical input
  * splits; the engine keeps the checkpoint as the default because the
  * determinism argument then needs NO assumptions about the caller's
  * upstream plan.
  *
  * Requirements: `sortCols` must be a TOTAL order (tie-broken — the
  * engine's standing rule) for the assigned numbers to be well-defined;
  * the running-sum value column must be integral (LongType) per the
  * integer-exactness contract.
  */
object GlobalRank {

  private val PidCol = "__gr_pid"
  private val LrnCol = "__gr_lrn"
  private val LcsCol = "__gr_lcs"

  /** Range-partition `df` by `sortCols`, then attach per-row partition
    * id, local row number, and (if `valueIdx` >= 0) local prefix sum of
    * the long column at `valueIdx`. Checkpointed — see class doc. */
  private def attach(df: DataFrame, sortCols: Seq[Column],
      valueCol: Option[String]): DataFrame = {
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val valueIdx = valueCol.map { c =>
      val i = schema.fieldIndex(c)
      require(schema(i).dataType == LongType,
        s"running-sum column $c must be LongType (integer-exact contract)")
      i
    }.getOrElse(-1)
    val outSchema = schema
      .add(PidCol, IntegerType, nullable = false)
      .add(LrnCol, LongType, nullable = false)
      .add(LcsCol, LongType, nullable = false)
    val enc = Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var rn = 0L
      var cs = 0L
      it.map { r =>
        rn += 1
        if (valueIdx >= 0 && !r.isNullAt(valueIdx)) cs += r.getLong(valueIdx)
        Row.fromSeq(r.toSeq :+ pid :+ rn :+ cs)
      }
    }(enc).localCheckpoint()
  }

  /** Per-partition (rowOffset, sumOffset, totalRows) from the attached
    * frame — a ≤ numShufflePartitions-row aggregate, prefix-summed on
    * the driver (bounded by cluster config, not data).
    *
    * The partition's value total is the LAST row's local prefix sum
    * (`max_by(cs, rn)`), NOT `max(cs)`: a local prefix sum over
    * negative values (CDC +1/−1 deltas) is non-monotone, so its max is
    * a running-prefix high-water mark, not the partition total. The
    * row count IS safe as `max(rn)` — local row numbers are always
    * monotone. */
  private def offsets(attached: DataFrame): (DataFrame, Long) = {
    val perPart = attached.groupBy(col(PidCol))
      .agg(max(col(LrnCol)).as("cnt"),
        max_by(col(LcsCol), col(LrnCol)).as("sum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var rows = 0L
    var sums = 0L
    val rowsOut = perPart.map { case (pid, cnt, sm) =>
      val r = Row(pid, rows, sums)
      rows += cnt
      sums += sm
      r
    }
    val spark = attached.sparkSession
    val offSchema = new org.apache.spark.sql.types.StructType()
      .add(PidCol, IntegerType, nullable = false)
      .add("__gr_rn_off", LongType, nullable = false)
      .add("__gr_cs_off", LongType, nullable = false)
    (spark.createDataFrame(
      spark.sparkContext.parallelize(rowsOut.toSeq, 1), offSchema), rows)
  }

  /** Adds exact global 1-based `row_number() OVER (ORDER BY sortCols)`
    * as `rnCol` — two-phase, no single-partition exchange. Row order of
    * the returned frame is not defined (sort downstream if presenting).
    */
  def withRowNumber(df: DataFrame, rnCol: String,
      sortCols: Seq[Column]): DataFrame = {
    val attached = attach(df, sortCols, None)
    val (off, _) = offsets(attached)
    attached.join(broadcast(off), Seq(PidCol))
      .withColumn(rnCol, col(LrnCol) + col("__gr_rn_off"))
      .drop(PidCol, LrnCol, LcsCol, "__gr_rn_off", "__gr_cs_off")
  }

  /** Adds exact `ntile(k) OVER (ORDER BY sortCols)` as `ntileCol`
    * (SQL NTILE semantics: n rows into k buckets of n div k, the first
    * n mod k buckets one larger), derived arithmetically from the
    * two-phase global row number and the exact total count. */
  def withNtile(df: DataFrame, ntileCol: String, k: Int,
      sortCols: Seq[Column]): DataFrame = {
    val attached = attach(df, sortCols, None)
    val (off, total) = offsets(attached)
    val q = total / k
    val r = total % k
    // rn ≤ r(q+1): one of the r larger buckets; else a smaller one.
    // q == 0 ⇒ r = total ⇒ the first branch always holds (bucket = rn),
    // so the q-divisor branch never divides by zero (guarded anyway).
    val cut = r * (q + 1)
    attached.join(broadcast(off), Seq(PidCol))
      .withColumn("__gr_rn", col(LrnCol) + col("__gr_rn_off"))
      .withColumn(ntileCol, expr(
        s"CAST(CASE WHEN __gr_rn <= ${cut}L THEN (__gr_rn - 1) div ${q + 1}L + 1 " +
        s"ELSE ${r}L + (__gr_rn - ${cut}L - 1) div ${math.max(q, 1L)}L + 1 END AS INT)"))
      .drop(PidCol, LrnCol, LcsCol, "__gr_rn_off", "__gr_cs_off", "__gr_rn")
  }

  /** Adds the exact running sum `sum(valueCol) OVER (ORDER BY sortCols
    * ROWS UNBOUNDED PRECEDING)` as `outCol`. `valueCol` must be
    * LongType; nulls count as 0. */
  def withRunningSum(df: DataFrame, valueCol: String, outCol: String,
      sortCols: Seq[Column]): DataFrame = {
    val attached = attach(df, sortCols, Some(valueCol))
    val (off, _) = offsets(attached)
    attached.join(broadcast(off), Seq(PidCol))
      .withColumn(outCol, col(LcsCol) + col("__gr_cs_off"))
      .drop(PidCol, LrnCol, LcsCol, "__gr_rn_off", "__gr_cs_off")
  }

  /** Exact `row_number() OVER (PARTITION BY groupCols ORDER BY
    * sortCols)` WITHOUT a per-group task: one two-phase pass over the
    * COMPOUND total order (groupCols ++ sortCols) — groups are
    * contiguous in that order — then per-group rank = global rank −
    * the group's first rank + 1, via a broadcast join of the group
    * minima. The classic keyed window is fine when group cardinality
    * tracks the cluster; THIS form is for the degenerate regime where
    * one group holds a data-scaled fraction of the frame (epoch
    * partitions, clip-boundary length spikes) — the salted-two-pass
    * remedy, except exact and salt-free. REQUIRES the group-minima
    * frame (one row per group) to be broadcast-small: group
    * cardinality must be bounded by an enum / value domain / config,
    * not by the data. `sortCols` must tie-break within groups. */
  def withGroupedRowNumber(df: DataFrame, rnCol: String,
      groupCols: Seq[Column], sortCols: Seq[Column]): DataFrame = {
    val tmp = "__gr_grn"
    val ranked = withRowNumber(df, tmp, groupCols ++ sortCols)
    val groupNames = groupCols.map(c => df.select(c).columns.head)
    val starts = ranked.groupBy(groupCols: _*)
      .agg(min(col(tmp)).as("__gr_g0"))
    joinGroupBase(ranked, starts, groupNames)
      .withColumn(rnCol, col(tmp) - col("__gr_g0") + 1L)
      .drop(tmp, "__gr_g0")
  }

  /** Broadcast-joins the per-group base frame back onto the ranked rows
    * with NULL-SAFE equality (`<=>`) on every group column — a plain
    * using-join would silently DROP rows whose group key is NULL,
    * whereas the keyed window these helpers replace treats NULL as its
    * own partition. The base keys ride in under renamed columns so the
    * join condition is unambiguous, then drop.
    *
    * The broadcast-small contract (group cardinality bounded by an
    * enum / value domain / config, NEVER a data-grain id) is ENFORCED
    * structurally: WindowGateSpec scans every `GlobalRank.withGrouped*`
    * call site in the main tree against an allowlist annotated with
    * each key's cardinality bound — an unannotated call site fails the
    * build, so a data-grain key can't reach this broadcast silently. */
  private def joinGroupBase(ranked: DataFrame, base: DataFrame,
      groupNames: Seq[String]): DataFrame = {
    val renamed = groupNames.foldLeft(base) { (b, n) =>
      b.withColumnRenamed(n, s"__gr_k_$n")
    }
    val cond = groupNames.map(n => ranked(n) <=> renamed(s"__gr_k_$n"))
      .reduce(_ && _)
    ranked.join(broadcast(renamed), cond)
      .drop(groupNames.map(n => s"__gr_k_$n"): _*)
  }

  /** Exact `sum(valueCol) OVER (PARTITION BY groupCols ORDER BY
    * sortCols ROWS UNBOUNDED PRECEDING)` WITHOUT a per-group task —
    * [[withGroupedRowNumber]]'s running-sum sibling, for the degenerate
    * regime where the partition key is a tiny enum (returnflag,
    * priority, event_type) over a data-scaled frame: the keyed window
    * would serialize the fact through |enum| tasks. One two-phase pass
    * over the COMPOUND order (groupCols ++ sortCols) carries the global
    * prefix sum; each group's running sum is the global one minus the
    * prefix JUST BEFORE the group starts, i.e. the group's first row's
    * global cumsum less that row's own value — a one-row-per-group
    * `min_by` base, broadcast back. Same broadcast-small group
    * cardinality contract as [[withGroupedRowNumber]]; `valueCol` must
    * be LongType, nulls count as 0, negatives are handled (the base is
    * picked BY RANK, never by max). */
  def withGroupedRunningSum(df: DataFrame, valueCol: String,
      outCol: String, groupCols: Seq[Column],
      sortCols: Seq[Column]): DataFrame =
    withGroupedRowNumberAndRunningSum(df, "__gr_grn_drop", valueCol,
      outCol, groupCols, sortCols).drop("__gr_grn_drop")

  /** Exact `ntile(k) OVER (PARTITION BY groupCols ORDER BY sortCols)`
    * WITHOUT a per-group task — [[withNtile]]'s grouped sibling for
    * the enum-keyed degenerate regime: the per-group row number comes
    * from one compound-order two-phase pass, per-group sizes from a
    * broadcast-small aggregate, and the bucket is the same closed SQL
    * NTILE formula (n div k buckets of size q, the first n mod k one
    * larger) evaluated per row with the GROUP's n. Same contracts as
    * [[withGroupedRowNumber]]. */
  def withGroupedNtile(df: DataFrame, ntileCol: String, k: Int,
      groupCols: Seq[Column], sortCols: Seq[Column]): DataFrame = {
    val tmp = "__gr_gnt_rn"
    val ranked = withGroupedRowNumber(df, tmp, groupCols, sortCols)
    val groupNames = groupCols.map(c => df.select(c).columns.head)
    val sizes = ranked.groupBy(groupNames.map(col): _*)
      .agg(count(lit(1)).as("__gr_gn"))
    joinGroupBase(ranked, sizes, groupNames)
      .withColumn(ntileCol, expr(
        s"CAST(CASE WHEN $tmp <= (__gr_gn % $k) * (__gr_gn div $k + 1) " +
        s"THEN ($tmp - 1) div (__gr_gn div $k + 1) + 1 " +
        s"ELSE (__gr_gn % $k) + ($tmp - (__gr_gn % $k) * " +
        s"(__gr_gn div $k + 1) - 1) div greatest(__gr_gn div $k, 1L) + 1 " +
        s"END AS INT)"))
      .drop(tmp, "__gr_gn")
  }

  /** Both grouped order statistics from ONE two-phase pass: per-group
    * 1-based row number as `rnCol` AND the per-group running sum of
    * `valueCol` as `csCol` — see [[withGroupedRowNumber]] /
    * [[withGroupedRunningSum]] for the contracts (broadcast-small group
    * cardinality, LongType value, total compound order). */
  def withGroupedRowNumberAndRunningSum(df: DataFrame, rnCol: String,
      valueCol: String, csCol: String, groupCols: Seq[Column],
      sortCols: Seq[Column]): DataFrame = {
    val tmpRn = "__gr_grn"
    val tmpCs = "__gr_gcs"
    val ranked = withRowNumberAndRunningSum(df, tmpRn, valueCol, tmpCs,
      groupCols ++ sortCols)
    val groupNames = groupCols.map(c => df.select(c).columns.head)
    // Group base = global cumsum just BEFORE the group's first row =
    // first row's cumsum − first row's value (null value contributed 0).
    val starts = ranked.groupBy(groupCols: _*)
      .agg(min(col(tmpRn)).as("__gr_g0"),
        min_by(col(tmpCs) - coalesce(col(valueCol), lit(0L)),
          col(tmpRn)).as("__gr_gcs0"))
    joinGroupBase(ranked, starts, groupNames)
      .withColumn(rnCol, col(tmpRn) - col("__gr_g0") + 1L)
      .withColumn(csCol, col(tmpCs) - col("__gr_gcs0"))
      .drop(tmpRn, tmpCs, "__gr_g0", "__gr_gcs0")
  }

  /** Both order statistics from ONE two-phase pass: the global row
    * number as `rnCol` AND the running sum of `valueCol` as `csCol` —
    * the rank/cumulative decomposition several rank-semantics operators
    * need together (rank = cumsum − count + 1 at a coarser grain). */
  def withRowNumberAndRunningSum(df: DataFrame, rnCol: String,
      valueCol: String, csCol: String, sortCols: Seq[Column]): DataFrame = {
    val attached = attach(df, sortCols, Some(valueCol))
    val (off, _) = offsets(attached)
    attached.join(broadcast(off), Seq(PidCol))
      .withColumn(rnCol, col(LrnCol) + col("__gr_rn_off"))
      .withColumn(csCol, col(LcsCol) + col("__gr_cs_off"))
      .drop(PidCol, LrnCol, LcsCol, "__gr_rn_off", "__gr_cs_off")
  }
}
