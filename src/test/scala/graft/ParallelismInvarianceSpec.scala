package graft

import graft.operators.{BatchOps, CdcOps, TextOps}

/** Determinism under parallelism — the distributed-correctness property
  * behind every "order-independent / exact at any partition count"
  * claim in the operator scaladocs: the SAME query must produce the
  * SAME rows whether its exchanges run over 1 partition or 17. A
  * violation means some step depends on aggregation order (a raw
  * double sum), on partition boundaries (a window missing a total
  * order), or on a nondeterministic pick (an un-tie-broken first/last)
  * — bugs that stay invisible at a fixed test parallelism and surface
  * only on the cluster. 17 is deliberately prime and larger than the
  * suite's 4 cores, so partition assignment differs from both the
  * default run and the single-partition run. */
class ParallelismInvarianceSpec extends GraftSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Representative exemplars, one per determinism device: exact
    * DECIMAL money (rollup), integer largest-remainder windows (penny
    * allocation), salted join + shard-decomposed distinct, md5-model
    * integer scores (DSIR), unrolled bit arithmetic (hilbert), window
    * order statistics (decile bands), and the two-phase global rank
    * (quantity_deciles — GlobalRank's per-partition offsets must adapt
    * to ANY partition count: range boundaries move, assigned ntile
    * buckets must not). */
  private val exemplars = Seq(
    "customer_rollup", "penny_allocation_audit", "salted_join_rollup",
    "dsir_weights", "hilbert_stats", "decile_rank_audit",
    "quantity_deciles",
    // r14 grouped two-phase rank consumers: the grouped offsets/base
    // arithmetic must adapt to ANY partition count (range boundaries
    // move, per-group ranks and running sums must not), including the
    // integer percentile interpolation and the union-then-rank shape.
    "interp_percentiles_exact", "weighted_median_price",
    "funnel_step_latency",
    // r15: the grouped combined rank+cumsum pass JOINED BACK to a
    // broadcast position spine (Lorenz decile points) and the
    // DECIMAL(38) Gini numerators — the spine-join consumer shape the
    // exemplars above don't exercise (a rank that shifted with the
    // partition count would land on a different spine row).
    "segment_lorenz", "segment_gini",
    // r15: grouped rank at POSEXPLODE grain (64 dim groups over
    // corpus × dim rows) feeding integer bracket interpolation, plus
    // the broadcast fence-table re-scan — the widest group count in
    // the grouped-helper family.
    "embedding_dim_quantiles", "embedding_robust_outliers",
    // r15: per-partition transition folds whose partition-BOUNDARY
    // stitching must produce identical run counts at ANY partition
    // count (the whole correctness burden of the narrow-fold form),
    // and the Neyman draw whose salted-hash ranks must not move.
    "rle_sort_advisor", "neyman_sample",
    // r16: a global top-K whose salted tie-break must pick the same
    // docs at any partition count, and a (shingle)-grain df histogram
    // whose log2 buckets must not shift with the shuffle layout.
    "dsir_resample", "shingle_df_profile",
    // r16: the S-curve fold over the memoized pair set (fixed-point
    // powers must not depend on partitioning) and the md5-group
    // survivor attribution (min-doc_id rule at any shuffle layout).
    "lsh_band_planner", "dedup_inflation_by_source",
    "source_cross_dup_matrix", "winnow_fingerprints",
    "dedup_threshold_sweep", "sq8_quantization_audit",
    // r17: the bottom-k sketches (global TakeOrdered tie-break and the
    // per-lang WindowGroupLimit cap must pick the same registers at
    // any partition count), the winnow posting join (df cut + pair
    // aggregate at any shuffle layout), and the checkpointed pagerank
    // iteration chain (per-round materializations must not observe
    // the layout).
    "quantile_sketch", "quantile_sketch_grouped",
    "winnow_pairs", "dup_graph_pagerank")

  private def fingerprint(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    // Row-order-free fingerprint: render every row, sort the rendering.
    df.collect().map(_.toString).sorted.toSeq
  }

  test("results are identical at shuffle.partitions = 1, 4 and 17") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("1", "4", "17").map { p =>
        spark.conf.set(key, p)
        p -> exemplars.map(n => n -> fingerprint(n)).toMap
      }
      val (_, base) = runs.head
      runs.tail.foreach { case (p, got) =>
        exemplars.foreach { n =>
          assert(got(n) == base(n),
            s"$n differs between shuffle.partitions=1 and =$p")
        }
      }
      // Not vacuous: every exemplar produced rows.
      exemplars.foreach(n => assert(base(n).nonEmpty, s"$n empty"))
    } finally spark.conf.set(key, saved)
  }
}
