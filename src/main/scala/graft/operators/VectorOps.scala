package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (`vec_id`,
  * `embedding: array<float>`, `label`) — the ANN component of a
  * training-data pipeline (BASELINE.json extension goal; no reference
  * counterpart).
  *
  * All vector math uses codegen'd higher-order functions
  * (`transform`/`zip_with`/`aggregate`) folding in list order with double
  * accumulation — deterministic at any parallelism, and bit-identical to an
  * oracle that folds the same way. No UDFs.
  *
  * Scale posture: brute-force top-k is quadratic and exists only as the
  * small-query-set baseline (k queries × corpus, a broadcast of the query
  * set — fine when queries ≪ corpus). The scale path is sign-LSH
  * bucketing: candidates form inside a bucket (hash-partitioned groupBy
  * join), corpus×corpus never materializes. IVF would follow the same
  * shape with learned centroids.
  */
object VectorOps {

  /** Σ x² over the vector, folded in list order with double accumulation. */
  private def sq(c: String): Column =
    expr(s"aggregate($c, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")

  /** Dot product of two vectors, folded in list order. */
  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)")

  /** Per-vector L2 norm + dimension — the normalization pass run before
    * indexing a corpus. */
  def embeddingNorms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        sqrt(sq("embedding")).as("l2_norm"))
      .orderBy("vec_id")

  /** Per-label corpus stats with the norm sum carried in decimal so the
    * aggregate is order-independent. */
  def labelStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), sqrt(sq("embedding")).as("l2_norm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(col("l2_norm").cast("decimal(28,12)")).cast("double")
          .as("sum_norm"))
      .withColumn("avg_norm",
        col("sum_norm") / col("n_vectors").cast("double"))
      .orderBy("label")

  /** Brute-force cosine top-k: the exact baseline. Query set = vec_id < 5
    * (broadcast), candidates = whole corpus; rank per query by
    * (cosine desc, vec_id) — deterministic tiebreak. The cosine is rounded
    * to 9 dp on output (ranking uses the unrounded value). */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // Norms are precomputed per VECTOR, not per pair — sqrt(Σx²) then a
    // multiply is the same float ops as computing both inside the pair, so
    // results stay bit-identical to the oracle while the per-pair work
    // drops to one dot product.
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        sqrt(sq("embedding")).as("q_norm"))
    // Broadcast the tiny QUERY set and stream the corpus (repartitioned —
    // it arrives as one parquet split), so the k×N dot products are
    // computed across all cores on the corpus side, not on the k-row side.
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
        sqrt(sq("embedding")).as("c_norm"))
      .repartition(col("c_id"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("c_id"))
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("c_id"), col("rk"),
        round(col("cosine"), 9).as("cosine"))
      .orderBy("q_id", "rk")
  }

  /** Sign-LSH bucket id: the sign bits of the first `bits` dimensions
    * packed into an int — a fixed random-hyperplane LSH where the
    * hyperplanes are the axis planes (deterministic, engine-neutral). */
  private def bucketCol(bits: Int): Column =
    (0 until bits)
      .map(i => when(expr(s"element_at(embedding, ${i + 1})") > 0f,
        lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Bucketed ANN top-1: each vector finds its nearest same-bucket
    * neighbor. Candidates form only inside an LSH bucket — the join is a
    * hash shuffle on bucket id, linear-ish in corpus size; this is the
    * 100 TB path (brute force above is the correctness baseline). Vectors
    * alone in their bucket produce no row (documented recall/coverage
    * trade-off of LSH). */
  def annLshTop1(spark: SparkSession, dir: String,
                 bits: Int = 4): DataFrame = {
    // Per-vector norms precomputed before the join (same float ops as the
    // per-pair form → bit-identical to the oracle, 3× less HOF work).
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        bucketCol(bits).as("bucket"),
        sqrt(sq("embedding")).as("norm"))
    // The probe side is repartitioned on vec_id so pair scoring spreads
    // across all cores even when the source is one parquet split; the
    // build side stays keyed on bucket (2^bits keys) and is broadcast by
    // Catalyst at this size — at 100 TB both sides would shuffle on
    // bucket with salting for hot buckets.
    val a = e.repartition(col("vec_id")).select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("bucket"), col("norm").as("q_norm"))
    val b = e.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), col("bucket").as("c_bucket"),
      col("norm").as("c_norm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cosine").desc, col("c_id"))
    a.join(b, col("bucket") === col("c_bucket") &&
        col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dot("q_emb", "c_emb") / (col("q_norm") * col("c_norm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("bucket"), col("c_id"),
        round(col("cosine"), 9).as("cosine"))
      .orderBy("q_id")
  }
}
