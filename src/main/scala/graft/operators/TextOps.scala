package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Large-scale training-data text operators over the `documents` table:
  * exact + near deduplication, quality stats, language ID, fingerprinting.
  * These extend the reference's capability surface toward an LLM data
  * pipeline (BASELINE.json north star; no reference counterpart — the
  * reference's closest analogs are the pandas transform passes in
  * `/root/reference/python/batch_processor.py:108-176`).
  *
  * Scale posture: everything is expressed over codegen'd built-ins
  * (split/transform/filter/aggregate higher-order functions, md5) — no
  * UDFs, no driver-side loops. Near-dup detection NEVER does an unblocked
  * all-pairs join: the Jaccard variant blocks on (lang, length bucket) and
  * the MinHash variant blocks on LSH band signatures, so candidate
  * generation is a hash-partitioned groupBy join at any scale.
  */
object TextOps {

  /** Whitespace tokens of the document text. */
  private def tokens: Column = split(col("text"), " ")

  private val stopwords = Seq("a", "the", "of", "and", "to", "in")

  /** Exact dedup groups: one row per distinct text with the surviving
    * (first-wins = min) doc_id and the duplicate count — the hash-groupBy
    * exact dedup of a training corpus. */
  def exactDedupGroups(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  /** Exact dedup survivors: documents whose doc_id is the minimum of their
    * exact-text group (first-wins), via a key-partitioned window — the
    * standard distributed dedup-keep plan (one shuffle on the text hash). */
  def dedupedDocs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    Tables.documents(spark, dir)
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Per-document quality stats: token counts, distinct ratio, stopword
    * ratio, average token length — the length/stopword quality-scoring
    * heuristics of a training-data pipeline, all via codegen'd higher-order
    * functions on the token array. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString("(", ",", ")")
    Tables.documents(spark, dir)
      .withColumn("toks", tokens)
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("n_stopwords",
        size(expr(s"filter(toks, t -> t in $stopList)")))
      .withColumn("sum_token_len",
        expr("aggregate(transform(toks, t -> length(t)), 0, (a, x) -> a + x)"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"), col("n_tokens"),
        col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        (col("n_stopwords").cast("double") / col("n_tokens").cast("double"))
          .as("stopword_ratio"),
        (col("sum_token_len").cast("double") / col("n_tokens").cast("double"))
          .as("avg_token_len"))
      .orderBy("doc_id")
  }

  /** Corpus stats per language: doc/token counts and average length
    * (integer sums — exact at any parallelism). */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(tokens))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .withColumn("avg_chars",
        col("total_chars").cast("double") / col("n_docs").cast("double"))
      .orderBy("lang")

  /** Language-ID heuristic: n-gram/stopword-frequency scoring — the
    * lightweight langid a data pipeline runs before model-based ID. The
    * corpus is synthetic English-vocabulary text, so the heuristic
    * resolves to en/other with a confidence score; the operator shape
    * (token-ratio scoring + argmax CASE) is the real thing. */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString("(", ",", ")")
    Tables.documents(spark, dir)
      .withColumn("toks", tokens)
      .withColumn("stop_ratio",
        size(expr(s"filter(toks, t -> t in $stopList)")).cast("double") /
          size(col("toks")).cast("double"))
      .withColumn("predicted_lang",
        when(col("stop_ratio") >= 0.08, "en").otherwise("other"))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("predicted_lang"), col("stop_ratio"),
        (col("predicted_lang") === col("lang")).as("agrees"))
      .orderBy("doc_id")
  }

  /** Content fingerprint: md5 of the raw text plus an order-insensitive
    * bag-of-words fingerprint (md5 of the sorted distinct token list) —
    * the document-fingerprinting primitive for shingle-free near-dup
    * screening. */
  def docFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("text_md5"),
        md5(array_join(array_sort(array_distinct(tokens)), " "))
          .as("bag_md5"))
      .orderBy("doc_id")

  /** Word-bigram shingles of the text, built as zip_with(tokens[0..n-2],
    * tokens[1..n-1]) — O(n) per evaluation. The earlier
    * `transform(sequence(1, n-1), i -> element_at(split(text), i) ...)`
    * form was O(n²): HOF lambdas are interpreted and re-run `split(text)`
    * on every element access. A <2-token doc must yield an empty array
    * explicitly: `sequence(1, 0)` is DESCENDING in Spark ([1, 0]) and
    * element_at(_, 0) throws, so n<2 cannot be guarded with greatest()
    * alone — zip_with of empty/size-0 slices handles it, but the case
    * guard keeps the semantics obvious. */
  private def shingles: Column =
    expr("""case when size(split(text, ' ')) < 2
              then cast(array() as array<string>)
              else zip_with(
                slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
                slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
                (x, y) -> concat(x, ' ', y))
            end""")

  /** n-gram Jaccard near-dup pairs with (lang, length-bucket) blocking,
    * computed via an inverted index: explode distinct shingles into postings,
    * self-join postings on (shingle, block) to count common shingles per
    * pair, then |A∪B| = |A| + |B| − |A∩B|. Candidate pairs only materialize
    * when they share ≥1 shingle (zero-overlap pairs can never reach the 0.1
    * threshold), so the per-pair array_intersect of the naive block
    * self-join never happens — work is proportional to actual overlap, not
    * block². At 100 TB the posting join is a hash shuffle on (shingle,
    * block); a stop-shingle cut (drop postings above a document-frequency
    * cap) would bound skew — unnecessary at this corpus's overlap profile. */
  def nearDupJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Repartition before the shingle projection: the corpus arrives as few
    // parquet splits, and without this the per-doc shingle work would run
    // on a single core (at real scale the scan has many splits already).
    val docs = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / lit(100)).cast("int").as("len_bucket"),
        array_distinct(shingles).as("sh"))
      .withColumn("n_sh", size(col("sh")))
    // Posting lists instead of a posting self-join: the self-join would
    // recompute the shingle pipeline for both sides (exchange reuse does
    // not kick in across the join aliases); grouping postings per
    // (shingle, block) and exploding ordered in-bucket pairs computes the
    // shingles ONCE and needs a single shuffle.
    val post = docs.select(col("lang"), col("len_bucket"),
      explode(col("sh")).as("shingle"),
      struct(col("doc_id"), col("n_sh")).as("d"))
    val pairs = post
      .groupBy("shingle", "lang", "len_bucket")
      .agg(array_sort(collect_list(col("d"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(ds, x ->
             transform(filter(ds, y -> y.doc_id > x.doc_id), y ->
               named_struct('doc_a', x.doc_id, 'n_a', x.n_sh,
                            'doc_b', y.doc_id, 'n_b', y.n_sh))))""")).as("p"))
    pairs
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .agg(count(lit(1)).cast("int").as("n_inter"))
      .withColumn("n_union", (col("n_a") + col("n_b") - col("n_inter")).cast("int"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= 0.1)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"),
        col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash-LSH near-dup candidates: per (band, doc), the band signature
    * is the min of md5(band ‖ shingle) over the doc's shingles (md5 order
    * on hex = order on the 128-bit hash value); docs sharing a band
    * signature are candidates. Candidate generation is
    * explode → groupBy(band, signature) — banded LSH, linear in corpus
    * size, never all-pairs. Output: candidate pairs with the number of
    * colliding bands. */
  def minhashCandidates(spark: SparkSession, dir: String,
                        bands: Int = 8): DataFrame = {
    // All band signatures are computed per document in ONE projection (a
    // nested higher-order transform) — no shingle explode, no 8×-amplified
    // shuffle, no groupBy. The only shuffle left is the band-bucket join.
    // Repartition first so the md5 signature work spreads across cores
    // (the corpus arrives as few parquet splits).
    val sig = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .withColumn("sh", shingles)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}),
              band -> array_min(transform(sh,
                s -> md5(concat(cast(band as string), '|', s)))))""")))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("band_sig"))
      .filter(col("band_sig").isNotNull)
    // Bucket members via collect_list, then explode ordered pairs — one
    // shuffle, signatures computed once (a self-join would run the whole
    // signature pipeline twice). A pathological bucket (all docs
    // identical) explodes m² pairs from one row; a size cap on `ids`
    // would bound that at web scale.
    sig
      .groupBy("band", "band_sig")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(ids, x ->
             transform(filter(ids, y -> y > x), y ->
               named_struct('doc_a', x, 'doc_b', y))))""")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }
}
