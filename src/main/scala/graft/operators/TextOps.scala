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

  /** Word-bigram shingles of the text (1-based element_at; docs are
    * guaranteed ≥2 tokens in this corpus, guarded anyway). */
  private def shingles: Column =
    expr("""transform(
              sequence(1, greatest(size(split(text, ' ')) - 1, 0)),
              i -> concat(element_at(split(text, ' '), i), ' ',
                          element_at(split(text, ' '), i + 1)))""")

  /** n-gram Jaccard near-dup pairs with (lang, length-bucket) blocking:
    * candidate pairs only form inside a block, never corpus×corpus. Jaccard
    * over distinct word-bigram shingles; integer-count division is exact so
    * the score is engine-stable. At 100 TB the block join is a hash
    * shuffle on (lang, bucket); skewed blocks would be salted. */
  def nearDupJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / lit(100)).cast("int").as("len_bucket"),
        array_distinct(shingles).as("sh"))
    val a = docs.alias("a")
    val b = docs.alias("b")
    a.join(b,
        col("a.lang") === col("b.lang") &&
        col("a.len_bucket") === col("b.len_bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("n_inter",
        size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("n_union",
        size(array_distinct(concat(col("a.sh"), col("b.sh")))))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .filter(col("jaccard") >= 0.1)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("n_inter"), col("n_union"), col("jaccard"))
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
    val sig = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(shingles).as("shingle"))
      .crossJoin(
        spark.range(bands).select(col("id").cast("int").as("band")))
      .groupBy(col("doc_id"), col("band"))
      .agg(min(md5(concat(col("band"), lit("|"), col("shingle"))))
        .as("band_sig"))
    val a = sig.alias("a")
    val b = sig.alias("b")
    a.join(b,
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }
}
