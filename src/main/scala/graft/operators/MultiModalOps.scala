package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One opaque media payload: the multimodal column convention — raw bytes
  * plus typed metadata travelling beside them (images/audio/video are this
  * exact shape with a different decoder). */
case class MediaPayload(doc_id: Long, payload: Array[Byte], media_type: String)

/** Deterministic per-payload features produced by the (stubbed) decode
  * stage. */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Int, n_distinct_bytes: Int,
    max_run_length: Int, byte_mean: Double)

/** Multimodal-column operators (builder-brief extension; no reference
  * counterpart — the reference is purely relational/JSON).
  *
  * The convention for image/audio/video at 100 TB is exactly what these
  * operators exercise: an opaque `binary` payload column with typed
  * metadata beside it, nested array-of-struct columns for per-segment
  * structure (pages/frames/windows), and a partition-parallel decode
  * stage. The container has no image/audio codecs, so `decodeStub`
  * substitutes a deterministic byte-statistics "decoder" — the Spark-side
  * plumbing (schema, batching, partition parallelism, feature row shape)
  * is the real thing and is what the specs test; swapping in a JNI/
  * library decoder changes one function body, not the pipeline.
  */
object MultiModalOps {

  /** Characters per synthesized page (chunking unit for the nested
    * pipeline below). */
  val PageChars = 256

  /** Opaque-binary payload stats — the first pass a pipeline runs over a
    * media column it has not decoded yet: byte length, content hash, and
    * a leading-bytes "magic" tag (format sniffing), plus the chunk count
    * a fixed-size splitter would produce. The payload is the document
    * text cast to binary (the testdata has no media table); every
    * operation is the binary-column operation, not a string one. */
  def binaryDocStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        hex(substring(col("payload"), 1, 4)).as("magic_hex"),
        ceil(octet_length(col("payload")).cast("double") / PageChars)
          .cast("int").as("n_chunks"))
      .orderBy("doc_id")

  /** Nested array-of-struct pipeline: build a `pages` column
    * (array<struct<page_no,int body:string>>) by fixed-size chunking,
    * explode it, and re-aggregate per document — the build/explode/
    * re-agg cycle every multimodal pipeline runs over per-frame or
    * per-page structure. The nested column is materialized mid-plan
    * (posexplode of an array of structs), not simulated. */
  def docPageStats(spark: SparkSession, dir: String): DataFrame = {
    // greatest(…, 1): an empty document is one empty page, so the
    // sequence below never runs descending (sequence(0, -1) would).
    val paged = Tables.documents(spark, dir)
      .withColumn("n_pages",
        greatest(ceil(length(col("text")).cast("double") / PageChars), lit(1))
          .cast("int"))
      .withColumn("pages", expr(
        s"""transform(sequence(0, n_pages - 1), i ->
              named_struct(
                'page_no', i,
                'body', substring(text, i * $PageChars + 1, $PageChars)))"""))
    paged
      .select(col("doc_id"), col("n_pages"),
        posexplode(col("pages")).as(Seq("pos", "page")))
      .groupBy("doc_id", "n_pages")
      .agg(
        sum(length(col("page.body")).cast("long")).as("total_chars"),
        max(length(col("page.body"))).as("max_page_chars"),
        min(when(col("page.page_no") === 0, md5(col("page.body"))))
          .as("first_page_md5"))
      .select("doc_id", "n_pages", "total_chars", "max_page_chars",
        "first_page_md5")
      .orderBy("doc_id")
  }

  /** The decode stage: partition-parallel feature extraction over opaque
    * payloads via `mapPartitions` — the Scala analog of a vectorized
    * Python `mapInPandas` decode. Each partition's iterator is consumed
    * once, payload by payload; a real pipeline would decode
    * images/audio here (that library dependency is what this container
    * lacks), so the body computes deterministic byte statistics instead —
    * the DISTRIBUTION shape (no driver collect, no global state, output
    * row per input row) is the part that matters at 100 TB.
    * STUB: byte-stats stand in for codec feature extraction. */
  def decodeStub(payloads: Dataset[MediaPayload]): Dataset[MediaFeatures] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { m =>
        val bytes = m.payload
        var maxRun = 0
        var run = 0
        var prev = -1
        var sum = 0L
        val seen = new Array[Boolean](256)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          seen(b) = true
          sum += b
          if (b == prev) run += 1 else { prev = b; run = 1 }
          if (run > maxRun) maxRun = run
          i += 1
        }
        MediaFeatures(
          m.doc_id, m.media_type, bytes.length, seen.count(identity),
          maxRun,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
      }
    }
  }

  /** Documents as a media-payload dataset (text bytes standing in for an
    * undecoded media column). */
  def documentPayloads(spark: SparkSession, dir: String)
      : Dataset[MediaPayload] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("text/plain").as("media_type"))
      .as[MediaPayload]
  }
}
