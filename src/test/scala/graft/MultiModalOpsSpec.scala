package graft

import graft.operators.{MediaPayload, MultiModalOps}

/** Multimodal-column plumbing: opaque binary payloads, nested
  * array-of-struct page structure, and the partition-parallel decode
  * stub (the mapInPandas-analog stage a real image/audio decoder would
  * plug into). */
class MultiModalOpsSpec extends GraftSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    val page = "x" * MultiModalOps.PageChars
    writeTable("documents", Seq(
      // exactly 2 full pages
      (1L, page + page, "en", "web", (2 * MultiModalOps.PageChars).toLong),
      // 1 full page + 10-char tail → 2 pages, last short
      (2L, page + "abcdefghij", "en", "web",
        (MultiModalOps.PageChars + 10).toLong),
      // short doc → 1 page
      (3L, "tiny doc", "en", "web", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("binary stats are byte-level: length, hash, magic") {
    val rows = MultiModalOps.binaryDocStats(spark, scratch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(3L).getAs[Int]("n_bytes") == 8)
    assert(rows(3L).getAs[Int]("n_chunks") == 1)
    assert(rows(1L).getAs[Int]("n_chunks") == 2)
    // "tiny" = 0x74 0x69 0x6E 0x79
    assert(rows(3L).getAs[String]("magic_hex").equalsIgnoreCase("74696E79"))
  }

  test("nested pages build, explode, and re-aggregate consistently") {
    val rows = MultiModalOps.docPageStats(spark, scratch).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("n_pages") == 2)
    assert(rows(1L).getAs[Long]("total_chars") ==
      2L * MultiModalOps.PageChars)
    assert(rows(2L).getAs[Int]("n_pages") == 2)
    assert(rows(2L).getAs[Long]("total_chars") ==
      MultiModalOps.PageChars + 10L)
    assert(rows(2L).getAs[Int]("max_page_chars") == MultiModalOps.PageChars)
    assert(rows(3L).getAs[Int]("n_pages") == 1)
    assert(rows(3L).getAs[Int]("max_page_chars") == 8)
    // first-page hash is the hash of the first PageChars characters
    assert(rows(1L).getAs[String]("first_page_md5") ==
      rows(2L).getAs[String]("first_page_md5")) // same full first page
  }

  test("decode stub runs partition-parallel and is deterministic") {
    val payloads = spark.createDataset(Seq(
      MediaPayload(1L, "aaabbb".getBytes("UTF-8"), "text/plain"),
      MediaPayload(2L, Array[Byte](), "application/octet-stream"),
      MediaPayload(3L, Array[Byte](0, 0, 0, 0, 1), "application/octet-stream")
    )).repartition(3) // force multiple partitions: no cross-partition state
    val out = MultiModalOps.decodeStub(payloads).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).n_bytes == 6)
    assert(out(1L).n_distinct_bytes == 2)
    assert(out(1L).max_run_length == 3)
    assert(out(1L).byte_mean == ('a'.toInt * 3 + 'b'.toInt * 3) / 6.0)
    assert(out(2L).n_bytes == 0 && out(2L).byte_mean == 0.0)
    assert(out(3L).max_run_length == 4 && out(3L).n_distinct_bytes == 2)
  }

  test("testdata corpus is ASCII, as the byte-level oracle assumes") {
    // The binary_doc_stats oracle computes magic_hex/md5 with DuckDB's
    // char-level substr while Spark slices the binary payload — equal
    // ONLY while every text is pure ASCII (byte length == char length).
    // Enforce that assumption on the real corpora instead of leaving it
    // as a comment: if the generator ever emits multi-byte characters,
    // this fails before the oracle silently desynchronizes.
    import org.apache.spark.sql.functions.{expr, length}
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val nonAscii = graft.Tables.documents(spark, dir)
        .filter(expr("octet_length(text)") =!= length($"text"))
        .count()
      assert(nonAscii == 0L, s"non-ASCII documents in $dir")
    }
  }

  test("document payload dataset carries media-type metadata") {
    val ds = MultiModalOps.documentPayloads(spark, scratch).collect()
    assert(ds.length == 3)
    assert(ds.forall(_.media_type == "text/plain"))
    assert(new String(ds.find(_.doc_id == 3L).get.payload, "UTF-8")
      == "tiny doc")
  }
}
