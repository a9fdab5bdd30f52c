package graft

import graft.operators.{BmpPayload, MediaPayload, MultiModalOps, WavPayload}

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

  test("wav encoder emits the exact RIFF byte layout") {
    // Golden container for (doc_id=5, n=2): every offset hand-checked
    // against the public WAVE layout so an encoder regression is a
    // byte-diff, not a roundtrip tautology.
    val b = MultiModalOps.wavEncode(spark.createDataset(Seq((5L, 2))))
      .collect().head.payload
    assert(b.length == 48) // 44-byte header + 2×2 data bytes
    assert(new String(b, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(b, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(b, 12, 4, "US-ASCII") == "fmt ")
    assert(new String(b, 36, 4, "US-ASCII") == "data")
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    assert(le32(4) == 40)                        // RIFF size = total - 8
    assert(le32(16) == 16 && le16(20) == 1)      // PCM fmt chunk
    assert(le16(22) == 1 && le32(24) == MultiModalOps.WavSampleRate)
    assert(le32(28) == MultiModalOps.WavSampleRate * 2) // byte rate
    assert(le16(32) == 2 && le16(34) == 16)      // block align / bits
    assert(le32(40) == 4)                        // data chunk bytes
    assert(le16(44).toShort == MultiModalOps.wavSample(5L, 0).toShort)
    assert(le16(46).toShort == MultiModalOps.wavSample(5L, 1).toShort)
  }

  test("wav decoder parses a real container back to exact features") {
    val ds = spark.createDataset(Seq((7L, 5), (8L, 1)))
    val out = MultiModalOps.wavDecode(MultiModalOps.wavEncode(ds))
      .collect().map(f => f.doc_id -> f).toMap
    val f7 = out(7L)
    assert(f7.sample_rate == MultiModalOps.WavSampleRate)
    assert(f7.n_channels == 1 && f7.bits_per_sample == 16)
    assert(f7.n_samples == 5 && f7.container_bytes == 44 + 10)
    val samples = (0 until 5).map(MultiModalOps.wavSample(7L, _))
    assert(f7.peak_abs == samples.map(math.abs).max)
    assert(f7.energy == samples.map(s => s.toLong * s.toLong).sum)
    assert(out(8L).n_samples == 1)
  }

  test("wav decoder walks unknown and odd-sized chunks per the spec") {
    // Splice a 3-byte vendor chunk (odd size → 1 pad byte) between
    // `fmt ` and `data`: a spec-compliant reader must skip it and still
    // find the data chunk at its padded offset.
    val base = MultiModalOps.wavEncode(spark.createDataset(Seq((9L, 3))))
      .collect().head.payload
    val extra = "junk".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](1, 2, 3, 0) // id, LE size=3, payload + pad
    val spliced = base.slice(0, 36) ++ extra ++ base.drop(36)
    // patch the RIFF size for the 12 inserted bytes
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte
    spliced(5) = ((total >> 8) & 0xff).toByte
    val f = MultiModalOps.wavDecode(
      spark.createDataset(Seq(WavPayload(9L, spliced)))).collect().head
    assert(f.n_samples == 3 && f.sample_rate == MultiModalOps.WavSampleRate)
  }

  test("wav decoder rejects corrupted containers") {
    val good = MultiModalOps.wavEncode(spark.createDataset(Seq((4L, 4))))
      .collect().head.payload
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val badSize = good.clone(); badSize(4) = (badSize(4) + 1).toByte
    // Corrupt blockAlign (offset 32, LE16) to 4: without its own check
    // this would silently halve n_samples instead of throwing.
    val badAlign = good.clone(); badAlign(32) = 4
    for (bad <- Seq(badMagic, badSize, badAlign)) {
      val ex = intercept[Exception] {
        MultiModalOps.wavDecode(
          spark.createDataset(Seq(WavPayload(4L, bad)))).collect()
      }
      assert(ex.getMessage.contains("wav_decode") ||
        Option(ex.getCause).exists(_.getMessage.contains("wav_decode")))
    }
  }

  test("bmp encoder emits the exact BITMAP byte layout") {
    // Golden container for (doc_id=5, w=5, h=3): stride = 16 (15 pixel
    // bytes + 1 pad), file = 54 + 3×16 = 102 bytes. Every offset
    // hand-checked against the public BMP layout.
    val b = MultiModalOps.bmpEncode(spark.createDataset(Seq((5L, 5, 3))))
      .collect().head.payload
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    assert(b.length == 102)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    assert(le32(2) == 102)                      // declared file size
    assert(le32(10) == 54)                      // pixel-data offset
    assert(le32(14) == 40)                      // BITMAPINFOHEADER size
    assert(le32(18) == 5 && le32(22) == 3)      // width / height
    assert(le16(26) == 1 && le16(28) == 24)     // planes / bpp
    assert(le32(30) == 0 && le32(34) == 48)     // BI_RGB / image size
    // Stored row 0 is IMAGE row y=2 (bottom-up); its first byte is the
    // blue channel of pixel (0, 2).
    assert((b(54) & 0xff) == MultiModalOps.bmpByte(5L, 0, 2, 0))
    assert((b(54 + 15) & 0xff) == 0)            // the stride pad byte
    // Stored LAST row starts the TOP image row (y=0).
    assert((b(54 + 2 * 16) & 0xff) == MultiModalOps.bmpByte(5L, 0, 0, 0))
  }

  test("bmp decoder parses a real container back to exact features, " +
      "honoring bottom-up rows and stride padding") {
    // (7,4,3): stride 12, pad-free; (8,5,2): stride 16, padded — both
    // stride classes, features recomputed from the formula directly.
    val ds = spark.createDataset(Seq((7L, 4, 3), (8L, 5, 2)))
    val out = MultiModalOps.bmpDecode(MultiModalOps.bmpEncode(ds))
      .collect().map(f => f.doc_id -> f).toMap
    for ((docId, w, h) <- Seq((7L, 4, 3), (8L, 5, 2))) {
      val f = out(docId)
      val bytes = for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        yield MultiModalOps.bmpByte(docId, x, y, c)
      assert(f.width == w && f.height == h && f.bpp == 24)
      assert(f.row_stride == ((w * 3 + 3) / 4) * 4)
      assert(f.n_pixels == w * h)
      assert(f.container_bytes == 54 + f.row_stride * h)
      assert(f.max_byte == bytes.max)
      assert(f.pixel_sum == bytes.map(_.toLong).sum)
      val top = for (x <- 0 until w; c <- 0 until 3)
        yield MultiModalOps.bmpByte(docId, x, 0, c)
      assert(f.top_row_checksum ==
        top.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum)
    }
  }

  test("bmp decoder rejects corrupted containers") {
    val good = MultiModalOps.bmpEncode(spark.createDataset(Seq((4L, 6, 4))))
      .collect().head.payload
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val badSize = good.clone(); badSize(2) = (badSize(2) + 1).toByte
    // 32 bpp at offset 28: without the bpp check the stride arithmetic
    // would silently walk the wrong bytes.
    val badBpp = good.clone(); badBpp(28) = 32
    for (bad <- Seq(badMagic, badSize, badBpp)) {
      val ex = intercept[Exception] {
        MultiModalOps.bmpDecode(
          spark.createDataset(Seq(BmpPayload(4L, bad)))).collect()
      }
      assert(ex.getMessage.contains("bmp_decode") ||
        Option(ex.getCause).exists(_.getMessage.contains("bmp_decode")))
    }
  }

  test("document payload dataset carries media-type metadata") {
    val ds = MultiModalOps.documentPayloads(spark, scratch).collect()
    assert(ds.length == 3)
    assert(ds.forall(_.media_type == "text/plain"))
    assert(new String(ds.find(_.doc_id == 3L).get.payload, "UTF-8")
      == "tiny doc")
  }

  test("wav resample decimates exactly the even-index samples") {
    // Odd n: ceil(n/2) kept (indices 0,2,4); even n: n/2 kept. The
    // expectation recomputes from the sample formula independently.
    val cases = Seq((31L, 5), (32L, 4), (33L, 1))
    val in = spark.createDataset(cases)
    val out = MultiModalOps.wavResample(MultiModalOps.wavEncode(in))
      .collect().map(r => r.doc_id -> r).toMap
    cases.foreach { case (d, n) =>
      val kept = (0 until n by MultiModalOps.WavDecim)
        .map(MultiModalOps.wavSample(d, _))
      val r = out(d)
      assert(r.n_in == n && r.n_out == kept.length)
      assert(r.in_rate == MultiModalOps.WavSampleRate)
      assert(r.out_rate ==
        MultiModalOps.WavSampleRate / MultiModalOps.WavDecim)
      assert(r.peak_abs == kept.map(math.abs).max, s"peak doc $d")
      assert(r.energy == kept.map(s => s.toLong * s).sum, s"energy doc $d")
    }
  }

  test("video frame sampler walks frame sizes and samples stride-2") {
    // 3 frames -> samples frames 0 and 2; 2 frames -> frame 0 only.
    // w=5 gives stride-padded frames, so a walker that advances by
    // w*3*h + 54 instead of the declared size desyncs at frame 1.
    val cases = Seq((21L, 5, 3, 3), (22L, 4, 3, 2))
    val in = spark.createDataset(cases)
    val out = MultiModalOps.videoFrameSample(MultiModalOps.videoEncode(in))
      .collect().map(r => r.doc_id -> r).toMap
    cases.foreach { case (d, w, h, nf) =>
      val sampledFrames = (0 until nf).filter(_ % MultiModalOps.FrameStride == 0)
      var sum = 0L; var mx = 0
      for (f <- sampledFrames; y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val v = MultiModalOps.bmpByte(d + f * MultiModalOps.FrameSeedStep, x, y, c)
        sum += v; if (v > mx) mx = v
      }
      val r = out(d)
      assert(r.n_frames == nf && r.n_sampled == sampledFrames.length)
      assert(r.frame_w == w && r.frame_h == h)
      assert(r.sampled_pixel_sum == sum, s"pixel sum doc $d")
      assert(r.sampled_max_byte == mx, s"max byte doc $d")
    }
  }

  test("bmp resize matches an independent block recomputation") {
    import MultiModalOps.{ResizeGridW => gw, ResizeGridH => gh}
    // w=5 exercises stride padding (15 → 16) AND a 2-pixel block
    // (x·4/5 = 0,0,1,2,3); the parse walks bottom-up storage, the
    // expectation below walks top-down image coords — agreement proves
    // the decoder reorders rows correctly.
    val cases = Seq((7L, 5, 3), (9L, 4, 3), (11L, 16, 13))
    val in = spark.createDataset(cases)
    val out = MultiModalOps.bmpResize(MultiModalOps.bmpEncode(in))
      .collect().map(r => r.doc_id -> r).toMap
    cases.foreach { case (d, w, h) =>
      val bs = Array.ofDim[Long](gw * gh)
      val bn = Array.ofDim[Long](gw * gh)
      for (y <- 0 until h; x <- 0 until w) {
        val gray = (0 until 3).map(MultiModalOps.bmpByte(d, x, y, _)).sum
        val bi = (y * gh / h) * gw + x * gw / w
        bs(bi) += gray; bn(bi) += 1
      }
      val ts = bs.sum; val tn = w.toLong * h
      val expChecksum =
        bs.indices.map(i => (bs(i) / bn(i)) * (i + 1)).sum
      val expHash = bs.indices
        .filter(i => bs(i) * tn > ts * bn(i)).map(1 << _).sum
      val r = out(d)
      assert(r.n_pixels == w * h)
      assert(r.resize_checksum == expChecksum, s"checksum doc $d")
      assert(r.ahash == expHash, s"ahash doc $d")
    }
  }

  test("image dup clusters partition the census exactly") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val clusters = graft.operators.MultiModalOps
      .imageDupClusters(spark, dir).collect()
    val census = graft.operators.MultiModalOps
      .imagePhashCensus(spark, dir).collect()
    val nDocs = graft.Tables.documents(spark, dir).count()
    // Conservation laws: clusters partition the hash census, image
    // mass sums to the corpus, and each cluster's representative is
    // the min doc of its members (here provable globally via min).
    assert(clusters.map(_.getAs[Long]("n_hashes")).sum == census.length)
    assert(clusters.map(_.getAs[Long]("n_images")).sum == nDocs)
    assert(clusters.map(_.getAs[Long]("keep_id")).min ==
      census.map(_.getAs[Long]("keep_id")).min)
    // Every cluster label is one of its member hashes (min-label CC),
    // so labels are a subset of the census's hash set.
    val hashes = census.map(_.getAs[Int]("ahash")).toSet
    clusters.foreach(c =>
      assert(hashes.contains(c.getAs[Int]("cluster_id"))))
    // Density-guard invariants: a hub (degree > DupDegreeCap) never
    // enters the closure, so every hub cluster is a singleton whose
    // label is itself; hub status must agree with the census's
    // measured Hamming-1 degree.
    val degs = census.map(r =>
      r.getAs[Int]("ahash") -> r.getAs[Long]("n_neighbor_hashes")).toMap
    clusters.foreach { c =>
      if (c.getAs[Boolean]("is_hub")) {
        assert(c.getAs[Long]("n_hashes") == 1L, s"hub cluster not singleton: $c")
        assert(degs(c.getAs[Int]("cluster_id")) >
          graft.operators.MultiModalOps.DupDegreeCap, s"flagged non-hub: $c")
      }
    }
    // Non-hub members never chain THROUGH a hub: each multi-hash
    // cluster's members must all be non-hubs.
    val hubHashes = degs.filter(_._2 >
      graft.operators.MultiModalOps.DupDegreeCap).keySet
    clusters.filter(_.getAs[Long]("n_hashes") > 1L).foreach(c =>
      assert(!hubHashes.contains(c.getAs[Int]("cluster_id"))))
  }

  test("density guard splits the dense sf0.01 space into many clusters") {
    // r12 recorded the unguarded closure chaining ALL 69 present
    // hashes at sf0.01 into ONE cluster; the degree guard must break
    // that while conserving the partition laws (the oracle pins the
    // exact cluster set — this pins the qualitative property the guard
    // exists for).
    val clusters = graft.operators.MultiModalOps
      .imageDupClusters(spark, "/root/testdata/sf0.01").collect()
    assert(clusters.length > 10, s"only ${clusters.length} clusters")
    assert(clusters.exists(_.getAs[Boolean]("is_hub")))
    assert(clusters.exists(c => !c.getAs[Boolean]("is_hub") &&
      c.getAs[Long]("n_hashes") > 1L))
  }
}
