package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode features are pure functions of the payload") {
    val feats = Multimodal.decodeFeatures(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(feats.length === docs)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width === (f.n_bytes % 640).toInt)
      assert(f.height === (f.n_bytes * 7 % 480).toInt)
      assert(f.checksum.length === 32)
      assert(f.media_type === "text/plain")
    }
  }

  test("a custom codec slots into the seam; open() runs once per partition") {
    import spark.implicits._
    // a non-trivial fake: parses a 2-byte "header" (width, height) like a
    // real decoder parses container headers; counts open() calls through an
    // accumulator to prove per-partition (NOT per-record) setup
    val opens = spark.sparkContext.longAccumulator("codec_opens")
    class HeaderCodec extends Multimodal.MediaCodec {
      override def open(): Multimodal.MediaRecord => Multimodal.MediaFeatures = {
        opens.add(1)
        r => {
          require(r.bytes.length >= 2, "payload must carry the fake header")
          Multimodal.MediaFeatures(r.doc_id, r.media_type,
            r.bytes.length.toLong,
            r.bytes(0) & 0xff, r.bytes(1) & 0xff, "")
        }
      }
    }
    val media = (0L until 100L)
      .map(i => Multimodal.MediaRecord(i, "img/fake",
        Array[Byte]((i % 256).toByte, ((i * 3) % 256).toByte, 0, 0)))
      .toDS().repartition(4)
    val feats = Multimodal.decodeWith(media, new HeaderCodec).collect()
    assert(feats.length === 100)
    feats.foreach { f =>
      assert(f.width === (f.doc_id % 256).toInt, "width from header byte 0")
      assert(f.height === ((f.doc_id * 3) % 256).toInt, "height from header byte 1")
      assert(f.n_bytes === 4L)
    }
    assert(opens.value === 4L, "open() must run once per partition")
  }

  test("a real javax.imageio BMP decoder drives the seam end-to-end") {
    import spark.implicits._
    // JDK-only real decoder (no new deps): payloads are genuine BMP
    // containers authored with ImageIO, and the codec parses REAL headers
    // and decodes REAL pixels — proving the open()-once-per-partition
    // contract against an actually stateful decoder (an ImageIO reader
    // holds its input stream via setInput and is reused record to record,
    // exactly the handle-reuse the seam exists for).
    def bmpBytes(w: Int, h: Int, seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (seed * 2654435761L + x * 7919 + y * 104729).toInt
          & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos),
        "JDK must ship a BMP writer")
      bos.toByteArray
    }
    // a function VAL, not a def: the codec's task closure references it,
    // and a lifted local def would drag the (non-serializable) spec
    // instance into the closure
    val pixelMd5: java.awt.image.BufferedImage => String = img => {
      val md = java.security.MessageDigest.getInstance("MD5")
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        md.update(Array[Byte]((p >> 16).toByte, (p >> 8).toByte, p.toByte))
      }
      md.digest().map("%02x".format(_)).mkString
    }
    val opens = spark.sparkContext.longAccumulator("imageio_opens")
    class ImageIoCodec extends Multimodal.MediaCodec {
      override def open(): Multimodal.MediaRecord => Multimodal.MediaFeatures = {
        opens.add(1)
        // per-partition decoder handle, REUSED across records
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("bmp").next()
        r => {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.bytes))
          try {
            reader.setInput(iis)
            val img = reader.read(0)
            Multimodal.MediaFeatures(r.doc_id, r.media_type,
              r.bytes.length.toLong, img.getWidth, img.getHeight,
              pixelMd5(img))
          } finally iis.close()
        }
      }
    }
    val dims = (0L until 24L).map(i =>
      i -> (4 + (i % 5).toInt, 3 + (i % 3).toInt))
    val media = dims.map { case (i, (w, h)) =>
      Multimodal.MediaRecord(i, "image/bmp", bmpBytes(w, h, i.toInt))
    }.toDS().repartition(4)
    val feats = Multimodal.decodeWith(media, new ImageIoCodec).collect()
    assert(feats.length === 24)
    assert(opens.value === 4L, "open() must run once per partition")
    // dimensions come from the REAL container header; pixel checksums must
    // match an independent driver-side ImageIO decode of the same payload
    val byId = feats.map(f => f.doc_id -> f).toMap
    dims.foreach { case (i, (w, h)) =>
      assert(byId(i).width === w && byId(i).height === h,
        s"doc $i decoded ${byId(i).width}x${byId(i).height}, authored ${w}x$h")
      val independent = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bmpBytes(w, h, i.toInt)))
      assert(byId(i).checksum === pixelMd5(independent),
        s"doc $i pixel digest must match an independent decode")
    }
  }

  test("frame sampling strides the payload deterministically") {
    val bytes = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.StubCodec.frameSample(bytes, 3).toSeq ===
      Seq[Byte](0, 3, 6, 9))
    assert(Multimodal.StubCodec.frameSample(bytes, 1).toSeq === bytes.toSeq)
    assert(Multimodal.StubCodec.frameSample(Array.emptyByteArray, 4).toSeq
      === Seq.empty)
  }

  test("frameSamples emits every stride-th window with exact digests") {
    val rows = Multimodal.frameSamples(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // stride 2: only even frame indexes; widths bounded by the frame size
    rows.foreach { r =>
      assert(r.getInt(1) % 2 === 0)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 256)
      assert(r.getString(3).length === 32)
    }
    // digest spot-check against an independent computation for one doc
    import spark.implicits._
    val (docId, text) = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").head() match {
        case row => (row.getLong(0), row.getString(1))
      }
    val frame0 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.substring(0, math.min(256, text.length)).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val got = rows.find(r => r.getLong(0) == docId && r.getInt(1) == 0).get
    assert(got.getString(3) === frame0)
  }

  test("fixture payloads honor the blockhash ASCII contract") {
    import org.apache.spark.sql.functions._
    // q83/q84's engine/oracle parity rests on Spark's byte-wise ascii()
    // agreeing with DuckDB's codepoint ord() — true exactly for ASCII.
    // A fixture regeneration that introduces non-ASCII text must fail
    // HERE, not as an unexplained oracle hash mismatch.
    val nonAscii = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull &&
        !col("text").rlike("^[\\x00-\\x7F]*$"))
      .count()
    assert(nonAscii === 0,
      s"$nonAscii documents carry non-ASCII text — the blockhash stub " +
        "signal (ascii vs ord) is no longer engine-stable for them")
  }

  test("blockhash matches a pure-Scala reference bit-for-bit on fixture docs") {
    import org.apache.spark.sql.functions._
    // differential guard for the one-pass (posexplode-over-split) rewrite:
    // the fingerprint definition lives HERE as straight-line Scala, so any
    // plan-level refactor of blockhashOf must stay bit-equal to it
    def reference(text: String, blocks: Int = 60): Long = {
      val n = text.length
      val sums = new Array[Long](blocks)
      var pos = 0
      while (pos < n) {
        sums((pos.toLong * blocks / n).toInt) += text.codePointAt(pos)
        pos += 1
      }
      val total = sums.sum
      sums.zipWithIndex.collect {
        case (s, blk) if blocks * s > total => 1L << blk
      }.sum
    }
    val docs = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .limit(20)
    val got = Multimodal.blockhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> reference(r.getString(1))).toMap
    assert(want.nonEmpty && got === want)
  }

  test("native blockhash kernel equals the relational formulation") {
    // the shipped path is the single-pass codegen kernel; the relational
    // chain stays as the oracle-documented reference — every fixture doc
    // must fingerprint identically through both
    val docs = Tables.documents(spark, sfDir)
    val native = Multimodal.blockhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rel = Multimodal.blockhashOfRelational(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native === rel)
  }

  test("blockhash is locality-preserving where a checksum is not") {
    import spark.implicits._
    // base payload: 60 blocks of 10 chars with a clear high/low structure
    val base = ("a" * 300) + ("Z" * 300)
    // one edited REGION (chars 0-29): only the first blocks' sums move
    val edited = ("z" * 30) + ("a" * 270) + ("Z" * 300)
    // a structurally different payload: alternating, flips most blocks
    val other = "aZ" * 300
    val docs = Seq((1L, base), (2L, edited), (3L, other),
      (4L, null.asInstanceOf[String]), (5L, "")).toDF("doc_id", "text")
    val fp = Multimodal.blockhashOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null/empty payloads carry no signal — excluded, like null vectors
    // from the LSH index
    assert(fp.keySet === Set(1L, 2L, 3L))
    def dist(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val near = dist(fp(1L), fp(2L))
    val far = dist(fp(1L), fp(3L))
    assert(near <= 3, s"regional edit must flip few blocks, flipped $near")
    assert(far > 10, s"different payload must flip many blocks, flipped $far")
    // the banded pair join surfaces exactly the near pair
    val pairs = graft.operators.Dedup
      .bandedHammingPairs(Multimodal.blockhashOf(docs), "phash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
    // maxDist beyond the pigeonhole-exact bound is rejected, not silent
    intercept[IllegalArgumentException] {
      graft.operators.Dedup
        .bandedHammingPairs(Multimodal.blockhashOf(docs), "phash", 4)
    }
  }

  test("scene cuts match a pure-Scala frame-hash reference") {
    import org.apache.spark.sql.functions._
    // straight-line reference: 128-char frames, blockhash per frame,
    // Hamming > 25 between consecutive frames = cut
    def frameHash(frame: String, blocks: Int = 60): Long = {
      val n = frame.length
      val sums = new Array[Long](blocks)
      var pos = 0
      while (pos < n) {
        sums((pos.toLong * blocks / n).toInt) += frame.codePointAt(pos)
        pos += 1
      }
      val total = sums.sum
      sums.zipWithIndex.collect {
        case (s, blk) if blocks * s > total => 1L << blk
      }.sum
    }
    def reference(text: String): (Long, Long, Long, Int) = {
      val hs = text.grouped(128).map(frameHash(_)).toSeq
      val dists = hs.zip(hs.drop(1))
        .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
      val cuts = dists.count(_ > 25).toLong
      (hs.size.toLong, cuts, cuts + 1, if (dists.isEmpty) 0 else dists.max)
    }
    val docs = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && length(col("text")) > 0).limit(20)
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Multimodal.sceneCuts(spark, sfDir).collect()
      .filter(r => ids.contains(r.getLong(0)))
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val want = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> reference(r.getString(1))).toMap
    assert(want.nonEmpty && got === want)
    // sanity: at least one doc has multiple frames so the lag is exercised
    assert(want.values.exists(_._1 > 1), "fixture docs should span frames")
  }

  test("media clusters cover every doc, keep one representative per cluster") {
    val clusters = Multimodal.blockhashClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val docs = Tables.documents(spark, sfDir).count()
    assert(clusters.size.toLong === docs, "one row per document")
    // exactly one keeper per cluster, and it is the smallest member
    clusters.groupBy(_._2._1).foreach { case (cl, members) =>
      val keepers = members.filter(_._2._2 == 1).keys.toSeq
      assert(keepers === Seq(cl) && cl === members.keys.min,
        s"cluster $cl: keeper must be the smallest member, got $keepers")
    }
    // every q84 pair lands in one cluster (the chain argument: pairwise
    // output alone can drop both ends of A~B~C)
    Multimodal.blockhashPairs(spark, sfDir).collect().foreach { r =>
      assert(clusters(r.getLong(0))._1 === clusters(r.getLong(1))._1)
    }
  }
}
