package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The pure-JVM baseline JPEG codec (r16, VERDICT r15 task 1):
  * round-trips within quantization tolerance, CROSS-VALIDATION against
  * the JDK's own independent JPEG implementation (`javax.imageio` —
  * reads our bytes, writes bytes we read, so a complementary
  * encode/decode bug cannot cancel), restart-marker segmentation,
  * malformed/out-of-scope refusals, and the near-dup family over JPEG
  * payloads. JPEG is LOSSY, so unlike the PNG spec the assertions are
  * banded — but the bands are tight (max per-pixel error of a few gray
  * levels on smooth images) and every decode is deterministic. */
class JpegCodecSpec extends SparkTestBase {
  import spark.implicits._

  /** Smooth gradient (no value wraps): JPEG error on smooth content is
    * a few gray levels; white-noise pixels would ring far wider. */
  private def gradient(w: Int, h: Int, seed: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (16 + (seed % 16) + x * 4 + y * 2).toByte
      rgb(o + 1) = (32 + (seed % 8) + x * 2 + y * 4).toByte
      rgb(o + 2) = (64 + (seed % 32) + x + y * 3).toByte
    }
    rgb
  }

  private def diffStats(a: Array[Byte], b: Array[Byte]): (Int, Double) = {
    require(a.length == b.length)
    var mx = 0; var sum = 0L
    var i = 0
    while (i < a.length) {
      val d = math.abs((a(i) & 0xff) - (b(i) & 0xff))
      if (d > mx) mx = d
      sum += d
      i += 1
    }
    (mx, sum.toDouble / a.length)
  }

  private def iioDecodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio rejected the bytes")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      rgb(o) = ((p >> 16) & 0xff).toByte
      rgb(o + 1) = ((p >> 8) & 0xff).toByte
      rgb(o + 2) = (p & 0xff).toByte
    }
    (w, h, rgb)
  }

  private def iioEncode(w: Int, h: Int, rgb: Array[Byte], q: Float,
      progressive: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose()
    bos.toByteArray
  }

  test("round-trip within quantization tolerance: 4:4:4 and 4:2:0 across qualities, odd dims") {
    val w = 37; val h = 29 // odd: edge blocks pad by replication
    val rgb = gradient(w, h, 3)
    for (ss <- Seq(false, true); q <- Seq(75, 90, 98)) {
      val enc = JpegCodec.encode(w, h, rgb, q, ss)
      val dec = JpegCodec.decode(enc)
      assert(dec.isDefined, s"ss=$ss q=$q failed to decode")
      assert(dec.get.width === w && dec.get.height === h)
      val (mx, avg) = diffStats(dec.get.rgb, rgb)
      // measured: max 7 / avg 1.25 at the loosest setting (q75 4:2:0)
      assert(mx <= 12 && avg <= 2.5, s"ss=$ss q=$q error ($mx, $avg)")
      // higher quality must not be (meaningfully) worse
      assert(enc.length > 0)
    }
    // quality ordering: q98 bytes are larger and closer than q75
    val lo = JpegCodec.encode(w, h, rgb, 75)
    val hi = JpegCodec.encode(w, h, rgb, 98)
    assert(hi.length > lo.length)
    assert(diffStats(JpegCodec.decode(hi).get.rgb, rgb)._2 <=
      diffStats(JpegCodec.decode(lo).get.rgb, rgb)._2)
    // 1x1 and tiny images
    val one = Array[Byte](200.toByte, 30, 90)
    val od = JpegCodec.decode(JpegCodec.encode(1, 1, one, 95)).get
    assert(od.width === 1 && od.height === 1)
    assert(diffStats(od.rgb, one)._1 <= 12)
  }

  test("cross-validation against javax.imageio: the JDK reads our bytes, we read the JDK's") {
    val w = 37; val h = 29
    val rgb = gradient(w, h, 7)
    // our encoder -> JDK decoder: the JDK must see (nearly) the pixels
    // we decoded ourselves — agreement within IDCT/upsampling rounding
    // (measured max 3), far tighter than the lossy budget, so a
    // complementary encode/decode bug cannot hide
    for (ss <- Seq(false, true); q <- Seq(75, 95)) {
      val enc = JpegCodec.encode(w, h, rgb, q, ss)
      val ours = JpegCodec.decode(enc).get
      val (iw, ih, theirs) = iioDecodeRgb(enc)
      assert(iw === w && ih === h)
      val (mx, avg) = diffStats(ours.rgb, theirs)
      assert(mx <= 6 && avg <= 1.5, s"ss=$ss q=$q decoder disagreement ($mx, $avg)")
    }
    // JDK encoder -> our decoder: ImageIO writes 4:2:0 (2x2,1x1,1x1) at
    // every quality (probed), so this exercises the subsampled upsample
    // path against an independent implementation
    for (q <- Seq(0.75f, 0.95f)) {
      val enc = iioEncode(w, h, rgb, q)
      val ours = JpegCodec.decode(enc)
      assert(ours.isDefined, s"our decoder rejected imageio q=$q bytes")
      assert(ours.get.width === w && ours.get.height === h)
      val (_, _, theirs) = iioDecodeRgb(enc)
      val (mx, avg) = diffStats(ours.get.rgb, theirs)
      assert(mx <= 6 && avg <= 1.5, s"q=$q decoder disagreement ($mx, $avg)")
    }
    // grayscale (1-component) JPEG: compare on the RAW raster —
    // BufferedImage.getRGB would push gray through an sRGB gamma map
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, 30 + ((x * 5 + y * 3) % 200))
    val gbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "jpeg", gbos))
    val gdec = JpegCodec.decode(gbos.toByteArray)
    assert(gdec.isDefined, "grayscale jpeg rejected")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(gbos.toByteArray))
    var gmx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val ours = gdec.get.rgb(o) & 0xff
      assert((gdec.get.rgb(o + 1) & 0xff) === ours, "gray must replicate Y")
      gmx = math.max(gmx, math.abs(ours - back.getRaster.getSample(x, y, 0)))
    }
    assert(gmx <= 1, s"grayscale decoder disagreement $gmx")
  }

  test("restart markers: DRI segmentation decodes identically and interoperates") {
    val w = 43; val h = 21 // 6x3 MCUs at 4:4:4
    val rgb = gradient(w, h, 11)
    val plain = JpegCodec.decode(JpegCodec.encode(w, h, rgb, 90)).get
    for (ri <- Seq(1, 2, 5)) {
      val enc = JpegCodec.encode(w, h, rgb, 90, subsample420 = false,
        restartInterval = ri)
      // restart markers change the bit stream, not the coefficients:
      // decoded pixels are byte-identical to the restartless encode
      val dec = JpegCodec.decode(enc)
      assert(dec.isDefined, s"ri=$ri rejected")
      assert(dec.get.rgb.sameElements(plain.rgb), s"ri=$ri pixels diverge")
      // and the JDK agrees the segmented stream is valid
      val (iw, ih, theirs) = iioDecodeRgb(enc)
      assert(iw === w && ih === h)
      assert(diffStats(dec.get.rgb, theirs)._1 <= 6)
    }
    // 4:2:0 with restarts too
    val enc420 = JpegCodec.encode(w, h, rgb, 90, subsample420 = true,
      restartInterval = 2)
    val plain420 = JpegCodec.decode(JpegCodec.encode(w, h, rgb, 90,
      subsample420 = true)).get
    assert(JpegCodec.decode(enc420).get.rgb.sameElements(plain420.rgb))
  }

  test("malformed and out-of-scope refusals: None, never garbage or a hang") {
    val good = JpegCodec.encode(16, 16, gradient(16, 16, 5), 90)
    assert(JpegCodec.decode(good).isDefined)
    // truncation at every structural prefix must refuse, never throw
    Seq(0, 1, 2, 4, 20, 100, good.length - 3).foreach { n =>
      assert(JpegCodec.decode(good.take(n)).isEmpty, s"truncation at $n")
    }
    assert(JpegCodec.decode("notajpeg".getBytes).isEmpty)
    assert(JpegCodec.decode(Array.fill[Byte](64)(0xff.toByte)).isEmpty)
    // progressive (SOF2) is out of scope: None, not garbage pixels
    val prog = iioEncode(24, 16, gradient(24, 16, 9), 0.9f, progressive = true)
    assert(prog.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) >= 0,
      "imageio progressive must carry SOF2 for this refusal test to bite")
    assert(JpegCodec.decode(prog).isEmpty, "progressive stream accepted")
    // encoder input contract
    intercept[IllegalArgumentException] { JpegCodec.encode(2, 2, new Array[Byte](5)) }
    intercept[IllegalArgumentException] {
      JpegCodec.encode(2, 2, new Array[Byte](12), quality = 0)
    }
    // quality scaling is the public IJG rule, pinned
    assert(JpegCodec.scaledQuant(Array.fill(64)(16), 50).forall(_ === 16))
    assert(JpegCodec.scaledQuant(Array.fill(64)(16), 100).forall(_ === 1))
    assert(JpegCodec.scaledQuant(Array.fill(64)(16), 25).forall(_ === 32))
  }

  test("JPEG payloads join the image near-dup family: planted groups pair, formats dispatch") {
    // the x46 recipe over REAL lossy JPEG bytes — the format-dispatched
    // MediaCodecs.aHash64 routes FFD8 payloads to JpegCodec, so
    // Dedup.imageNearDupPairs needs no format flag; quantization noise
    // must not break the planted structure (cell sums move by ~±24 of
    // md5-avalanche magnitudes)
    val docs = spark.range(0, 80).select(col("id").as("doc_id"), lit("t").as("text"))
    val pairs = Dedup.imageNearDupPairs(
      Multimodal.synthesizeJpegNearDups(docs), maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty, "planted JPEG near-dups must pair")
    assert(pairs.forall(p => p._1 / 4 == p._2 / 4), "cross-group collision")
    // every member pairs with its base (cells differ by one 2x2 block)
    val withBase = pairs.filter(p => p._1 % 4 == 0).map(_._2 % 4).toSet
    assert(withBase === Set(1L, 2L, 3L))
    // decodeMeans: the e6 means of the lossy decode sit within a tight
    // band of the formula means (the mm5 oracle's device)
    val rgb = gradient(16, 16, 13)
    val sums = new Array[Long](3)
    rgb.indices.foreach(i => sums(i % 3) += rgb(i) & 0xff)
    val formula = sums.map(_ * 1000000L / 256)
    val (dw, dh, means) = JpegCodec.decodeMeans(
      JpegCodec.encode(16, 16, rgb, 90)).get
    assert(dw === 16 && dh === 16)
    (0 until 3).foreach { c =>
      assert(math.abs(means(c) - formula(c)) <= 2000000L,
        s"channel $c mean ${means(c)} vs formula ${formula(c)}")
    }
    // resize dispatches per-payload format inside one partition pass
    val media = Multimodal.synthesizeJpegNearDups(docs.limit(4))
      .select(col("doc_id"), lit("image").as("media_type"), col("payload"),
        lit(16).as("width"), lit(16).as("height"), lit(0).as("sample_rate"))
    val rs = Multimodal.resize(spark, media, 8, 8)
      .select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)].collect()
    assert(rs.forall(r => r._3 == 8 && r._4 == 8))
    assert(rs.forall(r => JpegCodec.decode(r._2).exists(i => i.width == 8 && i.height == 8)),
      "resized payloads must be real 8x8 JPEGs")
  }
}
