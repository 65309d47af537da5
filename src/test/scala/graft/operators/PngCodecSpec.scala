package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The pure-JVM PNG codec (r15): byte-exact round-trips through every
  * filter type, CROSS-VALIDATION against the JDK's own independent PNG
  * implementation (`javax.imageio` — reads our bytes, writes bytes we
  * read, so a complementary encode/decode bug cannot cancel), malformed
  * refusals, and the near-dup family over PNG payloads. */
class PngCodecSpec extends SparkTestBase {
  import spark.implicits._

  private def pixels(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h * 3)(k => ((seed * 31 + k * 7) % 256).toByte)

  test("round-trip is byte-exact under each of the five filter types and a cycling mix") {
    val w = 13; val h = 9 // odd sizes: no power-of-two crutches
    val rgb = pixels(w, h, 5L)
    (0 to 4).foreach { ft =>
      val enc = PngCodec.encode(w, h, rgb, _ => ft)
      val dec = PngCodec.decode(enc)
      assert(dec.isDefined, s"filter $ft failed to decode")
      assert(dec.get.width === w && dec.get.height === h)
      assert(dec.get.rgb.sameElements(rgb), s"filter $ft not byte-exact")
    }
    val mixed = PngCodec.encode(w, h, rgb, row => row % 5)
    assert(PngCodec.decode(mixed).get.rgb.sameElements(rgb))
    // 1×1 edge (no left/up neighbors anywhere)
    val one = Array[Byte](10, 200.toByte, 30)
    (0 to 4).foreach { ft =>
      assert(PngCodec.decode(PngCodec.encode(1, 1, one, _ => ft))
        .get.rgb.sameElements(one))
    }
  }

  test("cross-validation against javax.imageio: the JDK reads our bytes, we read the JDK's") {
    val w = 20; val h = 11
    val rgb = pixels(w, h, 9L)
    // our encoder -> JDK decoder (per filter type: proves the container,
    // zlib framing, AND each filter's on-disk math against an
    // independent implementation)
    (0 to 4).foreach { ft =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(PngCodec.encode(w, h, rgb, _ => ft)))
      assert(img != null, s"imageio rejected filter-$ft bytes")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val px = img.getRGB(x, y)
        val k = (y * w + x) * 3
        assert(((px >> 16) & 0xff) === (rgb(k) & 0xff), s"R ($x,$y) ft=$ft")
        assert(((px >> 8) & 0xff) === (rgb(k + 1) & 0xff), s"G ($x,$y) ft=$ft")
        assert((px & 0xff) === (rgb(k + 2) & 0xff), s"B ($x,$y) ft=$ft")
      }
    }
    // JDK encoder -> our decoder
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * w + x) * 3
      bi.setRGB(x, y, ((rgb(k) & 0xff) << 16) | ((rgb(k + 1) & 0xff) << 8) |
        (rgb(k + 2) & 0xff))
    }
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", buf))
    val dec = PngCodec.decode(buf.toByteArray)
    assert(dec.isDefined, "our decoder rejected imageio's bytes")
    assert(dec.get.width === w && dec.get.height === h)
    assert(dec.get.rgb.sameElements(rgb))
  }

  test("malformed refusals: corrupt CRC, truncated stream, trailing zlib bytes, unsupported shapes") {
    val good = PngCodec.encode(6, 4, pixels(6, 4, 3L), row => row % 5)
    assert(PngCodec.decode(good).isDefined)
    // flip a byte inside IDAT: the chunk CRC must catch it
    val crcBad = good.clone()
    crcBad(good.length / 2) = (crcBad(good.length / 2) ^ 0x40).toByte
    assert(PngCodec.decode(crcBad).isEmpty, "corrupted chunk passed CRC")
    // truncation at every prefix must refuse, never throw
    Seq(4, 8, 20, 33, good.length - 5).foreach { n =>
      assert(PngCodec.decode(good.take(n)).isEmpty, s"truncation at $n")
    }
    assert(PngCodec.decode("notapng".getBytes).isEmpty)
    // a pixel stream longer than the scanlines is malformed: rebuild
    // the IDAT with one extra raw byte (valid CRC, valid zlib)
    val ihdrEnd = 8 + 12 + 13
    val idatLen = java.nio.ByteBuffer.wrap(good, ihdrEnd, 4).getInt
    val stride = 6 * 3
    val rawLong = new Array[Byte]((stride + 1) * 4 + 1) // filters 0, one junk byte
    val d = new java.util.zip.Deflater(); d.setInput(rawLong); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](256)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, ihdrEnd) // signature + IHDR
    val z = zbuf.toByteArray
    out.write(java.nio.ByteBuffer.allocate(4).putInt(z.length).array())
    out.write("IDAT".getBytes("US-ASCII")); out.write(z)
    val crc = new java.util.zip.CRC32()
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(z)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    out.write(good, ihdrEnd + 12 + idatLen, good.length - ihdrEnd - 12 - idatLen)
    assert(PngCodec.decode(out.toByteArray).isEmpty, "oversized pixel stream accepted")
    // encoder input contract
    intercept[IllegalArgumentException] { PngCodec.encode(2, 2, new Array[Byte](5)) }
    intercept[IllegalArgumentException] { PngCodec.encode(2, 2, new Array[Byte](12), _ => 9) }

    def rechunk(png: Array[Byte], patch: (Array[Byte], Int) => Unit): Array[Byte] = {
      // patch a byte inside the IHDR data and RE-SIGN its CRC, so the
      // decoder's semantic checks (not the CRC) are what refuses
      val out = png.clone()
      patch(out, 16) // IHDR data starts at 8 (sig) + 4 (len) + 4 (type)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 12, 4 + 13)
      java.nio.ByteBuffer.wrap(out, 29, 4).putInt(crc.getValue.toInt)
      out
    }
    // nonzero compression METHOD (IHDR data offset 10) and filter
    // METHOD (offset 11) are out of scope: None, not garbage pixels
    assert(PngCodec.decode(rechunk(good, (b, d) => b(d + 10) = 7)).isEmpty,
      "nonzero compression method accepted")
    assert(PngCodec.decode(rechunk(good, (b, d) => b(d + 11) = 1)).isEmpty,
      "nonzero filter method accepted")

    // an FDICT zlib stream (preset dictionary — forbidden in PNG) must
    // refuse, NEVER hang: Inflater reports needsDictionary with 0 bytes
    // of progress forever
    val fdict = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(good, 0, ihdrEnd) // signature + IHDR
      val z = Array[Byte](0x78, 0xf9.toByte, 1, 2, 3, 4, 5, 6) // FDICT set, header mod-31 valid
      out.write(java.nio.ByteBuffer.allocate(4).putInt(z.length).array())
      out.write("IDAT".getBytes("US-ASCII")); out.write(z)
      val crc2 = new java.util.zip.CRC32()
      crc2.update("IDAT".getBytes("US-ASCII")); crc2.update(z)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc2.getValue.toInt).array())
      out.write(good, ihdrEnd + 12 + idatLen, good.length - ihdrEnd - 12 - idatLen)
      out.toByteArray
    }
    val t0 = System.nanoTime()
    assert(PngCodec.decode(fdict).isEmpty, "FDICT stream accepted")
    assert((System.nanoTime() - t0) / 1e9 < 5, "FDICT decode must not spin")
  }

  test("PNG resize agrees pixelwise with the BMP resize's floor mapping") {
    val w = 10; val h = 7
    val rgb = pixels(w, h, 11L)
    val resized = PngCodec.resizeNearest(PngCodec.encode(w, h, rgb, _ => 4), 5, 3)
    assert(resized.isDefined)
    val dec = PngCodec.decode(resized.get).get
    assert(dec.width === 5 && dec.height === 3)
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3) {
      val sy = y * h / 3; val sx = x * w / 5
      assert((dec.rgb((y * 5 + x) * 3 + c) & 0xff) ===
        (rgb((sy * w + sx) * 3 + c) & 0xff), s"($x,$y,$c)")
    }
    assert(PngCodec.resizeNearest("junk".getBytes, 2, 2).isEmpty)
    assert(PngCodec.resizeNearest(PngCodec.encode(w, h, rgb), 0, 2).isEmpty)
  }

  test("PNG payloads join the image near-dup family: planted groups pair, formats dispatch") {
    // the x46 recipe over REAL PNG bytes with cycling filters — the
    // format-dispatched MediaCodecs.aHash64 routes them to PngCodec, so
    // Dedup.imageNearDupPairs needs no format flag
    val docs = spark.range(0, 80).select(col("id").as("doc_id"), lit("t").as("text"))
    val pairs = Dedup.imageNearDupPairs(
      Multimodal.synthesizePngNearDups(docs), maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty, "planted PNG near-dups must pair")
    assert(pairs.forall(p => p._1 / 4 == p._2 / 4), "cross-group collision")
    // every member pairs with its base (cells differ by one 2x2 block)
    val withBase = pairs.filter(p => p._1 % 4 == 0).map(_._2 % 4).toSet
    assert(withBase === Set(1L, 2L, 3L))
    // BMP and PNG twins of the SAME planted corpus find the same pair set
    val bmpPairs = Dedup.imageNearDupPairs(
      Multimodal.synthesizeBmpNearDups(docs), maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === bmpPairs.map(p => (p._1, p._2)).toSet)
    // resize dispatches per-payload format inside one partition pass
    val media = Multimodal.synthesizePngNearDups(docs.limit(4))
      .select(col("doc_id"), lit("image").as("media_type"), col("payload"),
        lit(16).as("width"), lit(16).as("height"), lit(0).as("sample_rate"))
    val rs = Multimodal.resize(spark, media, 8, 8)
      .select("doc_id", "payload", "width", "height")
      .as[(Long, Array[Byte], Int, Int)].collect()
    assert(rs.forall(r => r._3 == 8 && r._4 == 8))
    assert(rs.forall(r => PngCodec.decode(r._2).exists(i => i.width == 8 && i.height == 8)),
      "resized payloads must be real 8x8 PNGs")
  }
}
