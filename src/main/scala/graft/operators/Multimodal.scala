package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11 / driver mandate): treat
  * image/audio payloads as opaque `binary` columns with typed metadata, and
  * run decode / feature-extraction as a partition-batched pipeline.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batch
  * iteration via `mapPartitions` over a typed Dataset — and so are the
  * codecs for BMP/WAV ([[MediaCodecs]]), PNG ([[PngCodec]]) and baseline
  * JPEG ([[JpegCodec]]), all pure-JVM byte implementations. Only formats
  * with a recorded out-of-scope decision (MP3 — see ARCHITECTURE) fall
  * back to [[decodeStub]], which derives a deterministic fake feature
  * vector from the payload bytes; swapping in a real decoder changes only
  * that function.
  *
  * 100 TB notes: payloads never enter a shuffle — `mapPartitions` keeps
  * decode local to the scan; only the (doc_id, small feature vector) output
  * moves. For real corpora store payloads in Parquet binary columns (or
  * pointers to object storage) and size `maxPartitionBytes` so one task's
  * batch of payloads fits executor memory.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // "image" | "audio"
      payload: Array[Byte],
      width: Int,      // image meta (0 for audio)
      height: Int,
      sample_rate: Int // audio meta (0 for image)
  )

  /** Extracted features: fixed-dim vector + provenance. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Double]
  )

  /** Synthesize a deterministic media table from the `documents` corpus:
    * payload = UTF-8 text bytes, metadata derived from a stable hash. This
    * stands in for a real binary-column source. */
  def synthesize(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, "image").otherwise("audio").as("media_type"),
      col("text").cast("binary").as("payload"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        (lit(64) + pmod(xxhash64(col("text")), lit(8)).cast("int") * 32)).otherwise(0).as("width"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        (lit(64) + pmod(xxhash64(col("text"), lit(1)), lit(8)).cast("int") * 32)).otherwise(0).as("height"),
      when(pmod(col("doc_id"), lit(2)) === 1, 16000).otherwise(0).as("sample_rate")
    )

  /** Synthesize a deterministic REAL-BMP corpus with PLANTED near-dup
    * groups (the image analogue of the text corpus's repeated documents,
    * and the mm2 recipe extended): docs form groups of 4 (`group =
    * doc_id / 4`); member 0 is the base 16×16 image — pixel byte k (in
    * storage order; 16-wide rows need no padding, so file byte 54+k IS
    * pixel byte k, making the whole image SQL-replayable) is
    * `(md5Byte(group, cell) + k·11) mod 256` — the per-(group, cell)
    * md5-derived base gives proper avalanche, so DISTINCT groups differ
    * in ~half their aHash bits (a linear-congruential base collapsed
    * many groups onto identical hashes → quadratic pair blowup; measured
    * 658k pairs at sf0.1 vs ~6k planted) — and members 1-3 perturb ONE
    * 2×2 cell each (+120 mod 256 on that cell's bytes), so group members
    * are perceptually near-identical (few aHash bits differ). Payloads
    * are genuine 24-bit BMPs through [[MediaCodecs.encodeBmp]]; the
    * near-dup query decodes them back through the real parser. */
  def synthesizeBmpNearDups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val group = id / 4
        val member = (id % 4).toInt
        val cellBase = Array.tabulate(64)(c =>
          md.digest(s"$group:$c".getBytes("UTF-8"))(0) & 0xff)
        val bytes = MediaCodecs.encodeBmp(16, 16, { k =>
          val r = k / 48; val x = (k % 48) / 3
          val cell = (r / 2) * 8 + (x / 2)
          val base = (cellBase(cell) + k * 11) % 256
          if (member > 0 && cell == member - 1) (base + 120) % 256 else base
        })
        (id, bytes)
      }
    }.toDF("doc_id", "payload")
  }

  /** The PNG sibling of [[synthesizeBmpNearDups]] (r15): the SAME
    * pixel recipe — groups of 4, per-(group, cell) md5 base bytes,
    * members 1-3 perturbing one 2×2 cell by +120 — but the 16×16 image
    * is carried as a REAL 8-bit truecolor PNG ([[PngCodec.encode]])
    * with the per-row filter type CYCLING through all five spec
    * filters (`row % 5`), so a near-dup pass over this corpus decodes
    * through DEFLATE and every unfilter path. Pixel byte k here is in
    * R,G,B row-major order (PNG's layout; the BMP twin's B,G,R
    * bottom-up layout differs, but the aHash cell-sum rule is
    * channel-order- and row-order-insensitive over the same bytes, so
    * the planted structure is preserved identically). */
  def synthesizePngNearDups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val group = id / 4
        val member = (id % 4).toInt
        val cellBase = Array.tabulate(64)(c =>
          md.digest(s"$group:$c".getBytes("UTF-8"))(0) & 0xff)
        val rgb = Array.tabulate(16 * 16 * 3) { k =>
          val r = k / 48; val x = (k % 48) / 3
          val cell = (r / 2) * 8 + (x / 2)
          val base = (cellBase(cell) + k * 11) % 256
          val v = if (member > 0 && cell == member - 1) (base + 120) % 256 else base
          v.toByte
        }
        (id, PngCodec.encode(16, 16, rgb, row => row % 5))
      }
    }.toDF("doc_id", "payload")
  }

  /** The JPEG sibling of [[synthesizeBmpNearDups]] (r16): the SAME
    * pixel recipe — groups of 4, per-(group, cell) md5 base bytes,
    * members 1-3 perturbing one 2×2 cell by +120 — carried as a REAL
    * baseline JPEG ([[JpegCodec.encode]], quality 90, 4:4:4). JPEG is
    * LOSSY, so unlike the BMP/PNG twins the decoded pixels differ from
    * the formula by quantization error — but the aHash cell-sum rule
    * thresholds against the image average, which quantization barely
    * moves, so the planted near-dup structure survives the round-trip
    * (spec-verified: the same groups pair under the same Hamming
    * radius as the lossless twins). */
  def synthesizeJpegNearDups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val group = id / 4
        val member = (id % 4).toInt
        val cellBase = Array.tabulate(64)(c =>
          md.digest(s"$group:$c".getBytes("UTF-8"))(0) & 0xff)
        val rgb = Array.tabulate(16 * 16 * 3) { k =>
          val r = k / 48; val x = (k % 48) / 3
          val cell = (r / 2) * 8 + (x / 2)
          val base = (cellBase(cell) + k * 11) % 256
          val v = if (member > 0 && cell == member - 1) (base + 120) % 256 else base
          v.toByte
        }
        (id, JpegCodec.encode(16, 16, rgb, quality = 90))
      }
    }.toDF("doc_id", "payload")
  }

  /** The audio sibling of [[synthesizeBmpNearDups]]: deterministic REAL
    * PCM16 WAVs with planted near-dup groups of 4 — 256 mono samples in
    * 64 energy windows of 4; window base amplitude is the per-(group,
    * window) md5 byte (`s(k) = b_w·8 − 1024 + (k mod 4)·64`, avalanche
    * across groups), members 1-3 shift ONE window's samples by +400.
    * Payloads round-trip [[MediaCodecs.encodeWavPcm16]]/decode. */
  def synthesizeWavNearDups(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select("doc_id").as[Long].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val group = id / 4
        val member = (id % 4).toInt
        val winBase = Array.tabulate(64)(w =>
          md.digest(s"$group:$w".getBytes("UTF-8"))(0) & 0xff)
        val samples = Array.tabulate(256) { k =>
          val w = k / 4
          val s = winBase(w) * 8 - 1024 + (k % 4) * 64 +
            (if (member > 0 && w == member - 1) 400 else 0)
          s.toShort
        }
        (id, MediaCodecs.encodeWavPcm16(16000, samples))
      }
    }.toDF("doc_id", "payload")
  }

  /** STUB decoder — deterministic fake standing in for image decode /
    * audio resample / frame sampling. Real implementation would decode
    * `payload` with a codec library; the fake emits the byte-value histogram
    * folded to `dim` buckets, normalized — stable across engines and runs. */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Double] = {
    val counts = new Array[Double](dim)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) % dim) += 1.0
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < dim) { counts(j) = counts(j) / payload.length; j += 1 }
    }
    counts
  }

  /** STUB resize — a real implementation decodes, scales, re-encodes; the
    * fake deterministically samples the payload down to a byte budget
    * proportional to the target area, keeping metadata consistent. The
    * Spark-side contract (binary in → binary out + updated meta, executed
    * partition-locally) is the real part. */
  def resizeStub(payload: Array[Byte], w: Int, h: Int, targetW: Int, targetH: Int): Array[Byte] = {
    if (payload.isEmpty || w <= 0 || h <= 0) return payload
    val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h))
    val n = math.max(1, (payload.length * ratio).toInt)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = payload((i.toLong * payload.length / n).toInt); i += 1 }
    out
  }

  /** STUB frame sampling — a real implementation demuxes and decodes every
    * Nth frame; the fake slices the payload into `frameSize`-byte pseudo
    * frames and keeps every Nth. Returns the sampled "frames". */
  def sampleFramesStub(payload: Array[Byte], frameSize: Int, everyNth: Int): Seq[Array[Byte]] = {
    require(frameSize > 0 && everyNth > 0)
    payload.grouped(frameSize).zipWithIndex
      .collect { case (frame, idx) if idx % everyNth == 0 => frame }
      .toSeq
  }

  /** Partition-local resize pass over a media DataFrame: image payloads
    * that decode as 24-bit BMP, 8-bit truecolor PNG, or baseline JPEG
    * are resized to `targetW`×`targetH` with the REAL nearest-neighbor
    * codecs ([[MediaCodecs.resizeBmpNearest]] / [[PngCodec
    * .resizeNearest]] / [[JpegCodec.resizeNearest]] — identical floor
    * mapping, so the formats' resizes agree on pixel addressing);
    * undecodable image payloads fall back to the stub; audio passes
    * through. Payloads stay inside the partition — no shuffle. */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        if (r.media_type == "image")
          MediaCodecs.resizeBmpNearest(r.payload, targetW, targetH)
            .orElse(PngCodec.resizeNearest(r.payload, targetW, targetH))
            .orElse(JpegCodec.resizeNearest(r.payload, targetW, targetH)) match {
            case Some(resized) =>
              r.copy(payload = resized, width = targetW, height = targetH)
            case None =>
              r.copy(payload = resizeStub(r.payload, r.width, r.height, targetW, targetH),
                width = math.min(r.width, targetW), height = math.min(r.height, targetH))
          }
        else r
      }
    }.toDF()
  }

  /** Partition-local audio frame sampling + feature extraction: every
    * `everyNth`-th full `frameSamples`-sample frame of each mono PCM16
    * WAV payload yields one (doc_id, frame_idx, energy) row via the REAL
    * codec ([[MediaCodecs.wavFrameEnergies]]); non-audio and
    * non-decodable rows yield nothing (per-row barrier, like the DNS
    * parser). The fan-out is frames-per-doc, payloads never shuffle. */
  def frameFeatures(spark: SparkSession, media: DataFrame,
      frameSamples: Int, everyNth: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        if (r.media_type != "audio") Iterator.empty
        else MediaCodecs.wavFrameEnergies(r.payload, frameSamples, everyNth)
          .iterator.flatten.map { case (f, e) => (r.doc_id, f, e) }
      }
    }.toDF("doc_id", "frame_idx", "energy")
  }

  /** Batch feature extraction: typed `mapPartitions` so a real decoder can
    * amortize per-partition setup (codec contexts, model weights) across the
    * whole batch — the Spark-side analogue of a batched Pandas UDF. */
  def features(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    ds.mapPartitions { it =>
      // per-partition setup would go here (open codec context once)
      it.map { r =>
        val f = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong, f)
      }
    }.toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        // pround, not round: the one remaining value surface must stay
        // oracle-safe if a DuckDB check is ever added (round() boundary
        // rounding diverges between engines)
        graft.functions.pround6(element_at(col("feature"), 1)).as("f0"),
        graft.functions.pround6(element_at(col("feature"), 2)).as("f1"),
        graft.functions.pround6(element_at(col("feature"), 3)).as("f2"))
  }
}
