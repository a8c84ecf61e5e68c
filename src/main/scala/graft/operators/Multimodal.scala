package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with
  * typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * What is REAL: the Spark-side plumbing (schema, format sniffing,
  * partition-friendly batched decode shape, output contracts), pixel
  * decode for PNG/GIF/JPEG/BMP/TIFF (`javax.imageio`), WAV/PCM sample
  * decode (`javax.sound.sampled`), and the MP4 frame demux
  * ([[Mp4.frameIndex]] — sample-table walk, no codec needed). What
  * stays STUBBED, with a deterministic fake and a documented swap-in
  * point: decoding VIDEO frames / compressed audio to raw signal —
  * the stock JRE ships no codec for those.
  */
object Multimodal {

  /** Canonical media row schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Magic-byte format sniffing over the first bytes — pure built-ins
    * (hex compare), runs in the scan stage.
    */
  def detectFormat(media: Column): Column = {
    val head8 = lower(hex(substring(media, 1, 8)))
    when(head8.startsWith("ffd8ff"), "jpeg")
      .when(head8.startsWith("89504e47"), "png")
      .when(head8.startsWith("474946"), "gif")
      .when(head8.startsWith("52494646"), "riff")
      .when(substring(head8, 9, 8) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Attach sniffed metadata to raw (media_id, media) rows. Width /
    * height / duration are parsed straight from the container header
    * ([[graft.functions.MediaOps]] — PNG IHDR, GIF screen size, JPEG
    * SOFn, WAV byte-rate); NULL when the container is unrecognized.
    * Pixel/sample decode stays stubbed ([[fakeDecodeFeatures]]) —
    * header geometry needs no codec.
    */
  def withMeta(df: DataFrame, mediaCol: String = "media"): DataFrame =
    df.withColumn("__dims",
        graft.functions.MediaDims.media_dims(col(mediaCol)))
      .withColumn("meta", struct(
        detectFormat(col(mediaCol)).as("format"),
        length(col(mediaCol)).cast(LongType).as("n_bytes"),
        col("__dims.width").as("width"),
        col("__dims.height").as("height"),
        col("__dims.duration_ms").as("duration_ms")))
      .drop("__dims")

  /** Feature extraction with the production batch shape: partition-
    * local iteration, one float vector per row, fixed dimension.
    *
    * PNG, GIF, JPEG, BMP and TIFF payloads are REALLY decoded —
    * `javax.imageio` ships all five codecs in the stock JRE — into a
    * normalized luminance histogram over actual pixels. Every other
    * format (and any payload ImageIO rejects) falls back to the
    * deterministic byte-histogram stub, so the operator keeps total
    * coverage; WAV/PCM audio likewise decodes for real through
    * `javax.sound.sampled` ([[audioFeatures]]), leaving only video
    * and compressed audio stubbed. A production
    * deployment replaces `decodeFeatures`'s fallback with codec +
    * model calls batched per partition — the mapPartitions shape
    * (amortized per-partition decoder init, streaming iterator, no
    * driver collect) is exactly what a GPU/codec UDF needs.
    */
  def extractFeatures(df: DataFrame, mediaCol: String = "media",
      idCol: String = "media_id", dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize decoder/model ONCE per partition here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaPos)
        Row(r.getLong(idPos),
          if (bytes == null) null else decodeFeatures(bytes, dim))
      }
    }
  }

  /** Magic-byte check for the formats the stock JRE ImageIO decodes:
    * PNG, GIF, JPEG, BMP, TIFF (both byte orders).
    */
  private def isImageIoImage(b: Array[Byte]): Boolean =
    b.length >= 4 &&
      (((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
        ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
          (b(2) & 0xff) == 0xff) ||
        (b(0) == 'B' && b(1) == 'M') ||
        (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2a && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2a))

  /** RIFF/WAVE magic-byte check (the javax.sound-decodable subset). */
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** Dispatch: real pixel/sample decode where the JRE has a codec,
    * stub elsewhere (and whenever the codec rejects a malformed
    * payload).
    */
  private[operators] def decodeFeatures(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    val real =
      if (isImageIoImage(bytes)) imageFeatures(bytes, dim)
      else if (isWav(bytes)) audioFeatures(bytes, dim)
      else None
    real.getOrElse(fakeDecodeFeatures(bytes, dim))
  }

  /** Real audio decode (WAV — IMA-ADPCM through the pure-JVM
    * [[Adpcm]] state machine, PCM/U-law/A-law through
    * `javax.sound.sampled`): normalized `dim`-bin amplitude histogram
    * over the decoded 16-bit samples, so the features are a function
    * of the SIGNAL, not the container's sample width, endianness, or
    * compression.
    */
  private[operators] def audioFeatures(bytes: Array[Byte],
      dim: Int): Option[Array[Float]] =
    decodeSamples(bytes).collect { case (_, samples) if samples.nonEmpty =>
      val hist = new Array[Float](dim)
      var i = 0
      while (i < samples.length) {
        hist((samples(i) + 32768) * dim / 65536) += 1f
        i += 1
      }
      hist.map(_ / samples.length.toFloat)
    }

  /** Blob → (sample rate, 16-bit signed samples). IMA-ADPCM first —
    * the stock JRE has no codec for WAVE format tag 17 — then the
    * `javax.sound.sampled` path for everything it does ship
    * (PCM/U-law/A-law). None when neither decodes; output bounded at
    * [[Adpcm.MaxSamples]] on both paths.
    */
  private[operators] def decodeSamples(
      bytes: Array[Byte]): Option[(Int, Array[Short])] =
    if (bytes == null) None
    else Adpcm.decode(bytes).map(d => (d.sampleRate, d.samples))
      .orElse(pcmSamples(bytes))

  private def pcmSamples(bytes: Array[Byte]): Option[(Int, Array[Short])] =
    try {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val src = in.getFormat
      // header sanity BEFORE conversion — a crafted channel count
      // (WAV stores it as uint16, so up to 65535) both blows up the
      // frame size and makes the converted stream return 0-byte
      // reads below
      if (src.getChannels < 1 || src.getChannels > 8) return None
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      // manual read loop, NOT readNBytes/readAllBytes: when a
      // corrupted header claims a frame size larger than the read
      // buffer, AudioInputStream.read returns 0 (not -1) forever and
      // InputStream.readNBytes spins on it — an executor thread hung
      // for good on one malicious blob (found by G711Spec mutation
      // fuzz). Treating read() <= 0 as end-of-stream terminates on
      // every input; 64 KiB covers any in-contract frame size.
      val data = {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        val maxBytes = 2 * Adpcm.MaxSamples
        var n = pcm.read(buf, 0, buf.length)
        while (n > 0 && bos.size < maxBytes) {
          bos.write(buf, 0, math.min(n, maxBytes - bos.size))
          n = pcm.read(buf, 0, buf.length)
        }
        bos.toByteArray
      }
      if (data.length < 2) None
      else {
        val out = new Array[Short](data.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some((src.getSampleRate.toInt, out))
      }
    } catch { case _: Exception => None }

  /** Decoded-image size ceiling: a crafted header claiming huge
    * dimensions must not allocate executor-killing buffers — 16 M px
    * (≈64 MB of int pixels) comfortably covers real thumbnails/frames
    * while bounding the worst case.
    */
  private val MaxDecodePixels = 1L << 24

  /** Bounded image decode: reads WIDTH/HEIGHT from the header FIRST
    * (no pixel decode) and rejects images over [[MaxDecodePixels]]
    * before any full-size buffer exists. `ImageIO.read` straight on
    * untrusted bytes would allocate the claimed dimensions — a forged
    * 64k×64k JPEG header is a 16 GB allocation, an OutOfMemoryError,
    * and a dead executor; this returns None instead.
    */
  private[operators] def readImageBounded(
      bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            val w = reader.getWidth(0).toLong
            val h = reader.getHeight(0).toLong
            if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Real decode: normalized `dim`-bin luminance histogram over the
    * decoded pixels (ITU-R BT.601 integer weights). The histogram
    * stands in for an embedding-model call; what matters for the
    * engine contract is that it is a pure function of the DECODED
    * image, so re-encoding the same pixels yields the same features.
    */
  private[operators] def imageFeatures(bytes: Array[Byte],
      dim: Int): Option[Array[Float]] =
    try {
      val imgOpt = readImageBounded(bytes)
      if (imgOpt.isEmpty) None
      else {
        val img = imgOpt.get
        val hist = new Array[Float](dim)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (299 * ((rgb >> 16) & 0xff) +
              587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
            hist(lum * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (img.getWidth.toLong * img.getHeight).toFloat
        Some(hist.map(_ / n))
      }
    } catch { case _: Exception => None }

  /** STUB decoder (non-image formats): normalized `dim`-bin histogram
    * of raw byte values. Replace with real codec + embedding model.
    */
  private[operators] def fakeDecodeFeatures(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) * dim / 256) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Frame sampling with the production output contract: one row per
    * (media_id, frame_idx) with a binary frame payload.
    *
    * MP4 payloads are REALLY demuxed: [[Mp4.frameIndex]] walks the
    * container's public sample tables (stsz/stsc/stco/stss — no codec
    * involved) and this operator slices up to `n` KEYFRAMES, picked
    * evenly across the sync-sample list, straight out of `mdat` as
    * real access-unit payloads. Non-MP4 payloads (and malformed MP4s)
    * fall back to the documented equal-byte-slice stub so coverage
    * stays total; a FRAGMENTED MP4 ([[Mp4.isFragmented]] — moof/mdat
    * layout the moov walk cannot index) instead keeps one row per
    * file with a NULL frame, the typed per-file error-accounting
    * path. Decoding the sliced frames to pixels still needs a
    * codec the JRE doesn't ship — that single step remains a
    * production swap-in; the demux, batch shape, ordering column and
    * payload contract are real.
    */
  def sampleFrames(df: DataFrame, n: Int,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    require(n >= 1, s"invalid frame count: $n")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(idPos)
        val bytes = r.getAs[Array[Byte]](mediaPos)
        if (bytes == null) Iterator.empty
        // a fragmented MP4 is a container we RECOGNIZE but cannot
        // demux from the moov tables: keep the file's row with a NULL
        // frame (per-file error accounting) instead of byte-slicing it
        else if (Mp4.isFragmented(bytes)) Iterator.single(Row(id, 0, null))
        else frameSlices(bytes, n).zipWithIndex.map { case (f, i) =>
          Row(id, i, f)
        }.iterator
      }
    }
  }

  /** Up to `n` frame payloads for one media blob: even keyframe picks
    * from the MP4 index when it parses, equal byte slices otherwise.
    */
  private[graft] def frameSlices(bytes: Array[Byte],
      n: Int): Seq[Array[Byte]] =
    Mp4.frameIndex(bytes) match {
      case Some(frames) if frames.nonEmpty =>
        val keys = frames.filter(_.sync)
        val pool = if (keys.nonEmpty) keys else frames
        val picked =
          if (pool.length <= n) pool
          else (0 until n).map(i => pool((i.toLong * pool.length / n).toInt))
        picked.map(f => java.util.Arrays.copyOfRange(bytes,
          f.offset.toInt, (f.offset + f.size).toInt))
      case _ =>
        val sliceLen = math.max(bytes.length / n, 1)
        (0 until n).flatMap { i =>
          val start = i * sliceLen
          if (start >= bytes.length) None
          else Some(java.util.Arrays.copyOfRange(bytes, start,
            math.min(start + sliceLen, bytes.length)))
        }
    }

  /** MJPEG decode-to-pixels: demux up to `n` keyframes per container
    * ([[frameSlices]] — the q71 path) and DECODE each sampled frame
    * through `javax.imageio` into real pixel values. This closes the
    * demux→pixels loop for one genuinely end-to-end codec path with
    * zero non-JRE code: MJPEG-in-MP4 carries a complete JPEG per
    * sample, and the stock JRE ships the JPEG codec. (PNG/GIF/BMP/
    * TIFF samples decode through the same call; genuinely compressed
    * video codecs — H.264 etc. — remain the documented production
    * swap-in.)
    *
    * Output: one row per (media_id, frame_idx) with `width`, `height`
    * and `pixels` (row-major ARRAY<INT> in [0, 255]: the raw gray
    * sample for single-band images — no color-management transform —
    * or BT.601 integer luminance otherwise). A frame the codec
    * rejects keeps its row with NULL width/height/pixels, so frame
    * accounting stays total and a corrupt frame never throws in the
    * executor.
    */
  def decodeFrames(df: DataFrame, n: Int,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    require(n >= 1, s"invalid frame count: $n")
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType))))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize the codec ONCE per partition here
      it.flatMap { r =>
        val id = r.getLong(idPos)
        val bytes = r.getAs[Array[Byte]](mediaPos)
        if (bytes == null) Iterator.empty
        // fragmented MP4: typed per-file error row, not byte slices
        else if (Mp4.isFragmented(bytes))
          Iterator.single(Row(id, 0, null, null, null))
        else frameSlices(bytes, n).zipWithIndex.map { case (f, i) =>
          decodeGray(f) match {
            case Some((w, h, px)) => Row(id, i, w, h, px.toSeq)
            case None => Row(id, i, null, null, null)
          }
        }.iterator
      }
    }
  }

  /** [[decodeFrames]] as pure expressions + a generator — the
    * whole-stage-codegen variant: `frame_slices` (codegen demux) →
    * `posexplode` (codegen Generate) → `decode_gray_px` (codegen
    * decode). Row-for-row equal to [[decodeFrames]] (including the
    * fragmented-MP4 single NULL accounting row — `frame_slices`
    * yields a one-NULL-element array there — and NULL-media rows
    * dropping); no object serialization boundary anywhere in the
    * plan. The mapPartitions variant remains the documented shape
    * for codecs wanting per-partition init; this is the shape for
    * JRE-codec decode where staying inside codegen wins.
    */
  def decodeFramesExpr(df: DataFrame, n: Int,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    require(n >= 1, s"invalid frame count: $n")
    import graft.functions.MediaFrameFunctions.{decode_gray_px, frame_slices}
    df.select(col(idCol),
        posexplode(frame_slices(col(mediaCol), n)))
      .select(col(idCol), col("pos").as("frame_idx"),
        decode_gray_px(col("col")).as("__px"))
      .select(col(idCol), col("frame_idx"),
        col("__px.width").as("width"),
        col("__px.height").as("height"),
        col("__px.pixels").as("pixels"))
  }

  /** Audio decode-to-samples: one row per media blob with the
    * decoded 16-bit PCM signal — the audio twin of [[decodeFrames]].
    * IMA-ADPCM WAVE (format tag 17) decodes through the pure-JVM
    * [[Adpcm]] state machine (integer-exact, so a DuckDB oracle can
    * replay it — q76); PCM/U-law/A-law WAVE decodes through
    * `javax.sound.sampled`. Output: `sample_rate` (Hz) and `samples`
    * (ARRAY<INT> of 16-bit signed values, bounded at
    * [[Adpcm.MaxSamples]]); a payload neither path accepts keeps its
    * row with NULLs — per-file error accounting, never an executor
    * throw. Genuinely compressed codecs with no JRE decoder
    * (MP3/AAC) remain the documented production swap-in.
    */
  def decodeAudio(df: DataFrame,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sample_rate", IntegerType),
      StructField("samples", ArrayType(IntegerType))))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize the codec ONCE per partition here
      it.map { r =>
        val id = r.getLong(idPos)
        decodeSamples(r.getAs[Array[Byte]](mediaPos)) match {
          case Some((rate, samples)) =>
            Row(id, rate, samples.map(_.toInt).toSeq)
          case None => Row(id, null, null)
        }
      }
    }
  }

  /** Compressed-VIDEO decode-to-pixels with zero non-JVM code: walk a
    * RIFF/AVI container and decode every RLE8 frame through the pure
    * integer [[Avi]] state machine — the compressed-video counterpart
    * of [[decodeAudio]]'s ADPCM path (and, like it, integer-exact, so
    * a DuckDB oracle replays the pixels arithmetically — q94). Output:
    * one row per (media_id, frame_idx) with width/height/`pixels`
    * (top-down row-major palette-mapped gray, [0, 255]). A payload
    * that is not a parseable RLE8 AVI keeps ONE row with a NULL frame
    * index; a frame whose RLE stream is malformed keeps its row with
    * NULL pixels — per-file and per-frame error accounting, never an
    * executor throw. H.264-class codecs remain the documented
    * production swap-in.
    */
  def decodeVideoRle(df: DataFrame,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType))))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize the codec ONCE per partition here
      it.flatMap { r =>
        val id = r.getLong(idPos)
        val bytes = r.getAs[Array[Byte]](mediaPos)
        if (bytes == null) Iterator.empty
        else Avi.index(bytes) match {
          case None => Iterator.single(Row(id, null, null, null, null))
          case Some(ix) =>
            ix.frames.iterator.zipWithIndex.map { case ((off, len), i) =>
              val data = java.util.Arrays.copyOfRange(bytes, off, off + len)
              Avi.decodeRle8(data, ix.width, ix.height, ix.palette) match {
                case Some(px) => Row(id, i, ix.width, ix.height, px.toSeq)
                case None => Row(id, i, ix.width, ix.height, null)
              }
            }
        }
      }
    }
  }

  /** Motion-JPEG-in-AVI decode — the second REAL compressed-video
    * container path (MP4-MJPEG being the first, q72): [[Avi.indexMjpeg]]
    * walks the RIFF container, each frame chunk is a whole JPEG
    * stream decoded through the bounded [[decodeGray]] path. Output
    * schema matches [[decodeVideoRle]]; width/height come from the
    * decoded JPEG (the container header is metadata only — a lying
    * header can't oversize an allocation, [[readImageBounded]]
    * guards). A rejected container yields one typed null row; a
    * rejected frame payload keeps its typed row with null pixels —
    * never an executor throw.
    */
  def decodeVideoMjpeg(df: DataFrame,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(IntegerType))))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize the codec ONCE per partition here
      it.flatMap { r =>
        val id = r.getLong(idPos)
        val bytes = r.getAs[Array[Byte]](mediaPos)
        if (bytes == null) Iterator.empty
        else Avi.indexMjpeg(bytes) match {
          case None => Iterator.single(Row(id, null, null, null, null))
          case Some((_, _, frames)) =>
            frames.iterator.zipWithIndex.map { case ((off, len), i) =>
              val data = java.util.Arrays.copyOfRange(bytes, off, off + len)
              decodeGray(data) match {
                case Some((w, h, px)) => Row(id, i, w, h, px.toSeq)
                case None => Row(id, i, null, null, null)
              }
            }
        }
      }
    }
  }

  /** Integer box-filter downscale of a decoded frame — the "resize"
    * step of a media feature pipeline, as pure column algebra
    * (higher-order functions over the pixel array; no UDF, no
    * per-row JVM object). Output dims are floor(w/fx) × floor(h/fy)
    * (crop-to-multiple, the standard rule); each output pixel is the
    * FLOOR MEAN of its fx×fy block — all-integer, so a DuckDB oracle
    * replays every resized pixel arithmetically (q97). Returns
    * struct(out_w, out_h, px).
    */
  def resizeBox(px: Column, w: Column, h: Column,
      fx: Int, fy: Int): Column = {
    require(fx >= 1 && fy >= 1, s"invalid box factors: $fx x $fy")
    val ow = floor(w.cast("double") / fx).cast("int")
    val oh = floor(h.cast("double") / fy).cast("int")
    val n = ow * oh
    // sequence(0, -1) DESCENDS: degenerate (smaller-than-box) frames
    // must yield an empty raster, not a reversed index range
    val idxs = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(expr("CAST(array() AS array<int>)"))
    val out = transform(idxs, k => {
      val oy = floor(k.cast("double") / ow).cast("int")
      val ox = pmod(k, ow)
      val blockSum = aggregate(sequence(lit(0), lit(fx * fy - 1)), lit(0L),
        (acc, j) => {
          val dy = floor(j.cast("double") / fx).cast("int")
          val dx = pmod(j, lit(fx))
          acc + element_at(px,
            (oy * fy + dy) * w + ox * fx + dx + 1).cast("long")
        })
      floor(blockSum.cast("double") / (fx * fy)).cast("int")
    })
    struct(ow.as("out_w"), oh.as("out_h"), out.as("px"))
  }

  /** 1-D box-filter decimation of a PCM sample array — the audio
    * analogue of [[resizeBox]] (downsample-by-integer-factor, the
    * rate-reduction step of an audio feature pipeline), as pure
    * column algebra. Output length floor(n/factor) (trailing partial
    * block cropped); each output sample is the FLOOR MEAN of its
    * block — exact integer arithmetic (floor, not truncate, so
    * negative PCM means reproduce identically under DuckDB's `//`).
    */
  def decimate(samples: Column, factor: Int): Column = {
    require(factor >= 1, s"invalid decimation factor: $factor")
    val n = floor(size(samples).cast("double") / factor).cast("int")
    // sequence(0, -1) DESCENDS: short inputs must yield empty output
    val idxs = when(n > 0, sequence(lit(0), n - 1))
      .otherwise(expr("CAST(array() AS array<int>)"))
    transform(idxs, k => {
      val blockSum = aggregate(sequence(lit(0), lit(factor - 1)), lit(0L),
        (acc, j) => acc + element_at(samples, k * factor + j + 1)
          .cast("long"))
      floor(blockSum.cast("double") / factor).cast("int")
    })
  }

  /** One frame payload → (width, height, row-major pixels). Raw
    * band-0 samples for single-band images (the identity path for
    * grayscale JPEG — `getRGB` would run a gray→sRGB color transform
    * and destroy sample values); BT.601 integer luminance for
    * multi-band. None when the codec rejects the payload.
    */
  private[graft] def decodeGray(
      bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val imgOpt = readImageBounded(bytes)
      if (imgOpt.isEmpty) None
      else {
        val img = imgOpt.get
        val w = img.getWidth
        val h = img.getHeight
        val px = new Array[Int](w * h)
        val singleBand = img.getRaster.getNumBands == 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) =
              if (singleBand) img.getRaster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
                  114 * (rgb & 0xff)) / 1000
              }
            x += 1
          }
          y += 1
        }
        Some((w, h, px))
      }
    } catch { case _: Exception => None }

  /** Deterministic grayscale JPEG encoder (fixture/writer utility —
    * the DatWriter/Mp4.build recipe: a writer closes the decode
    * loop). Quality 1.0 keeps every 8×8-block-UNIFORM image exact
    * under round-trip (uniform blocks are DC-only; the DC quantizer
    * step at quality 1.0 is 1), which is what lets an oracle predict
    * decoded pixel values arithmetically.
    */
  def encodeGrayJpeg(width: Int, height: Int,
      value: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.getRaster.setSample(x, y, 0, value(x, y) & 0xff)
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(
      new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    writer.dispose()
    bos.toByteArray
  }

  /** Frame sampling, stub-only path (n equal byte slices) — kept for
    * the pre-round-9 contract; [[sampleFrames]] supersedes it with a
    * real MP4 demux and this byte-slice behavior as its fallback.
    */
  def sampleFramesStub(df: DataFrame, n: Int,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    val sliceLen = greatest(floor(length(col(mediaCol)) / n).cast("int"),
      lit(1))
    df.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(mediaCol), (i * sliceLen + 1).cast("int"),
          sliceLen))))
      .select(col(idCol), col("pos").as("frame_idx"),
        col("col").as("frame"))
      .filter(length(col("frame")) > 0)
  }
}
