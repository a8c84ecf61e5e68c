package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Minimal ISO-BMFF (MP4) container walk — enough of the public
  * format (ISO/IEC 14496-12) to build a real frame index without any
  * codec: `moov/trak/mdia/minf/stbl` is located by box walk, then
  *
  *  - `stsz` gives every sample's size,
  *  - `stsc` maps samples to chunks,
  *  - `stco`/`co64` gives each chunk's absolute file offset,
  *  - `stss` marks the sync samples (keyframes); absent ⇒ all sync.
  *
  * From those four tables every sample's exact `(offset, size)` byte
  * extent in the file is arithmetic — so frame payloads (e.g. H.264
  * access units) can be sliced out of the container without decoding
  * anything, the same trick the `.dat` reader uses for its tree walk.
  *
  * Defensive like [[graft.sources.LegacyDat]]: every read is bounds-
  * checked and malformed structure returns None (callers fall back),
  * never an executor ArrayIndexOutOfBounds.
  */
object Mp4 {

  /** One video frame's byte extent in the container. */
  final case class Frame(sampleNo: Int, offset: Long, size: Long,
      sync: Boolean)

  private val MaxSamples = 1 << 20 // malformed-count guard

  private def be32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def be64(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 8 > b.length) -1L
    else (be32(b, p) << 32) | be32(b, p + 4)

  private def boxType(b: Array[Byte], p: Int): String =
    if (p < 0 || p + 4 > b.length) ""
    else new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate child boxes of [start, end): returns (type, payloadStart,
    * payloadEnd) triples. Stops at the first malformed header.
    */
  private def children(b: Array[Byte], start: Long, end: Long)
      : Vector[(String, Long, Long)] = {
    val out = ArrayBuffer.empty[(String, Long, Long)]
    var p = start
    while (p + 8 <= end && out.length < 4096) {
      val size32 = be32(b, p.toInt)
      val typ = boxType(b, p.toInt + 4)
      val (size, hdr) =
        if (size32 == 1L) (be64(b, p.toInt + 8), 16L)
        else if (size32 == 0L) (end - p, 8L) // box extends to end
        else (size32, 8L)
      if (size < hdr || p + size > end) return out.toVector
      out += ((typ, p + hdr, p + size))
      p += size
    }
    out.toVector
  }

  private def child(boxes: Vector[(String, Long, Long)], typ: String)
      : Option[(Long, Long)] =
    boxes.collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Full-box payload start (skips version/flags). */
  private def full(s: Long): Int = s.toInt + 4

  /** Build the frame index of the first VIDEO track (hdlr type
    * `vide`); None when the payload is not a parseable MP4 or carries
    * no video samples.
    */
  def frameIndex(bytes: Array[Byte]): Option[Vector[Frame]] = {
    if (bytes.length < 16) return None
    val top = children(bytes, 0, bytes.length.toLong)
    if (!top.exists(_._1 == "ftyp")) return None
    val moov = child(top, "moov").getOrElse(return None)
    val traks = children(bytes, moov._1, moov._2).filter(_._1 == "trak")
    traks.iterator.flatMap { case (_, ts, te) =>
      val mdia = child(children(bytes, ts, te), "mdia")
      mdia.flatMap { case (ms, me) =>
        val mboxes = children(bytes, ms, me)
        val isVideo = child(mboxes, "hdlr").exists { case (hs, _) =>
          boxType(bytes, full(hs) + 4) == "vide"
        }
        if (!isVideo) None
        else child(mboxes, "minf")
          .flatMap { case (ns, ne) => child(children(bytes, ns, ne), "stbl") }
          .flatMap { case (ss, se) => stblIndex(bytes, ss, se) }
      }
    }.find(_.nonEmpty)
  }

  /** True for FRAGMENTED MP4s (ISO/IEC 14496-12 movie fragments):
    * sample data lives in `moof`/`mdat` pairs and the `moov` carries
    * an `mvex` box instead of populated sample tables — so the
    * moov-based [[frameIndex]] walk cannot index frames. Callers use
    * this to emit the typed per-file error row (the LegacyDat
    * error-budget pattern) instead of byte-slicing a container they
    * recognized but cannot demux. Bounds-safe like the rest of the
    * walk; false for anything that is not a parseable MP4.
    */
  def isFragmented(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 16) return false
    val top = children(bytes, 0, bytes.length.toLong)
    if (!top.exists(_._1 == "ftyp")) return false
    top.exists(_._1 == "moof") || child(top, "moov").exists {
      case (ms, me) => children(bytes, ms, me).exists(_._1 == "mvex")
    }
  }

  /** Container metadata from the `moov` tables: presentation
    * duration in ms (`mvhd` v0/v1: timescale + duration) and the
    * video track's pixel dimensions (`tkhd` 16.16 fixed-point width/
    * height). Each is None independently when its box is absent or
    * malformed.
    */
  def meta(bytes: Array[Byte])
      : (Option[Int], Option[Int], Option[Long]) = {
    val none = (None, None, None)
    if (bytes.length < 16) return none
    val top = children(bytes, 0, bytes.length.toLong)
    if (!top.exists(_._1 == "ftyp")) return none
    val moov = child(top, "moov").getOrElse(return none)
    val mboxes = children(bytes, moov._1, moov._2)
    val duration = child(mboxes, "mvhd").flatMap { case (hs, he) =>
      val v = if (hs < bytes.length) bytes(hs.toInt) & 0xff else -1
      if (v == 0 && hs + 20 <= he) {
        val ts = be32(bytes, hs.toInt + 12)
        val dur = be32(bytes, hs.toInt + 16)
        if (ts > 0) Some(dur * 1000L / ts) else None
      } else if (v == 1 && hs + 32 <= he) {
        val ts = be32(bytes, hs.toInt + 20)
        val dur = be64(bytes, hs.toInt + 24)
        if (ts > 0 && dur >= 0) Some(dur * 1000L / ts) else None
      } else None
    }
    // the video track's tkhd (16.16 fixed point, integer part)
    val dims = mboxes.filter(_._1 == "trak").iterator.flatMap {
      case (_, ts, te) =>
        val tboxes = children(bytes, ts, te)
        val isVideo = child(tboxes, "mdia").exists { case (ms, me) =>
          child(children(bytes, ms, me), "hdlr").exists { case (hs, _) =>
            boxType(bytes, full(hs) + 4) == "vide"
          }
        }
        if (!isVideo) None
        else child(tboxes, "tkhd").flatMap { case (hs, he) =>
          val v = if (hs < bytes.length) bytes(hs.toInt) & 0xff else -1
          val off = if (v == 0) 76L else if (v == 1) 88L else -1L
          if (off < 0 || hs + off + 8 > he) None
          else {
            val w = (be32(bytes, (hs + off).toInt) >>> 16).toInt
            val h = (be32(bytes, (hs + off + 4).toInt) >>> 16).toInt
            if (w > 0 && h > 0) Some((w, h)) else None
          }
        }
    }.nextOption()
    (dims.map(_._1), dims.map(_._2), duration)
  }

  /** Decode the four sample tables under one `stbl` into the frame
    * index. Any inconsistent count/offset returns None.
    */
  private def stblIndex(b: Array[Byte], s: Long, e: Long)
      : Option[Vector[Frame]] = {
    val boxes = children(b, s, e)

    // stsz: fixed sample_size or per-sample table
    val (sizes, nSamples) = child(boxes, "stsz") match {
      case None => return None
      case Some((ps, _)) =>
        val fixed = be32(b, full(ps))
        val n = be32(b, full(ps) + 4)
        if (n < 0 || n > MaxSamples) return None
        if (fixed != 0) (Vector.fill(n.toInt)(fixed), n.toInt)
        else {
          val arr = (0 until n.toInt).map(i => be32(b, full(ps) + 8 + 4 * i))
          if (arr.exists(_ < 0)) return None
          (arr.toVector, n.toInt)
        }
    }
    if (nSamples == 0) return Some(Vector.empty)

    // chunk offsets: stco (32-bit) or co64
    val chunkOffsets: Vector[Long] = child(boxes, "stco") match {
      case Some((ps, _)) =>
        val n = be32(b, full(ps))
        if (n < 0 || n > MaxSamples) return None
        (0 until n.toInt).map(i => be32(b, full(ps) + 4 + 4 * i)).toVector
      case None => child(boxes, "co64") match {
        case Some((ps, _)) =>
          val n = be32(b, full(ps))
          if (n < 0 || n > MaxSamples) return None
          (0 until n.toInt).map(i => be64(b, full(ps) + 4 + 8 * i)).toVector
        case None => return None
      }
    }
    if (chunkOffsets.isEmpty || chunkOffsets.exists(_ < 0)) return None

    // stsc runs: (first_chunk, samples_per_chunk)
    val stscRuns: Vector[(Int, Int)] = child(boxes, "stsc") match {
      case None => return None
      case Some((ps, _)) =>
        val n = be32(b, full(ps))
        if (n < 0 || n > MaxSamples) return None
        val runs = (0 until n.toInt).map { i =>
          (be32(b, full(ps) + 4 + 12 * i).toInt,
            be32(b, full(ps) + 4 + 12 * i + 4).toInt)
        }.toVector
        if (runs.exists(r => r._1 < 1 || r._2 < 0)) return None
        runs
    }
    if (stscRuns.isEmpty) return None

    // stss sync table (1-based sample numbers); absent = all sync
    val sync: Option[Set[Int]] = child(boxes, "stss").map { case (ps, _) =>
      val n = be32(b, full(ps))
      if (n < 0 || n > MaxSamples) Set.empty[Int]
      else (0 until n.toInt).map(i => be32(b, full(ps) + 4 + 4 * i).toInt)
        .toSet
    }

    // walk chunks, laying samples contiguously from each chunk offset
    val frames = Vector.newBuilder[Frame]
    var sample = 0 // 0-based
    var chunk = 1  // 1-based
    var run = 0
    while (sample < nSamples && chunk <= chunkOffsets.length) {
      while (run + 1 < stscRuns.length && stscRuns(run + 1)._1 <= chunk)
        run += 1
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < stscRuns(run)._2 && sample < nSamples) {
        val sz = sizes(sample)
        // overflow-safe: a crafted co64 offset near Long.MaxValue must
        // not wrap `off + sz` negative and slip past the bound
        if (off < 0 || sz < 0 || off > b.length || sz > b.length - off)
          return None
        frames += Frame(sample + 1, off, sz,
          sync.forall(_.contains(sample + 1)))
        off += sz
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < nSamples) None else Some(frames.result())
  }

  // ---- build: frame payloads → .mp4 blob (the DatWriter pattern:
  // a writer closes the read/write loop, so the walk is testable
  // against synthesized containers, not just golden bytes) ----------

  private def be32b(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32b(8L + body.length) ++
      typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  private def fullBox(typ: String, payload: Array[Byte]*): Array[Byte] =
    box(typ, (Array[Byte](0, 0, 0, 0) +: payload): _*)

  private def be64b(v: Long): Array[Byte] =
    be32b(v >>> 32) ++ be32b(v & 0xffffffffL)

  /** Synthesize a minimal-but-valid video MP4: `ftyp` + one `mdat`
    * holding the frame payloads contiguously (one chunk) + a `moov`
    * whose single `vide` track indexes them through real
    * stsz/stsc/stco(+stss) tables.
    *
    * @param syncSamples 1-based keyframe sample numbers for an `stss`
    *   box; None omits the box (= every sample sync, per the spec)
    * @param use64BitOffsets write a `co64` chunk-offset table instead
    *   of `stco` (the >4 GiB-file form of the same data)
    * @param durationMs presentation duration for `mvhd` (timescale
    *   1000)
    * @param widthPx / heightPx video dimensions for `tkhd` (written
    *   as 16.16 fixed point)
    */
  def build(frames: Seq[Array[Byte]],
      syncSamples: Option[Seq[Int]] = None,
      use64BitOffsets: Boolean = false,
      durationMs: Long = 0L,
      widthPx: Int = 0, heightPx: Int = 0): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val ftyp = box("ftyp",
      "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      be32b(0), "isom".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val mdatPayloadOff = ftyp.length + 8L
    val stsz = fullBox("stsz", be32b(0), be32b(frames.length.toLong),
      frames.flatMap(f => be32b(f.length.toLong)).toArray)
    val stsc = fullBox("stsc", be32b(1),
      be32b(1), be32b(frames.length.toLong), be32b(1))
    val stco =
      if (use64BitOffsets) fullBox("co64", be32b(1), be64b(mdatPayloadOff))
      else fullBox("stco", be32b(1), be32b(mdatPayloadOff))
    val stss = syncSamples.fold(Array.emptyByteArray)(ss =>
      fullBox("stss", be32b(ss.length.toLong),
        ss.flatMap(v => be32b(v.toLong)).toArray))
    val stbl = box("stbl", stsz, stsc, stco, stss)
    val hdlr = fullBox("hdlr", be32b(0),
      "vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      new Array[Byte](12))
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr, minf)
    // mvhd v0: timescale 1000 → duration field = durationMs
    val mvhd = fullBox("mvhd", be32b(0), be32b(0), be32b(1000),
      be32b(durationMs), be32b(0x00010000L), new Array[Byte](76))
    // tkhd v0: width/height as 16.16 fixed point at payload 76/80
    val tkhd = fullBox("tkhd", new Array[Byte](72),
      be32b(widthPx.toLong << 16), be32b(heightPx.toLong << 16))
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mdat = box("mdat", frames.flatten.toArray)
    ftyp ++ mdat ++ moov
  }

  /** Synthesize a FRAGMENTED MP4 (the streaming/DASH layout): `ftyp`
    * + a `moov` whose track carries EMPTY sample tables plus an
    * `mvex/trex`, then one `moof`(mfhd/traf/tfhd/trun) + `mdat` pair
    * per frame. [[frameIndex]] cannot demux this shape (sample
    * extents live in the fragments, not the moov) — the fixture
    * exists so specs can assert the typed-fallback contract:
    * [[isFragmented]] true, no throw, per-file error row.
    */
  def buildFragmented(frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val ftyp = box("ftyp",
      "iso5".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      be32b(0), "iso5".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val stbl = box("stbl",
      fullBox("stsz", be32b(0), be32b(0)),
      fullBox("stsc", be32b(0)),
      fullBox("stco", be32b(0)))
    val hdlr = fullBox("hdlr", be32b(0),
      "vide".getBytes(java.nio.charset.StandardCharsets.US_ASCII),
      new Array[Byte](12))
    val trak = box("trak", fullBox("tkhd", new Array[Byte](80)),
      box("mdia", hdlr, box("minf", stbl)))
    // trex: track 1, default sample description/duration/size/flags
    val mvex = box("mvex", fullBox("trex",
      be32b(1), be32b(1), be32b(0), be32b(0), be32b(0)))
    val mvhd = fullBox("mvhd", be32b(0), be32b(0), be32b(1000),
      be32b(0), be32b(0x00010000L), new Array[Byte](76))
    val moov = box("moov", mvhd, trak, mvex)
    val fragments = frames.zipWithIndex.flatMap { case (f, i) =>
      // trun: one sample, data-offset + sample-size flags (0x000201);
      // data offset = moof size + mdat header, patched after sizing
      def moofFor(dataOff: Long) = box("moof",
        fullBox("mfhd", be32b(i + 1L)),
        box("traf", fullBox("tfhd", be32b(1)),
          box("trun", Array[Byte](0, 0, 2, 1), be32b(1),
            be32b(dataOff), be32b(f.length.toLong))))
      val sized = moofFor(0L)
      moofFor(sized.length + 8L) ++ box("mdat", f)
    }
    ftyp ++ moov ++ fragments.toArray
  }
}
