package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Minimal RIFF/AVI container walk + Microsoft RLE8 video decode —
  * a genuinely COMPRESSED video format decoded to exact pixels with
  * zero non-JVM code, closing (one slice of) the compressed-video gap
  * the MJPEG path (Mp4/Multimodal, q72) left to "production swap-in".
  * Both halves are public formats: RIFF/AVI is the 1991 Microsoft
  * multimedia container ('RIFF' size 'AVI ' LIST tree, little-endian
  * throughout — the byte-order mirror of the Mp4 box walk), and RLE8
  * is the BITMAPINFOHEADER BI_RLE8 run-length encoding (encoded
  * pairs, escape 0 + {EOL, EOS, delta, absolute}).
  *
  * Defensive like [[Mp4]]/[[graft.sources.LegacyDat]]: every read is
  * bounds-checked; malformed structure (bad header, out-of-range run,
  * missing EOS) returns None — per-file error accounting, never an
  * executor throw.
  */
object Avi {

  /** Parsed container: frame dims, the 256-entry gray palette
    * (BT.601 integer luminance of each RGBQUAD), and each '00dc'
    * video chunk's (offset, size) extent.
    */
  final case class Index(width: Int, height: Int,
      palette: Array[Int], frames: Vector[(Int, Int)])

  private val MaxFrames = 1 << 16
  private val BiRle8 = 1L
  /** biCompression for Motion-JPEG-in-AVI: 'MJPG' as a little-endian
    * fourcc integer.
    */
  private val BiMjpg = 0x47504A4DL

  private def le32(b: Array[Byte], p: Int): Long =
    if (p < 0 || p + 4 > b.length) -1L
    else (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    if (p < 0 || p + 4 > b.length) ""
    else new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Iterate RIFF chunks of [start, end): (fourcc, payloadStart,
    * payloadEnd) triples; a LIST chunk's payload INCLUDES its 4-byte
    * list type. Chunks are word-aligned (odd sizes padded).
    */
  private def chunks(b: Array[Byte], start: Int, end: Int)
      : Vector[(String, Int, Int)] = {
    val out = ArrayBuffer.empty[(String, Int, Int)]
    var p = start
    while (p + 8 <= end && out.length < MaxFrames) {
      val typ = fourcc(b, p)
      val size = le32(b, p + 4)
      if (size < 0 || p + 8 + size > end) return out.toVector
      out += ((typ, p + 8, p + 8 + size.toInt))
      p += 8 + size.toInt + (size.toInt & 1)
    }
    out.toVector
  }

  private def list(cs: Vector[(String, Int, Int)], listType: String,
      b: Array[Byte]): Option[(Int, Int)] =
    cs.collectFirst {
      case ("LIST", s, e) if fourcc(b, s) == listType => (s + 4, e)
    }

  /** Walk the container: locate `hdrl`'s BITMAPINFOHEADER (strf of
    * the first 'vids' stream, biCompression must be BI_RLE8, 8 bpp)
    * and every '00dc'/'00db' chunk inside `movi`. None when any of
    * that structure is absent or malformed.
    */
  def index(bytes: Array[Byte]): Option[Index] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    val top = chunks(bytes, 12, bytes.length)
    val (hs, he) = list(top, "hdrl", bytes).getOrElse(return None)
    val hdrl = chunks(bytes, hs, he)
    val (ss, se) = list(hdrl, "strl", bytes).getOrElse(return None)
    val strl = chunks(bytes, ss, se)
    val vids = strl.collectFirst {
      case ("strh", s, _) if fourcc(bytes, s) == "vids" => ()
    }
    if (vids.isEmpty) return None
    val (fs, fe) = strl.collectFirst { case ("strf", s, e) => (s, e) }
      .getOrElse(return None)
    if (fe - fs < 40 + 256 * 4) return None
    val w = le32(bytes, fs + 4).toInt
    val h = le32(bytes, fs + 8).toInt
    val bpp = le32(bytes, fs + 14) & 0xffffL // biBitCount (16-bit field)
    val comp = le32(bytes, fs + 16)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14) ||
      bpp != 8L || comp != BiRle8) return None
    // RGBQUAD palette (B,G,R,reserved) → integer BT.601 luminance
    val pal = Array.tabulate(256) { i =>
      val p = fs + 40 + 4 * i
      val blue = bytes(p) & 0xff
      val green = bytes(p + 1) & 0xff
      val red = bytes(p + 2) & 0xff
      (299 * red + 587 * green + 114 * blue + 500) / 1000
    }
    val (ms, me) = list(top, "movi", bytes).getOrElse(return None)
    val frames = chunks(bytes, ms, me).collect {
      case (t, s, e) if t == "00dc" || t == "00db" => (s, e - s)
    }
    if (frames.isEmpty) None else Some(Index(w, h, pal, frames))
  }

  /** Decode one RLE8 frame to top-down row-major palette-mapped gray
    * values. BMP raster order is BOTTOM-UP: (x=0, y=0) is the
    * bottom-left pixel; this flips to top-down on output. Pixels no
    * run covers (delta skips, early EOS) stay background 0 — the
    * documented RLE8 semantics. None on any out-of-range run or a
    * frame that never reaches EOS.
    */
  def decodeRle8(data: Array[Byte], w: Int, h: Int,
      palette: Array[Int]): Option[Array[Int]] = {
    val buf = new Array[Int](w * h) // bottom-up, palette-mapped
    var x = 0; var y = 0; var i = 0
    while (i < data.length) {
      if (i + 2 > data.length) return None // ran out before EOS
      val c = data(i) & 0xff; val v = data(i + 1) & 0xff
      i += 2
      if (c > 0) { // run mode: c pixels of palette index v
        if (y >= h || x + c > w) return None
        val g = palette(v)
        var j = 0
        while (j < c) { buf(y * w + x + j) = g; j += 1 }
        x += c
      } else v match {
        case 0 => x = 0; y += 1 // EOL
        case 1 => // EOS — flip bottom-up to top-down
          return Some(Array.tabulate(w * h)(k =>
            buf((h - 1 - k / w) * w + k % w)))
        case 2 => // delta: skip (dx, dy); skipped pixels stay 0
          if (i + 2 > data.length) return None
          x += data(i) & 0xff; y += data(i + 1) & 0xff
          i += 2
          if (x > w || y > h) return None
        case n => // absolute mode: n literal pixels, word-padded
          if (y >= h || x + n > w || i + n > data.length) return None
          var j = 0
          while (j < n) { buf(y * w + x + j) = palette(data(i + j) & 0xff); j += 1 }
          x += n
          i += n + (n & 1)
      }
    }
    None // fell off the data without EOS
  }

  /** Encode one top-down gray frame as RLE8 (value == palette index
    * under [[build]]'s identity palette): run mode for runs of ≥3
    * equal pixels, absolute mode for stretches of shorter runs
    * (where run mode would bloat), EOL per row, EOS after the last —
    * exercising both decode modes on real data. Inverse of
    * [[decodeRle8]] by the AviSpec round-trip property.
    */
  def encodeRle8(pixels: Array[Int], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, "pixel buffer must be w*h")
    val out = ArrayBuffer.empty[Byte]
    var y = h - 1 // bottom-up rows
    while (y >= 0) {
      var x = 0
      while (x < w) {
        var run = 1
        while (x + run < w && run < 255 &&
          pixels(y * w + x + run) == pixels(y * w + x)) run += 1
        if (run >= 3) {
          out += run.toByte += pixels(y * w + x).toByte
          x += run
        } else {
          // batch short runs into one absolute block (3..254 pixels,
          // capped well under the 255 one-byte count limit)
          var end = x + run
          var grow = true
          while (grow && end < w && end - x <= 252) {
            var r = 1
            while (end + r < w && pixels(y * w + end + r) ==
              pixels(y * w + end)) r += 1
            if (r >= 3) grow = false else end += r
          }
          val n = end - x
          if (n >= 3) {
            out += 0.toByte += n.toByte
            (x until end).foreach(j => out += pixels(y * w + j).toByte)
            if ((n & 1) == 1) out += 0.toByte // word pad
          } else {
            // too short for either mode's minimum: tiny literal runs
            (x until end).foreach(j =>
              out += 1.toByte += pixels(y * w + j).toByte)
          }
          x = end
        }
      }
      if (y > 0) { out += 0.toByte += 0.toByte } // EOL
      else { out += 0.toByte += 1.toByte } // EOS
      y -= 1
    }
    out.toArray
  }

  private def put32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte += ((v >> 8) & 0xff).toByte +=
      ((v >> 16) & 0xff).toByte += ((v >> 24) & 0xff).toByte
  }

  private def putCc(out: ArrayBuffer[Byte], cc: String): Unit =
    cc.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      .foreach(out += _)

  private def chunk(cc: String, payload: Array[Byte]): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    putCc(out, cc); put32(out, payload.length.toLong)
    payload.foreach(out += _)
    if ((payload.length & 1) == 1) out += 0.toByte
    out.toArray
  }

  private def listChunk(listType: String,
      children: Seq[Array[Byte]]): Array[Byte] = {
    val body = ArrayBuffer.empty[Byte]
    putCc(body, listType)
    children.foreach(_.foreach(body += _))
    chunk("LIST", body.toArray)
  }

  /** Build a minimal valid RLE8 AVI: hdrl(avih, strl(strh, strf with
    * the identity gray palette)) + movi('00dc' per frame). Frames are
    * top-down gray rasters in [0, 255]; same synthesize-the-container
    * closed loop as [[Mp4.build]] (q71/q72 recipe).
    */
  def build(frames: Seq[Array[Int]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val avih = ArrayBuffer.empty[Byte]
    put32(avih, 40000L) // usec/frame (25 fps)
    (0 until 3).foreach(_ => put32(avih, 0L))
    put32(avih, frames.length.toLong); put32(avih, 0L)
    put32(avih, 1L) // streams
    put32(avih, 0L)
    put32(avih, w.toLong); put32(avih, h.toLong)
    (0 until 4).foreach(_ => put32(avih, 0L))
    val strh = ArrayBuffer.empty[Byte]
    putCc(strh, "vids"); putCc(strh, "mrle")
    (0 until 12).foreach(_ => put32(strh, 0L))
    val strf = ArrayBuffer.empty[Byte]
    put32(strf, (40 + 256 * 4).toLong) // biSize incl. palette
    put32(strf, w.toLong); put32(strf, h.toLong)
    put32(strf, 1L | (8L << 16)) // biPlanes=1, biBitCount=8
    put32(strf, BiRle8) // biCompression
    (0 until 5).foreach(_ => put32(strf, 0L))
    (0 until 256).foreach(i => put32(strf, // identity gray RGBQUADs
      (i.toLong) | (i.toLong << 8) | (i.toLong << 16)))
    val hdrl = listChunk("hdrl", Seq(chunk("avih", avih.toArray),
      listChunk("strl", Seq(chunk("strh", strh.toArray),
        chunk("strf", strf.toArray)))))
    val movi = listChunk("movi",
      frames.map(f => chunk("00dc", encodeRle8(f, w, h))))
    val body = ArrayBuffer.empty[Byte]
    putCc(body, "AVI ")
    hdrl.foreach(body += _); movi.foreach(body += _)
    chunk("RIFF", body.toArray)
  }

  /** Index for a Motion-JPEG AVI: container dims + each frame chunk's
    * (offset, length) extent. Shares the RIFF walk with [[index]];
    * biCompression must be 'MJPG' (24 bpp, headers-only strf — no
    * palette). The payloads are whole JPEG streams; pixel dims come
    * from the JPEG itself at decode time, the container header is
    * metadata only.
    */
  def indexMjpeg(bytes: Array[Byte]): Option[(Int, Int, Vector[(Int, Int)])] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    val top = chunks(bytes, 12, bytes.length)
    val (hs, he) = list(top, "hdrl", bytes).getOrElse(return None)
    val hdrl = chunks(bytes, hs, he)
    val (ss, se) = list(hdrl, "strl", bytes).getOrElse(return None)
    val strl = chunks(bytes, ss, se)
    val vids = strl.collectFirst {
      case ("strh", s, _) if fourcc(bytes, s) == "vids" => ()
    }
    if (vids.isEmpty) return None
    val (fs, fe) = strl.collectFirst { case ("strf", s, e) => (s, e) }
      .getOrElse(return None)
    if (fe - fs < 40) return None
    val w = le32(bytes, fs + 4).toInt
    val h = le32(bytes, fs + 8).toInt
    val comp = le32(bytes, fs + 16)
    if (w <= 0 || h <= 0 || w > (1 << 14) || h > (1 << 14) ||
      comp != BiMjpg) return None
    val (ms, me) = list(top, "movi", bytes).getOrElse(return None)
    val frames = chunks(bytes, ms, me).collect {
      case (t, s, e) if t == "00dc" || t == "00db" => (s, e - s)
    }
    if (frames.isEmpty || frames.length > MaxFrames) None
    else Some((w, h, frames))
  }

  /** Build a minimal Motion-JPEG AVI: the [[build]] skeleton with
    * handler/compression 'MJPG', 24 bpp, no palette; each frame chunk
    * carries a whole JPEG stream untouched.
    */
  def buildMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    val avih = ArrayBuffer.empty[Byte]
    put32(avih, 40000L) // usec/frame (25 fps)
    (0 until 3).foreach(_ => put32(avih, 0L))
    put32(avih, frames.length.toLong); put32(avih, 0L)
    put32(avih, 1L) // streams
    put32(avih, 0L)
    put32(avih, w.toLong); put32(avih, h.toLong)
    (0 until 4).foreach(_ => put32(avih, 0L))
    val strh = ArrayBuffer.empty[Byte]
    putCc(strh, "vids"); putCc(strh, "MJPG")
    (0 until 12).foreach(_ => put32(strh, 0L))
    val strf = ArrayBuffer.empty[Byte]
    put32(strf, 40L) // biSize, headers only
    put32(strf, w.toLong); put32(strf, h.toLong)
    put32(strf, 1L | (24L << 16)) // biPlanes=1, biBitCount=24
    put32(strf, BiMjpg) // biCompression
    (0 until 5).foreach(_ => put32(strf, 0L))
    val hdrl = listChunk("hdrl", Seq(chunk("avih", avih.toArray),
      listChunk("strl", Seq(chunk("strh", strh.toArray),
        chunk("strf", strf.toArray)))))
    val movi = listChunk("movi", frames.map(f => chunk("00dc", f)))
    val body = ArrayBuffer.empty[Byte]
    putCc(body, "AVI ")
    hdrl.foreach(body += _); movi.foreach(body += _)
    chunk("RIFF", body.toArray)
  }
}
