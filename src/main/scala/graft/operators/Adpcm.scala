package graft.operators

/** Pure-JVM IMA (DVI4) ADPCM decode — the compressed-audio half of
  * the multimodal path the JRE has no codec for
  * (`javax.sound.sampled` decodes PCM/U-law/A-law only; WAVE format
  * tag 17 raises UnsupportedAudioFileException). The algorithm is the
  * public IMA spec's 89-entry step table + 8-entry index-adaptation
  * state machine — an integer-exact, branch-light decode, which is
  * what lets a DuckDB oracle replay it arithmetically (q76's
  * recursive CTE) and pin EXACT PCM output under the hash contract.
  *
  * Container: WAVE with `wFormatTag = 17`, mono, 4-bit samples,
  * block-aligned — each block opens with (int16 LE predictor,
  * uint8 step index, pad) and the predictor IS the block's first
  * output sample; the remaining `blockAlign - 4` bytes carry two
  * samples each, LOW nibble first. Anything else (stereo, other
  * tags, truncated chunks) is a typed None — per-file error
  * accounting, never an executor throw.
  */
object Adpcm {

  /** IMA step-size table (89 entries, public spec). `private[graft]`
    * so the q76 oracle generator embeds the SAME constants in its
    * DuckDB recursive CTE (the SignPlanes/PqCodebooks discipline:
    * one definition, two engines).
    */
  private[graft] val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** Index adaptation per 3-bit magnitude (sign bit excluded). */
  private[operators] val IndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** Decoded-sample ceiling: bounds the per-row output array against
    * a pathological multi-MB blob (the readImageBounded discipline —
    * ~1M samples ≈ 2 MB of shorts comfortably covers clip-length
    * fixtures and features).
    */
  val MaxSamples: Int = 1 << 20

  /** One state-machine step: (predictor, index, nibble) → new
    * (predictor, index). Mirrors the q76 oracle CTE term for term.
    */
  @inline private def step(pred: Int, idx: Int, nib: Int): (Int, Int) = {
    val s = StepTable(idx)
    val mag = nib & 7
    var diff = s >> 3
    if ((mag & 1) != 0) diff += s >> 2
    if ((mag & 2) != 0) diff += s >> 1
    if ((mag & 4) != 0) diff += s
    val p = if ((nib & 8) != 0) pred - diff else pred + diff
    val clamped = math.max(-32768, math.min(32767, p))
    val i2 = math.max(0, math.min(88, idx + IndexTable(mag)))
    (clamped, i2)
  }

  /** Parsed mono IMA-ADPCM stream: rate + decoded 16-bit samples. */
  final case class Decoded(sampleRate: Int, samples: Array[Short])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a mono IMA-ADPCM WAVE blob; None on any malformed or
    * unsupported shape (this is the per-file error row, not an
    * exception path). Partial trailing blocks are dropped; output is
    * capped at [[MaxSamples]].
    */
  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
        tag(bytes, 8) != "WAVE") return None
      var o = 12
      var fmt: Option[(Int, Int, Int, Int, Int)] = None
      var data: Option[(Int, Int)] = None
      while (o + 8 <= bytes.length) {
        val id = tag(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0 || o + 8 + sz > bytes.length) return None
        if (id == "fmt " && sz >= 16)
          fmt = Some((le16(bytes, o + 8), le16(bytes, o + 10),
            le32(bytes, o + 12), le16(bytes, o + 20), le16(bytes, o + 22)))
        else if (id == "data") data = Some((o + 8, sz))
        o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      (fmt, data) match {
        case (Some((17, 1, rate, blockAlign, 4)), Some((dataOff, dataLen)))
            if blockAlign >= 5 && rate > 0 =>
          val perBlock = (blockAlign - 4) * 2 + 1
          val nBlocks = dataLen / blockAlign
          val total = math.min(
            math.min(nBlocks.toLong * perBlock, MaxSamples.toLong),
            Int.MaxValue.toLong).toInt
          val out = new Array[Short](total)
          var n = 0
          var blk = 0
          while (blk < nBlocks && n < total) {
            val base = dataOff + blk * blockAlign
            var pred = le16(bytes, base).toShort.toInt
            var idx = bytes(base + 2) & 0xff
            if (idx > 88) return None
            out(n) = pred.toShort; n += 1
            var b = 4
            while (b < blockAlign && n < total) {
              val byte = bytes(base + b) & 0xff
              var half = 0
              while (half < 2 && n < total) {
                val nib = if (half == 0) byte & 0xf else byte >>> 4
                val (p2, i2) = step(pred, idx, nib)
                pred = p2; idx = i2
                out(n) = pred.toShort; n += 1
                half += 1
              }
              b += 1
            }
            blk += 1
          }
          Some(Decoded(rate, if (n == total) out else out.take(n)))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixture/writer utility (the DatWriter/Mp4.build recipe — a
    * writer closes the decode loop): wrap one initial state + nibble
    * stream as a single-block mono IMA-ADPCM WAVE. The decoder's
    * output for it is `pred0` followed by the state-machine replay of
    * `nibbles` — exactly what the q76 oracle CTE computes.
    */
  def buildWav(pred0: Int, idx0: Int, nibbles: Seq[Int],
      sampleRate: Int = 8000): Array[Byte] = {
    require(pred0 >= -32768 && pred0 <= 32767, s"pred0 $pred0")
    require(idx0 >= 0 && idx0 <= 88, s"idx0 $idx0")
    require(nibbles.nonEmpty && nibbles.length % 2 == 0,
      "nibble count must be even (two per byte)")
    require(nibbles.forall(n => n >= 0 && n <= 15))
    val blockAlign = 4 + nibbles.length / 2
    val perBlock = nibbles.length + 1
    val dataLen = blockAlign
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(4 + 8 + 20 + 8 + dataLen)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(20)
    w16(17); w16(1); w32(sampleRate)
    w32(sampleRate * blockAlign / perBlock) // nominal byte rate
    w16(blockAlign); w16(4); w16(2); w16(perBlock)
    bos.write("data".getBytes); w32(dataLen)
    w16(pred0 & 0xffff); bos.write(idx0); bos.write(0)
    nibbles.grouped(2).foreach { case Seq(lo, hi) =>
      bos.write(lo | (hi << 4))
    }
    bos.toByteArray
  }
}
