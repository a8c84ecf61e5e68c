package graft.operators

/** G.711 companded audio (µ-law / A-law) — the OTHER compressed-audio
  * family next to [[Adpcm]]. Unlike IMA-ADPCM the JRE ships a codec
  * for both (`javax.sound.sampled` WAVE format tags 7 and 6), so the
  * production decode path is [[Multimodal.decodeAudio]]'s
  * `pcmSamples` branch; this object carries the CLOSED-FORM expansion
  * the codec implements. Two jobs:
  *
  *  1. pin the oracle — each 8-bit code word expands to one 16-bit
  *     sample by a pure bit formula (no inter-sample state, unlike
  *     ADPCM), so DuckDB replays the decode per byte with integer
  *     bit-ops and q81 hash-checks EXACT PCM out of the JRE codec;
  *  2. cross-check the JRE — G711Spec asserts [[ulawToPcm]] /
  *     [[alawToPcm]] equal the `javax.sound.sampled` conversion for
  *     all 256 code words, so the oracle formula and the production
  *     decoder can never drift apart silently.
  *
  * Formulas are the public G.711 / CCITT expansion (sign | 3-bit
  * exponent segment | 4-bit mantissa; µ-law stores the byte
  * complemented with a 132 (0x84) bias, A-law XOR-masks with 0x55):
  * the same arithmetic every implementation tables out.
  */
object G711 {

  /** µ-law code word (0..255) → 16-bit signed PCM sample. */
  def ulawToPcm(b: Int): Int = {
    val u = ~b & 0xff
    var t = ((u & 0x0f) << 3) + 132
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 132 - t else t - 132
  }

  /** A-law code word (0..255) → 16-bit signed PCM sample. */
  def alawToPcm(b: Int): Int = {
    val in = b ^ 0x55
    val seg = (in & 0x70) >> 4
    var v = ((in & 0x0f) << 4) + 8
    if (seg >= 1) v += 256
    if (seg > 1) v <<= seg - 1
    if ((in & 0x80) == 0) -v else v
  }

  /** WAVE format tags (public RIFF registry). */
  val UlawTag = 7
  val AlawTag = 6

  /** Fixture/writer utility (the [[Adpcm.buildWav]] recipe): wrap a
    * raw G.711 code-word stream as a mono 8-bit WAVE with the given
    * format tag, decodable by `javax.sound.sampled` — the writer that
    * closes the decode loop for q81 and the parity spec.
    */
  def buildWav(fmtTag: Int, codes: Seq[Int], sampleRate: Int = 8000)
      : Array[Byte] = {
    require(fmtTag == UlawTag || fmtTag == AlawTag, s"format tag $fmtTag")
    require(codes.nonEmpty && codes.forall(c => c >= 0 && c <= 255))
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(4 + 8 + 16 + 8 + codes.length)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16)
    w16(fmtTag); w16(1); w32(sampleRate)
    w32(sampleRate) // byte rate: one byte per sample, mono
    w16(1); w16(8)  // blockAlign = 1, 8 bits per sample
    bos.write("data".getBytes); w32(codes.length)
    codes.foreach(bos.write)
    bos.toByteArray
  }
}
