package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** IMA-ADPCM decode — golden replay, clamp behavior, container
  * rejection, mutation fuzz, and the distributed decodeAudio path.
  */
class AdpcmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Independent replay of the published IMA state machine (its own
    * table copies, so a transcription slip in either copy fails the
    * round-trip property rather than cancelling out).
    */
  private object Replay {
    val step = Array(
      7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
      37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
      157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
      544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
      1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
      4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
      12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
      29794, 32767)
    def run(pred0: Int, idx0: Int, nibbles: Seq[Int]): Seq[Int] = {
      var pred = pred0
      var idx = idx0
      pred0 +: nibbles.map { nib =>
        val s = step(idx)
        var diff = s >> 3
        if ((nib & 1) != 0) diff += s >> 2
        if ((nib & 2) != 0) diff += s >> 1
        if ((nib & 4) != 0) diff += s
        pred = if ((nib & 8) != 0) pred - diff else pred + diff
        pred = math.max(-32768, math.min(32767, pred))
        idx = math.max(0, math.min(88,
          idx + Array(-1, -1, -1, -1, 2, 4, 6, 8)((nib & 7))))
        pred
      }
    }
  }

  test("adpcm: buildWav → decode round-trips the IMA state machine " +
      "(randomized property vs an independent replay)") {
    val rng = new scala.util.Random(17)
    for (trial <- 0 until 200) {
      val pred0 = rng.nextInt(65536) - 32768
      val idx0 = rng.nextInt(89)
      val n = 2 * (1 + rng.nextInt(40))
      val nibbles = Seq.fill(n)(rng.nextInt(16))
      val rate = 4000 + rng.nextInt(44100)
      val wav = Adpcm.buildWav(pred0, idx0, nibbles, rate)
      val dec = Adpcm.decode(wav)
      assert(dec.isDefined, s"trial $trial failed to decode")
      assert(dec.get.sampleRate == rate)
      assert(dec.get.samples.map(_.toInt).toSeq ==
        Replay.run(pred0, idx0, nibbles), s"trial $trial samples")
    }
  }

  test("adpcm: predictor clamps at the int16 rails instead of wrapping") {
    // all-max positive nibbles from a high start: must pin at 32767
    val up = Adpcm.decode(Adpcm.buildWav(32000, 88, Seq.fill(20)(7))).get
    assert(up.samples.max == 32767 && up.samples.forall(_ >= 32000))
    // all-max negative nibbles from a low start: must pin at -32768
    val dn = Adpcm.decode(Adpcm.buildWav(-32000, 88, Seq.fill(20)(15))).get
    assert(dn.samples.min == -32768 && dn.samples.forall(_ <= -32000))
  }

  test("adpcm: multi-block streams restart from each block header") {
    // two blocks, each 8 bytes (4 header + 4 payload = 8 nibbles):
    // block 2's predictor must come from ITS header, not block 1's
    // final state
    def block(pred0: Int, idx0: Int, nibbles: Seq[Int]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(pred0 & 0xff); b.write((pred0 >> 8) & 0xff)
      b.write(idx0); b.write(0)
      nibbles.grouped(2).foreach { case Seq(lo, hi) => b.write(lo | (hi << 4)) }
      b.toByteArray
    }
    val nibs1 = Seq(1, 9, 3, 11, 5, 13, 7, 15)
    val nibs2 = Seq(15, 7, 13, 5, 11, 3, 9, 1)
    val data = block(100, 20, nibs1) ++ block(-7000, 55, nibs2)
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    bos.write("RIFF".getBytes); w32(4 + 8 + 20 + 8 + data.length)
    bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(20)
    w16(17); w16(1); w32(8000); w32(8000); w16(8); w16(4); w16(2); w16(9)
    bos.write("data".getBytes); w32(data.length); bos.write(data)
    val dec = Adpcm.decode(bos.toByteArray).get
    assert(dec.samples.map(_.toInt).toSeq ==
      Replay.run(100, 20, nibs1) ++ Replay.run(-7000, 55, nibs2))
  }

  test("adpcm: unsupported/malformed containers are typed None, " +
      "never a throw") {
    val good = Adpcm.buildWav(100, 30, Seq.fill(16)(5))
    assert(Adpcm.decode(good).isDefined)
    // stereo (nChannels=2) is out of contract
    val stereo = good.clone(); stereo(22) = 2
    assert(Adpcm.decode(stereo).isEmpty)
    // PCM format tag (1) routes to the javax path, not this decoder
    val pcm = good.clone(); pcm(20) = 1
    assert(Adpcm.decode(pcm).isEmpty)
    // 8-bit samples claimed
    val b8 = good.clone(); b8(34) = 8
    assert(Adpcm.decode(b8).isEmpty)
    // step index out of range (>88) in the block header
    val dataOff = {
      val s = new String(good, java.nio.charset.StandardCharsets.ISO_8859_1)
      s.indexOf("data") + 8
    }
    val badIdx = good.clone(); badIdx(dataOff + 2) = 120.toByte
    assert(Adpcm.decode(badIdx).isEmpty)
    // truncations at every length: None or shorter output, no throw
    for (len <- 0 until good.length) {
      Adpcm.decode(good.take(len)).foreach { d =>
        assert(d.samples.length <= 33)
      }
    }
    // not a RIFF at all
    assert(Adpcm.decode("clearly not audio".getBytes).isEmpty)
    assert(Adpcm.decode(Array.emptyByteArray).isEmpty)
  }

  test("adpcm: decode survives random byte mutations without throwing " +
      "(the LegacyDat/Mp4 fuzz recipe)") {
    val good = Adpcm.buildWav(-1234, 42, (0 until 64).map(i => (i * 5) % 16))
    val rng = new scala.util.Random(23)
    for (_ <- 0 until 400) {
      val mutated = good.clone()
      for (_ <- 0 to rng.nextInt(5))
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      // either a bounded decode or a typed None — never a throw
      Adpcm.decode(mutated).foreach { d =>
        assert(d.samples.length <= Adpcm.MaxSamples)
      }
    }
  }

  test("adpcm: decodeAudio keeps per-file accounting — ADPCM decodes, " +
      "PCM routes through javax, junk keeps its row with NULLs") {
    import spark.implicits._
    val adpcm = Adpcm.buildWav(500, 10, Seq(1, 2, 3, 4, 5, 6, 7, 8))
    // a minimal 16-bit mono PCM WAVE for the javax path
    val pcmSamples = Array[Short](100, -200, 300, -400)
    val pcm = {
      val bos = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
      bos.write("RIFF".getBytes); w32(4 + 8 + 16 + 8 + 8)
      bos.write("WAVE".getBytes)
      bos.write("fmt ".getBytes); w32(16)
      w16(1); w16(1); w32(16000); w32(32000); w16(2); w16(16)
      bos.write("data".getBytes); w32(8)
      pcmSamples.foreach(s => w16(s & 0xffff))
      bos.toByteArray
    }
    val df = Seq((0L, adpcm), (1L, pcm), (2L, "junk".getBytes))
      .toDF("media_id", "media")
    val rows = Multimodal.decodeAudio(df).collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    assert(rows(0).getInt(1) == 8000)
    assert(rows(0).getSeq[Int](2) == Replay.run(500, 10, Seq(1, 2, 3, 4, 5, 6, 7, 8)))
    assert(rows(1).getInt(1) == 16000)
    assert(rows(1).getSeq[Int](2) == pcmSamples.map(_.toInt).toSeq)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
    // audioFeatures rides the same decode: a unit-mass histogram
    val feats = Multimodal.audioFeatures(adpcm, 16)
    assert(feats.isDefined)
    assert(math.abs(feats.get.sum - 1f) < 1e-5)
  }
}
