package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** G.711 µ-law / A-law — the closed-form expansion vs the JRE codec
  * (the weld that lets q81's DuckDB oracle pin exact PCM), container
  * handling, and the distributed decodeAudio path.
  */
class G711Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jreDecode(wav: Array[Byte]): Option[(Int, Seq[Int])] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val src = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        2 * src.getChannels, src.getSampleRate, false)
      val pcm = AudioSystem.getAudioInputStream(target, in)
      // manual bounded loop, like production pcmSamples: a corrupted
      // header makes the converted stream return 0-byte reads forever
      // and readNBytes/readAllBytes spin on them (the hang this
      // spec's fuzz caught in the original production path)
      val data = {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](65536)
        var n = pcm.read(buf, 0, buf.length)
        while (n > 0 && bos.size < 2 * Adpcm.MaxSamples) {
          bos.write(buf, 0, n)
          n = pcm.read(buf, 0, buf.length)
        }
        bos.toByteArray
      }
      val out = (0 until data.length / 2).map(i =>
        ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt)
      Some((src.getSampleRate.toInt, out))
    } catch { case _: Exception => None }
  }

  test("g711: closed-form expansion equals the JRE codec for ALL 256 " +
      "code words, both laws (the q81 oracle weld)") {
    val all = 0 until 256
    val (_, uJre) = jreDecode(G711.buildWav(G711.UlawTag, all)).get
    val (_, aJre) = jreDecode(G711.buildWav(G711.AlawTag, all)).get
    assert(uJre == all.map(G711.ulawToPcm))
    assert(aJre == all.map(G711.alawToPcm))
    // spot anchors from the public expansion tables: 0xFF/0x7F are
    // ±zero in µ-law; extremes hit ±32124 (µ) and ±[8,32256] (A)
    assert(G711.ulawToPcm(0xff) == 0 && G711.ulawToPcm(0x7f) == 0)
    assert(G711.ulawToPcm(0x00) == -32124 && G711.ulawToPcm(0x80) == 32124)
    assert(all.map(G711.alawToPcm).max == 32256)
    assert(all.map(G711.alawToPcm).min == -32256)
  }

  test("g711: expansion is sign-antisymmetric (sign-bit flip negates)") {
    for (b <- 0 until 128) {
      assert(G711.ulawToPcm(b) == -G711.ulawToPcm(b | 0x80))
      assert(G711.alawToPcm(b ^ 0x80) == -G711.alawToPcm(b))
    }
  }

  test("g711: decodeAudio routes both laws through the javax path and " +
      "keeps per-file accounting for junk") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val codes = (0 until 48).map(j => (j * 13) % 256)
    val df = Seq(
      (0L, G711.buildWav(G711.UlawTag, codes, sampleRate = 16000)),
      (1L, G711.buildWav(G711.AlawTag, codes)),
      (2L, "not a wav".getBytes)).toDF("media_id", "media")
    val rows = Multimodal.decodeAudio(df).orderBy(col("media_id")).collect()
    assert(rows.length == 3)
    assert(rows(0).getInt(1) == 16000)
    assert(rows(0).getSeq[Int](2) == codes.map(G711.ulawToPcm))
    assert(rows(1).getInt(1) == 8000)
    assert(rows(1).getSeq[Int](2) == codes.map(G711.alawToPcm))
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("g711: buildWav rejects out-of-contract inputs; decode survives " +
      "random mutations without throwing (the Adpcm fuzz recipe)") {
    intercept[IllegalArgumentException](G711.buildWav(1, Seq(0)))
    intercept[IllegalArgumentException](G711.buildWav(G711.UlawTag, Seq.empty))
    intercept[IllegalArgumentException](G711.buildWav(G711.UlawTag, Seq(256)))
    val good = G711.buildWav(G711.UlawTag, (0 until 64).map(i => (i * 5) % 256))
    val rng = new scala.util.Random(29)
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      for (_ <- 0 to rng.nextInt(5))
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      // drive the PRODUCTION path: either a bounded decode or a typed
      // None — never a throw, never a hang (the original readNBytes
      // loop hung forever here on a mutated channel-count header)
      Multimodal.decodeSamples(mutated).foreach { case (_, samples) =>
        assert(samples.length <= Adpcm.MaxSamples)
      }
    }
    // the specific hang reproducer: a 65535-channel header must be a
    // typed None, not an infinite 0-byte-read loop
    val hang = good.clone()
    hang(22) = 0xff.toByte; hang(23) = 0xff.toByte
    assert(Multimodal.decodeSamples(hang).isEmpty)
  }
}
