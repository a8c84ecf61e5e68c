package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** RIFF/AVI walk + RLE8 codec: encode/decode round-trip property,
  * escape-mode goldens (delta skip, early EOS, absolute padding),
  * malformed-input fuzz (no executor throw, typed error rows), and
  * the distributed decodeVideoRle path.
  */
class AviSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val identityPal = Array.tabulate(256)(identity)

  private def frame(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h)(k => f(k % w, k / w))

  test("RLE8 round-trip property: decode(encode(px)) == px across " +
      "run-heavy, gradient (absolute-mode), and random frames") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 40) {
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(20)
      val px = trial % 3 match {
        case 0 => frame(w, h, (_, y) => (y * 11) % 256) // uniform rows
        case 1 => frame(w, h, (x, y) => (x * 7 + y) % 256) // gradient
        case _ => frame(w, h, (_, _) => rnd.nextInt(256))
      }
      val enc = Avi.encodeRle8(px, w, h)
      val dec = Avi.decodeRle8(enc, w, h, identityPal)
      assert(dec.isDefined, s"trial $trial ($w x $h)")
      assert(dec.get.toSeq == px.toSeq, s"trial $trial ($w x $h)")
    }
  }

  test("RLE8 escape goldens: delta skip leaves background 0, early " +
      "EOS leaves the rest 0, absolute mode is word-padded") {
    // 4x2, bottom-up: row y=0 is the OUTPUT's bottom row.
    // run 2x5, delta skip (2,1) -> lands at x=... then EOS
    val delta = Array[Byte](2, 5, 0, 2, 2, 1, 0, 1)
    val gotD = Avi.decodeRle8(delta, 4, 2, identityPal)
    // bottom row: [5, 5, 0, 0]; top row all 0 (delta skipped into it)
    assert(gotD.get.toSeq == Seq(0, 0, 0, 0, 5, 5, 0, 0))
    // absolute mode with odd count: 00 03 a b c PAD, then EOL+EOS
    val abs = Array[Byte](0, 3, 9, 8, 7, 0, 0, 0, 0, 1)
    val gotA = Avi.decodeRle8(abs, 4, 2, identityPal)
    assert(gotA.get.toSeq == Seq(0, 0, 0, 0, 9, 8, 7, 0))
    // early EOS right away: all background
    assert(Avi.decodeRle8(Array[Byte](0, 1), 3, 2, identityPal)
      .get.toSeq == Seq.fill(6)(0))
  }

  test("RLE8 malformed inputs return None, never throw: overlong " +
      "run, missing EOS, truncated absolute block, row overflow") {
    assert(Avi.decodeRle8(Array[Byte](9, 1, 0, 1), 4, 2,
      identityPal).isEmpty) // run of 9 into width 4
    assert(Avi.decodeRle8(Array[Byte](2, 1, 0, 0), 4, 2,
      identityPal).isEmpty) // EOLs but never EOS
    assert(Avi.decodeRle8(Array[Byte](0, 5, 1, 2), 8, 2,
      identityPal).isEmpty) // absolute promises 5, delivers 2
    assert(Avi.decodeRle8(
      Array[Byte](2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 1), 4, 1,
      identityPal).isEmpty) // third row in a 1-row frame
  }

  test("container walk: palette maps indices through BT.601, and " +
      "non-AVI / truncated / fragged bytes yield the typed error row") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val w = 8; val h = 3
    val px = frame(w, h, (x, y) => (x + 5 * y) % 251)
    val good = Avi.build(Seq(px, px.map(v => (v + 1) % 251)), w, h)
    val junk = "definitely not a RIFF container".getBytes
    val truncated = java.util.Arrays.copyOfRange(good, 0, 40)
    val df = Seq((1L, good), (2L, junk), (3L, truncated))
      .toDF("media_id", "media")
    val out = Multimodal.decodeVideoRle(df)
      .select("media_id", "frame_idx", "width", "height", "pixels")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)), Option(r.get(4)))).toSeq
      .sortBy(r => (r._1, r._2.map(_.asInstanceOf[Int]).getOrElse(-1)))
    // good container: two decoded frames; junk+truncated: one typed
    // NULL row each
    assert(out.map(_._1) == Seq(1L, 1L, 2L, 3L))
    assert(out.take(2).forall(_._3.isDefined))
    assert(out.drop(2).forall(r => r._2.isEmpty && r._3.isEmpty))
    val decoded = Multimodal.decodeVideoRle(df.filter(col("media_id") === 1))
      .selectExpr("pixels").collect()(0).getSeq[Int](0)
    assert(decoded == px.toSeq)
  }

  test("build→index: dims and frame count round-trip; index rejects " +
      "a non-RLE8 bitmap compression") {
    val w = 16; val h = 4
    val avi = Avi.build(Seq.fill(3)(frame(w, h, (x, _) => x % 251)), w, h)
    val ix = Avi.index(avi)
    assert(ix.isDefined)
    assert(ix.get.width == w && ix.get.height == h)
    assert(ix.get.frames.length == 3)
    // flip biCompression (LE at strf+16) to BI_RGB=0 → must reject.
    // locate strf payload: search for the fourcc then skip size
    val pos = avi.indexOfSlice("strf".getBytes.toSeq)
    assert(pos > 0)
    val broken = avi.clone()
    (0 until 4).foreach(i => broken(pos + 8 + 16 + i) = 0)
    assert(Avi.index(broken).isEmpty)
  }

  test("MJPG build→index round-trips frames; each codec's indexer " +
      "rejects the other's container") {
    val w = 16; val h = 8
    val jpegs = (0 until 3).map(f =>
      Multimodal.encodeGrayJpeg(w, h, (x, y) =>
        (11 * f + 13 * (x / 8) + 29 * (y / 8)) % 256))
    val avi = Avi.buildMjpeg(jpegs, w, h)
    val ix = Avi.indexMjpeg(avi)
    assert(ix.isDefined)
    val (iw, ih, frames) = ix.get
    assert(iw == w && ih == h && frames.length == 3)
    // frame payloads are the JPEG bytes untouched
    val (off, len) = frames(1)
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(avi, off, off + len), jpegs(1)))
    // cross-codec rejection: MJPG walk refuses RLE8 and vice versa
    val rle = Avi.build(Seq(frame(w, h, (x, _) => x % 251)), w, h)
    assert(Avi.indexMjpeg(rle).isEmpty)
    assert(Avi.index(avi).isEmpty)
  }

  test("MJPG malformed payloads keep typed rows, never throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val w = 16; val h = 8
    val good = Multimodal.encodeGrayJpeg(w, h, (x, _) => (7 * x) % 256)
    // one good frame + one garbage payload inside a valid container
    val avi = Avi.buildMjpeg(Seq(good, Array.fill[Byte](32)(0x5a)), w, h)
    val out = Multimodal.decodeVideoMjpeg(
        Seq((1L, avi), (2L, Array.fill[Byte](20)(3))).toDF("media_id", "media"))
      .select(col("media_id"), col("frame_idx"), col("pixels"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)),
        Option(r.get(2)))).toSeq
      .sortBy(r => (r._1, r._2.map(_.asInstanceOf[Int]).getOrElse(-1)))
    assert(out.map(_._1) == Seq(1L, 1L, 2L))
    assert(out(0)._3.isDefined)            // good frame decodes
    assert(out(1)._2.contains(1) && out(1)._3.isEmpty) // bad payload
    assert(out(2)._2.isEmpty && out(2)._3.isEmpty)     // bad container
  }
}
