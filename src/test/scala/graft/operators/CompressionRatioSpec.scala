package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** compressionRatio (TextAnalysis.scala): deflate-based quality
  * signal. Not oracle-comparable (zlib streams are implementation-
  * defined), so the contract pinned here is (a) bit-agreement with a
  * plain-Scala level-6 replay, (b) the signal ORDERING the filter
  * relies on: repetitive text compresses far better than diverse
  * text, and (c) edge rows (empty text -> NULL ratio) never throw.
  */
class CompressionRatioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def replay(text: String): (Long, Long) = {
    val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    (raw.length.toLong, n)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog " * 20),
    (2L, (0 until 400).map(i => (i * 2654435761L).toHexString)
      .mkString(" ")),
    (3L, ""),
    (4L, "abc"))

  test("matches the plain-Scala deflate replay exactly") {
    val got = TextAnalysis.compressionRatio(
        docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { case (id, t) =>
      assert(got(id) == replay(t), s"doc $id")
    }
  }

  test("repetitive text compresses better than high-entropy text") {
    val got = TextAnalysis.compressionRatio(
        docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toMap
    assert(got(1L) > 2 * got(2L),
      s"repetitive=${got(1L)} diverse=${got(2L)}")
    assert(got(3L) == -1.0) // empty -> NULL ratio, no throw
  }
}
