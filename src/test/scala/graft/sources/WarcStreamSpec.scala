package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.warc.{Warc, WarcOffset}

/** Streaming WARC ingest (the crawl drop-folder): each micro-batch
  * processes exactly the newly arrived archives; restart from the
  * checkpoint neither re-reads nor skips.
  */
class WarcStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeArchive(dir: java.nio.file.Path, name: String,
      ids: Range): Unit = {
    val entries = ids.map(i => Warc.Entry("response", s"<urn:uuid:$i>",
      s"https://x.example/$i", "2024-01-15T10:00:00Z", 200, "text/html",
      s"<html>doc $i</html>".getBytes("UTF-8")))
    Files.write(dir.resolve(name), Warc.build(entries, gzip = true))
  }

  test("micro-batches pick up newly dropped archives exactly once, " +
      "across a checkpoint restart") {
    val dir = Files.createTempDirectory("graft-warc-stream")
    val ckpt = Files.createTempDirectory("graft-warc-ckpt").toString
    val out = Files.createTempDirectory("graft-warc-out").toString
    writeArchive(dir, "part-00000.warc.gz", 0 until 3)

    // parquet sink: the only built-in sink that RECOVERS from a
    // checkpoint (memory sink refuses), which is what phase 3 proves
    def start() = spark.readStream.format("warc").load(dir.toString)
      .select(col("record_id"), col("file"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    def ids(): Seq[String] = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0)).toSeq

    val q1 = start()
    q1.processAllAvailable()
    assert(ids().length === 3)

    writeArchive(dir, "part-00001.warc.gz", 10 until 14)
    q1.processAllAvailable()
    assert(ids().sorted.length === 7)
    q1.stop()

    // drop a third archive while the stream is DOWN; restart must
    // process only that one (offset = seen-file set in the checkpoint)
    writeArchive(dir, "part-00002.warc.gz", 20 until 22)
    val q2 = start()
    q2.processAllAvailable()
    val finalIds = ids()
    q2.stop()
    assert(finalIds.length === 9)
    assert(finalIds.distinct.length === 9, "duplicate replay after restart")
    assert((0 until 3).map(i => s"<urn:uuid:$i>").forall(finalIds.contains))
    assert((20 until 22).map(i => s"<urn:uuid:$i>").forall(finalIds.contains))
  }

  test("offset round-trips through JSON") {
    val o = WarcOffset(Seq("b.warc.gz", "a.warc.gz"))
    assert(WarcOffset.fromJson(o.json()).files === Seq("a.warc.gz", "b.warc.gz"))
    assert(WarcOffset.fromJson(WarcOffset(Seq.empty).json()).files.isEmpty)
  }

  test("compacted offset round-trips and stays back-compatible") {
    // floor-less offsets keep the pre-compaction bare-array format
    assert(!WarcOffset(Seq("a.warc.gz")).json().contains("floor"))
    // legacy checkpoints (bare array) still parse
    assert(WarcOffset.fromJson("""["a.warc.gz"]""") ===
      WarcOffset(Seq("a.warc.gz"), None))
    val o = WarcOffset(Seq("c.warc.gz"), Some("b.warc.gz"))
    val back = WarcOffset.fromJson(o.json())
    assert(back === o)
    // covered = explicit set ∪ names at-or-below the floor
    assert(back.covers("a.warc.gz") && back.covers("b.warc.gz") &&
      back.covers("c.warc.gz") && !back.covers("d.warc.gz"))
  }

  test("offsetRetain compacts the seen set; restart after compaction " +
      "neither re-reads nor skips") {
    val dir = Files.createTempDirectory("graft-warc-compact")
    val ckpt = Files.createTempDirectory("graft-warc-compact-ckpt").toString
    val out = Files.createTempDirectory("graft-warc-compact-out").toString

    def start() = spark.readStream.format("warc")
      .option("offsetRetain", "2").load(dir.toString)
      .select(col("record_id"), col("file"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    def ids(): Seq[String] = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0)).toSeq
    def lastOffsetJson(): String = {
      val dirF = new java.io.File(s"$ckpt/offsets")
      val last = dirF.listFiles().filter(_.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      // offset log line 3 is the per-source offset json
      scala.io.Source.fromFile(last).getLines().toSeq.last
    }

    // five date-ordered drops, one micro-batch each
    val q1 = start()
    for (i <- 0 until 5) {
      writeArchive(dir, f"crawl-2024010$i.warc.gz", (10 * i) until (10 * i + 2))
      q1.processAllAvailable()
    }
    assert(ids().length === 10)
    // committed floor folds all but the 2 newest names out of the
    // offset the NEXT batch logs
    writeArchive(dir, "crawl-20240105.warc.gz", 50 until 52)
    q1.processAllAvailable()
    assert(ids().length === 12)
    q1.stop()
    val off = graft.sources.warc.WarcOffset.fromJson(lastOffsetJson())
    assert(off.floor.nonEmpty, s"expected a compaction floor in $off")
    assert(off.files.length <= 3,
      s"explicit set should hold ~offsetRetain names, got ${off.files}")

    // drop a new archive while DOWN; restart must process exactly it —
    // compacted (floor-covered) names must not replay
    writeArchive(dir, "crawl-20240106.warc.gz", 60 until 63)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val finalIds = ids()
    assert(finalIds.length === 15)
    assert(finalIds.distinct.length === 15,
      "duplicate replay after compacted restart")
    // documented retention tradeoff: a late arrival below the floor is
    // treated as processed and skipped
    val q3 = start()
    writeArchive(dir, "crawl-20230101.warc.gz", 90 until 95)
    q3.processAllAvailable()
    q3.stop()
    assert(ids().length === 15, "file below the floor must be skipped")
  }
}
