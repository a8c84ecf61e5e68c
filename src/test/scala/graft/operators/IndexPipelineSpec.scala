package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** One CDC feed maintaining several index artifacts: per-artifact
  * exactly-once makes the FLEET converge to the sequential fold even
  * when a crash lands between artifact commits and the batch replays.
  */
class IndexPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  private def corpus(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map(i =>
      (i.toLong, s"tok${i % 5} tok${(i + 1) % 5} body word$i tail${i % 3}"))
      .toDF("doc_id", "text")
  }

  private def bm25Scores(path: String) =
    Bm25Index.score(spark, path, Seq("tok1", "tok3")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet

  private def lmScores(path: String, docs: org.apache.spark.sql.DataFrame) =
    LmIndex.score(spark, path, docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

  test("a crash between artifact commits + at-least-once replay " +
      "converges every artifact to the sequential fold") {
    val (bmPath, lmPath, ddPath) =
      (tmp("pipe-bm"), tmp("pipe-lm"), tmp("pipe-dd"))
    Bm25Index.buildIfAbsent(corpus(0, 20), "text", "doc_id", bmPath)
    LmIndex.buildIfAbsent(corpus(0, 20), "text", "doc_id", lmPath)
    DedupIndex.buildIfAbsent(corpus(0, 20), "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, ddPath,
      kbParts = 4, sbParts = 4, dbParts = 4)

    val batch0 = corpus(20, 26).withColumn("op", lit("I"))
      .unionByName(corpus(0, 2).withColumn("op", lit("D")))

    // CRASH SIMULATION: batch 0 reached BM25 only, then the process
    // died before the LM and dedup sinks ran
    Bm25Index.applyBatch(batch0, 0L, bmPath)

    // the at-least-once replay drives the full pipeline sink: BM25
    // skips (watermark), LM and dedup apply — the fleet converges
    IndexPipeline.sink(
      Bm25Index.cdcSink(bmPath),
      LmIndex.cdcSink(lmPath),
      DedupIndex.cdcSink(ddPath))(batch0, 0L)

    val survivors = corpus(2, 26)
    val (wantFp, wantN) =
      IndexDirs.contentFingerprint(survivors, Seq("doc_id", "text"))
    for (p <- Seq(bmPath, lmPath, ddPath)) {
      val b = p match {
        case `bmPath` => Bm25Index.buildIfAbsent(survivors, "text",
          "doc_id", p)
        case `lmPath` => LmIndex.buildIfAbsent(survivors, "text",
          "doc_id", p)
        case _ => DedupIndex.buildIfAbsent(survivors, "text", "doc_id",
          DedupIndex.MinhashMd5(16, 4), bands = 4, p,
          kbParts = 4, sbParts = 4, dbParts = 4)
      }
      assert(b.reused && b.fingerprint == wantFp && b.count == wantN,
        s"artifact $p must equal the sequential fold")
    }
    // and the servable state matches survivors-only rebuilds
    val bmWant = tmp("pipe-bm-want")
    Bm25Index.buildIfAbsent(survivors, "text", "doc_id", bmWant)
    assert(bm25Scores(bmPath) == bm25Scores(bmWant))
    val lmWant = tmp("pipe-lm-want")
    LmIndex.buildIfAbsent(survivors, "text", "doc_id", lmWant)
    assert(lmScores(lmPath, corpus(0, 26)) ==
      lmScores(lmWant, corpus(0, 26)))
  }

  test("after a partial crash-replay, the PINNED read serves every " +
      "artifact at the common batch watermark (= the sequential fold " +
      "at that batch), never mixing watermarks") {
    import graft.operators.AggView.Measure
    val (aggPath, vsPath) = (tmp("pin-agg"), tmp("pin-vs"))
    import spark.implicits._
    def facts(from: Int, until: Int) = (from until until).map { i =>
      (i.toLong, s"g${i % 3}", (i * 7 % 101).toLong,
        (0 until 4).map(d => ((i * 31 + d * 7) % 201 - 100).toLong))
    }.toDF("id", "grp", "v", "q")
    AggView.buildIfAbsent(facts(0, 30), Seq("grp"),
      Seq(Measure("v_sum", "v")), aggPath, kbParts = 4)
    VecStats.buildIfAbsent(facts(0, 30), "q", "id", vsPath)
    val sinks = IndexPipeline.sink(
      AggView.cdcSink(aggPath), VecStats.cdcSink(vsPath))
    sinks(facts(30, 40).withColumn("op", lit("I")), 0L)
    // CRASH SIMULATION: batch 1 reached the AggView only
    AggView.applyBatch(facts(40, 50).withColumn("op", lit("I")), 1L,
      aggPath)
    assert(IndexPipeline.lastBatch(aggPath) == 1L &&
      IndexPipeline.lastBatch(vsPath) == 0L)
    // mid-convergence: the fleet's consistent read point is batch 0,
    // and the pinned serves equal the sequential fold AT batch 0
    assert(IndexPipeline.commonBatch(Seq(aggPath, vsPath)) == 0L)
    val pins = IndexPipeline.pinnedVersions(Seq(aggPath, vsPath))
    val aggAt0 = AggView.readAsOf(spark, aggPath, pins(aggPath))
      .collect().map(_.toString).toSet
    val vsAt0 = VecStats.summaryAsOf(spark, vsPath, pins(vsPath))
      .collect().map(_.toString).toSet
    val (aggWant, vsWant) = (tmp("pin-agg-w"), tmp("pin-vs-w"))
    AggView.buildIfAbsent(facts(0, 40), Seq("grp"),
      Seq(Measure("v_sum", "v")), aggWant, kbParts = 4)
    VecStats.buildIfAbsent(facts(0, 40), "q", "id", vsWant)
    assert(aggAt0 == AggView.read(spark, aggWant)
      .collect().map(_.toString).toSet)
    assert(vsAt0 == VecStats.summary(spark, vsWant)
      .collect().map(_.toString).toSet)
    // the replay lands batch 1 everywhere; the pins advance together
    sinks(facts(40, 50).withColumn("op", lit("I")), 1L)
    assert(IndexPipeline.commonBatch(Seq(aggPath, vsPath)) == 1L)
    val pins1 = IndexPipeline.pinnedVersions(Seq(aggPath, vsPath))
    assert(AggView.readAsOf(spark, aggPath, pins1(aggPath))
      .collect().map(_.toString).toSet ==
      AggView.read(spark, aggPath).collect().map(_.toString).toSet)
    assert(VecStats.summaryAsOf(spark, vsPath, pins1(vsPath))
      .collect().map(_.toString).toSet ==
      VecStats.summary(spark, vsPath).collect().map(_.toString).toSet)
  }

  test("a live mixed CDC stream maintains three artifacts through one " +
      "foreachBatch pipeline") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (bmPath, lmPath, ddPath) =
      (tmp("pipes-bm"), tmp("pipes-lm"), tmp("pipes-dd"))
    Bm25Index.buildIfAbsent(corpus(0, 15), "text", "doc_id", bmPath)
    LmIndex.buildIfAbsent(corpus(0, 15), "text", "doc_id", lmPath)
    DedupIndex.buildIfAbsent(corpus(0, 15), "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, ddPath,
      kbParts = 4, sbParts = 4, dbParts = 4)
    def rowsOf(df: org.apache.spark.sql.DataFrame, op: String) =
      df.collect().map(r => (r.getLong(0), r.getString(1), op)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "op")
      .writeStream
      .foreachBatch(IndexPipeline.sink(
        Bm25Index.cdcSink(bmPath),
        LmIndex.cdcSink(lmPath),
        DedupIndex.cdcSink(ddPath)))
      .start()
    input.addData(rowsOf(corpus(15, 20), "I") ++
      rowsOf(corpus(0, 3), "D"): _*)
    q.processAllAvailable()
    input.addData(rowsOf(corpus(20, 24), "I"): _*)
    q.processAllAvailable()
    q.stop()
    val survivors = corpus(3, 24)
    val (wantFp, _) =
      IndexDirs.contentFingerprint(survivors, Seq("doc_id", "text"))
    assert(Bm25Index.buildIfAbsent(survivors, "text", "doc_id", bmPath)
      .fingerprint == wantFp)
    assert(LmIndex.buildIfAbsent(survivors, "text", "doc_id", lmPath)
      .reused)
    assert(DedupIndex.buildIfAbsent(survivors, "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, ddPath,
      kbParts = 4, sbParts = 4, dbParts = 4).reused)
  }

  test("ColStats rides an insert-only fleet exactly-once; a delete " +
      "batch REFUSES in its sink while the fleet's common-watermark " +
      "read point stays consistent") {
    import graft.operators.AggView.Measure
    import spark.implicits._
    val (aggPath, csPath) = (tmp("csfleet-agg"), tmp("csfleet-cs"))
    def facts(from: Int, until: Int) = (from until until).map { i =>
      (i.toLong, s"g${i % 3}", (i * 7 % 101).toLong)
    }.toDF("id", "grp", "v")
    AggView.buildIfAbsent(facts(0, 30), Seq("grp"),
      Seq(Measure("v_sum", "v")), aggPath, kbParts = 4)
    ColStats.buildIfAbsent(facts(0, 30), Seq("id", "v"), Seq("grp"),
      csPath)
    val sinks = IndexPipeline.sink(
      AggView.cdcSink(aggPath), ColStats.cdcSink(csPath))
    sinks(facts(30, 40).withColumn("op", lit("I")), 0L)
    // at-least-once replay: both artifacts skip (watermark)
    sinks(facts(30, 40).withColumn("op", lit("I")), 0L)
    assert(ColStats.buildIfAbsent(facts(0, 40), Seq("id", "v"),
      Seq("grp"), csPath).reused,
      "colstats must equal the one-shot build over the fold")
    // a delete batch: AggView (first sink) applies it, ColStats
    // refuses — monotone stats can't retract — and NOTHING is staged
    intercept[UnsupportedOperationException] {
      sinks(facts(0, 5).withColumn("op", lit("D")), 1L)
    }
    assert(IndexPipeline.lastBatch(aggPath) == 1L &&
      IndexPipeline.lastBatch(csPath) == 0L)
    // the fleet's consistent read point pins at the common watermark
    assert(IndexPipeline.commonBatch(Seq(aggPath, csPath)) == 0L)
    val pins = IndexPipeline.pinnedVersions(Seq(aggPath, csPath))
    assert(AggView.readAsOf(spark, aggPath, pins(aggPath))
      .agg(sum("v_sum")).head().getLong(0) ==
      facts(0, 40).agg(sum("v")).head().getLong(0))
  }

  test("a MergeOnRead change stream drives the fleet: CDC table -> " +
      "changeStream -> pipeline sink converges both artifacts") {
    import spark.implicits._
    val morDir = Files.createTempDirectory("pipecs-mor").toUri.toString
      .stripSuffix("/") + "/tbl"
    val (bmPath, lmPath) = (tmp("pipecs-bm"), tmp("pipecs-lm"))
    val ckpt = Files.createTempDirectory("pipecs-ckpt").toString
    MergeOnRead.create(corpus(0, 15), morDir, Seq("doc_id"))
    Bm25Index.buildIfAbsent(corpus(0, 15), "text", "doc_id", bmPath)
    LmIndex.buildIfAbsent(corpus(0, 15), "text", "doc_id", lmPath)
    // mutate the TABLE; the artifacts subscribe to its change feed
    MergeOnRead.append(corpus(15, 20)
      .withColumn("op", lit("I")).withColumn("seq", lit(1L)), morDir)
    MergeOnRead.append(corpus(0, 3)
      .withColumn("op", lit("D")).withColumn("seq", lit(1L)), morDir)
    val q = MergeOnRead.changeStream(spark, morDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        // the feed carries seq/batch; the artifact sinks take the
        // CDC triple
        IndexPipeline.sink(
          Bm25Index.cdcSink(bmPath),
          LmIndex.cdcSink(lmPath))(df.select("doc_id", "text", "op"), id)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // both artifacts equal the survivors-only fold of the table —
    // which is exactly the table's own live state
    val survivors = corpus(3, 20)
    assert(MergeOnRead.read(spark, morDir).select("doc_id", "text")
        .collect().map(_.toString).toSet ==
      survivors.collect().map(_.toString).toSet)
    val (wantFp, _) =
      IndexDirs.contentFingerprint(survivors, Seq("doc_id", "text"))
    assert(Bm25Index.buildIfAbsent(survivors, "text", "doc_id", bmPath)
      .fingerprint == wantFp)
    assert(LmIndex.buildIfAbsent(survivors, "text", "doc_id", lmPath)
      .reused)
  }
}
