package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class Bm25IndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val terms = Seq("tok1", "tok3", "rare")

  // shared vocabulary with per-doc tails so tf, df, and dl all vary;
  // "rare" appears in a handful of docs only
  private def corpus(from: Int = 0, until: Int = 40) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toLong, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} " +
        s"word$i tail${i % 3}" + (if (i % 11 == 0) " rare" else ""))
    }.toDF("doc_id", "text")
  }

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("persisted score equals the in-plan bm25, second build reuses, " +
      "and the query's terms prune to their tb partitions") {
    val path = tmp("bmidx")
    assert(!Bm25Index.buildIfAbsent(corpus(), "text", "doc_id", path)
      .reused)
    assert(Bm25Index.buildIfAbsent(corpus(), "text", "doc_id", path)
      .reused)
    val got = Bm25Index.score(spark, path, terms)
    val want = TextAnalysis.bm25(corpus(), "doc_id", "text", terms)
    assert(scores(got) == scores(want) && scores(got).nonEmpty)
    // the term list must reach the postings scan as a STATIC tb
    // partition filter (the 100 TB contract: |terms| partitions read,
    // never the corpus)
    val plan = got.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*tb".r.findFirstIn(plan).isDefined,
      s"expected a tb partition filter in:\n$plan")
    // ...and the dl ledger read must be pruned to the CANDIDATE docs'
    // dlb partitions — corpus N/avgdl come from the manifest, so no
    // full-ledger scan or aggregate may appear in the serve plan
    assert("PartitionFilters: \\[[^\\]]*dlb".r.findFirstIn(plan).isDefined,
      s"expected a dlb partition filter on the dl read in:\n$plan")
  }

  test("append composes the fingerprint and postings to the " +
      "full-build index; re-indexing a live doc refuses") {
    val path = tmp("bmidx-app")
    val fullPath = tmp("bmidx-full")
    Bm25Index.buildIfAbsent(corpus(0, 25), "text", "doc_id", path)
    val app = Bm25Index.append(corpus(25, 40), path)
    val full = Bm25Index.buildIfAbsent(corpus(), "text", "doc_id",
      fullPath)
    assert(app.fingerprint == full.fingerprint && app.count == full.count)
    assert(Bm25Index.buildIfAbsent(corpus(), "text", "doc_id", path)
      .reused)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(Bm25Index.score(spark, fullPath, terms)))
    assert(intercept[IllegalArgumentException] {
      Bm25Index.append(corpus(30, 32), path)
    }.getMessage.contains("shares"))
  }

  test("delete negates postings back out: scores equal a " +
      "survivors-only index, guards fire, and delete + re-append is " +
      "a legal UPDATE (rows cancel per key)") {
    val path = tmp("bmidx-del")
    Bm25Index.buildIfAbsent(corpus(), "text", "doc_id", path)
    val dead = corpus().filter(col("doc_id") % 2 === 1)
    val del = Bm25Index.delete(dead, path)
    val even = corpus().filter(col("doc_id") % 2 === 0)
    val evenBuild = Bm25Index.buildIfAbsent(even, "text", "doc_id",
      tmp("bmidx-even"))
    assert(del.fingerprint == evenBuild.fingerprint &&
      del.count == evenBuild.count)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(TextAnalysis.bm25(even, "doc_id", "text", terms)))
    // the deleted-from artifact satisfies a survivors-only rebuild
    assert(Bm25Index.buildIfAbsent(even, "text", "doc_id", path).reused)
    assert(intercept[IllegalArgumentException] {
      Bm25Index.delete(dead.limit(2), path)
    }.getMessage.contains("not live"))
    // CONTENT-verified delete: a live id with stale/edited text must
    // refuse — its negations would never cancel the stored postings
    assert(intercept[IllegalArgumentException] {
      Bm25Index.delete(even.limit(2).withColumn("text",
        concat(col("text"), lit(" stale"))), path)
    }.getMessage.contains("differs"))
    // UPDATE: re-append the deleted ids with NEW text — old rows are
    // already cancelled, the new postings (and new dls) stand alone
    val updated = dead.withColumn("text",
      concat(col("text"), lit(" tok1 fresh")))
    Bm25Index.append(updated, path)
    val wantDf = even.unionByName(updated)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(TextAnalysis.bm25(wantDf, "doc_id", "text", terms)))
  }

  test("compactDeltas preserves negative (cancelling) rows; purge " +
      "materializes the survivors-only tables; both score-invariant") {
    val path = tmp("bmidx-cmp")
    Bm25Index.buildIfAbsent(corpus(0, 20), "text", "doc_id", path)
    Bm25Index.append(corpus(20, 30), path)
    Bm25Index.append(corpus(30, 40), path)
    Bm25Index.delete(corpus(0, 5), path)
    val before = scores(Bm25Index.score(spark, path, terms))
    assert(Bm25Index.compactDeltas(spark, path) == 3)
    assert(scores(Bm25Index.score(spark, path, terms)) == before)
    assert(Bm25Index.purge(spark, path) == 35L)
    assert(scores(Bm25Index.score(spark, path, terms)) == before)
    // purged artifact == direct survivors-only build, bit for bit
    val survivors = corpus(5, 40)
    assert(Bm25Index.buildIfAbsent(survivors, "text", "doc_id", path)
      .reused)
    assert(before == scores(TextAnalysis.bm25(survivors, "doc_id",
      "text", terms)))
    // post-purge appends keep working
    assert(!Bm25Index.append(corpus(0, 2), path).reused)
  }

  test("a torn append (staged delta, no manifest commit) is " +
      "invisible to reads") {
    val path = tmp("bmidx-torn")
    Bm25Index.buildIfAbsent(corpus(0, 30), "text", "doc_id", path)
    val before = scores(Bm25Index.score(spark, path, terms))
    // simulate the crash: stage a delta dir WITHOUT the manifest write
    corpus(30, 40).select(col("doc_id"),
        TextAnalysis.tokens(lower(col("text"))).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("__t"))
      .groupBy("doc_id", "__t").agg(count(lit(1)).as("__tf"))
      .withColumn("tb", pmod(xxhash64(col("__t")), lit(64)).cast("int"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/deltas/d99/tf")
    assert(scores(Bm25Index.score(spark, path, terms)) == before)
    // the retry lands under a fresh, never-reused delta name
    assert(!Bm25Index.append(corpus(30, 40), path).reused)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(TextAnalysis.bm25(corpus(), "doc_id", "text", terms)))
  }

  test("scoreMany equals per-query score: one postings pass serves " +
      "the whole workload") {
    import spark.implicits._
    val path = tmp("bmidx-many")
    Bm25Index.buildIfAbsent(corpus(), "text", "doc_id", path)
    val workload = Seq(
      (0L, "tok1"), (0L, "tok3"), (0L, "rare"),
      (1L, "tok2"), (1L, "rare"),
      (2L, "word7"),
      (3L, "nosuchterm")).toDF("qid", "term")
    val got = Bm25Index.scoreMany(spark, path, workload, "qid", "term")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Seq(
      0L -> Seq("tok1", "tok3", "rare"),
      1L -> Seq("tok2", "rare"),
      2L -> Seq("word7")).flatMap { case (qid, ts) =>
      scores(Bm25Index.score(spark, path, ts))
        .map { case (id, s) => (qid, id, s) }
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("applyBatch: a replayed mixed insert/delete micro-batch " +
      "applies once, the index equals the sequential fold, and a " +
      "same-batch delete + insert is a legal update") {
    val path = tmp("bmidx-cdc")
    Bm25Index.buildIfAbsent(corpus(0, 30), "text", "doc_id", path)
    val newDoc5 = corpus(5, 6).withColumn("text",
      concat(col("text"), lit(" tok1 fresh")))
    val b0 = corpus(30, 40).withColumn("op", lit("I"))
      .unionByName(corpus(0, 6).withColumn("op", lit("D")))
      .unionByName(newDoc5.withColumn("op", lit("I")))
    val r0 = Bm25Index.applyBatch(b0, 0L, path)
    assert(!r0.reused)
    // at-least-once replay: the WHOLE batch skips — no window where
    // the inserts committed but the deletes did not
    val replay = Bm25Index.applyBatch(b0, 0L, path)
    assert(replay.reused && replay.fingerprint == r0.fingerprint &&
      replay.count == r0.count)
    val wantDf = corpus(6, 40).unionByName(newDoc5)
    val (wfp, wn) = Bm25Index.fingerprint(wantDf, "doc_id", "text")
    assert(r0.fingerprint == wfp && r0.count == wn)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(TextAnalysis.bm25(wantDf, "doc_id", "text", terms)))
  }

  test("cdcSink maintains the index from a mixed CDC stream through " +
      "foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val path = tmp("bmidx-sink")
    Bm25Index.buildIfAbsent(corpus(0, 20), "text", "doc_id", path)
    def rowsOf(df: org.apache.spark.sql.DataFrame, op: String) =
      df.collect().map(r => (r.getLong(0), r.getString(1), op)).toSeq
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val q = input.toDF().toDF("doc_id", "text", "op")
      .writeStream.foreachBatch(Bm25Index.cdcSink(path)).start()
    input.addData(rowsOf(corpus(20, 25), "I") ++
      rowsOf(corpus(0, 2), "D"): _*)
    q.processAllAvailable()
    input.addData(rowsOf(corpus(25, 30), "I"): _*)
    q.processAllAvailable()
    q.stop()
    val wantDf = corpus(2, 30)
    assert(scores(Bm25Index.score(spark, path, terms))
      == scores(TextAnalysis.bm25(wantDf, "doc_id", "text", terms)))
  }

  test("appendBatch is exactly-once: a replayed micro-batch id is " +
      "skipped") {
    val path = tmp("bmidx-bat")
    Bm25Index.buildIfAbsent(corpus(0, 30), "text", "doc_id", path)
    val b = Bm25Index.appendBatch(corpus(30, 35), 0L, path)
    assert(!b.reused)
    val replay = Bm25Index.appendBatch(corpus(30, 35), 0L, path)
    assert(replay.reused && replay.fingerprint == b.fingerprint)
    assert(!Bm25Index.appendBatch(corpus(35, 40), 1L, path).reused)
  }
}
