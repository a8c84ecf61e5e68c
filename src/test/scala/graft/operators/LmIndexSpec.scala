package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class LmIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // overlapping token windows so uni/bi/tri all have shared and
  // doc-specific grams
  private def corpus(from: Int = 0, until: Int = 40) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toLong, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} " +
        s"tok${(i + 3) % 7} word$i tail${i % 3}")
    }.toDF("doc_id", "text")
  }

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  private def scores(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

  test("persisted score equals the in-plan stupidBackoff, and a " +
      "second build reuses") {
    val path = tmp("lmidx")
    val train = corpus().filter(col("doc_id") % 2 === 0)
    assert(!LmIndex.buildIfAbsent(train, "text", "doc_id", path).reused)
    assert(LmIndex.buildIfAbsent(train, "text", "doc_id", path).reused)
    val scoredDf = LmIndex.score(spark, path, corpus(), "doc_id",
      "text")
    val got = scores(scoredDf)
    val want = scores(TextAnalysis.stupidBackoff(train, corpus(),
      "doc_id", "text"))
    assert(got == want && got.nonEmpty)
    // the corpus-sweep serve plan carries N from the manifest — no
    // unigram-total aggregate, no 1-row stats cross
    val plan = scoredDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "manifest-carried N must remove the 1-row stats cross")
    // the SMALL-BATCH serving shape prunes every count-table read to
    // the batch's own gram buckets (gb partition filters) and scores
    // identically
    val small = LmIndex.scoreBatch(spark, path,
      corpus(0, 2), "doc_id", "text")
    assert(scores(small) ==
      scores(LmIndex.score(spark, path, corpus(0, 2), "doc_id", "text")))
    val smallPlan = small.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*gb".r.findFirstIn(smallPlan)
      .isDefined, s"expected a gb partition filter in:\n$smallPlan")
    assert(!smallPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("append composes the fingerprint and counts to the full-build " +
      "LM; re-training a live doc refuses") {
    val path = tmp("lmidx-app")
    val fullPath = tmp("lmidx-full")
    LmIndex.buildIfAbsent(corpus(0, 25), "text", "doc_id", path)
    val app = LmIndex.append(corpus(25, 40), path)
    val full = LmIndex.buildIfAbsent(corpus(), "text", "doc_id", fullPath)
    assert(app.fingerprint == full.fingerprint && app.count == full.count)
    assert(LmIndex.buildIfAbsent(corpus(), "text", "doc_id", path).reused)
    assert(scores(LmIndex.score(spark, path, corpus(), "doc_id", "text"))
      == scores(LmIndex.score(spark, fullPath, corpus(), "doc_id",
        "text")))
    assert(intercept[IllegalArgumentException] {
      LmIndex.append(corpus(30, 32), path)
    }.getMessage.contains("shares"))
  }

  test("delete negates counts back out: scores equal a survivors-only " +
      "LM, guards fire, and a deleted doc can be re-appended " +
      "(the counts cancel exactly)") {
    val path = tmp("lmidx-del")
    LmIndex.buildIfAbsent(corpus(), "text", "doc_id", path)
    val dead = corpus().filter(col("doc_id") % 2 === 1)
    val del = LmIndex.delete(dead, path)
    val even = corpus().filter(col("doc_id") % 2 === 0)
    val evenBuild = LmIndex.buildIfAbsent(even, "text", "doc_id",
      tmp("lmidx-even"))
    assert(del.fingerprint == evenBuild.fingerprint &&
      del.count == evenBuild.count)
    // the q93 shape: scoring everything under the even-doc LM
    assert(scores(LmIndex.score(spark, path, corpus(), "doc_id", "text"))
      == scores(TextAnalysis.stupidBackoff(even, corpus(), "doc_id",
        "text")))
    // the deleted-from artifact satisfies a survivors-only rebuild
    assert(LmIndex.buildIfAbsent(even, "text", "doc_id", path).reused)
    assert(intercept[IllegalArgumentException] {
      LmIndex.delete(dead.limit(2), path)
    }.getMessage.contains("not live"))
    // CONTENT-verified delete: a live id with stale/edited text must
    // refuse — its negated counts would never cancel the stored grams
    assert(intercept[IllegalArgumentException] {
      LmIndex.delete(even.limit(2).withColumn("text",
        concat(col("text"), lit(" stale"))), path)
    }.getMessage.contains("differs"))
    // count algebra supports RE-ADD after delete (unlike tombstones):
    // +c  -c  +c sums to +c
    val back = LmIndex.append(dead, path)
    val (fullFp, fullN) = LmIndex.fingerprint(corpus(), "doc_id", "text")
    assert(back.fingerprint == fullFp && back.count == fullN)
    assert(scores(LmIndex.score(spark, path, corpus(), "doc_id", "text"))
      == scores(TextAnalysis.stupidBackoff(corpus(), corpus(), "doc_id",
        "text")))
  }

  test("compactDeltas preserves negative (cancelling) rows; purge " +
      "materializes the survivors-only tables; both score-invariant") {
    val path = tmp("lmidx-cmp")
    LmIndex.buildIfAbsent(corpus(0, 20), "text", "doc_id", path)
    LmIndex.append(corpus(20, 30), path)
    LmIndex.append(corpus(30, 40), path)
    LmIndex.delete(corpus(0, 5), path)
    val before = scores(LmIndex.score(spark, path, corpus(), "doc_id",
      "text"))
    assert(LmIndex.compactDeltas(spark, path) == 3)
    assert(scores(LmIndex.score(spark, path, corpus(), "doc_id",
      "text")) == before)
    assert(LmIndex.purge(spark, path) == 35L)
    assert(scores(LmIndex.score(spark, path, corpus(), "doc_id",
      "text")) == before)
    // purged artifact == direct survivors-only build, bit for bit
    val survivors = corpus(5, 40)
    assert(LmIndex.buildIfAbsent(survivors, "text", "doc_id", path)
      .reused)
    assert(before == scores(TextAnalysis.stupidBackoff(survivors,
      corpus(), "doc_id", "text")))
    // post-purge appends keep working
    assert(!LmIndex.append(corpus(0, 2), path).reused)
  }

  test("appendBatch is exactly-once: a replayed micro-batch id is " +
      "skipped") {
    val path = tmp("lmidx-bat")
    LmIndex.buildIfAbsent(corpus(0, 30), "text", "doc_id", path)
    val b = LmIndex.appendBatch(corpus(30, 35), 0L, path)
    assert(!b.reused)
    val replay = LmIndex.appendBatch(corpus(30, 35), 0L, path)
    assert(replay.reused && replay.fingerprint == b.fingerprint)
    assert(!LmIndex.appendBatch(corpus(35, 40), 1L, path).reused)
  }

  test("the append/delete guard's ledger read is PRUNED to the probe " +
      "ids' ib partitions — never the whole corpus ledger") {
    import org.apache.spark.sql.functions._
    val path = tmp("lmidx-prune")
    LmIndex.buildIfAbsent(corpus(0, 30), "text", "doc_id", path,
      gbParts = 4, ibParts = 8)
    LmIndex.append(corpus(30, 40), path) // a delta root prunes too
    val probe = corpus(0, 3).select(col("doc_id"))
    val guard = LmIndex.liveIdsForProbe(spark, path, probe)
    // the pruned read still proves liveness for every probed id
    assert(guard.join(broadcast(probe), Seq("doc_id"), "left_semi")
      .count() == 3)
    // the probe's id-hash buckets must reach BOTH ledger scans (base
    // and delta) as STATIC ib partition filters
    val plan = guard.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ib".r.findAllIn(plan).size >= 2,
      s"expected ib partition filters on both ledger reads in:\n$plan")
    // and the guards stay exact on the bucketed layout
    intercept[IllegalArgumentException] {
      LmIndex.append(corpus(35, 45), path)
    }
    val stale = corpus(10, 12).withColumn("text", lit("edited body"))
    intercept[IllegalArgumentException] { LmIndex.delete(stale, path) }
    assert(!LmIndex.delete(corpus(10, 12), path).reused)
  }
}
