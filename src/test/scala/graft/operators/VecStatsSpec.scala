package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class VecStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  // deterministic integer vectors, 8 dims, values vary by (id, dim)
  private def corpus(from: Int = 0, until: Int = 40) = {
    import spark.implicits._
    (from until until).map { i =>
      (i.toLong, (0 until 8).map(d =>
        ((i * 31 + d * 7) % 201 - 100).toLong))
    }.toDF("vec_id", "q")
  }

  private def summaryOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
      r.getDouble(3))).toSet

  /** Hand oracle: per-dim exact sums over the given rows. */
  private def handSummary(rows: Seq[(Long, Seq[Long])]) =
    rows.flatMap { case (_, v) => v.zipWithIndex }
      .groupBy(_._2).map { case (d, vs) =>
        val xs = vs.map(_._1)
        val n = xs.length.toLong
        val mean = xs.sum.toDouble / n
        val variance = math.max(
          xs.map(x => x.toDouble * x).sum / n - mean * mean, 0.0)
        (d, n,
          BigDecimal(mean).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          BigDecimal(math.sqrt(variance))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSet

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq

  test("summary equals exact per-dim statistics; second build reuses") {
    val path = tmp("vstats")
    assert(!VecStats.buildIfAbsent(corpus(), "q", "vec_id", path).reused)
    assert(VecStats.buildIfAbsent(corpus(), "q", "vec_id", path).reused)
    assert(summaryOf(VecStats.summary(spark, path)) ==
      handSummary(rowsOf(corpus())))
  }

  test("append composes to the full build; delete negates back out; " +
      "stale-vector and double deletes refuse; compact + purge are " +
      "summary-invariant") {
    val path = tmp("vstats-lc")
    VecStats.buildIfAbsent(corpus(0, 25), "q", "vec_id", path)
    val app = VecStats.append(corpus(25, 40), path)
    val (fullFp, fullN) = VecStats.fingerprint(corpus(), "vec_id", "q")
    assert(app.fingerprint == fullFp && app.count == fullN)
    assert(VecStats.buildIfAbsent(corpus(), "q", "vec_id", path).reused)
    // overlap refuses
    assert(intercept[IllegalArgumentException] {
      VecStats.append(corpus(10, 12), path)
    }.getMessage.contains("shares"))
    // delete odd ids: summary equals a survivors-only computation
    val dead = corpus().filter(col("vec_id") % 2 === 1)
    val del = VecStats.delete(dead, path)
    val evens = (0 until 40).filter(_ % 2 == 0)
      .map(i => (i.toLong, (0 until 8).map(d =>
        ((i * 31 + d * 7) % 201 - 100).toLong)))
    assert(summaryOf(VecStats.summary(spark, path)) == handSummary(evens))
    val (evenFp, evenN) = VecStats.fingerprint(
      corpus().filter(col("vec_id") % 2 === 0), "vec_id", "q")
    assert(del.fingerprint == evenFp && del.count == evenN)
    // double delete refuses; stale-vector delete refuses
    assert(intercept[IllegalArgumentException] {
      VecStats.delete(dead.limit(2), path)
    }.getMessage.contains("not live"))
    assert(intercept[IllegalArgumentException] {
      VecStats.delete(
        corpus(0, 4).filter(col("vec_id") % 2 === 0).withColumn("q",
          transform(col("q"), v => v + 1L)), path)
    }.getMessage.contains("differ"))
    // compaction and purge change nothing observable
    val before = summaryOf(VecStats.summary(spark, path))
    assert(VecStats.compactDeltas(spark, path) >= 2)
    assert(summaryOf(VecStats.summary(spark, path)) == before)
    assert(VecStats.purge(spark, path) == 20L)
    assert(summaryOf(VecStats.summary(spark, path)) == before)
    assert(VecStats.buildIfAbsent(
      corpus().filter(col("vec_id") % 2 === 0), "q", "vec_id", path)
      .reused)
  }

  test("applyBatch applies a mixed insert/delete micro-batch " +
      "exactly-once; drift flags the shifted dimension highest") {
    val path = tmp("vstats-cdc")
    VecStats.buildIfAbsent(corpus(0, 30), "q", "vec_id", path)
    val b0 = corpus(30, 40).withColumn("op", lit("I"))
      .unionByName(corpus(0, 5).withColumn("op", lit("D")))
    val r0 = VecStats.applyBatch(b0, 0L, path)
    val replay = VecStats.applyBatch(b0, 0L, path)
    assert(replay.reused && replay.fingerprint == r0.fingerprint)
    val (wantFp, wantN) = VecStats.fingerprint(corpus(5, 40),
      "vec_id", "q")
    assert(r0.fingerprint == wantFp && r0.count == wantN)
    // drift: a probe batch with dim 3 shifted by +50 must rank dim 3
    // top by z (all other dims are an unshifted subsample)
    val probe = corpus(0, 20).withColumn("q",
      transform(col("q"), (v, i) =>
        v + when(i === 3, 50L).otherwise(0L)))
    val z = VecStats.drift(spark, path, probe, "q")
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(z.size == 8)
    assert(z(3) == z.values.max,
      s"dim 3 must carry the largest drift z, got $z")
  }

  test("the append/delete guard's ledger read is PRUNED to the probe " +
      "ids' ib partitions — never the whole corpus ledger") {
    val path = tmp("vstats-prune")
    VecStats.buildIfAbsent(corpus(0, 40), "q", "vec_id", path,
      ibParts = 8)
    VecStats.append(corpus(40, 60), path) // a delta root prunes too
    val probe = corpus(0, 3).select(col("vec_id"))
    val guard = VecStats.liveIdsForProbe(spark, path, probe)
    // the pruned read still proves liveness for every probed id
    assert(guard.join(broadcast(probe), Seq("vec_id"), "left_semi")
      .count() == 3)
    // the probe's id-hash buckets must reach BOTH ledger scans (base
    // and delta) as STATIC ib partition filters — the q209-style pin
    val plan = guard.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*ib".r
      .findAllIn(plan).size >= 2,
      s"expected ib partition filters on both ledger reads in:\n$plan")
    // and the guards stay exact on the bucketed layout: an
    // overlapping append refuses, a stale-vector delete refuses
    intercept[IllegalArgumentException] {
      VecStats.append(corpus(55, 65), path)
    }
    val stale = corpus(10, 12).withColumn("q",
      array((0 until 8).map(_ => lit(1L)): _*))
    intercept[IllegalArgumentException] {
      VecStats.delete(stale, path)
    }
    assert(!VecStats.delete(corpus(10, 12), path).reused)
  }
}
