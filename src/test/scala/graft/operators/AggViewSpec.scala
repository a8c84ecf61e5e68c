package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.operators.AggView.Measure

class AggViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/view"

  // deterministic facts: (grp, sub, v) — two key columns, one value
  private def facts(from: Int = 0, until: Int = 200) = {
    import spark.implicits._
    (from until until).map { i =>
      (s"g${i % 5}", i % 3, (i * 7 % 101).toLong)
    }.toDF("grp", "sub", "v")
  }

  private val measures =
    Seq(Measure("v_sum", "v"), Measure("v2_sum", "v * v"))

  /** Hand oracle over the raw tuples: (grp, sub) -> (cnt, Σv, Σv²). */
  private def handView(rows: Seq[Int]): Set[(String, Int, Long, Long, Long)] =
    rows.map(i => (s"g${i % 5}", i % 3, (i * 7 % 101).toLong))
      .groupBy(t => (t._1, t._2))
      .map { case ((g, s), ts) =>
        (g, s, ts.size.toLong, ts.map(_._3).sum,
          ts.map(t => t._3 * t._3).sum)
      }.toSet

  private def viewOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("read equals the direct grouped sums; rebuild reuses; a " +
      "changed measure declaration rebuilds; colliding names refuse") {
    val path = tmp("aggview")
    assert(!AggView.buildIfAbsent(facts(), Seq("grp", "sub"), measures,
      path, kbParts = 8).reused)
    assert(AggView.buildIfAbsent(facts(), Seq("grp", "sub"), measures,
      path, kbParts = 8).reused)
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 200))
    // same facts, different measure expression → a DIFFERENT view
    assert(!AggView.buildIfAbsent(facts(), Seq("grp", "sub"),
      Seq(Measure("v_sum", "v"), Measure("v2_sum", "v * v + 1")),
      path, kbParts = 8).reused)
    assert(intercept[IllegalArgumentException] {
      AggView.buildIfAbsent(facts(), Seq("grp", "sub"),
        Seq(Measure("grp", "v")), tmp("aggview-bad"))
    }.getMessage.contains("collide"))
  }

  test("append-only MIN/MAX measures: inserts fold extrema exactly " +
      "through append + compact + purge; every delete path and " +
      "diff refuse; a kind change is a different view; unknown " +
      "kinds refuse") {
    val path = tmp("aggview-minmax")
    val mm = Seq(Measure("v_sum", "v"),
      Measure("v_min", "v", kind = "min"),
      Measure("v_max", "v", kind = "max"))
    assert(!AggView.buildIfAbsent(facts(0, 120), Seq("grp"), mm, path,
      kbParts = 4).reused)
    assert(AggView.buildIfAbsent(facts(0, 120), Seq("grp"), mm, path,
      kbParts = 4).reused)
    // same declaration with a different KIND = a different view
    assert(!AggView.buildIfAbsent(facts(0, 120), Seq("grp"),
      Seq(Measure("v_sum", "v"), Measure("v_min", "v"),
        Measure("v_max", "v", kind = "max")), path, kbParts = 4).reused)
    AggView.buildIfAbsent(facts(0, 120), Seq("grp"), mm, path,
      kbParts = 4)
    def hand(rows: Seq[Int]): Set[(String, Long, Long, Long, Long)] =
      rows.map(i => (s"g${i % 5}", (i * 7 % 101).toLong))
        .groupBy(_._1).map { case (g, ts) =>
          (g, ts.size.toLong, ts.map(_._2).sum, ts.map(_._2).min,
            ts.map(_._2).max)
        }.toSet
    def got(): Set[(String, Long, Long, Long, Long)] =
      AggView.read(spark, path).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    assert(got() == hand(0 until 120))
    // inserts fold extrema monotonically (min of partial mins)
    AggView.append(facts(120, 200), path)
    assert(got() == hand(0 until 200))
    // maintenance is read-invariant
    AggView.append(facts(200, 230), path)
    AggView.compactDeltas(spark, path)
    assert(got() == hand(0 until 230))
    AggView.purge(spark, path)
    assert(got() == hand(0 until 230))
    // every delete path refuses, loudly
    assert(intercept[IllegalArgumentException] {
      AggView.delete(facts(0, 10), path)
    }.getMessage.contains("min/max"))
    assert(intercept[IllegalArgumentException] {
      AggView.applyBatch(
        facts(0, 10).withColumn("op", lit("D"))
          .unionByName(facts(300, 310).withColumn("op", lit("I"))),
        99L, path)
    }.getMessage.contains("min/max"))
    // an insert-only batch still applies
    AggView.applyBatch(facts(230, 240).withColumn("op", lit("I")),
      100L, path)
    assert(got() == hand(0 until 240))
    // diff refuses (extrema have no negation)
    val vs = AggView.versions(path)
    assert(intercept[IllegalArgumentException] {
      AggView.diff(spark, path, vs.head, vs.last)
    }.getMessage.contains("min/max"))
    // unknown kinds refuse at build
    assert(intercept[IllegalArgumentException] {
      AggView.buildIfAbsent(facts(0, 10), Seq("grp"),
        Seq(Measure("m", "v", kind = "avg")), tmp("aggview-badkind"))
    }.getMessage.contains("unknown measure kind"))
  }

  test("append composes the fingerprint; lookup prunes to the probe " +
      "buckets and equals the filtered read; delete retracts to the " +
      "survivors-only view; over-delete refuses; compact + purge are " +
      "read-invariant") {
    val path = tmp("aggview-lc")
    AggView.buildIfAbsent(facts(0, 120), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    val app = AggView.append(facts(120, 200), path)
    val full = AggView.buildIfAbsent(facts(), Seq("grp", "sub"),
      measures, tmp("aggview-full"), kbParts = 8)
    assert(app.fingerprint == full.fingerprint && app.count == full.count)
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 200))
    // pruned probe serve ≡ the read filtered to the probed group
    import spark.implicits._
    val probe = Seq(("g1", 0), ("g1", 1)).toDF("grp", "sub")
    assert(viewOf(AggView.lookup(spark, path, probe)) ==
      handView(0 until 200).filter(t => t._1 == "g1" && t._2 <= 1))
    // delete facts 0..60: view equals the one built on 60..200 only
    val del = AggView.delete(facts(0, 60), path)
    assert(viewOf(AggView.read(spark, path)) == handView(60 until 200))
    val surv = AggView.buildIfAbsent(facts(60, 200), Seq("grp", "sub"),
      measures, tmp("aggview-surv"), kbParts = 8)
    assert(del.fingerprint == surv.fingerprint && del.count == surv.count)
    // retracting more rows than the groups still hold refuses
    assert(intercept[IllegalArgumentException] {
      AggView.delete(facts(0, 200), path)
    }.getMessage.contains("never absorbed"))
    val before = viewOf(AggView.read(spark, path))
    assert(AggView.compactDeltas(spark, path) >= 2)
    assert(viewOf(AggView.read(spark, path)) == before)
    assert(AggView.purge(spark, path) == before.size)
    assert(viewOf(AggView.read(spark, path)) == before)
    // the post-purge artifact IS the survivors-only view
    assert(AggView.buildIfAbsent(facts(60, 200), Seq("grp", "sub"),
      measures, path, kbParts = 8).reused)
  }

  test("readAsOf serves each retained version exactly as committed; " +
      "a compaction closes the window with the GC'd files named") {
    val path = tmp("aggview-tt")
    AggView.buildIfAbsent(facts(0, 120), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    val vBuilt = AggView.versions(path).max
    AggView.append(facts(120, 200), path)
    val vAppended = AggView.versions(path).max
    AggView.delete(facts(0, 30), path)
    val vDeleted = AggView.versions(path).max
    assert(Seq(vBuilt, vAppended, vDeleted) ==
      Seq(vBuilt, vBuilt + 1, vBuilt + 2))
    // each version serves the state it committed — later ops invisible
    assert(viewOf(AggView.readAsOf(spark, path, vBuilt)) ==
      handView(0 until 120))
    assert(viewOf(AggView.readAsOf(spark, path, vAppended)) ==
      handView(0 until 200))
    assert(viewOf(AggView.readAsOf(spark, path, vDeleted)) ==
      handView(30 until 200))
    // an unknown version names the retained ones
    assert(intercept[IllegalStateException] {
      AggView.readAsOf(spark, path, vDeleted + 50)
    }.getMessage.contains("retained"))
    // compaction GC's the delta dirs the old versions list: the live
    // read is unchanged, but time travel to them now refuses loudly
    AggView.compactDeltas(spark, path)
    assert(viewOf(AggView.read(spark, path)) == handView(30 until 200))
    assert(intercept[IllegalArgumentException] {
      AggView.readAsOf(spark, path, vAppended)
    }.getMessage.contains("garbage-collected"))
    // the build version lists no deltas — it stays servable
    assert(viewOf(AggView.readAsOf(spark, path, vBuilt)) ==
      handView(0 until 120))
  }

  test("diff between versions is the per-group net change, reads " +
      "ONLY the differing files for adjacent versions, and is " +
      "antisymmetric; identical/unknown/GC'd windows handled") {
    val path = tmp("aggview-diff")
    AggView.buildIfAbsent(facts(0, 120), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    val v1 = AggView.versions(path).max
    AggView.append(facts(120, 200), path)
    val v2 = AggView.versions(path).max
    AggView.delete(facts(0, 30), path)
    val v3 = AggView.versions(path).max
    // adjacent append diff = the appended rows' grouped sums…
    assert(viewOf(AggView.diff(spark, path, v1, v2)) ==
      handView(120 until 200))
    // …and its plan reads exactly ONE parquet source (the delta dir)
    val plan = AggView.diff(spark, path, v1, v2)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).length == 1, plan)
    // adjacent delete diff = the retracted rows, negated
    assert(viewOf(AggView.diff(spark, path, v2, v3)) ==
      handView(0 until 30).map(t => (t._1, t._2, -t._3, -t._4, -t._5)))
    // antisymmetric; self-diff empty with the same shape
    assert(viewOf(AggView.diff(spark, path, v3, v1)) ==
      viewOf(AggView.diff(spark, path, v1, v3))
        .map(t => (t._1, t._2, -t._3, -t._4, -t._5)))
    val self = AggView.diff(spark, path, v2, v2)
    assert(self.columns.toSeq == Seq("grp", "sub", "cnt_delta",
      "v_sum_delta", "v2_sum_delta") && self.count() == 0)
    assert(intercept[IllegalStateException] {
      AggView.diff(spark, path, v1, v3 + 9)
    }.getMessage.contains("retained"))
    // compaction closes windows that need the GC'd delta dirs
    AggView.compactDeltas(spark, path)
    assert(intercept[IllegalArgumentException] {
      AggView.diff(spark, path, v1, v2)
    }.getMessage.contains("garbage-collected"))
  }

  test("applyBatch: a replayed mixed insert/delete micro-batch " +
      "applies once; the view equals the sequential fold") {
    val path = tmp("aggview-cdc")
    AggView.buildIfAbsent(facts(0, 150), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    val b0 = facts(150, 200).withColumn("op", lit("I"))
      .unionByName(facts(0, 30).withColumn("op", lit("D")))
    val r0 = AggView.applyBatch(b0, 0L, path)
    val replay = AggView.applyBatch(b0, 0L, path)
    assert(replay.reused && replay.fingerprint == r0.fingerprint &&
      replay.count == r0.count)
    assert(viewOf(AggView.read(spark, path)) == handView(30 until 200))
    val surv = AggView.buildIfAbsent(facts(30, 200), Seq("grp", "sub"),
      measures, tmp("aggview-cdc-surv"), kbParts = 8)
    assert(r0.fingerprint == surv.fingerprint)
  }
}
