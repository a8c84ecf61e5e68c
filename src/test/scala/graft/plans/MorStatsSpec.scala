package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.{ColStats, MergeOnRead}

/** Fold-aware column statistics over a [[MergeOnRead]] CDC base —
  * the verified append-only contract, mechanically:
  *
  *  - a table created with `trackAppendOnly` proves, at each
  *    compaction, that the fold dropped no row (per-bucket counts);
  *    [[MergeOnRead.appendOnlyRows]] then equals the live row count;
  *  - [[ColStatsInjection.register]] accepts a LIVE mor-source read
  *    under exactly that proof (plus pending-empty and count
  *    equality) and REFUSES everything else with guidance;
  *  - the full loop: batch lands on table + artifact → pin stale and
  *    refresh refuses (pending batches are unverified) → compaction
  *    verifies → refresh re-pins → a metadata-only global aggregate
  *    over the mor relation serves from the profile with zero scan;
  *  - a delete-bearing (or re-keying) feed flips the proof off
  *    permanently: compaction commits `ao = false`, and both
  *    register and refresh refuse thereafter.
  */
class MorStatsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = {
    val s = SparkTestSession.spark
    ColStatsInjection.install(s)
    s
  }

  override def afterAll(): Unit = ColStatsInjection.clear()

  private def rows(from: Int, until: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (from until until).map(i => (i.toLong, s"g${i % 5}", i.toLong * 3))
      .toDF("k", "g", "x")
  }

  private def withOpSeq(df: DataFrame, op: String,
      seq: Long): DataFrame =
    df.withColumn("op", lit(op)).withColumn("seq", lit(seq))

  test("create with trackAppendOnly verifies key uniqueness and " +
      "records counts; duplicate keys refuse; compaction keeps the " +
      "proof for an insert-only feed and appendOnlyRows is exact") {
    val root = Files.createTempDirectory("graft-morstats-ao").toString
    val dir = s"$root/tbl"
    MergeOnRead.create(rows(0, 300), dir, Seq("k"), nBuckets = 4,
      trackAppendOnly = true)
    assert(MergeOnRead.appendOnlyRows(dir).contains(300L))
    // fresh-key inserts keep the proof across a compaction
    MergeOnRead.append(withOpSeq(rows(300, 400), "I", 1L), dir)
    MergeOnRead.compact(spark, dir)
    assert(MergeOnRead.appendOnlyRows(dir).contains(400L))
    assert(MergeOnRead.read(spark, dir).count() == 400L)
    // duplicate keys in the snapshot refuse at create
    intercept[IllegalArgumentException] {
      MergeOnRead.create(rows(0, 10).union(rows(0, 10)),
        s"$root/dup", Seq("k"), nBuckets = 2, trackAppendOnly = true)
    }
    // an untracked table never reports a verified count
    MergeOnRead.create(rows(0, 50), s"$root/plain", Seq("k"),
      nBuckets = 2)
    assert(MergeOnRead.appendOnlyRows(s"$root/plain").isEmpty)
  }

  test("a delete (or re-key) flips the proof off permanently at the " +
      "compaction that folds it") {
    val root = Files.createTempDirectory("graft-morstats-del").toString
    val dir = s"$root/tbl"
    MergeOnRead.create(rows(0, 200), dir, Seq("k"), nBuckets = 4,
      trackAppendOnly = true)
    MergeOnRead.append(withOpSeq(rows(0, 5), "D", 1L), dir)
    MergeOnRead.compact(spark, dir)
    assert(MergeOnRead.appendOnlyRows(dir).isEmpty)
    // and it never comes back, even after clean inserts
    MergeOnRead.append(withOpSeq(rows(500, 520), "I", 2L), dir)
    MergeOnRead.compact(spark, dir)
    assert(MergeOnRead.appendOnlyRows(dir).isEmpty)
    // a re-keying "insert" (existing key) breaks it the same way
    val dir2 = s"$root/tbl2"
    MergeOnRead.create(rows(0, 200), dir2, Seq("k"), nBuckets = 4,
      trackAppendOnly = true)
    MergeOnRead.append(withOpSeq(rows(0, 3), "I", 1L), dir2)
    MergeOnRead.compact(spark, dir2)
    assert(MergeOnRead.appendOnlyRows(dir2).isEmpty)
  }

  test("the full loop: register on the verified mor base, batch → " +
      "refresh refuses (pending), compact → refresh re-pins, " +
      "metadata-only aggregate serves with zero scan, exactly") {
    ColStatsInjection.clear()
    val root = Files.createTempDirectory("graft-morstats-loop").toString
    val dir = s"$root/tbl"
    val statsD = s"$root/cs"
    MergeOnRead.create(rows(0, 300), dir, Seq("k"), nBuckets = 4,
      trackAppendOnly = true)
    def mor: DataFrame = spark.read.format("mor").load(dir)
    ColStats.buildIfAbsent(mor, Seq("k", "x"), Seq("g"), statsD)
    ColStatsInjection.register(spark, mor, statsD)
    // a stream batch lands on BOTH sides (the fleet shape)
    val batch = withOpSeq(rows(300, 360), "I", 1L)
    MergeOnRead.streamAppend(batch, 0L, dir)
    ColStats.applyBatch(batch, 0L, statsD)
    // pending batches are unverified: the refresh refuses
    val r1 = ColStatsInjection.refreshPins(spark).collect().head
    assert(!r1.getBoolean(1) && r1.getString(2).contains("compact"),
      r1.getString(2))
    // compaction verifies the fold; the refresh re-pins
    MergeOnRead.compact(spark, dir)
    val r2 = ColStatsInjection.refreshPins(spark).collect().head
    assert(r2.getBoolean(1), r2.getString(2))
    // metadata-only serve over the LIVE mor relation: zero scan
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW morstats_tbl " +
      s"USING mor OPTIONS (path '$dir')")
    val q = """SELECT count(*) AS n, min(x) AS mn, max(x) AS mx,
              |  sum(x) AS sx, count(g) AS ng
              |FROM morstats_tbl""".stripMargin
    val served = spark.sql(q)
    val phys = served.queryExecution.executedPlan.toString
    // zero scan: neither the mor relation nor any file source
    // survives planning (the answer folds to a one-row local plan)
    assert(!phys.contains("MorRelation") && !phys.contains("FileScan"),
      phys)
    // exact: equals the direct fold-and-aggregate answer
    ColStatsInjection.clear()
    val truth = spark.sql(q).collect().head
    assert(served.collect().head == truth)
    // status() reports the mor pin's live freshness directly
    ColStatsInjection.register(spark, mor, statsD)
    val st = ColStatsInjection.status(spark).collect().head
    assert(st.getAs[Boolean]("base_fresh") &&
      st.getAs[Boolean]("version_fresh"))
    ColStatsInjection.clear()
  }

  test("on-demand fold verification (compactMor): the refresh hook " +
      "itself compacts-and-verifies pending batches, restoring the " +
      "metadata serve with no manual compact; a delete-bearing " +
      "batch still poisons the proof permanently") {
    ColStatsInjection.clear()
    val root = Files.createTempDirectory("graft-morstats-od").toString
    val dir = s"$root/tbl"
    val statsD = s"$root/cs"
    MergeOnRead.create(rows(0, 300), dir, Seq("k"), nBuckets = 4,
      trackAppendOnly = true)
    def mor: DataFrame = spark.read.format("mor").load(dir)
    ColStats.buildIfAbsent(mor, Seq("k", "x"), Seq("g"), statsD)
    ColStatsInjection.register(spark, mor, statsD)
    val batch = withOpSeq(rows(300, 360), "I", 1L)
    MergeOnRead.streamAppend(batch, 0L, dir)
    ColStats.applyBatch(batch, 0L, statsD)
    // the sink hook, compactMor = true: no manual compact anywhere
    ColStatsInjection.refreshingSink(spark, compactMor = true)(
      batch, 0L)
    // the fold happened and verified (the proof survived the batch)
    assert(MergeOnRead.state(dir).pending.isEmpty)
    assert(MergeOnRead.appendOnlyRows(dir).contains(360L))
    // the serve is metadata-only right now
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW morstats_od_tbl " +
      s"USING mor OPTIONS (path '$dir')")
    val q = """SELECT count(*) AS n, min(x) AS mn, max(x) AS mx,
              |  sum(x) AS sx FROM morstats_od_tbl""".stripMargin
    val served = spark.sql(q)
    val phys = served.queryExecution.executedPlan.toString
    assert(!phys.contains("MorRelation") && !phys.contains("FileScan"),
      phys)
    val got = served.collect().head
    ColStatsInjection.clear()
    assert(got == spark.sql(q).collect().head)
    // a DELETE-bearing batch: the on-demand fold flips the proof off
    // permanently and the refresh refuses with rebuild guidance —
    // on-demand changes WHEN verification runs, not what it proves
    ColStatsInjection.register(spark, mor, statsD)
    val del = withOpSeq(rows(0, 3), "D", 1L)
    MergeOnRead.streamAppend(del, 1L, dir)
    // the artifact side refuses the delete outright (monotone stats)
    intercept[UnsupportedOperationException] {
      ColStats.applyBatch(del, 1L, statsD)
    }
    // the on-demand refresh folds the batch (flipping the proof off
    // PERMANENTLY) and refuses — the delete-bearing feed can never
    // re-converge with an append-only profile
    val r = ColStatsInjection.refreshPins(spark, compactMor = true)
      .collect().head
    assert(!r.getBoolean(1), r.getString(2))
    assert(MergeOnRead.appendOnlyRows(dir).isEmpty)
    // and it never comes back: later on-demand refreshes and fresh
    // registrations refuse with the append-only rebuild guidance
    val r2 = ColStatsInjection.refreshPins(spark, compactMor = true)
      .collect().head
    assert(!r2.getBoolean(1), r2.getString(2))
    ColStatsInjection.clear()
    val e = intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark, mor, statsD)
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)
    ColStatsInjection.clear()
  }

  test("register refuses: pending batches, unverified tables, " +
      "delete-poisoned tables, version-pinned reads, count drift") {
    ColStatsInjection.clear()
    val root = Files.createTempDirectory("graft-morstats-ref").toString
    val dir = s"$root/tbl"
    val statsD = s"$root/cs"
    MergeOnRead.create(rows(0, 100), dir, Seq("k"), nBuckets = 2,
      trackAppendOnly = true)
    def mor: DataFrame = spark.read.format("mor").load(dir)
    ColStats.buildIfAbsent(mor, Seq("k", "x"), Seq("g"), statsD)
    // pending batch → refuse
    MergeOnRead.append(withOpSeq(rows(100, 110), "I", 1L), dir)
    val e1 = intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark, mor, statsD)
    }
    assert(e1.getMessage.contains("compact"), e1.getMessage)
    MergeOnRead.compact(spark, dir)
    // count drift (the artifact missed the batch) → refuse
    val e2 = intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark, mor, statsD)
    }
    assert(e2.getMessage.contains("diverge"), e2.getMessage)
    ColStats.append(rows(100, 110), statsD)
    ColStatsInjection.register(spark, mor, statsD) // now registrable
    ColStatsInjection.clear()
    // an untracked table → refuse with tracking guidance
    val dirU = s"$root/untracked"
    MergeOnRead.create(rows(0, 50), dirU, Seq("k"), nBuckets = 2)
    ColStats.buildIfAbsent(spark.read.format("mor").load(dirU),
      Seq("k", "x"), Seq("g"), s"$root/csU")
    val e3 = intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark,
        spark.read.format("mor").load(dirU), s"$root/csU")
    }
    assert(e3.getMessage.contains("trackAppendOnly"), e3.getMessage)
    // a delete-poisoned table → refuse (monotone stats cannot
    // describe a fold that dropped rows)
    val dirD = s"$root/deleted"
    MergeOnRead.create(rows(0, 50), dirD, Seq("k"), nBuckets = 2,
      trackAppendOnly = true)
    MergeOnRead.append(withOpSeq(rows(0, 2), "D", 1L), dirD)
    MergeOnRead.compact(spark, dirD)
    ColStats.buildIfAbsent(spark.read.format("mor").load(dirD),
      Seq("k", "x"), Seq("g"), s"$root/csD")
    val e4 = intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark,
        spark.read.format("mor").load(dirD), s"$root/csD")
    }
    assert(e4.getMessage.contains("append-only"), e4.getMessage)
    // a version-pinned (time-travel) read is a different table
    val v = MergeOnRead.versions(dir).max
    intercept[IllegalArgumentException] {
      ColStatsInjection.register(spark,
        spark.read.format("mor").option("version", v.toString)
          .load(dir), statsD)
    }
  }
}
