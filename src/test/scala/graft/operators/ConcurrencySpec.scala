package graft.operators

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.operators.AggView.Measure

/** Multi-writer LIVENESS of the persisted-artifact control plane:
  * the versioned no-overwrite commits make lost updates impossible
  * ([[IndexDirsSpec]]); [[IndexDirs.commitWithRetry]] makes racing
  * writers CONVERGE instead of one of them failing — N uncoordinated
  * ingest jobs can maintain one artifact, the 100 TB operating mode
  * (per-hour ingest jobs land whenever they finish, no lock service).
  */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/view"

  private def facts(from: Int, until: Int) = {
    import spark.implicits._
    (from until until).map { i =>
      (s"g${i % 5}", i % 3, (i * 7 % 101).toLong)
    }.toDF("grp", "sub", "v")
  }

  private val measures =
    Seq(Measure("v_sum", "v"), Measure("v2_sum", "v * v"))

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

  /** Run the thunks concurrently from a common start gate; rethrow
    * the first failure.
    */
  private def race(thunks: Seq[() => Unit]): Unit = {
    val start = new CountDownLatch(1)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = thunks.map { t =>
      new Thread(() => {
        start.await()
        try t() catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(120000))
    if (!errors.isEmpty) throw errors.peek()
  }

  test("8 uncoordinated concurrent appends all land exactly once: " +
      "the view, count, and composed fingerprint equal the " +
      "sequential fold's") {
    val path = tmp("conc-append")
    AggView.buildIfAbsent(facts(0, 40), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    race((0 until 8).map { i => () =>
      AggView.append(facts(40 + 20 * i, 60 + 20 * i), path); ()
    })
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 200))
    // fingerprint/count must equal a one-shot build over everything
    // (xor composition is order-free, so ANY interleaving matches)
    val oneShot = AggView.buildIfAbsent(facts(0, 200), Seq("grp", "sub"),
      measures, tmp("conc-oneshot"), kbParts = 8)
    val folded = AggView.append(facts(0, 0), path) // no-op: reads state
    assert(folded.fingerprint == oneShot.fingerprint &&
      folded.count == oneShot.count)
  }

  test("4 racing replays of ONE batch id apply exactly once and the " +
      "losers leave no orphan deltas in the manifest") {
    val path = tmp("conc-batch")
    AggView.buildIfAbsent(facts(0, 150), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    val b0 = facts(150, 200).withColumn("op", lit("I"))
      .unionByName(facts(0, 30).withColumn("op", lit("D")))
    race((0 until 4).map { _ => () =>
      AggView.applyBatch(b0, 0L, path); ()
    })
    assert(viewOf(AggView.read(spark, path)) == handView(30 until 200))
    val once = AggView.buildIfAbsent(facts(30, 200), Seq("grp", "sub"),
      measures, tmp("conc-batch-once"), kbParts = 8)
    val state = AggView.applyBatch(b0, 0L, path) // replay: skips
    assert(state.reused && state.fingerprint == once.fingerprint &&
      state.count == once.count)
  }

  test("appends racing a compaction and a purge are never lost") {
    val path = tmp("conc-maint")
    AggView.buildIfAbsent(facts(0, 40), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    AggView.append(facts(40, 80), path)
    AggView.append(facts(80, 120), path)
    // appends never read the view's files, so they may race
    // maintenance freely (readers of GC'd state are the documented
    // single-maintainer contract, not append's problem)
    race(Seq(
      () => { AggView.compactDeltas(spark, path); () },
      () => { AggView.append(facts(120, 160), path); () },
      () => { AggView.append(facts(160, 200), path); () }))
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 200))
    // purge racing one more append: both effects must survive
    race(Seq(
      () => { AggView.purge(spark, path); () },
      () => { AggView.append(facts(200, 240), path); () }))
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 240))
    // and the artifact is still fully functional afterwards
    AggView.delete(facts(0, 30), path)
    assert(viewOf(AggView.read(spark, path)) == handView(30 until 240))
  }
}
