package graft.operators

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.operators.AggView.Measure

/** Multi-writer LIVENESS of the persisted-artifact control plane,
  * parameterized over ALL SIX index families: the versioned
  * no-overwrite commits make lost updates impossible
  * ([[IndexDirsSpec]]); [[IndexDirs.commitWithRetry]] makes racing
  * writers CONVERGE instead of one of them failing — N uncoordinated
  * ingest jobs can maintain one artifact, the 100 TB operating mode
  * (per-hour ingest jobs land whenever they finish, no lock service).
  * The deterministic purge-interleaving cases use each family's
  * `purgeImpl` seam to pin the exact racing schedules a thread race
  * cannot reproduce reliably.
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

  // ----- the six-family harness ------------------------------------

  /** One persisted-artifact family, adapted to a common mutator
    * surface over deterministic rows indexed [from, until): every
    * scenario below compares a mutated artifact against a ONE-SHOT
    * build over the expected surviving row range — same served
    * content, same composed fingerprint and count.
    */
  private abstract class Family(val name: String) {
    def build(from: Int, until: Int, path: String): IndexBuild
    /** `guarded` = run the per-attempt disjointness guard (safe only
      * when no concurrent maintenance can GC files mid-guard-read).
      */
    def append(from: Int, until: Int, path: String,
        guarded: Boolean): IndexBuild
    def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
        path: String): IndexBuild
    def compact(path: String): Int
    def purge(path: String): Long
    def purgeSeam(path: String, beforeCommit: () => Unit): Long
    /** Canonical served content — read through the family's own
      * serve path, collected to a comparable set.
      */
    def served(path: String): Set[String]
    /** Current (fingerprint, count) without mutating: a no-op append. */
    def probe(path: String): IndexBuild =
      append(0, 0, path, guarded = false)
  }

  private def docs(from: Int, until: Int): DataFrame = {
    import spark.implicits._
    (from until until).map(i => (i.toLong,
      s"doc $i alpha word${i % 7} beta token${i % 11} gamma item$i"))
      .toDF("doc_id", "text")
  }

  private def vecs(from: Int, until: Int): DataFrame = {
    import spark.implicits._
    (from until until).map(i => (i.toLong,
      (0 until 8).map(d => ((i * 31 + d * 7) % 201 - 100).toLong)))
      .toDF("vec_id", "q")
  }

  private def withOps(ins: DataFrame, del: DataFrame): DataFrame =
    ins.withColumn("op", lit("I"))
      .unionByName(del.withColumn("op", lit("D")))

  private val annCents: Seq[Seq[Long]] = {
    val rnd = new scala.util.Random(3)
    Seq.fill(4)(Seq.fill(8)((rnd.nextInt(201) - 100).toLong))
  }

  private val families: Seq[Family] = Seq(
    new Family("aggview") {
      def build(from: Int, until: Int, path: String) =
        AggView.buildIfAbsent(facts(from, until), Seq("grp", "sub"),
          measures, path, kbParts = 8)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        AggView.append(facts(from, until), path)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        AggView.applyBatch(
          withOps(facts(ins._1, ins._2), facts(del._1, del._2)),
          batchId, path)
      def compact(path: String) = AggView.compactDeltas(spark, path)
      def purge(path: String) = AggView.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        AggView.purgeImpl(spark, path, beforeCommit)
      def served(path: String) =
        AggView.read(spark, path).collect().map(_.toString).toSet
    },
    new Family("vecstats") {
      def build(from: Int, until: Int, path: String) =
        VecStats.buildIfAbsent(vecs(from, until), "q", "vec_id", path)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        VecStats.append(vecs(from, until), path, checkDisjoint = guarded)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        VecStats.applyBatch(
          withOps(vecs(ins._1, ins._2), vecs(del._1, del._2)),
          batchId, path)
      def compact(path: String) = VecStats.compactDeltas(spark, path)
      def purge(path: String) = VecStats.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        VecStats.purgeImpl(spark, path, beforeCommit)
      def served(path: String) =
        VecStats.summary(spark, path).collect().map(_.toString).toSet
    },
    new Family("annindex") {
      def build(from: Int, until: Int, path: String) =
        AnnIndex.buildIfAbsent(vecs(from, until), "q", "vec_id",
          annCents, path)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        AnnIndex.append(vecs(from, until), path, checkDisjoint = guarded)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        AnnIndex.applyBatch(
          withOps(vecs(ins._1, ins._2), vecs(del._1, del._2)),
          batchId, path)
      def compact(path: String) = AnnIndex.compactDeltas(spark, path)
      def purge(path: String) = AnnIndex.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        AnnIndex.purgeImpl(spark, path, beforeCommit)
      def served(path: String) = {
        // nprobe = all buckets and k ≥ corpus: the full live row set
        // rides out per-probe, so the set is layout-independent
        val probes = vecs(0, 1).select(col("vec_id").as("pid"), col("q"))
        AnnIndex.searchInt(spark, path, probes, "pid", "q",
            nprobe = annCents.length, k = 100000)
          .select("probe_id", "vec_id")
          .collect().map(_.toString).toSet
      }
    },
    new Family("dedupindex") {
      def build(from: Int, until: Int, path: String) =
        DedupIndex.buildIfAbsent(docs(from, until), "text", "doc_id",
          DedupIndex.MinhashXx(16, 3), bands = 4, path,
          kbParts = 4, sbParts = 4, dbParts = 4)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        DedupIndex.append(docs(from, until), path,
          checkDisjoint = guarded)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        DedupIndex.applyBatch(
          withOps(docs(ins._1, ins._2), docs(del._1, del._2)),
          batchId, path)
      def compact(path: String) = DedupIndex.compactDeltas(spark, path)
      def purge(path: String) = DedupIndex.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        DedupIndex.purgeImpl(spark, path, beforeCommit)
      def served(path: String) =
        DedupIndex.sigs(spark, path).collect()
          .map(r => s"${r.getLong(0)}:${r.getSeq[Long](1).mkString(",")}")
          .toSet
    },
    new Family("lmindex") {
      def build(from: Int, until: Int, path: String) =
        LmIndex.buildIfAbsent(docs(from, until), "text", "doc_id",
          path, gbParts = 4)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        LmIndex.append(docs(from, until), path, checkDisjoint = guarded)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        LmIndex.applyBatch(
          withOps(docs(ins._1, ins._2), docs(del._1, del._2)),
          batchId, path)
      def compact(path: String) = LmIndex.compactDeltas(spark, path)
      def purge(path: String) = LmIndex.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        LmIndex.purgeImpl(spark, path, beforeCommit)
      // scoring reads all three count tables AND the manifest-carried
      // token total, so it pins every piece of served state
      def served(path: String) =
        LmIndex.score(spark, path, docs(0, 3), "doc_id", "text")
          .collect().map(_.toString).toSet
    },
    new Family("bm25index") {
      def build(from: Int, until: Int, path: String) =
        Bm25Index.buildIfAbsent(docs(from, until), "text", "doc_id",
          path, tbParts = 8, dlParts = 4)
      def append(from: Int, until: Int, path: String, guarded: Boolean) =
        Bm25Index.append(docs(from, until), path,
          checkDisjoint = guarded)
      def applyBatch(ins: (Int, Int), del: (Int, Int), batchId: Long,
          path: String) =
        Bm25Index.applyBatch(
          withOps(docs(ins._1, ins._2), docs(del._1, del._2)),
          batchId, path)
      def compact(path: String) = Bm25Index.compactDeltas(spark, path)
      def purge(path: String) = Bm25Index.purge(spark, path)
      def purgeSeam(path: String, beforeCommit: () => Unit) =
        Bm25Index.purgeImpl(spark, path, beforeCommit)
      // scores read the tf + dl tables and the manifest (n, sdl)
      def served(path: String) =
        Bm25Index.score(spark, path, Seq("alpha", "word1", "token3"))
          .collect().map(_.toString).toSet
    })

  /** served + fingerprint + count of `path` must equal a fresh
    * one-shot build over rows [from, until) at another path.
    */
  private def assertEqualsOneShot(f: Family, path: String,
      from: Int, until: Int): Unit = {
    val ref = tmp(s"conc-${f.name}-ref")
    val oneShot = f.build(from, until, ref)
    val state = f.probe(path)
    assert(f.served(path) == f.served(ref),
      s"${f.name}: served content diverged from the sequential fold")
    assert(state.fingerprint == oneShot.fingerprint &&
      state.count == oneShot.count,
      s"${f.name}: composed fingerprint/count diverged from one-shot")
  }

  for (f <- families) {
    test(s"${f.name}: 8 uncoordinated concurrent appends all land " +
        "exactly once — view, count, and composed fingerprint equal " +
        "the sequential fold's") {
      val path = tmp(s"conc-${f.name}-append")
      f.build(0, 40, path)
      race((0 until 8).map { i => () =>
        f.append(40 + 10 * i, 50 + 10 * i, path, guarded = true); ()
      })
      assertEqualsOneShot(f, path, 0, 120)
    }

    test(s"${f.name}: 4 racing replays of ONE batch id apply exactly " +
        "once and the losers leave no orphan deltas in the manifest") {
      val path = tmp(s"conc-${f.name}-batch")
      f.build(0, 60, path)
      race((0 until 4).map { _ => () =>
        f.applyBatch((60, 80), (0, 10), 0L, path); ()
      })
      // replay after the race: must skip as already-applied
      assert(f.applyBatch((60, 80), (0, 10), 0L, path).reused)
      assertEqualsOneShot(f, path, 10, 80)
    }

    test(s"${f.name}: appends racing a compaction and a purge are " +
        "never lost") {
      val path = tmp(s"conc-${f.name}-maint")
      f.build(0, 30, path)
      f.append(30, 60, path, guarded = true)
      f.append(60, 90, path, guarded = true)
      // unguarded appends never read the artifact's files, so they
      // may race maintenance freely (a guard racing a purge's GC is
      // the documented reader-of-GC'd-state hazard, not append's)
      race(Seq(
        () => { f.compact(path); () },
        () => { f.append(90, 110, path, guarded = false); () },
        () => { f.append(110, 130, path, guarded = false); () }))
      assertEqualsOneShot(f, path, 0, 130)
      // purge racing one more append: both effects must survive
      race(Seq(
        () => { f.purge(path); () },
        () => { f.append(130, 150, path, guarded = false); () }))
      assertEqualsOneShot(f, path, 0, 150)
    }

    test(s"${f.name}: a purge whose snapshot deltas were compacted " +
        "away REFUSES instead of double-counting the folded rows") {
      val path = tmp(s"conc-${f.name}-pc")
      f.build(0, 30, path)
      f.append(30, 60, path, guarded = true)
      f.append(60, 90, path, guarded = true)
      // deterministic schedule: purge snapshots + rewrites, then a
      // full compaction commits, then the purge tries to commit —
      // without the subset guard it would keep the fold dir AND the
      // new base that absorbed the same rows
      intercept[IllegalArgumentException] {
        f.purgeSeam(path, () => { f.compact(path); () })
      }
      assertEqualsOneShot(f, path, 0, 90)
      // the artifact purges cleanly afterwards
      f.purge(path)
      assertEqualsOneShot(f, path, 0, 90)
    }

    test(s"${f.name}: two racing purges claim DISJOINT base targets " +
        "and exactly one commits; the loser's rewrite is GC'd") {
      val path = tmp(s"conc-${f.name}-pp")
      f.build(0, 30, path)
      f.append(30, 60, path, guarded = true)
      // deterministic schedule: purge A snapshots + rewrites its
      // claimed target, purge B runs END-TO-END (claiming a DIFFERENT
      // suffix), then A's commit refuses on the base-version guard
      intercept[IllegalArgumentException] {
        f.purgeSeam(path, () => { f.purge(path); () })
      }
      assertEqualsOneShot(f, path, 0, 60)
      // still fully functional: appends and deletes keep working
      f.append(60, 90, path, guarded = true)
      assertEqualsOneShot(f, path, 0, 90)
    }
  }

  // ----- AggView hand-oracle scenarios (kept from the original spec,
  // they pin exact values rather than one-shot equivalence) ---------

  test("aggview hand oracle: 8 uncoordinated concurrent appends land " +
      "exactly once against exact hand-computed sums") {
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

  test("aggview hand oracle: racing replays of one batch id apply " +
      "once (insert + delete mixed)") {
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

  test("aggview hand oracle: appends racing a compaction and a purge " +
      "are never lost; delete still exact afterwards") {
    val path = tmp("conc-maint")
    AggView.buildIfAbsent(facts(0, 40), Seq("grp", "sub"), measures,
      path, kbParts = 8)
    AggView.append(facts(40, 80), path)
    AggView.append(facts(80, 120), path)
    race(Seq(
      () => { AggView.compactDeltas(spark, path); () },
      () => { AggView.append(facts(120, 160), path); () },
      () => { AggView.append(facts(160, 200), path); () }))
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 200))
    race(Seq(
      () => { AggView.purge(spark, path); () },
      () => { AggView.append(facts(200, 240), path); () }))
    assert(viewOf(AggView.read(spark, path)) == handView(0 until 240))
    AggView.delete(facts(0, 30), path)
    assert(viewOf(AggView.read(spark, path)) == handView(30 until 240))
  }
}
