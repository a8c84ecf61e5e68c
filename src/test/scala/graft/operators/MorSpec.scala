package graft.operators

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** MergeOnRead: the base+delta layout's THREE load-bearing claims —
  * (1) appends and reads never rewrite the base (write-path
  * assertions on the data directory), (2) compaction touches only
  * the buckets named by a delta, (3) the served state equals the
  * sequential applyChanges fold at every step, including across a
  * mid-stream compaction, crash-torn appends, and all-deleted
  * buckets.
  */
class MorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-mor").toUri.toString
      .stripSuffix("/") + "/t"

  /** java.io view of a file:-scheme URI (the specs inspect the local
    * backing store directly; the operator itself only sees the URI).
    */
  private def local(p: String) = new File(java.net.URI.create(p))

  private def base(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"v$i", i.toLong * 10))
      .toDF("k", "s", "x")
  }

  private def ch(rows: Seq[(Long, String, Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "s", "x", "op", "seq")
  }

  private def state(dir: String): Map[Long, (String, Long)] =
    MergeOnRead.read(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  /** (path, lastModified) of every data file under dir/data. */
  private def dataFiles(dir: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(local(s"$dir/data")).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
  }

  test("append + read serve merged state without touching the base") {
    val dir = tmp()
    MergeOnRead.create(base(100), dir, Seq("k"), nBuckets = 8)
    val before = dataFiles(dir)
    MergeOnRead.append(ch(Seq(
      (1L, "a", 1L, "U", 1L), (1L, "b", 2L, "U", 2L),   // LWW in batch
      (2L, "", 0L, "D", 1L),
      (200L, "new", 7L, "I", 1L))), dir)
    MergeOnRead.append(ch(Seq(
      (1L, "c", 3L, "U", 1L))), dir)                    // batch beats seq
    val got = state(dir)
    assert(dataFiles(dir) === before,
      "append/read must not add, drop, or rewrite any base data file")
    assert(got(1L) === ("c", 3L))
    assert(!got.contains(2L))
    assert(got(200L) === ("new", 7L))
    assert(got(50L) === ("v50", 500L))
    assert(got.size === 100)
  }

  test("compaction rewrites ONLY delta-touched buckets; state survives") {
    val dir = tmp()
    MergeOnRead.create(base(200), dir, Seq("k"), nBuckets = 8)
    val before = dataFiles(dir)
    MergeOnRead.append(ch(Seq(
      (3L, "upd", 33L, "U", 1L), (4L, "", 0L, "D", 1L))), dir)
    val expected = state(dir)
    val touched = MergeOnRead.compact(spark, dir)
    // keys 3 and 4 land in at most 2 of the 8 buckets
    assert(touched >= 1 && touched <= 2, s"touched=$touched")
    val after = dataFiles(dir)
    // untouched buckets: identical files (same path, same mtime)
    val keptBefore = before.filter { case (p, _) => after.contains(p) }
    assert(keptBefore.nonEmpty, "some buckets must survive untouched")
    keptBefore.foreach { case (p, m) => assert(after(p) === m, p) }
    // the new version dir contains only the touched buckets
    val v1 = local(s"$dir/data/ver=1")
    val v1buckets = Option(v1.listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.contains("bucket"))
    assert(v1buckets === touched)
    assert(state(dir) === expected)
    // deltas are folded: no pending batches remain on disk
    assert(!local(s"$dir/delta/batch=0").exists())
  }

  test("post-state across mid-stream compaction equals sequential applyChanges") {
    val dir = tmp()
    val t0 = base(150)
    MergeOnRead.create(t0, dir, Seq("k"), nBuckets = 4)
    val b0 = ch((1 to 150).filter(_ % 7 == 1).map(i =>
      (i.toLong, "u1", i * 100L, "U", 1L)))
    val b1 = ch((1 to 150).filter(_ % 7 == 0).map(i =>
      (i.toLong, "", 0L, "D", 1L)) ++
      (1 to 150).filter(_ % 7 == 1).map(i =>
        (i.toLong, "u2", i * 200L, "U", 1L)))
    val b2 = ch((1 to 150).filter(_ % 7 == 2).map(i =>
      (i.toLong, "u3", i * 300L, "U", 1L)) ++
      Seq((999L, "ins", 1L, "I", 1L)))
    MergeOnRead.append(b0, dir)
    MergeOnRead.append(b1, dir)
    MergeOnRead.compact(spark, dir)
    MergeOnRead.append(b2, dir)
    val oracle = Seq(b0, b1, b2)
      .foldLeft(t0)((acc, c) => Cdc.applyChanges(acc, c, Seq("k")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(state(dir) === oracle)
  }

  test("a torn append (no _SUCCESS) is invisible and safely retried") {
    val dir = tmp()
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 2)
    MergeOnRead.append(ch(Seq((1L, "ok", 1L, "U", 1L))), dir)
    // simulate a crash: rip out batch 1's _SUCCESS marker
    MergeOnRead.append(ch(Seq((2L, "torn", 2L, "U", 1L))), dir)
    assert(local(s"$dir/delta/batch=1/_SUCCESS").delete())
    assert(state(dir)(2L) === ("v2", 20L), "torn batch must be invisible")
    // retry claims a FRESH id: an existing batch dir might belong to
    // a writer still in flight (indistinguishable from a crash), so
    // its id stays reserved forever — the torn dir is garbage, never
    // corruption
    val id = MergeOnRead.append(ch(Seq((2L, "retry", 9L, "U", 1L))), dir)
    assert(id === 2)
    assert(state(dir)(2L) === ("retry", 9L))
    assert(MergeOnRead.compact(spark, dir) >= 1)
    assert(state(dir)(2L) === ("retry", 9L))
  }

  test("two interleaved appends can never claim the same batch id: " +
      "an existing (torn or foreign-writer) batch dir forces the next id, " +
      "and an in-flight append exposes NO partial batch dir to race on") {
    val dir = tmp()
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 2)
    // a batch=0 directory already on disk (torn old-protocol write, or
    // a writer whose rename just landed): its id is taken for good
    assert(local(s"$dir/delta/batch=0").mkdirs())
    // writer B appends concurrently — must NOT land in batch=0
    val b = MergeOnRead.append(ch(Seq((1L, "b", 1L, "U", 1L))), dir)
    assert(b === 1, "append must skip the claimed id")
    assert(state(dir)(1L) === ("b", 1L))
    // the commit protocol stages hidden and renames: after the append
    // returns, delta/ holds only complete batch dirs + dot-prefixed
    // entries — there is no reserved-then-rewritten window in which a
    // second writer could observe (and re-claim) a half-written id
    val entries = Option(local(s"$dir/delta").listFiles())
      .getOrElse(Array.empty).map(_.getName)
    assert(entries.forall(n => n.startsWith("batch=") || n.startsWith(".")),
      entries.mkString(","))
    assert(local(s"$dir/delta/batch=1/_SUCCESS").isFile,
      "_SUCCESS must travel with the rename")
  }

  test("an append landing mid-compaction (after the pending snapshot, " +
      "before the manifest swap) is never lost") {
    val dir = tmp()
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 2)
    MergeOnRead.append(ch(Seq((1L, "first", 1L, "U", 1L))), dir)
    // the compactor snapshots its pending set...
    val snapshot = Seq(0)
    // ...then a concurrent append commits before the fold finishes
    val late = MergeOnRead.append(ch(Seq(
      (2L, "late", 2L, "U", 1L), (300L, "ins", 3L, "I", 1L))), dir)
    assert(late === 1)
    // the compactor folds ONLY its snapshot
    assert(MergeOnRead.compactBatches(spark, dir, snapshot) >= 1)
    val m = MergeOnRead.loadManifest(dir)
    assert(m.folded === Set(0), "late batch must not be marked folded")
    // no lost update: the late batch still serves as a pending delta
    val got = state(dir)
    assert(got(1L) === ("first", 1L))
    assert(got(2L) === ("late", 2L))
    assert(got(300L) === ("ins", 3L))
    // and the NEXT compaction folds it for good
    assert(MergeOnRead.compact(spark, dir) >= 1)
    assert(state(dir)(2L) === ("late", 2L) &&
      state(dir)(300L) === ("ins", 3L))
  }

  test("streamAppend is exactly-once: a replayed micro-batch id is " +
      "skipped, even after compaction GC'd its batch directory") {
    val dir = tmp()
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 2)
    val c1 = ch(Seq((1L, "s1", 1L, "U", 1L)))
    assert(MergeOnRead.streamAppend(c1, 0L, dir) === 0)
    // replay of stream batch 0 before any compaction: skipped
    assert(MergeOnRead.streamAppend(c1, 0L, dir) === -1)
    assert(state(dir)(1L) === ("s1", 1L))
    // a later stream batch commits normally
    assert(MergeOnRead.streamAppend(
      ch(Seq((2L, "s2", 2L, "U", 1L))), 1L, dir) === 1)
    // compact + GC removes both batch dirs — markers survive in the
    // sidecar, so replays of batch 0 AND 1 still skip
    assert(MergeOnRead.compact(spark, dir) >= 1)
    assert(!local(s"$dir/delta/batch=0").exists())
    assert(MergeOnRead.streamAppend(c1, 0L, dir) === -1)
    assert(MergeOnRead.streamAppend(
      ch(Seq((2L, "dup", 9L, "U", 2L))), 1L, dir) === -1)
    assert(state(dir)(1L) === ("s1", 1L))
    assert(state(dir)(2L) === ("s2", 2L))
  }

  test("a crashed streamAppend (staging dir, no rename) is invisible " +
      "and its replay commits cleanly; a live foreachBatch stream " +
      "folds CDC micro-batches into the table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    MergeOnRead.create(base(10), dir, Seq("k"), nBuckets = 2)
    // simulate the crash: stage by hand where streamAppend would,
    // WITHOUT the rename
    val m = MergeOnRead.loadManifest(dir)
    ch(Seq((1L, "torn", 1L, "U", 1L)))
      .withColumn("__mor_bucket",
        pmod(xxhash64(col("k")), lit(2)).cast("int"))
      .write.partitionBy("__mor_bucket").mode("overwrite")
      .parquet(s"$dir/delta/.staging-7")
    assert(state(dir)(1L) === ("v1", 10L), "staging must be invisible")
    // the replay of stream batch 7 commits exactly once
    assert(MergeOnRead.streamAppend(
      ch(Seq((1L, "ok", 2L, "U", 1L))), 7L, dir) >= 0)
    assert(state(dir)(1L) === ("ok", 2L))

    // end-to-end: a MemoryStream of change rows through the sink
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, String, Long)]
    val q = input.toDF().toDF("k", "s", "x", "op", "seq")
      .writeStream
      .foreachBatch(MergeOnRead.foreachBatchSink(dir))
      .start()
    input.addData((3L, "up3", 33L, "U", 1L), (2L, "", 0L, "D", 1L))
    q.processAllAvailable()
    input.addData((200L, "ins", 7L, "I", 1L))
    q.processAllAvailable()
    q.stop()
    val got = state(dir)
    assert(got(3L) === ("up3", 33L))
    assert(!got.contains(2L))
    assert(got(200L) === ("ins", 7L))
  }

  test("a bucket deleted down to zero rows disappears from the manifest") {
    val dir = tmp()
    MergeOnRead.create(base(4), dir, Seq("k"), nBuckets = 2)
    // delete everything
    MergeOnRead.append(ch((1 to 4).map(i =>
      (i.toLong, "", 0L, "D", 1L))), dir)
    MergeOnRead.compact(spark, dir)
    assert(MergeOnRead.loadManifest(dir).buckets.isEmpty)
    assert(MergeOnRead.read(spark, dir).count() === 0L)
    // and the empty table still accepts new life
    MergeOnRead.append(ch(Seq((7L, "back", 1L, "I", 1L))), dir)
    assert(state(dir) === Map(7L -> ("back", 1L)))
  }

  test("time travel: readAt serves each compaction point; vacuum " +
      "drops old versions but keeps the kept ones readable") {
    val dir = tmp()
    MergeOnRead.create(base(20), dir, Seq("k"), nBuckets = 8)

    // v1: update k=1, delete k=2
    MergeOnRead.append(ch(Seq(
      (1L, "u1", 111L, "U", 1L), (2L, "", 0L, "D", 1L))), dir)
    MergeOnRead.compact(spark, dir, gc = false)
    // v2: update k=1 again, insert k=100
    MergeOnRead.append(ch(Seq(
      (1L, "u2", 222L, "U", 1L), (100L, "new", 1000L, "I", 1L))), dir)
    MergeOnRead.compact(spark, dir, gc = false)
    // IndexDirs manifest versions: create commits 1, each compaction
    // the next (one commit protocol across the persisted-state layer)
    assert(MergeOnRead.versions(dir) == Seq(1L, 2L, 3L))

    def at(v: Long): Map[Long, (String, Long)] =
      MergeOnRead.readAt(spark, dir, v).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val v0 = at(1); val v1 = at(2); val v2 = at(3)
    assert(v0(1L) == (("v1", 10L)) && v0.contains(2L) && v0.size == 20)
    assert(v1(1L) == (("u1", 111L)) && !v1.contains(2L) && v1.size == 19)
    assert(v2(1L) == (("u2", 222L)) && v2(100L) == (("new", 1000L)) &&
      v2.size == 20)
    // current read agrees with the newest version (no pending deltas)
    assert(state(dir) == v2)

    // vacuum to the last two versions: the create point gone,
    // both compaction points intact
    assert(MergeOnRead.vacuum(dir, keepVersions = 2) == 1)
    assert(MergeOnRead.versions(dir) == Seq(2L, 3L))
    assert(at(2) == v1 && at(3) == v2)
    intercept[IllegalArgumentException] {
      MergeOnRead.readAt(spark, dir, 1) }
    // and a pending (unfolded) delta still reads after vacuum
    MergeOnRead.append(ch(Seq((3L, "p", 3L, "U", 1L))), dir)
    assert(state(dir)(3L) == (("p", 3L)))
  }

  test("a STALE compaction (its snapshot already folded by another " +
      "run) skips, GCs its claimed data generation, and loses nothing") {
    val dir = tmp()
    MergeOnRead.create(base(8), dir, Seq("k"), nBuckets = 4)
    MergeOnRead.append(ch(Seq((1L, "u1", 11L, "U", 1L))), dir) // batch 0
    MergeOnRead.append(ch(Seq((2L, "", 0L, "D", 1L))), dir)    // batch 1
    val want = state(dir)
    // compaction A folds snapshot [0, 1]; gc=false keeps the batch
    // dirs so a racer anchored at the same snapshot can still run
    assert(MergeOnRead.compactBatches(spark, dir, Seq(0, 1),
      gc = false) > 0)
    assert(state(dir) == want)
    val versionsAfterA = MergeOnRead.versions(dir)
    def dataGens() = Option(local(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    val gensAfterA = dataGens()
    // compaction B anchored at the SAME (now stale) snapshot: the
    // commit guard sees its batches already folded, skips the commit,
    // and removes the generation it claimed — no double fold, no
    // manifest version burned, no orphan directory
    assert(MergeOnRead.compactBatches(spark, dir, Seq(0, 1)) == 0)
    assert(state(dir) == want)
    assert(MergeOnRead.versions(dir) == versionsAfterA)
    assert(dataGens() == gensAfterA)
    // the table keeps working
    MergeOnRead.append(ch(Seq((3L, "u3", 33L, "U", 1L))), dir)
    assert(state(dir)(3L) == (("u3", 33L)))
  }

  test("empty change set: compact is a no-op, read is the base") {
    val dir = tmp()
    MergeOnRead.create(base(5), dir, Seq("k"), nBuckets = 2)
    assert(MergeOnRead.compact(spark, dir) === 0)
    assert(state(dir).size === 5)
  }

  test("clusterBy compaction + zone map: readWhere prunes base " +
      "files, equals read().filter, and stays safe when the zone " +
      "map lags the table") {
    import org.apache.spark.sql.sources.{GreaterThanOrEqual,
      LessThanOrEqual}
    val dir = tmp()
    val fs = Seq(GreaterThanOrEqual("x", 1000L),
      LessThanOrEqual("x", 2000L))
    def inRange(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x").between(1000L, 2000L))
    MergeOnRead.create(base(400), dir, Seq("k"), nBuckets = 4)
    // no zone map yet: readWhere IS read
    assert(inRange(MergeOnRead.readWhere(spark, dir, fs))
      .collect().toSet ==
      inRange(MergeOnRead.read(spark, dir)).collect().toSet)
    MergeOnRead.append(ch(Seq(
      (1L, "u1", 1500L, "U", 1L), (401L, "n", 99999L, "I", 1L),
      (120L, "", 0L, "D", 1L))), dir)
    // cluster the fold on x: each bucket splits into x-tight files
    assert(MergeOnRead.compact(spark, dir,
      clusterBy = Seq("x"), filesPerBucket = 4) > 0)
    MergeOnRead.buildZoneMap(spark, dir, Seq("x", "k"), Seq("s"))
    val want = inRange(MergeOnRead.read(spark, dir))
    val got = inRange(MergeOnRead.readWhere(spark, dir, fs))
    assert(got.collect().toSet == want.collect().toSet)
    // pruning is observable: the pruned plan reads strictly fewer
    // base files (no pending deltas — inputFiles is base-only here)
    assert(got.inputFiles.length < want.inputFiles.length,
      s"${got.inputFiles.length} vs ${want.inputFiles.length}")
    // LAGGING zone map: new delta moves a row INTO the range and a
    // base row OUT of it — readWhere folds the full delta window, so
    // both sides stay equal without a refresh
    MergeOnRead.append(ch(Seq(
      (2L, "u2", 1600L, "U", 2L), (150L, "u3", 9L, "U", 2L))), dir)
    assert(inRange(MergeOnRead.readWhere(spark, dir, fs))
      .collect().toSet ==
      inRange(MergeOnRead.read(spark, dir)).collect().toSet)
    // next clustered compaction AUTO-refreshes the map (old ver's
    // files retract, new files profile) — the explicit refresh is a
    // no-op; equality and pruning hold over the new layout
    assert(MergeOnRead.compact(spark, dir,
      clusterBy = Seq("x"), filesPerBucket = 4) > 0)
    assert(MergeOnRead.refreshZoneMap(spark, dir).reused)
    val want2 = inRange(MergeOnRead.read(spark, dir))
    val got2 = inRange(MergeOnRead.readWhere(spark, dir, fs))
    assert(got2.collect().toSet == want2.collect().toSet)
    assert(got2.inputFiles.length < want2.inputFiles.length)
    // an out-of-zone equality probe prunes everything: empty result,
    // zero base files
    val none = MergeOnRead.readWhere(spark, dir,
      Seq(GreaterThanOrEqual("x", 10000000L)))
    assert(none.filter(col("x") >= 10000000L).count() == 0)
  }
}
