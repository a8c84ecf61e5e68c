package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted-index control plane: atomic manifest commits and
  * Hadoop-FileSystem portability (`file:`-scheme URIs here; the same
  * calls run on `hdfs:`-class stores in production).
  */
class IndexDirsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(p: String) =
    Files.createTempDirectory(p).toUri.toString.stripSuffix("/") + "/idx"

  test("manifest commit is temp+rename: a second write atomically " +
      "replaces the first through a file:-scheme URI") {
    spark // force the session so hadoopConf comes from it
    val path = tmp("idxdirs-swap")
    IndexDirs.writeManifestText(path, """{"v":"A"}""")
    assert(IndexDirs.readManifestText(path).contains("""{"v":"A"}"""))
    IndexDirs.writeManifestText(path, """{"v":"B"}""")
    assert(IndexDirs.readManifestText(path).contains("""{"v":"B"}"""))
  }

  test("a torn manifest write (partial bytes in the temp file, crash " +
      "before the rename) leaves the OLD manifest fully live") {
    val path = tmp("idxdirs-torn")
    IndexDirs.writeManifestText(path, """{"v":"OLD"}""")
    // simulate the crash: a partial prefix of the NEW manifest sits in
    // a temp file that never got renamed
    val f = IndexDirs.fs(path)
    val torn = new org.apache.hadoop.fs.Path(path,
      ".manifest-torn-attempt.tmp")
    val out = f.create(torn, true)
    out.write("""{"v":"NE""".getBytes("UTF-8")) // truncated mid-JSON
    out.close()
    assert(IndexDirs.readManifestText(path).contains("""{"v":"OLD"}"""))
    // and the next successful commit still swaps cleanly
    IndexDirs.writeManifestText(path, """{"v":"NEW"}""")
    assert(IndexDirs.readManifestText(path).contains("""{"v":"NEW"}"""))
  }

  test("a live index survives a torn commit attempt: reads and the " +
      "rebuild reuse-check see the pre-crash state") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (0 until 30).map(i =>
      (i.toLong, s"doc number $i body word${i / 3}")).toDF("doc_id", "text")
    val path = tmp("idxdirs-live")
    DedupIndex.buildIfAbsent(docs, "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, path,
      kbParts = 4, sbParts = 4, dbParts = 4)
    val before = DedupIndex.selfPairs(spark, path, thresholdTenths = 5)
      .select(col("a"), col("b")).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    // torn commit: partial manifest bytes in an unrenamed temp file
    val f = IndexDirs.fs(path)
    val out = f.create(new org.apache.hadoop.fs.Path(path,
      ".manifest-crashed.tmp"), true)
    out.write("{\"fp\":12".getBytes("UTF-8"))
    out.close()
    val after = DedupIndex.selfPairs(spark, path, thresholdTenths = 5)
      .select(col("a"), col("b")).collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
    assert(DedupIndex.buildIfAbsent(docs, "text", "doc_id",
      DedupIndex.MinhashMd5(16, 4), bands = 4, path,
      kbParts = 4, sbParts = 4, dbParts = 4).reused)
  }

  test("versioned commits: two writers anchored at the same read " +
      "version cannot both win — the loser gets a " +
      "ConcurrentModificationException, not a silent overwrite") {
    val path = tmp("idxdirs-cme")
    IndexDirs.writeManifestText(path, """{"v":"base"}""") // m1
    // both writers read at version 1, then race to commit m2
    IndexDirs.writeManifestText(path, """{"v":"winner"}""", expect = 1L)
    intercept[java.util.ConcurrentModificationException] {
      IndexDirs.writeManifestText(path, """{"v":"loser"}""", expect = 1L)
    }
    assert(IndexDirs.readManifestText(path).contains("""{"v":"winner"}"""))
  }

  test("a writer anchored at a retention-GC'd version gets a " +
      "ConcurrentModificationException, never a silently-ignored low " +
      "version") {
    val path = tmp("idxdirs-stale")
    IndexDirs.writeManifestText(path, """{"v":1}""") // m1
    // enough commits that the m2 slot falls out of the retention
    // window and is GC'd — the slot a writer anchored at v1 would
    // target is free again, so a plain no-overwrite rename would
    // SUCCEED and land the stale write as an ignored low version
    (2 to IndexDirs.ManifestRetain + 4).foreach { i =>
      IndexDirs.writeManifestText(path, s"""{"v":$i}""")
    }
    assert(IndexDirs.readManifestTextAt(path, 2L).isEmpty) // GC'd slot
    intercept[java.util.ConcurrentModificationException] {
      IndexDirs.writeManifestText(path, """{"v":"stale"}""", expect = 1L)
    }
    // the live manifest is untouched and no low version reappeared
    assert(IndexDirs.readManifest(path)
      .exists(_.long("v") == IndexDirs.ManifestRetain + 4))
    assert(IndexDirs.readManifestTextAt(path, 2L).isEmpty)
  }

  test("superseded manifest versions stay readable (time travel) and " +
      "are GC'd past the retention window") {
    val path = tmp("idxdirs-tt")
    (1 to IndexDirs.ManifestRetain + 3).foreach { i =>
      IndexDirs.writeManifestText(path, s"""{"v":$i}""")
    }
    val vs = IndexDirs.listManifestVersions(path)
    val top = IndexDirs.ManifestRetain + 3L
    // window: versions (top - ManifestRetain, top] survive
    assert(vs == ((top - IndexDirs.ManifestRetain + 1) to top))
    assert(IndexDirs.readManifestTextAt(path, top - 1)
      .contains(s"""{"v":${top - 1}}"""))
    assert(IndexDirs.readManifestAt(path, top - 2)
      .exists(_.long("v") == top - 2))
    assert(IndexDirs.readManifestTextAt(path, 1L).isEmpty) // GC'd
  }

  test("a reader self-heals past out-of-protocol damage: an " +
      "unparsable high version falls back to the next parsable one") {
    val path = tmp("idxdirs-heal")
    IndexDirs.writeManifestText(path, """{"v":1}""") // m1
    // out-of-protocol damage: a garbage file squats on version 2
    val f = IndexDirs.fs(path)
    val out = f.create(IndexDirs.versionedPath(path, 2L), true)
    out.write("""{"v":2 TORN""".getBytes("UTF-8"))
    out.close()
    assert(IndexDirs.readManifest(path).exists(_.long("v") == 1L))
  }

  test("a pre-versioning manifest.json is read as version 0 and the " +
      "first versioned commit supersedes it without touching it") {
    val path = tmp("idxdirs-legacy")
    val f = IndexDirs.fs(path)
    f.mkdirs(new org.apache.hadoop.fs.Path(path))
    val out = f.create(IndexDirs.manifestPath(path), true)
    out.write("""{"v":"legacy"}""".getBytes("UTF-8"))
    out.close()
    assert(IndexDirs.readManifestText(path).contains("""{"v":"legacy"}"""))
    assert(IndexDirs.readManifest(path).exists(_.version == 0L))
    IndexDirs.writeManifestText(path, """{"v":"m1"}""", expect = 0L)
    assert(IndexDirs.readManifestText(path).contains("""{"v":"m1"}"""))
    // the legacy file is history, not garbage: still readable at v0
    assert(IndexDirs.readManifestTextAt(path, 0L)
      .contains("""{"v":"legacy"}"""))
  }

  test("delta naming, GC, and uncommit run through the Hadoop " +
      "FileSystem on a file:-scheme root") {
    val path = tmp("idxdirs-fs")
    val f = IndexDirs.fs(path)
    assert(IndexDirs.nextDeltaName(path, "d") == "d0")
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/deltas/d0"))
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$path/deltas/t3"))
    // max numeric suffix across ALL directories, prefix-independent
    assert(IndexDirs.nextDeltaName(path, "d") == "d4")
    IndexDirs.gcDeltas(path, Seq("d0"))
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/deltas/d0")))
    IndexDirs.writeManifestText(path, "{}")
    IndexDirs.uncommit(path)
    assert(IndexDirs.readManifestText(path).isEmpty)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/deltas")))
  }
}
