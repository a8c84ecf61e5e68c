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
