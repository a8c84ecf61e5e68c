package graft.operators

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index state after a build/append/delete on a persisted artifact
  * ([[AnnIndex]], [[DedupIndex]], [[LmIndex]], [[Bm25Index]]):
  * `reused = true` means the manifest fingerprint matched and nothing
  * was rewritten.
  */
final case class IndexBuild(path: String, fingerprint: Long,
    count: Long, reused: Boolean)

/** Shared on-disk discipline for persisted index artifacts
  * ([[AnnIndex]], [[DedupIndex]], [[LmIndex]], [[Bm25Index]]): the
  * "no manifest = no index" crash rule, ATOMIC manifest commits, and
  * the never-reused staged-delta naming — all through the Hadoop
  * [[FileSystem]] API, so the control plane runs wherever the parquet
  * data does (`file:` in tests, `hdfs:`/compatible stores on a real
  * cluster), not just on a local mount.
  *
  * Every artifact follows the same contract:
  *  - `manifest.json` is the only thing readers trust, and every
  *    commit swaps it ATOMICALLY (temp file + rename-with-overwrite) —
  *    a crash mid-commit leaves the OLD manifest bytes fully live
  *    (old index intact), never a torn write;
  *  - appends stage into `deltas/<name>` directories whose names are
  *    never reused, so a crashed attempt leaves an orphan no live
  *    manifest references — garbage, never corruption.
  *
  * The rename primitive is [[FileContext]]`.rename(..., OVERWRITE)` —
  * atomic on POSIX local filesystems and HDFS (the same primitive
  * Structured Streaming's checkpoint manager trusts). On
  * rename-as-copy object stores (S3-class) the swap degrades to
  * copy+delete; there, front the index root with an HDFS-class or
  * consistent-rename filesystem, as for any rename-committed layout.
  *
  * Reference grounding: the reference serves every request from an
  * immutable loaded dataset and swaps atomically on reload
  * (directory/directory.go:230-240); these helpers are that rule
  * applied to on-disk index state.
  */
private[operators] object IndexDirs {

  /** Hadoop configuration of the active session (so `fs.*` settings
    * and filesystem implementations ride along); a bare default only
    * off-session.
    */
  def hadoopConf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fs(path: String): FileSystem =
    new Path(path).getFileSystem(hadoopConf)

  def manifestPath(path: String): Path = new Path(path, "manifest.json")

  def readManifestText(path: String): Option[String] = {
    val f = fs(path)
    val p = manifestPath(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** ATOMIC manifest commit: the JSON is written to a uniquely-named
    * temp file in the index directory (a crash here leaves the temp
    * as garbage and the live manifest untouched), then renamed OVER
    * `manifest.json` in one [[FileContext]] OVERWRITE rename — readers
    * see the old manifest bytes or the new ones, never a prefix of
    * either.
    */
  def writeManifestText(path: String, json: String): Unit = {
    val f = fs(path)
    f.mkdirs(new Path(path))
    // best-effort GC of crashed commits' temp files (artifacts are
    // single-writer by contract, so any existing temp is garbage)
    f.listStatus(new Path(path))
      .filter(s => s.isFile && s.getPath.getName.startsWith(".manifest-")
        && s.getPath.getName.endsWith(".tmp"))
      .foreach(s => f.delete(s.getPath, false))
    val dst = f.makeQualified(manifestPath(path))
    val tmp = f.makeQualified(new Path(path,
      s".manifest-${java.util.UUID.randomUUID()}.tmp"))
    val out = f.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    FileContext.getFileContext(dst.toUri, hadoopConf)
      .rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  def rmTree(path: String): Unit = {
    val f = fs(path)
    val p = new Path(path)
    if (f.exists(p)) f.delete(p, true)
    ()
  }

  /** Uncommit + clear: delete the manifest FIRST (readers now see
    * "no index"), then best-effort remove stale delta directories, so
    * the following overwrite writes can never be observed half-done.
    */
  def uncommit(path: String): Unit = {
    val f = fs(path)
    f.delete(manifestPath(path), false)
    f.delete(new Path(path, "deltas"), true)
    ()
  }

  /** Next free delta directory name: `<prefix><k>` where k exceeds
    * the numeric suffix of EVERY directory on disk under `deltas/`
    * (manifest-listed or orphaned) — a name is never reused, so a
    * staged write can never land inside a directory a live manifest
    * still references.
    */
  def nextDeltaName(path: String, prefix: String): String = {
    val f = fs(path)
    val d = new Path(path, "deltas")
    val names =
      if (!f.exists(d)) Array.empty[String]
      else f.listStatus(d).filter(_.isDirectory).map(_.getPath.getName)
    val maxSuffix = names.flatMap(n => "\\d+$".r.findFirstIn(n))
      .map(_.toInt).foldLeft(-1)(math.max)
    s"$prefix${maxSuffix + 1}"
  }

  /** Post-commit GC of folded delta directories (best-effort: they
    * are unreferenced once the compaction manifest is live).
    */
  def gcDeltas(path: String, names: Seq[String]): Unit =
    names.foreach(d => rmTree(s"$path/deltas/$d"))

  /** Order-independent content fingerprint of the raw rows: xor-fold
    * of the per-row xxhash64 over `cols` plus the row count (xor
    * alone is blind to even-multiplicity duplicates). One
    * column-pruned scan — the reuse check stays cheap even when the
    * build would not be. Xor is self-inverse, so appends compose
    * (`fp' = fp ⊕ fold(delta)`) and deletes fold rows back out.
    */
  def contentFingerprint(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    val r = df.agg(
      bit_xor(xxhash64(cols.map(col): _*)).as("fp"),
      count(lit(1)).as("n")).collect()(0)
    val n = r.getLong(1)
    (if (n == 0) 0L else r.getLong(0), n)
  }

  /** Typed accessors over a parsed manifest — the `...Or` variants
    * carry each field's compat default exactly once (a manifest
    * written before a field existed reads as the value that forces
    * one safe rebuild or a no-op, per field).
    */
  final class ManifestReader(node: JsonNode) {
    def long(name: String): Long = node.get(name).asLong()
    def longOr(name: String, default: Long): Long =
      Option(node.get(name)).map(_.asLong()).getOrElse(default)
    def int(name: String): Int = node.get(name).asInt()
    def intOr(name: String, default: Int): Int =
      Option(node.get(name)).map(_.asInt()).getOrElse(default)
    def str(name: String): String = node.get(name).asText()
    def strOr(name: String, default: String): String =
      Option(node.get(name)).map(_.asText()).getOrElse(default)
    def seq(name: String): Seq[String] =
      Option(node.get(name)).toSeq.flatMap { a =>
        (0 until a.size()).map(a.get(_).asText())
      }
  }

  def readManifest(path: String): Option[ManifestReader] =
    readManifestText(path).map(t =>
      new ManifestReader(new ObjectMapper().readTree(t)))

  /** Builder for the manifest JSON; [[ManifestWriter.commit]] is the
    * atomic swap.
    */
  final class ManifestWriter {
    private val mapper = new ObjectMapper()
    private val node = mapper.createObjectNode()
    def put(name: String, v: Long): ManifestWriter = {
      node.put(name, v); this
    }
    def put(name: String, v: Int): ManifestWriter = {
      node.put(name, v); this
    }
    def put(name: String, v: String): ManifestWriter = {
      node.put(name, v); this
    }
    def put(name: String, vs: Seq[String]): ManifestWriter = {
      val arr = node.putArray(name); vs.foreach(arr.add); this
    }
    def commit(path: String): Unit =
      writeManifestText(path, mapper.writeValueAsString(node))
  }

  def manifest(): ManifestWriter = new ManifestWriter
}
