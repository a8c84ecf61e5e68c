package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Shared on-disk discipline for persisted index artifacts
  * ([[AnnIndex]], [[DedupIndex]]): the "no manifest = no index"
  * crash rule and the never-reused staged-delta naming.
  *
  * Every artifact follows the same contract:
  *  - `manifest.json` is written LAST and is the only thing readers
  *    trust — a crash mid-mutation leaves either the old manifest
  *    (old index fully live) or none (index absent), never torn
  *    state;
  *  - appends stage into `deltas/<name>` directories whose names are
  *    never reused, so a crashed attempt leaves an orphan no live
  *    manifest references — garbage, never corruption.
  *
  * Reference grounding: the reference serves every request from an
  * immutable loaded dataset and swaps atomically on reload
  * (directory/directory.go:230-240); these helpers are that rule
  * applied to on-disk index state.
  */
private[operators] object IndexDirs {

  def manifestPath(path: String): java.nio.file.Path =
    Paths.get(path, "manifest.json")

  def readManifestText(path: String): Option[String] = {
    val p = manifestPath(path)
    if (!Files.exists(p)) None else Some(Files.readString(p))
  }

  def writeManifestText(path: String, json: String): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.write(manifestPath(path),
      json.getBytes(StandardCharsets.UTF_8))
  }

  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
    f.delete(); ()
  }

  /** Uncommit + clear: delete the manifest FIRST (readers now see
    * "no index"), then best-effort remove stale delta directories, so
    * the following overwrite writes can never be observed half-done.
    */
  def uncommit(path: String): Unit = {
    Files.deleteIfExists(manifestPath(path))
    val d = Paths.get(path, "deltas").toFile
    if (d.isDirectory) rmTree(d)
  }

  /** Next free delta directory name: `<prefix><k>` where k exceeds
    * the numeric suffix of EVERY directory on disk under `deltas/`
    * (manifest-listed or orphaned) — a name is never reused, so a
    * staged write can never land inside a directory a live manifest
    * still references.
    */
  def nextDeltaName(path: String, prefix: String): String = {
    val d = Paths.get(path, "deltas").toFile
    val maxSuffix = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(f => "\\d+$".r.findFirstIn(f.getName))
      .map(_.toInt).foldLeft(-1)(math.max)
    s"$prefix${maxSuffix + 1}"
  }

  /** Post-commit GC of folded delta directories (best-effort: they
    * are unreferenced once the compaction manifest is live).
    */
  def gcDeltas(path: String, names: Seq[String]): Unit =
    names.foreach(d => rmTree(Paths.get(path, "deltas", d).toFile))
}
