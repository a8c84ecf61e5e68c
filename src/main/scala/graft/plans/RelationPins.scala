package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Shared base-relation pinning for the artifact→optimizer bridges
  * ([[AggViewRewrite]], [[ColStatsInjection]]): identify a bare
  * file-source scan, and fingerprint its FILE LISTING so a
  * registration made against one state of the table silently stops
  * applying the moment the table moves.
  */
private[graft] object RelationPins {

  /** The bare single-file-source relation under at most
    * subquery aliases — the only plan shape a registration accepts.
    */
  def bare(p: LogicalPlan): Option[(LogicalRelation, HadoopFsRelation)] =
    p match {
      case s: SubqueryAlias => bare(s.child)
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => Some((l, h))
        case _ => None
      }
      case _ => None
    }

  def rootPaths(h: HadoopFsRelation): Set[String] =
    h.location.rootPaths.map(_.toString).toSet

  /** Order-independent digest of (path, length, mtime) of every file
    * the relation's (already-materialized) file index lists — the
    * staleness pin. Uses the in-memory listing (no FS calls), and
    * combines per-file hashes COMMUTATIVELY (wrapping sum of
    * splitmix64-mixed entries) instead of sorting: the pin is
    * recomputed at every query planning, and a registered fact table
    * can list millions of files — O(n) with no allocation beats an
    * O(n log n) string sort in the planner's hot path.
    */
  /** One base file's pinned verification partial: the (length,
    * mtime) immutability pin plus the file's content-fingerprint
    * partial (xor of row hashes, row count) under the consumer's
    * projection ([[graft.operators.IndexDirs.contentFingerprintByFile]]).
    */
  final case class FileFp(len: Long, mtime: Long, fp: Long, n: Long)

  /** One file of a relation's live listing, with the scheme-free
    * join key (what per-file fingerprints are keyed by) and the
    * qualified URI a delta scan reads.
    */
  final case class ListedFile(key: String, uri: String, len: Long,
      mtime: Long)

  def listedFiles(h: HadoopFsRelation): Seq[ListedFile] =
    h.location.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .map(f => ListedFile(f.getPath.toUri.getPath,
        f.getPath.toString, f.getLen,
        f.fileStatus.getModificationTime))
      .toSeq

  /** O(delta) content-fingerprint composition — the pin-refresh
    * verification priced at the CHANGE, not the corpus. For each
    * live file: a stored partial whose (length, mtime) still match
    * is COMPOSED (xor/sum are abelian — the same algebra that makes
    * the artifacts incrementally maintainable makes their
    * verification incrementally recomputable); a file with no
    * stored partial is fingerprinted by `scan` (one pass over ONLY
    * those files); files that vanished simply drop out of the
    * composition (xor partials subtract exactly). A live file whose
    * stored (length, mtime) DIFFER was rewritten in place — the
    * stored partial no longer describes it, and trusting either
    * side would be a guess, so the whole composition REFUSES with
    * re-register guidance (the [[graft.operators.ZoneMap.refresh]]
    * contract: pinned files are immutable).
    *
    * Returns (composed fp, composed n, the updated partials map —
    * exactly the live files) or the refusal reason. `scan` receives
    * the new files' URIs and returns key → (fp, n); zero-row files
    * may be absent (they default to the (0, 0) identity).
    */
  def composeFingerprint(live: Seq[ListedFile],
      pinned: Map[String, FileFp],
      scan: Seq[String] => Map[String, (Long, Long)])
      : Either[String, (Long, Long, Map[String, FileFp])] = {
    val changed = live.filter(f => pinned.get(f.key).exists(p =>
      p.len != f.len || p.mtime != f.mtime))
    if (changed.nonEmpty)
      return Left("base files rewritten in place (" +
        changed.map(_.key).sorted.take(3).mkString(", ") +
        "…) — the pinned per-file fingerprints no longer describe " +
        "them; re-register")
    val newFiles = live.filterNot(f => pinned.contains(f.key))
    val scanned =
      if (newFiles.isEmpty) Map.empty[String, (Long, Long)]
      else scan(newFiles.map(_.uri))
    // defensive: a scanned key that is not a listed new file means
    // the key normalization drifted — composing would be silently
    // wrong, so refuse loudly
    val newKeys = newFiles.map(_.key).toSet
    val strays = scanned.keysIterator.filterNot(newKeys).toSeq
    if (strays.nonEmpty)
      return Left("scanned file keys do not match the listing (" +
        strays.sorted.take(3).mkString(", ") + "…) — key " +
        "normalization drift; re-register")
    val partials: Map[String, FileFp] = live.map { f =>
      f.key -> pinned.getOrElse(f.key, {
        val (fp, n) = scanned.getOrElse(f.key, (0L, 0L))
        FileFp(f.len, f.mtime, fp, n)
      })
    }.toMap
    val n = partials.valuesIterator.map(_.n).sum
    val fp =
      if (n == 0) 0L
      else partials.valuesIterator.foldLeft(0L)(_ ^ _.fp)
    Right((fp, n, partials))
  }

  def signature(h: HadoopFsRelation): Long =
    signatureOfIndex(h.location)

  def signatureOfIndex(
      location: org.apache.spark.sql.execution.datasources.FileIndex)
      : Long = {
    def mix(z0: Long): Long = { // splitmix64 finalizer
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    location.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .foldLeft(17L) { (acc, f) =>
        // each component is mixed BEFORE combining: a linear
        // pre-combination (path·K + len·31 + mtime) would let an
        // in-place rewrite whose length and mtime deltas cancel
        // produce the same signature — and this pin is what keeps a
        // stale view from being served as query RESULTS
        acc + mix(mix(mix(f.getPath.toString.hashCode.toLong)
          ^ f.getLen) ^ f.getModificationTime)
      }
  }

  /** The listing signature of `roots` from a FRESH listing — what
    * pins a table that does not appear in the query plan at all (a
    * PARTIAL-star match's left-out neutral dims: the view absorbed
    * their joined values, so their freshness must be verified even
    * though the query never scans them). The same
    * `InMemoryFileIndex` machinery a read of the roots would use, so
    * the file set — and therefore the signature — agrees with the
    * relation-based pin taken at registration. None when the listing
    * fails (treated as NOT fresh by callers).
    */
  def signatureOfRoots(spark: org.apache.spark.sql.SparkSession,
      roots: Set[String]): Option[Long] =
    try {
      val idx = new org.apache.spark.sql.execution.datasources
        .InMemoryFileIndex(spark,
          roots.toSeq.sorted.map(new org.apache.hadoop.fs.Path(_)),
          Map.empty, None)
      Some(signatureOfIndex(idx))
    } catch { case scala.util.control.NonFatal(_) => None }
}
