package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Shared base-relation pinning for the artifact→optimizer bridges
  * ([[AggViewRewrite]], [[ColStatsInjection]]): identify a bare
  * file-source scan, and fingerprint its FILE LISTING so a
  * registration made against one state of the table silently stops
  * applying the moment the table moves.
  */
private[plans] object RelationPins {

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
  def signature(h: HadoopFsRelation): Long = {
    def mix(z0: Long): Long = { // splitmix64 finalizer
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    h.location.listFiles(Nil, Nil).iterator.flatMap(_.files)
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
}
