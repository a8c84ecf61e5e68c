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
    * staleness pin. Uses the in-memory listing; no FS calls.
    */
  def signature(h: HadoopFsRelation): Long =
    h.location.listFiles(Nil, Nil).flatMap(_.files)
      .map(f => s"${f.getPath}:${f.getLen}:${f.getModificationTime}")
      .sorted
      .foldLeft(17L)((a, s) => a * 1000003L + s.hashCode)
}
