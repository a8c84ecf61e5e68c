package org.apache.spark.sql

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A FIXED file list as a [[FileIndex]] — the driver-side pruned
  * listing [[graft.plans.ZoneMapScan]] substitutes into a
  * [[org.apache.spark.sql.execution.datasources.HadoopFsRelation]]:
  * the statuses were already materialized by the relation's own
  * (in-memory) index, so handing them over costs NO filesystem call —
  * the same altitude as Spark's own `InMemoryFileIndex`, minus the
  * re-listing its constructor would perform per file.
  *
  * Unpartitioned tables only (one all-files partition directory) —
  * the caller asserts `partitionSchema.isEmpty` on the relation it
  * replaces.
  */
class GraftStaticFileIndex(
    roots: Seq[Path],
    files: Seq[FileStatus]) extends FileIndex {
  override def rootPaths: Seq[Path] = roots
  override def listFiles(
      partitionFilters: Seq[catalyst.expressions.Expression],
      dataFilters: Seq[catalyst.expressions.Expression])
      : Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, files.toArray))
  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = files.map(_.getLen).sum
  override def partitionSchema: StructType = StructType(Nil)
}

/** The DELEGATING pruned index: the underlying [[FileIndex]] minus a
  * KILLED file set (scheme-free path keys). Every other behavior —
  * partition discovery, partition-filter pruning inside `listFiles`,
  * partition value population — is the underlying index's own, so
  * this composes with PARTITIONED tables: Spark's partition pruning
  * and the zone map's per-file skipping subtract independently from
  * the same listing ([[graft.plans.ZoneMapScan]]'s substitution).
  * Zero filesystem calls: the underlying index's listing is already
  * in memory, and the subtraction filters it per call.
  */
class GraftPrunedFileIndex(
    underlying: FileIndex,
    killed: Set[String]) extends FileIndex {
  private def keep(f: execution.datasources.FileStatusWithMetadata)
      : Boolean = !killed.contains(f.getPath.toUri.getPath)
  override def rootPaths: Seq[Path] = underlying.rootPaths
  override def listFiles(
      partitionFilters: Seq[catalyst.expressions.Expression],
      dataFilters: Seq[catalyst.expressions.Expression])
      : Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(keep)))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    underlying.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .filter(keep).map(_.getPath.toString).toArray
  override def refresh(): Unit = underlying.refresh()
  override def sizeInBytes: Long =
    underlying.listFiles(Nil, Nil).iterator.flatMap(_.files)
      .filter(keep).map(_.getLen).sum
  override def partitionSchema: StructType = underlying.partitionSchema
  override def metadataOpsTimeNs: Option[Long] =
    underlying.metadataOpsTimeNs
}
