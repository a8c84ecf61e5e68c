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
