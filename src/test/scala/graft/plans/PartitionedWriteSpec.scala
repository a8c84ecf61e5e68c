package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Partitioned-write discipline: the sink side of the 100 TB story.
  * `partitionBy(col)` at write time turns an equality predicate on
  * that column into PARTITION PRUNING at read time — directories that
  * don't match are never listed into the scan, which is the
  * difference between reading 1/N of the lake and reading all of it.
  * Asserted mechanically: the pruned read's file count equals the one
  * matching partition's, and the physical plan carries the partition
  * filter rather than a data filter.
  */
class PartitionedWriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitionBy write + equality read = partition-pruned scan") {
    val dir = Files.createTempDirectory("partwrite").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "event_type", "user_id", "value")
    ev.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/by_type")

    val read = spark.read.parquet(s"$dir/by_type")
      .filter(col("event_type") === "click")
    val plan = read.queryExecution.executedPlan.toString

    // the predicate must surface as a PartitionFilter on the scan,
    // not survive as a post-scan data Filter
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), plan)
    assert(!plan.contains("PushedFilters: [IsNotNull(event_type)"), plan)

    // row parity with the unpartitioned filter
    val expect = ev.filter(col("event_type") === "click").count()
    assert(read.count() == expect)

    // the scan's SELECTED partitions must be only the matching one —
    // the 1/N-of-the-lake evidence, read straight off the scan node
    def selectedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .map(_.selectedPartitions.totalNumberOfFiles).sum.toInt
    }
    val prunedFiles = selectedFiles(
      spark.read.parquet(s"$dir/by_type")
        .filter(col("event_type") === "click"))
    val allFiles = selectedFiles(spark.read.parquet(s"$dir/by_type"))
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruned=$prunedFiles all=$allFiles")
  }

  test("partition column round-trips values including reorder") {
    val dir = Files.createTempDirectory("partwrite2").toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$dir/p")
    val back = spark.read.parquet(s"$dir/p")
    // partition columns come back (appended), values intact
    val a = ev.select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = back.select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
  }
}
