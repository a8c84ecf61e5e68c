package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Bucketing is the 100 TB co-location story for repeated fact⋈dim
  * and fact⋈fact joins: write both sides bucketed on the join key
  * and every later join (and any aggregation on the same key) reads
  * the partitioning off disk instead of shuffling. This spec proves
  * the claim against the physical plan: the co-bucketed join plans
  * ZERO Exchange operators — and the post-join aggregation on the
  * bucket key rides the same disk-provided partitioning.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("co-bucketed tables join and aggregate with zero Exchange") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-buckets")
      .toString
    val facts = (0L until 20000L).map(i => (i % 997L, i))
      .toDF("k", "v")
    val dims = (0L until 997L).map(i => (i, s"dim$i")).toDF("k", "name")
    facts.write.mode("overwrite").option("path", s"$tmp/facts")
      .bucketBy(8, "k").sortBy("k").saveAsTable("bspec_facts")
    dims.write.mode("overwrite").option("path", s"$tmp/dims")
      .bucketBy(8, "k").sortBy("k").saveAsTable("bspec_dims")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bspec_facts")
        .join(spark.table("bspec_dims"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), max("name").as("nm"))
      val rows = j.collect()
      assert(rows.length == 997 && rows.forall(_.getLong(1) >= 20))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join/agg should not shuffle:\n$plan")
      // control: the same join from plain (unbucketed) parquet MUST
      // shuffle — proves the assert above is load-bearing
      facts.write.mode("overwrite").parquet(s"$tmp/plain_facts")
      dims.write.mode("overwrite").parquet(s"$tmp/plain_dims")
      val p = spark.read.parquet(s"$tmp/plain_facts")
        .join(spark.read.parquet(s"$tmp/plain_dims"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      p.collect()
      assert(p.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }
}
