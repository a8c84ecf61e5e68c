package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.IpMath
import graft.operators.BucketedRangeJoin

/** Proves the BucketedRangeJoin scale story's AQE claim: the bucket
  * equi-join shuffles on (__fam, __bucket), so a pathologically hot
  * bucket — here one /8 receiving ~90 % of probes — is something AQE's
  * OptimizeSkewedJoin can split at runtime. The spec runs the join at
  * test-scale skew thresholds and asserts the skew split actually
  * fires in the adaptive plan (isSkewJoin / "skew" markers), which is
  * exactly the mitigation the operator relies on at 100 TB where a
  * single popular prefix would otherwise pin one task.
  *
  * The residual containment predicate does NOT block the split:
  * OptimizeSkewedJoin matches the sort-merge join node itself and the
  * residual stays attached as its non-equi condition; for a left join
  * only the left (probe/fact) side is split, which is the side the
  * skew lands on by construction.
  */
class BucketedSkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE skew-split fires on the bucket shuffle under a hot /8") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions").map(k =>
      k -> scala.util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: a partition is skewed when it exceeds
      // 2× the median AND 64 KiB; split chunks target ~64 KiB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // the dimension side is tiny: keep AQE from demoting the SMJ to
      // a broadcast join (which has no shuffle to split)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.shuffle.partitions", "8")

      // 64 single-/8 ranges: one covering the hot 10.0.0.0/8, the
      // rest one per cold first octet
      val ranges = (10 until 74).map { o =>
        (IpMath.parseIp(s"$o.0.0.0"), IpMath.parseIp(s"$o.255.255.255"), s"as$o")
      }.toDF("lo", "hi", "tag")
      // 120k probes, ~90 % landing in the 10.0.0.0/8 bucket
      val rnd = new scala.util.Random(31)
      val probes = (0 until 120000).map { i =>
        val ip =
          if (i % 10 < 9) s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
          else s"${11 + rnd.nextInt(63)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}"
        (i.toLong, IpMath.parseIp(ip))
      }.toDF("id", "ip")

      val joined = BucketedRangeJoin.lookup(probes, ranges, col("ip"), nBytes = 1)
      // every probe lies in exactly one /8 range → inner-like totals
      val got = joined.groupBy("tag").agg(count(lit(1)).as("c"))
      val rows = got.collect()
      assert(rows.map(_.getLong(1)).sum == 120000L)
      assert(rows.find(_.getString(0) == "as10").exists(_.getLong(1) >= 100000L))

      // the ADAPTIVE final plan (materialized by the collect above)
      // must carry the skew split on the join it contains
      val finalPlan = got.queryExecution.executedPlan.toString
      val lower = finalPlan.toLowerCase
      assert(lower.contains("skew=true") || lower.contains("skewed"),
        s"expected a skew-split marker in the adaptive plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
