package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions._

/** Dev tool: the over-broadcast range-join escalation, measured on a
  * skewed /8-heavy table. The range table mixes one wide /8 range per
  * first octet with thousands of narrow /24s inside ONE hot /8, and
  * 90 % of the probes pile into that /8 — the regime the verdict
  * called out: BucketedRangeJoin's adaptive width coarsens to 1-byte
  * buckets (any finer explodes the /8s), so the hot bucket holds
  * every narrow range AND most facts, and each hot fact evaluates the
  * containment residual against the whole bucket. The shuffle
  * interval join ([[graft.plans.ShuffleRangeJoinExec]], ranges side
  * hinted `merge`) samples fact quantiles — the hot /8 spreads across
  * most partitions — and probes a per-partition interval tree in
  * O(log n + k).
  *
  * Broadcasts are disabled (threshold -1) to simulate the
  * over-broadcast regime at bench scale. Prints wall seconds + row
  * counts for both paths; PERF.md records the delta.
  */
object RangeSkewBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nFacts = args.headOption.map(_.toLong).getOrElse(2000000L)
    val narrowPerHot = if (args.length > 1) args(1).toInt else 2000
    val hotOctet = 42

    // wide: one /8 per first octet; narrow: /24s inside the hot /8
    val wide = spark.range(256)
      .select(cidr_lo(concat(col("id").cast("string"), lit(".0.0.0/8")))
          .as("lo"),
        cidr_hi(concat(col("id").cast("string"), lit(".0.0.0/8")))
          .as("hi"),
        concat(lit("W"), col("id")).as("tag"))
    val narrow = spark.range(narrowPerHot.toLong)
      .select(concat(lit(s"$hotOctet."), (col("id") % 256).cast("string"),
        lit("."), (col("id") / 256).cast("int").cast("string"),
        lit(".0/24")).as("c"))
      .select(cidr_lo(col("c")).as("lo"), cidr_hi(col("c")).as("hi"),
        concat(lit("N"), monotonically_increasing_id()).as("tag"))
    val ranges = wide.unionByName(narrow).persist()
    ranges.count()

    // 90 % of probes inside the hot /8 (distinct ips — the skew is
    // per-/8, not per-key), 10 % uniform over all octets
    val facts = spark.range(nFacts)
      .select(col("id"),
        when(col("id") % 10 < 9,
          concat(lit(s"$hotOctet."), pmod(col("id") * 7, lit(256)),
            lit("."), pmod(col("id") * 13, lit(256)),
            lit("."), pmod(col("id"), lit(256))))
          .otherwise(concat(pmod(col("id") * 31, lit(256)),
            lit("."), pmod(col("id") * 17, lit(256)),
            lit(".5."), pmod(col("id"), lit(256)))).as("ip_s"))
      .select(col("id"), ip_to_bin(col("ip_s")).as("ip"))
      .persist()
    facts.count()

    def time(label: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-16s $sec%7.2f s   rows=$n")
      n
    }

    // warm both paths at small scale
    operators.BucketedRangeJoin
      .lookup(facts.limit(1000), ranges, col("ip")).count()
    facts.limit(1000).join(ranges.hint("merge"),
      col("ip") >= col("lo") && col("ip") <= col("hi"), "left").count()

    val a = time("bucketed",
      operators.BucketedRangeJoin.lookup(facts, ranges, col("ip")))
    val b = time("shuffle-interval",
      facts.join(ranges.hint("merge"),
        col("ip") >= col("lo") && col("ip") <= col("hi"), "left"))
    require(a == b, s"row mismatch: $a vs $b")
    spark.stop()
  }
}
