package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.IpMath
import graft.operators.RangeLookup

/** Annotation-throughput microbench (BASELINE.md informal target:
  * ≥ 10⁵ point-in-range lookups/s/core with broadcast dims).
  *
  * Builds a synthetic disjoint range table (size like a GeoLite2
  * snapshot slice) and probes it with N random IPs through the
  * broadcast binary-search path, reporting lookups/s and
  * lookups/s/core.
  */
object AnnotateBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nRanges = args.headOption.map(_.toInt).getOrElse(200000)
    val nProbes = args.lift(1).map(_.toLong).getOrElse(5000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // disjoint /17-spaced v4 ranges with a payload
    val ranges = (0 until nRanges).map { i =>
      val base = IpMath.parseIp(
        s"${10 + i / 65536}.${(i / 256) % 256}.${i % 256}.0")
      (base, IpMath.ipAdd(base, 200), s"payload$i")
    }.toDF("lo", "hi", "payload")

    // random probes as a generated (not collected) fact table
    val probes = spark.range(nProbes)
      .withColumn("bin", graft.functions.IpFunctions.ip_to_bin(
        concat(lit("10."), (pmod(xxhash64(col("id")), lit(256))).cast("string"),
          lit("."), (pmod(xxhash64(col("id"), lit(1)), lit(256))).cast("string"),
          lit("."), (pmod(xxhash64(col("id"), lit(2)), lit(256))).cast("string"))))

    // production shape: the snapshot index is built once per refresh
    // and probed by many batches — time the probe path only, over a
    // materialized fact table (parse cost excluded, like a service
    // probing parsed request IPs).
    val facts = probes.persist()
    facts.count()
    val (bc, withIdx) = RangeLookup.buildIndex(spark, ranges)
    def run(): Double = {
      val t0 = System.nanoTime()
      facts
        .withColumn(RangeLookup.IdxCol, RangeLookup.rangeSearch(col("bin"), bc))
        .join(broadcast(withIdx.drop("lo", "hi")), Seq(RangeLookup.IdxCol), "left")
        .filter(col("payload").isNotNull).count()
      (System.nanoTime() - t0) / 1e9
    }
    def runSearchOnly(): Double = {
      val t0 = System.nanoTime()
      facts
        .select(RangeLookup.rangeSearch(col("bin"), bc).as("idx"))
        .filter(col("idx").isNotNull).count()
      (System.nanoTime() - t0) / 1e9
    }
    val (bcS, schemaS) = graft.operators.RangeStructLookup.buildIndex(spark, ranges)
    def runStruct(): Double = {
      val t0 = System.nanoTime()
      facts
        .withColumn("payload", org.apache.spark.sql.GraftBridge.column(
          graft.operators.RangePayload(
            org.apache.spark.sql.GraftBridge.expression(col("bin")), bcS, schemaS)))
        .filter(col("payload").isNotNull).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(); runSearchOnly(); runStruct() // warm
    val dt = run()
    val dtS = runSearchOnly()
    val dtP = runStruct()
    val perSec = nProbes / dt
    val perSecS = nProbes / dtS
    println(f"""{"metric":"annotate_lookups_per_sec","value":$perSec%.0f,"per_core":${perSec / cpus}%.0f,"search_only":$perSecS%.0f,"search_only_per_core":${perSecS / cpus}%.0f,"struct_path":${nProbes / dtP}%.0f,"struct_path_per_core":${nProbes / dtP / cpus}%.0f,"ranges":$nRanges,"probes":$nProbes,"cores":$cpus,"sec":$dt%.2f}""")
    spark.stop()
  }
}
