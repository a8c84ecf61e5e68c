package graft

import org.apache.spark.sql.{GraftBridge, SparkSession}

/** Library entry point: one call wires everything graft adds to a
  * session — the IP SQL functions, the broadcast sorted-interval join
  * strategy, and the metrics listener.
  *
  * {{{
  * val spark = SparkSession.builder()...getOrCreate()
  * graft.Graft.install(spark)
  * spark.sql("SELECT ip_format(cidr_lo('10.0.0.0/8'))")
  * }}}
  *
  * Alternatively register at session build time with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (strategy only).
  */
object Graft {
  def install(spark: SparkSession): Unit = {
    functions.IpFunctions.register(spark)
    functions.TextFunctions.register(spark)
    functions.VecFunctions.register(spark)
    functions.MinHashAgg.register(spark)
    functions.TopKAgg.register(spark)
    functions.StrExtremaAgg.register(spark)
    functions.RangeTableFunctions.register(spark)
    GraftBridge.addStrategy(spark, plans.RangeJoinStrategy)
    plans.AggViewRewrite.install(spark)
    plans.ColStatsInjection.install(spark)
    plans.ZoneMapScan.install(spark)
    metrics.Metrics.install(spark)
  }
}
