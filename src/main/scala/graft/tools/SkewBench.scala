package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: the asOfMerge hot-key cliff, measured. One monster key
  * carries millions of timeline rows next to a well-behaved key
  * population; the unguarded merge sorts the whole monster timeline
  * in ONE task while the guard (AsOf.scala hot-key slicing) spreads
  * it across (key, slice) tasks. Prints wall seconds for both paths
  * plus the row count sanity check; PERF.md records the delta.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val monsterRows = args.headOption.map(_.toInt).getOrElse(4000000)

    // monster key 0: `monsterRows` facts + 2000 snapshots; background
    // population: 200k facts over 1000 cold keys with 20k snapshots
    val snaps = spark.range(2000)
      .select(lit(0L).as("k"),
        date_add(lit(java.sql.Date.valueOf("2000-01-01")),
          (col("id") * 3).cast("int")).as("snap_date"),
        concat(lit("s"), col("id")).as("v"))
      .unionByName(spark.range(20000)
        .select((col("id") % 1000 + 1).as("k"),
          date_add(lit(java.sql.Date.valueOf("2000-01-01")),
            pmod(col("id") * 17, lit(6000)).cast("int")).as("snap_date"),
          concat(lit("c"), col("id")).as("v"))
        .groupBy("k", "snap_date").agg(first("v").as("v")))
    val facts = spark.range(monsterRows.toLong)
      .select(col("id"), lit(0L).as("k"),
        date_add(lit(java.sql.Date.valueOf("2000-01-01")),
          pmod(col("id") * 37, lit(6200)).cast("int")).as("t"))
      .unionByName(spark.range(200000)
        .select((col("id") + 10000000L).as("id"),
          (col("id") % 1000 + 1).as("k"),
          date_add(lit(java.sql.Date.valueOf("2000-01-01")),
            pmod(col("id") * 13, lit(6200)).cast("int")).as("t")))
    snaps.persist(); facts.persist()
    snaps.count(); facts.count()

    def time(label: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s $sec%7.2f s   rows=$n")
      n
    }
    // warm both code paths once at small scale
    operators.AsOf.asOfMerge(facts.limit(1000), snaps, col("t"),
      "snap_date", Seq("k"), maxKeyRows = 100).count()

    val a = time("unguarded",
      operators.AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
        Seq("k"), joinType = "inner", maxKeyRows = 0))
    val b = time("guarded",
      operators.AsOf.asOfMerge(facts, snaps, col("t"), "snap_date",
        Seq("k"), joinType = "inner"))
    require(a == b, s"row mismatch: $a vs $b")
    spark.stop()
  }
}
