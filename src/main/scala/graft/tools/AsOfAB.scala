package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the q08/q26 merge shapes — guarded (default) vs
  * unguarded (maxKeyRows = 0) — warm, min-of-3, same session. Not
  * part of the driver contract.
  */
object AsOfAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q08(maxKeyRows: Int) = {
      val orderDates = Tables.orders(spark, sfDir)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"))
      val facts = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"))
      graft.operators.AsOf.asOfMerge(
          facts, orderDates, col("ts"), "o_orderdate",
          keyCols = Seq("user_id"), joinType = "inner",
          maxKeyRows = maxKeyRows)
        .select(col("event_id"), col("o_orderdate").as("asof"))
        .orderBy("event_id").limit(100)
    }
    def time(label: String, f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"AB $label%-22s min=${ts.min}%6.3f  runs=${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    time("q08 unguarded", q08(0).count())
    time("q08 guarded", q08(graft.operators.AsOf.DefaultMaxKeyRows).count())
    spark.stop()
  }
}
