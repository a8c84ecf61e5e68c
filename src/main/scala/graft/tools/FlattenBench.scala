package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.IpMath

/** Ingest-path scale check: flatten a GeoLite2-sized nested range
  * table (one group) and report rows/s. The per-group pass is linear;
  * real datasets parallelize across (dataset × family × snapshot)
  * groups.
  */
object FlattenBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // /24 parents with nested /26 children every few blocks
    val rows = (0 until n).flatMap { i =>
      val base = IpMath.parseIp(s"${1 + i / 65536}.${(i / 256) % 256}.${i % 256}.0")
      val parent = ("g", base, IpMath.ipAdd(base, 255), s"p${i % 1000}")
      if (i % 3 == 0) {
        val clo = IpMath.ipAdd(base, 64)
        Seq(parent, ("g", clo, IpMath.ipAdd(clo, 63), s"c${i % 1000}"))
      } else Seq(parent)
    }
    val df = rows.toDF("dataset", "lo", "hi", "payload")
    operators.Ranges.flattenRanges(df, Seq("dataset")).count() // warm
    val t0 = System.nanoTime()
    val out = operators.Ranges.flattenRanges(df, Seq("dataset")).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"flatten_rows_per_sec","value":${rows.size / dt}%.0f,"in_rows":${rows.size},"out_rows":$out,"sec":$dt%.2f}""")

    // per-family grouping (the buildGeoSnapshot shape): same total
    // rows split across v4-mapped + native-v6 regions; with 2
    // concurrent groups wall time should approach half the
    // single-group figure above
    val v6rows = (0 until n).map { i =>
      val base = IpMath.parseIp(
        f"2001:db8:${i / 65536}%x:${i % 65536}%x::")
      ("g", base, IpMath.ipAdd(base, 255), s"p${i % 1000}")
    }
    val mixed = (rows ++ v6rows).toDF("dataset", "lo", "hi", "payload")
      .withColumn("fam", graft.functions.IpFunctions.ip_family(col("lo")))
    operators.Ranges.flattenRanges(mixed, Seq("fam")).count() // warm
    val t1 = System.nanoTime()
    val out2 = operators.Ranges.flattenRanges(mixed, Seq("fam")).count()
    val dt2 = (System.nanoTime() - t1) / 1e9
    val inRows = rows.size + v6rows.size
    println(f"""{"metric":"flatten_by_family_rows_per_sec","value":${inRows / dt2}%.0f,"in_rows":$inRows,"out_rows":$out2,"groups":2,"sec":$dt2%.2f}""")
    spark.stop()
  }
}
