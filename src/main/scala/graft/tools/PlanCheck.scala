package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: warm-session per-query timings + plan inspection for the
  * slowest queries. Not part of the driver contract.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    // warmup whole engine once
    SparkEntry.queries("q10_hash_agg")(spark, sfDir).count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"WARM $n%-28s $dt%7.3f s")
      // SPARK_GRAFT_JOINS=1: print each query's join/aggregate
      // operators from the FINAL adaptive plan (post-AQE, so runtime
      // broadcast conversions show up — the static executedPlan lies
      // about what actually ran)
      sys.env.get("SPARK_GRAFT_JOINS").foreach { _ =>
        val df = fn(spark, sfDir)
        df.count()
        val p = df.queryExecution.executedPlan.toString
        p.linesIterator
          .filter(l => l.contains("Join") || l.contains("Aggregate"))
          .foreach(l => println("  " + l.trim.take(110)))
      }
    }
    sys.env.get("SPARK_GRAFT_CODEGEN").foreach { _ =>
      import org.apache.spark.sql.functions._
      import graft.functions.IpFunctions._
      val df = spark.range(10)
        .withColumn("ip", concat(lit("10.0.0."), col("id").cast("string")))
        .withColumn("bin", ip_to_bin(col("ip")))
        .withColumn("fam", ip_family(col("bin")))
        .withColumn("back", ip_format(col("bin")))
      df.queryExecution.debug.codegen()
    }
    sys.env.get("SPARK_GRAFT_EXPLAIN").foreach { qs =>
      qs.split(",").foreach { n =>
        println(s"===== $n =====")
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
