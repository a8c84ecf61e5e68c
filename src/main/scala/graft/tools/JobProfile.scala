package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool (not part of the driver contract): run queries with a job
  * listener and print one line per Spark job — start offset, wall
  * duration, task count and the first line of the job's call site —
  * so a lifecycle query's seconds can be attributed to its phases
  * (guide §1: measure first, label jobs). Also prints the gap time
  * (driver-side work between jobs), which job-level timing hides.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = 0L,
        var tasks: Int = 0, site: String = "")
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // callSite.short is absent on plain runs; the final stage's
        // name carries the same "op at File.scala:line" string
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(e.stageInfos.sortBy(_.stageId).lastOption.map(_.name))
          .getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time,
            tasks = e.stageInfos.map(_.numTasks).sum, site = site)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = args.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm
      jobs.synchronized { jobs.clear() }
      val t0 = System.currentTimeMillis()
      fn(spark, sfDir).count()
      val t1 = System.currentTimeMillis()
      // listener events are async; give the bus a beat to drain
      Thread.sleep(300)
      println(f"===== $n total ${(t1 - t0) / 1000.0}%.2f s =====")
      var prevEnd = t0
      jobs.synchronized {
        jobs.values.toSeq.sortBy(_.start).foreach { j =>
          val gap = (j.start - prevEnd) / 1000.0
          if (gap > 0.02)
            println(f"  (driver gap ${gap}%6.3f s)")
          val dur = (j.end - j.start) / 1000.0
          println(f"  job ${j.id}%4d +${(j.start - t0) / 1000.0}%7.3f " +
            f"dur ${dur}%6.3f s tasks ${j.tasks}%4d  ${j.site}")
          prevEnd = math.max(prevEnd, j.end)
        }
      }
      val tail = (t1 - prevEnd) / 1000.0
      if (tail > 0.02) println(f"  (driver tail ${tail}%6.3f s)")
    }
    spark.stop()
  }
}
