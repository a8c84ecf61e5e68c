package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Source/sink format coverage beyond parquet, plus the operational
  * robustness contract a 100 TB lake needs: ORC round-trips with
  * predicate pushdown reaching the scan, CSV/JSON round-trip under a
  * pinned schema, and a corrupt file inside a parquet directory is
  * SKIPPED (with the rest read completely) under
  * `spark.sql.files.ignoreCorruptFiles` — the file-level analogue of
  * the reference's per-file error budgets.
  */
class FormatRobustnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val ev = Tables.events(spark, "/root/testdata/sf0.001")
    .select("event_id", "event_type", "user_id", "value")

  test("ORC round-trip with predicate pushdown at the scan") {
    val dir = Files.createTempDirectory("orcrt").toString
    ev.write.mode("overwrite").orc(s"$dir/ev")
    val back = spark.read.orc(s"$dir/ev")
      .filter(col("user_id") === 7L)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      plan)
    assert(back.count() ==
      ev.filter(col("user_id") === 7L).count())
    // full-fidelity round trip
    val a = ev.collect().map(_.toSeq).toSet
    val b = spark.read.orc(s"$dir/ev").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("CSV and JSON round-trip under a pinned schema") {
    val dir = Files.createTempDirectory("csvrt").toString
    ev.write.mode("overwrite").option("header", "true")
      .csv(s"$dir/csv")
    ev.write.mode("overwrite").json(s"$dir/json")
    val csvBack = spark.read.schema(ev.schema)
      .option("header", "true").csv(s"$dir/csv")
    val jsonBack = spark.read.schema(ev.schema).json(s"$dir/json")
    val want = ev.collect().map(_.toSeq).toSet
    assert(csvBack.collect().map(_.toSeq).toSet == want)
    assert(jsonBack.collect().map(_.toSeq).toSet == want)
  }

  test("corrupt file in a parquet directory: read fails closed by " +
      "default, skips cleanly under ignoreCorruptFiles") {
    val dir = Files.createTempDirectory("corrupt").toString
    ev.write.mode("overwrite").parquet(s"$dir/data")
    // a non-parquet payload wearing the right extension
    Files.write(Paths.get(s"$dir/data/part-junk.snappy.parquet"),
      "this is not parquet".getBytes)
    val clean = ev.count()

    // default: the corrupt member must surface an error, not be
    // silently dropped
    val failed =
      try { spark.read.parquet(s"$dir/data").count(); false }
      catch { case _: Throwable => true }
    assert(failed, "corrupt file must fail the default read")

    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val got = spark.read.parquet(s"$dir/data").count()
      assert(got == clean, s"expected $clean rows, got $got")
    } finally {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    }
  }
}
