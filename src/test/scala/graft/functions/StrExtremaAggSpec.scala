package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.StrExtremaAgg.{str_max, str_min}

/** str_min/str_max: exact parity with the built-in string min/max
  * (binary UTF8 ordering, null handling, empty groups) while keeping
  * the aggregate on ObjectHashAggregate instead of the built-ins'
  * SortAggregate downgrade.
  */
class StrExtremaAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df = {
    val rows = (0 until 500).map { i =>
      (i % 7,
        if (i % 11 == 0) null
        else if (i % 13 == 0) "" // empty sorts below everything
        else s"v${(i * 37) % 100}%αβ${i % 5}") // multi-byte UTF8
    } ++ Seq((99, null), (99, null)) // an all-null group
    rows.toDF("g", "s")
  }

  test("groupwise str_min/str_max equal the built-in min/max " +
      "(binary ordering, nulls skipped, all-null group yields null)") {
    val got = df.groupBy("g")
      .agg(str_min(col("s")).as("mn"), str_max(col("s")).as("mx"))
      .orderBy("g").collect()
    val want = df.groupBy("g")
      .agg(min("s").as("mn"), max("s").as("mx"))
      .orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("global (no-group) extrema match, including over 0 rows") {
    val got = df.agg(str_min(col("s")), str_max(col("s"))).collect()(0)
    val want = df.agg(min("s"), max("s")).collect()(0)
    assert(got == want)
    val empty = df.filter(lit(false))
      .agg(str_min(col("s")), str_max(col("s"))).collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1))
  }

  test("the plan stays on ObjectHashAggregate — never SortAggregate") {
    val plan = df.groupBy("g")
      .agg(str_min(col("s")), str_max(col("s")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
    // the built-in pays the sort — the reason this aggregate exists
    val builtin = df.groupBy("g").agg(min("s"))
      .queryExecution.executedPlan.toString
    assert(builtin.contains("SortAggregate"), builtin)
  }

  test("SQL registration: str_min/str_max callable from SQL") {
    graft.Graft.install(spark)
    df.createOrReplaceTempView("strext_t")
    val got = spark.sql(
      "SELECT g, str_min(s) mn, str_max(s) mx FROM strext_t " +
        "GROUP BY g ORDER BY g").collect()
    val want = df.groupBy("g")
      .agg(min("s").as("mn"), max("s").as("mx")).orderBy("g").collect()
    assert(got.toSeq == want.toSeq)
  }
}
