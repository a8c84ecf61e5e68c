package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Grids.boundedSpine: calendar-bounded grids pass through untouched;
  * a data-driven span blowup fails fast in-plan instead of feeding a
  * monster grid to an unpartitioned window.
  */
class GridsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("in-bound span behaves exactly like sequence(lo, hi)") {
    import spark.implicits._
    val got = Seq((5L, 9L)).toDF("lo", "hi")
      .select(explode(Grids.boundedSpine(col("lo"), col("hi"))).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(5L, 6L, 7L, 8L, 9L))
  }

  test("over-bound span raises in-plan with the labeled message") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((0L, 50L)).toDF("lo", "hi")
        .select(explode(Grids.boundedSpine(col("lo"), col("hi"),
          maxCells = 10, what = "hour")).as("v"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("hour spine exceeds 10 cells")), messages(e))
  }

  test("default ceiling admits a century of hours") {
    import spark.implicits._
    val n = Seq((0L, 876000L)).toDF("lo", "hi")
      .select(explode(Grids.boundedSpine(col("lo"), col("hi"))).as("v"))
      .count()
    assert(n === 876001L)
  }

  test("null bounds (empty upstream) yield an empty grid, not a raise") {
    import spark.implicits._
    // the shape every spine query has: min/max over a filter that
    // matched nothing → one row of null bounds feeding the spine
    val n = Seq(1L, 2L).toDF("v").filter(col("v") > 100)
      .agg(min("v").as("lo"), max("v").as("hi"))
      .select(explode(Grids.boundedSpine(col("lo"), col("hi"),
        maxCells = 10)).as("g"))
      .count()
    assert(n === 0L)
  }
}
