package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.functions.TopKAgg.top_k_agg

/** Bounded top-k aggregate: ordering, ties, bounds, cross-partition
  * merge (exercises serialize/deserialize through the shuffle), and
  * the SQL registration.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def topIds(rows: Seq[(String, Double, Long)], k: Int,
      parts: Int = 1): Map[String, Seq[(Double, Long)]] = {
    import spark.implicits._
    val df = rows.toDF("g", "score", "id").repartition(parts)
    df.groupBy("g").agg(top_k_agg(col("score"), col("id"), k).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1))))
      .toMap
  }

  test("orders by score desc, tie-break id asc, truncates at k") {
    val got = topIds(Seq(
      ("a", 0.5, 10L), ("a", 0.9, 3L), ("a", 0.9, 1L),
      ("a", 0.1, 7L), ("a", 0.7, 2L)), k = 3)
    assert(got("a") == Seq((0.9, 1L), (0.9, 3L), (0.7, 2L)))
  }

  test("k larger than group returns all, still ordered") {
    val got = topIds(Seq(("a", 0.2, 2L), ("a", 0.8, 1L)), k = 10)
    assert(got("a") == Seq((0.8, 1L), (0.2, 2L)))
  }

  test("cross-partition merge agrees with single-partition run") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map(i =>
      ("g" + (i % 3), rnd.nextInt(50) / 10.0, i.toLong))
    assert(topIds(rows, 5, parts = 13) == topIds(rows, 5, parts = 1))
  }

  test("null scores and ids are skipped, not ranked") {
    import spark.implicits._
    val df = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(0.4), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(0.9), None), ("a", Some(0.2), Some(3L)))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(top_k_agg(col("score"), col("id"), 5).as("top"))
      .collect().head.getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getDouble(0), e.getLong(1)))
    assert(got == Seq((0.4, 1L), (0.2, 3L)))
  }

  test("SQL-registered form matches the Column API") {
    import spark.implicits._
    graft.Graft.install(spark)
    Seq((1L, 0.3), (2L, 0.9), (3L, 0.5)).toDF("id", "score")
      .createOrReplaceTempView("tk")
    val viaSql = spark.sql(
      "SELECT top_k_agg(score, id, 2) AS top FROM tk")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(e => (e.getDouble(0), e.getLong(1)))
    assert(viaSql == Seq((0.9, 2L), (0.5, 3L)))
  }
}
