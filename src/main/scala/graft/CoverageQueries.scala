package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional engine-coverage declared queries beyond the §2.9 core:
  * scalar subqueries, HAVING, conditional aggregation, UNION ALL,
  * cross join, outer-join NULL accounting, string and date
  * arithmetic — each oracle-checked.
  */
object CoverageQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_scalar_subquery" -> ((s, d) => {
      val o = orders(s, d)
      o.crossJoin(broadcast(o.agg(avg("o_totalprice").as("ap"))))
        .filter(col("o_totalprice") > col("ap"))
        .agg(count(lit(1)).as("n"))
    }),

    "q28_conditional_agg" -> ((s, d) =>
      orders(s, d).groupBy("o_orderstatus")
        .agg(sum(when(col("o_totalprice") > 100000, 1).otherwise(0))
          .as("big"), count(lit(1)).as("c"))
        .orderBy("o_orderstatus")),

    "q29_having" -> ((s, d) =>
      customer(s, d).groupBy("c_nationkey")
        .agg(count(lit(1)).as("c"))
        .filter(col("c") > 20)
        .orderBy("c_nationkey")),

    "q35_union_all" -> ((s, d) =>
      orders(s, d).select(col("o_custkey").as("k"))
        .unionAll(customer(s, d).select(col("c_custkey").as("k")))
        .agg(count(lit(1)).as("n"))),

    "q36_cross_join" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d)).agg(count(lit(1)).as("n"))),

    "q37_null_handling" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d),
          col("o_custkey") === col("c_custkey") && col("c_acctbal") > 9000,
          "left")
        .agg(count(lit(1)).as("total"), count(col("c_name")).as("matched"))),

    "q38_string_funcs" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          concat(col("lang"), lit("-"), col("source")).as("k"),
          regexp_replace(substring(col("text"), 1, 20), " ", "_").as("r"),
          lpad(col("doc_id").cast("string"), 6, "0").as("p"))
        .orderBy("doc_id")
        .limit(100)),

    "q39_date_arith" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("d30"),
          date_trunc("month", col("o_orderdate")).cast("date").as("m"))
        .orderBy("o_orderkey")
        .limit(100))
  )

  val oracleSql: Map[String, String] = Map(
    "q27_scalar_subquery" ->
      """SELECT count(*) AS n FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin,
    "q28_conditional_agg" ->
      """SELECT o_orderstatus,
        |CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS big,
        |count(*) AS c FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q29_having" ->
      """SELECT c_nationkey, count(*) AS c FROM customer
        |GROUP BY c_nationkey HAVING count(*) > 20
        |ORDER BY c_nationkey""".stripMargin,
    "q35_union_all" ->
      """SELECT count(*) AS n FROM (SELECT o_custkey AS k FROM orders
        |UNION ALL SELECT c_custkey FROM customer) t""".stripMargin,
    "q36_cross_join" ->
      "SELECT count(*) AS n FROM region, nation",
    "q37_null_handling" ->
      """SELECT count(*) AS total, count(c_name) AS matched
        |FROM orders LEFT JOIN customer
        |ON o_custkey = c_custkey AND c_acctbal > 9000""".stripMargin,
    "q38_string_funcs" ->
      """SELECT doc_id, concat(lang, '-', source) AS k,
        |replace(substr(text, 1, 20), ' ', '_') AS r,
        |lpad(CAST(doc_id AS VARCHAR), 6, '0') AS p
        |FROM documents ORDER BY doc_id LIMIT 100""".stripMargin,
    "q39_date_arith" ->
      """SELECT o_orderkey, o_orderdate + INTERVAL 30 DAY AS d30,
        |date_trunc('month', o_orderdate) AS m
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin
  )
}
