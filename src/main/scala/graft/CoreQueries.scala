package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2.9 declared-query contract (Q1–Q24).
  *
  * Each query is written with the DataFrame API (so Catalyst plans it:
  * pushdown, broadcast, whole-stage codegen) and paired with the
  * canonical ANSI SQL the driver runs on DuckDB over the same parquet.
  * Column names are aliased identically on both sides — the driver's
  * compare sorts columns by name before hashing.
  */
object CoreQueries {
  import Tables._

  /** quantity bins for Q7 (range join). */
  private def quantityBins(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((0, 10), (10, 25), (25, 51)).toDF("lo", "hi")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 — scan + project (S5)
    "q01_scan_project" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)),

    // Q2 — filter (F4/F5)
    "q02_filter" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_discount") > 0.05 && col("l_returnflag") === "R")
        .agg(count(lit(1)).as("n"))),

    // Q3 — broadcast equi inner join (J4)
    "q03_join_broadcast" -> ((s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("c"))
        .orderBy("n_name")),

    // Q4 — left join + coalesce fallback (J3)
    "q04_left_join_coalesce" -> ((s, d) =>
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"),
          coalesce(col("c_name"), lit("UNKNOWN")).as("cname"))
        .orderBy("o_orderkey")
        .limit(100)),

    // Q5 — semi join (F6)
    "q05_semi_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 100000)
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))),

    // Q6 — anti join (F6)
    "q06_anti_join" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))),

    // Q7 — range join (J1): tiny build side is broadcast so the
    // BNLJ degenerates to a per-row bin probe.
    "q07_range_join" -> ((s, d) =>
      lineitem(s, d)
        .join(broadcast(quantityBins(s)),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy("lo").agg(count(lit(1)).as("c"))
        .orderBy("lo")),

    // Q8 — as-of join (J2), declared portable form. NOT the naive
    // expand-then-aggregate (events × all earlier orders of the user,
    // then max per event — unbounded intermediate at 100 TB) and not
    // the interval join either (both sides are fact-scale here, so
    // neither should be broadcast): AsOf.asOfMerge unions the two
    // tables onto one per-user timeline and one incremental window
    // pass carries the latest order date onto each event. One shuffle,
    // no join operator, output ≤ events row count by construction.
    // ts is cast to TIMESTAMP_NTZ (session TZ is UTC — value
    // preserving) to align with o_orderdate for the merged timeline.
    "q08_asof_join" -> ((s, d) => {
      val orderDates = orders(s, d)
        .select(col("o_custkey").as("user_id"), col("o_orderdate"))
      val facts = events(s, d)
        .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"),
          col("user_id"))
      graft.operators.AsOf.asOfMerge(
          facts, orderDates, col("ts"), "o_orderdate",
          keyCols = Seq("user_id"), joinType = "inner")
        .select(col("event_id"), col("o_orderdate").as("asof"))
        .orderBy("event_id")
        .limit(100)
    }),

    // Q9 — multi-way join (J8)
    "q09_multiway_join" -> ((s, d) =>
      supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum("s_acctbal"), 4).as("bal"))
        .orderBy("r_name", "n_name")),

    // Q10 — hash agg partial+final (A5), TPC-H Q1 core
    "q10_hash_agg" -> ((s, d) =>
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sq"),
          round(avg("l_extendedprice"), 4).as("ap"),
          count(lit(1)).as("c"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Q11 — distinct aggregate
    "q11_distinct_agg" -> ((s, d) =>
      orders(s, d).agg(countDistinct(col("o_custkey")).as("u"))),

    // Q12 — rollup
    "q12_rollup" -> ((s, d) =>
      orders(s, d)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    // Q13 — grouping sets
    "q13_grouping_sets" -> ((s, d) => {
      val j = customer(s, d).join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      j.groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("n_name")), Seq()),
          col("c_mktsegment"), col("n_name"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("n_name").asc_nulls_first)
    }),

    // Q14 — window ranking
    "q14_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 2)
        .orderBy("o_custkey", "rn")
        .limit(200)
    }),

    // Q15 — window lag (A2 machinery)
    "q15_window_lag" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("event_id"),
          (col("value") - lag("value", 1).over(w)).as("dv"))
        .orderBy("event_id")
        .limit(200)
    }),

    // Q16 — window frame running sum
    "q16_window_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"),
          round(sum("value").over(w), 4).as("rs"))
        .orderBy("event_id")
        .limit(200)
    }),

    // Q17 — gaps-and-islands sessionization (A2)
    "q17_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // `ts` is TIMESTAMP or TIMESTAMP_NTZ depending on testdata
      // vintage; unix_micros accepts only the former. Session tz is
      // UTC at every entry point, so the cast is an exact
      // reinterpretation of the same micros.
      def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
      events(s, d)
        .withColumn("brk",
          when(micros(col("ts")) -
            micros(lag(col("ts"), 1).over(w)) > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sid", sum("brk").over(wRun))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n"), min("ts").as("t0"))
        .orderBy("user_id", "sid")
        .limit(200)
    }),

    // Q18 — sort / top-k
    "q18_topk" -> ((s, d) =>
      orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // Q19 — set ops
    "q19_intersect" -> ((s, d) =>
      customer(s, d).select(col("c_custkey").as("c"))
        .intersect(orders(s, d).select(col("o_custkey").as("c")))
        .orderBy("c").limit(100)),
    "q19_except" -> ((s, d) =>
      customer(s, d).select(col("c_custkey").as("c"))
        .except(orders(s, d).select(col("o_custkey").as("c")))
        .orderBy("c").limit(100)),

    // Q20 — string ops (P9-style)
    "q20_string_ops" -> ((s, d) =>
      documents(s, d)
        .filter(col("lang") === "en")
        .select(col("doc_id"),
          upper(substring(col("text"), 1, 10)).as("h"),
          length(col("text")).cast("long").as("n"))
        .orderBy("doc_id")
        .limit(100)),

    // Q21 — date ops (P8-style)
    "q21_date_ops" -> ((s, d) =>
      orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("c"))
        .orderBy("y", "m")),

    // Q22 — arithmetic (P12/P14). Note: double rounding at an exact
    // .00005 boundary can differ between engines (Spark rounds the
    // shortest decimal repr HALF_UP, DuckDB rounds the binary value);
    // observed at 1 row in 600k at sf0.1, none at the t2 gate SF.
    // the charge arithmetic runs in EXACT decimals (the source values
    // are 2dp money/rates, so the casts are lossless) and only the
    // final rounded result returns to double: double-product rounding
    // at a 4th-decimal knife-edge flipped one row per ~100k between
    // engines (first seen at sf0.1; ±1 ulp in the product order)
    // Exact-decimal charge arithmetic in SCALED LONGS: inputs are
    // exactly 2dp, so price/discount/tax ×100 round to exact
    // integers and the product is exact at scale 1e6; `+50 div 100`
    // is HALF_UP to 4dp (all values non-negative) — the same result
    // as the r11 decimal(12,2) chain, minus the wide-decimal multiply
    // cost on the 600k-row scan (decimals measured 1.4× the r01
    // double plan; longs stay in codegen's fast path).
    "q22_math" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          (expr("""(CAST(round(l_extendedprice * 100) AS BIGINT)
             | * (100 - CAST(round(l_discount * 100) AS BIGINT))
             | * (100 + CAST(round(l_tax * 100) AS BIGINT))
             | + 50) div 100""".stripMargin)
            .cast("double") / 10000.0).as("chg"))
        .orderBy("l_orderkey", "l_linenumber", "chg")
        .limit(100)
        .select("l_orderkey", "chg")),

    // Q23 — tumbling window agg (T3/T4 batch-replayable form)
    "q23_tumbling_window" -> ((s, d) =>
      events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("w"), col("event_type"))
        .agg(count(lit(1)).as("c"), round(sum("value"), 4).as("sv"))
        .orderBy("w", "event_type")),

    // Q24 — array ops over embeddings (P10-style)
    "q24_array_ops" -> ((s, d) =>
      embeddings(s, d)
        .groupBy("label")
        .agg(count(lit(1)).as("c"),
          max(size(col("embedding"))).cast("long").as("dim"))
        .orderBy("label"))
  )

  val oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""".stripMargin,
    "q02_filter" ->
      """SELECT count(*) AS n FROM lineitem
        |WHERE l_discount > 0.05 AND l_returnflag = 'R'""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT n_name, count(*) AS c FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q04_left_join_coalesce" ->
      """SELECT o_orderkey, coalesce(c_name, 'UNKNOWN') AS cname
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q05_semi_join" ->
      """SELECT count(*) AS n FROM customer WHERE c_custkey IN
        |(SELECT o_custkey FROM orders WHERE o_totalprice > 100000)""".stripMargin,
    "q06_anti_join" ->
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "q07_range_join" ->
      """SELECT b.lo, count(*) AS c FROM lineitem l JOIN
        |(SELECT 0 AS lo, 10 AS hi UNION ALL SELECT 10, 25
        | UNION ALL SELECT 25, 51) b
        |ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        |GROUP BY b.lo ORDER BY b.lo""".stripMargin,
    "q08_asof_join" ->
      """SELECT e.event_id, max(o.o_orderdate) AS asof FROM events e
        |JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |GROUP BY e.event_id ORDER BY e.event_id LIMIT 100""".stripMargin,
    "q09_multiway_join" ->
      """SELECT r_name, n_name, round(sum(s_acctbal),4) AS bal
        |FROM supplier JOIN nation ON s_nationkey=n_nationkey
        |JOIN region ON n_regionkey=r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q10_hash_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) AS sq,
        |round(avg(l_extendedprice),4) AS ap, count(*) AS c
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q11_distinct_agg" ->
      "SELECT count(DISTINCT o_custkey) AS u FROM orders",
    "q12_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS c FROM orders
        |GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin,
    "q13_grouping_sets" ->
      """SELECT c_mktsegment, n_name, count(*) AS c FROM customer
        |JOIN nation ON c_nationkey=n_nationkey
        |GROUP BY GROUPING SETS ((c_mktsegment),(n_name),())
        |ORDER BY c_mktsegment NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q14_window_rank" ->
      """SELECT * FROM (SELECT o_custkey, o_orderkey,
        |row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey) AS rn FROM orders) t
        |WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 200""".stripMargin,
    "q15_window_lag" ->
      """SELECT event_id, value - lag(value) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id) AS dv
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,
    "q16_window_frame" ->
      """SELECT event_id, round(sum(value) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id
        | ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS rs
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,
    "q17_sessionize" ->
      """WITH g AS (SELECT user_id, ts, CASE WHEN ts - lag(ts) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
        |THEN 1 ELSE 0 END AS brk, event_id FROM events),
        |s AS (SELECT user_id, event_id, ts, CAST(sum(brk) OVER
        |(PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
        | AS BIGINT) AS sid
        |FROM g)
        |SELECT user_id, sid, count(*) AS n, min(ts) AS t0 FROM s
        |GROUP BY user_id, sid ORDER BY user_id, sid LIMIT 200""".stripMargin,
    "q18_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q19_intersect" ->
      """SELECT c FROM (SELECT c_custkey AS c FROM customer
        |INTERSECT SELECT o_custkey FROM orders) t ORDER BY c LIMIT 100""".stripMargin,
    "q19_except" ->
      """SELECT c FROM (SELECT c_custkey AS c FROM customer
        |EXCEPT SELECT o_custkey FROM orders) t ORDER BY c LIMIT 100""".stripMargin,
    "q20_string_ops" ->
      """SELECT doc_id, upper(substr(text,1,10)) AS h, length(text) AS n
        |FROM documents WHERE lang = 'en' ORDER BY doc_id LIMIT 100""".stripMargin,
    "q21_date_ops" ->
      """SELECT extract(year FROM o_orderdate) AS y,
        |extract(month FROM o_orderdate) AS m, count(*) AS c
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    // same scaled-long half-up formula as the Spark side ( // is
    // floor division; the numerator is non-negative, so it equals
    // Spark's `div` truncation)
    "q22_math" ->
      """SELECT l_orderkey,
        |CAST((CAST(round(l_extendedprice * 100) AS BIGINT)
        |  * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |  * (100 + CAST(round(l_tax * 100) AS BIGINT))
        |  + 50) // 100 AS DOUBLE) / 10000 AS chg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, chg LIMIT 100""".stripMargin,
    "q23_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS w, event_type, count(*) AS c,
        |round(sum(value),4) AS sv FROM events
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q24_array_ops" ->
      """SELECT label, count(*) AS c, max(len(embedding)) AS dim
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
  )
}
