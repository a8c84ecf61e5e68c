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
        .limit(100)),

    /** Sequential funnel (view → click → purchase): per user, the
      * first view, the first click AFTER that view, the first
      * purchase AFTER that click, each within a 12-hour conversion
      * window — the product-analytics shape that needs event ORDER
      * and recency, not just presence. Step times come from
      * three cascaded (filter → per-user min → equi-join) rounds —
      * shuffles on user_id only, no per-user window/sort — and the
      * one-row summary is a single aggregate over the left-join
      * cascade (never a 1-row cross join). Micros are exact longs,
      * so the mean step latencies are deterministic cross-engine.
      */
    "q108_funnel" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("__t"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("__t").as("t1"))
      val win = 43200000000L // 12 h conversion window, in micros
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("__t") > col("t1") && col("__t") <= col("t1") + win)
        .groupBy("user_id").agg(min("__t").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("__t") > col("t2") && col("__t") <= col("t2") + win)
        .groupBy("user_id").agg(min("__t").as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .agg(count(col("t1")).as("u1"), count(col("t2")).as("u2"),
          count(col("t3")).as("u3"),
          sum(col("t2") - col("t1")).as("__d12"),
          sum(col("t3") - col("t2")).as("__d23"))
        .select(col("u1"), col("u2"), col("u3"),
          round(col("u2").cast("double") / col("u1"), 4).as("conv12"),
          round(col("u3").cast("double") / col("u2"), 4).as("conv23"),
          round(col("__d12").cast("double") / 1000000 / col("u2"), 4)
            .as("avg_s12"),
          round(col("__d23").cast("double") / 1000000 / col("u3"), 4)
            .as("avg_s23"))
    }),

    /** Hopping (sliding) time windows — q23's tumbling twin: event
      * counts per 2-hour window advancing every hour, so each event
      * lands in two windows. Window starts are exact integer micro
      * arithmetic (`floor` to the hour grid, two hops enumerated by a
      * 2-element literal explode) — both engines bin identically with
      * no calendar functions, and the plan is one explode + one hash
      * aggregate, the same shape Structured Streaming's `window()`
      * compiles to.
      */
    "q111_hopping_window" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = events(s, d).select(col("event_type"),
        (unix_micros(col("ts").cast("timestamp")) / hourUs)
          .cast("long").as("__h"))
      ev.select(col("event_type"),
          explode(array(col("__h") - 1, col("__h"))).as("__ws"))
        .groupBy("__ws", "event_type")
        .agg(count(lit(1)).as("c"))
        .select((col("__ws") * hourUs).as("w_start_us"), col("event_type"),
          col("c"))
        .orderBy("w_start_us", "event_type")
    }),

    /** CUBE — the §2.5 grouping-set completion next to q12's ROLLUP
      * and q13's GROUPING SETS: all four (priority, status) slices in
      * one pass.
      */
    "q112_cube" -> ((s, d) =>
      orders(s, d)
        .cube("o_orderpriority", "o_orderstatus")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    /** Pivot to a wide per-user activity matrix — the reshaping op
      * feature pipelines use to turn event streams into fixed-width
      * feature rows. The value list is EXPLICIT (schema is static at
      * plan time — the unlisted-values variant needs a driver-side
      * distinct pass, the documented trade); one hash aggregate,
      * map-side combined.
      */
    "q114_pivot" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("click"),
          coalesce(col("error"), lit(0L)).as("error"),
          coalesce(col("purchase"), lit(0L)).as("purchase"),
          coalesce(col("signup"), lit(0L)).as("signup"),
          coalesce(col("view"), lit(0L)).as("view"))
        .orderBy("user_id")),

    /** Windowed anomaly detection — hourly error counts flagged
      * against their trailing-24h mean (the observability query every
      * event pipeline runs). The spike test is ALL-INTEGER
      * (`12·c > Σ trailing` ⟺ c > 2·mean), so no float knife edge;
      * the trailing window runs over the HOUR-GRID table (≤ one row
      * per hour regardless of event volume — the bounded-window-over-
      * aggregates rule), never over raw events; missing hours densify
      * to zero via an exploded hour spine off the 1-row min/max
      * aggregate, no cross join.
      */
    "q113_error_spike" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hc = events(s, d).filter(col("event_type") === "error")
        .groupBy(expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("h"))
        .agg(count(lit(1)).as("c"))
      val spine = hc.agg(min("h").as("h0"), max("h").as("h1"))
        .select(explode(graft.operators.Grids.boundedSpine(
          col("h0"), col("h1"), what = "hour")).as("h"))
      val grid = spine.join(hc, Seq("h"), "left")
        .select(col("h"), coalesce(col("c"), lit(0L)).as("c"))
      val trail = Window.orderBy("h").rowsBetween(-24, -1)
      val rn = Window.orderBy("h")
      grid
        .withColumn("trail_sum",
          coalesce(sum("c").over(trail), lit(0L)))
        .withColumn("__rn", row_number().over(rn))
        .filter(col("__rn") > 24)
        .select(col("h"), col("c"), col("trail_sum"),
          when(col("c") * 12 > col("trail_sum"), 1L).otherwise(0L)
            .as("is_spike"))
        .orderBy("h")
    }),

    /** Semi-structured props extraction as a declared query (P17's
      * lenient JSON decode, oracle-pinned): parse the `props` JSON
      * column, aggregate the extracted field per event type — exact
      * integer sums close the mean deterministically. `from_json`
      * runs inside the scan projection; a malformed props row yields
      * NULL and is counted, not thrown.
      */
    "q110_json_props" -> ((s, d) => {
      val k = from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k")
      events(s, d)
        .select(col("event_type"), k.as("__k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), count(col("__k")).as("n_parsed"),
          sum(col("__k").cast("long")).as("__s"),
          sum(when(col("__k") > 50, 1L).otherwise(0L)).as("n_big"))
        .select(col("event_type"), col("n"), col("n_parsed"),
          round(col("__s").cast("double") / col("n_parsed"), 4)
            .as("mean_k"), col("n_big"))
        .orderBy("event_type")
    }),

    /** Weekly retention cohorts: users grouped by first-activity week
      * (exact integer weeks since epoch — no calendar functions, so
      * both engines bin identically), counted per later-activity week
      * offset. Two hash aggregates and one equi-join on user_id; the
      * cohort table is user-scale, never event-scale.
      */
    "q109_retention" -> ((s, d) => {
      val wk = events(s, d).select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 86400000000 div 7")
          .as("__w"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min("__w").as("__cw"))
      wk.join(cohort, Seq("user_id"))
        .groupBy(col("__cw").as("cohort_week"),
          (col("__w") - col("__cw")).as("offset_weeks"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "offset_weeks")
    })
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
    // first view, first click after it, first purchase after that;
    // one-row summary over the left-join cascade
    "q108_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t
        |  FROM events),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT ev.user_id, min(t) AS t2 FROM ev
        |  JOIN s1 USING (user_id)
        |  WHERE event_type = 'click' AND t > t1
        |    AND t <= t1 + 43200000000 GROUP BY ev.user_id),
        |s3 AS (SELECT ev.user_id, min(t) AS t3 FROM ev
        |  JOIN s2 USING (user_id)
        |  WHERE event_type = 'purchase' AND t > t2
        |    AND t <= t2 + 43200000000 GROUP BY ev.user_id),
        |j AS (SELECT s1.user_id, t1, t2, t3 FROM s1
        |  LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id))
        |SELECT CAST(count(t1) AS BIGINT) AS u1,
        |  CAST(count(t2) AS BIGINT) AS u2,
        |  CAST(count(t3) AS BIGINT) AS u3,
        |  round(CAST(count(t2) AS DOUBLE) / count(t1), 4) AS conv12,
        |  round(CAST(count(t3) AS DOUBLE) / count(t2), 4) AS conv23,
        |  round(CAST(sum(t2 - t1) AS DOUBLE) / 1000000 / count(t2), 4)
        |    AS avg_s12,
        |  round(CAST(sum(t3 - t2) AS DOUBLE) / 1000000 / count(t3), 4)
        |    AS avg_s23
        |FROM j""".stripMargin,
    // two hops per event on the exact hour grid
    "q111_hopping_window" ->
      """WITH ev AS (SELECT event_type,
        |  epoch_us(ts) // 3600000000 AS h FROM events),
        |w AS (SELECT event_type, h - 1 + k.range AS ws
        |  FROM ev CROSS JOIN range(2) k)
        |SELECT CAST(ws * 3600000000 AS BIGINT) AS w_start_us,
        |  event_type, count(*) AS c
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q112_cube" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS c
        |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        |ORDER BY o_orderpriority NULLS FIRST,
        |  o_orderstatus NULLS FIRST""".stripMargin,
    // conditional aggregation is the engine-neutral pivot twin
    "q114_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS error,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // dense hour spine, trailing-24 integer sum, 12c > sum spike rule
    "q113_error_spike" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events
        |  WHERE event_type = 'error'),
        |hc AS (SELECT h, count(*) AS c FROM e GROUP BY 1),
        |sp AS (SELECT unnest(range(min(h), max(h) + 1)) AS h FROM hc),
        |g AS (SELECT sp.h, coalesce(c, 0) AS c FROM sp
        |  LEFT JOIN hc USING (h)),
        |t AS (SELECT h, c,
        |  coalesce(CAST(sum(c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING
        |    AND 1 PRECEDING) AS BIGINT), 0) AS trail_sum,
        |  row_number() OVER (ORDER BY h) AS rn FROM g)
        |SELECT CAST(h AS BIGINT) AS h, CAST(c AS BIGINT) AS c, trail_sum,
        |  CAST(CASE WHEN c * 12 > trail_sum THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_spike
        |FROM t WHERE rn > 24 ORDER BY h""".stripMargin,
    // json_extract mirrors from_json's NULL-on-malformed semantics
    "q110_json_props" ->
      """WITH e AS (SELECT event_type,
        |  CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, count(*) AS n,
        |  CAST(count(k) AS BIGINT) AS n_parsed,
        |  round(CAST(sum(CAST(k AS BIGINT)) AS DOUBLE) / count(k), 4)
        |    AS mean_k,
        |  CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_big
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // integer weeks since epoch keep both engines' bins identical
    "q109_retention" ->
      """WITH wk AS (SELECT DISTINCT user_id,
        |  epoch_us(ts) // 86400000000 // 7 AS w FROM events),
        |c AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY 1)
        |SELECT cw AS cohort_week, w - cw AS offset_weeks,
        |  count(*) AS n_users
        |FROM wk JOIN c USING (user_id) GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
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
