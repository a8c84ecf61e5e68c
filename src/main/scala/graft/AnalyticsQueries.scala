package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-analytics declared queries: distribution window functions,
  * exact-integer population outlier detection, cross-source
  * contamination, iterative PageRank in exact micro-units, and
  * degree-oriented triangle counting — the graph/statistics side of
  * a curation pipeline (domain authority ranking, anomalous-source
  * detection, inter-source duplication audits).
  *
  * Numeric discipline follows the house rule: every cross-engine
  * value is either an exact integer (scaled longs, floor division)
  * or a single closing IEEE expression over exact integers, so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object AnalyticsQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Distribution window functions (ntile / percent_rank /
      * cume_dist) — price quartiles and percentile position within a
      * (priority, month) cohort. Partitioning by the cohort pair
      * gives hundreds of groups, so no single task funnels the
      * table the way a global ORDER BY would; the tie-break on
      * o_orderkey makes every rank deterministic. percent_rank and
      * cume_dist are one IEEE division of the same exact integers on
      * both engines, hence bit-identical.
      */
    "q115_window_dist" -> ((s, d) => {
      val m = date_trunc("month", col("o_orderdate")).cast("date")
      val w = Window.partitionBy(col("o_orderpriority"), m)
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d).select(
        col("o_orderkey"),
        col("o_orderpriority").as("pri"),
        m.as("m"),
        ntile(4).over(w).cast("int").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
        .orderBy("o_orderkey")
    }),

    /** Population z-score outliers without a single float: a user is
      * anomalous when cnt > mean + 2*stddev over all users. With
      * n = #users, S = sum(cnt), S2 = sum(cnt^2), that inequality is
      * squared to (cnt*n - S)^2 > 4*(n*S2 - S^2) (guarded by
      * cnt*n - S > 0), which stays in BIGINT end to end — no
      * sqrt, no engine-specific stddev semantics. The stats side is
      * a 1-row aggregate crossed back onto the per-user table (the
      * adjudicated q60 totals-cross class).
      */
    "q116_zscore_outliers" -> ((s, d) => {
      val u = events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val st = u.agg(count(lit(1)).as("n"), sum("cnt").as("s"),
        sum(col("cnt") * col("cnt")).as("s2"))
      val dev = col("cnt") * col("n") - col("s")
      u.crossJoin(broadcast(st))
        .select(col("user_id"), col("cnt"),
          (dev > 0 && dev * dev > lit(4) *
            (col("n") * col("s2") - col("s") * col("s")))
            .cast("int").as("is_out"))
        .orderBy("user_id")
    }),

    /** Cross-source contamination audit: for every source pair, how
      * many near-duplicate keys they share. The key is a 5-word
      * title prefix digest (the cheap URL/title-level key a crawl
      * audit uses before paying for MinHash); the per-key fan-out in
      * the self-join is bounded by the number of sources, so the
      * pair explosion is |keys| * |sources|^2 worst-case — never
      * corpus x corpus.
      */
    "q117_source_overlap" -> ((s, d) => {
      val dg = documents(s, d)
        .select(md5(concat_ws(" ",
          slice(split(col("text"), " "), 1, 5))).as("dig"),
          col("source"))
        .distinct()
      dg.as("a").join(dg.as("b"), "dig")
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("s1", "s2")
    }),

    /** PageRank (3 Jacobi iterations, damping 0.85) over the
      * symmetrized customer–supplier order graph, in exact integer
      * micro-units: each node starts at 1e6, contributes
      * floor(rank*85 / (outdeg*100)) along each out-edge, and lands
      * at 150000 + sum(in-contributions). Floor division makes every
      * iteration bit-exact cross-engine (a little mass evaporates —
      * fine for a ranking signal). Each iteration is one equi-join of
      * the edge list with the node-scale rank table plus one
      * map-side-combined sum — the canonical distributed-PageRank
      * shuffle shape; nothing ever sorts or crosses.
      */
    "q118_pagerank" -> ((s, d) => {
      val e0 = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      val edges = e0.unionAll(
        e0.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .withColumnRenamed("src", "node")
      var ranks = deg.select(col("node"), lit(1000000L).as("rank"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(ranks.join(deg, "node"),
            edges("src") === col("node"))
          .select(col("dst"),
            expr("(rank * 85) div (outdeg * 100)").as("c"))
          .groupBy("dst").agg(sum("c").as("cs"))
        ranks = deg.select(col("node"))
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("cs"), lit(0L))).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("node")).limit(100)
    }),

    /** Triangle counting over the co-ordered-parts graph with
      * degree orientation: every undirected edge is directed from
      * its lower-(degree, id) endpoint to the higher, so each
      * triangle is counted exactly once as a wedge a->b->c closed by
      * a->c, and per-node wedge fan-out is bounded by the SMALLER
      * endpoint's degree — the standard trick that keeps hub nodes
      * from exploding the wedge join at scale (Suri & Vassilvitskii,
      * WWW'11). Three hash equi-joins, no window, no cross.
      */
    "q119_triangles" -> ((s, d) => {
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
        .distinct()
        .persist()
      val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("dg"))
      val withDeg = e
        .join(deg.withColumnRenamed("n", "u").withColumnRenamed("dg", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("dg", "dv"), "v")
      val oriented = withDeg.select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("lo"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("hi"))
        .persist()
      val wedges = oriented.as("e1")
        .join(oriented.as("e2"), col("e1.hi") === col("e2.lo"))
        .select(col("e1.lo").as("a"), col("e2.hi").as("c"))
      wedges.join(oriented,
          col("a") === col("lo") && col("c") === col("hi"), "left_semi")
        .agg(count(lit(1)).as("n_tri"))
    }),

    /** Nearest-in-time as-of: each purchase matched to the same
      * user's closest view in EITHER direction (tie -> earlier).
      * Exercises [[graft.operators.AsOf.asOfNearest]] — two guarded
      * asOfMerge passes (the forward one is the backward merge on a
      * negated time axis) re-aligned on event_id. The oracle states
      * the semantics directly as correlated min/max subqueries.
      */
    "q120_nearest_asof" -> ((s, d) => {
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("t").as("pt"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("t").as("vt"))
      graft.operators.AsOf
        .asOfNearest(p, v, col("pt"), "vt", Seq("user_id"), "event_id")
        .select(col("event_id"), col("pt"),
          col("vt").as("nearest_vt"), col("asof_dir").as("dir"),
          (col("vt") - col("pt")).as("delta_us"))
        .orderBy("event_id")
    }),

    /** Exact per-group percentiles (p50/p90/p99, linear
      * interpolation). Contract: `percentile` buffers each GROUP's
      * values — right for bounded cohorts like these six flag/status
      * cells; for corpus-scale groups use the mergeable
      * [[graft.operators.LogHist]] sketch (q89) instead. Driver
      * round-4 absorbs interpolation ULP.
      */
    "q121_percentile_exact" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"),
          expr("percentile(l_extendedprice, 0.99)").as("p99"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    /** Gaps-and-islands: per user, runs of consecutive active DAYS
      * (a >1-day gap breaks the streak) via the classic
      * day - row_number() constant-per-island key — one per-user
      * window over the deduped (user, day) table (user-count scale,
      * already bounded), then two hash aggregates. All integers.
      */
    "q122_gaps_islands" -> ((s, d) => {
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val streaks = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      streaks.groupBy("user_id")
        .agg(sum("len").as("n_days"), count(lit(1)).as("n_streaks"),
          max("len").as("longest"))
        .orderBy("user_id")
    }),

    /** Frequent-pair mining (market-basket over order baskets):
      * co-occurrence count per part pair with support >= 2, plus
      * exact lift = n_uv*N/(n_u*n_v) — the numerator and denominator
      * are exact integer products, so the one closing division is
      * bit-identical cross-engine. Item counts broadcast onto the
      * pair table; basket total is a 1-row totals cross.
      */
    "q123_frequent_pairs" -> ((s, d) => {
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val pairs = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      val item = li.groupBy(col("pk")).agg(count(lit(1)).as("ni"))
      val total = li.select(col("ok")).distinct()
        .agg(count(lit(1)).as("nb"))
      pairs
        .join(broadcast(item.select(col("pk").as("u"),
          col("ni").as("nu"))), "u")
        .join(broadcast(item.select(col("pk").as("v"),
          col("ni").as("nv"))), "v")
        .crossJoin(broadcast(total))
        .select(col("u"), col("v"), col("n"),
          round((col("n") * col("nb")).cast("double") /
            (col("nu") * col("nv")), 4).as("lift"))
        .orderBy(col("n").desc, col("u"), col("v"))
        .limit(100)
    }),

    /** Interval-overlap join via a coarse time grid: 10-day order
      * intervals from two status classes, paired when they overlap.
      * Each interval explodes to its covered 16-day grid cells
      * (<= 2 each), the join runs as a hash EQUI-join on the cell,
      * and a pair counts only in the FIRST cell both intervals
      * share — exact dedup with no distinct pass. This is the
      * band-join shape that scales where an inequality-only theta
      * join degenerates to a cross; the oracle is the plain
      * inequality join.
      */
    "q124_interval_overlap" -> ((s, d) => {
      def side(status: String) = orders(s, d)
        .filter(col("o_orderstatus") === status &&
          year(col("o_orderdate")) === 1995)
        .select(unix_date(col("o_orderdate").cast("date")).as("s"),
          date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      val a = side("P")
        .withColumn("bk",
          explode(sequence(expr("s div 16"), expr("(s + 9) div 16"))))
        .select(col("s").as("as_"), col("m"), col("bk"))
      val b = side("F")
        .withColumn("bk",
          explode(sequence(expr("s div 16"), expr("(s + 9) div 16"))))
        .select(col("s").as("bs"), col("bk"))
      a.join(b, Seq("bk"))
        .filter(col("as_") < col("bs") + 10 &&
          col("bs") < col("as_") + 10 &&
          col("bk") === greatest(expr("as_ div 16"), expr("bs div 16")))
        .groupBy("m").agg(count(lit(1)).as("n_overlap"))
        .orderBy("m")
    }),

    /** Exact set-similarity self-join at Jaccard >= 0.6 over word
      * trigram shingles via [[graft.operators.Dedup.prefixFilterJoin]]
      * (AllPairs prefix filtering) — zero false negatives, unlike
      * the MinHash/LSH path (q43). The oracle brute-forces the same
      * semantics through the token-intersection join; the engine
      * side never compares non-candidate pairs.
      */
    "q125_setsim_join" -> ((s, d) =>
      graft.operators.Dedup
        .prefixFilterJoin(documents(s, d), "text", "doc_id",
          tauTenths = 6, shingle = 3)
        .withColumn("jac", round(col("n_inter").cast("double") /
          col("n_union"), 4))
        .orderBy("doc_id_a", "doc_id_b")),

    /** Ratio-to-report + rank over a grouped rollup: each supplier
      * nation's share of total revenue. Money is exact scaled-long
      * cents (the q22 rewrite), so the share is one closing division
      * of exact integers. The unpartitioned window runs over the
      * ALREADY-AGGREGATED nation table (bounded: 25 rows) — never
      * over the fact stream.
      */
    "q126_ratio_to_report" -> ((s, d) => {
      val rev = lineitem(s, d)
        .join(broadcast(supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk"))
        .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .as("cents"))
      val wAll = Window.partitionBy()
      val wRank = Window.orderBy(col("cents").desc, col("nk"))
      rev.select(col("nk"), col("cents"),
          round(col("cents").cast("double") /
            sum("cents").over(wAll), 4).as("share"),
          rank().over(wRank).cast("int").as("rnk"))
        .orderBy("nk")
    }))

  val oracleSql: Map[String, String] = Map(
    "q115_window_dist" ->
      """SELECT o_orderkey, o_orderpriority AS pri,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (
        |  PARTITION BY o_orderpriority, date_trunc('month', o_orderdate)
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    // squared z-score rule in exact BIGINTs; no sqrt crosses engines
    "q116_zscore_outliers" ->
      """WITH u AS (SELECT user_id, count(*) AS cnt FROM events
        |  GROUP BY 1),
        |st AS (SELECT count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s,
        |  CAST(sum(cnt * cnt) AS BIGINT) AS s2 FROM u)
        |SELECT user_id, cnt,
        |  CAST(CASE WHEN cnt * n - s > 0
        |    AND (cnt * n - s) * (cnt * n - s) > 4 * (n * s2 - s * s)
        |    THEN 1 ELSE 0 END AS INT) AS is_out
        |FROM u, st ORDER BY user_id""".stripMargin,
    "q117_source_overlap" ->
      """WITH d AS (SELECT DISTINCT
        |  md5(array_to_string((string_split(text, ' '))[1:5], ' '))
        |    AS dig, source
        |  FROM documents)
        |SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
        |FROM d a JOIN d b ON a.dig = b.dig AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // three unrolled Jacobi iterations, floor-div micro-units
    "q118_pagerank" ->
      """WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src,
        |    's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM e0
        |  UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, count(*) AS outdeg FROM e
        |  GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM deg),
        |c1 AS (SELECT e.dst AS node,
        |    CAST(sum((r.rank * 85) // (d2.outdeg * 100)) AS BIGINT) AS cs
        |  FROM e JOIN r0 r ON e.src = r.node
        |  JOIN deg d2 ON e.src = d2.node GROUP BY 1),
        |r1 AS (SELECT deg.node,
        |    CAST(150000 + coalesce(cs, 0) AS BIGINT) AS rank
        |  FROM deg LEFT JOIN c1 ON deg.node = c1.node),
        |c2 AS (SELECT e.dst AS node,
        |    CAST(sum((r.rank * 85) // (d2.outdeg * 100)) AS BIGINT) AS cs
        |  FROM e JOIN r1 r ON e.src = r.node
        |  JOIN deg d2 ON e.src = d2.node GROUP BY 1),
        |r2 AS (SELECT deg.node,
        |    CAST(150000 + coalesce(cs, 0) AS BIGINT) AS rank
        |  FROM deg LEFT JOIN c2 ON deg.node = c2.node),
        |c3 AS (SELECT e.dst AS node,
        |    CAST(sum((r.rank * 85) // (d2.outdeg * 100)) AS BIGINT) AS cs
        |  FROM e JOIN r2 r ON e.src = r.node
        |  JOIN deg d2 ON e.src = d2.node GROUP BY 1),
        |r3 AS (SELECT deg.node,
        |    CAST(150000 + coalesce(cs, 0) AS BIGINT) AS rank
        |  FROM deg LEFT JOIN c3 ON deg.node = c3.node)
        |SELECT node, rank FROM r3
        |ORDER BY rank DESC, node LIMIT 100""".stripMargin,
    // undirected a<b<c closure: (a,b),(b,c),(a,c) all edges
    "q119_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT count(*) AS n_tri
        |FROM e e1 JOIN e e2 ON e1.v = e2.u
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin,
    // nearest-view semantics stated directly as correlated subqueries
    "q120_nearest_asof" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |    epoch_us(ts) AS t FROM events),
        |p AS (SELECT event_id, user_id, t AS pt FROM ev
        |  WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, t AS vt FROM ev
        |  WHERE event_type = 'view'),
        |j AS (SELECT p.event_id, p.pt,
        |  (SELECT max(vt) FROM v
        |    WHERE v.user_id = p.user_id AND vt <= p.pt) AS bt,
        |  (SELECT min(vt) FROM v
        |    WHERE v.user_id = p.user_id AND vt >= p.pt) AS ft
        |  FROM p),
        |r AS (SELECT event_id, pt,
        |  CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
        |       WHEN ft IS NULL THEN bt WHEN bt IS NULL THEN ft
        |       WHEN pt - bt <= ft - pt THEN bt ELSE ft END AS nearest_vt,
        |  CASE WHEN bt IS NULL AND ft IS NULL THEN NULL
        |       WHEN ft IS NULL THEN 'b' WHEN bt IS NULL THEN 'f'
        |       WHEN pt - bt <= ft - pt THEN 'b' ELSE 'f' END AS dir
        |  FROM j)
        |SELECT event_id, pt, nearest_vt, dir,
        |  nearest_vt - pt AS delta_us
        |FROM r ORDER BY event_id""".stripMargin,
    "q121_percentile_exact" ->
      """SELECT l_returnflag, l_linestatus,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  quantile_cont(l_extendedprice, 0.99) AS p99,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // day - row_number() is constant within a consecutive-day run
    "q122_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id
        |      ORDER BY day) AS grp
        |  FROM days),
        |st AS (SELECT user_id, grp, count(*) AS len FROM isl
        |  GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
        |  count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS longest
        |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    // lift's numerator/denominator are exact integer products
    "q123_frequent_pairs" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |pairs AS (SELECT a.pk AS u, b.pk AS v, count(*) AS n
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |item AS (SELECT pk, count(*) AS ni FROM li GROUP BY 1),
        |total AS (SELECT count(DISTINCT ok) AS nb FROM li)
        |SELECT u, v, n,
        |  round(CAST(n * nb AS DOUBLE) / (iu.ni * iv.ni), 4) AS lift
        |FROM pairs JOIN item iu ON pairs.u = iu.pk
        |JOIN item iv ON pairs.v = iv.pk CROSS JOIN total
        |ORDER BY n DESC, u, v LIMIT 100""".stripMargin,
    // plain inequality join states overlap; engine side runs the
    // grid-cell equi-join with first-shared-cell dedup
    "q124_interval_overlap" ->
      """WITH a AS (SELECT
        |    datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS s,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m
        |  FROM orders WHERE o_orderstatus = 'P'
        |    AND date_part('year', o_orderdate) = 1995),
        |b AS (SELECT
        |    datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS s
        |  FROM orders WHERE o_orderstatus = 'F'
        |    AND date_part('year', o_orderdate) = 1995)
        |SELECT m, count(*) AS n_overlap
        |FROM a JOIN b ON a.s < b.s + 10 AND b.s < a.s + 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // brute-force twin: token-intersection join + integer threshold
    "q125_setsim_join" ->
      """WITH t AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w
        |    FROM documents),
        |  LATERAL (SELECT unnest(range(1, len(w) - 1)) AS i)),
        |sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db,
        |    count(*) AS ni
        |  FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS doc_id_a, db AS doc_id_b,
        |  ni AS n_inter,
        |  CAST(sa.n + sb.n - ni AS BIGINT) AS n_union,
        |  round(CAST(ni AS DOUBLE) / (sa.n + sb.n - ni), 4) AS jac
        |FROM inter JOIN sz sa ON da = sa.doc_id
        |JOIN sz sb ON db = sb.doc_id
        |WHERE ni * 10 >= 6 * (sa.n + sb.n - ni)
        |ORDER BY 1, 2""".stripMargin,
    // exact cents; share = one division of exact integers
    "q126_ratio_to_report" ->
      """WITH rev AS (SELECT s_nationkey AS nk,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1)
        |SELECT nk, cents,
        |  round(CAST(cents AS DOUBLE) /
        |    (SELECT CAST(sum(cents) AS BIGINT) FROM rev), 4) AS share,
        |  CAST(rank() OVER (ORDER BY cents DESC, nk) AS INT) AS rnk
        |FROM rev ORDER BY nk""".stripMargin)
}
