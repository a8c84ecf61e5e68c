package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      * fine for a ranking signal).
      *
      * Runs through [[graft.operators.Graph.pageRank]]: out-degree
      * ATTACHED ONCE to the cached (src, dst, outdeg) edge list by a
      * broadcast dim join; per iteration that list joins the
      * broadcast NODE-scale (node, rank) table (the q60 "vocab side"
      * class) and one map-side-combined contribution sum IS the next
      * rank table. The symmetrized graph guarantees indeg = outdeg
      * ≥ 1, so no completing outer join is needed: ONE shuffle per
      * iteration. The edge list never re-shuffles; billion-node
      * graphs set broadcastRanks=false for a co-partitioned shuffle
      * join, and 20+-iteration runs get per-interval lineage
      * checkpoints (3 oracle iterations stay checkpoint-free, full
      * plan analyzable). Nothing sorts, nothing crosses.
      */
    "q118_pagerank" -> ((s, d) => {
      // long node ids while the graph iterates: suppliers map to
      // -(suppkey + 1) — the +1 matters because both key spaces
      // start at 0 and a bare negation would merge customer 0 with
      // supplier 0; the display label materializes only on the
      // node-scale result
      val e0 = lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("src"),
          (-(col("l_suppkey") + 1)).cast("long").as("dst"))
        .distinct()
      val edges = e0.unionAll(
        e0.select(col("dst").as("src"), col("src").as("dst")))
        .persist()
      val rank = graft.operators.Graph.pageRank(edges, iterations = 3)
      rank.select(when(col("node") >= 0, concat(lit("c"), col("node")))
            .otherwise(concat(lit("s"), -col("node") - 1)).as("node"),
          col("rank"))
        .orderBy(col("rank").desc, col("node")).limit(100)
    }),

    /** Triangle counting over the SUPPORT-PRUNED co-ordered-parts
      * graph (pairs co-ordered >= 2 times) with degree orientation:
      * every undirected edge is directed from its lower-(degree, id)
      * endpoint to the higher, so each triangle is counted exactly
      * once as a wedge a->b->c closed by a->c, and per-node wedge
      * fan-out is bounded by the SMALLER endpoint's degree — the
      * standard trick that keeps hub nodes from exploding the wedge
      * join at scale (Suri & Vassilvitskii, WWW'11). The support
      * threshold is the other scale lever: co-occurrence graphs are
      * quadratic in basket size and dominated by weight-1 noise
      * edges; pruning them first is what any production graph
      * pipeline does, and it keeps Sum(outdeg^2) — the wedge count —
      * bounded. Three hash equi-joins, no window, no cross.
      */
    "q119_triangles" -> ((s, d) => {
      val li = lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("u", "v")
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
    }),

    /** First-order Markov transition matrix over per-user event
      * sequences: lag() within each user's (ts, event_id)-ordered
      * stream yields transition bigrams; one hash-agg counts the
      * matrix, and row-normalized probabilities divide exact counts
      * (matrix is #event_types², bounded — the row-total join
      * broadcasts). Per-user windows partition on the natural key, so
      * no single task ever holds more than one user's history.
      */
    "q127_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("t"), col("event_id"))
      val pairs = events(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("t"),
          col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy("prev", "event_type").agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy("prev").agg(sum("n").as("tot"))
      pairs.join(broadcast(totals), "prev")
        .select(col("prev"), col("event_type"), col("n"),
          round(col("n").cast("double") / col("tot"), 4).as("p"))
        .orderBy("prev", "event_type")
    }),

    /** Source similarity via word-frequency profiles: exact integer
      * dot products between per-source term-frequency vectors, cosine
      * as ONE closing float expression over exact sums (sqrt is
      * IEEE-correctly-rounded on both engines). The profile join fans
      * out ≤ #sources rows per word — the q117 bound — and the norm
      * table is #sources rows, broadcast.
      */
    "q128_source_cosine" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      val norms = tf.groupBy("source")
        .agg(sum(col("n") * col("n")).as("n2"))
      val dots = tf.as("a").join(tf.as("b"),
          col("a.w") === col("b.w") &&
          col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(sum(col("a.n") * col("b.n")).as("dot"))
      dots
        .join(broadcast(norms.select(col("source").as("s1"),
          col("n2").as("n2a"))), "s1")
        .join(broadcast(norms.select(col("source").as("s2"),
          col("n2").as("n2b"))), "s2")
        .select(col("s1"), col("s2"), col("dot"),
          round(col("dot").cast("double") /
            (sqrt(col("n2a")) * sqrt(col("n2b"))), 4).as("cos"))
        .orderBy("s1", "s2")
    }),

    /** Rolling 7-day distinct users (exact sliding-window distinct):
      * each active (user, day) explodes into the 7 trailing window
      * days it contributes to, then one two-phase distinct aggregate
      * per window day — the scale shape for exact sliding distincts
      * (cardinality-sketch alternative: q86's mergeable HLL). Fan-out
      * is a fixed ×7, never quadratic.
      */
    "q129_rolling_distinct" -> ((s, d) =>
      events(s, d)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"))
        .distinct()
        .withColumn("wd", explode(sequence(col("day"), col("day") + 6)))
        .groupBy("wd")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("wd")),

    /** EWMA smoothing of the hourly error-count series with
      * alpha = 1/2 truncated at 20 terms. The trick that makes a
      * FLOAT result hash-exact cross-engine: every weight is a
      * negative power of two, so each term c/2^(k+1) is an exact
      * dyadic rational and every partial sum is exact — summation
      * order (partition order, engine order) cannot change the
      * result. Each hour's count explodes to the 20 window positions
      * it feeds (fixed ×20 fan-out), then one hash-agg sums — no
      * recursive state, no per-key window sort.
      */
    "q130_ewma" -> ((s, d) => {
      val e = events(s, d).filter(col("event_type") === "error")
        .select(expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("h"))
      val hc = e.groupBy("h").agg(count(lit(1)).as("c"))
      val bounds = hc.agg(min("h").as("lo"), max("h").as("hi"))
      val grid = bounds
        .select(explode(graft.operators.Grids.boundedSpine(
          col("lo"), col("hi"), what = "hour")).as("h"))
        .join(hc, Seq("h"), "left")
        .select(col("h"), coalesce(col("c"), lit(0L)).as("c"))
      val sm = grid
        .withColumn("k", explode(sequence(lit(0), lit(19))))
        .select((col("h") + col("k")).as("t"),
          (col("c").cast("double") /
            expr("cast(shiftleft(1L, k + 1) as double)")).as("w"))
        .groupBy("t").agg(sum("w").as("ewma"))
        .join(grid.select(col("h").as("t")), Seq("t"), "left_semi")
      // full 20-term windows only: the grid is dense, so row_number
      // over the bounded hour table is t - lo + 1
      sm.withColumn("rn", row_number().over(Window.orderBy("t")))
        .filter(col("rn") > 19).drop("rn")
        .orderBy("t")
    }),

    /** Grouped simple linear regression (per-nation price trend):
      * slope/intercept/r2 from the five classic sums, every sum an
      * exact centered long (x = days since 2000-01-01, y = whole
      * dollars — cents would push n*syy past INT64, the same
      * overflow on both engines; .5 dollars is dyadic-exact and both
      * engines round half away from zero) so the closing float
      * expressions are identical cross-engine. At petabyte row
      * counts the sums promote to DECIMAL(38,0) — documented, same
      * shape. One fact-scan hash-agg; no window, no join beyond the
      * broadcast dim.
      */
    "q131_grouped_regression" -> ((s, d) => {
      val j = orders(s, d)
        .join(broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          (unix_date(col("o_orderdate").cast("date")) - 10957).cast("long")
            .as("x"),
          expr("cast(round(o_totalprice) as bigint)").as("y"))
      val g = j.groupBy("nk").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      val deny = col("n") * col("syy") - col("sy") * col("sy")
      val slope = num.cast("double") / den.cast("double")
      g.select(col("nk"), col("n"),
          round(slope, 4).as("slope"),
          round((col("sy").cast("double") - slope * col("sx")) /
            col("n"), 4).as("intercept"),
          round(num.cast("double") * num.cast("double") /
            (den.cast("double") * deny.cast("double")), 4).as("r2"))
        .orderBy("nk")
    }),

    /** Rolling z-score anomaly detection: daily event totals vs the
      * TRAILING 14-day frame's mean + 2*sigma, squared into pure
      * integer arithmetic exactly like q116 (population variant) —
      * (c*n - s)^2 > 4*(n*s2 - s^2) over frame sums s, s2. Window
      * runs on the bounded dense day grid, full frames only.
      */
    "q132_rolling_zscore" -> ((s, d) => {
      val dc = events(s, d)
        .select(expr("unix_micros(cast(ts as timestamp)) div 86400000000")
          .as("day"))
        .groupBy("day").agg(count(lit(1)).as("c"))
      val spine = dc.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(graft.operators.Grids.boundedSpine(
          col("lo"), col("hi"), what = "day")).as("day"))
      val grid = spine.join(dc, Seq("day"), "left")
        .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
      val w = Window.orderBy("day").rowsBetween(-14, -1)
      val wn = Window.orderBy("day")
      val dev = col("c") * lit(14L) - col("s")
      grid
        .withColumn("s", sum("c").over(w))
        .withColumn("s2", sum(col("c") * col("c")).over(w))
        .withColumn("rn", row_number().over(wn))
        .filter(col("rn") > 14)
        .select(col("day"), col("c"), col("s"),
          (dev > 0 && dev * dev >
            lit(4L) * (lit(14L) * col("s2") - col("s") * col("s")))
            .cast("int").as("is_anomaly"))
        .orderBy("day")
    }),

    /** Dataset-card corpus report: per-source doc count, exact char
      * totals/mean, language count, and language-mix entropy in the
      * q60 micro-log discipline — each (source, lang) cell carries
      * c * round(ln(c/N)*1e6) as an exact long, so the per-source
      * entropy sum is partition-order-free; the one closing division
      * converts to nats. Two hash aggs over a bounded cell table.
      */
    "q133_corpus_report" -> ((s, d) => {
      val cells = documents(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("c"), sum("n_chars").as("chars"))
      val perSrc = cells.groupBy("source")
        .agg(sum("c").as("n_docs"), sum("chars").as("total_chars"),
          count(lit(1)).as("n_langs"))
      cells.join(perSrc, "source")
        .withColumn("__term", col("c") *
          round(log(col("c").cast("double") /
            col("n_docs").cast("double")) * 1e6).cast("long"))
        .groupBy(col("source"), col("n_docs"), col("total_chars"),
          col("n_langs"))
        .agg((-sum("__term")).as("h_micro"))
        .select(col("source"), col("n_docs"), col("total_chars"),
          round(col("total_chars").cast("double") / col("n_docs"), 4)
            .as("mean_chars"),
          col("n_langs"), col("h_micro"),
          round(col("h_micro").cast("double") /
            (col("n_docs").cast("double") * 1e6), 4).as("h_nats"))
        .orderBy("source")
    }),

    /** KMV (k-minimum-values) distinct-count sketch, k=32, over the
      * cross-engine-stable 60-bit md5 hash: per language plus one
      * merged all-corpus row. The k smallest hashes come from the
      * bounded [[graft.functions.TopKAgg]] — each task keeps <= k
      * entries per group before the shuffle (score = the hash's top
      * 48 bits negated, exact in a double; ties fall to the id which
      * IS the hash, so the order is exactly ascending h). Estimate
      * (k-1)*2^60/h_k is one closing float expression; merge = the
      * same agg over the union, shown by the *all* row. Unlike HLL
      * (q86), KMV sketches also support INTERSECTION estimates via
      * inclusion-exclusion on merged sketches.
      */
    "q134_kmv_distinct" -> ((s, d) => {
      val h = documents(s, d)
        .select(col("lang"),
          graft.functions.StableHash.md5Int60(col("text")).as("h"))
        .distinct()
      def sketch(df: DataFrame, grp: Column) = df
        .groupBy(grp.as("grp"))
        .agg(graft.functions.TopKAgg.top_k_agg(
          expr("cast(-shiftright(h, 12) as double)"), col("h"), 32)
            .as("__top"),
          count(lit(1)).as("n_exact"))
        .select(col("grp"), col("n_exact"),
          size(col("__top")).as("k_eff"),
          element_at(col("__top"), size(col("__top")))
            .getField("id").as("hk"))
      val all = sketch(h.select(col("h")).distinct()
        .withColumn("lang", lit("*all*")), col("lang"))
      sketch(h, col("lang")).unionByName(all)
        .select(col("grp"), col("n_exact"), col("k_eff"), col("hk"),
          when(col("k_eff") === 32,
            round(lit(31.0) *
              expr("cast(shiftleft(1L, 60) as double)") /
              col("hk").cast("double"), 4)).as("est"))
        .orderBy("grp")
    }),

    /** Z-order layout keys ([[graft.functions.ZOrder]]): Morton
      * interleave of (nation, bucketed account balance) — the
      * write-side clustering step that makes parquet min/max pruning
      * work on BOTH predicate dimensions at 100 TB. The key is 32
      * codegen'd bit terms; the oracle rebuilds it as a sum of
      * disjoint powers of two over an exploded bit table.
      */
    "q135_zorder" -> ((s, d) => {
      val c = customer(s, d).select(col("c_custkey"),
        col("c_nationkey").cast("long").as("x"),
        expr("(cast(round(c_acctbal * 100) as bigint) + 100000) div 32")
          .as("y"))
      c.withColumn("z", graft.functions.ZOrder
          .interleave16(col("x"), col("y")))
        .orderBy("z", "c_custkey").limit(200)
    }),

    /** Unpivot/melt via stack(): the wide per-status count columns
      * fold back to tall (status, n) rows — the inverse of q114's
      * pivot, one generator projection over the already-aggregated
      * table.
      */
    "q136_unpivot" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
          .as("f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0))
            .as("o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0))
            .as("p"))
        .select(col("o_orderpriority"),
          expr("stack(3, 'F', f, 'O', o, 'P', p) AS (status, n)"))
        .orderBy("o_orderpriority", "status")),

    /** Null-safe equi-join (<=>): click and error volumes matched on
      * the nullable parsed props key, where the NULL bucket (the
      * malformed-JSON rows, P17 semantics) must MATCH — a plain
      * equi-join silently drops it, the classic reconciliation bug.
      * Full-outer so each side's unmatched keys survive.
      */
    "q137_nullsafe_join" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k"))
      def side(t: String, as: String) = ev
        .filter(col("event_type") === t)
        .groupBy(col("k").as(s"k_$as"))
        .agg(count(lit(1)).as(s"n_$as"))
      side("click", "a").join(side("error", "b"),
          col("k_a") <=> col("k_b"), "full_outer")
        .select(coalesce(col("k_a"), col("k_b")).as("k"),
          coalesce(col("n_a"), lit(0L)).as("n_click"),
          coalesce(col("n_b"), lit(0L)).as("n_error"))
        .orderBy(col("k"))
    }),

    /** Month-over-month revenue growth: exact cents per month, one
      * lag over the bounded month table, growth as one closing
      * division of exact longs. The fact scan aggregates BEFORE any
      * window — the window never sees fact-scale rows.
      */
    "q138_mom_growth" -> ((s, d) => {
      val m = orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("m"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
          .as("cents"))
      val w = Window.orderBy("m")
      m.withColumn("prev", lag("cents", 1).over(w))
        .select(col("m"), col("cents"),
          round((col("cents").cast("double") / col("prev") - 1) * 100,
            4).as("growth_pct"))
        .orderBy("m")
    }),

    /** Time-weighted average of the event value per user: each
      * value holds from its event until the user's next event
      * (lead), weighted by exact whole-second durations; value in
      * exact scaled cents, so TWA is one closing division. Per-user
      * windows on the natural key; the last event (no successor)
      * carries no weight.
      */
    "q139_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("t"), col("event_id"))
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
      ev.withColumn("nt", lead("t", 1).over(w))
        .filter(col("nt").isNotNull)
        .withColumn("dt", expr("(nt - t) div 1000000"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("dt").as("total_sec"),
          sum(col("vc") * col("dt")).as("wsum"))
        .select(col("user_id"), col("n"), col("total_sec"),
          round(col("wsum").cast("double") /
            (col("total_sec").cast("double") * 100), 4).as("twa"))
        .orderBy("user_id")
    }),

    /** explode_outer: the generator that KEEPS parent rows with
      * empty/NULL arrays — a plain explode silently drops them (the
      * q137 reconciliation-bug class, generator edition). Short docs
      * (< 8 words -> no 8-gram) must survive with a NULL gram.
      */
    "q140_explode_outer" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("__w"))
        .select(col("doc_id"),
          explode_outer(expr(
            """CASE WHEN size(__w) >= 48 THEN
              |  transform(sequence(0, size(__w) - 48),
              |    i -> array_join(slice(__w, i + 1, 48), ' '))
              |ELSE CAST(array() AS array<string>) END""".stripMargin))
            .as("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_rows"), count(col("gram")).as("n_grams"))
        .filter(col("n_grams") < col("n_rows"))
        .orderBy("doc_id")),

    /** Deterministic set collection: sort_array(collect_set(...)) —
      * collect_set alone is partition-order-dependent and would
      * never hash-match an oracle; the sort is what makes an array
      * aggregate reproducible (same rule as every array op here).
      * The sorted set is then array_join'd to a scalar string so the
      * output row carries no list-typed cell (the portable contract
      * for cross-engine comparison of set aggregates).
      */
    "q141_collect_sorted" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority")
        .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
          countDistinct("o_orderstatus").as("n"))
        .orderBy("o_orderpriority")),

    /** Navigation window functions: first_value / last_value /
      * nth_value over an explicit full-partition frame — the
      * default frame (unbounded preceding, CURRENT ROW) makes
      * last_value a footgun; the explicit frame is the semantics
      * people actually want.
      */
    "q142_nav_functions" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
          first(col("o_orderkey")).over(w).as("cheapest"),
          last(col("o_orderkey")).over(w).as("dearest"),
          nth_value(col("o_orderkey"), 2).over(w).as("second"))
        .orderBy("o_orderkey")
    }),

    /** RANGE frame (value-based, not row-based): each order sums all
      * same-priority orders within 1000 price units below it —
      * peers-by-VALUE, where a ROWS frame would take a fixed row
      * count. Prices collapse to exact cents first so the frame
      * bounds are integer comparisons on both engines.
      */
    "q143_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("pri")
        .orderBy(col("cents"))
        .rangeBetween(-100000, 0)
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
          expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn("near_sum", sum("cents").over(w))
        .orderBy("o_orderkey")
    }),

    /** Zipf's-law fit per language: regression of micro-ln(freq) on
      * micro-ln(rank) over each language's top-100 words — the
      * vocabulary-health diagnostic (natural text fits slope ≈ −1).
      * Top-100 via the bounded TopKAgg (≤k per group per task, no
      * vocab-wide window sort), ranked by (freq DESC, stable 60-bit
      * hash) so the tie order is reproducible cross-engine without
      * shipping word strings; both lns are exact micro-longs (q60
      * discipline), the five regression sums are exact (q131), and
      * the slope is one closing division.
      */
    "q144_zipf_fit" -> ((s, d) => {
      val wc = documents(s, d)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
        .select(col("lang"), col("cnt"),
          graft.functions.StableHash.md5Int60(col("w")).as("wh"))
      val top = wc.groupBy("lang")
        .agg(graft.functions.TopKAgg.top_k_agg(
          col("cnt").cast("double"), col("wh"), 100).as("__top"))
        .select(col("lang"),
          posexplode(col("__top")).as(Seq("__p0", "__e")))
        .select(col("lang"),
          round(log((col("__p0") + 1).cast("double")) * 1e6)
            .cast("long").as("x"),
          round(log(col("__e.score")) * 1e6).cast("long").as("y"))
      val g = top.groupBy("lang").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      g.select(col("lang"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double"), 4).as("zipf_slope"))
        .orderBy("lang")
    }),

    /** Bitemporal lookup: "the price valid at V, as KNOWN at
      * transaction time T" — the two-axis as-of that audit/ML-replay
      * pipelines need (never read data the system hadn't recorded
      * yet). Versions synthesized arithmetically from `nation` (the
      * ApiQueries fixture recipe); facts pick, among versions with
      * valid_from <= V and tx_from <= T, the max (valid_from,
      * tx_from) — packed with the price into ONE exact long so the
      * argmax stays a single HashAggregate (the q96 rule: a
      * struct-max would plan a SortAggregate); the bounded version
      * table broadcasts.
      */
    "q145_bitemporal" -> ((s, d) => {
      val versions = nation(s, d)
        .select(col("n_nationkey").as("item"))
        .withColumn("v", explode(sequence(lit(0), lit(2))))
        .withColumn("c", explode(sequence(lit(0), lit(1))))
        .select(col("item"),
          (unix_date(to_date(lit("2020-01-01"))) + col("v") * 10)
            .cast("long").as("valid_from"),
          (unix_date(to_date(lit("2020-02-01"))) + col("c") * 10)
            .cast("long").as("tx_from"),
          (col("item") * 100 + col("v") * 10 + col("c")).cast("long")
            .as("price"))
      val facts = orders(s, d)
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"),
          (col("o_custkey") % 25).cast("long").as("item"),
          (unix_date(to_date(lit("2020-01-01"))) +
            col("o_orderkey") % 30).cast("long").as("vt"),
          (unix_date(to_date(lit("2020-02-01"))) +
            col("o_orderkey") % 25).cast("long").as("tt"))
      // lexicographic (valid_from, tx_from, price) == numeric order
      // of the packed long: every field is bounded (days < 10^5,
      // price < 10^4)
      val packed = (col("valid_from") * 100000L + col("tx_from")) *
        10000L + col("price")
      facts.join(broadcast(versions), Seq("item"), "left")
        .filter(col("valid_from") <= col("vt") &&
          col("tx_from") <= col("tt"))
        .groupBy("o_orderkey", "item", "vt", "tt")
        .agg(max(packed).as("__b"))
        .select(col("o_orderkey"), col("item"), col("vt"), col("tt"),
          expr("__b div 1000000000").as("valid_from"),
          expr("(__b div 10000) % 100000").as("tx_from"),
          (col("__b") % 10000L).as("price"))
        .orderBy("o_orderkey")
    }),

    /** Transitive closure by EXPONENTIAL DOUBLING over the synthetic
      * part tree parent(p) = (p-1) div 4: T_{2m} = T_m ∪ T_m⋈T_m
      * reaches depth 2^rounds in log(depth) self-joins — the scale
      * discipline for deep hierarchies where a frontier loop would
      * take depth sequential shuffles (and a recursive CTE doesn't
      * distribute at all). Tree paths are unique so the dedup key
      * (node, anc, len) is exact.
      */
    "q146_transitive_closure" -> ((s, d) => {
      val edges = part(s, d)
        .select(col("p_partkey").cast("long").as("node"))
        .filter(col("node") >= 1)
        .select(col("node"), expr("(node - 1) div 4").as("anc"),
          lit(1L).as("len"))
      var paths = edges
      for (_ <- 1 to 4) { // depth <= 2^4 = 16 >= log4(200k)
        val j = paths.as("a").join(paths.as("b"),
            col("a.anc") === col("b.node"))
          .select(col("a.node").as("node"), col("b.anc").as("anc"),
            (col("a.len") + col("b.len")).as("len"))
        // persist each doubling: without it round r re-evaluates
        // round r-1's self-join TWICE (both join sides), and the
        // lineage cost compounds exponentially across rounds
        paths = paths.unionAll(j).distinct().persist()
      }
      paths.groupBy("len")
        .agg(count(lit(1)).as("n_pairs"), sum("anc").as("anc_sum"))
        .orderBy("len")
    }),

    /** Data-quality expectations (the dbt-test/Great-Expectations
      * shape): one tall (check, violations, pass) report row per
      * constraint — PK uniqueness, FK orphans, domain and range
      * rules. The four orders-side metrics come from ONE scan-level
      * aggregate (stacked to tall afterwards); only the referential
      * check needs its own anti-join.
      */
    "q147_data_quality" -> ((s, d) => {
      val o = orders(s, d)
      val om = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey")))
          .as("pk_dups"),
        sum(when(col("o_totalprice") < 0, 1).otherwise(0))
          .cast("long").as("neg_price"),
        sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1)
          .otherwise(0)).cast("long").as("bad_status"))
        .select(expr("stack(3, 'orders.pk_unique', pk_dups, " +
          "'orders.price_nonnegative', neg_price, " +
          "'orders.status_domain', bad_status) AS (check, violations)"))
      val orphans = o.join(customer(s, d),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders.fk_customer").as("check"),
          col("violations"))
      om.unionByName(orphans)
        .select(col("check"), col("violations"),
          (col("violations") === 0).cast("int").as("pass"))
        .orderBy("check")
    }),

    /** MapType machinery: per-user event counts built INTO a map
      * column (map_from_arrays over the sorted collected pairs),
      * then consumed via element_at / size — missing keys are NULL,
      * which the oracle mirrors with NULLIF (a count can never be 0
      * for a PRESENT key). Scalar outputs keep the cross-engine
      * compare exact while the map plumbing runs in-plan.
      */
    "q148_map_ops" -> ((s, d) => {
      val pairs = events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      pairs.groupBy("user_id")
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          element_at(col("m"), "click").as("clicks"),
          element_at(col("m"), "purchase").as("purchases"),
          size(col("m")).as("n_types"))
        .orderBy("user_id")
    }),

    /** grouping() disambiguation: with ROLLUP, a NULL cell can be
      * real data or a subtotal marker — grouping(col) is the only
      * sound way to tell them apart (filtering on IS NULL is the
      * classic rollup bug). Emits the grouping flags alongside each
      * aggregate row.
      */
    "q149_grouping_flags" -> ((s, d) =>
      orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("c"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_pri"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first,
          col("g_status"), col("g_pri"))),

    /** Capstone curation FUNNEL: the full pretraining-data pipeline
      * with a (step, n_docs, n_tokens) report row after every stage —
      * the loss accounting every data team publishes with a corpus.
      * Stages: raw → language allowlist → quality gate (q49 scorer)
      * → exact dedup (content-key canonical) → title-prefix near-dup
      * retention (q117 key, keep lowest id) → benchmark
      * decontamination (drop docs sharing any exact 8-word gram with
      * the held-out doc_id<20 set — q50's exact-collision variant).
      * The scored base persists once; each stage is one aggregate
      * over a progressively filtered lineage; the benchmark gram set
      * broadcasts.
      */
    "q150_curation_funnel" -> ((s, d) => {
      import graft.operators.{Dedup, TextAnalysis}
      val base = documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"),
          size(split(col("text"), " ")).as("nt"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .persist()
      val langKept = base.filter(col("lang").isin("en", "de"))
      val qKept = langKept.filter(col("q") >= 0.5)
      val exact = Dedup.exactDedupKeepFirst(qKept, "text", "doc_id")
      val title = Dedup.dedupKeepFirstByKey(exact,
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 5))),
        "doc_id")
      val gram8 = expr(
        """CASE WHEN size(__w) >= 8 THEN
          |  transform(sequence(0, size(__w) - 8),
          |    i -> array_join(slice(__w, i + 1, 8), ' '))
          |ELSE CAST(array() AS array<string>) END""".stripMargin)
      def grams(df: DataFrame) = df
        .select(col("doc_id"), split(col("text"), " ").as("__w"))
        .select(col("doc_id"),
          explode(array_distinct(gram8)).as("g"))
      val benchGrams = grams(base.filter(col("doc_id") < 20))
        .select("g").distinct()
      val contaminated = grams(title.filter(col("doc_id") >= 20))
        .join(broadcast(benchGrams), Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val clean = title.filter(col("doc_id") >= 20)
        .join(contaminated, Seq("doc_id"), "left_anti")
      def stage(step: Int, name: String, df: DataFrame) = df
        .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
        .select(lit(step).as("step"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
      stage(1, "raw", base)
        .unionByName(stage(2, "lang", langKept))
        .unionByName(stage(3, "quality", qKept))
        .unionByName(stage(4, "exact_dedup", exact))
        .unionByName(stage(5, "title_dedup", title))
        .unionByName(stage(6, "decontaminated", clean))
        .orderBy("step")
    }),

    /** Snapshot diff (dataset-version accounting): what a new
      * reference-dataset drop ADDS, REMOVES, and CHANGES vs the
      * previous one — the audit table a refresh pipeline publishes
      * before swapping directories. Two arithmetic snapshot builds
      * from `orders` (keys ending 0/5 vs 0/3, payload digest from
      * status+price), one full-outer equi-join on the key, verdict by
      * presence/digest compare; output is the per-verdict summary
      * plus a deterministic sample of changed keys.
      */
    "q151_snapshot_diff" -> ((s, d) => {
      val o = orders(s, d)
      // keys ending 0 exist in both versions; a subset of them
      // (ending 20 mod 100) gets a perturbed payload in version b —
      // the "changed" class
      def snap(m: Long, tag: String, perturb: Boolean) = o
        .filter(col("o_orderkey") % 10 === 0 ||
          col("o_orderkey") % 10 === m)
        .select(col("o_orderkey").as(s"k_$tag"),
          md5(concat_ws("|", col("o_orderstatus"),
            (expr("cast(round(o_totalprice * 100) as bigint)") +
              when(lit(perturb) && col("o_orderkey") % 100 === 20,
                100L).otherwise(0L)).cast("string")))
            .as(s"dig_$tag"))
      val a = snap(5, "a", perturb = false)
      val b = snap(3, "b", perturb = true)
      val j = a.join(b, col("k_a") === col("k_b"), "full_outer")
        .select(coalesce(col("k_a"), col("k_b")).as("k"),
          when(col("k_b").isNull, "removed")
            .when(col("k_a").isNull, "added")
            .when(col("dig_a") =!= col("dig_b"), "changed")
            .otherwise("unchanged").as("verdict"))
      j.groupBy("verdict")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("verdict")
    }),

    /** Forward-fill over a dense per-key spine: carry each user's
      * last observed daily value across gap days
      * (last_value IGNORE NULLS over the growing frame) — the
      * telemetry gap-fill operator. The spine explodes from each
      * user's OWN [min, max] activity span (never a global cross),
      * and the fill window partitions on the natural key. Values are
      * exact scaled cents (max per day of the raw doubles ×100).
      */
    "q152_forward_fill" -> ((s, d) => {
      val dv = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day"),
          expr("cast(round(value * 100) as bigint)").as("vc"))
        .groupBy("user_id", "day").agg(max("vc").as("vc"))
      val spine = dv.groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id"),
          explode(graft.operators.Grids.boundedSpine(
            col("lo"), col("hi"), what = "per-user day")).as("day"))
      val w = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(dv, Seq("user_id", "day"), "left")
        .withColumn("filled",
          last(col("vc"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("vc").isNull.cast("int"))
        .drop("vc")
        .orderBy("user_id", "day")
    }),

    /** Group-wise feature standardization (z-score within language):
      * the ML-prep normalizer, in the house numeric discipline —
      * per-group n/Σx/Σx² are exact longs over scaled quality
      * scores (q49's scorer rounds to 4dp, so ×10⁴ is integral), and
      * each row's z closes in one fixed-shape float expression
      * (num = x·n − S exact; den = sqrt of an exact long; one
      * division). Stats broadcast back onto the stream — the
      * fact-scale side never reshuffles.
      */
    "q153_standardize" -> ((s, d) => {
      val sc = documents(s, d).select(col("doc_id"), col("lang"),
        round(graft.operators.TextAnalysis.qualityScore(col("text")) *
          10000).cast("long").as("xs"))
      val st = sc.groupBy("lang").agg(count(lit(1)).as("n"),
        sum("xs").as("sx"), sum(col("xs") * col("xs")).as("sxx"))
      sc.join(broadcast(st), "lang")
        .select(col("doc_id"), col("lang"),
          round((col("xs") * col("n") - col("sx")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")), 4).as("z"))
        .orderBy("doc_id")
    }),

    /** Feature hashing (the hashing trick, Weinberger et al. 2009):
      * words hash into 64 signed buckets via the cross-engine-stable
      * 60-bit md5 hash — bucket = h mod 64, sign from the next bit —
      * and each document's sparse vector is the per-(doc, bucket)
      * sign sum. One explode + one hash-agg; no vocabulary table at
      * all, which is the point of the trick at 100 TB (vocab-free,
      * collision-tolerant featurization).
      */
    "q154_feature_hashing" -> ((s, d) =>
      documents(s, d)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .withColumn("h", graft.functions.StableHash.md5Int60(col("w")))
        .select(col("doc_id"), (col("h") % 64).cast("int").as("bucket"),
          (expr("(h div 64) % 2") * 2 - 1).cast("long").as("sign"))
        .groupBy("doc_id", "bucket")
        .agg(sum("sign").as("v"))
        .filter(col("v") =!= 0)
        .orderBy("doc_id", "bucket")),

    /** Exact money arithmetic, float-free: prices collapse to scaled
      * -long cents BEFORE aggregating, so the engine carries exact
      * 64-bit integers end to end and the output row holds a BIGINT
      * — no decimal128 in the result, whose canonicalization differs
      * between engines' Arrow dumps even when the values agree. Same
      * rule as q143's cents frame (the repo-wide money contract).
      */
    "q155_decimal_money" -> ((s, d) =>
      orders(s, d)
        .withColumn("cents",
          round(col("o_totalprice") * 100).cast("long"))
        .groupBy("o_orderstatus")
        .agg(sum(col("cents")).as("total_cents"),
          count(lit(1)).as("n"))
        .withColumn("mean",
          round(col("total_cents").cast("double") / 100.0 / col("n"), 4))
        .orderBy("o_orderstatus")),

    /** Month arithmetic with end-of-month clamping: Jan 31 + 1 month
      * is Feb 28/29 on BOTH engines (add_months / INTERVAL 1 MONTH
      * clamp rather than overflow) — pinned because date libraries
      * disagree on this more than on anything else. Also
      * months_between for complete-month tenure.
      */
    "q156_month_arith" -> ((s, d) =>
      orders(s, d)
        .filter(dayofmonth(col("o_orderdate")) >= 28)
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("dt"),
          add_months(col("o_orderdate").cast("date"), 1).as("plus1m"),
          add_months(col("o_orderdate").cast("date"), -2).as("minus2m"),
          floor(months_between(to_date(lit("2001-12-31")),
            col("o_orderdate").cast("date"))).cast("long").as("tenure_m"))
        .orderBy("o_orderkey").limit(500)),

    /** NOT IN with a NULL in the subquery — the classic three-valued
      * -logic trap, pinned through the SQL-string API (temp views +
      * spark.sql): against the clean subquery NOT IN behaves like an
      * anti-join; add a single NULL and it must return ZERO rows
      * (x <> NULL is UNKNOWN for every x). Both engines agree; code
      * that "fixes" this by dropping the NULL changes semantics.
      */
    "q157_sql_not_in" -> ((s, d) => {
      events(s, d).createOrReplaceTempView("__ev")
      customer(s, d).createOrReplaceTempView("__cust")
      s.sql("""
        WITH neg AS (SELECT c_custkey AS k FROM __cust
          WHERE c_acctbal < 0 AND c_custkey < 150),
        negn AS (SELECT k FROM neg UNION ALL SELECT CAST(NULL AS BIGINT))
        SELECT
          (SELECT count(*) FROM __ev
            WHERE user_id NOT IN (SELECT k FROM neg)) AS n_clean,
          (SELECT count(*) FROM __ev
            WHERE user_id NOT IN (SELECT k FROM negn)) AS n_with_null
      """)
    }),

    /** Higher-order array functions as the per-row vector ALU:
      * quantized dot product (zip_with + aggregate), L1 norm
      * (transform + aggregate), positive-component count (filter) —
      * all inside one codegen'd projection, zero explode, zero
      * shuffle beyond the id-successor equi-join. This is the
      * in-row discipline the similarity operators build on: floats
      * quantize to exact ints FIRST, so every reduction is
      * order-free.
      */
    "q158_hof_vector_ops" -> ((s, d) => {
      val e = embeddings(s, d).filter(col("vec_id") < 500)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(round(x * 1000) as bigint))")
            .as("q"))
      val a = e.select(col("vec_id").as("id"), col("q").as("qa"))
      val b = e.select((col("vec_id") - 1).as("id"), col("q").as("qb"))
      a.join(b, "id")
        .select(col("id"),
          expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), " +
            "0L, (acc, v) -> acc + v)").as("dot"),
          expr("aggregate(transform(qa, x -> abs(x)), 0L, " +
            "(acc, v) -> acc + v)").as("l1_a"),
          expr("size(filter(qa, x -> x > 0))").as("n_pos_a"))
        .orderBy("id")
    }),

    /** regexp_extract_all: pull every integer out of the raw props
      * JSON-ish strings and aggregate — the log-scraping shape where
      * the payload is not worth a full parse.
      */
    "q159_regex_extract_all" -> ((s, d) =>
      events(s, d)
        .select(col("event_type"),
          expr("regexp_extract_all(props, '[0-9]+', 0)").as("ds"))
        .select(col("event_type"),
          expr("aggregate(transform(ds, x -> cast(x as bigint)), " +
            "0L, (acc, v) -> acc + v)").as("dsum"),
          size(col("ds")).cast("long").as("dcnt"))
        .groupBy("event_type")
        .agg(sum("dsum").as("digit_sum"), sum("dcnt").as("n_matches"))
        .orderBy("event_type")),

    /** Edit-distance join over the bounded nation dimension: all
      * name pairs with Levenshtein distance <= 10 — fuzzy matching
      * for reference-data reconciliation. The 25x25 dim cross is the
      * adjudicated bounded-BNLJ class (q36/q88); at scale the
      * blocking key (length bucket, first char) would bound the
      * candidates instead.
      */
    "q160_levenshtein_pairs" -> ((s, d) => {
      val n = nation(s, d).select(col("n_nationkey").as("k"),
        lower(col("n_name")).as("nm"))
      n.as("a").join(n.as("b"), col("a.k") < col("b.k"))
        .select(col("a.nm").as("n1"), col("b.nm").as("n2"),
          levenshtein(col("a.nm"), col("b.nm")).as("dist"))
        .filter(col("dist") <= 10)
        .orderBy("n1", "n2")
    }),

    /** Periodicity detection — the decoder-loop artifact filter: the
      * smallest shift p (1..60 chars) under which the text equals
      * itself, i.e. substring(s, 1, L-p) = substring(s, p+1, L-p);
      * generated text stuck in a loop has a small period, natural
      * text has none. Periodic fixtures are synthesized in-query by
      * tripling each doc's word prefix (period = prefix length + 1),
      * mixed with raw (aperiodic) docs; detection is a pure
      * transform/filter/array_min projection — no explode, no
      * shuffle.
      */
    "q161_periodicity" -> ((s, d) => {
      val base = documents(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 4))
            .as("pfx"),
          col("text"))
      val corpus = base
        .select(col("doc_id"), concat(col("pfx"), lit(" "),
          col("pfx"), lit(" "), col("pfx")).as("s"))
        .unionByName(base
          .select((col("doc_id") + 1000).as("doc_id"),
            substring(col("text"), 1, 80).as("s")))
      corpus
        .select(col("doc_id"), length(col("s")).as("len"),
          coalesce(expr(
            """array_min(filter(transform(sequence(1, 60),
              |  p -> CASE WHEN p < length(s) AND
              |    substring(s, 1, length(s) - p) =
              |      substring(s, p + 1, length(s) - p)
              |    THEN p END), x -> x IS NOT NULL))""".stripMargin),
            lit(0)).as("period"))
        .orderBy("doc_id")
    }),

    /** Resetting cumulative sum: per-user running spend SINCE THE
      * LAST PURCHASE — the two-window reset pattern (a cumulative
      * flag count partitions each user's stream into epochs, then a
      * second window sums within the epoch). Flag-driven resets,
      * where gaps-and-islands (q122) resets on time gaps. Exact
      * cents; per-user windows on the natural key.
      */
    "q162_resetting_cumsum" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id")
        .orderBy(col("t"), col("event_id"))
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
      val epoch = ev.withColumn("grp",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("grp", coalesce(col("grp"), lit(0L)))
      val wEpoch = Window.partitionBy("user_id", "grp")
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      epoch
        .withColumn("run_cents", sum("vc").over(wEpoch))
        .filter(col("user_id") < 20)
        .select("event_id", "user_id", "grp", "run_cents")
        .orderBy("event_id")
    }),

    /** Rolling 24-hour Pearson correlation between two event series
      * (clicks vs errors per hour): the q102 exact-sums formula per
      * WINDOW — five trailing-frame sums of exact integer counts,
      * one closing float expression per row (round-4). Windows run
      * over the bounded dense hour grid; NULL when the frame is
      * degenerate (zero variance).
      */
    "q163_rolling_correlation" -> ((s, d) => {
      val hc = events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .groupBy(expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("h"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("x"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("y"))
      val spine = hc.agg(min("h").as("lo"), max("h").as("hi"))
        .select(explode(graft.operators.Grids.boundedSpine(
          col("lo"), col("hi"), what = "hour")).as("h"))
      val grid = spine.join(hc, Seq("h"), "left")
        .select(col("h"), coalesce(col("x"), lit(0L)).as("x"),
          coalesce(col("y"), lit(0L)).as("y"))
      val w = Window.orderBy("h").rowsBetween(-23, 0)
      val wn = Window.orderBy("h")
      val g = grid
        .withColumn("sx", sum("x").over(w))
        .withColumn("sy", sum("y").over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .withColumn("rn", row_number().over(wn))
        .filter(col("rn") >= 24)
      val num = lit(24L) * col("sxy") - col("sx") * col("sy")
      val dx = lit(24L) * col("sxx") - col("sx") * col("sx")
      val dy = lit(24L) * col("syy") - col("sy") * col("sy")
      g.select(col("h"),
          when(dx > 0 && dy > 0,
            round(num.cast("double") /
              sqrt(dx.cast("double") * dy.cast("double")), 4))
            .as("corr24"))
        .orderBy("h")
    }),

    /** A/B test readout with exact counts: users split by md5 parity
      * (the q53 assignment discipline — stable under reprocessing),
      * conversion = any purchase; lift and the two-proportion
      * z-statistic close as float expressions over the four exact
      * counts, so the whole readout is reproducible to the digit.
      */
    "q164_ab_test" -> ((s, d) => {
      val users = events(s, d).select(col("user_id")).distinct()
        .withColumn("arm",
          when(graft.functions.StableHash
            .md5Int60(col("user_id").cast("string")) % 2 === 0, "A")
            .otherwise("B"))
      // "conversion" = a heavy purchaser (>= 14 purchases) so both
      // outcomes occur in both arms — every user purchases at least
      // once in this data, which would make any-purchase degenerate
      val conv = events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("np"))
        .filter(col("np") >= 14)
        .select(col("user_id"), lit(1L).as("converted"))
      val g = users.join(conv, Seq("user_id"), "left")
        .groupBy("arm")
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("converted"), lit(0L))).as("c"))
      val wide = g.groupBy()
        .agg(max(when(col("arm") === "A", col("n"))).as("na"),
          max(when(col("arm") === "A", col("c"))).as("ca"),
          max(when(col("arm") === "B", col("n"))).as("nb"),
          max(when(col("arm") === "B", col("c"))).as("cb"))
      val pa = col("ca").cast("double") / col("na")
      val pb = col("cb").cast("double") / col("nb")
      val pPool = (col("ca") + col("cb")).cast("double") /
        (col("na") + col("nb"))
      wide.select(col("na"), col("ca"), col("nb"), col("cb"),
        round(pa, 4).as("rate_a"), round(pb, 4).as("rate_b"),
        round((pb - pa) / pa, 4).as("rel_lift"),
        round((pb - pa) / sqrt(pPool * (lit(1.0) - pPool) *
          (lit(1.0) / col("na") + lit(1.0) / col("nb"))), 4)
          .as("z_stat"))
    }),

    /** Clickstream path analysis: each session's ordered event-type
      * sequence as a path string (q17's 30-minute gap rule), then the
      * top session paths by frequency — the navigation-mining shape.
      * The path builds from a SORTED collected struct array (ordered
      * string_agg equivalent), so it is deterministic under any
      * partitioning; sessions are user-bounded, paths aggregate
      * map-side.
      */
    "q165_session_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("t", "event_id")
      val ev = events(s, d).select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("event_type"))
      val sess = ev
        .withColumn("brk", when(col("t") -
          lag(col("t"), 1).over(w) > 1800L * 1000000L, 1L)
          .otherwise(0L))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sess.groupBy("user_id", "sid")
        .agg(concat_ws(">", expr(
          "transform(array_sort(collect_list(" +
            "struct(t, event_id, event_type))), x -> x.event_type)"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(30)
    }),

    /** Normalized-key dedup — the Unicode-canonicalization dedup a
      * crawl needs ([[graft.functions.TextNormFunctions]] feeding
      * [[graft.operators.Dedup.dedupKeepFirstByKey]]): the corpus is
      * doubled with decomposed variants (every 'e' re-spelled as
      * e + combining acute — byte-distinct, visually identical), and
      * the dedup key md5(strip_accents(nfc(lower(text)))) folds each
      * variant back onto its base row, keep-first by id. Raw
      * distinct-text count stays near-doubled — the gap IS the
      * mojibake-duplication a byte-keyed dedup would leak into a
      * training set.
      */
    "q179_normalized_dedup" -> ((s, d) => {
      import graft.functions.TextNormFunctions._
      val base = documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
      val variants = base.select((col("doc_id") + 100000L).as("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("text"))
      val all = base.unionByName(variants)
      val key = md5(strip_accents(nfc_normalize(lower(col("text")))))
      // keep-first rank + both counts in ONE pass (no totals cross)
      val w = Window.partitionBy(key).orderBy(col("doc_id"))
      all.withColumn("__rn", row_number().over(w))
        .agg(sum(when(col("__rn") === 1, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("__rn") === 1, col("doc_id"))).as("kept_id_sum"),
          countDistinct("text").as("n_raw_distinct"))
    }),

    /** Robust (median/MAD) outlier detection — the anomaly signal
      * that survives heavy tails where q132's mean/stddev z-score
      * saturates — in EXACT integers: values collapse to cents, and
      * since an exact median interpolates two longs, 2·median and
      * 4·MAD are integers; the 3σ-equivalent cutoff
      * (|v−med| > 3·1.4826·MAD) compares as
      * dev2·20000 > 3·14826·mad4 — pure int64, no float knife-edge
      * on either engine. Exact per-group percentiles sort each
      * group (the documented exact-stats cost; approx_percentile is
      * the 100 TB knob); the med/MAD tables are group-cardinality
      * rows, broadcast back.
      */
    "q178_mad_outliers" -> ((s, d) => {
      val e = events(s, d).select(col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
      val med = e.groupBy("event_type")
        .agg((expr("percentile(vc, 0.5)") * 2).cast("long").as("med2"))
      val dev = e.join(broadcast(med), "event_type")
        .withColumn("dev2", abs(col("vc") * 2 - col("med2")))
      val mad = dev.groupBy("event_type", "med2")
        .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
      dev.join(broadcast(mad), Seq("event_type", "med2"))
        .groupBy("event_type", "med2", "mad4")
        .agg(count(lit(1)).as("n"),
          sum(when(col("dev2") * 20000 > lit(3L * 14826L) * col("mad4"),
            1L).otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),

    /** Population Stability Index — the ML-ops drift metric —
      * computed EXACTLY: value-bucket distributions of week 1 vs
      * week 4 per event type over a fixed dense bucket spine with
      * +1 smoothing, and each bucket's contribution carried as the
      * exact long (c'·M − d'·N) · round(ln(c'·M / (d'·N))·1e6), so
      * the per-type sum is partition-order-free and one closing
      * division yields PSI (the float-sum ordering problem that
      * usually makes PSI irreproducible never arises).
      */
    "q166_psi" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        dayofmonth(col("ts").cast("timestamp")).as("dom"),
        expr("cast(round(value * 100) as bigint) div 5000").as("b"))
      def cnt(cond: Column, as: String) = ev.filter(cond)
        .groupBy("event_type", "b").agg(count(lit(1)).as(as))
      val spine = ev.select("event_type").distinct()
        .withColumn("b", explode(sequence(lit(0L), lit(9L))))
      val cells = spine
        .join(cnt(col("dom") <= 7, "c"), Seq("event_type", "b"), "left")
        .join(cnt(col("dom") >= 24, "dd"), Seq("event_type", "b"), "left")
        .select(col("event_type"), col("b"),
          (coalesce(col("c"), lit(0L)) + 1L).as("cs"),
          (coalesce(col("dd"), lit(0L)) + 1L).as("ds"))
      val tot = cells.groupBy("event_type")
        .agg(sum("cs").as("nn"), sum("ds").as("mm"))
      cells.join(broadcast(tot), "event_type")
        .withColumn("term", (col("cs") * col("mm") -
          col("ds") * col("nn")) *
          round(log((col("cs") * col("mm")).cast("double") /
            (col("ds") * col("nn")).cast("double")) * 1e6)
            .cast("long"))
        .groupBy(col("event_type"), col("nn"), col("mm"))
        .agg(sum("term").as("tsum"))
        .select(col("event_type"),
          round(col("tsum").cast("double") /
            (col("nn").cast("double") * col("mm").cast("double") * 1e6),
            6).as("psi"))
        .orderBy("event_type")
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
    // support>=2 pruned graph; undirected a<b<c closure
    "q119_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (SELECT a.pk AS u, b.pk AS v FROM li a
        |  JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
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
        |FROM rev ORDER BY nk""".stripMargin,
    "q127_markov_transitions" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |tr AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS prev
        |  FROM ev),
        |pairs AS (SELECT prev, event_type, count(*) AS n FROM tr
        |  WHERE prev IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS tot FROM pairs
        |  GROUP BY 1)
        |SELECT pairs.prev, event_type, n,
        |  round(CAST(n AS DOUBLE) / tot, 4) AS p
        |FROM pairs JOIN tot ON pairs.prev = tot.prev
        |ORDER BY 1, 2""".stripMargin,
    // cosine: one closing float expr over exact integer sums
    "q128_source_cosine" ->
      """WITH tf AS (SELECT source, w, count(*) AS n FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY 1, 2),
        |norms AS (SELECT source, CAST(sum(n * n) AS BIGINT) AS n2
        |  FROM tf GROUP BY 1),
        |dots AS (SELECT a.source AS s1, b.source AS s2,
        |    CAST(sum(a.n * b.n) AS BIGINT) AS dot
        |  FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, dot,
        |  round(CAST(dot AS DOUBLE) /
        |    (sqrt(na.n2) * sqrt(nb.n2)), 4) AS cos
        |FROM dots JOIN norms na ON s1 = na.source
        |JOIN norms nb ON s2 = nb.source
        |ORDER BY 1, 2""".stripMargin,
    // each active (user, day) feeds the 7 trailing window days
    "q129_rolling_distinct" ->
      """WITH du AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |w AS (SELECT user_id, day + k.range AS wd
        |  FROM du CROSS JOIN range(7) k)
        |SELECT CAST(wd AS BIGINT) AS wd,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    // dyadic weights: every term and partial sum is exact, so the
    // float EWMA hash-matches bit-for-bit
    "q130_ewma" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events
        |  WHERE event_type = 'error'),
        |hc AS (SELECT h, count(*) AS c FROM e GROUP BY 1),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
        |sp AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
        |grid AS (SELECT sp.h, coalesce(c, 0) AS c FROM sp
        |  LEFT JOIN hc USING (h)),
        |terms AS (SELECT h + k.range AS t,
        |    CAST(c AS DOUBLE) /
        |      CAST(1::BIGINT << (k.range + 1) AS DOUBLE) AS w
        |  FROM grid CROSS JOIN range(20) k),
        |sm AS (SELECT t, CAST(sum(w) AS DOUBLE) AS ewma FROM terms
        |  JOIN sp ON t = sp.h GROUP BY 1),
        |r AS (SELECT t, ewma, row_number() OVER (ORDER BY t) AS rn
        |  FROM sm)
        |SELECT CAST(t AS BIGINT) AS t, ewma FROM r WHERE rn > 19
        |ORDER BY t""".stripMargin,
    // five exact centered sums; closing float exprs in matched order
    "q131_grouped_regression" ->
      """WITH j AS (SELECT c_nationkey AS nk,
        |    CAST(datediff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) - 10957 AS BIGINT) AS x,
        |    CAST(round(o_totalprice) AS BIGINT) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nk, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM j GROUP BY 1)
        |SELECT nk, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE), 4) AS slope,
        |  round((CAST(sy AS DOUBLE) -
        |    (CAST(n * sxy - sx * sy AS DOUBLE) /
        |     CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 4)
        |    AS intercept,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) *
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (CAST(n * sxx - sx * sx AS DOUBLE) *
        |     CAST(n * syy - sy * sy AS DOUBLE)), 4) AS r2
        |FROM g ORDER BY nk""".stripMargin,
    // q116's squared z-rule over the trailing 14-day frame
    "q132_rolling_zscore" ->
      """WITH dcnt AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    count(*) AS c FROM events GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM dcnt),
        |sp AS (SELECT unnest(range(lo, hi + 1)) AS day FROM b),
        |grid AS (SELECT sp.day, coalesce(c, 0) AS c FROM sp
        |  LEFT JOIN dcnt USING (day)),
        |t AS (SELECT day, c,
        |    CAST(sum(c) OVER (ORDER BY day ROWS BETWEEN 14 PRECEDING
        |      AND 1 PRECEDING) AS BIGINT) AS s,
        |    CAST(sum(c * c) OVER (ORDER BY day ROWS BETWEEN 14
        |      PRECEDING AND 1 PRECEDING) AS BIGINT) AS s2,
        |    row_number() OVER (ORDER BY day) AS rn
        |  FROM grid)
        |SELECT CAST(day AS BIGINT) AS day, c, s,
        |  CAST(CASE WHEN c * 14 - s > 0
        |    AND (c * 14 - s) * (c * 14 - s) > 4 * (14 * s2 - s * s)
        |    THEN 1 ELSE 0 END AS INT) AS is_anomaly
        |FROM t WHERE rn > 14 ORDER BY day""".stripMargin,
    // per-(source,lang) micro-log terms sum exactly; closing /N*1e6
    "q133_corpus_report" ->
      """WITH cells AS (SELECT source, lang, count(*) AS c,
        |    CAST(sum(n_chars) AS BIGINT) AS chars
        |  FROM documents GROUP BY 1, 2),
        |per_src AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(sum(chars) AS BIGINT) AS total_chars,
        |    count(*) AS n_langs
        |  FROM cells GROUP BY 1),
        |terms AS (SELECT cells.source, n_docs, total_chars, n_langs,
        |    c * CAST(round(ln(CAST(c AS DOUBLE) / n_docs) * 1e6)
        |      AS BIGINT) AS term
        |  FROM cells JOIN per_src ON cells.source = per_src.source),
        |g AS (SELECT source, n_docs, total_chars, n_langs,
        |    CAST(sum(term) AS BIGINT) AS tsum
        |  FROM terms GROUP BY 1, 2, 3, 4)
        |SELECT source, n_docs, total_chars,
        |  round(CAST(total_chars AS DOUBLE) / n_docs, 4) AS mean_chars,
        |  n_langs, -tsum AS h_micro,
        |  round(CAST(-tsum AS DOUBLE) /
        |    (CAST(n_docs AS DOUBLE) * 1e6), 4) AS h_nats
        |FROM g ORDER BY source""".stripMargin,
    // k smallest 60-bit md5 hashes per group; est = 31*2^60/h_k
    "q134_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT lang,
        |    CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
        |  FROM documents),
        |u AS (SELECT lang, h FROM h
        |  UNION ALL SELECT '*all*', h FROM (SELECT DISTINCT h FROM h)),
        |r AS (SELECT lang AS grp, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n_exact
        |  FROM u)
        |SELECT grp, CAST(max(n_exact) AS BIGINT) AS n_exact,
        |  CAST(count(*) AS INT) AS k_eff, max(h) AS hk,
        |  CASE WHEN count(*) = 32 THEN
        |    round(31.0 * CAST(1::BIGINT << 60 AS DOUBLE) / max(h), 4)
        |  END AS est
        |FROM r WHERE rn <= 32 GROUP BY grp ORDER BY grp""".stripMargin,
    // z rebuilt as a sum of disjoint powers of two per bit position
    "q135_zorder" ->
      """WITH c AS (SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS x,
        |    (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 32
        |      AS y
        |  FROM customer),
        |bits AS (SELECT c_custkey, x, y,
        |    CAST(sum(((x >> b.range) & 1) * (1::BIGINT << (2 * b.range))
        |      + ((y >> b.range) & 1) * (1::BIGINT << (2 * b.range + 1)))
        |      AS BIGINT) AS z
        |  FROM c CROSS JOIN range(16) b GROUP BY 1, 2, 3)
        |SELECT c_custkey, x, y, z FROM bits
        |ORDER BY z, c_custkey LIMIT 200""".stripMargin,
    "q136_unpivot" ->
      """WITH wide AS (SELECT o_orderpriority,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f,
        |    CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS o,
        |    CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, 'F' AS status, f AS n FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'O', o FROM wide
        |UNION ALL
        |SELECT o_orderpriority, 'P', p FROM wide
        |ORDER BY 1, 2""".stripMargin,
    // IS NOT DISTINCT FROM: the NULL (malformed-props) bucket matches
    "q137_nullsafe_join" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(json_extract(props, '$.k') AS INT) AS k FROM events),
        |a AS (SELECT k AS k_a, count(*) AS n_a FROM ev
        |  WHERE event_type = 'click' GROUP BY 1),
        |b AS (SELECT k AS k_b, count(*) AS n_b FROM ev
        |  WHERE event_type = 'error' GROUP BY 1)
        |SELECT coalesce(k_a, k_b) AS k,
        |  coalesce(n_a, 0) AS n_click, coalesce(n_b, 0) AS n_error
        |FROM a FULL OUTER JOIN b ON k_a IS NOT DISTINCT FROM k_b
        |ORDER BY k NULLS FIRST""".stripMargin,
    "q138_mom_growth" ->
      """WITH m AS (SELECT
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT m, cents,
        |  round((CAST(cents AS DOUBLE) /
        |    lag(cents) OVER (ORDER BY m) - 1) * 100, 4) AS growth_pct
        |FROM m ORDER BY m""".stripMargin,
    // value holds until the next event; exact seconds x exact cents
    "q139_time_weighted_avg" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |le AS (SELECT user_id, vc, t,
        |    lead(t) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS nt
        |  FROM ev),
        |g AS (SELECT user_id, count(*) AS n,
        |    CAST(sum((nt - t) // 1000000) AS BIGINT) AS total_sec,
        |    CAST(sum(vc * ((nt - t) // 1000000)) AS BIGINT) AS wsum
        |  FROM le WHERE nt IS NOT NULL GROUP BY 1)
        |SELECT user_id, n, total_sec,
        |  round(CAST(wsum AS DOUBLE) /
        |    (CAST(total_sec AS DOUBLE) * 100), 4) AS twa
        |FROM g ORDER BY user_id""".stripMargin,
    // docs below the window length survive as one NULL-gram row
    "q140_explode_outer" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS n_rows,
        |  CAST(0 AS BIGINT) AS n_grams
        |FROM (SELECT doc_id, len(string_split(text, ' ')) AS nw
        |  FROM documents)
        |WHERE nw < 48 ORDER BY doc_id""".stripMargin,
    // sort + join-to-string is what makes a set aggregate hash-comparable
    "q141_collect_sorted" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
        |    AS statuses,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q142_nav_functions" ->
      """SELECT o_orderkey, o_orderpriority AS pri,
        |  first_value(o_orderkey) OVER w AS cheapest,
        |  last_value(o_orderkey) OVER w AS dearest,
        |  nth_value(o_orderkey, 2) OVER w AS second
        |FROM orders WHERE o_orderkey % 100 = 0
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    // value-based frame: peers by cents, not by row count
    "q143_range_frame" ->
      """WITH o AS (SELECT o_orderkey, o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |SELECT o_orderkey, pri, cents,
        |  CAST(sum(cents) OVER (PARTITION BY pri ORDER BY cents
        |    RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS near_sum
        |FROM o ORDER BY o_orderkey""".stripMargin,
    // rank ties broken by the stable 60-bit hash on both engines
    "q144_zipf_fit" ->
      """WITH wc AS (SELECT lang, w, count(*) AS cnt FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY 1, 2),
        |h AS (SELECT lang, cnt,
        |    CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS wh
        |  FROM wc),
        |r AS (SELECT lang, cnt, row_number() OVER (PARTITION BY lang
        |    ORDER BY cnt DESC, wh) AS rn FROM h),
        |t AS (SELECT lang,
        |    CAST(round(ln(rn) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(cnt) * 1e6) AS BIGINT) AS y
        |  FROM r WHERE rn <= 100),
        |g AS (SELECT lang, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1)
        |SELECT lang, n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
        |FROM g ORDER BY lang""".stripMargin,
    // among versions with valid_from<=V and tx_from<=T: max
    // (valid_from, tx_from); the oracle states it as a window argmax
    "q145_bitemporal" ->
      """WITH versions AS (SELECT n_nationkey AS item,
        |    CAST(datediff('day', DATE '1970-01-01', DATE '2020-01-01')
        |      + v.range * 10 AS BIGINT) AS valid_from,
        |    CAST(datediff('day', DATE '1970-01-01', DATE '2020-02-01')
        |      + c.range * 10 AS BIGINT) AS tx_from,
        |    CAST(n_nationkey * 100 + v.range * 10 + c.range AS BIGINT)
        |      AS price
        |  FROM nation CROSS JOIN range(3) v CROSS JOIN range(2) c),
        |facts AS (SELECT o_orderkey,
        |    CAST(o_custkey % 25 AS BIGINT) AS item,
        |    CAST(datediff('day', DATE '1970-01-01', DATE '2020-01-01')
        |      + o_orderkey % 30 AS BIGINT) AS vt,
        |    CAST(datediff('day', DATE '1970-01-01', DATE '2020-02-01')
        |      + o_orderkey % 25 AS BIGINT) AS tt
        |  FROM orders WHERE o_orderkey % 50 = 0),
        |j AS (SELECT f.o_orderkey, f.item, f.vt, f.tt,
        |    v.valid_from, v.tx_from, v.price,
        |    row_number() OVER (PARTITION BY f.o_orderkey
        |      ORDER BY v.valid_from DESC, v.tx_from DESC) AS rn
        |  FROM facts f JOIN versions v ON f.item = v.item
        |    AND v.valid_from <= f.vt AND v.tx_from <= f.tt)
        |SELECT o_orderkey, item, vt, tt, valid_from, tx_from, price
        |FROM j WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    // the engine doubles; the oracle recurses — same closure
    "q146_transitive_closure" ->
      """WITH RECURSIVE e AS (SELECT CAST(p_partkey AS BIGINT) AS node,
        |    CAST((p_partkey - 1) // 4 AS BIGINT) AS anc
        |  FROM part WHERE p_partkey >= 1),
        |t AS (SELECT node, anc, CAST(1 AS BIGINT) AS len FROM e
        |  UNION ALL
        |  SELECT t.node, e.anc, t.len + 1 FROM t
        |  JOIN e ON t.anc = e.node)
        |SELECT len, count(*) AS n_pairs,
        |  CAST(sum(anc) AS BIGINT) AS anc_sum
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q147_data_quality" ->
      """WITH om AS (SELECT
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |      AS pk_dups,
        |    CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS neg_price,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
        |  FROM orders),
        |orphans AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer
        |    WHERE c_custkey = o_custkey)),
        |tall AS (
        |  SELECT 'orders.pk_unique' AS "check", pk_dups AS violations
        |    FROM om
        |  UNION ALL SELECT 'orders.price_nonnegative', neg_price
        |    FROM om
        |  UNION ALL SELECT 'orders.status_domain', bad_status FROM om
        |  UNION ALL SELECT 'orders.fk_customer', v FROM orphans)
        |SELECT "check", violations,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT)
        |    AS pass
        |FROM tall ORDER BY "check"""".stripMargin,
    // NULLIF mirrors element_at's missing-key NULL (a present key
    // can never count 0)
    "q148_map_ops" ->
      """SELECT user_id,
        |  NULLIF(CAST(sum(CASE WHEN event_type = 'click' THEN 1
        |    ELSE 0 END) AS BIGINT), 0) AS clicks,
        |  NULLIF(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
        |    ELSE 0 END) AS BIGINT), 0) AS purchases,
        |  CAST(count(DISTINCT event_type) AS INT) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q149_grouping_flags" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS c,
        |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
        |  CAST(grouping(o_orderpriority) AS INT) AS g_pri
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST, g_status, g_pri""".stripMargin,
    // the q56 quality replay + canonical keys + exact-8-gram decon,
    // one UNION ALL row per surviving stage
    "q150_curation_funnel" ->
      """WITH t AS (SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    list_filter(string_split_regex(text, '\s+'),
        |      x -> len(x) > 0) AS toks
        |  FROM documents),
        |m AS (SELECT doc_id, lang, text, nt,
        |  least(CAST(len(toks) AS DOUBLE) / 100, CAST(1 AS DOUBLE))
        |    AS len_score,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g'))
        |      AS DOUBLE) / length(text)
        |    ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_sum(list_transform(toks, x -> length(x)))
        |      AS DOUBLE) / len(toks)
        |    ELSE CAST(0 AS DOUBLE) END AS mean_len
        |  FROM t),
        |b AS (SELECT doc_id, lang, text, nt, round(CAST(
        |    len_score * 0.4 +
        |    (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE))) * 0.3 +
        |    (CASE WHEN mean_len BETWEEN 3.0 AND 10.0
        |      THEN CAST(1 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
        |      * 0.3 AS DOUBLE), 4) AS q
        |  FROM m),
        |lg AS (SELECT * FROM b WHERE lang IN ('en', 'de')),
        |qk AS (SELECT * FROM lg WHERE q >= 0.5),
        |exd AS (SELECT doc_id, text, nt FROM (SELECT doc_id, text, nt,
        |    row_number() OVER (PARTITION BY
        |      md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn FROM qk) WHERE rn = 1),
        |ti AS (SELECT doc_id, text, nt FROM (SELECT doc_id, text, nt,
        |    row_number() OVER (PARTITION BY
        |      md5(array_to_string((string_split(text, ' '))[1:5], ' '))
        |      ORDER BY doc_id) AS rn FROM exd) WHERE rn = 1),
        |bg AS (SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS g
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents
        |    WHERE doc_id < 20),
        |  LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i)),
        |cg AS (SELECT DISTINCT doc_id,
        |    array_to_string(w[i:i+7], ' ') AS g
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM ti
        |    WHERE doc_id >= 20),
        |  LATERAL (SELECT unnest(range(1, len(w) - 6)) AS i)),
        |cont AS (SELECT DISTINCT cg.doc_id FROM cg
        |  JOIN bg ON cg.g = bg.g),
        |cl AS (SELECT * FROM ti WHERE doc_id >= 20
        |  AND doc_id NOT IN (SELECT doc_id FROM cont))
        |SELECT * FROM (
        |  SELECT CAST(1 AS INT) AS step, 'raw' AS stage,
        |    count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
        |    FROM b
        |  UNION ALL SELECT 2, 'lang', count(*),
        |    CAST(sum(nt) AS BIGINT) FROM lg
        |  UNION ALL SELECT 3, 'quality', count(*),
        |    CAST(sum(nt) AS BIGINT) FROM qk
        |  UNION ALL SELECT 4, 'exact_dedup', count(*),
        |    CAST(sum(nt) AS BIGINT) FROM exd
        |  UNION ALL SELECT 5, 'title_dedup', count(*),
        |    CAST(sum(nt) AS BIGINT) FROM ti
        |  UNION ALL SELECT 6, 'decontaminated', count(*),
        |    CAST(sum(nt) AS BIGINT) FROM cl)
        |ORDER BY step""".stripMargin,
    // presence/digest compare over the full-outer key join
    "q151_snapshot_diff" ->
      """WITH a AS (SELECT o_orderkey AS k,
        |    md5(o_orderstatus || '|' ||
        |      CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |        AS VARCHAR)) AS dig
        |  FROM orders WHERE o_orderkey % 10 IN (0, 5)),
        |b AS (SELECT o_orderkey AS k,
        |    md5(o_orderstatus || '|' ||
        |      CAST(CAST(round(o_totalprice * 100) AS BIGINT) +
        |        CASE WHEN o_orderkey % 100 = 20 THEN 100 ELSE 0 END
        |        AS VARCHAR)) AS dig
        |  FROM orders WHERE o_orderkey % 10 IN (0, 3)),
        |j AS (SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN b.k IS NULL THEN 'removed'
        |      WHEN a.k IS NULL THEN 'added'
        |      WHEN a.dig <> b.dig THEN 'changed'
        |      ELSE 'unchanged' END AS verdict
        |  FROM a FULL OUTER JOIN b ON a.k = b.k)
        |SELECT verdict, count(*) AS n, min(k) AS min_k,
        |  max(k) AS max_k
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // last_value IGNORE NULLS over each user's own activity span
    "q152_forward_fill" ->
      """WITH dv AS (SELECT user_id,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS vc
        |  FROM events GROUP BY 1, 2),
        |sp AS (SELECT user_id, unnest(range(lo, hi + 1)) AS day
        |  FROM (SELECT user_id, min(day) AS lo, max(day) AS hi
        |    FROM dv GROUP BY 1)),
        |f AS (SELECT sp.user_id, sp.day, dv.vc,
        |    last_value(dv.vc IGNORE NULLS) OVER (
        |      PARTITION BY sp.user_id ORDER BY sp.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS filled
        |  FROM sp LEFT JOIN dv
        |    ON sp.user_id = dv.user_id AND sp.day = dv.day)
        |SELECT user_id, CAST(day AS BIGINT) AS day, filled,
        |  CAST(CASE WHEN vc IS NULL THEN 1 ELSE 0 END AS INT)
        |    AS is_gap
        |FROM f ORDER BY user_id, day""".stripMargin,
    // the q56 quality replay scaled to exact 1e4 longs; z closes in
    // one num/sqrt(den) expression per row
    "q153_standardize" ->
      """WITH t AS (SELECT doc_id, lang,
        |    list_filter(string_split_regex(text, '\s+'),
        |      x -> len(x) > 0) AS toks, text
        |  FROM documents),
        |m AS (SELECT doc_id, lang,
        |  least(CAST(len(toks) AS DOUBLE) / 100, CAST(1 AS DOUBLE))
        |    AS len_score,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g'))
        |      AS DOUBLE) / length(text)
        |    ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_sum(list_transform(toks, x -> length(x)))
        |      AS DOUBLE) / len(toks)
        |    ELSE CAST(0 AS DOUBLE) END AS mean_len
        |  FROM t),
        |sc AS (SELECT doc_id, lang, CAST(round(round(CAST(
        |    len_score * 0.4 +
        |    (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE))) * 0.3 +
        |    (CASE WHEN mean_len BETWEEN 3.0 AND 10.0
        |      THEN CAST(1 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
        |      * 0.3 AS DOUBLE), 4) * 10000) AS BIGINT) AS xs
        |  FROM m),
        |st AS (SELECT lang, count(*) AS n, CAST(sum(xs) AS BIGINT)
        |    AS sx, CAST(sum(xs * xs) AS BIGINT) AS sxx
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, sc.lang,
        |  round(CAST(xs * n - sx AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)), 4) AS z
        |FROM sc JOIN st ON sc.lang = st.lang
        |ORDER BY doc_id""".stripMargin,
    // bucket/sign from the same stable 60-bit hash on both engines
    "q154_feature_hashing" ->
      """WITH w AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(x), 1, 15) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS x
        |    FROM documents WHERE doc_id < 50)),
        |f AS (SELECT doc_id, CAST(h % 64 AS INT) AS bucket,
        |    ((h // 64) % 2) * 2 - 1 AS sign FROM w),
        |g AS (SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS v
        |  FROM f GROUP BY 1, 2)
        |SELECT doc_id, bucket, v FROM g WHERE v <> 0
        |ORDER BY 1, 2""".stripMargin,
    "q155_decimal_money" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS total_cents,
        |  count(*) AS n,
        |  round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS DOUBLE) / 100.0 / count(*), 4) AS mean
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q156_month_arith" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)
        |    AS plus1m,
        |  CAST(CAST(o_orderdate AS DATE) - INTERVAL 2 MONTH AS DATE)
        |    AS minus2m,
        |  CAST(datediff('month', CAST(o_orderdate AS DATE),
        |    DATE '2001-12-31') AS BIGINT) AS tenure_m
        |FROM orders WHERE day(CAST(o_orderdate AS DATE)) >= 28
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "q157_sql_not_in" ->
      """WITH neg AS (SELECT c_custkey AS k FROM customer
        |  WHERE c_acctbal < 0 AND c_custkey < 150),
        |negn AS (SELECT k FROM neg
        |  UNION ALL SELECT CAST(NULL AS BIGINT))
        |SELECT
        |  (SELECT count(*) FROM events
        |    WHERE user_id NOT IN (SELECT k FROM neg)) AS n_clean,
        |  (SELECT count(*) FROM events
        |    WHERE user_id NOT IN (SELECT k FROM negn)) AS n_with_null
        |""".stripMargin,
    // per-component quantize via the index-lateral; sums of exact ints
    "q158_hof_vector_ops" ->
      """WITH p AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 500),
        |j AS (SELECT a.vec_id AS id, a.embedding AS ea,
        |    b.embedding AS eb
        |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1),
        |c AS (SELECT id,
        |    CAST(round(ea[i.i] * 1000) AS BIGINT) AS qa,
        |    CAST(round(eb[i.i] * 1000) AS BIGINT) AS qb
        |  FROM j, LATERAL (SELECT unnest(range(1, len(ea) + 1)) AS i)
        |    i)
        |SELECT id, CAST(sum(qa * qb) AS BIGINT) AS dot,
        |  CAST(sum(abs(qa)) AS BIGINT) AS l1_a,
        |  CAST(sum(CASE WHEN qa > 0 THEN 1 ELSE 0 END) AS INT)
        |    AS n_pos_a
        |FROM c GROUP BY id ORDER BY id""".stripMargin,
    "q159_regex_extract_all" ->
      """WITH e AS (SELECT event_type,
        |    regexp_extract_all(props, '[0-9]+') AS ds FROM events)
        |SELECT event_type,
        |  CAST(sum(CAST(list_sum(list_transform(ds,
        |    x -> CAST(x AS BIGINT))) AS BIGINT)) AS BIGINT)
        |    AS digit_sum,
        |  CAST(sum(len(ds)) AS BIGINT) AS n_matches
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q160_levenshtein_pairs" ->
      """WITH n AS (SELECT n_nationkey AS k, lower(n_name) AS nm
        |  FROM nation)
        |SELECT a.nm AS n1, b.nm AS n2,
        |  CAST(levenshtein(a.nm, b.nm) AS INT) AS dist
        |FROM n a JOIN n b ON a.k < b.k
        |WHERE levenshtein(a.nm, b.nm) <= 10
        |ORDER BY 1, 2""".stripMargin,
    // smallest self-overlap shift; periodic fixtures tripled in-query
    "q161_periodicity" ->
      """WITH base AS (SELECT doc_id,
        |    array_to_string((string_split(text, ' '))[1:4], ' ')
        |      AS pfx,
        |    text
        |  FROM documents WHERE doc_id < 100),
        |corpus AS (
        |  SELECT doc_id, pfx || ' ' || pfx || ' ' || pfx AS s
        |    FROM base
        |  UNION ALL
        |  SELECT doc_id + 1000, substr(text, 1, 80) FROM base),
        |p AS (SELECT doc_id, CAST(length(s) AS INT) AS len,
        |    coalesce(list_min(list_filter(list_transform(
        |      range(1, 61), p -> CASE WHEN p < length(s) AND
        |        substr(s, 1, length(s) - p) =
        |          substr(s, p + 1, length(s) - p)
        |        THEN p END), x -> x IS NOT NULL)), 0) AS period
        |  FROM corpus)
        |SELECT doc_id, len, CAST(period AS INT) AS period
        |FROM p ORDER BY doc_id""".stripMargin,
    // epoch = purchases among STRICTLY PRECEDING rows
    "q162_resetting_cumsum" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    event_type, CAST(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |ep AS (SELECT event_id, user_id, t, vc,
        |    coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS BIGINT), 0) AS grp
        |  FROM ev),
        |r AS (SELECT event_id, user_id, grp,
        |    CAST(sum(vc) OVER (PARTITION BY user_id, grp
        |      ORDER BY t, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS run_cents
        |  FROM ep)
        |SELECT event_id, user_id, grp, run_cents FROM r
        |WHERE user_id < 20 ORDER BY event_id""".stripMargin,
    // q102's exact-sums Pearson per trailing 24h frame
    "q163_rolling_correlation" ->
      """WITH hc AS (SELECT epoch_us(ts) // 3600000000 AS h,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
        |      END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
        |      END) AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'error')
        |  GROUP BY 1),
        |b AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
        |sp AS (SELECT unnest(range(lo, hi + 1)) AS h FROM b),
        |grid AS (SELECT sp.h, coalesce(x, 0) AS x, coalesce(y, 0)
        |    AS y
        |  FROM sp LEFT JOIN hc USING (h)),
        |g AS (SELECT h,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |    row_number() OVER (ORDER BY h) AS rn
        |  FROM grid
        |  WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND
        |    CURRENT ROW))
        |SELECT CAST(h AS BIGINT) AS h,
        |  CASE WHEN 24 * sxx - sx * sx > 0
        |    AND 24 * syy - sy * sy > 0 THEN
        |    round(CAST(24 * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(24 * sxx - sx * sx AS DOUBLE) *
        |        CAST(24 * syy - sy * sy AS DOUBLE)), 4)
        |  END AS corr24
        |FROM g WHERE rn >= 24 ORDER BY h""".stripMargin,
    // four exact counts; lift and z close as float expressions
    "q164_ab_test" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (SELECT user_id,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS
        |      VARCHAR)), 1, 15) AS BIGINT) % 2 = 0
        |    THEN 'A' ELSE 'B' END AS arm
        |  FROM u),
        |conv AS (SELECT user_id FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1
        |  HAVING count(*) >= 14),
        |g AS (SELECT arm, count(*) AS n,
        |    CAST(sum(CASE WHEN conv.user_id IS NOT NULL THEN 1
        |      ELSE 0 END) AS BIGINT) AS c
        |  FROM arms LEFT JOIN conv ON arms.user_id = conv.user_id
        |  GROUP BY 1),
        |wide AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN c END) AS ca,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN c END) AS cb
        |  FROM g)
        |SELECT na, ca, nb, cb,
        |  round(CAST(ca AS DOUBLE) / na, 4) AS rate_a,
        |  round(CAST(cb AS DOUBLE) / nb, 4) AS rate_b,
        |  round((CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
        |    / (CAST(ca AS DOUBLE) / na), 4) AS rel_lift,
        |  round((CAST(cb AS DOUBLE) / nb - CAST(ca AS DOUBLE) / na)
        |    / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb)) *
        |      (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb)) *
        |      (1.0 / na + 1.0 / nb)), 4) AS z_stat
        |FROM wide""".stripMargin,
    // ordered string_agg per session; q17's 30-minute gap rule
    "q165_session_paths" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS t,
        |    event_type FROM events),
        |g AS (SELECT *, CASE WHEN t - lag(t) OVER
        |    (PARTITION BY user_id ORDER BY t, event_id) >
        |    1800000000 THEN 1 ELSE 0 END AS brk FROM ev),
        |s AS (SELECT user_id, event_type, t, event_id,
        |    CAST(sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS sid
        |  FROM g),
        |p AS (SELECT user_id, sid,
        |    string_agg(event_type, '>' ORDER BY t, event_id) AS path
        |  FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path LIMIT 30""".stripMargin,
    // decomposed variants fold back onto their base rows only under
    // the normalized key — DuckDB runs its OWN nfc/strip_accents
    "q179_normalized_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 200),
        |v AS (SELECT doc_id + 100000 AS doc_id,
        |    regexp_replace(text, 'e', 'e' || chr(769), 'g') AS text
        |  FROM base),
        |a AS (SELECT * FROM base UNION ALL SELECT * FROM v),
        |r AS (SELECT doc_id, text, row_number() OVER (
        |    PARTITION BY md5(strip_accents(nfc_normalize(lower(text))))
        |    ORDER BY doc_id) AS rn FROM a)
        |SELECT CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(sum(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT)
        |    AS kept_id_sum,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_raw_distinct
        |FROM r""".stripMargin,
    // 2·median and 4·MAD of long cents are integers; the cutoff is
    // a pure int64 compare on both engines
    "q178_mad_outliers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
        |m AS (SELECT event_type,
        |    CAST(quantile_cont(vc, 0.5) * 2 AS BIGINT) AS med2
        |  FROM e GROUP BY 1),
        |j AS (SELECT e.event_type, med2, abs(vc * 2 - med2) AS dev2
        |  FROM e JOIN m USING (event_type)),
        |s AS (SELECT event_type, med2,
        |    CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        |  FROM j GROUP BY 1, 2)
        |SELECT j.event_type, j.med2, mad4, count(*) AS n,
        |  CAST(sum(CASE WHEN dev2 * 20000 > 3 * 14826 * mad4
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM j JOIN s USING (event_type, med2)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    // exact-integer PSI terms; one closing division per type
    "q166_psi" ->
      """WITH ev AS (SELECT event_type,
        |    day(CAST(ts AS DATE)) AS dom,
        |    CAST(round(value * 100) AS BIGINT) // 5000 AS b
        |  FROM events),
        |c1 AS (SELECT event_type, b, count(*) AS c FROM ev
        |  WHERE dom <= 7 GROUP BY 1, 2),
        |c2 AS (SELECT event_type, b, count(*) AS d FROM ev
        |  WHERE dom >= 24 GROUP BY 1, 2),
        |spine AS (SELECT DISTINCT event_type, k.range AS b
        |  FROM ev CROSS JOIN range(10) k),
        |cells AS (SELECT spine.event_type, spine.b,
        |    coalesce(c, 0) + 1 AS cs, coalesce(d, 0) + 1 AS ds
        |  FROM spine
        |  LEFT JOIN c1 ON spine.event_type = c1.event_type
        |    AND spine.b = c1.b
        |  LEFT JOIN c2 ON spine.event_type = c2.event_type
        |    AND spine.b = c2.b),
        |tot AS (SELECT event_type, CAST(sum(cs) AS BIGINT) AS nn,
        |    CAST(sum(ds) AS BIGINT) AS mm
        |  FROM cells GROUP BY 1),
        |terms AS (SELECT cells.event_type, nn, mm,
        |    (cs * mm - ds * nn) * CAST(round(ln(
        |      CAST(cs * mm AS DOUBLE) / CAST(ds * nn AS DOUBLE))
        |      * 1e6) AS BIGINT) AS term
        |  FROM cells JOIN tot ON cells.event_type = tot.event_type)
        |SELECT event_type,
        |  round(CAST(CAST(sum(term) AS BIGINT) AS DOUBLE) /
        |    (CAST(nn AS DOUBLE) * CAST(mm AS DOUBLE) * 1e6), 6)
        |    AS psi
        |FROM terms GROUP BY event_type, nn, mm
        |ORDER BY event_type""".stripMargin)
}
