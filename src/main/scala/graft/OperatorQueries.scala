package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.IpFunctions._
import graft.functions.IpMath
import graft.operators.{AsOf, RangeLookup}

/** Declared queries that drive the custom annotation operators
  * (broadcast binary-search range lookup J1, keyed as-of snapshot
  * join J2) over the relational testdata, with DuckDB-oracle twins —
  * so the engine-specific physical paths are hash-checked, not just
  * unit-tested.
  */
object OperatorQueries {
  /** Long value encoded like a range-table bound. */
  private def enc(v: Long): Array[Byte] = {
    val b = graft.functions.IpOps.longToBin(v)
    b
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q7's semantics, but executed through the broadcast binary-search
    // RangeIndex instead of a BNLJ — same oracle as q07.
    "q25_range_lookup_expr" -> ((s, d) => {
      import s.implicits._
      val bins = Seq((0L, 9L, 0), (10L, 24L, 10), (25L, 50L, 25))
        .map { case (lo, hi, tag) => (enc(lo), enc(hi), tag) }
        .toDF("lo", "hi", "bin_lo")
      val facts = Tables.lineitem(s, d)
        .select(long_to_bin(col("l_quantity").cast("long")).as("qbin"))
      RangeLookup.lookup(s, facts, bins, col("qbin"))
        .groupBy(col("bin_lo").as("lo"))
        .agg(count(lit(1)).as("c"))
        .orderBy("lo")
    }),

    // Keyed as-of: each event picks the user's latest order date ≤ ts,
    // clamped to the user's earliest order when none precede.
    "q26_asof_snapshot" -> ((s, d) => {
      val snaps = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate")).distinct()
      val events = Tables.events(s, d)
        .select(col("event_id"), col("user_id").as("o_custkey"), col("ts"))
      AsOf.asOfSnapshot(events, snaps, col("ts"), "o_orderdate",
          keyCols = Seq("o_custkey"))
        .filter(col("o_orderdate").isNotNull)
        .select(col("event_id"), col("o_orderdate").as("snap"))
        .orderBy("event_id")
        .limit(100)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q25_range_lookup_expr" ->
      """SELECT b.lo, count(*) AS c FROM lineitem l JOIN
        |(SELECT 0 AS lo, 10 AS hi UNION ALL SELECT 10, 25
        | UNION ALL SELECT 25, 51) b
        |ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
        |GROUP BY b.lo ORDER BY b.lo""".stripMargin,
    "q26_asof_snapshot" ->
      """SELECT e.event_id, coalesce(
        |  (SELECT max(o.o_orderdate) FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
        |  (SELECT min(o.o_orderdate) FROM orders o
        |   WHERE o.o_custkey = e.user_id)) AS snap
        |FROM events e
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.user_id)
        |ORDER BY e.event_id LIMIT 100""".stripMargin
  )
}
