package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a token stream, built Spark-first: the
  * sketch IS a (row, cell, count) DataFrame of at most depth×width
  * rows — produced by one explode + one hash-aggregate with map-side
  * combine, mergeable across corpora/batches by per-cell SUM. No
  * custom aggregation buffer: the counter matrix a native CMS
  * implementation maintains per-node is exactly what Spark's partial
  * aggregation already computes, so declaring it as a groupBy gets
  * codegen, spill handling, and AQE for free.
  *
  * Scale shape (100 TB): the sketch never exceeds depth×width rows
  * regardless of corpus size — the explode multiplies the token
  * stream by `depth` but partial aggregation collapses it to
  * depth×width per task before the one shuffle. Estimation joins
  * candidates against the BROADCAST sketch (depth×width rows).
  * Candidate generation is the caller's job: at scale, candidates
  * come from a cheap pre-pass (a sampled top-K or a per-partition
  * local top-K union), never from materializing the full vocabulary.
  *
  * The default hash is xxhash64 (fast, not oracle-replayable); q83
  * passes the md5-60-bit hash so DuckDB replays every cell index and
  * count exactly (the SketchQueries md5-core discipline).
  */
object CountMin {

  /** Production cell hash: seeded xxhash64, non-negative mod width. */
  def xxHash(tok: Column, r: Int): Column =
    xxhash64(concat(lit(s"cms$r:"), tok))

  /** Cross-engine cell hash: 60-bit md5 integer (StableHash), whose
    * DuckDB twin is `CAST('0x' || substr(md5('cms' || r || ':' || t),
    * 1, 15) AS BIGINT)`.
    */
  def md5Hash(tok: Column, r: Int): Column =
    graft.functions.StableHash.md5Int60(concat(lit(s"cms$r:"), tok))

  private def cells(tok: Column, depth: Int, width: Int,
      hash: (Column, Int) => Column): Column =
    array((0 until depth).map(r => struct(lit(r).as("r"),
      pmod(hash(tok, r), lit(width.toLong)).as("cell"))): _*)

  /** Token stream → sketch counters: (r, cell, cnt), ≤ depth×width
    * rows. Merge two sketches by unioning and summing cnt per
    * (r, cell).
    */
  def sketch(toks: DataFrame, tokCol: String, depth: Int, width: Int,
      hash: (Column, Int) => Column = xxHash): DataFrame = {
    require(depth >= 1 && width >= 1)
    toks
      .select(explode(cells(col(tokCol), depth, width, hash)).as("__rc"))
      .select(col("__rc.r").as("r"), col("__rc.cell").as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches from disjoint scans/batches: per-cell SUM — the
    * CMS union law (counters are linear).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r", "cell").agg(sum("cnt").as("cnt"))

  /** Point estimates for a candidate set: min over the depth counters
    * each candidate hashes into — the classic CMS upper bound
    * (est ≥ true count, with overestimates where cells collide).
    * The sketch side is broadcast (≤ depth×width rows); candidates
    * never see each other, so the join is embarrassingly parallel.
    */
  def estimate(candidates: DataFrame, sk: DataFrame, tokCol: String,
      depth: Int, width: Int,
      hash: (Column, Int) => Column = xxHash): DataFrame = {
    require(depth >= 1 && width >= 1)
    candidates
      .select(col(tokCol),
        explode(cells(col(tokCol), depth, width, hash)).as("__rc"))
      .select(col(tokCol), col("__rc.r").as("r"), col("__rc.cell").as("cell"))
      .join(broadcast(sk), Seq("r", "cell"), "left")
      // a candidate never seen by the sketch has no counter row: its
      // true count is 0 and min-over-rows must say 0, not NULL
      .withColumn("__c", coalesce(col("cnt"), lit(0L)))
      .groupBy(col(tokCol)).agg(min(col("__c")).as("est"))
  }
}
