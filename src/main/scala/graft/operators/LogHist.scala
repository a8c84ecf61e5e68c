package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable log₂-binned histogram for approximate quantiles — the
  * doc-length / latency percentile signal a curation pipeline
  * thresholds on (p50/p95/p99 of tokens-per-doc, bytes-per-record).
  * The sketch IS a (group, bin, cnt) DataFrame of ≤ 64 bins per
  * group: bin = MSB position of the value (via `bin()` string
  * length — integer-exact on Spark and DuckDB, the [[Hll]] rho
  * trick), counts merge across corpora/batches by per-bin SUM. A
  * quantile answer is the smallest bin whose running count reaches
  * the rank, reported with its inclusive value range [2^(b−1),
  * 2^b − 1] — the guarantee is relative error ≤ 2×, the classic
  * log-histogram contract, with zero float arithmetic anywhere.
  *
  * Scale shape (100 TB): one hash-aggregate with map-side combine —
  * each task reduces its slice to ≤ 64 rows per group before the
  * shuffle; the quantile extraction then runs on the bin table
  * (groups × 64 rows), where the running count is a window over ≤ 64
  * rows per group and the grand total rides the same sort as a
  * full-frame window (the q84 two-level pattern, no extra scan).
  *
  * Reference behavior anchor: the reference publishes request-latency
  * histograms with hand-picked buckets
  * (/root/reference/metrics/metrics.go:19-25 RequestTimeHistogramUsec);
  * log₂ bins generalize that to unknown value ranges and stay
  * mergeable.
  */
object LogHist {

  /** MSB-position bin of a non-negative value: 0 for x ≤ 0 (its own
    * bin), else length(bin(x)) — so bin b covers [2^(b−1), 2^b − 1].
    */
  def binOf(x: Column): Column =
    when(x <= 0, lit(0)).otherwise(length(bin(x.cast("long"))))

  /** Value stream → (group..., bin, cnt) sketch rows. */
  def sketch(df: DataFrame, valueCol: String,
      groupCols: Seq[String]): DataFrame =
    df.select((groupCols.map(col) :+ binOf(col(valueCol)).as("bin")): _*)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches from disjoint scans/batches: per-bin SUM. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantiles from a sketch: for each percentile p (integer 0–100),
    * the smallest bin whose running count covers rank
    * ceil(p·total/100), with the bin's inclusive [lo, hi] range.
    * The rank compare is exact-integer (`cum·100 ≥ p·total`, the q84
    * cutoff discipline).
    */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
      percentiles: Seq[Int]): DataFrame = {
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100))
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val wCum = Window.partitionBy(g: _*).orderBy("bin")
    val wAll = Window.partitionBy(g: _*)
      .orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = sk
      .withColumn("__cum", sum("cnt").over(wCum))
      .withColumn("__total", sum("cnt").over(wAll))
    val ps = explode(array(percentiles.map(lit(_)): _*)).as("p")
    cum.select((g :+ col("bin") :+ col("__cum") :+ col("__total")) :+ ps: _*)
      .filter(col("__cum") * 100 >= col("p") * col("__total"))
      .groupBy((g :+ col("p")): _*)
      .agg(min("bin").as("bin"))
      .select((g :+ col("p") :+ col("bin") :+
        when(col("bin") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bin - 1)"))
          .as("lo") :+
        (expr("shiftleft(CAST(1 AS BIGINT), bin)") - 1L).as("hi")): _*)
  }
}
