package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch, Spark-first: the sketch IS a
  * (bucket, register) DataFrame of exactly 2^bucketBits rows —
  * produced by one hash projection + one max-aggregate with map-side
  * combine, mergeable across corpora/batches by per-bucket MAX. As
  * with [[CountMin]], the per-node register array a native HLL
  * maintains is exactly what Spark's partial aggregation computes,
  * so declaring it as a groupBy gets codegen, spill handling, and
  * AQE for free; the shuffle carries at most m rows per task
  * whatever the corpus size.
  *
  * Register arithmetic is integer-exact: bucket = low `bucketBits`
  * bits of the hash, rho = leading-zero count + 1 of the remaining
  * `hashBits - bucketBits`-bit word, computed as
  * `(w + 1) - length(bin(rest))` — `bin()` renders without leading
  * zeros on both Spark and DuckDB, so the oracle replays every
  * register without any float/log wobble (the q83 md5-core
  * discipline). The default hash is xxhash64 (fast, 64-bit, not
  * oracle-replayable); q86 passes the md5-60-bit hash.
  *
  * Reference behavior anchor: the reference tracks corpus-shape
  * gauges like loaded-dataset counts
  * (/root/reference/metrics/metrics.go:64 `DatasetCount`); the
  * analytics equivalent at 100 TB — distinct IPs/ASNs/tokens per
  * snapshot — must be a sketch, not a count-distinct shuffle.
  */
object Hll {

  /** Production hash: xxhash64 (full 64-bit range). */
  def xxHash(tok: Column): Column = xxhash64(concat(lit("hll:"), tok))

  /** Cross-engine hash: 60-bit md5 integer, DuckDB twin
    * `CAST('0x' || substr(md5('hll:' || t), 1, 15) AS BIGINT)`.
    */
  def md5Hash(tok: Column): Column =
    graft.functions.StableHash.md5Int60(concat(lit("hll:"), tok))

  /** Token stream → dense register table: (bucket, register),
    * exactly 2^bucketBits rows (untouched buckets emerge as register
    * 0 via the spine join — a broadcast of m rows). `hashBits` must
    * match the hash's value range (60 for [[md5Hash]], 63 usable for
    * [[xxHash]] — the sign bit is stripped so `bin()` lengths stay
    * monotone).
    */
  def registers(toks: DataFrame, tokCol: String, bucketBits: Int,
      hash: Column => Column = xxHash, hashBits: Int = 63): DataFrame = {
    require(bucketBits >= 1 && bucketBits < hashBits && hashBits <= 63,
      s"need 1 <= bucketBits < hashBits <= 63, got $bucketBits/$hashBits")
    val m = 1 << bucketBits
    val w = hashBits - bucketBits
    // strip to hashBits via unsigned shift so rest < 2^w always holds
    val h = shiftrightunsigned(shiftleft(hash(col(tokCol)), 64 - hashBits),
      64 - hashBits)
    val bucket = h.bitwiseAND(lit((m - 1).toLong))
    val rest = shiftrightunsigned(h, bucketBits)
    val rho = when(rest === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(rest)))
    val spark = toks.sparkSession
    import spark.implicits._
    val spine = (0 until m).map(_.toLong).toDF("bucket")
    val regs = toks.select(bucket.as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max("rho").as("register"))
    spine.join(broadcast(regs), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0)).cast("int").as("register"))
  }

  /** Merge register tables from disjoint scans/batches: per-bucket
    * MAX — the HLL union law.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("bucket")
      .agg(max("register").cast("int").as("register"))

  /** Cardinality estimate from a register table: alpha_m * m^2 / Z
    * with the Flajolet et al. small-range linear-counting correction
    * (est <= 2.5m and empty buckets remain). One 1-row aggregate over
    * m rows — driver-safe at any corpus size. Float math → spec-
    * covered, not oracle-expressible; the oracle pins the REGISTERS
    * (q86) and the estimate is a pure function of them.
    */
  def estimate(regs: DataFrame, bucketBits: Int): DataFrame = {
    val m = 1 << bucketBits
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    regs
      .agg(sum(pow(lit(2.0), -col("register"))).as("__z"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("__v"))
      .select({
        val raw = lit(alpha * m.toDouble * m.toDouble) / col("__z")
        when(raw <= lit(2.5 * m) && col("__v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
          .otherwise(raw).as("estimate")
      })
  }
}
