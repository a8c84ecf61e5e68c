package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter set membership, Spark-first: the filter IS a one-
  * column DataFrame of SET BIT positions (≤ mBits rows, in practice
  * ≈ k·|keys| before saturation) — built by one explode + distinct,
  * merged across corpora by union+distinct, probed by an equi-join
  * against the broadcast bit table. No bitset buffer to maintain:
  * the distinct bit table is the sparse encoding of the same bitmap,
  * and Spark's hash aggregate builds it with map-side combine.
  *
  * Scale shape (100 TB): build cost is one shuffle of k·|keys|
  * longs collapsed map-side to ≤ mBits; the probe side broadcasts
  * the bit table (mBits ≤ a few million rows ≈ tens of MB) so the
  * probing corpus streams through shuffle-free — the same
  * broadcast-probe shape as [[CountMin.estimate]] and the annotate
  * range probes. A key is `maybe` iff ALL its k bit positions are
  * set (collisions of a key's own hashes are deduped first, so the
  * test is over its DISTINCT positions); false positives are the
  * documented contract, false negatives impossible.
  *
  * Reference behavior anchor: the reference keeps per-dataset caches
  * warm so a request touches only a bounded in-memory structure, not
  * the backing archive (/root/reference/manager/manager.go:139-159
  * UpdateCache fan-out); a Bloom pre-screen is the corpus-scale
  * analogue — q87 uses it to cheaply flag training docs sharing
  * 8-grams with a benchmark set before the exact q50 containment
  * join runs on the survivors.
  */
object Bloom {

  /** Production bit hash: seeded xxhash64, non-negative mod mBits. */
  def xxHash(key: Column, r: Int): Column =
    xxhash64(concat(lit(s"bf$r:"), key))

  /** Cross-engine bit hash: 60-bit md5 integer, DuckDB twin
    * `CAST('0x' || substr(md5('bf' || r || ':' || g), 1, 15) AS
    * BIGINT)`.
    */
  def md5Hash(key: Column, r: Int): Column =
    graft.functions.StableHash.md5Int60(concat(lit(s"bf$r:"), key))

  private def bitArray(key: Column, k: Int, mBits: Int,
      hash: (Column, Int) => Column): Column =
    array_distinct(array((0 until k).map(r =>
      pmod(hash(key, r), lit(mBits.toLong))): _*))

  /** Key set → set-bit table: one `bit` column, ≤ mBits rows. */
  def build(keys: DataFrame, keyCol: String, k: Int, mBits: Int,
      hash: (Column, Int) => Column = xxHash): DataFrame = {
    require(k >= 1 && mBits >= 1)
    keys.select(explode(bitArray(col(keyCol), k, mBits, hash)).as("bit"))
      .distinct()
  }

  /** Probe keys → (key, maybe): maybe ⇔ every one of the key's
    * distinct bit positions is set. Callers pass distinct keys; the
    * bit table is broadcast and the per-key verdict is a count
    * compare (hits == own distinct positions), so the probe stream
    * never shuffles on anything but the bounded bit join.
    */
  def mightContain(probes: DataFrame, bitsTable: DataFrame,
      keyCol: String, k: Int, mBits: Int,
      hash: (Column, Int) => Column = xxHash): DataFrame = {
    require(k >= 1 && mBits >= 1)
    val pb = probes
      .select(col(keyCol), bitArray(col(keyCol), k, mBits, hash).as("__ba"))
      .select(col(keyCol), size(col("__ba")).as("__nb"),
        explode(col("__ba")).as("bit"))
    pb.join(broadcast(bitsTable.withColumn("__set", lit(1))),
        Seq("bit"), "left")
      .groupBy(col(keyCol), col("__nb"))
      .agg(sum(coalesce(col("__set"), lit(0))).as("__hits"))
      .select(col(keyCol), (col("__hits") === col("__nb")).as("maybe"))
  }
}
