package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) string self-join — record-linkage's core
  * operator: all pairs within Levenshtein distance `maxDist`,
  * WITHOUT the all-pairs cross product.
  *
  * Candidate generation is the positional q-gram count filter
  * (Gravano et al., VLDB'01): strings within edit distance k share
  * at least max(|a|,|b|) − q + 1 − q·k positional q-grams whose
  * positions differ by ≤ k. Whenever max(|a|,|b|) ≥ q·(k+1) that
  * bound is ≥ 1, so every qualifying pair with a long member shows
  * up in a plain equi-join on (gram, ~position): grams join as
  * xxhash64 ints (8-byte keys — the gram STRINGS never shuffle; a
  * collision can only ADD a candidate, which the exact verify
  * rejects), with the |posA − posB| ≤ k window and the |lenA −
  * lenB| ≤ k length filter as residuals. Pairs of two SHORT strings
  * (both < q·(k+1) chars — bounded by construction) can share zero
  * grams ("ab"→"cd" at k=2), so they join through a length-window
  * bucket instead; within-bucket fan-out is quadratic only over the
  * bounded-length short population (documented contract).
  *
  * Skew guard (default ON, the LSH maxBucket discipline from
  * [[Dedup]]): a gram carried by more than `maxBucket` rows — "th"
  * in English names, or a boilerplate shingle in half the corpus —
  * would fan the equi-join out quadratically in ONE shuffle bucket.
  * Such HOT grams are excluded from the gram join; every row
  * carrying a hot gram instead degrades to the same length-window
  * bucket join the short path uses. Losslessness is preserved
  * exactly: a qualifying pair either shares some RARE gram within
  * the positional window (found by the gram join — if either member
  * lacked hot grams entirely, every shared gram is rare), or shares
  * only hot grams — in which case BOTH members carry a hot gram,
  * both land in the fallback population, and the length window
  * (|lenA − lenB| ≤ k holds for every qualifying pair) finds them.
  * The fallback's fan-out is quadratic only within a length bucket
  * of the hot population — bounded by corpus length diversity
  * instead of one unbounded shuffle key, and AQE can split it
  * further. The hot-gram set itself is at most #grams/maxBucket
  * distinct hashes — broadcastable by construction.
  *
  * Verify: Spark's codegen `levenshtein` on the candidate pairs —
  * candidates are id pairs, so raw strings are joined back only for
  * the (tiny, broadcastable) candidate set.
  *
  * Output: (idCol_a, idCol_b, dist), idCol_a < idCol_b, dist ≤
  * maxDist.
  */
object Fuzzy {

  def editDistanceJoin(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int, q: Int = 2, maxBucket: Int = 1024): DataFrame = {
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))
    val cands = candidatePairs(df, strCol, idCol, maxDist, q, maxBucket)
    // exact verify: join raw strings back onto the candidate pairs
    def raw(as: String, sAs: String) =
      base.select(col("__id").as(as), col("__s").as(sAs))
    cands
      .join(raw("__da", "__sa"), "__da")
      .join(raw("__db", "__sb"), "__db")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("__da").as(s"${idCol}_a"),
        col("__db").as(s"${idCol}_b"),
        col("dist").cast("long").as("dist"))
  }

  /** The candidate stage alone (exposed for the skew-guard
    * differential spec): distinct (__da, __db) id pairs, __da < __db,
    * superset of all qualifying pairs.
    */
  private[operators] def candidatePairs(df: DataFrame, strCol: String,
      idCol: String, maxDist: Int, q: Int,
      maxBucket: Int = 1024): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    require(maxBucket >= 1, "maxBucket must be >= 1")
    val shortLimit = q * (maxDist + 1) // strictly-below ⇒ short

    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // positional q-grams, hashed; 0-based positions
    val grams = base
      .filter(col("__len") >= q)
      .select(col("__id"), col("__len"),
        posexplode(expr(
          s"transform(sequence(1, __len - ${q - 1}), " +
            s"i -> substring(__s, i, $q))")).as(Seq("__p", "__g")))
      .select(col("__id"), col("__len"), col("__p"),
        xxhash64(col("__g")).as("__gh"))

    // hot grams: join keys whose bucket would exceed maxBucket rows;
    // ≤ #grams/maxBucket distinct hashes, broadcast by construction
    val hot = grams.groupBy("__gh")
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select("__gh")
    val rare = grams.join(broadcast(hot), Seq("__gh"), "left_anti")

    // long-inclusive candidates over RARE grams: any qualifying pair
    // whose LONGER member has len >= shortLimit and shares a rare
    // positional gram
    val gramCands = rare.as("a").join(rare.as("b"),
        col("a.__gh") === col("b.__gh") &&
        col("a.__id") < col("b.__id") &&
        abs(col("a.__p") - col("b.__p")) <= maxDist &&
        abs(col("a.__len") - col("b.__len")) <= maxDist &&
        greatest(col("a.__len"), col("b.__len")) >= shortLimit)
      .select(col("a.__id").as("__da"), col("b.__id").as("__db"))

    /** Length-window bucket join over `pop`: each row explodes to
      * target lengths [len, min(len+maxDist, cap)]; a pair meets
      * exactly once, at the longer member's length.
      */
    def lengthWindowCands(pop: DataFrame, cap: Option[Int]): DataFrame =
      if (maxDist == 0)
        pop.as("a").join(pop.as("b"),
            col("a.__len") === col("b.__len") &&
            col("a.__id") < col("b.__id"))
          .select(col("a.__id").as("__da"), col("b.__id").as("__db"))
      else {
        val hiBound = cap.fold(col("__len") + maxDist)(c =>
          least(col("__len") + maxDist, lit(c)))
        val keyed = pop.select(col("__id"), col("__len"),
          explode(sequence(col("__len"), hiBound)).as("__bkt"))
        keyed.as("a").join(keyed.as("b"),
            col("a.__bkt") === col("b.__bkt") &&
            col("a.__id") < col("b.__id") &&
            greatest(col("a.__len"), col("b.__len")) === col("a.__bkt") &&
            abs(col("a.__len") - col("b.__len")) <= maxDist)
          .select(col("a.__id").as("__da"), col("b.__id").as("__db"))
      }

    // short-short candidates: bounded-length strings can share zero
    // grams, so they always ride the length window
    val shortCands = lengthWindowCands(
      base.filter(col("__len") < shortLimit).select("__id", "__len"),
      Some(shortLimit - 1))

    // hot-row fallback: rows carrying >= 1 hot gram pair up through
    // the length window — covers every pair whose ONLY shared grams
    // are hot (both such members are in this population)
    val hotRows = grams.join(broadcast(hot), Seq("__gh"), "left_semi")
      .select("__id", "__len").distinct()
    val hotCands = lengthWindowCands(hotRows, None)

    gramCands.unionByName(shortCands).unionByName(hotCands).distinct()
  }
}
