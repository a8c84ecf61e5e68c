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
  * Verify: Spark's codegen `levenshtein` on the candidate pairs —
  * candidates are id pairs, so raw strings are joined back only for
  * the (tiny, broadcastable) candidate set.
  *
  * Skew note: high-frequency grams ("th" in English names) fan the
  * candidate join out; the positional window caps each (gram, pos)
  * key's multiplicity at the per-position population, and AQE's
  * skew split handles the Zipf head the same way the prefix-filter
  * join's token join does. For corpora with adversarial shared
  * prefixes, raise `q` — longer grams are rarer.
  *
  * Output: (idCol_a, idCol_b, dist), idCol_a < idCol_b, dist ≤
  * maxDist.
  */
object Fuzzy {

  def editDistanceJoin(df: DataFrame, strCol: String, idCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
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

    // long-inclusive candidates: any qualifying pair whose LONGER
    // member has len >= shortLimit shares >= 1 positional gram
    val gramCands = grams.as("a").join(grams.as("b"),
        col("a.__gh") === col("b.__gh") &&
        col("a.__id") < col("b.__id") &&
        abs(col("a.__p") - col("b.__p")) <= maxDist &&
        abs(col("a.__len") - col("b.__len")) <= maxDist &&
        greatest(col("a.__len"), col("b.__len")) >= shortLimit)
      .select(col("a.__id").as("__da"), col("b.__id").as("__db"))

    // short-short candidates: bounded-length strings bucket by a
    // length window (each short row explodes to <= maxDist+1 target
    // lengths; a pair meets exactly once at the longer member's len)
    val shorts = base.filter(col("__len") < shortLimit)
    val shortCands =
      if (maxDist == 0)
        shorts.as("a").join(shorts.as("b"),
            col("a.__len") === col("b.__len") &&
            col("a.__id") < col("b.__id"))
          .select(col("a.__id").as("__da"), col("b.__id").as("__db"))
      else {
        val keyed = shorts.select(col("__id"), col("__len"),
          explode(sequence(col("__len"),
            least(col("__len") + maxDist, lit(shortLimit - 1))))
            .as("__bkt"))
        keyed.as("a").join(keyed.as("b"),
            col("a.__bkt") === col("b.__bkt") &&
            col("a.__id") < col("b.__id") &&
            greatest(col("a.__len"), col("b.__len")) === col("a.__bkt") &&
            abs(col("a.__len") - col("b.__len")) <= maxDist)
          .select(col("a.__id").as("__da"), col("b.__id").as("__db"))
      }

    val cands = gramCands.unionByName(shortCands).distinct()

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
}
