package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{StableHash, TextFunctions}

/** Deduplication for training-data pipelines, ordered by scale path:
  *
  *  - exact: hash-groupBy, one shuffle on the digest — the cheapest
  *    and the baseline for everything else;
  *  - MinHash + LSH: near-dup candidates via banded signature
  *    buckets — candidate generation is an equi-join on (band, key),
  *    so it shuffles on band keys instead of comparing O(n²) pairs;
  *  - SimHash: 64-bit sketch, near-dup = small Hamming distance;
  *  - n-gram Jaccard: the exact verifier run on candidate pairs.
  *
  * All sketch computation is plain codegen'd column algebra over an
  * exploded gram stream with map-side partial aggregation.
  */
object Dedup {

  /** Normalized content digest for exact dedup. */
  def contentKey(text: Column): Column =
    md5(TextAnalysis.normText(text))

  /** Exact dedup, keep the lowest-id row per digest. At scale this is
    * one shuffle on the digest; the window avoids a second join back.
    */
  def exactDedupKeepFirst(df: DataFrame, textCol: String,
      idCol: String): DataFrame =
    dedupKeepFirstByKey(df, contentKey(col(textCol)), idCol)

  /** Keep the lowest-id row per arbitrary key column — the window
    * core of [[exactDedupKeepFirst]], exposed so callers that already
    * carry a digest column don't recompute it.
    */
  def dedupKeepFirstByKey(df: DataFrame, key: Column,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Deterministic train/val/test assignment: a doc's split follows
    * only its key's md5 (first 15 hex chars as a 60-bit integer mod
    * 100), so the assignment is stable across runs, engines, and
    * repartitioning — re-ingesting a grown corpus never moves an old
    * doc between splits. Narrow (no shuffle); percentages are
    * integer percentiles of the hash space.
    */
  def hashSplit(df: DataFrame, keyCol: Column, valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"invalid split percentages: val=$valPct test=$testPct")
    val bucket =
      StableHash.md5Int60(keyCol.cast("string")) % 100
    df.withColumn("split",
      when(bucket < testPct, "test")
        .when(bucket < testPct + valPct, "val")
        .otherwise("train"))
  }

  /** Character k-grams of the whitespace-normalized, lowercased text
    * as an exploded (id, gram) stream, distinct per doc. The dedup is
    * `array_distinct` on the in-row gram array BEFORE the explode —
    * per-row distinct IS per-doc distinct (callers pass one row per
    * id), and it costs nothing, where a post-explode `.distinct()`
    * would shuffle the whole gram stream once before consumers
    * shuffle it again.
    */
  def explodeGrams(df: DataFrame, textCol: String, idCol: String,
      k: Int = 4): DataFrame =
    df.select(col(idCol),
      explode(TextFunctions.char_ngrams(
        TextAnalysis.normText(col(textCol)), k, distinct = true))
        .as("gram"))

  /** MinHash signatures: `numHashes` permutations of the gram space;
    * signature[i] = min over grams of h_i(gram). Each gram string is
    * xxhash64'd ONCE; the per-permutation values re-hash that 8-byte
    * base with the permutation index as a second input — hashing 8
    * bytes `numHashes` times instead of the gram STRING `numHashes`
    * times is the bulk of the signature cost at corpus scale.
    * (Multiply-add permutations would be cheaper still, but ANSI
    * mode rejects wrapping 64-bit multiplication.) Computed as k
    * min-aggregates over the exploded gram stream — partial
    * (map-side) aggregation keeps the shuffle tiny.
    */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, k: Int = 4): DataFrame = {
    val grams = explodeGrams(df, textCol, idCol, k)
      .withColumn("__h", xxhash64(col("gram")))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("__h"), lit(i))).as(s"h$i"))
    grams.groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `sig.size/bands` rows each; docs sharing any band key are
    * candidates. Returns distinct (a, b) id pairs with a < b.
    * The heavy lifting is an equi-self-join on (band, key) — a
    * shuffle-partitionable key, never an O(n²) scan.
    */
  /** (id-as-`as`, band, band_key) rows: the signature split into
    * `bands` hashed band keys — shared by self-join (batch) and
    * asymmetric (incremental) LSH candidate generation.
    */
  private def bandKeys(sigs: DataFrame, idCol: String, bands: Int,
      as: String): DataFrame = {
    val rows = (size(col("sig")) / lit(bands)).cast("int")
    sigs.select(col(idCol).as(as),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, rows))))
      .select(col(as), col("pos").as("band"),
        xxhash64(col("col").cast("string")).as("band_key"))
  }

  /** @param maxBucket skew guard: a (band, key) bucket larger than
    *   this degrades from the all-pairs self-join (quadratic in the
    *   bucket) to deterministic STAR candidates around the bucket's
    *   minimum id (linear). The exact-dedup pre-pass in
    *   [[nearDupDedup]] already kills identical docs, but a templated
    *   corpus — near-identical, not identical — can still pile one
    *   bucket to millions of members; the star keeps every member a
    *   candidate (connectivity for clustering is preserved through
    *   the hub) while bounding candidate count at bucket size. Pair
    *   RECALL inside an oversized bucket drops to the star edges by
    *   design — the quadratic pair set was the pathology. Default
    *   unlimited HERE (the guard costs one extra shuffle on the band
    *   key, and the pair-listing APIs are exhaustive by contract);
    *   the end-to-end [[nearDupDedup]] defaults it ON via
    *   [[DefaultMaxBucket]].
    */
  def lshCandidatePairs(sigs: DataFrame, idCol: String,
      bands: Int = 16, maxBucket: Int = Int.MaxValue): DataFrame =
    bandedCandidatePairs(bandKeys(sigs, idCol, bands, "id"), maxBucket)

  /** Candidate-pair core over an already-banded `(id, band,
    * band_key)` stream — shared by [[lshCandidatePairs]] (which bands
    * in-plan) and [[DedupIndex.selfPairs]] (which reads persisted
    * band keys): the equi-self-join on (band, band_key) with the
    * maxBucket star degrade. `band_key` may be any equi-joinable
    * type (long here, string in the persisted md5 layout).
    */
  private[operators] def bandedCandidatePairs(banded: DataFrame,
      maxBucket: Int): DataFrame = {
    if (maxBucket == Int.MaxValue) {
      val l = banded.alias("l")
      val r = banded.alias("r")
      l.join(r,
          col("l.band") === col("r.band") &&
            col("l.band_key") === col("r.band_key") &&
            col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b"))
        .distinct()
    } else {
      require(maxBucket >= 2, s"maxBucket must be >= 2: $maxBucket")
      // one pass over the banded stream sizes every bucket (map-side
      // combined; same shuffle key as the join below, so AQE lines
      // the exchanges up)
      val sized = banded
        .join(banded.groupBy("band", "band_key")
            .agg(count(lit(1)).as("__n"), min(col("id")).as("__hub")),
          Seq("band", "band_key"))
        .localCheckpoint(false)
      val healthy = sized.filter(col("__n") <= maxBucket)
      val l = healthy.alias("l")
      val r = healthy.alias("r")
      val allPairs = l.join(r,
          col("l.band") === col("r.band") &&
            col("l.band_key") === col("r.band_key") &&
            col("l.id") < col("r.id"))
        .select(col("l.id").as("a"), col("r.id").as("b"))
      // oversized buckets: min-id hub → member star, linear per bucket
      val starPairs = sized.filter(col("__n") > maxBucket)
        .filter(col("id") =!= col("__hub"))
        .select(col("__hub").as("a"), col("id").as("b"))
      allPairs.unionByName(starPairs).distinct()
    }
  }

  /** Jaccard similarity of two docs estimated from MinHash
    * signatures: fraction of equal positions.
    */
  def signatureJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => (x === y).cast("int")),
      v => v === 1)).cast("double") / size(sigA).cast("double")

  /** Exact repeated-substring detection (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * signal): for every position in every document, does its
    * length-`l` window also occur in ANOTHER document? Returns one
    * row per doc: (id, n_windows, n_repeated) — the per-doc repeated
    * coverage a curation pipeline thresholds on (or uses to cut the
    * exact spans out of the text).
    *
    * Scale shape: windows collapse immediately into per-(window, doc)
    * distinct rows (map-side combined), the cross-doc test is one
    * groupBy on the window key (`count > 1` — never a doc×doc join),
    * and the flag re-attaches to the position stream by the same key.
    * With `hashKeys` (the default) the shuffle key is xxhash64 of the
    * window — 8 bytes instead of `l` chars, the rolling-hash shape of
    * the reference implementation; pass `hashKeys=false` for the
    * raw-substring key (cross-engine exact, what the q74 oracle
    * pins — same output as long as 64-bit collisions stay absent).
    *
    * `maxChars` bounds the per-row window array the explode
    * materializes: one pathological 100 MB document would otherwise
    * build a multi-GB in-row array and kill its executor. Windows are
    * counted within the first `maxChars` characters only (1 M default
    * ≈ a few MB per row worst case); corpora with genuinely longer
    * documents should chunk first ([[TextAnalysis.chunkByTokens]]),
    * which also restores full coverage.
    */
  def repeatedSpans(df: DataFrame, textCol: String, idCol: String,
      l: Int, hashKeys: Boolean = true,
      maxChars: Int = 1 << 20): DataFrame = {
    require(l >= 1, s"invalid window length: $l")
    require(maxChars >= l, s"maxChars $maxChars < window $l")
    val t = substring(col(textCol), 1, maxChars)
    val positions = df
      .filter(col(textCol).isNotNull && length(t) >= l)
      .select(col(idCol), explode(transform(
        sequence(lit(1), length(t) - (l - 1)),
        i => t.substr(i, lit(l)))).as("__g"))
      .select(col(idCol),
        (if (hashKeys) xxhash64(col("__g")) else col("__g")).as("__k"))
    // distinct (window, doc) then per-window doc count: two map-side
    // combinable aggs, no countDistinct expand
    val crossDoc = positions.select(col("__k"), col(idCol)).distinct()
      .groupBy("__k").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__k"), lit(1).as("__rep"))
    positions
      .join(crossDoc, Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("__rep"), lit(0))).as("n_repeated"))
  }

  /** Cross-document repeated-substring REMOVAL (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * where [[repeatedSpans]] only COUNTS repeated windows, this
    * rewrites the corpus — every token covered by a duplicated
    * `l`-token window is dropped EXCEPT in the window's canonical
    * (first) occurrence, so one copy of each duplicated passage
    * survives corpus-wide. "First" = smallest (doc, position)
    * composite; a window duplicated within one document keeps its
    * earliest position only.
    *
    * Output: one row per input doc —
    * `(<id>, n_tokens, n_dropped, clean_text)` where `clean_text` is
    * the surviving tokens joined by single spaces (tokenization is
    * whitespace-split, so reconstruction normalizes runs of
    * whitespace; docs shorter than `l` tokens pass through intact).
    *
    * Spark shape — linear, never doc×doc: window explode (factor
    * ≈ tokens/doc) → one hash agg per window key with min-occurrence
    * + count (map-side combined) → one equi-join back to occurrences
    * (duplicated keys only) → token-index distinct → anti-join
    * against the token stream → per-doc sorted re-assembly. A
    * pathologically hot window (boilerplate in 50 % of docs) costs
    * its occurrence count in join rows — linear in corpus size, the
    * same bound as the explode itself. The suffix-array construction
    * the paper uses finds variable-length maximal repeats; the fixed-
    * `l` window form here removes exactly the tokens covered by any
    * duplicated `l`-window — the standard shingle rendering of the
    * same rule, and the one that runs as three shuffles on any
    * cluster size.
    */
  def dropRepeatedSpans(df: DataFrame, textCol: String, idCol: String,
      l: Int): DataFrame = {
    require(l >= 2, s"window must be >= 2 tokens: $l")
    // positions survive composite packing: doc_id * 2^20 + pos needs
    // pos < 2^20 and a numeric doc id — both ENFORCED here at
    // runtime (raise_error inside the key expression itself, so
    // column pruning can't drop the check): an over-long doc would
    // collide into the next doc's key space and a non-castable id
    // would null the key, silently turning dedup into a no-op
    val did = col(idCol).cast("long")
    val checkedId = when(did.isNull,
      raise_error(concat(lit(s"dropRepeatedSpans: $idCol value '"),
        col(idCol).cast("string"),
        lit("' does not cast to a non-null long")))).otherwise(did)
    val checkedPos = when(col("__pos") >= (1L << 20),
      raise_error(lit("dropRepeatedSpans: document exceeds 2^20 " +
        "tokens — composite (doc,pos) key would collide; chunk " +
        "upstream"))).otherwise(col("__pos"))
    val toks = df.select(col(idCol),
      filter(split(col(textCol), "\\s+"), t => length(t) > 0).as("__ts"))
    val grams = toks.filter(size(col("__ts")) >= l)
      .select(col(idCol), col("__ts"),
        explode(sequence(lit(0), size(col("__ts")) - l)).as("__pos"))
      .select(col(idCol), col("__pos"),
        concat_ws(" ", slice(col("__ts"), col("__pos") + 1, lit(l))).as("__g"),
        (checkedId * (1L << 20) + checkedPos).as("__ck"))
    // canonical occurrence per duplicated window: min composite key
    val canon = grams.groupBy("__g")
      .agg(min(col("__ck")).as("__canon"), count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .select(col("__g"), col("__canon"))
    // every non-canonical occurrence marks its l token indices
    val marked = grams.join(canon, Seq("__g"))
      .filter(col("__ck") =!= col("__canon"))
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + (l - 1))).as("__ti"))
      .distinct()
    val tokStream = toks
      .select(col(idCol), posexplode(col("__ts")).as(Seq("__ti", "__tok")))
    val kept = tokStream.join(marked, Seq(idCol, "__ti"), "left_anti")
    val counts = marked.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dropped"))
    toks.select(col(idCol), size(col("__ts")).cast("long").as("n_tokens"))
      .join(counts, Seq(idCol), "left")
      .join(
        kept.groupBy(col(idCol)).agg(
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("__ti"), col("__tok")))),
            s => s.getField("__tok"))).as("clean_text")),
        Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Exact n-gram Jaccard between candidate pairs: re-joins the
    * exploded gram sets on the candidate ids only.
    */
  def exactJaccard(pairs: DataFrame, grams: DataFrame,
      idCol: String): DataFrame = {
    val sizes = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val ga = grams.withColumnRenamed(idCol, "a")
    val gb = grams.withColumnRenamed(idCol, "b2")
      .withColumnRenamed("gram", "gram_b")
    val inter = pairs
      .join(ga, Seq("a"))
      .join(gb, col("b") === col("b2") && col("gram") === col("gram_b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "a")
        .withColumnRenamed("n", "na"), Seq("a"))
      .join(sizes.withColumnRenamed(idCol, "b")
        .withColumnRenamed("n", "nb"), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"), 4)
          .as("jaccard"))
  }

  /** MinHash+LSH near-dup pipeline: signatures → banded candidates →
    * signature-estimated Jaccard filter. Returns (a, b, est_jaccard).
    */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6, maxBucket: Int = Int.MaxValue): DataFrame = {
    // materialized once: the signature table feeds the band
    // self-join (twice) and both estimate re-joins, and recomputing
    // the gram explosion + 64 min-aggs per branch is the dominant
    // cost at corpus scale. LAZY localCheckpoint: still computed
    // once (branches share the blocks within the action) but
    // constructing the DataFrame runs no job, and blocks die with
    // the RDD instead of the session. Batch-only (checkpointing does
    // not exist on streams) — streaming near-dup goes through
    // `Streaming.dedupStream`.
    val sigs = minhashSignatures(df, textCol, idCol, numHashes)
      .localCheckpoint(false)
    val cands = lshCandidatePairs(sigs, idCol, bands, maxBucket)
    val sa = sigs.select(col(idCol).as("a"), col("sig").as("sig_a"))
    val sb = sigs.select(col(idCol).as("b"), col("sig").as("sig_b"))
    cands.join(sa, Seq("a")).join(sb, Seq("b"))
      .withColumn("est_jaccard",
        signatureJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select("a", "b", "est_jaccard")
  }

  /** Default LSH bucket cap for [[nearDupDedup]]: buckets above this
    * degrade from all-pairs (quadratic) to star candidates (linear).
    * 1024 keeps every genuine near-dup community (rarely past a few
    * hundred docs) on the exact all-pairs path — ≤ ~524k pairs per
    * bucket worst case, bounded per bucket — while a templated-corpus
    * pathology (one bucket holding millions) can no longer emit a
    * quadratic candidate set. Cluster-level dedup output is unchanged
    * by the degrade (connectivity through the hub is preserved); only
    * pair-level recall inside an oversized bucket drops, by design —
    * see PERF.md for the measured impact on the templated spec corpus.
    */
  val DefaultMaxBucket = 1024

  /** One-call near-dup dedup: MinHash+LSH candidate pairs →
    * connected components → keep the minimum-id doc per cluster
    * (plus every doc with no near-dup at all). The end-to-end
    * production path a curation pipeline runs; the pair and cluster
    * stages are independently oracled (q43/q58). The final prune is
    * a broadcast-friendly anti-join against the (small) set of
    * non-canonical cluster members.
    *
    * The LSH skew guard is ON by default ([[DefaultMaxBucket]]) —
    * this is the unattended end-to-end path, and an unguarded
    * templated corpus is the one input that turns it quadratic. Pass
    * `maxBucket = Int.MaxValue` to opt back into exhaustive pairs.
    */
  def nearDupDedup(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.6,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // exact dedup FIRST: LSH candidate generation is quadratic in an
    // exact-duplicate class (every pair of identical docs shares
    // every band — 10k copies of one boilerplate page would emit
    // 50M candidate pairs). Removing exact dups costs one digest
    // shuffle and leaves the final kept set unchanged: both passes
    // keep the minimum id of a duplicate group.
    val uniq = exactDedupKeepFirst(df, textCol, idCol)
    val pairs = nearDupPairs(uniq, textCol, idCol, numHashes, bands,
      threshold, maxBucket)
    val nearDrop = Graph.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    uniq.join(nearDrop, Seq(idCol), "left_anti")
  }

  /** Incremental exact dedup: drop new docs whose content digest
    * already exists in the corpus digest table, then dedup within
    * the batch itself. The corpus side carries ONLY digests (one
    * binary column, not documents), so at 100 TB the standing state
    * is digest-sized and the whole operation is one join + one
    * window over the (small) new batch — re-running corpus-wide
    * dedup per ingest is never needed.
    */
  def incrementalExactDedup(newDocs: DataFrame, corpusDigests: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val keyed = newDocs.withColumn("__digest", contentKey(col(textCol)))
    keyed
      .join(corpusDigests.select(col("digest").as("__digest")),
        Seq("__digest"), "left_anti")
      // reuse the digest already computed for the anti-join — the
      // md5 + normalization over full text is the per-row cost here
      .transform(d => dedupKeepFirstByKey(d, col("__digest"), idCol))
      .drop("__digest")
  }

  /** Incremental near-dup detection: LSH-join the NEW batch's band
    * keys against the standing corpus signature table (asymmetric —
    * no self-join of the corpus) and verify candidates on signature
    * overlap. Returns (new_id, corpus_id, est_jaccard) pairs; the
    * caller drops or links the flagged new docs. Standing state =
    * signatures only.
    */
  def incrementalNearDups(newDocs: DataFrame, corpusSigs: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 64,
      bands: Int = 16, threshold: Double = 0.6): DataFrame = {
    val newSigs = minhashSignatures(newDocs, textCol, idCol, numHashes)
      .localCheckpoint(false)
    incrementalNearDupsFromSigs(newSigs, corpusSigs, idCol, bands, threshold)
  }

  /** Signature-level core of [[incrementalNearDups]], for callers
    * that already hold the batch's signatures (the streaming path
    * computes them once and reuses them for both the flag join and
    * the state append).
    */
  def incrementalNearDupsFromSigs(newSigs: DataFrame, corpusSigs: DataFrame,
      idCol: String, bands: Int = 16, threshold: Double = 0.6): DataFrame = {
    val cands = bandKeys(newSigs, idCol, bands, "new_id")
      .join(bandKeys(corpusSigs, idCol, bands, "corpus_id"),
        Seq("band", "band_key"))
      .select("new_id", "corpus_id").distinct()
    val sa = newSigs.select(col(idCol).as("new_id"), col("sig").as("sig_a"))
    val sb = corpusSigs.select(col(idCol).as("corpus_id"),
      col("sig").as("sig_b"))
    cands.join(sa, Seq("new_id")).join(sb, Seq("corpus_id"))
      .withColumn("est_jaccard",
        signatureJaccard(col("sig_a"), col("sig_b")))
      .filter(col("est_jaccard") >= threshold)
      .select("new_id", "corpus_id", "est_jaccard")
  }

  /** SimHash-64: per-token hashes vote on each of the 64 bits,
    * weighted by token frequency; the sign of each vote forms the
    * fingerprint bit. Near-dup = Hamming distance ≤ d.
    */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("tok"))
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    val bitVotes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("w"))
        .otherwise(-col("w"))).as(s"b$b")
    }
    toks.groupBy(col(idCol))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col(idCol),
        (0 until 64).map(b =>
          when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs over a 64-bit sketch (SimHash, dHash, …) by
    * Hamming distance, banded for scale: pigeonhole — two hashes
    * within distance `maxDist` agree on at least one of `maxDist + 1`
    * disjoint bit-bands — so candidate generation is an equi-join on
    * (band, segment), never all-pairs. A pair matching in several
    * bands is emitted ONCE, from its first matching band, decided
    * row-locally from the two hashes already in the joined row (no
    * distinct shuffle). Output: (a, b, hamming) with a < b.
    *
    * Skew note: a degenerate corpus (many identical sketches) makes
    * one (band, segment) bucket quadratic — identical-hash pairs are
    * genuine output, so that blowup is output-bound, but for guarded
    * candidate generation over such corpora compose with an exact
    * pre-dedup on the hash (the [[nearDupDedup]] recipe).
    */
  def hammingNearDupPairs(df: DataFrame, idCol: String, hashCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist < 64, s"maxDist $maxDist")
    val nBands = maxDist + 1
    val widths = (0 until nBands).map(b =>
      64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offs = widths.scanLeft(0)(_ + _)
    def seg(h: Column, b: Int): Column = {
      val mask = if (widths(b) >= 64) -1L else (1L << widths(b)) - 1
      shiftrightunsigned(h, offs(b)).bitwiseAND(lit(mask))
    }
    val banded = df.select(col(idCol), col(hashCol),
      posexplode(array((0 until nBands).map(b =>
        seg(col(hashCol), b)): _*)))
      .withColumnRenamed("pos", "__band")
      .withColumnRenamed("col", "__seg")
    val l = banded.select(col("__band"), col("__seg"),
      col(idCol).as("a"), col(hashCol).as("__ha"))
    val r = banded.select(col("__band"), col("__seg"),
      col(idCol).as("b"), col(hashCol).as("__hb"))
    l.join(r, Seq("__band", "__seg"))
      .filter(col("a") < col("b"))
      // first-matching-band uniqueness: every earlier band differs
      .filter((0 until nBands).map(b =>
        lit(b) >= col("__band") ||
          seg(col("__ha"), b) =!= seg(col("__hb"), b)).reduce(_ && _))
      .withColumn("__hd", hamming(col("__ha"), col("__hb")))
      .filter(col("__hd") <= maxDist)
      .select(col("a"), col("b"), col("__hd").cast("long").as("hamming"))
  }

  /** Train/test decontamination: flag training docs whose k-gram
    * overlap with ANY benchmark doc reaches `threshold` (fraction of
    * the BENCHMARK doc's grams — the asymmetric containment test,
    * since a long training doc can swallow a short benchmark item
    * whole). Returns (train id, benchmark id, overlap) pairs.
    *
    * Scale shape: the gram equi-join shuffles on the gram value and
    * the benchmark side is tiny (benchmarks are thousands of docs,
    * not billions) — broadcast it; the training corpus streams
    * through one shuffle-free probe pass per partition.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, k: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val tg = explodeGrams(train, textCol, idCol, k)
      .withColumnRenamed(idCol, "train_id")
    val bg = explodeGrams(benchmark, textCol, idCol, k)
      .withColumnRenamed(idCol, "bench_id")
    val benchSizes = bg.groupBy("bench_id").agg(count(lit(1)).as("bn"))
    val inter = tg.join(broadcast(bg), Seq("gram"))
      .groupBy("train_id", "bench_id").agg(count(lit(1)).as("bi"))
    inter.join(broadcast(benchSizes), Seq("bench_id"))
      .withColumn("overlap",
        round(col("bi").cast("double") / col("bn").cast("double"), 4))
      .filter(col("overlap") >= threshold)
      .select("train_id", "bench_id", "overlap")
  }

  /** Modulus for the multiply-add permutation family: the Mersenne
    * prime 2^31 − 1. Working mod a 31-bit prime keeps every product
    * `a · (h mod P)` under 2^62, so the arithmetic is ANSI-safe
    * (no wrapping 64-bit multiply) AND bit-identical in any engine
    * with exact 64-bit integers — the property the xxhash64 re-hash
    * in [[minhashSignatures]] can't offer an oracle.
    */
  val ModP: Long = 2147483647L

  /** Deterministic (a, b) pairs for `h_i(x) = (a_i·x + b_i) mod P`,
    * drawn from seeded generators so the SAME literals can be
    * interpolated into an oracle's SQL.
    */
  def permParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      val r = new scala.util.Random(seed ^ (i.toLong * 0x9E3779B97F4A7CL))
      (1L + r.nextInt((ModP - 1).toInt).toLong,
        r.nextInt(ModP.toInt).toLong)
    }

  /** GROUP-level MinHash signatures — the corpus/shard/source
    * similarity sketch (which crawls overlap? is this dump a superset
    * of that one?). One row per group: signature_i = min over the
    * group's k-gram set of `(a_i·(base(gram) mod P) + b_i) mod P`.
    * The gram is base-hashed ONCE; the `numHashes` permutations are
    * two integer ops each, and the k min-aggs partial-aggregate
    * map-side, so the shuffle carries numHashes longs per (task,
    * group) whatever the corpus size. Estimated Jaccard between two
    * groups = fraction of equal signature components
    * ([[corpusJaccardMatrix]]); signatures merge across batches by
    * component-wise min.
    */
  def corpusMinhashSignatures(df: DataFrame, textCol: String,
      groupCol: String, numHashes: Int = 32, k: Int = 4,
      baseHash: Column => Column = xxhash64(_)): DataFrame = {
    val grams = explodeGrams(df, textCol, groupCol, k)
    val base = pmod(baseHash(col("gram")), lit(ModP))
    val aggs = permParams(numHashes).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * base + lit(b), lit(ModP))).as(s"h$i")
    }
    grams.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** All-pairs estimated Jaccard from group signatures: a bounded
    * #groups × #groups comparison (groups are corpora/sources —
    * dozens, not documents), matches = equal components. The div by
    * numHashes is exact when numHashes is a power of two.
    */
  def corpusJaccardMatrix(sigs: DataFrame, groupCol: String,
      numHashes: Int): DataFrame = {
    val a = sigs.select(col(groupCol).as("group_a"), col("sig").as("__sa"))
    val b = sigs.select(col(groupCol).as("group_b"), col("sig").as("__sb"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("matches", aggregate(
        zip_with(col("__sa"), col("__sb"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
        lit(0L), (acc, v) => acc + v))
      .select(col("group_a"), col("group_b"), col("matches"),
        round(col("matches").cast("double") / numHashes, 4).as("est_sim"))
  }

  /** Exact set-similarity self-join with AllPairs/PPJoin prefix
    * filtering (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06):
    * all document pairs whose word-`shingle`-gram Jaccard is >=
    * tauTenths/10, found WITHOUT an all-pairs comparison and WITHOUT
    * the MinHash/LSH probabilistic trade ([[nearDupPairs]]) — this is
    * the exact counterpart for contracts that cannot tolerate false
    * negatives.
    *
    * Why it scales: sort each document's distinct shingles by GLOBAL
    * rarity (ascending frequency; token string breaks ties, so the
    * order is total and deterministic). A pair with Jaccard >= tau
    * MUST share a token among each side's first n - ceil(tau*n) + 1
    * tokens (if both prefixes were disjoint, the intersection is
    * confined to the suffixes, forcing Jaccard < tau). So only
    * PREFIX tokens — by construction the rarest — are exploded into
    * the candidate equi-join, and the per-token fan-out stays small
    * exactly where an all-pairs join explodes.
    *
    * Plan shape: one token-frequency hash-agg; one equi-join of the
    * token stream with that table (Zipf-skewed key — AQE handles the
    * moderate case, and only PREFIX tokens survive into the heavy
    * join); one per-doc agg collecting the rarity-sorted array
    * (map-side partial, doc-bounded per the per-row-array contract —
    * chunk first for multi-MB docs); the prefix-token candidate
    * equi-join with the integer length filter
    * 10*min(na,nb) >= tauTenths*max(na,nb); and a doc-bounded verify
    * join computing the EXACT intersection. Threshold compares are
    * pure integers (10*inter >= tauTenths*union) — no float
    * threshold can flip a pair cross-engine.
    *
    * Output: (idCol_a, idCol_b, n_inter, n_union) for qualifying
    * pairs, idCol_a < idCol_b.
    */
  def prefixFilterJoin(df: DataFrame, textCol: String, idCol: String,
      tauTenths: Int = 6, shingle: Int = 3): DataFrame = {
    require(tauTenths >= 1 && tauTenths <= 10,
      s"tauTenths must be in [1,10], got $tauTenths")
    val gramExpr =
      s"""CASE WHEN size(__w) >= $shingle THEN
         |  transform(sequence(0, size(__w) - $shingle),
         |    i -> array_join(slice(__w, i + 1, $shingle), ' '))
         |ELSE CAST(array() AS array<string>) END""".stripMargin
    // The frequency table, the rarity sort, and the candidate join
    // all run on xxhash64 token keys — an 8-byte stream where shingle
    // STRINGS would make every shuffle carry the corpus. Token
    // strings never shuffle at all: the exact verify re-derives each
    // CANDIDATE doc's string-token set by a plain scan projection
    // (array_intersect doesn't care about the rarity order), and the
    // candidate side is tiny, so AQE broadcasts it — the corpus-scan
    // side of the verify never moves. A 64-bit collision can only
    // merge two tokens' counts (perturbing the — arbitrary but
    // consistent — rarity order, which only steers candidate
    // generation) or ADD a candidate pair, which the exact string
    // intersection then rejects: completeness and exactness are
    // collision-proof.
    val toks = df
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__w"))
      .select(col("__id"),
        explode(array_distinct(expr(gramExpr))).as("__tok"))
      .select(col("__id"), xxhash64(col("__tok")).as("__th"))
    val freq = toks.groupBy("__th").agg(count(lit(1)).as("__f"))
    val sortedH = toks.join(freq, "__th")
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("__f").as("f"),
        col("__th").as("th")))).as("__st"))
      .select(col("__id"),
        expr("transform(__st, x -> x.th)").as("__hs"),
        size(col("__st")).as("__n"))
    // prefix length n - ceil(tau*n) + 1, with ceil(tau*n) as
    // (tauTenths*n + 9) div 10 — all integer; posexplode keeps the
    // 1-based prefix position for the PPJoin positional filter
    val pref = sortedH.select(col("__id"), col("__n"),
      posexplode(expr(s"slice(__hs, 1, " +
        s"__n - ((__n * $tauTenths + 9) div 10) + 1)"))
        .as(Seq("__p0", "__th")))
      .select(col("__id"), col("__n"), (col("__p0") + 1).as("__p"),
        col("__th"))
    // PPJoin positional filter (Xiao et al., WWW'08): a shared token
    // at sorted positions (pa, pb) bounds the overlap by
    // 1 + min(na-pa, nb-pb); Jaccard >= tau needs
    // inter*(10+tau10) >= tau10*(na+nb), so pairs whose BOUND fails
    // that never reach the verify
    val cands = pref.as("a").join(pref.as("b"),
        col("a.__th") === col("b.__th") &&
        col("a.__id") < col("b.__id") &&
        col("a.__n") * 10 >= col("b.__n") * tauTenths &&
        col("b.__n") * 10 >= col("a.__n") * tauTenths &&
        (lit(1) + least(col("a.__n") - col("a.__p"),
          col("b.__n") - col("b.__p"))) * (10 + tauTenths) >=
          lit(tauTenths) * (col("a.__n") + col("b.__n")))
      .select(col("a.__id").as("__da"), col("b.__id").as("__db"))
      .distinct()
    // sound hash pre-verify: intersect the 8-byte token-hash arrays.
    // Collisions only INFLATE the hash intersection, so a pair
    // failing the threshold here is guaranteed below it on strings —
    // only the handful of survivors pay the exact string verify.
    val hsets = sortedH.select(col("__id"), col("__hs"), col("__n"))
    val ih = size(array_intersect(col("__ha"), col("__hb")))
    val preVerified = cands
      .join(hsets.select(col("__id").as("__da"), col("__hs").as("__ha"),
        col("__n").as("__na")), "__da")
      .join(hsets.select(col("__id").as("__db"), col("__hs").as("__hb"),
        col("__n").as("__nb")), "__db")
      .filter(ih * 10 >=
        (col("__na") + col("__nb") - ih) * tauTenths)
      .select(col("__da"), col("__db"))
    // exact verify on string-token sets: join raw (id, text) first —
    // the broadcast candidate side filters the scan — and only THEN
    // compute the gram arrays, so shingling runs on candidate rows,
    // not the whole corpus a second time
    def raw(as: String) = df
      .select(col(idCol).as(as), col(textCol).as(s"__x$as"))
    // bind the split to a named column BEFORE the gram transform: an
    // inline split inside the transform lambda would re-evaluate per
    // element — O(len^2) per document
    def grams(w: String) = array_distinct(expr(
      gramExpr.replace("__w", w)))
    val inter = size(array_intersect(col("__ta"), col("__tb")))
    preVerified
      .join(raw("__da"), "__da")
      .join(raw("__db"), "__db")
      .withColumn("__wa", split(col("__x__da"), " "))
      .withColumn("__wb", split(col("__x__db"), " "))
      .select(col("__da"), col("__db"),
        grams("__wa").as("__ta"), grams("__wb").as("__tb"))
      .select(col("__da").as(s"${idCol}_a"), col("__db").as(s"${idCol}_b"),
        inter.as("n_inter"),
        (size(col("__ta")) + size(col("__tb")) - inter).as("n_union"))
      .filter(col("n_inter") * 10 >= col("n_union") * tauTenths)
  }
}
