package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Bloom, CountMin, Dedup, Hll, LogHist, Packing, Sampling, Similarity, TextAnalysis}

/** Declared queries for the training-data extensions (dedup,
  * similarity search, text analysis) over `documents`/`embeddings`,
  * each with a DuckDB oracle so the sketch math itself is
  * hash-checked (md5-based where the oracle must agree bit-for-bit;
  * the scale path uses xxhash64 and is covered by specs).
  */
object ExtensionQueries {

  private def normText(c: org.apache.spark.sql.Column) =
    TextAnalysis.normText(c)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-dedup statistics over normalized content digests.
    "q30_dedup_exact" -> ((s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(normText(col("text")).cast("binary")))
          .as("n_unique"))),

    // MinHash core: 4 md5-seeded min-hashes over char-4-grams. The
    // mins are taken over the 60-bit md5 INTEGERS (StableHash — same
    // cross-engine contract), not the raw md5 binary: min over a
    // BINARY column can't use Spark's hash-agg fast path and planned
    // a SortAggregate; min over BIGINT stays HashAggregate with
    // map-side partials (SweepSpec-locked).
    "q31_minhash_sig" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
      val norm = normText(col("text"))
      val grams = docs.select(col("doc_id"),
        explode(TextFunctions.char_ngrams(norm, 4)).as("g"))
      def m(i: Int) = min(graft.functions.StableHash.md5Int60(
        concat(lit(s"s$i:"), col("g")))).as(s"m$i")
      grams.groupBy("doc_id").agg(m(0), m(1), m(2), m(3))
        .orderBy("doc_id")
    }),

    // Exact char-4-gram Jaccard over a bounded id range — the
    // verifier the MinHash estimate approximates. One scan builds the
    // per-doc distinct gram ARRAY (no exploded gram table, no
    // re-scan per plan branch); the bounded 60×60 cross then
    // intersects arrays directly. The pair-driven `Dedup.exactJaccard`
    // stays the scale path for verifying LSH candidates.
    "q32_jaccard_pairs" -> ((s, d) => {
      val norm = normText(col("text"))
      val grams = TextFunctions.char_ngrams(norm, 4, distinct = true)
      val sets = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), grams.as("gs"))
        .withColumn("n", size(col("gs")))
      val l = sets.select(col("doc_id").as("a"), col("gs").as("ga"),
        col("n").as("na"))
      val r = sets.select(col("doc_id").as("b"), col("gs").as("gb"),
        col("n").as("nb"))
      l.crossJoin(r).filter(col("a") < col("b"))
        .withColumn("i", size(array_intersect(col("ga"), col("gb"))))
        .withColumn("jaccard", round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double"), 4))
        .filter(col("jaccard") >= 0.15)
        .select("a", "b", "jaccard")
        .orderBy("a", "b")
    }),

    // Brute-force cosine top-10 for probe vec_id=0.
    "q33_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("probe_vec"), lit(0L).as("probe_id"))
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") > 0), probe, 10)
        .select(col("vec_id"), col("sim"), col("rank").cast("long").as("rank"))
        .orderBy("rank")
    }),

    // Token counts + stopword ratio (quality-scoring inputs).
    "q34_text_quality" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
          round(TextAnalysis.stopwordRatio(col("text")), 4).as("sr"))
        .orderBy("doc_id")),

    // Train/benchmark decontamination: flag "training" docs whose
    // 8-gram containment of any "benchmark" doc reaches 0.5.
    "q50_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
          docs.filter(col("doc_id") >= 100 && col("doc_id") < 300),
          docs.filter(col("doc_id") < 20),
          "text", "doc_id", k = 8, threshold = 0.5)
        .orderBy("train_id", "bench_id")
    }),

    // Exact repeated-substring coverage (Lee et al. 2022): per doc,
    // how many of its 20-char windows occur verbatim in ANOTHER doc —
    // the span-level exact-dedup signal. Raw-substring keys here so
    // the DuckDB twin reproduces the windows byte-for-byte; the
    // xxhash64 key variant is the documented 100 TB shuffle shape.
    "q74_repeated_substrings" -> ((s, d) =>
      Dedup.repeatedSpans(
          Tables.documents(s, d).filter(col("doc_id") < 120),
          "text", "doc_id", l = 20, hashKeys = false)
        .filter(col("n_repeated") > 0)
        .orderBy("doc_id")),

    // Composite quality score (length / punctuation / token shape) —
    // the thresholding signal for corpus curation, hash-checked
    // against a DuckDB twin of the same double algebra.
    "q49_quality_score" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q"))
        .orderBy("doc_id")),

    // Data-mixture construction: sample per-language so the output
    // hits 50/30/20 en/de/fr at the maximum feasible size (the
    // scarcest stratum relative to its share caps the mix). Rates
    // derive from actual counts with the same double arithmetic on
    // both engines, so the exact selected id set hash-matches.
    "q63_data_mixture" -> ((s, d) =>
      Sampling.mixToTarget(Tables.documents(s, d), col("doc_id"),
          col("lang"), Map("en" -> 0.5, "de" -> 0.3, "fr" -> 0.2))
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")),

    // Incremental exact dedup: treat docs < 300 as the standing
    // corpus (digests only) and docs >= 300 as the new batch; keep
    // batch docs whose content is new. The ingest-time pattern that
    // avoids re-deduping the corpus.
    "q62_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpusDigests = docs.filter(col("doc_id") < 300)
        .select(Dedup.contentKey(col("text")).as("digest")).distinct()
      Dedup.incrementalExactDedup(
          docs.filter(col("doc_id") >= 300), corpusDigests,
          "text", "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // Document chunking into 64-token windows with stride 48 — the
    // context-window preprocessing step; full chunk rows (text +
    // bounds) hash-checked.
    "q61_chunking" -> ((s, d) =>
      TextAnalysis.chunkByTokens(
          Tables.documents(s, d).filter(col("doc_id") < 50),
          "text", "doc_id", chunkSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx")),

    // Unigram LM scoring: corpus-frequency log-prob per doc, in
    // exact integer micro-log-probs (float sums would be
    // partitioning-dependent; integer sums hash-match).
    "q60_unigram_lm" -> ((s, d) =>
      TextAnalysis.unigramLogProbScore(
          Tables.documents(s, d), "text", "doc_id")
        .filter(col("doc_id") < 200)
        .orderBy("doc_id")),

    // DSIR-style importance weights: hashed word-bigram log-likelihood
    // ratio of the English slice vs the raw corpus, integer
    // micro-units (exact, partition-order-free sums). The
    // data-selection signal for targeted pretraining mixes.
    "q65_dsir_importance" -> ((s, d) =>
      Sampling.importanceWeights(Tables.documents(s, d),
          "text", "doc_id", col("lang") === "en")
        .filter(col("doc_id") < 200)
        .orderBy("doc_id")),

    // Within-doc token entropy — the statistical repetitiveness
    // signal (low = templated, high = diverse vocabulary).
    "q59_token_entropy" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          round(TextAnalysis.tokenEntropy(col("text")), 4).as("h"))
        .orderBy("doc_id")),

    // Sequence packing: assign docs to 2048-token training bins
    // within 8 hash shards (per-shard running totals — no global
    // sort). Per-shard doc/bin/token counts hash-checked.
    "q57_sequence_packing" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      Packing.packByBudget(docs, col("doc_id"), col("n"),
          budget = 2048, shards = 8)
        .groupBy("shard").agg(count(lit(1)).as("n_docs"),
          countDistinct(col("bin")).as("n_bins"),
          sum("n").as("toks"))
        .orderBy("shard")
    }),

    // Stratified deterministic sampling: per-language keep-rates (the
    // training-mix rebalancing op), membership by key hash so the
    // sample is stable across engines — per-stratum counts and an id
    // checksum hash-checked.
    "q55_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), col("doc_id"),
          col("lang"), Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("doc_id").as("id_sum"))
        .orderBy("lang")),

    // End-to-end curation pipeline: quality-score filter → exact
    // dedup (keep lowest id per content digest) → deterministic
    // train/val/test split → per-split counts + mean quality. The
    // composition query — each stage is individually oracled
    // (q49/q30/q53); this checks they compose.
    "q56_curation_pipeline" -> ((s, d) => {
      val scored = Tables.documents(s, d)
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.5)
      Dedup.hashSplit(
          Dedup.exactDedupKeepFirst(scored, "text", "doc_id"),
          col("doc_id"))
        .groupBy("split").agg(count(lit(1)).as("n"),
          round(avg("q"), 4).as("avg_q"))
        .orderBy("split")
    }),

    // Deterministic hash split: stable train/val/test assignment from
    // md5(doc_id) — per-split counts and id extrema hash-checked so
    // the exact assignment (not just proportions) must agree.
    "q53_hash_split" -> ((s, d) =>
      Dedup.hashSplit(Tables.documents(s, d), col("doc_id"))
        .groupBy("split").agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("split")),

    // Corpus-level word document frequency, top-50 heavy hitters —
    // the global-frequency signal for stopword discovery and
    // boilerplate n-gram filtering.
    "q54_doc_frequency" -> ((s, d) =>
      TextAnalysis.docFrequency(Tables.documents(s, d), "text")
        .filter(col("df") >= 10)
        .orderBy(desc("df"), col("word"))
        .limit(50)),

    /** Retrieval scoring: BM25 of every document against a 3-term
      * probe query ([[TextAnalysis.bm25]] — Lucene `+1` IDF,
      * k1=1.2 / b=0.75). Token stream filtered to query terms BEFORE
      * the explode; corpus stats and per-term dfs ride broadcasts.
      * ln() is the one cross-engine wobble (StrictMath vs libm, ≤1
      * ulp), absorbed by the round-4 contract.
      */
    "q82_bm25" -> ((s, d) =>
      TextAnalysis.bm25(Tables.documents(s, d), "doc_id", "text",
          Seq("spark", "join", "window"))
        .orderBy("doc_id")),

    /** q82's scorer as a PERSISTED inverted index
      * ([[graft.operators.Bm25Index]]): the corpus token pass is paid
      * once into term-partitioned postings + a doc-length ledger;
      * every query then reads |terms| tb partitions plus the ledger —
      * never the corpus text. Identical postings ⇒ identical tf, df,
      * N, avgdl ⇒ q82's oracle verbatim.
      */
    "q199_bm25_persisted" -> ((s, d) => {
      import graft.operators.Bm25Index
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bmidx-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(Tables.documents(s, d), "text", "doc_id",
        idx)
      Bm25Index.score(s, idx, Seq("spark", "join", "window"))
        .orderBy("doc_id")
    }),

    // postings and doc lengths are PURE SUMS, so the index extends by
    // O(delta): build on doc_id%2==0, append %2==1, fold the deltas —
    // the union is q82's corpus, so scores and oracle are identical.
    "q200_bm25_appended" -> ((s, d) => {
      import graft.operators.Bm25Index
      val docs = Tables.documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bminc-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", idx)
      Bm25Index.append(docs.filter(col("doc_id") % 2 === 1), idx)
      Bm25Index.compactDeltas(s, idx)
      Bm25Index.score(s, idx, Seq("spark", "join", "window"))
        .orderBy("doc_id")
    }),

    // ...and shrinks by delete = append of NEGATED postings (takedown
    // on retrieval state, no re-index): index everything, delete the
    // odd docs, purge — scores equal a survivors-only index, and the
    // oracle recomputes BM25 over the even half (N, avgdl, df all
    // shift with the survivor set, which is exactly the point).
    /** Batched serving ([[graft.operators.Bm25Index.scoreMany]]): a
      * 3-query workload scored in ONE plan over q199's artifact — one
      * pruned postings pass fans out to qids by a broadcast term
      * join, then a single (qid, doc) aggregate. The per-query scores
      * equal [[graft.operators.Bm25Index.score]] run per query (df,
      * N, avgdl are workload-independent), which the oracle replays.
      */
    "q203_bm25_batch" -> ((s, d) => {
      import graft.operators.Bm25Index
      import s.implicits._
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bmidx-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(Tables.documents(s, d), "text", "doc_id",
        idx)
      val workload = Seq(
        (0L, "spark"), (0L, "join"), (0L, "window"),
        (1L, "hash"), (1L, "merge"),
        (2L, "vector"), (2L, "stream"), (2L, "scan"))
        .toDF("qid", "term")
      Bm25Index.scoreMany(s, idx, workload, "qid", "term")
        .orderBy("qid", "doc_id")
    }),

    /** PURE-SQL retrieval over the q199 artifact through the
      * registered `bm25` source ([[graft.sources.Bm25Source]]): the
      * query-term set parameterizes the view, the serve plan is
      * [[graft.operators.Bm25Index.score]]'s (term-pruned postings,
      * dlb-pruned ledger, manifest stats) — q82's oracle verbatim.
      */
    "q215_bm25_sql" -> ((s, d) => {
      import graft.operators.Bm25Index
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bmidx-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(Tables.documents(s, d), "text", "doc_id",
        idx)
      s.sql("CREATE OR REPLACE TEMPORARY VIEW graft_q215_hits " +
        s"USING bm25 OPTIONS (path '$idx', terms 'spark,join,window')")
      s.sql("SELECT doc_id, bm25 FROM graft_q215_hits ORDER BY doc_id")
    }),

    "q201_bm25_deleted" -> ((s, d) => {
      import graft.operators.Bm25Index
      val docs = Tables.documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bmdel-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(docs, "text", "doc_id", idx)
      Bm25Index.delete(docs.filter(col("doc_id") % 2 === 1), idx)
      Bm25Index.purge(s, idx)
      Bm25Index.score(s, idx, Seq("spark", "join", "window"))
        .orderBy("doc_id")
    }),

    /** Frequency sketching: Count-Min heavy hitters over the corpus
      * token stream ([[CountMin]] — d=3, w=64, md5-60-bit cells so
      * DuckDB replays every counter exactly). The narrow width
      * FORCES collisions on this vocabulary, so the output exhibits
      * the CMS contract under oracle check: est ≥ exact everywhere,
      * est > exact where cells collide. Sketch is 192 counter rows
      * (mergeable by sum) whatever the corpus size; estimation joins
      * candidates against the broadcast sketch.
      */
    "q83_cms_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      val sk = CountMin.sketch(toks, "t", depth = 3, width = 64,
        CountMin.md5Hash)
      val exact = toks.groupBy("t").agg(count(lit(1)).as("exact"))
      val est = CountMin.estimate(exact.select(col("t")), sk, "t",
        depth = 3, width = 64, CountMin.md5Hash)
      exact.join(est, "t")
        .select(col("t").as("word"), col("est"), col("exact"))
        .orderBy(desc("exact"), col("word")).limit(20)
    }),

    /** Tokenizer-vocabulary construction: the frequency-ranked
      * coverage curve with an integer-exact 95 % cutoff
      * ([[TextAnalysis.vocabCoverage]]). The cumulative sum is
      * two-level — the only unpartitioned window runs over the
      * distinct-count table, and the grand total rides the same sort
      * as a full-frame window (no third scan, no 1-row cross join).
      */
    "q84_vocab_coverage" -> ((s, d) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, d), "text")
        .orderBy(desc("cnt"), col("word"))),

    /** Cardinality sketching: HyperLogLog registers over the corpus
      * token stream ([[Hll.registers]] — m=64 buckets, md5-60-bit
      * hash, rho via `bin()` length so every register is
      * integer-exact cross-engine). The sketch is a dense 64-row
      * (bucket, register) table, mergeable by per-bucket max; the
      * float estimate is a pure function of these registers
      * ([[Hll.estimate]], spec-covered).
      */
    "q86_hll_registers" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(TextAnalysis.tokens(lower(col("text")))).as("t"))
      Hll.registers(toks, "t", bucketBits = 6, Hll.md5Hash, hashBits = 60)
        .orderBy("bucket")
    }),

    /** Bloom pre-screen decontamination: build a bloom filter over
      * the benchmark docs' 8-gram set, probe each training doc's
      * grams, and flag docs whose maybe-contained fraction reaches
      * 0.5 ([[Bloom.build]]/[[Bloom.mightContain]] — k=3 hashes,
      * 2^17 bits, md5 core so DuckDB replays every bit). Distinct
      * grams are probed ONCE against the broadcast bit table; the
      * verdict joins back to the per-doc gram stream on the same
      * gram-keyed shuffle the exact q50 join would need — but only
      * flagged docs would proceed to the exact containment pass at
      * scale. The integer cutoff (`n_maybe·2 ≥ n_grams`) avoids any
      * float knife-edge.
      */
    "q87_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bg = Dedup.explodeGrams(docs.filter(col("doc_id") < 5),
        "text", "doc_id", k = 8)
      val bits = Bloom.build(bg, "gram", k = 3, mBits = 1 << 17,
        Bloom.md5Hash)
      val tg = Dedup.explodeGrams(
          docs.filter(col("doc_id") >= 100 && col("doc_id") < 300),
          "text", "doc_id", k = 8)
        .withColumnRenamed("doc_id", "train_id")
      val verdicts = Bloom.mightContain(tg.select("gram").distinct(),
        bits, "gram", k = 3, mBits = 1 << 17, Bloom.md5Hash)
      tg.join(verdicts, "gram")
        .groupBy("train_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"))
        .select(col("train_id"), col("n_grams"), col("n_maybe"),
          (col("n_maybe") * 2 >= col("n_grams")).as("flagged"))
        .orderBy("train_id")
    }),

    /** Corpus-level similarity matrix: per-language MinHash
      * signatures ([[Dedup.corpusMinhashSignatures]] — md5 base hash
      * once per gram, 32 multiply-add permutations mod the Mersenne
      * prime 2^31−1, every value integer-exact cross-engine), then
      * the bounded #groups² estimated-Jaccard matrix joined against
      * the EXACT gram-set Jaccard so the oracle pins both the sketch
      * arithmetic and its accuracy target. 5 languages → 10 rows.
      */
    "q88_corpus_minhash" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sigs = Dedup.corpusMinhashSignatures(docs, "text", "lang",
        numHashes = 32, k = 4, baseHash = graft.functions.StableHash.md5Int60)
      val est = Dedup.corpusJaccardMatrix(sigs, "lang", numHashes = 32)
        .withColumnRenamed("group_a", "lang_a")
        .withColumnRenamed("group_b", "lang_b")
      val gsets = Dedup.explodeGrams(docs, "text", "lang", k = 4).distinct()
      val sizes = gsets.groupBy("lang").agg(count(lit(1)).as("n"))
      val inter = gsets.toDF("lang_a", "gram")
        .join(gsets.toDF("lang_b", "gram"), "gram")
        .filter(col("lang_a") < col("lang_b"))
        .groupBy("lang_a", "lang_b").agg(count(lit(1)).as("i"))
      val exact = inter
        .join(broadcast(sizes.toDF("lang_a", "na")), "lang_a")
        .join(broadcast(sizes.toDF("lang_b", "nb")), "lang_b")
        .select(col("lang_a"), col("lang_b"),
          round(col("i").cast("double") /
            (col("na") + col("nb") - col("i")), 4).as("exact_sim"))
      est.join(exact, Seq("lang_a", "lang_b"))
        .orderBy("lang_a", "lang_b")
    }),

    /** Mergeable quantile sketch: log₂-binned doc-length histogram
      * per language, answering p50/p95/p99 with the bin's inclusive
      * range ([[LogHist]] — bins via `bin()` length, rank compare in
      * exact integers; ≤ 64 sketch rows per group whatever the
      * corpus size).
      */
    "q89_loghist_quantiles" -> ((s, d) => {
      val sk = LogHist.sketch(Tables.documents(s, d), "n_chars",
        Seq("lang"))
      LogHist.quantiles(sk, Seq("lang"), Seq(50, 95, 99))
        .orderBy("lang", "p")
    }),

    /** Group-wise top-k WITHOUT a window: per-language top-5 docs by
      * token count via the bounded [[graft.functions.TopKAgg]] — each
      * task partial-aggregates to ≤ k entries per group before the
      * shuffle, where `row_number()` would funnel every row of a
      * group through one task's sort (the ANN top-k machinery applied
      * to plain curation ranking). Ties break on lowest doc_id,
      * mirrored by the oracle's (n DESC, doc_id) window order.
      */
    "q90_grouped_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("double").as("__nt"))
      docs.groupBy("lang")
        .agg(graft.functions.TopKAgg.top_k_agg(
          col("__nt"), col("doc_id"), 5).as("__top"))
        .select(col("lang"), posexplode(col("__top")).as(Seq("__pos", "__e")))
        .select(col("lang"), (col("__pos") + 1).cast("int").as("rank"),
          col("__e.id").as("doc_id"),
          col("__e.score").cast("long").as("n_tokens"))
        .orderBy("lang", "rank")
    }),

    // Repetition/boilerplate stats (Gopher-style): most-frequent-word
    // fraction and duplicate bigram/trigram fractions — the signals a
    // curation pipeline thresholds on to drop template-y docs.
    "q52_repetition" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 200)
        // Project boundary materializes the token array once; the
        // three signals then read it instead of re-running the
        // regex split (the q42 langid lesson)
        .select(col("doc_id"),
          TextAnalysis.tokens(lower(col("text"))).as("__toks"))
        .select(col("doc_id"),
          round(TextAnalysis.topWordFractionFromTokens(col("__toks")), 4)
            .as("top_word_frac"),
          round(TextAnalysis.dupNgramFractionFromTokens(col("__toks"), 2), 4)
            .as("dup_bigram_frac"),
          round(TextAnalysis.dupNgramFractionFromTokens(col("__toks"), 3), 4)
            .as("dup_trigram_frac"))
        .orderBy("doc_id")),

    // PII detection + redaction. The synthetic corpus carries no
    // PII, so the query plants a deterministic email / IP / SSN /
    // phone per doc (derived from doc_id, identically in the oracle
    // SQL) and checks that redaction and per-class counts agree
    // across engines on text that actually fires every pattern.
    "q51_pii_redact" -> ((s, d) => {
      val synth = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" call +1 555 01"),
        lpad((col("doc_id") % 100).cast("string"), 2, "0"))
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"), synth.as("raw"))
        .select(col("doc_id"),
          TextAnalysis.redactPii(col("raw")).as("red"),
          TextAnalysis.piiStats(col("raw")).as("st"))
        .select(col("doc_id"), col("red"),
          col("st.n_email").as("n_email"), col("st.n_ssn").as("n_ssn"),
          col("st.n_ipv4").as("n_ipv4"), col("st.n_phone").as("n_phone"))
        .orderBy("doc_id")
    }),

    // Corpus token-length distribution — the length-filter curation
    // stats a training-data pipeline computes before thresholding.
    // Spark percentile() and DuckDB quantile_cont share the linear-
    // interpolation definition, so the quantiles hash-match exactly.
    "q48_corpus_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(TextAnalysis.tokenCount(col("text")).as("n"))
        .agg(count(lit(1)).as("docs"),
          round(avg("n"), 4).as("mean_toks"),
          round(expr("percentile(n, 0.5)"), 4).as("p50"),
          round(expr("percentile(n, 0.95)"), 4).as("p95"),
          min("n").as("min_toks"), max("n").as("max_toks")))
  )

  /** q82/q199/q200/q201 share this: BM25 with the Lucene +1 IDF at
    * k1=1.2, b=0.75 over the `where`-selected corpus — the arithmetic
    * mirrors [[TextAnalysis.bm25]] term for term (round-4 absorbs the
    * ln() ulp difference between engines); the persisted-index
    * variants change only where tf/dl are read from (and how they
    * were composed: one-shot, appended, or delete-negated).
    */
  private def bm25Oracle(where: String): String =
    s"""WITH base AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(text), '\\s+'),
       |    x -> len(x) > 0) AS toks FROM documents $where),
       |b2 AS (SELECT doc_id, len(toks) AS dl,
       |  list_filter(toks,
       |    t -> t IN ('spark', 'join', 'window')) AS q FROM base),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM b2),
       |tf AS (SELECT doc_id, dl, t, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(q) AS t FROM b2) u
       |  GROUP BY doc_id, dl, t),
       |dfr AS (SELECT t, count(*) AS dfc FROM tf GROUP BY t)
       |SELECT tf.doc_id,
       |  round(sum(ln((n - dfc + 0.5) / (dfc + 0.5) + 1) * (tf * (1.2 + 1))
       |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
       |FROM tf JOIN dfr USING (t), stats
       |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT count(*) AS n_docs,
        |count(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))))
        |  AS n_unique FROM documents""".stripMargin,
    "q31_minhash_sig" ->
      """WITH norm AS (SELECT doc_id,
        |  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t FROM documents
        |  WHERE doc_id < 100),
        |grams AS (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(length(t) - 3, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 4))) AS g FROM norm)
        |SELECT doc_id,
        |  min(CAST('0x' || substr(md5('s0:' || g), 1, 15) AS BIGINT)) AS m0,
        |  min(CAST('0x' || substr(md5('s1:' || g), 1, 15) AS BIGINT)) AS m1,
        |  min(CAST('0x' || substr(md5('s2:' || g), 1, 15) AS BIGINT)) AS m2,
        |  min(CAST('0x' || substr(md5('s3:' || g), 1, 15) AS BIGINT)) AS m3
        |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q32_jaccard_pairs" ->
      """WITH norm AS (SELECT doc_id,
        |  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t FROM documents
        |  WHERE doc_id < 60),
        |grams AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(length(t) - 3, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 4))) AS g FROM norm) u),
        |sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
        |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
        |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2)
        |SELECT a, b, round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
        |FROM inter JOIN sizes sa ON sa.doc_id = a
        |JOIN sizes sb ON sb.doc_id = b
        |WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) >= 0.15
        |ORDER BY a, b""".stripMargin,
    "q33_cosine_topk" ->
      """WITH probe AS (SELECT CAST(embedding AS DOUBLE[]) AS p
        |  FROM embeddings WHERE vec_id = 0),
        |sims AS (SELECT v.vec_id,
        |  list_cosine_similarity(CAST(v.embedding AS DOUBLE[]), probe.p) AS sim
        |  FROM embeddings v, probe WHERE v.vec_id > 0)
        |SELECT vec_id, round(sim, 4) AS sim,
        |  row_number() OVER (ORDER BY sim DESC, vec_id) AS rank
        |FROM sims ORDER BY rank LIMIT 10""".stripMargin,
    "q34_text_quality" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0)) AS n_tokens,
        |  round(CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0 AND x IN ('the','a','an','of','and','to','in',
        |    'is','it','that','for','on','with','as','this'))) AS DOUBLE) /
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)), 4) AS sr
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q74_repeated_substrings" ->
      """WITH docs AS (SELECT doc_id, text FROM documents
        |  WHERE doc_id < 120 AND length(text) >= 20),
        |pos AS (SELECT doc_id,
        |  unnest(list_transform(range(1, length(text) - 18),
        |    i -> substr(text, CAST(i AS INT), 20))) AS g FROM docs),
        |gd AS (SELECT g, count(*) AS nd FROM
        |  (SELECT DISTINCT g, doc_id FROM pos) u GROUP BY g),
        |per AS (SELECT p.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_windows,
        |    CAST(sum(CASE WHEN gd.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_repeated
        |  FROM pos p JOIN gd USING (g) GROUP BY p.doc_id)
        |SELECT doc_id, n_windows, n_repeated FROM per
        |WHERE n_repeated > 0 ORDER BY doc_id""".stripMargin,
    "q50_decontaminate" ->
      """WITH norm AS (SELECT doc_id,
        |  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t FROM documents),
        |tg AS (SELECT DISTINCT doc_id AS train_id, g FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(length(t) - 7, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 8))) AS g FROM norm
        |  WHERE doc_id >= 100 AND doc_id < 300) u),
        |bg AS (SELECT DISTINCT doc_id AS bench_id, g FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(length(t) - 7, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 8))) AS g FROM norm
        |  WHERE doc_id < 20) u),
        |bn AS (SELECT bench_id, count(*) AS n FROM bg GROUP BY bench_id),
        |inter AS (SELECT train_id, bench_id, count(*) AS i
        |  FROM tg JOIN bg USING (g) GROUP BY 1, 2)
        |SELECT train_id, bench_id,
        |  round(CAST(i AS DOUBLE) / n, 4) AS overlap
        |FROM inter JOIN bn USING (bench_id)
        |WHERE round(CAST(i AS DOUBLE) / n, 4) >= 0.5
        |ORDER BY train_id, bench_id""".stripMargin,
    "q49_quality_score" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
        |    AS toks FROM documents WHERE doc_id < 200),
        |m AS (SELECT doc_id,
        |  least(CAST(len(toks) AS DOUBLE) / 100, CAST(1 AS DOUBLE))
        |    AS len_score,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |      / len(toks) ELSE CAST(0 AS DOUBLE) END AS mean_len
        |  FROM t)
        |SELECT doc_id, round(CAST(len_score * 0.4 +
        |  (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE))) * 0.3 +
        |  (CASE WHEN mean_len BETWEEN 3.0 AND 10.0
        |    THEN CAST(1 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * 0.3
        |  AS DOUBLE), 4) AS q
        |FROM m ORDER BY doc_id""".stripMargin,
    "q63_data_mixture" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |  FROM documents GROUP BY lang),
        |tg(lang, t) AS (VALUES
        |  ('en', CAST(0.5 AS DOUBLE)), ('de', CAST(0.3 AS DOUBLE)),
        |  ('fr', CAST(0.2 AS DOUBLE))),
        |tgt AS (SELECT tg.lang, COALESCE(cnt.n, CAST(0 AS DOUBLE)) AS n,
        |  tg.t FROM tg LEFT JOIN cnt USING (lang)),
        |cap AS (SELECT min(n / t) AS cap FROM tgt),
        |thr AS (SELECT lang, CAST(round(t * cap / n * 10000) AS BIGINT)
        |  AS thr FROM tgt, cap WHERE n > 0),
        |s AS (SELECT d.doc_id, d.lang FROM documents d JOIN thr USING (lang)
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |    AS BIGINT) % 10000 < thr)
        |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "q62_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, lang, source,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS digest
        |  FROM documents),
        |corpus AS (SELECT DISTINCT digest FROM d WHERE doc_id < 300),
        |fresh AS (SELECT * FROM d x WHERE doc_id >= 300
        |  AND NOT EXISTS (SELECT 1 FROM corpus c
        |    WHERE c.digest = x.digest)),
        |keep AS (SELECT doc_id, lang, source, row_number() OVER (
        |  PARTITION BY digest ORDER BY doc_id) AS rn FROM fresh)
        |SELECT doc_id, lang, source FROM keep WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "q61_chunking" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
        |    AS toks FROM documents WHERE doc_id < 50),
        |c AS (SELECT doc_id, toks,
        |  CASE WHEN len(toks) <= 0 THEN 0 ELSE
        |    CAST(ceil(CAST(greatest(len(toks) - 64, 0) AS DOUBLE) / 48)
        |      AS INT) + 1 END AS nc FROM t),
        |u AS (SELECT doc_id, toks,
        |  unnest(range(0, CAST(nc AS BIGINT))) AS i FROM c WHERE nc > 0)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  array_to_string(list_slice(toks,
        |    CAST(i * 48 + 1 AS INT), CAST(i * 48 + 64 AS INT)), ' ')
        |    AS chunk_text,
        |  CAST(least(64, len(toks) - i * 48) AS BIGINT) AS n_chunk_tokens
        |FROM u ORDER BY doc_id, chunk_idx""".stripMargin,
    "q65_dsir_importance" ->
      """WITH t AS (SELECT doc_id, (lang = 'en') AS tgt,
        |  list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0) AS toks FROM documents),
        |f AS (SELECT doc_id, tgt,
        |  CAST('0x' || substr(md5(s[1] || ' ' || s[2]), 1, 15) AS BIGINT)
        |    % 4096 AS b
        |  FROM (SELECT doc_id, tgt,
        |      unnest(list_zip(list_slice(toks, 1, len(toks) - 1),
        |        list_slice(toks, 2, len(toks)))) AS s
        |    FROM t) z),
        |c AS (SELECT b, count(*) AS sc,
        |  CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS tc
        |  FROM f GROUP BY b),
        |tot AS (SELECT CAST(sum(sc) AS BIGINT) AS st,
        |  CAST(sum(tc) AS BIGINT) AS tt FROM c),
        |w AS (SELECT b,
        |  CAST(round((ln(CAST(tc + 1 AS DOUBLE) / (tt + 4096)) -
        |    ln(CAST(sc + 1 AS DOUBLE) / (st + 4096))) * 1000000)
        |    AS BIGINT) AS w
        |  FROM c CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_feats,
        |  CAST(sum(w) AS BIGINT) AS micro_importance
        |FROM f JOIN w USING (b)
        |WHERE doc_id < 200
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q60_unigram_lm" ->
      """WITH toks AS (SELECT doc_id,
        |  unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS tok FROM documents),
        |vocab AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM vocab)
        |SELECT doc_id, count(*) AS n_toks,
        |  CAST(sum(CAST(round(ln(CAST(tf AS DOUBLE) / n_total) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS micro_logprob_sum
        |FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        |WHERE doc_id < 200
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q59_token_entropy" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  CASE WHEN len(toks) > 0 THEN round(0.0 - list_sum(
        |    list_transform(list_sort(list_distinct(toks)),
        |      w -> (CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE)
        |        / len(toks)) *
        |        (ln(CAST(len(list_filter(toks, x -> x = w)) AS DOUBLE)
        |          / len(toks)) / ln(2.0)))), 4)
        |  ELSE 0.0 END AS h
        |FROM t ORDER BY doc_id""".stripMargin,
    "q57_sequence_packing" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0)) AS n FROM documents),
        |sh AS (SELECT doc_id, n,
        |  (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |    AS BIGINT) % 10000) % 8 AS shard FROM t),
        |w AS (SELECT shard, n,
        |  CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id)
        |    AS BIGINT) AS running FROM sh)
        |SELECT shard, count(*) AS n_docs,
        |  count(DISTINCT CAST(floor((running - n) / 2048) AS BIGINT))
        |    AS n_bins,
        |  CAST(sum(n) AS BIGINT) AS toks
        |FROM w GROUP BY shard ORDER BY shard""".stripMargin,
    "q55_stratified_sample" ->
      """WITH s AS (SELECT doc_id, lang,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |    AS BIGINT) % 10000 AS b
        |  FROM documents)
        |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s WHERE b < CASE lang WHEN 'en' THEN 5000
        |  WHEN 'de' THEN 2500 ELSE 1000 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q56_curation_pipeline" ->
      """WITH t AS (SELECT doc_id, text,
        |  list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)
        |    AS toks FROM documents),
        |m AS (SELECT doc_id, text,
        |  least(CAST(len(toks) AS DOUBLE) / 100, CAST(1 AS DOUBLE))
        |    AS len_score,
        |  CASE WHEN length(text) > 0 THEN
        |    CAST(length(text) -
        |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
        |      / length(text) ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
        |  CASE WHEN len(toks) > 0 THEN
        |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
        |      / len(toks) ELSE CAST(0 AS DOUBLE) END AS mean_len
        |  FROM t),
        |qs AS (SELECT doc_id, text, round(CAST(len_score * 0.4 +
        |  (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE))) * 0.3 +
        |  (CASE WHEN mean_len BETWEEN 3.0 AND 10.0
        |    THEN CAST(1 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * 0.3
        |  AS DOUBLE), 4) AS q FROM m),
        |f AS (SELECT * FROM qs WHERE q >= 0.5),
        |dd AS (SELECT doc_id, q, row_number() OVER (
        |  PARTITION BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |  ORDER BY doc_id) AS rn FROM f),
        |sp AS (SELECT doc_id, q,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 10 THEN 'test'
        |    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 20 THEN 'val'
        |    ELSE 'train' END AS split
        |  FROM dd WHERE rn = 1)
        |SELECT split, count(*) AS n, round(avg(q), 4) AS avg_q
        |FROM sp GROUP BY split ORDER BY split""".stripMargin,
    "q53_hash_split" ->
      """WITH s AS (SELECT doc_id,
        |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 10 THEN 'test'
        |    WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
        |      AS BIGINT) % 100 < 20 THEN 'val'
        |    ELSE 'train' END AS split
        |  FROM documents)
        |SELECT split, count(*) AS n, min(doc_id) AS min_id,
        |  max(doc_id) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    "q54_doc_frequency" ->
      """WITH w AS (SELECT DISTINCT doc_id, word FROM (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS word FROM documents) u)
        |SELECT word, count(*) AS df FROM w GROUP BY word
        |HAVING count(*) >= 10 ORDER BY df DESC, word LIMIT 50""".stripMargin,
    // replays the d=3 / w=64 CMS arithmetically: same md5-60-bit cell
    // indices, counters as plain GROUP BY sums, estimate = min over
    // the 3 counters — integer-exact on both engines
    "q83_cms_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS t FROM documents),
        |rs AS (SELECT CAST(unnest(range(3)) AS INT) AS r),
        |cells AS (SELECT r, CAST('0x' || substr(
        |    md5('cms' || CAST(r AS VARCHAR) || ':' || t), 1, 15)
        |    AS BIGINT) % 64 AS cell
        |  FROM toks, rs),
        |sk AS (SELECT r, cell, count(*) AS cnt FROM cells GROUP BY r, cell),
        |ex AS (SELECT t, count(*) AS exact FROM toks GROUP BY t),
        |cand AS (SELECT t, r, CAST('0x' || substr(
        |    md5('cms' || CAST(r AS VARCHAR) || ':' || t), 1, 15)
        |    AS BIGINT) % 64 AS cell
        |  FROM (SELECT t FROM ex) c, rs),
        |est AS (SELECT t, min(cnt) AS est
        |  FROM cand JOIN sk ON sk.r = cand.r AND sk.cell = cand.cell
        |  GROUP BY t)
        |SELECT ex.t AS word, CAST(est.est AS BIGINT) AS est,
        |  CAST(ex.exact AS BIGINT) AS exact
        |FROM ex JOIN est ON est.t = ex.t
        |ORDER BY exact DESC, word LIMIT 20""".stripMargin,
    // one global running sum ordered (cnt DESC, word) — equivalent to
    // the engine's two-level band cumsum because every word in a band
    // shares the same cnt; the cutoff is exact-integer cross products
    "q84_vocab_coverage" ->
      """WITH toks AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS word FROM documents),
        |c AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word),
        |cum AS (SELECT word, cnt,
        |  CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_cnt,
        |  CAST(sum(cnt) OVER () AS BIGINT) AS total FROM c)
        |SELECT word, CAST(cnt AS BIGINT) AS cnt, cum_cnt,
        |  (cum_cnt * 100 <= total * 95) AS in_vocab
        |FROM cum ORDER BY cnt DESC, word""".stripMargin,
    // replays m=64 HLL registers exactly: same md5-60-bit hash,
    // bucket = low 6 bits, rho = 55 - msb-length of the remaining
    // 54-bit word (bin() renders without leading zeros on both
    // engines); untouched buckets surface as register 0 via the spine
    "q86_hll_registers" ->
      """WITH toks AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS t FROM documents),
        |h AS (SELECT CAST('0x' || substr(md5('hll:' || t), 1, 15)
        |    AS BIGINT) AS h FROM toks),
        |r AS (SELECT h & 63 AS bucket,
        |  CASE WHEN (h >> 6) = 0 THEN 55
        |    ELSE 55 - CAST(length(bin(h >> 6)) AS INT) END AS rho
        |  FROM h),
        |regs AS (SELECT bucket, max(rho) AS register FROM r
        |  GROUP BY bucket),
        |spine AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS bucket)
        |SELECT spine.bucket,
        |  CAST(coalesce(register, 0) AS INT) AS register
        |FROM spine LEFT JOIN regs USING (bucket)
        |ORDER BY bucket""".stripMargin,
    // replays the k=3 / m=2^17 bloom bit-for-bit: benchmark grams set
    // bits, each distinct training gram checks ALL its distinct bit
    // positions against the set; the 0.5 cutoff is exact-integer
    "q87_bloom_decontaminate" ->
      """WITH norm AS (SELECT doc_id,
        |  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |bg AS (SELECT DISTINCT g FROM (SELECT
        |  unnest(list_transform(range(1, greatest(length(t) - 7, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 8))) AS g FROM norm
        |  WHERE doc_id < 5) u),
        |rs AS (SELECT CAST(unnest(range(3)) AS INT) AS r),
        |bits AS (SELECT DISTINCT CAST('0x' || substr(
        |    md5('bf' || CAST(r AS VARCHAR) || ':' || g), 1, 15)
        |    AS BIGINT) % 131072 AS bit FROM bg, rs),
        |tg AS (SELECT DISTINCT doc_id AS train_id, g FROM (SELECT doc_id,
        |  unnest(list_transform(range(1, greatest(length(t) - 7, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 8))) AS g FROM norm
        |  WHERE doc_id >= 100 AND doc_id < 300) u),
        |pgb AS (SELECT DISTINCT g, CAST('0x' || substr(
        |    md5('bf' || CAST(r AS VARCHAR) || ':' || g), 1, 15)
        |    AS BIGINT) % 131072 AS bit
        |  FROM (SELECT DISTINCT g FROM tg) pg, rs),
        |v AS (SELECT g, (count(b.bit) = count(*)) AS maybe
        |  FROM pgb LEFT JOIN bits b ON pgb.bit = b.bit GROUP BY g),
        |per AS (SELECT train_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_maybe
        |  FROM tg JOIN v USING (g) GROUP BY train_id)
        |SELECT train_id, n_grams, n_maybe,
        |  (n_maybe * 2 >= n_grams) AS flagged
        |FROM per ORDER BY train_id""".stripMargin,
    // replays the 32 multiply-add permutations mod 2^31-1 with the
    // SAME (a, b) literals the engine derives (interpolated below),
    // plus the exact gram-set Jaccard for the accuracy column
    "q88_corpus_minhash" -> {
      val perms = graft.operators.Dedup.permParams(32).zipWithIndex
        .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")
      raw"""WITH norm AS (SELECT lang,
         |  lower(regexp_replace(text, '\s+', ' ', 'g')) AS t
         |  FROM documents),
         |g AS (SELECT DISTINCT lang, g FROM (SELECT lang,
         |  unnest(list_transform(range(1, greatest(length(t) - 3, 1) + 1),
         |    i -> substr(t, CAST(i AS INT), 4))) AS g FROM norm) u),
         |base AS (SELECT lang, CAST('0x' || substr(md5(g), 1, 15)
         |    AS BIGINT) % 2147483647 AS h FROM g),
         |perms(i, a, b) AS (VALUES $perms),
         |sig AS (SELECT lang, i, min((a * h + b) % 2147483647) AS v
         |  FROM base, perms GROUP BY lang, i),
         |m AS (SELECT s1.lang AS lang_a, s2.lang AS lang_b,
         |  CAST(sum(CASE WHEN s1.v = s2.v THEN 1 ELSE 0 END) AS BIGINT)
         |    AS matches
         |  FROM sig s1 JOIN sig s2 ON s1.i = s2.i AND s1.lang < s2.lang
         |  GROUP BY 1, 2),
         |sz AS (SELECT lang, count(*) AS n FROM g GROUP BY lang),
         |it AS (SELECT g1.lang AS lang_a, g2.lang AS lang_b,
         |  count(*) AS i FROM g g1 JOIN g g2
         |  ON g1.g = g2.g AND g1.lang < g2.lang GROUP BY 1, 2)
         |SELECT m.lang_a, m.lang_b, matches,
         |  round(CAST(matches AS DOUBLE) / 32, 4) AS est_sim,
         |  round(CAST(it.i AS DOUBLE) / (sa.n + sb.n - it.i), 4)
         |    AS exact_sim
         |FROM m JOIN it ON it.lang_a = m.lang_a AND it.lang_b = m.lang_b
         |JOIN sz sa ON sa.lang = m.lang_a
         |JOIN sz sb ON sb.lang = m.lang_b
         |ORDER BY m.lang_a, m.lang_b""".stripMargin
    },
    // replays the log2 bins (bin() length), the per-lang running
    // count, and the integer rank compare; lo/hi from bit shifts
    "q89_loghist_quantiles" ->
      """WITH b AS (SELECT lang, CASE WHEN n_chars <= 0 THEN 0
        |    ELSE CAST(length(bin(CAST(n_chars AS BIGINT))) AS INT)
        |    END AS bin FROM documents),
        |sk AS (SELECT lang, bin, count(*) AS cnt FROM b
        |  GROUP BY lang, bin),
        |c AS (SELECT lang, bin, cnt,
        |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS total
        |  FROM sk),
        |ps AS (SELECT CAST(unnest([50, 95, 99]) AS INT) AS p),
        |q AS (SELECT lang, p, min(bin) AS bin FROM c, ps
        |  WHERE cum * 100 >= p * total GROUP BY lang, p)
        |SELECT lang, p, bin,
        |  CASE WHEN bin = 0 THEN CAST(0 AS BIGINT)
        |    ELSE (CAST(1 AS BIGINT) << (bin - 1)) END AS lo,
        |  (CAST(1 AS BIGINT) << bin) - 1 AS hi
        |FROM q ORDER BY lang, p""".stripMargin,
    // the (n DESC, doc_id) window order mirrors TopKAgg's
    // (score DESC, id ASC) tie-break exactly
    "q90_grouped_topk" ->
      """WITH t AS (SELECT lang, doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0)) AS BIGINT) AS n_tokens FROM documents),
        |r AS (SELECT lang, doc_id, n_tokens, CAST(row_number() OVER
        |  (PARTITION BY lang ORDER BY n_tokens DESC, doc_id) AS INT)
        |  AS rank FROM t)
        |SELECT lang, rank, doc_id, n_tokens FROM r WHERE rank <= 5
        |ORDER BY lang, rank""".stripMargin,
    // BM25 with the Lucene +1 IDF at k1=1.2, b=0.75 — the arithmetic
    // mirrors TextAnalysis.bm25 term for term; round-4 absorbs the
    // ln() ulp difference between engines
    "q82_bm25" -> bm25Oracle(""),
    // identical postings served from the persisted inverted index —
    // q82's oracle verbatim (q200 composes them by append+compact)
    "q199_bm25_persisted" -> bm25Oracle(""),
    // the SQL-served view scores the same terms over the same index
    "q215_bm25_sql" -> bm25Oracle(""),
    "q200_bm25_appended" -> bm25Oracle(""),
    // delete+purge leaves the even-doc index: the oracle recomputes
    // BM25 over the survivor corpus (N, avgdl, df shift with it)
    "q201_bm25_deleted" -> bm25Oracle("WHERE doc_id % 2 = 0"),
    // the workload batch: same BM25 algebra, fanned out to qids by a
    // term join and aggregated per (qid, doc)
    "q203_bm25_batch" ->
      s"""WITH qt AS (SELECT * FROM (VALUES
         |  (0, 'spark'), (0, 'join'), (0, 'window'),
         |  (1, 'hash'), (1, 'merge'),
         |  (2, 'vector'), (2, 'stream'), (2, 'scan')) v(qid, t)),
         |base AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0) AS toks FROM documents),
         |stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl
         |  FROM base),
         |tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS t
         |  FROM base),
         |tf AS (SELECT doc_id, dl, t, count(*) AS tf FROM tok
         |  WHERE t IN (SELECT t FROM qt) GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*) AS dfc FROM tf GROUP BY t)
         |SELECT qt.qid, tf.doc_id,
         |  round(sum(ln((n - dfc + 0.5) / (dfc + 0.5) + 1) * (tf * (1.2 + 1))
         |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
         |FROM tf JOIN dfr USING (t) JOIN qt USING (t), stats
         |GROUP BY qt.qid, tf.doc_id ORDER BY qid, doc_id""".stripMargin,
    "q52_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0) AS toks
        |  FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, toks,
        |  list_transform(range(1, len(toks)),
        |    i -> toks[i] || ' ' || toks[i+1]) AS bi,
        |  list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS tri
        |  FROM t)
        |SELECT doc_id,
        |  CASE WHEN len(toks) > 0 THEN round(CAST(list_max(
        |    list_transform(list_distinct(toks),
        |      w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
        |    / len(toks), 4) ELSE 0.0 END AS top_word_frac,
        |  CASE WHEN len(bi) > 0 THEN round(
        |    CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / len(bi), 4)
        |    ELSE 0.0 END AS dup_bigram_frac,
        |  CASE WHEN len(tri) > 0 THEN round(
        |    CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE) / len(tri), 4)
        |    ELSE 0.0 END AS dup_trigram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "q51_pii_redact" ->
      """WITH synth AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@example.com from 10.0.'
        |    || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    || ' call +1 555 01'
        |    || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS raw
        |  FROM documents WHERE doc_id < 200),
        |r1 AS (SELECT doc_id,
        |  regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |    '[EMAIL]', 'g') AS t1,
        |  CAST(len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email FROM synth),
        |r2 AS (SELECT doc_id, n_email,
        |  regexp_replace(t1, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b',
        |    '[SSN]', 'g') AS t2,
        |  CAST(len(regexp_extract_all(t1,
        |    '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS BIGINT) AS n_ssn FROM r1),
        |r3 AS (SELECT doc_id, n_email, n_ssn,
        |  regexp_replace(t2, '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b',
        |    '[IP]', 'g') AS t3,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4
        |  FROM r2),
        |r4 AS (SELECT doc_id, n_email, n_ssn, n_ipv4,
        |  regexp_replace(t3, '\+?[0-9][0-9 ()-]{7,}[0-9]',
        |    '[PHONE]', 'g') AS red,
        |  CAST(len(regexp_extract_all(t3,
        |    '\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phone FROM r3)
        |SELECT doc_id, red, n_email, n_ssn, n_ipv4, n_phone
        |FROM r4 ORDER BY doc_id""".stripMargin,
    "q48_corpus_stats" ->
      """WITH t AS (SELECT len(list_filter(string_split_regex(text, '\s+'),
        |  x -> len(x) > 0)) AS n FROM documents)
        |SELECT count(*) AS docs, round(avg(n), 4) AS mean_toks,
        |  round(quantile_cont(n, 0.5), 4) AS p50,
        |  round(quantile_cont(n, 0.95), 4) AS p95,
        |  min(n) AS min_toks, max(n) AS max_toks FROM t""".stripMargin
  )
}
