package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, Similarity, TextAnalysis}

/** Round-12 retrieval/curation surface: hybrid lexical+vector rank
  * fusion, a distributed k-means (Lloyd) training step, and trigram
  * stupid-backoff LM quality scoring — the remaining first-class
  * training-data-pipeline shapes (hybrid RAG retrieval, cluster-based
  * mixture curation, LM-based quality filtering) on the q-series
  * oracle contract.
  */
object RetrievalQueries {
  import Tables._

  /** q91's probe terms (lexical arm) — q82's BM25 query. */
  private val RrfTerms = Seq("spark", "join", "window")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    /** Hybrid retrieval via reciprocal-rank fusion
      * ([[Similarity.rrfFuse]]): the lexical arm ranks documents by
      * q82's BM25 against a 3-term query; the vector arm ranks the
      * same ids by integer-exact cosine against probe embedding 0
      * (through the bounded [[Similarity.topKPerProbe]] aggregate —
      * k·partitions rows shuffle, never the corpus). Each arm keeps
      * its top 20 (both trims are total orders: score desc, id asc),
      * fusion full-outer-joins two 20-row lists — dimension-scale
      * work regardless of corpus size — and rrf = Σ 1/(60+rank).
      * The 20-row re-rank windows run on arm-sized inputs only.
      */
    "q91_hybrid_rrf" -> ((s, d) => {
      val lexOrder = Seq(desc("bm25"), col("doc_id").asc)
      val lex = TextAnalysis.bm25(documents(s, d), "doc_id", "text", RrfTerms)
        .orderBy(lexOrder: _*).limit(20)
        .withColumn("rank", row_number().over(Window.orderBy(lexOrder: _*)))
        .select("doc_id", "rank")
      val emb = embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      val probe = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("probe_id"), col("q").as("pq"))
      val scoredVec = emb.crossJoin(broadcast(probe))
        .withColumn("sim", Similarity.cosineInt(col("q"), col("pq")))
      val vec = Similarity.topKPerProbe(scoredVec, 20, "probe_id", "vec_id")
        .select(col("vec_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "doc_id")
        .withColumn("rrf", round(col("rrf"), 6))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(10)
    }),

    /** q91's hybrid fusion served ENTIRELY from persisted artifacts —
      * the end state of the index family: the lexical arm reads the
      * [[graft.operators.Bm25Index]] postings (q199's artifact,
      * fingerprint-reused), the vector arm reads the
      * [[graft.operators.AnnIndex]] IVF assignments (q181's artifact)
      * probed EXHAUSTIVELY (`nprobe` = all centroids ⇒ exact cosine
      * ranks — serving exact search from the bucketed layout), and
      * fusion is the same dimension-scale full-outer join. Neither
      * arm touches corpus text or raw embeddings, so a 100 TB serve
      * reads |terms| postings partitions + the bucket files. Exact
      * arms ⇒ q91's oracle verbatim.
      */
    "q202_hybrid_persisted" -> ((s, d) => {
      import graft.operators.{AnnIndex, Bm25Index}
      val bmIdx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bmidx-${Integer.toHexString(d.hashCode)}").toString
      Bm25Index.buildIfAbsent(documents(s, d), "text", "doc_id", bmIdx)
      val lexOrder = Seq(desc("bm25"), col("doc_id").asc)
      val lex = Bm25Index.score(s, bmIdx, RrfTerms)
        .orderBy(lexOrder: _*).limit(20)
        .withColumn("rank", row_number().over(Window.orderBy(lexOrder: _*)))
        .select("doc_id", "rank")
      val cents = SketchQueries.IvfCentroids
      val emb = embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      val annIdx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-annindex-${Integer.toHexString(d.hashCode)}").toString
      AnnIndex.buildIfAbsent(emb, "q", "vec_id", cents, annIdx)
      val probes = emb.filter(col("vec_id") === 0)
        .select(lit(0L).as("probe_id"), col("q"))
      val vec = AnnIndex.searchInt(s, annIdx, probes, "probe_id", "q",
          nprobe = cents.size, k = 20)
        .select(col("vec_id").as("doc_id"), col("rank"))
      Similarity.rrfFuse(Seq("lex" -> lex, "vec" -> vec), "doc_id")
        .withColumn("rrf", round(col("rrf"), 6))
        .orderBy(desc("rrf"), col("doc_id"))
        .limit(10)
    }),

    /** Retrieval-quality readout: NDCG@10 of the q82 BM25 ranking
      * against a graded-relevance oracle (relevance = occurrences of
      * ONE probe term, capped at 3 — a different signal than the
      * 3-term ranker, derivable by pure arithmetic on both engines,
      * so the metric grades the RANKER and can dip below 1).
      * DCG uses the standard (2^rel − 1)/log2(rank+1) gains; IDCG
      * re-ranks the same top-10 relevances descending. Scale shape:
      * the ranking trim is the q91 total-order top-10; the NDCG
      * windows run on 10 rows. Output: one row (dcg, idcg, ndcg),
      * rounded to absorb cross-engine ln ulp (the q82 rule).
      */
    "q176_ndcg" -> ((s, d) => {
      val lexOrder = Seq(desc("bm25"), col("doc_id").asc)
      val ranked = TextAnalysis.bm25(documents(s, d), "doc_id", "text",
          RrfTerms)
        .orderBy(lexOrder: _*).limit(10)
        .withColumn("rank", row_number().over(Window.orderBy(lexOrder: _*)))
        .select("doc_id", "rank")
      // graded by a DIFFERENT signal than the ranker ('window' hits
      // only) so the metric can actually dip below 1
      val rel = documents(s, d)
        .select(col("doc_id"),
          least(size(filter(split(lower(col("text")), "\\s+"),
            t => t === "window")), lit(3)).as("rel"))
      val gains = ranked.join(rel, "doc_id")
        .withColumn("gain",
          (pow(lit(2.0), col("rel")) - 1.0) /
            log(2.0, col("rank") + 1))
      val idealRank = row_number().over(
        Window.orderBy(desc("rel"), col("rank")))
      val withIdeal = gains
        .withColumn("irank", idealRank)
        .withColumn("igain",
          (pow(lit(2.0), col("rel")) - 1.0) /
            log(2.0, col("irank") + 1))
      withIdeal.agg(
        round(sum("gain"), 4).as("dcg"),
        round(sum("igain"), 4).as("idcg"),
        round(sum("gain") / sum("igain"), 4).as("ndcg"))
    }),

    /** MMR diversity re-rank ([[Similarity.mmrRerank]]): the greedy
      * λ·rel − (1−λ)·max-sim selection over the top-12 cosine
      * candidates of probe 0 — the post-fusion diversity pass. All
      * cosines round to 6 dp before any argmax (cross-engine sqrt
      * ulp can't flip a pick); the oracle replays the k=5 greedy as
      * five unrolled CTE rounds with the same tie-breaks.
      */
    "q177_mmr_rerank" -> ((s, d) => {
      val emb = embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      val probe = emb.filter(col("vec_id") === 0)
        .select(col("q").as("pq"))
      val cand = emb.crossJoin(broadcast(probe))
        .withColumn("rel",
          round(Similarity.cosineInt(col("q"), col("pq")), 6))
        .orderBy(desc("rel"), col("vec_id")).limit(12)
      Similarity.mmrRerank(cand, "vec_id", "rel", "q",
          k = 5, lambdaTenths = 7)
        .orderBy("pos")
    }),

    /** Distributed k-means step ([[Ivf.lloydStepInt]]): one full-
      * corpus Lloyd iteration from the q46 fixed centroids — argmin
      * assignment as a codegen'd scan, per-cluster element sums as a
      * map-side-combined (cluster, dim) aggregate, only the k×dim
      * summary collected; integer floor-div means keep both engines
      * bit-identical. Output per cluster: population before/after the
      * update and the updated centroid's dim-0 component — the
      * convergence signal a training loop watches.
      */
    "q92_kmeans_step" -> ((s, d) => {
      import s.implicits._
      val emb = embeddings(s, d)
        .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      val next = Ivf.lloydStepInt(emb, "q", SketchQueries.IvfCentroids)
      val n0 = emb.select(Ivf.assignInt(col("q"), SketchQueries.IvfCentroids)
          .as("c")).groupBy("c").agg(count(lit(1)).as("n0"))
      val n1 = emb.select(Ivf.assignInt(col("q"), next).as("c"))
        .groupBy("c").agg(count(lit(1)).as("n1"))
      val spine = next.zipWithIndex
        .map { case (cv, c) => (c, cv.head) }.toDF("c", "c00")
      spine.join(n0, Seq("c"), "left").join(n1, Seq("c"), "left")
        .select(col("c").cast("long").as("c"),
          coalesce(col("n0"), lit(0L)).as("n0"),
          coalesce(col("n1"), lit(0L)).as("n1"), col("c00"))
        .orderBy("c")
    }),

    /** LM quality filtering ([[TextAnalysis.stupidBackoff]]): trigram
      * stupid-backoff scores for the first 200 documents under counts
      * trained on the even-doc_id half of the corpus — so unseen
      * trigrams genuinely exercise the α-backoff chain. Count tables
      * are n-gram hash aggregates; scoring is LEFT equi-joins on the
      * exploded trigram stream (shuffle-safe at any scale).
      */
    "q93_trigram_lm" -> ((s, d) => {
      val docs = documents(s, d)
      TextAnalysis.stupidBackoff(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") < 200), "doc_id", "text")
        .orderBy("doc_id")
    }),

    /** The q93 LM as a PERSISTED artifact ([[graft.operators.LmIndex]]):
      * the three n-gram count tables are paid once to disk and every
      * scoring run reads them — at 100 TB the count pass dwarfs any
      * single scoring job, and it re-runs per query in the q93 shape.
      * Identical counts ⇒ identical scores ⇒ q93's oracle verbatim.
      */
    "q196_lm_persisted" -> ((s, d) => {
      import graft.operators.LmIndex
      val docs = documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-lmidx-${Integer.toHexString(d.hashCode)}").toString
      LmIndex.buildIfAbsent(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", idx)
      LmIndex.score(s, idx, docs.filter(col("doc_id") < 200),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    /** PURE-SQL serve of the q196 LM artifact through the registered
      * `lmindex` source ([[graft.sources.LmIndexSource]]): the docs
      * to score are a SQL view, the scoring view is parameterized
      * over it, and the serve rides [[LmIndex.scoreBatch]] — each
      * count-table read pruned to the batch's own gram buckets, the
      * token total from the manifest. Scores equal [[LmIndex.score]]
      * exactly, so q93/q196's oracle verbatim.
      */
    "q218_lm_sql" -> ((s, d) => {
      import graft.operators.LmIndex
      val docs = documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-lmidx-${Integer.toHexString(d.hashCode)}").toString
      LmIndex.buildIfAbsent(docs.filter(col("doc_id") % 2 === 0),
        "text", "doc_id", idx)
      docs.filter(col("doc_id") < 200)
        .createOrReplaceTempView("graft_q218_docs")
      s.sql("CREATE OR REPLACE TEMPORARY VIEW graft_q218_scored " +
        s"USING lmindex OPTIONS (path '$idx', " +
        "docsView 'graft_q218_docs')")
      s.sql("SELECT * FROM graft_q218_scored ORDER BY doc_id")
    }),

    // n-gram counts are PURE SUMS, so the LM artifact extends by
    // O(delta) count appends: train on doc_id%4==0, append %4==2 —
    // the union is q93's even-doc train set, so counts, scores, and
    // oracle are identical to the one-shot artifact.
    "q197_lm_appended" -> ((s, d) => {
      import graft.operators.LmIndex
      val docs = documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-lminc-${Integer.toHexString(d.hashCode)}").toString
      LmIndex.buildIfAbsent(docs.filter(col("doc_id") % 4 === 0),
        "text", "doc_id", idx)
      LmIndex.append(docs.filter(col("doc_id") % 4 === 2), idx)
      LmIndex.compactDeltas(s, idx)
      LmIndex.score(s, idx, docs.filter(col("doc_id") < 200),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ...and shrinks the same way: a delete stages the NEGATED counts
    // of the removed docs (takedown/unlearning on LM state — no
    // retrain). Train on everything, delete the odd docs: what
    // remains is q93's even-doc LM, same oracle. The rebuild-on-
    // mismatch rule makes the delete exactly-once per invocation.
    "q198_lm_deleted" -> ((s, d) => {
      import graft.operators.LmIndex
      val docs = documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-lmdel-${Integer.toHexString(d.hashCode)}").toString
      LmIndex.buildIfAbsent(docs, "text", "doc_id", idx)
      LmIndex.delete(docs.filter(col("doc_id") % 2 === 1), idx)
      LmIndex.score(s, idx, docs.filter(col("doc_id") < 200),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    /** Tokenizer training ([[TextAnalysis.bpeMerges]]): the first 3
      * BPE merges of the doc_id<100 corpus, learned distributed —
      * word-frequency working set, pair-explode + weighted count +
      * TakeOrdered-1 argmax per round, leftmost-non-overlapping fold
      * applying each merge; only the 1-row argmax collects per round.
      * The oracle replays all three rounds with the same
      * (count desc, pair asc) tie-break via list_reduce folds.
      */
    "q95_bpe_merges" -> ((s, d) => {
      import s.implicits._
      TextAnalysis.bpeMerges(
          documents(s, d).filter(col("doc_id") < 100), "text", 3)
        .zipWithIndex
        .map { case ((l, r, c), i) => (i.toLong, l, r, c) }
        .toDF("merge_idx", "left_sym", "right_sym", "pair_count")
        .orderBy("merge_idx")
    }),

    /** Tokenizer APPLICATION ([[TextAnalysis.bpeEncodeStats]]): the
      * other half of the q95 loop — train 3 merges on the doc_id<100
      * corpus, then encode the UNSEEN doc_id∈[100,150) slice and
      * report per-doc word/char/token counts and the chars-per-token
      * compression ratio (the number that feeds sequence packing and
      * token budgeting). Training is q95's bounded vocabulary-scale
      * loop; encoding is one codegen'd projection per row — the merge
      * table rides the expression as literals, so the pass is a pure
      * map over the corpus with no join, explode, or shuffle. The
      * oracle re-learns the same merges and replays the same
      * leftmost-non-overlapping fold per word via list_reduce.
      */
    "q98_bpe_encode" -> ((s, d) => {
      val docs = documents(s, d)
      val merges = TextAnalysis.bpeMerges(
          docs.filter(col("doc_id") < 100), "text", 3)
        .map { case (l, r, _) => (l, r) }
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
        .select(col("doc_id"),
          TextAnalysis.bpeEncodeStats(col("text"), merges).as("e"))
        .select(col("doc_id"), col("e.n_words").as("n_words"),
          col("e.n_chars").as("n_chars"), col("e.n_tokens").as("n_tokens"),
          when(col("e.n_tokens") > 0, round(
            col("e.n_chars").cast("double") / col("e.n_tokens"), 4))
            .as("ratio"))
        .orderBy("doc_id")
    }),

    /** q98 through a PERSISTED tokenizer
      * ([[graft.operators.BpeIndex]]): the merge table is trained
      * once into the artifact (fingerprint + merge-budget reuse — a
      * later call never re-trains) and the encode pass rides the
      * stored merges as expression literals. Same math, same oracle.
      */
    "q210_bpe_persisted" -> ((s, d) => {
      import graft.operators.BpeIndex
      val docs = documents(s, d)
      val idx = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s"graft-bpeidx-${Integer.toHexString(d.hashCode)}").toString
      BpeIndex.buildIfAbsent(docs.filter(col("doc_id") < 100), "text",
        "doc_id", nMerges = 3, idx)
      BpeIndex.encodeStats(s, idx,
          docs.filter(col("doc_id") >= 100 && col("doc_id") < 150),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    /** CCNet-style quality mixture ([[TextAnalysis.perplexityBuckets]]
      * over [[TextAnalysis.stupidBackoff]]): score the whole corpus
      * under the even-doc_id LM, split each language into head /
      * middle / tail thirds by score, and report per-(lang, bucket)
      * doc counts and mean score — the table a curation run reads to
      * decide sampling weights. Bucket cutoffs come from the bounded
      * per-language bin histogram (no doc-level sort); the mean rides
      * exact `round(score·10⁴)` longs so the cross-engine double
      * average has one deterministic summation order (one division at
      * the end), the q22 scaled-long rationale.
      */
    "q99_ccnet_buckets" -> ((s, d) => {
      val docs = documents(s, d)
      val scored = TextAnalysis.stupidBackoff(
          docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
        .filter(col("score").isNotNull)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      TextAnalysis.perplexityBuckets(scored, "lang", "score")
        .withColumn("__si", round(col("score") * 10000).cast("long"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"), sum("__si").as("__s"))
        .select(col("lang"), col("bucket"), col("n_docs"),
          round(col("__s").cast("double") / 10000 / col("n_docs"), 4)
            .as("mean_score"))
        .orderBy("lang", "bucket")
    }),

    /** Curation-signal calibration: per-language Pearson correlation
      * between the cheap composite quality score (q49) and the
      * expensive LM score (q93) — the table that says whether the
      * fast filter agrees with the model-based one before you spend
      * the LM pass on the whole corpus. Both signals are 4dp by
      * construction, so they ride exact `round(s·10⁴)` longs and all
      * five Pearson sums are map-side-combined integer aggregates
      * (sums < 2^53 here, so the one closing double expression is
      * bit-identical cross-engine; at petabyte doc counts the sums
      * promote to DECIMAL(38,0) — same plan shape). One corpus join,
      * one hash aggregate, no window.
      */
    "q102_signal_correlation" -> ((s, d) => {
      val docs = documents(s, d)
      val q = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("__q"))
      val lm = TextAnalysis.stupidBackoff(
          docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
        .filter(col("score").isNotNull)
      val j = q.join(lm.select(col("doc_id"), col("score")), Seq("doc_id"))
        .select(col("lang"),
          round(col("__q") * 10000).cast("long").as("__x"),
          round(col("score") * 10000).cast("long").as("__y"))
      val g = j.groupBy("lang").agg(count(lit(1)).as("n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"),
        sum(col("__x") * col("__y")).as("__sxy"))
      val varX = g("n") * col("__sxx") - col("__sx") * col("__sx")
      val varY = g("n") * col("__syy") - col("__sy") * col("__sy")
      val cov = g("n") * col("__sxy") - col("__sx") * col("__sy")
      g.select(col("lang"), col("n"),
          when(varX > 0 && varY > 0,
            round(cov.cast("double") /
              (sqrt(varX.cast("double")) * sqrt(varY.cast("double"))), 4))
            .as("pearson_r"))
        .orderBy("lang")
    }))

  /** q95 oracle building blocks: one BPE round — pair counts off the
    * previous symbol table, 1-row argmax, fold the merge through
    * every word (list-of-singletons trick keeps list_reduce's
    * accumulator list-typed).
    */
  private def bpeRound(prev: String, i: Int): String =
    s"""p$i AS (SELECT u.pr.l AS l, u.pr.r AS r,
       |  CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
       |      j -> {'l': syms[j], 'r': syms[j+1]})) AS pr FROM $prev) u
       |  GROUP BY 1, 2),
       |m$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
       |s$i AS (SELECT cnt, list_reduce(
       |    list_transform(syms, x -> [x]),
       |    (acc, x) -> CASE WHEN acc[-1] = m$i.l AND x[1] = m$i.r
       |      THEN list_append(acc[1:len(acc)-1], m$i.l || m$i.r)
       |      ELSE list_concat(acc, x) END) AS syms
       |  FROM $prev, m$i)""".stripMargin

  /** q93/q196/q197/q198 share this: the stupid-backoff count and
    * scoring algebra replayed in SQL — the persisted-artifact
    * variants change only WHERE the counts are read from (and how
    * they were composed: one-shot, appended, or delete-negated), so
    * the scores are identical by the count-sum algebra.
    */
  /** q91/q202 share this: BM25 lexical arm + exact-cosine vector arm
    * + reciprocal-rank fusion replayed in SQL — q202 changes only
    * where the arms READ from (persisted postings / exhaustively
    * probed IVF buckets), not what they rank.
    */
  private lazy val hybridRrfOracle: String = {
    val cos = SketchQueries.duckCosineInt("c.q", "p.pq")
    s"""WITH base AS (SELECT doc_id,
       |  list_filter(string_split_regex(lower(text), '\\s+'),
       |    x -> len(x) > 0) AS toks FROM documents),
       |b2 AS (SELECT doc_id, len(toks) AS dl,
       |  list_filter(toks,
       |    t -> t IN ('spark', 'join', 'window')) AS q FROM base),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM b2),
       |tf AS (SELECT doc_id, dl, t, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(q) AS t FROM b2) u
       |  GROUP BY doc_id, dl, t),
       |dfr AS (SELECT t, count(*) AS dfc FROM tf GROUP BY t),
       |bm AS (SELECT tf.doc_id,
       |  round(sum(ln((n - dfc + 0.5) / (dfc + 0.5) + 1) * (tf * (1.2 + 1))
       |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
       |  FROM tf JOIN dfr USING (t), stats GROUP BY tf.doc_id),
       |lex AS (SELECT doc_id, rank_lex FROM (SELECT doc_id,
       |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
       |  FROM bm) WHERE rank_lex <= 20),
       |qv AS (SELECT vec_id, list_transform(embedding,
       |  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |p AS (SELECT q AS pq FROM qv WHERE vec_id = 0),
       |sc AS (SELECT c.vec_id AS doc_id, $cos AS sim FROM qv c, p),
       |vec AS (SELECT doc_id, rank_vec FROM (SELECT doc_id,
       |  row_number() OVER (ORDER BY sim DESC, doc_id) AS rank_vec
       |  FROM sc) WHERE rank_vec <= 20)
       |SELECT doc_id, rank_lex, rank_vec,
       |  round(coalesce(1.0 / (60 + rank_lex), 0)
       |      + coalesce(1.0 / (60 + rank_vec), 0), 6) AS rrf
       |FROM lex FULL OUTER JOIN vec USING (doc_id)
       |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
  }

  private lazy val trigramLmOracle: String =
    s"""WITH tr AS (${duckToks("WHERE doc_id % 2 = 0")}),
         |uni AS (SELECT w, count(*) AS cu
         |  FROM (SELECT unnest(a) AS w FROM tr) GROUP BY w),
         |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n
         |  FROM (SELECT unnest(a) AS w FROM tr)),
         |bi AS (SELECT b, count(*) AS cb
         |  FROM (SELECT unnest(list_transform(range(1, len(a)),
         |    i -> a[i] || ' ' || a[i+1])) AS b FROM tr) GROUP BY b),
         |tri AS (SELECT t, count(*) AS ct
         |  FROM (SELECT unnest(list_transform(range(1, len(a) - 1),
         |    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS t FROM tr)
         |  GROUP BY t),
         |d AS (${duckToks("WHERE doc_id < 200")}),
         |g AS (SELECT doc_id, a[r.i] AS w1, a[r.i+1] AS w2, a[r.i+2] AS w3
         |  FROM d CROSS JOIN unnest(range(1, len(a) - 1)) r(i)),
         |j AS (SELECT doc_id, w2, w3, w1 || ' ' || w2 AS bp,
         |  w2 || ' ' || w3 AS bs, w1 || ' ' || w2 || ' ' || w3 AS t3 FROM g),
         |sc AS (SELECT doc_id,
         |  CASE WHEN ct IS NOT NULL THEN CAST(ct AS DOUBLE) / cbp
         |       WHEN cbs IS NOT NULL THEN 0.4 * CAST(cbs AS DOUBLE) / cu2
         |       WHEN cu3 IS NOT NULL THEN 0.4 * 0.4 * CAST(cu3 AS DOUBLE) / n
         |       ELSE 0.4 * 0.4 / n END AS p
         |  FROM j LEFT JOIN tri ON j.t3 = tri.t
         |  LEFT JOIN (SELECT b AS bp, cb AS cbp FROM bi) b1 USING (bp)
         |  LEFT JOIN (SELECT b AS bs, cb AS cbs FROM bi) b2 USING (bs)
         |  LEFT JOIN (SELECT w AS w2, cu AS cu2 FROM uni) u2 USING (w2)
         |  LEFT JOIN (SELECT w AS w3, cu AS cu3 FROM uni) u3 USING (w3), nt),
         |agg AS (SELECT doc_id, count(*) AS n_tri,
         |  round(avg(ln(p)), 4) AS score FROM sc GROUP BY doc_id)
         |SELECT d0.doc_id, coalesce(n_tri, 0) AS n_tri, score
         |FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d0
         |LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  private def duckToks(src: String): String =
    s"""SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |  x -> len(x) > 0) AS a FROM documents $src""".stripMargin

  /** q98 oracle building block: apply merge CTE `m` (one row: l, r)
    * to a per-word symbol list — the same leftmost-non-overlapping
    * list_reduce fold [[bpeRound]] uses, minus the re-count.
    */
  private def encFold(m: String): String =
    s"""list_reduce(list_transform(syms, x -> [x]),
       |    (acc, x) -> CASE WHEN acc[-1] = $m.l AND x[1] = $m.r
       |      THEN list_append(acc[1:len(acc)-1], $m.l || $m.r)
       |      ELSE list_concat(acc, x) END)""".stripMargin

  /** One unrolled MMR round: max-sim of each unselected candidate to
    * the selection so far, then the argmax of 7·rel − 3·ms.
    */
  private def mmrRound(i: Int): String = {
    val cos = SketchQueries.duckCosineInt("c.q", "s.q")
    s"""ms$i AS (SELECT c.vec_id, max(round($cos, 6)) AS ms
       |  FROM cand c JOIN cand s
       |    ON s.vec_id IN (SELECT vec_id FROM sel${i - 1})
       |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
       |  GROUP BY c.vec_id),
       |s$i AS (SELECT c.vec_id FROM cand c JOIN ms$i m
       |    ON c.vec_id = m.vec_id
       |  ORDER BY 7 * c.rel - 3 * m.ms DESC, c.vec_id LIMIT 1),
       |sel$i AS (SELECT vec_id FROM sel${i - 1}
       |  UNION ALL SELECT vec_id FROM s$i)""".stripMargin
  }

  /** q98/q210 oracle: q95's three training rounds re-learned
    * verbatim, then the same leftmost fold applied per word of the
    * unseen docs; counts per doc.
    */
  private lazy val bpeEncodeOracle: String =
    s"""WITH w AS (SELECT t AS word, count(*) AS cnt
       |  FROM (SELECT unnest(list_filter(
       |      string_split_regex(lower(text), '\\s+'),
       |      x -> len(x) > 0)) AS t FROM documents WHERE doc_id < 100)
       |  GROUP BY t),
       |s0 AS (SELECT cnt, list_transform(range(1, len(word) + 1),
       |  i -> word[i]) AS syms FROM w),
       |${bpeRound("s0", 1)},
       |${bpeRound("s1", 2)},
       |${bpeRound("s2", 3)},
       |dw AS (SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '\\s+'),
       |    x -> len(x) > 0)) AS wd
       |  FROM documents WHERE doc_id >= 100 AND doc_id < 150),
       |e0 AS (SELECT doc_id, wd, list_transform(range(1, len(wd) + 1),
       |  i -> wd[i]) AS syms FROM dw),
       |e1 AS (SELECT doc_id, wd, ${encFold("m1")} AS syms FROM e0, m1),
       |e2 AS (SELECT doc_id, wd, ${encFold("m2")} AS syms FROM e1, m2),
       |e3 AS (SELECT doc_id, wd, ${encFold("m3")} AS syms FROM e2, m3),
       |agg AS (SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(len(wd)) AS BIGINT) AS n_chars,
       |  CAST(sum(len(syms)) AS BIGINT) AS n_tokens
       |  FROM e3 GROUP BY doc_id)
       |SELECT d0.doc_id, CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_chars, 0) AS BIGINT) AS n_chars,
       |  CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CASE WHEN coalesce(n_tokens, 0) > 0 THEN
       |    round(CAST(n_chars AS DOUBLE) / n_tokens, 4) END AS ratio
       |FROM (SELECT doc_id FROM documents
       |  WHERE doc_id >= 100 AND doc_id < 150) d0
       |LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q177_mmr_rerank" -> {
      val cosP = SketchQueries.duckCosineInt("c.q", "p.pq")
      s"""WITH qv AS (SELECT vec_id, list_transform(embedding,
         |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |p AS (SELECT q AS pq FROM qv WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id, c.q, round($cosP, 6) AS rel
         |  FROM qv c, p),
         |cand AS (SELECT vec_id, q, rel FROM sc
         |  ORDER BY rel DESC, vec_id LIMIT 12),
         |s1 AS (SELECT vec_id FROM cand
         |  ORDER BY 7 * rel DESC, vec_id LIMIT 1),
         |sel1 AS (SELECT vec_id FROM s1),
         |${(2 to 5).map(mmrRound).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS pos, vec_id FROM s1
         |UNION ALL SELECT 2, vec_id FROM s2
         |UNION ALL SELECT 3, vec_id FROM s3
         |UNION ALL SELECT 4, vec_id FROM s4
         |UNION ALL SELECT 5, vec_id FROM s5
         |ORDER BY pos""".stripMargin
    },
    // the q91 BM25 lex CTE, trimmed to 10, graded by capped
    // term-occurrence relevance, closed by the standard DCG gains
    "q176_ndcg" ->
      s"""WITH base AS (SELECT doc_id,
         |  list_filter(string_split_regex(lower(text), '\\s+'),
         |    x -> len(x) > 0) AS toks FROM documents),
         |b2 AS (SELECT doc_id, len(toks) AS dl,
         |  list_filter(toks,
         |    t -> t IN ('spark', 'join', 'window')) AS q FROM base),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM b2),
         |tf AS (SELECT doc_id, dl, t, count(*) AS tf
         |  FROM (SELECT doc_id, dl, unnest(q) AS t FROM b2) u
         |  GROUP BY doc_id, dl, t),
         |dfr AS (SELECT t, count(*) AS dfc FROM tf GROUP BY t),
         |bm AS (SELECT tf.doc_id,
         |  round(sum(ln((n - dfc + 0.5) / (dfc + 0.5) + 1) * (tf * (1.2 + 1))
         |    / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
         |  FROM tf JOIN dfr USING (t), stats GROUP BY tf.doc_id),
         |lex AS (SELECT doc_id, rank FROM (SELECT doc_id,
         |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM bm) WHERE rank <= 10),
         |rel AS (SELECT doc_id, least(len(list_filter(toks,
         |  t -> t = 'window')), 3) AS rel FROM base),
         |g AS (SELECT l.doc_id, rank, rel,
         |  (pow(2, rel) - 1) / log2(rank + 1) AS gain
         |  FROM lex l JOIN rel USING (doc_id)),
         |gi AS (SELECT *, row_number() OVER (ORDER BY rel DESC, rank)
         |  AS irank FROM g),
         |g2 AS (SELECT gain,
         |  (pow(2, rel) - 1) / log2(irank + 1) AS igain FROM gi)
         |SELECT round(sum(gain), 4) AS dcg,
         |  round(sum(igain), 4) AS idcg,
         |  round(CAST(sum(gain) AS DOUBLE) / CAST(sum(igain) AS DOUBLE),
         |    4) AS ndcg FROM g2""".stripMargin,
    "q91_hybrid_rrf" -> hybridRrfOracle,
    // both arms exact from the persisted artifacts — q91's oracle
    // verbatim
    "q202_hybrid_persisted" -> hybridRrfOracle,
    "q92_kmeans_step" -> {
      val k = SketchQueries.IvfCentroids.size
      val old = SketchQueries.IvfCentroids
        .map(_.mkString("[", ",", "]")).mkString("[", ",\n", "]")
      val ds = SketchQueries.IvfCentroids.zipWithIndex.map { case (c, i) =>
        s"""{'d': CAST(list_sum(list_transform(list_zip(q, ${c.mkString("[", ",", "]")}),
           |  s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT), 'c': $i}"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH qv AS (SELECT vec_id, list_transform(embedding,
         |  x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |dist AS (SELECT vec_id, q, [
         |$ds
         |] AS dsl FROM qv),
         |a0 AS (SELECT vec_id, q, list_min(dsl).c AS c0 FROM dist),
         |el AS (SELECT c0, r.range AS p, q[r.range] AS v
         |  FROM a0 CROSS JOIN range(1, 65) r),
         |sums AS (SELECT c0 AS c, p,
         |  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |  FROM el GROUP BY c0, p),
         |spine AS (SELECT c.range AS c, p.range AS p
         |  FROM range(0, $k) c CROSS JOIN range(1, 65) p),
         |-- empty cluster keeps its previous centroid (Lloyd convention)
         |newc AS (SELECT spine.c, spine.p,
         |  coalesce(m, ($old)[spine.c + 1][spine.p]) AS m
         |  FROM spine LEFT JOIN sums ON spine.c = sums.c AND spine.p = sums.p),
         |cent AS (SELECT c, list(m ORDER BY p) AS cv FROM newc GROUP BY c),
         |d1 AS (SELECT vec_id, cent.c,
         |  CAST(list_sum(list_transform(list_zip(q, cv),
         |    s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT) AS d
         |  FROM a0 CROSS JOIN cent),
         |a1 AS (SELECT vec_id, c AS c1 FROM (SELECT vec_id, c,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
         |  FROM d1) WHERE rn = 1),
         |n0 AS (SELECT c0 AS c, count(*) AS n0 FROM a0 GROUP BY c0),
         |n1 AS (SELECT c1 AS c, count(*) AS n1 FROM a1 GROUP BY c1)
         |SELECT ks.range AS c, coalesce(n0.n0, 0) AS n0,
         |  coalesce(n1.n1, 0) AS n1,
         |  (SELECT cv[1] FROM cent WHERE cent.c = ks.range) AS c00
         |FROM range(0, $k) ks
         |LEFT JOIN n0 ON n0.c = ks.range LEFT JOIN n1 ON n1.c = ks.range
         |ORDER BY c""".stripMargin
    },
    "q93_trigram_lm" -> trigramLmOracle,
    // identical counts served from the persisted artifact — q93's
    // oracle verbatim (q197 composes them by append, q198 by delete)
    "q196_lm_persisted" -> trigramLmOracle,
    // the same artifact served through the registered SQL source
    "q218_lm_sql" -> trigramLmOracle,
    "q197_lm_appended" -> trigramLmOracle,
    "q198_lm_deleted" -> trigramLmOracle,
    "q95_bpe_merges" ->
      s"""WITH w AS (SELECT t AS word, count(*) AS cnt
         |  FROM (SELECT unnest(list_filter(
         |      string_split_regex(lower(text), '\\s+'),
         |      x -> len(x) > 0)) AS t FROM documents WHERE doc_id < 100)
         |  GROUP BY t),
         |s0 AS (SELECT cnt, list_transform(range(1, len(word) + 1),
         |  i -> word[i]) AS syms FROM w),
         |${bpeRound("s0", 1)},
         |${bpeRound("s1", 2)},
         |${bpeRound("s2", 3)}
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS merge_idx, l AS left_sym,
         |    r AS right_sym, CAST(c AS BIGINT) AS pair_count FROM m1
         |  UNION ALL SELECT 1, l, r, CAST(c AS BIGINT) FROM m2
         |  UNION ALL SELECT 2, l, r, CAST(c AS BIGINT) FROM m3)
         |ORDER BY merge_idx""".stripMargin,
    // q95's three training rounds re-learned verbatim, then the same
    // fold applied per word of the unseen docs; counts per doc
    "q98_bpe_encode" -> bpeEncodeOracle,
    // the persisted tokenizer artifact serves the identical encode —
    // q98's oracle verbatim
    "q210_bpe_persisted" -> bpeEncodeOracle,
    // q93's scoring replayed over the whole corpus, then histogram-
    // derived tercile cutoffs per language (whole bins per bucket)
    "q99_ccnet_buckets" ->
      s"""WITH tr AS (${duckToks("WHERE doc_id % 2 = 0")}),
         |uni AS (SELECT w, count(*) AS cu
         |  FROM (SELECT unnest(a) AS w FROM tr) GROUP BY w),
         |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n
         |  FROM (SELECT unnest(a) AS w FROM tr)),
         |bi AS (SELECT b, count(*) AS cb
         |  FROM (SELECT unnest(list_transform(range(1, len(a)),
         |    i -> a[i] || ' ' || a[i+1])) AS b FROM tr) GROUP BY b),
         |tri AS (SELECT t, count(*) AS ct
         |  FROM (SELECT unnest(list_transform(range(1, len(a) - 1),
         |    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS t FROM tr)
         |  GROUP BY t),
         |d AS (${duckToks("")}),
         |g AS (SELECT doc_id, a[r.i] AS w1, a[r.i+1] AS w2, a[r.i+2] AS w3
         |  FROM d CROSS JOIN unnest(range(1, len(a) - 1)) r(i)),
         |j AS (SELECT doc_id, w2, w3, w1 || ' ' || w2 AS bp,
         |  w2 || ' ' || w3 AS bs, w1 || ' ' || w2 || ' ' || w3 AS t3 FROM g),
         |sc AS (SELECT doc_id,
         |  CASE WHEN ct IS NOT NULL THEN CAST(ct AS DOUBLE) / cbp
         |       WHEN cbs IS NOT NULL THEN 0.4 * CAST(cbs AS DOUBLE) / cu2
         |       WHEN cu3 IS NOT NULL THEN 0.4 * 0.4 * CAST(cu3 AS DOUBLE) / n
         |       ELSE 0.4 * 0.4 / n END AS p
         |  FROM j LEFT JOIN tri ON j.t3 = tri.t
         |  LEFT JOIN (SELECT b AS bp, cb AS cbp FROM bi) b1 USING (bp)
         |  LEFT JOIN (SELECT b AS bs, cb AS cbs FROM bi) b2 USING (bs)
         |  LEFT JOIN (SELECT w AS w2, cu AS cu2 FROM uni) u2 USING (w2)
         |  LEFT JOIN (SELECT w AS w3, cu AS cu3 FROM uni) u3 USING (w3), nt),
         |agg AS (SELECT doc_id, round(avg(ln(p)), 4) AS score
         |  FROM sc GROUP BY doc_id),
         |sb AS (SELECT agg.doc_id, lang, score,
         |  CAST(floor(score * 10) AS BIGINT) AS bin,
         |  CAST(round(score * 10000) AS BIGINT) AS si
         |  FROM agg JOIN documents USING (doc_id) WHERE score IS NOT NULL),
         |hist AS (SELECT lang, bin, count(*) AS c FROM sb GROUP BY 1, 2),
         |mk AS (SELECT lang, bin,
         |  coalesce(CAST(sum(c) OVER (PARTITION BY lang ORDER BY bin DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |    0) AS prev,
         |  CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS n FROM hist),
         |bk AS (SELECT lang, bin,
         |  CASE WHEN prev < floor(CAST(n + 2 AS DOUBLE) / 3) THEN 'head'
         |       WHEN prev < floor(CAST(n * 2 + 2 AS DOUBLE) / 3)
         |         THEN 'middle'
         |       ELSE 'tail' END AS bucket FROM mk)
         |SELECT sb.lang, bucket, count(*) AS n_docs,
         |  round(CAST(sum(si) AS DOUBLE) / 10000 / count(*), 4)
         |    AS mean_score
         |FROM sb JOIN bk ON sb.lang = bk.lang AND sb.bin = bk.bin
         |GROUP BY sb.lang, bucket ORDER BY sb.lang, bucket""".stripMargin,
    // q93's LM scoring + q49's quality algebra joined per doc, then
    // the five Pearson sums in exact scaled longs per language
    "q102_signal_correlation" ->
      s"""WITH tr AS (${duckToks("WHERE doc_id % 2 = 0")}),
         |uni AS (SELECT w, count(*) AS cu
         |  FROM (SELECT unnest(a) AS w FROM tr) GROUP BY w),
         |nt AS (SELECT CAST(count(*) AS DOUBLE) AS n
         |  FROM (SELECT unnest(a) AS w FROM tr)),
         |bi AS (SELECT b, count(*) AS cb
         |  FROM (SELECT unnest(list_transform(range(1, len(a)),
         |    i -> a[i] || ' ' || a[i+1])) AS b FROM tr) GROUP BY b),
         |tri AS (SELECT t, count(*) AS ct
         |  FROM (SELECT unnest(list_transform(range(1, len(a) - 1),
         |    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS t FROM tr)
         |  GROUP BY t),
         |d AS (${duckToks("")}),
         |g AS (SELECT doc_id, a[r.i] AS w1, a[r.i+1] AS w2, a[r.i+2] AS w3
         |  FROM d CROSS JOIN unnest(range(1, len(a) - 1)) r(i)),
         |j AS (SELECT doc_id, w2, w3, w1 || ' ' || w2 AS bp,
         |  w2 || ' ' || w3 AS bs, w1 || ' ' || w2 || ' ' || w3 AS t3 FROM g),
         |sc AS (SELECT doc_id,
         |  CASE WHEN ct IS NOT NULL THEN CAST(ct AS DOUBLE) / cbp
         |       WHEN cbs IS NOT NULL THEN 0.4 * CAST(cbs AS DOUBLE) / cu2
         |       WHEN cu3 IS NOT NULL THEN 0.4 * 0.4 * CAST(cu3 AS DOUBLE) / n
         |       ELSE 0.4 * 0.4 / n END AS p
         |  FROM j LEFT JOIN tri ON j.t3 = tri.t
         |  LEFT JOIN (SELECT b AS bp, cb AS cbp FROM bi) b1 USING (bp)
         |  LEFT JOIN (SELECT b AS bs, cb AS cbs FROM bi) b2 USING (bs)
         |  LEFT JOIN (SELECT w AS w2, cu AS cu2 FROM uni) u2 USING (w2)
         |  LEFT JOIN (SELECT w AS w3, cu AS cu3 FROM uni) u3 USING (w3), nt),
         |agg AS (SELECT doc_id, round(avg(ln(p)), 4) AS score
         |  FROM sc GROUP BY doc_id),
         |qt AS (SELECT doc_id, text,
         |  list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0)
         |    AS toks FROM documents),
         |qm AS (SELECT doc_id,
         |  least(CAST(len(toks) AS DOUBLE) / 100, CAST(1 AS DOUBLE))
         |    AS len_score,
         |  CASE WHEN length(text) > 0 THEN
         |    CAST(length(text) -
         |      length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
         |      / length(text) ELSE CAST(0 AS DOUBLE) END AS punct_ratio,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
         |      / len(toks) ELSE CAST(0 AS DOUBLE) END AS mean_len
         |  FROM qt),
         |qual AS (SELECT doc_id, round(CAST(len_score * 0.4 +
         |  (1 - least(punct_ratio * 4, CAST(1 AS DOUBLE))) * 0.3 +
         |  (CASE WHEN mean_len BETWEEN 3.0 AND 10.0
         |    THEN CAST(1 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) * 0.3
         |  AS DOUBLE), 4) AS q FROM qm),
         |pr AS (SELECT lang, CAST(round(q * 10000) AS BIGINT) AS x,
         |  CAST(round(score * 10000) AS BIGINT) AS y
         |  FROM agg JOIN documents USING (doc_id) JOIN qual USING (doc_id)
         |  WHERE score IS NOT NULL),
         |gs AS (SELECT lang, count(*) AS n,
         |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx,
         |  CAST(sum(y * y) AS BIGINT) AS syy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy FROM pr GROUP BY lang)
         |SELECT lang, n,
         |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
         |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         |       sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 4) END AS pearson_r
         |FROM gs ORDER BY lang""".stripMargin)
}
