package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class ExtensionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest before the sun goes down"
  private val nearDup = base.replace("green", "dark") // one-word edit
  private val unrelated = "completely different content about database " +
    "engines shuffle partitions and broadcast joins at massive scale"

  private def docs = {
    import spark.implicits._
    Seq((0L, base), (1L, nearDup), (2L, unrelated), (3L, base))
      .toDF("doc_id", "text")
  }

  test("char_ngrams matches the substr formulation on edge cases") {
    import spark.implicits._
    val inputs = Seq("", "ab", "abcd", "abcde", "ababab",
      "héllo wörld", "日本語のテキスト")
    val k = 4
    val rows = inputs.toDF("s").select(
      graft.functions.TextFunctions.char_ngrams(col("s"), k).as("fast"),
      transform(
        sequence(lit(1), greatest(length(col("s")) - (k - 1), lit(1))),
        i => substr(col("s"), i, lit(k))).as("slow"),
      graft.functions.TextFunctions.char_ngrams(col("s"), k,
        distinct = true).as("fastd"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
      assert(r.getSeq[String](2) == r.getSeq[String](1).distinct)
    }
  }

  test("exact dedup keeps lowest id per normalized digest") {
    val kept = Dedup.exactDedupKeepFirst(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 1L, 2L)) // 3 is an exact dup of 0
  }

  test("minhash+LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.nearDupPairs(docs, "text", "doc_id",
        numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // near-dup caught
    assert(pairs.contains((0L, 3L))) // exact dup caught
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated skipped
  }

  test("LSH bucket skew guard: a near-identical (templated, not " +
      "identical) corpus completes with bounded candidates") {
    import spark.implicits._
    val n = 2000
    // every doc shares the long template and differs by one trailing
    // token — exact dedup can't collapse them, and most band keys
    // collide across the whole corpus (the quadratic pathology:
    // ~n²/2 × bands candidate rows without the guard)
    val corpus = (0 until n)
      .map(i => (i.toLong, s"$base unique token nr $i"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id", 64)
      .localCheckpoint(false)
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id",
      bands = 16, maxBucket = 64)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounded: star edges are ≤ bucket size per oversized bucket, so
    // the candidate set is FAR below the ~2M all-pairs blowup
    assert(got.length < 8 * n, s"unbounded candidates: ${got.length}")
    assert(got.forall(p => p._1 < p._2))
    // connectivity through the hub survives: every doc still appears
    // in at least one candidate pair
    val seen = got.flatMap(p => Seq(p._1, p._2)).toSet
    assert(seen.size == n)
    // deterministic: same input → same pair set
    val again = Dedup.lshCandidatePairs(sigs, "doc_id",
      bands = 16, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSet == got.toSet)
  }

  test("LSH bucket skew guard is a no-op when no bucket exceeds the cap") {
    val unlimited = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(docs, "text", "doc_id", 64), "doc_id", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = Dedup.lshCandidatePairs(
      Dedup.minhashSignatures(docs, "text", "doc_id", 64), "doc_id", 16,
      maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == unlimited)
  }

  test("incremental dedup drops batch docs already in the corpus") {
    import spark.implicits._
    val corpus = Seq((0L, base), (1L, unrelated)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),             // exact dup of corpus → dropped
      (11L, "brand new text"), // new → kept
      (12L, "brand  new text"),// within-batch dup of 11 → dropped
      (13L, nearDup))          // near but not exact → kept by EXACT pass
      .toDF("doc_id", "text")
    val digests = corpus.select(Dedup.contentKey(col("text")).as("digest"))
    val kept = Dedup.incrementalExactDedup(batch, digests, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(11L, 13L))
    // the near-dup variant flags 13 against corpus doc 0
    val sigs = Dedup.minhashSignatures(corpus, "text", "doc_id")
    val flagged = Dedup.incrementalNearDups(batch, sigs, "text", "doc_id",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged.contains((13L, 0L)) && flagged.contains((10L, 0L)))
    assert(!flagged.exists(_._1 == 11L))
  }

  test("near-dup dedup keeps one canonical doc per cluster") {
    val kept = Dedup.nearDupDedup(docs, "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 0/1/3 cluster together (near + exact dups) → keep 0; 2 untouched
    assert(kept.toSeq == Seq(0L, 2L))
  }

  test("nearDupDedup bounds candidates BY DEFAULT on a templated " +
      "corpus, and the kept set matches the unguarded run") {
    import spark.implicits._
    assert(Dedup.DefaultMaxBucket < Int.MaxValue) // guard is on by default
    // templated: shared long prefix, one unique trailing token — exact
    // dedup can't collapse these, and most band keys collide across
    // the whole corpus
    // (a) a corpus whose buckets exceed the default cap: a STRONGLY
    // templated corpus (long shared boilerplate, one unique trailing
    // token → near-1.0 pairwise Jaccard → every band collides
    // corpus-wide). The DEFAULT pipeline path (nearDupDedup →
    // nearDupPairs with DefaultMaxBucket) produces a linear-ish
    // candidate set, not the ~n²/2 all-pairs blowup
    // (repeating `base` would add no DISTINCT shingles — the template
    // must be long in distinct grams for pairwise Jaccard ≈ 1)
    val heavyTmpl = (1 to 150).map(i => s"boilerplate$i").mkString(" ")
    val big = (0 until 1200)
      .map(i => (i.toLong, s"$heavyTmpl unique token nr $i"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(big, "text", "doc_id", 64)
      .localCheckpoint(false)
    val guarded = Dedup.lshCandidatePairs(sigs, "doc_id", bands = 16,
        maxBucket = Dedup.DefaultMaxBucket).count()
    assert(guarded < 8L * 1200, s"unbounded candidates: $guarded")
    // (b) cluster-level output is what dedup keeps, and the star
    // degrade preserves connectivity: a guarded run (cap forced low
    // so the degrade fires on this smaller corpus) keeps the
    // identical doc set as the exhaustive run
    val n = 240
    val corpus = (0 until n)
      .map(i => (i.toLong, s"$base unique token nr $i"))
      .toDF("doc_id", "text")
    val kept = Dedup.nearDupDedup(corpus, "text", "doc_id",
        threshold = 0.5, maxBucket = 64)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val keptUnguarded = Dedup.nearDupDedup(corpus, "text", "doc_id",
        threshold = 0.5, maxBucket = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == keptUnguarded)
  }

  test("near-dup dedup survives a large exact-duplicate class") {
    import spark.implicits._
    // 500 identical docs would generate ~125k LSH candidate pairs if
    // they reached the band self-join; the exact-dedup pre-pass
    // collapses them to one representative first
    val blowup = ((0L until 500L).map(i => (i, base)) ++
      Seq((900L, nearDup), (901L, unrelated))).toDF("doc_id", "text")
    val kept = Dedup.nearDupDedup(blowup, "text", "doc_id",
        threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 901L)) // min id of the clone+near class, plus unrelated
  }

  test("repeated-substring spans: cross-doc verbatim windows counted " +
      "per doc; hash keys agree with raw-substring keys") {
    import spark.implicits._
    val shared = "this exact boilerplate sentence repeats verbatim"
    val docs = Seq(
      (1L, s"prefix one $shared suffix one"),
      (2L, s"totally different lead-in $shared and a different tail"),
      (3L, "no overlap with anything else in this corpus at all here"),
      (4L, "short")) // below the window length → no windows at all
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      Dedup.repeatedSpans(docs, "text", "doc_id", l = 20, hashKeys = hash)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    val got = run(hash = false)
    // docs 1 and 2 share every window inside the space-padded 50-char
    // boilerplate region (" " + 48 chars + " " → 50 - 20 + 1 = 31
    // windows each); 3 has windows but none repeat; 4 has no windows
    // and no row
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L)._2 == 31 && got(2L)._2 == 31)
    assert(got(3L)._2 == 0)
    assert(got(1L)._1 == docs.filter(col("doc_id") === 1L)
      .select(length(col("text"))).collect().head.getInt(0) - 19)
    // the xxhash64 scale path computes the identical answer
    assert(run(hash = true) == got)
    // the per-row window-array guard: windows count only within
    // maxChars, so a pathological giant doc can't build a giant
    // in-row array (here: cap 40 chars → 21 windows for doc 3)
    val capped = Dedup.repeatedSpans(docs, "text", "doc_id", l = 20,
        hashKeys = false, maxChars = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(3L) == 21)
  }

  test("decontamination flags training docs containing benchmark items") {
    import spark.implicits._
    val train = Seq(
      (10L, "prefix words " + base + " suffix words"), // contains bench 0
      (11L, unrelated),
      (12L, base.take(40))) // partial overlap only
      .toDF("doc_id", "text")
    val bench = Seq((0L, base), (1L, "entirely novel benchmark prompt " +
      "with its own unique phrasing throughout")).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(train, bench, "text", "doc_id",
        k = 8, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((10L, 0L))) // containment caught
    assert(!hits.exists(_._1 == 11L)) // unrelated clean
    assert(!hits.exists(_._1 == 12L)) // 40 chars of ~130 → below 0.5
  }

  test("signature jaccard approximates exact jaccard") {
    import spark.implicits._
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 128)
    val s = sigs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long) =
      s(a).zip(s(b)).count(p => p._1 == p._2).toDouble / s(a).size
    val grams = Dedup.explodeGrams(docs, "text", "doc_id")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("a", "b")
    val exact = Dedup.exactJaccard(pairs, grams, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(est(0, 1) - exact((0L, 1L))) < 0.15)
    assert(est(0, 2) < 0.2 && exact((0L, 2L)) < 0.2)
  }

  test("simhash: near-dups are close in Hamming space, unrelated far") {
    val sh = Dedup.simhash64(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(0, 3) == 0)            // identical text
    assert(ham(0, 1) <= 12)           // one-word edit stays close
    assert(ham(0, 2) > ham(0, 1))     // unrelated is farther
  }

  test("brute-force cosine top-k is exact and self-similarity ranks first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(1f, 0.01f, 0f)))
      .toDF("vec_id", "embedding")
    val probes = Seq((0L, Array(1f, 0f, 0f))).toDF("probe_id", "probe_vec")
    val got = Similarity.bruteForceTopK(vecs, probes, 3)
      .orderBy("rank").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(0L, 3L, 1L)) // by descending cosine
  }

  test("LSH ANN recalls the brute-force top result on real embeddings") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val planes = Similarity.hyperplanes(64, 8)
    val brute = Similarity.bruteForceTopK(emb, probes, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.lshTopK(emb, probes, 1, planes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rank-1 is the vector itself (sim=1), which always shares a bucket
    assert(brute.keySet == lsh.keySet)
    brute.keys.foreach(k => assert(lsh(k) == brute(k)))
  }

  test("multi-probe LSH recall covers single-bucket recall at top-3") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val planes = Similarity.hyperplanes(64, 8)
    def hits(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits(Similarity.bruteForceTopK(emb, probes, 3))
    val single = hits(Similarity.lshTopK(emb, probes, 3, planes))
    val multi = hits(Similarity.lshTopKMultiProbe(emb, probes, 3, planes))
    def recall(s: Set[(Long, Long)]) =
      (s & brute).size.toDouble / brute.size
    // Hamming-1 probing searches a superset of the home bucket, so
    // its recall can only improve on single-bucket LSH
    assert(recall(multi) >= recall(single))
    // each probe always recalls itself at rank 1 (sim = 1, home
    // bucket), so recall is at least 1/k; these embeddings are
    // near-random so rank-2/3 neighbors are genuinely hard
    assert(recall(multi) >= 1.0 / 3)
  }

  test("embedding near-dups: identical vectors found in shared buckets") {
    import spark.implicits._
    val v = Array.fill(16)(0.5f)
    val vecs = Seq((0L, v), (1L, v.map(_ * 1.0001f)),
      (2L, Array.fill(16)(0f).updated(0, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDups(vecs,
        Similarity.hyperplanes(16, 6), 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }

  test("semantic dedup keeps exactly the ids with no lower-id " +
      "in-cluster neighbor (randomized differential vs brute force)") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val centroids: Seq[Seq[Long]] =
      Seq.fill(4)(Seq.fill(8)((rnd.nextInt(801) - 400).toLong))
    // 60 vectors in loose clumps around the centroids, plus exact
    // duplicates (the identical-vector guard path)
    val vecs = (0L until 60L).map { i =>
      val base = centroids((i % 4).toInt)
      (i, base.map(c => c + rnd.nextInt(161) - 80))
    } ++ Seq((60L, centroids(0).map(identity)), (61L, centroids(0).map(identity)))
    val df = vecs.toDF("vec_id", "q")
    val thr = 0.8
    val kept = Similarity.semanticDedup(df, centroids, thr)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // brute force: same rule, driver-side
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      dot / (na * nb) // matches cosineInt: int dots, one double divide
    }
    def cluster(v: Seq[Long]): Int =
      centroids.zipWithIndex.minBy { case (c, i) =>
        (c.zip(v).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }._2
    val byId = vecs.toMap
    val expect = vecs.map(_._1).filter { id =>
      !vecs.exists { case (o, ov) =>
        o < id && cluster(ov) == cluster(byId(id)) &&
          cos(ov, byId(id)) >= thr
      }
    }.toSet
    assert(kept == expect)
    // the duplicate pair collapsed to its min id
    assert(!kept.contains(61L))
  }

  test("language ID picks the profile language on natural sentences") {
    import spark.implicits._
    val got = Seq(
      "the cat sat on the mat and it was happy with the result",
      "der Hund ist nicht zu Hause und die Katze ist mit von der Partie",
      "le chat est dans la maison et les oiseaux sont dans le jardin",
      "el perro es una mascota y los gatos son animales con historia",
      "xyzzy plugh")
      .toDF("text").select(TextAnalysis.langId(col("text")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("sequence packing fills bins to budget within shards") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, 300)).toDF("doc_id", "n")
    val packed = Packing.packByBudget(docs, col("doc_id"), col("n"),
      budget = 1000, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(packed.map(_._2).distinct.sorted.sameElements(Array(0L, 1L)))
    // per (shard, bin) the tokens BEFORE the last doc stay under
    // budget (a bin only overflows by its final doc)
    packed.groupBy(p => (p._2, p._3)).foreach { case (_, rows) =>
      assert((rows.size - 1) * 300 < 1000)
    }
    // deterministic under repartitioning
    val again = Packing.packByBudget(docs.repartition(7), col("doc_id"),
      col("n"), budget = 1000, shards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(packed.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("connected components labels every member with the component min") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 1L))
      .toDF("a", "b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 6L -> 5L)
    val fast = Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == expected)
    // driverEdgeLimit = 0 forces the distributed star-contraction
    // path; all physical paths must agree
    val dist = Graph.connectedComponents(edges, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
    val lp = Graph.labelPropagation(
        edges.select(col("a").as("u"), col("b").as("v")), 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lp == expected)
    // a 60-node chain has diameter ≫ maxIter: only converges inside
    // 25 rounds because of the per-round contraction (log-round
    // convergence) — on both distributed algorithms
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("a", "b")
    val chainLabs = Graph.connectedComponents(chain, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainLabs.size == 61 && chainLabs.values.forall(_ == 0L))
    val chainLp = Graph.labelPropagation(
        chain.select(col("a").as("u"), col("b").as("v")), 25)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chainLp == chainLabs)
  }

  test("star contraction: 1e5-node chain converges in under 10 rounds") {
    import spark.implicits._
    // the adversarial CC input: one path graph, diameter 10^5. Plain
    // min-label flooding needs diameter rounds; star alternation
    // alone ~log2 (≈17); the star+jump round contracts ≥8× so 10
    // rounds bound it — starContraction THROWS if maxRounds doesn't
    // suffice, so this asserts the round count, not just the labels
    val n = 100000L
    val chain = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    val labs = Graph.starContraction(chain, maxRounds = 10)
    val distinctClusters = labs.select("cluster").distinct().collect()
    assert(distinctClusters.length == 1 && distinctClusters(0).getLong(0) == 0L)
    assert(labs.count() == n)
    // self-loop-only nodes keep themselves as their cluster
    val loops = Seq((7L, 7L), (8L, 9L)).toDF("a", "b")
    val loopLabs = Graph.connectedComponents(loops, driverEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loopLabs == Map(7L -> 7L, 8L -> 8L, 9L -> 8L))
  }

  test("embedding near-dups guard: 500 identical vectors, no quadratic bucket") {
    import spark.implicits._
    val base = Array.tabulate(16)(i => 0.1f * i)
    val other = Array.tabulate(16)(i => 1f - 0.1f * i)
    val vecs = ((0L until 500L).map(i => (i, base)) :+ (900L, other))
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingNearDups(vecs,
      Similarity.hyperplanes(16, 6), 0.999)
    // all C(500,2) identical pairs at sim 1.0, nothing with `other`
    assert(got.count() == 500L * 499 / 2)
    assert(got.agg(min(col("sim")), max(col("sim"))).collect()(0)
      .toSeq == Seq(1.0, 1.0))
    // the LSH self-join itself ran over ONE representative per class
    // (the checkpointed distinct-vector table — Scan ExistingRDD in
    // the plan), so the degenerate bucket never sees 500×500
    // candidates; and the duplicate-class expansions broadcast
    val planStr = got.queryExecution.executedPlan.toString
    assert(planStr.contains("Scan ExistingRDD"))
    assert(planStr.contains("BroadcastHashJoin"))
  }

  test("DSIR importance: target-like docs outscore off-target docs") {
    import spark.implicits._
    // target = English-looking docs; a held-out English doc shares
    // its bigrams with the target slice and must score above a
    // French-looking doc of the same length
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the dog sat on the rug", true),
      (3L, "the cat sat on the rug", false), // held-out target-like
      (4L, "le chat est sur le tapis", false),
      (5L, "le chien est sur le sol", false))
      .toDF("doc_id", "text", "tgt")
    val w = Sampling.importanceWeights(docs, "text", "doc_id", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(w(3L) > w(4L) && w(3L) > w(5L))
    assert(w(1L) > w(4L))
    // deterministic under repartitioning (integer micro-unit sums)
    val again = Sampling.importanceWeights(docs.repartition(7),
        "text", "doc_id", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == w)
  }

  test("stratified sample keeps per-stratum rates and is deterministic") {
    import spark.implicits._
    val rows = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val sampled = Sampling.stratifiedSample(rows, col("doc_id"),
      col("lang"), Map("en" -> 0.5, "de" -> 0.1))
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 400 && byLang("en") < 600)
    assert(byLang("de") > 50 && byLang("de") < 150)
    // deterministic: same rows selected under a different layout
    val again = Sampling.stratifiedSample(rows.repartition(13),
      col("doc_id"), col("lang"), Map("en" -> 0.5, "de" -> 0.1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
    // default rate 0.0 drops unlisted strata entirely
    assert(Sampling.stratifiedSample(rows, col("doc_id"), col("lang"),
      Map("en" -> 0.5)).filter(col("lang") === "de").count() == 0)
  }

  test("data mixture hits target proportions at max feasible size") {
    import spark.implicits._
    // 1000 en, 100 de; target 50/50 → de is the scarce stratum:
    // keep all ~100 de and sample ~100 en
    val rows = ((0L until 1000L).map(i => (i, "en")) ++
      (1000L until 1100L).map(i => (i, "de"))).toDF("doc_id", "lang")
    val mixed = Sampling.mixToTarget(rows, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "de" -> 0.5))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mixed("de") > 90) // scarce stratum kept (hash rounding slack)
    assert(mixed("en") > 70 && mixed("en") < 130) // downsampled to ~100
    // infeasible target (stratum absent) → empty mixture
    assert(Sampling.mixToTarget(rows, col("doc_id"), col("lang"),
      Map("en" -> 0.5, "zz" -> 0.5)).count() == 0)
  }

  test("hash split is deterministic, exhaustive, and roughly sized") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("doc_id")
    val a = Dedup.hashSplit(ids, col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Dedup.hashSplit(ids.repartition(7), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b) // stable under repartitioning
    val sizes = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > 700 && sizes("val") > 50 && sizes("test") > 50)
    // growing the corpus never reassigns an existing doc
    val grown = Dedup.hashSplit((0L until 2000L).toDF("doc_id"),
      col("doc_id")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, s) => grown(id) == s })
  }

  test("document frequency counts each doc once per word") {
    import spark.implicits._
    val df = Seq("the cat the cat the", "the dog", "fish")
      .toDF("text")
    val got = TextAnalysis.docFrequency(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("the" -> 2L, "cat" -> 1L, "dog" -> 1L, "fish" -> 1L))
  }

  test("count-min: estimates dominate exact counts, unseen candidates " +
      "estimate 0 at wide width, merged sketches equal the union sketch") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val streamA = Seq.fill(300)(words(rng.nextInt(words.length))).toDF("t")
    val streamB = Seq.fill(200)(words(rng.nextInt(words.length))).toDF("t")
    val both = streamA.union(streamB)
    val (dep, wid) = (3, 4) // narrower than the vocab: forced collisions
    val sk = CountMin.sketch(both, "t", dep, wid)
    val exact = both.groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = CountMin.estimate(words.toDF("t"), sk, "t", dep, wid)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach(w => assert(est(w) >= exact(w), s"CMS underestimated $w"))
    // 8 words into 3×4 cells MUST collide somewhere: some estimate
    // strictly overestimates — the contract q83 exhibits under oracle
    assert(words.exists(w => est(w) > exact(w)))
    // wide sketch: an unseen candidate hits three empty cells → 0
    val wide = CountMin.sketch(both, "t", 3, 1 << 20)
    val unseen = CountMin
      .estimate(Seq("never-seen").toDF("t"), wide, "t", 3, 1 << 20)
      .collect().head.getLong(1)
    assert(unseen == 0L)
    // mergeability: union-then-sketch == sketch-then-sum-per-cell
    val merged = CountMin.sketch(streamA, "t", dep, wid)
      .union(CountMin.sketch(streamB, "t", dep, wid))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(toMap(merged) == toMap(sk))
  }

  test("vocab coverage: two-level cumsum equals a single global " +
      "running sum and the integer cutoff marks the 95% prefix") {
    import spark.implicits._
    // frequencies: e×6, d×5, c×3, b×3, a×1 → total 18; 95% budget =
    // 17.1 → e,d,c,b in (cum 17 ≤ 17.1… as integers 17*100 ≤ 18*95)
    val docs = Seq((0L, "e e e e e e d d d"), (1L, "d d c c c b b b a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, "text")
      .orderBy(desc("cnt"), col("word")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // global running sum ordered (cnt desc, word): the ties b/c (both
    // 3) order alphabetically — b before c
    assert(got.toSeq == Seq(
      ("e", 6L, 6L, true), ("d", 5L, 11L, true), ("b", 3L, 14L, true),
      ("c", 3L, 17L, true), ("a", 1L, 18L, false)))
  }

  test("vocab coverage: tail sub-sharding leaves every in_vocab flag " +
      "and the per-band cum_cnt value set unchanged") {
    import spark.implicits._
    // a WIDE cnt=1 tail (the band sub-sharding targets) plus heads;
    // total 68 tokens, 30/100 budget = 20.4 → the cutoff falls inside
    // the cnt=2 band (cums 18..28), so the cnt=1 tail and the heads
    // are non-boundary (sharded) and only cnt=2 keeps exact order
    val tail = (0 until 40).map(i => f"t$i%02d").mkString(" ")
    val docs = Seq(
      (0L, "x x x x x x x x x x y y y y y y"),
      (1L, "m1 m1 m2 m2 m3 m3 m4 m4 m5 m5 m6 m6"),
      (2L, tail)).toDF("doc_id", "text")
    val exact = TextAnalysis.vocabCoverage(docs, "text", 30, 100)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val sharded = TextAnalysis.vocabCoverage(docs, "text", 30, 100,
        tailSubShards = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(exact.length === sharded.length)
    // identical in_vocab verdict per word
    val exactV = exact.map(t => t._1 -> t._4).toMap
    val shardedV = sharded.map(t => t._1 -> t._4).toMap
    assert(shardedV === exactV)
    // cum_cnt per band is the same VALUE SET (assignment may differ)
    def bandSets(a: Array[(String, Long, Long, Boolean)]) =
      a.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(bandSets(sharded) === bandSets(exact))
    // the boundary band (cnt=2, straddling the 30% cutoff) keeps the
    // exact word↔cum_cnt pairing
    val exactBoundary = exact.filter(_._2 == 2L).sortBy(_._1).toSeq
    val shardedBoundary = sharded.filter(_._2 == 2L).sortBy(_._1).toSeq
    assert(shardedBoundary === exactBoundary)
    // sanity: the boundary band is genuinely mixed in/out
    assert(exactBoundary.exists(_._4) && exactBoundary.exists(!_._4))
  }

  test("hard negatives pick the closest different-label candidate " +
      "with deterministic tie-breaks") {
    import spark.implicits._
    // anchor 0 (label 0): candidates 1 (label 1, identical vector,
    // sim 1) and 2 (label 1, orthogonal) and 3 (label 0 — excluded
    // even though identical)
    val vecs = Seq(
      (0L, 0, Seq(1000L, 0L)), (1L, 1, Seq(1000L, 0L)),
      (2L, 1, Seq(0L, 1000L)), (3L, 0, Seq(1000L, 0L)))
      .toDF("vec_id", "label", "q")
    val l = vecs.select(col("vec_id").as("a"), col("label").as("la"),
      col("q").as("qa"))
    val r = vecs.select(col("vec_id").as("b"), col("label").as("lb"),
      col("q").as("qb"))
    val cands = l.crossJoin(r).filter(col("a") =!= col("b"))
      .withColumn("sim", Similarity.cosineInt(col("qa"), col("qb")))
    val got = Similarity.hardNegatives(cands, "a", "b", "la", "lb", "sim")
      .select("a", "b").collect().map(r2 => r2.getLong(0) -> r2.getLong(1))
      .toMap
    assert(got(0L) == 1L) // identical different-label vector wins
    assert(got(3L) == 1L) // ties (1 and… none) — 1 beats 2 on sim
    assert(got(1L) == 0L) // anchors with label 1 pick a label-0 vec
    assert(got(2L) != 2L && Set(0L, 3L).contains(got(2L)))
    // tie between equal-sim candidates 0 and 3 breaks on lowest id
    assert(got(2L) == 0L)
  }

  test("hll registers match a plain-Scala replay, merge by max, and " +
      "the estimate lands within HLL error on a known cardinality") {
    import spark.implicits._
    val n = 5000
    val toks = (0 until n).map(i => s"tok$i")
    // duplicate stream: cardinality is what HLL sees, not frequency
    val df = (toks ++ toks.take(1000)).toDF("t")
    val bits = 8 // m=256
    val got = Hll.registers(df, "t", bits, Hll.md5Hash, hashBits = 60)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == 256 && got.keys.min == 0L && got.keys.max == 255L)
    // independent replay: md5 first-15-hex as long, rho via
    // numberOfLeadingZeros on the 52-bit rest
    val md = java.security.MessageDigest.getInstance("MD5")
    val exp = collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    toks.foreach { t =>
      val hex = md.digest(s"hll:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = h & 255L
      val rest = h >>> bits
      val w = 60 - bits
      val rho = if (rest == 0L) w + 1
        else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      exp(bucket) = math.max(exp(bucket), rho)
    }
    assert((0L until 256L).forall(b => got(b) == exp(b)))
    // merge law: registers(A) max registers(B) == registers(A ++ B)
    val a = Hll.registers(toks.take(3000).toDF("t"), "t", bits,
      Hll.md5Hash, hashBits = 60)
    val b = Hll.registers(toks.drop(3000).toDF("t"), "t", bits,
      Hll.md5Hash, hashBits = 60)
    val merged = Hll.merge(a, b).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0L until 256L).forall(bk => merged(bk) == got(bk)))
    // estimate: sigma ≈ 1.04/sqrt(256) = 6.5%; assert within 3 sigma
    val est = Hll.estimate(a.unionByName(b).groupBy("bucket")
        .agg(max("register").cast("int").as("register")), bits)
      .collect()(0).getDouble(0)
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs $n")
    // production hash path sanity (xxhash64, 63-bit): same contract
    val estXx = Hll.estimate(
      Hll.registers(df, "t", bits), bits).collect()(0).getDouble(0)
    assert(math.abs(estXx - n) / n < 0.2, s"xx estimate $estXx vs $n")
  }

  test("bloom has no false negatives, matches a plain-Scala replay, " +
      "and a saturated filter says maybe to everything") {
    import spark.implicits._
    val inserted = (0 until 500).map(i => s"key$i")
    val probedNew = (0 until 2000).map(i => s"other$i")
    val k = 3
    val mBits = 1 << 12 // 4096 bits, ~36% set → FP rate ~5%
    val bits = Bloom.build(inserted.toDF("key"), "key", k, mBits,
      Bloom.md5Hash)
    val verdict = Bloom.mightContain(
        (inserted ++ probedNew).toDF("key"), bits, "key", k, mBits,
        Bloom.md5Hash)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // no false negatives, ever
    assert(inserted.forall(verdict(_)))
    // independent replay of the whole verdict map
    val md = java.security.MessageDigest.getInstance("MD5")
    def bitsOf(s: String): Set[Long] = (0 until k).map { r =>
      val hex = md.digest(s"bf$r:$s".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % mBits
    }.toSet
    val setBits = inserted.flatMap(bitsOf).toSet
    (inserted ++ probedNew).foreach { s2 =>
      assert(verdict(s2) == bitsOf(s2).subsetOf(setBits), s2)
    }
    // the FP contract is visible at this sizing: some but not all
    val fps = probedNew.count(verdict(_))
    assert(fps > 0 && fps < probedNew.size)
    // degenerate width saturates to all-maybe (documented contract)
    val tiny = Bloom.build(inserted.toDF("key"), "key", k, 8,
      Bloom.md5Hash)
    val sat = Bloom.mightContain(probedNew.take(50).toDF("key"), tiny,
        "key", k, 8, Bloom.md5Hash)
      .collect().map(_.getBoolean(1))
    assert(sat.forall(identity))
  }

  test("loghist sketch answers quantiles within the 2x bin contract, " +
      "merges by sum, and bins agree with a plain-Scala replay") {
    import spark.implicits._
    val vals = (1 to 1000).map(_.toLong) ++ Seq(0L, 0L)
    val df = vals.map(("g", _)).toDF("grp", "v")
    val sk = LogHist.sketch(df, "v", Seq("grp"))
    val got = sk.collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // plain-Scala replay: bin = 64 - nlz(x), 0 for x <= 0
    val exp = vals.groupBy(x =>
        if (x <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x))
      .map { case (b, xs) => b -> xs.size.toLong }
    assert(got == exp)
    // quantile contract: true p50 of 0..1000-ish is ~500 → bin 9
    // [256, 511] or bin 10 [512, 1023]; exact-integer rank says the
    // smallest bin with cum*100 >= p*total
    val q = LogHist.quantiles(sk, Seq("grp"), Seq(50, 99)).collect()
      .map(r => r.getInt(1) -> (r.getInt(2), r.getLong(3), r.getLong(4)))
      .toMap
    // total 1002, p50 rank = 501 → value 499 lives in bin 9? cum to
    // bin 9 = 2 + 511 = 513 >= 501 → bin 9, range [256, 511] — the
    // true p50 (~500) is inside
    assert(q(50) == ((9, 256L, 511L)))
    // p99 rank = 992.0 → cum bin 10 = 1002*… bin 10 cum = 1002? no:
    // bins: 0→2, 1..9 → 513, bin 10 covers 512..1000 → cum 1002;
    // 513*100 < 99*1002 so bin 10 wins; true p99 ≈ 990 ∈ [512, 1023]
    assert(q(99) == ((10, 512L, 1023L)))
    // merge law: sketch(A) ⊎ sketch(B) == sketch(A ++ B)
    val a = LogHist.sketch(vals.take(500).map(("g", _)).toDF("grp", "v"),
      "v", Seq("grp"))
    val b = LogHist.sketch(vals.drop(500).map(("g", _)).toDF("grp", "v"),
      "v", Seq("grp"))
    val merged = LogHist.merge(a, b, Seq("grp")).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(merged == exp)
  }

  test("corpus minhash estimates group jaccard near exact and " +
      "signatures merge by component-wise min") {
    import spark.implicits._
    // two corpora sharing half their docs → gram jaccard well over
    // 0.4; a third disjoint corpus → near 0
    val shared = (0 until 30).map(i => s"shared document number $i " +
      "with some common vocabulary about spark and data")
    val onlyA = (0 until 10).map(i => s"alpha exclusive text $i")
    val onlyB = (0 until 10).map(i => s"beta exclusive text $i")
    val other = (0 until 30).map(i =>
      s"完全不同的中文语料库内容第${i}条记录")
    val df = ((shared ++ onlyA).map(("a", _)) ++
      (shared ++ onlyB).map(("b", _)) ++ other.map(("c", _)))
      .toDF("corpus", "text")
    val sigs = Dedup.corpusMinhashSignatures(df, "text", "corpus",
      numHashes = 64, k = 4)
    val m = Dedup.corpusJaccardMatrix(sigs, "corpus", numHashes = 64)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("a", "b")) > 0.5, s"a~b ${m(("a", "b"))}")
    assert(m(("a", "c")) < 0.15 && m(("b", "c")) < 0.15)
    // merge = component-wise min: signatures over an even/odd doc
    // split merge to the whole-corpus signature
    val withId = df.filter(col("corpus") === "a")
      .withColumn("__i", monotonically_increasing_id())
    val arr1 = Dedup.corpusMinhashSignatures(
      withId.filter(col("__i") % 2 === 0), "text", "corpus", 64, 4)
      .collect()(0).getSeq[Long](1)
    val arr2 = Dedup.corpusMinhashSignatures(
      withId.filter(col("__i") % 2 === 1), "text", "corpus", 64, 4)
      .collect()(0).getSeq[Long](1)
    val whole = Dedup.corpusMinhashSignatures(
      df.filter(col("corpus") === "a"), "text", "corpus", 64, 4)
      .collect()(0).getSeq[Long](1)
    assert(arr1.zip(arr2).map(t => math.min(t._1, t._2)) == whole)
  }

  test("bm25 matches an independent plain-Scala replay and drops " +
      "no-term docs") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark join x"),
      (1L, "join y z"),
      (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // independent replay: N=3, avgdl=3, df(spark)=1, df(join)=2
    val (k1, b) = (1.2, 0.75)
    def idf(df: Int) = math.log((3 - df + 0.5) / (df + 0.5) + 1)
    def term(tf: Int, df: Int, dl: Int) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / 3.0))
    def r4(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue // Spark round()
    assert(got.keySet == Set(0L, 1L)) // doc 2 has no query term
    assert(got(0L) == r4(term(2, 1, 4) + term(1, 2, 4)))
    assert(got(1L) == r4(term(1, 2, 3)))
    // ranking sanity: the doc hitting both terms (one rare) wins
    assert(got(0L) > got(1L))
  }

  test("repetition stats: repeated text scores high, varied text low") {
    import spark.implicits._
    val rows = Seq(
      ("buy now buy now buy now buy now", "tmpl"),
      ("each word here appears exactly once overall", "varied"),
      ("", "empty"),
      ("solo", "one"))
      .toDF("text", "tag")
      .select(col("tag"),
        TextAnalysis.topWordFraction(col("text")).as("twf"),
        TextAnalysis.dupNgramFraction(col("text"), 2).as("dup2"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2))).toMap
    // "buy now"×4: top word 4/8; bigrams = 7 total, 2 distinct
    assert(rows("tmpl")._1 == 0.5)
    assert(math.abs(rows("tmpl")._2 - 5.0 / 7.0) < 1e-9)
    assert(rows("varied")._1 == 1.0 / 7.0 && rows("varied")._2 == 0.0)
    assert(rows("empty") == ((0.0, 0.0)))
    assert(rows("one") == ((1.0, 0.0)))
  }

  test("chunking covers every token with stride overlap") {
    import spark.implicits._
    val docs = Seq(
      (0L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (1L, "a b"), // shorter than one chunk
      (2L, "")) // empty → no chunks
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, "text", "doc_id",
        chunkSize = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(d0.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d0.map(_._4).toSeq == Seq(4L, 4L, 4L))
    assert(got.filter(_._1 == 1L).toSeq == Seq((1L, 0L, "a b", 2L)))
    assert(!got.exists(_._1 == 2L))
  }

  test("unigram LM score: common-token docs beat rare-token docs") {
    import spark.implicits._
    val corpus = Seq((0L, "the the the the cat"), (1L, "the the zyx"),
      (2L, "the cat")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProbScore(corpus, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L)._1 == 5 && got(1L)._1 == 3 && got(2L)._1 == 2)
    // avg micro-logprob: "the"-heavy doc 0 > doc 1 (contains the
    // rarest token zyx)
    assert(got(0L)._2 / 5.0 > got(1L)._2 / 3.0)
    // exact spot value: p(the)=7/10 → round(ln(0.7)*1e6) = -356675
    val lnThe = math.round(math.log(7.0 / 10.0) * 1e6)
    assert(got(2L)._2 == lnThe + math.round(math.log(2.0 / 10.0) * 1e6))
  }

  test("token entropy: uniform repetition 0, two even tokens 1 bit") {
    import spark.implicits._
    val got = Seq("a a a a", "a b", "", "a b c d")
      .toDF("text")
      .select(TextAnalysis.tokenEntropy(col("text")))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0 && got(1) == 1.0 && got(2) == 0.0 && got(3) == 2.0)
  }

  test("PII redaction replaces every class and counts each span once") {
    import spark.implicits._
    val row = Seq(
      ("mail bob.smith+x@corp.example.org and jo@a.io, host 10.20.30.40, " +
        "ssn 123-45-6789, call +1 (415) 555-0199 today"))
      .toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("red"),
        TextAnalysis.piiStats(col("text")).as("st"))
      .collect().head
    assert(row.getAs[String]("red") ==
      "mail [EMAIL] and [EMAIL], host [IP], ssn [SSN], call [PHONE] today")
    val st = row.getStruct(1)
    assert(st.getAs[Long]("n_email") == 2L)
    assert(st.getAs[Long]("n_ssn") == 1L)
    assert(st.getAs[Long]("n_ipv4") == 1L)
    assert(st.getAs[Long]("n_phone") == 1L)
  }

  test("PII redaction leaves clean text untouched") {
    import spark.implicits._
    val clean = "no personal data here just words and spaces"
    val got = Seq(clean).toDF("text")
      .select(TextAnalysis.redactPii(col("text"))).collect().head.getString(0)
    assert(got == clean)
  }

  test("fingerprints: identical docs share all, near-dups share most") {
    import spark.implicits._
    val fp = docs.select(col("doc_id"),
        TextAnalysis.fingerprints(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fp(0L) == fp(3L))
    val overlap01 = fp(0L).intersect(fp(1L)).size.toDouble /
      fp(0L).union(fp(1L)).size
    val overlap02 = fp(0L).intersect(fp(2L)).size.toDouble /
      fp(0L).union(fp(2L)).size
    assert(overlap01 > 0.5 && overlap02 < 0.2)
  }

  test("IVF ANN: trained buckets recall the brute-force top-1") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Ivf.trainCentroids(emb, "embedding", k = 8,
      iters = 5, sampleN = 500)
    assert(centroids.length == 8 && centroids.head.length == 64)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val brute = Similarity.bruteForceTopK(emb, probes, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ivf.topK(emb, probes, 1, centroids, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.keySet == brute.keySet)
    brute.keys.foreach(k => assert(ivf(k) == brute(k)))
  }

  test("IVF centroid training is independent of partition layout") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def train(df: org.apache.spark.sql.DataFrame) =
      Ivf.trainCentroids(df, "embedding", k = 4, iters = 3, sampleN = 300)
    val a = train(emb)
    // repartition (different layout, different partition answer order)
    // and coalesce (fewer, bigger partitions) must train byte-equal
    // centroids — an unordered limit(n) sample would differ here
    val b = train(emb.repartition(13))
    val c = train(emb.coalesce(1))
    assert(a == b && a == c)
  }

  test("PQ encode + ADC match a plain-Scala reference on random " +
      "vectors (integer-exact product quantization)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val books: Seq[Seq[Seq[Long]]] =
      Seq.fill(4)(Seq.fill(3)(Seq.fill(4)((rnd.nextInt(21) - 10).toLong)))
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(41) - 20).toLong)))
    def sqd(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def refEncode(v: Seq[Long]): Seq[Int] =
      books.zipWithIndex.map { case (cb, s) =>
        val sub = v.slice(s * 4, s * 4 + 4)
        cb.zipWithIndex.map { case (c, i) => (sqd(sub, c), i) }.min._2
      }
    def refAdc(p: Seq[Long], codes: Seq[Int]): Long =
      books.zipWithIndex.map { case (cb, s) =>
        sqd(p.slice(s * 4, s * 4 + 4), cb(codes(s)))
      }.sum
    val probe = vecs.head._2
    val df = vecs.toDF("vec_id", "q")
      .withColumn("codes", Pq.encodeInt(col("q"), books))
      .withColumn("adc", Pq.adcInt(
        array(probe.map(lit): _*), col("codes"), books))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](2).toSeq, r.getLong(3))).toMap
    vecs.foreach { case (id, v) =>
      val codes = refEncode(v)
      assert(df(id)._1 == codes, s"codes for $id")
      assert(df(id)._2 == refAdc(probe, codes), s"adc for $id")
    }
    // ADC of a vector against its own code equals its quantization
    // error — and the probe's ADC to itself is the minimum over
    // re-encodings of the probe
    assert(df(0L)._2 == refAdc(probe, refEncode(probe)))
  }

  test("adcTopK is per-probe: multi-probe results attribute to their " +
      "probe and match the single-probe runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val books: Seq[Seq[Seq[Long]]] =
      Seq.fill(4)(Seq.fill(3)(Seq.fill(4)((rnd.nextInt(21) - 10).toLong)))
    val corpus = (1 to 40).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(41) - 20).toLong)))
      .toDF("vec_id", "q")
    val probeRows = Seq(
      (100L, Seq.fill(16)((rnd.nextInt(41) - 20).toLong)),
      (200L, Seq.fill(16)((rnd.nextInt(41) - 20).toLong)))
    val both = Pq.adcTopK(corpus, probeRows.toDF("probe_id", "pq"),
        k = 5, books)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(both.length == 10)
    for ((pid, vec) <- probeRows) {
      val solo = Pq.adcTopK(corpus, Seq((pid, vec)).toDF("probe_id", "pq"),
          k = 5, books)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
      assert(both.filter(_._1 == pid).toSet == solo, s"probe $pid")
      // ranks are 1..5 in ADC-ascending order within the probe
      val ranked = both.filter(_._1 == pid).sortBy(_._4)
      assert(ranked.map(_._4).toSeq == (1 to 5))
      assert(ranked.map(_._3).toSeq == ranked.map(_._3).sorted.toSeq)
    }
  }

  test("minhash_agg custom aggregate matches per-doc signature semantics") {
    import graft.functions.MinHashAgg.minhash_agg
    val grams = Dedup.explodeGrams(docs, "text", "doc_id")
    val sigs = grams.groupBy("doc_id")
      .agg(minhash_agg(col("gram"), 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs.values.forall(_.size == 32))
    assert(sigs(0L) == sigs(3L)) // identical docs, identical signature
    def overlap(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count(p => p._1 == p._2).toDouble / 32
    assert(overlap(0L, 1L) > 0.5)  // near-dup
    assert(overlap(0L, 2L) < 0.3)  // unrelated

    // SQL registration path
    graft.Graft.install(spark)
    grams.createOrReplaceTempView("grams_v")
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_agg(gram, 32) AS sig FROM grams_v GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == sigs)
  }

  test("multimodal: format sniffing, metadata, stub features and frames") {
    import spark.implicits._
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++
      Array.tabulate(253)(_.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G') ++
      Array.tabulate(60)(i => (i * 3).toByte)
    val df = Seq((1L, jpeg), (2L, png)).toDF("media_id", "media")

    val meta = Multimodal.withMeta(df).select("media_id", "meta.format",
      "meta.n_bytes").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(meta(1L) == ("jpeg", 256L))
    assert(meta(2L) == ("png", 64L))

    val feats = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).size == 16)
    assert(math.abs(feats(1L).sum - 1.0f) < 1e-3) // normalized histogram

    val frames = Multimodal.sampleFramesStub(df, 4).collect()
    assert(frames.length == 8)
    assert(frames.map(_.getLong(0)).distinct.sorted.toSeq == Seq(1L, 2L))
  }

  test("multimodal: real PNG/GIF/JPEG/BMP pixel decode via javax.imageio") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xffffff)
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val df = Seq((1L, enc("png")), (2L, enc("gif")), (3L, enc("bmp")))
      .toDF("media_id", "media")
    val feats = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // the histogram is over DECODED pixels — half black (luminance
    // bin 0), half white (bin 15) — not over the compressed bytes,
    // which a byte-histogram stub would have produced
    for (id <- Seq(1L, 2L, 3L)) {
      assert(math.abs(feats(id)(0) - 0.5f) < 1e-6, s"media $id")
      assert(math.abs(feats(id)(15) - 0.5f) < 1e-6, s"media $id")
      assert(feats(id).slice(1, 15).forall(_ == 0f), s"media $id")
    }
    // same pixels in different LOSSLESS containers decode to
    // identical features: the operator is a function of the image,
    // not the byte stream
    assert(feats(1L) == feats(2L) && feats(1L) == feats(3L))
    // JPEG is lossy — DCT ringing smears the step edge — but the
    // decoded-pixel histogram still concentrates at the extremes,
    // which the byte-histogram stub (spread across JFIF/entropy-coded
    // bytes) never does
    val jf = Multimodal.extractFeatures(
      Seq((4L, enc("jpg"))).toDF("media_id", "media"))
      .collect().head.getSeq[Float](1)
    assert(math.abs(jf.sum - 1.0f) < 1e-3)
    assert(jf(0) > 0.4f && jf(15) > 0.4f)
    // truncated/malformed image payloads fall back to the stub
    // instead of erroring the batch
    val broken = Seq((9L, enc("png").take(20))).toDF("media_id", "media")
    val fb = Multimodal.extractFeatures(broken).collect()
    assert(fb.length == 1 && fb(0).getSeq[Float](1).sum > 0.99f)
  }

  test("multimodal: real WAV/PCM sample decode via javax.sound.sampled") {
    import spark.implicits._
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem}
    // square wave: half full-negative, half full-positive samples
    def wav(bits: Int): Array[Byte] = {
      val n = 1000
      val (fmt, raw) =
        if (bits == 16) {
          val f = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            8000f, 16, 1, 2, 8000f, false)
          val b = new Array[Byte](2 * n)
          for (i <- 0 until n) {
            val v = if (i % 2 == 0) Short.MinValue else Short.MaxValue
            b(2 * i) = (v & 0xff).toByte; b(2 * i + 1) = (v >> 8).toByte
          }
          (f, b)
        } else {
          val f = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
            8000f, 8, 1, 1, 8000f, false)
          (f, Array.tabulate[Byte](n)(i =>
            if (i % 2 == 0) 0x00.toByte else 0xff.toByte))
        }
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq((1L, wav(16)), (2L, wav(8))).toDF("media_id", "media")
    val feats = Multimodal.extractFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // histogram of DECODED samples: extremes only — a byte-histogram
    // of the container (RIFF header + alternating bytes) could not
    // put ~all mass in bins 0 and 15
    for (id <- Seq(1L, 2L)) {
      assert(feats(id)(0) > 0.45f, s"media $id: ${feats(id)}")
      assert(feats(id)(15) > 0.45f, s"media $id: ${feats(id)}")
      assert(feats(id).sum > 0.999f, s"media $id")
    }
    // a RIFF/WAVE header with a garbage body falls back to the stub
    val junk = "RIFF1234WAVEgarbage-not-a-fmt-chunk".getBytes
    val fb = Multimodal.extractFeatures(Seq((9L, junk))
      .toDF("media_id", "media")).collect()
    assert(fb.length == 1 && fb(0).getSeq[Float](1).sum > 0.99f)
  }

  test("multimodal: real MP4 frame demux — stsz/stsc/stco/stss walk " +
      "slices keyframe payloads out of mdat") {
    import spark.implicits._
    val payloads = (0 until 6).map(i =>
      s"frame-payload-$i-${"x" * (3 + i)}".getBytes)
    // keyframes at samples 1, 3, 5 (1-based)
    val mp4 = Mp4.build(payloads, Some(Seq(1, 3, 5)))

    // the index walk finds every sample at its exact byte extent
    val idx = Mp4.frameIndex(mp4).get
    assert(idx.length == 6)
    for ((f, i) <- idx.zipWithIndex) {
      val got = java.util.Arrays.copyOfRange(mp4, f.offset.toInt,
        (f.offset + f.size).toInt)
      assert(got.sameElements(payloads(i)), s"sample $i")
      assert(f.sync == (i % 2 == 0), s"sync flag of sample $i")
    }

    // the operator samples KEYFRAMES (1,3,5 → payload indices 0,2,4)
    val df = Seq((7L, mp4)).toDF("media_id", "media")
    val frames = Multimodal.sampleFrames(df, 4).collect()
      .map(r => (r.getInt(1), new String(r.getAs[Array[Byte]](2))))
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2))
    assert(frames.map(_._2).toSeq ==
      Seq(0, 2, 4).map(i => new String(payloads(i))))

    // even pick when keyframes outnumber the request: 2 of 3
    val two = Multimodal.sampleFrames(df, 2).collect()
      .map(r => new String(r.getAs[Array[Byte]](2))).toSeq
    assert(two == Seq(new String(payloads(0)), new String(payloads(2))))

    // no stss box → every sample is sync
    val all = Mp4.frameIndex(Mp4.build(payloads)).get
    assert(all.forall(_.sync))

    // co64 (64-bit chunk offsets) walks identically to stco
    val big = Mp4.frameIndex(
      Mp4.build(payloads, use64BitOffsets = true)).get
    assert(big.map(f => (f.sampleNo, f.size)) ==
      idx.map(f => (f.sampleNo, f.size)))

    // non-MP4 and truncated-MP4 payloads fall back to byte slices
    // instead of erroring
    val junk = Seq((8L, "not an mp4 at all, just bytes".getBytes),
      (9L, mp4.take(40))).toDF("media_id", "media")
    val fb = Multimodal.sampleFrames(junk, 4).collect()
    assert(fb.map(_.getLong(0)).distinct.sorted.toSeq == Seq(8L, 9L))
  }

  test("multimodal: MP4 walk survives random byte mutations without " +
      "throwing (the LegacyDat fuzz recipe)") {
    val payloads = (0 until 5).map(i => s"frame-$i-payload".getBytes)
    val good = Mp4.build(payloads, Some(Seq(1, 4)))
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val mutated = good.clone()
      for (_ <- 0 to rng.nextInt(4)) {
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      }
      // must return Some (possibly different frames) or None — never
      // throw, never emit an extent outside the blob
      Mp4.frameIndex(mutated).foreach(_.foreach { f =>
        assert(f.offset >= 0 && f.offset + f.size <= mutated.length)
      })
      // the operator-level fallback keeps total coverage
      assert(Multimodal.frameSlices(mutated, 3).nonEmpty)
    }
    // truncations at every length are equally typed
    for (len <- 0 until good.length by 7) {
      Mp4.frameIndex(good.take(len)).foreach(_.foreach { f =>
        assert(f.offset + f.size <= len)
      })
    }

    // crafted co64 offset near Long.MaxValue: `off + sz` wraps
    // negative without an overflow-safe bound check and the walk
    // would emit an out-of-blob extent
    val big64 = Mp4.build(payloads, use64BitOffsets = true)
    val co64 = big64.indexOfSlice("co64".getBytes)
    assert(co64 > 0)
    val evil = big64.clone()
    val huge = java.lang.Long.MAX_VALUE - 4
    for (i <- 0 until 8)
      evil(co64 + 12 + i) = (huge >>> (8 * (7 - i))).toByte
    assert(Mp4.frameIndex(evil).isEmpty)
  }

  test("multimodal: fragmented MP4 (moof/mdat) takes the typed " +
      "error-row path — one NULL row per file, never byte slices, " +
      "never a silent empty") {
    import spark.implicits._
    val frames = (0 until 3).map(i => s"frag-frame-$i".getBytes)
    val frag = Mp4.buildFragmented(frames)
    assert(Mp4.isFragmented(frag))
    assert(!Mp4.isFragmented(Mp4.build(frames))) // progressive is not
    assert(Mp4.frameIndex(frag).forall(_.isEmpty)) // moov has no samples

    val df = Seq((5L, frag), (6L, Mp4.build(frames))).toDF("media_id", "media")
    val sf = Multimodal.sampleFrames(df, 4).collect()
    val fragRows = sf.filter(_.getLong(0) == 5L)
    assert(fragRows.length == 1, "exactly one accounting row per file")
    assert(fragRows(0).isNullAt(2), "NULL frame payload")
    assert(sf.count(_.getLong(0) == 6L) == 3) // progressive twin demuxes

    val dec = Multimodal.decodeFrames(df, 4).collect()
      .filter(_.getLong(0) == 5L)
    assert(dec.length == 1 && dec(0).isNullAt(2) && dec(0).isNullAt(4))

    // fuzz: mutations of the fragmented container never throw, and
    // every surviving walk stays inside the blob
    val rng = new scala.util.Random(41)
    for (_ <- 0 until 200) {
      val mutated = frag.clone()
      for (_ <- 0 to rng.nextInt(5))
        mutated(rng.nextInt(mutated.length)) = rng.nextInt(256).toByte
      Mp4.isFragmented(mutated)
      Mp4.frameIndex(mutated).foreach(_.foreach { f =>
        assert(f.offset >= 0 && f.offset + f.size <= mutated.length)
      })
      assert(Mp4.isFragmented(mutated) ||
        Multimodal.frameSlices(mutated, 3).nonEmpty)
    }
    for (len <- 0 until frag.length by 5) {
      Mp4.isFragmented(frag.take(len))
      Mp4.frameIndex(frag.take(len))
    }
  }

  test("multimodal: MJPEG-in-MP4 decodes to exact pixel values " +
      "(demux → ImageIO → pixels, golden)") {
    import spark.implicits._
    def v(m: Int, f: Int)(x: Int, y: Int): Int =
      (37 * m + 11 * f + 13 * (x / 8) + 29 * (y / 8)) % 256
    val media = Seq(3, 7).map { m =>
      val frames = (0 until 3).map(f =>
        Multimodal.encodeGrayJpeg(24, 16, v(m, f)))
      (m.toLong, Mp4.build(frames))
    }.toDF("media_id", "media")
    val rows = Multimodal.decodeFrames(media, 3).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val m = r.getLong(0).toInt
      val f = r.getInt(1)
      assert(r.getInt(2) == 24 && r.getInt(3) == 16)
      val px = r.getSeq[Int](4)
      assert(px.length == 24 * 16)
      for (y <- 0 until 16; x <- 0 until 24)
        assert(px(y * 24 + x) == v(m, f)(x, y), s"m=$m f=$f ($x,$y)")
    }
    // a frame the codec rejects keeps its row with NULL pixels —
    // frame accounting stays total, nothing throws
    val mixed = Seq((9L, Mp4.build(Seq(
      Multimodal.encodeGrayJpeg(8, 8, (_, _) => 42),
      "definitely not a jpeg".getBytes)))).toDF("media_id", "media")
    val mr = Multimodal.decodeFrames(mixed, 2).collect()
      .sortBy(_.getInt(1))
    assert(mr.length == 2)
    assert(mr(0).getSeq[Int](4).forall(_ == 42))
    assert(mr(1).isNullAt(2) && mr(1).isNullAt(3) && mr(1).isNullAt(4))
  }

  test("multimodal: decodeFramesExpr ≡ decodeFrames row-for-row, with " +
      "a fully codegen plan (no object serialization boundary)") {
    import spark.implicits._
    def v(m: Int, f: Int)(x: Int, y: Int): Int =
      (37 * m + 11 * f + 13 * (x / 8) + 29 * (y / 8)) % 256
    val media = Seq(3, 7).map { m =>
      (m.toLong, Mp4.build((0 until 3).map(f =>
        Multimodal.encodeGrayJpeg(24, 16, v(m, f)))))
    } ++ Seq(
      (20L, "not a container at all, just some bytes".getBytes),
      (21L, Mp4.buildFragmented(Seq("f0".getBytes, "f1".getBytes))),
      (22L, Mp4.build(Seq(Multimodal.encodeGrayJpeg(8, 8, (_, _) => 9),
        "broken frame".getBytes))),
      (23L, null: Array[Byte]))
    val df = media.toDF("media_id", "media")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) Seq.empty[Int] else r.getSeq[Int](4))
    }.sortBy(t => (t._1, t._2)).toSeq
    val viaExpr = Multimodal.decodeFramesExpr(df, 3)
    assert(rows(viaExpr) == rows(Multimodal.decodeFrames(df, 3)))
    // the expression path has no object-serialization boundary and
    // runs inside whole-stage codegen (the mapPartitions variant
    // necessarily plans Deserialize/SerializeFromObject)
    val plan = viaExpr.queryExecution.executedPlan.toString
    assert(!plan.contains("SerializeFromObject") &&
      !plan.contains("MapPartitions"), plan)
    // `*(n)` marks a whole-stage-codegen stage; Generate, the decode
    // projection and the demux must all carry it
    assert(plan.contains("*(1) Generate"), plan)
    assert(plan.linesIterator.count(_.trim.startsWith("+- *(")) >= 2, plan)
    val mpPlan = Multimodal.decodeFrames(df, 3)
      .queryExecution.executedPlan.toString
    assert(mpPlan.contains("SerializeFromObject"))
  }

  test("dhash64: bit-exact vs an independent replay on random images, " +
      "invariant to constant brightness, NULL under the 9×8 grid") {
    import spark.implicits._
    import graft.functions.MediaFrameFunctions.{decode_gray_px, dhash64}
    val rnd = new scala.util.Random(61)
    // random gray PNGs (lossless → decoded pixels == authored pixels)
    def png(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, px(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def replay(w: Int, h: Int, px: (Int, Int) => Int): Long = {
      def cell(gx: Int, gy: Int): (Long, Long) = {
        val (xs, xe) = (gx * w / 9, (gx + 1) * w / 9)
        val (ys, ye) = (gy * h / 8, (gy + 1) * h / 8)
        val s = (for (y <- ys until ye; x <- xs until xe)
          yield px(x, y).toLong).sum
        (s, (xe - xs).toLong * (ye - ys))
      }
      (for (gy <- 0 until 8; gx <- 0 until 8) yield {
        val (sl, al) = cell(gx, gy); val (sr, ar) = cell(gx + 1, gy)
        if (sl * ar > sr * al) 1L << (gy * 8 + gx) else 0L
      }).reduce(_ | _)
    }
    val cases = (0 until 20).map { i =>
      val w = 9 + rnd.nextInt(40); val h = 8 + rnd.nextInt(40)
      val vals = Array.fill(h, w)(rnd.nextInt(256))
      (i.toLong, png(w, h, (x, y) => vals(y)(x)), replay(w, h, (x, y) => vals(y)(x)))
    }
    val got = cases.map(c => (c._1, c._2)).toDF("media_id", "media")
      .select(col("media_id"), dhash64(decode_gray_px(col("media"))).as("dh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    cases.foreach { case (id, _, expect) =>
      assert(got(id) == expect, s"image $id")
    }
    // gradient hash: constant brightness shift leaves every bit alone
    val base = Array.fill(16, 18)(rnd.nextInt(100))
    assert(replay(18, 16, (x, y) => base(y)(x)) ==
      replay(18, 16, (x, y) => base(y)(x) + 100))
    // under-grid and null are typed NULLs
    val tiny = Seq((0L, png(4, 4, (_, _) => 7)), (1L, null: Array[Byte]))
      .toDF("media_id", "media")
      .select(dhash64(decode_gray_px(col("media"))).as("dh")).collect()
    assert(tiny.forall(_.isNullAt(0)))
  }

  test("hammingNearDupPairs: banded equi-join ≡ brute force, one row " +
      "per pair (randomized)") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    // clustered hashes: groups around 30 random centers with few
    // flipped bits, so plenty of pairs land within every distance
    val centers = Array.fill(30)(rnd.nextLong())
    val hashes = (0L until 200L).map { i =>
      var h = centers(rnd.nextInt(centers.length))
      for (_ <- 0 until rnd.nextInt(12)) h ^= 1L << rnd.nextInt(64)
      (i, h)
    }
    val df = hashes.toDF("id", "hash")
    for (maxDist <- Seq(0, 3, 8)) {
      val got = Dedup.hammingNearDupPairs(df, "id", "hash", maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val expect = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        hd = java.lang.Long.bitCount(ha ^ hb) if hd <= maxDist
      } yield (a, b, hd.toLong)).sorted
      assert(got.length == got.distinct.length, s"dup pairs at $maxDist")
      assert(got.sorted.toSeq == expect, s"maxDist $maxDist")
    }
  }

  test("multimodal: a forged JPEG header claiming huge dimensions is " +
      "rejected at the header stage — no executor-killing allocation") {
    val real = Multimodal.encodeGrayJpeg(16, 16, (_, _) => 7)
    // patch the SOF0 frame header's height/width to 65535×65535
    // (≈4.3G pixels): ImageIO.read would attempt the full allocation
    val sof = real.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    val evil = real.clone()
    for (i <- 0 until 4) evil(sof + 5 + i) = 0xff.toByte
    assert(Multimodal.decodeGray(evil).isEmpty)
    assert(Multimodal.imageFeatures(evil, 16).isEmpty)
    // sane images still decode through the bounded reader
    assert(Multimodal.decodeGray(real).exists(_._3.forall(_ == 7)))
  }

  test("multimodal: MJPEG decode path survives random byte mutations " +
      "without throwing (the frame-path fuzz, through the codec)") {
    import spark.implicits._
    val frames = (0 until 3).map(f =>
      Multimodal.encodeGrayJpeg(16, 16, (x, y) => (16 * f + x + y) % 256))
    val good = Mp4.build(frames)
    val rng = new scala.util.Random(11)
    val mutated = (0 until 60).map { i =>
      val b = good.clone()
      for (_ <- 0 to rng.nextInt(6))
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      (i.toLong, b)
    }
    // one distributed pass over all mutants: decode must never throw;
    // every decoded frame reports a consistent pixel buffer
    val rows = Multimodal.decodeFrames(mutated.toDF("media_id", "media"), 3)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        assert(r.getInt(2) > 0 && r.getInt(3) > 0)
        assert(r.getSeq[Int](4).length == r.getInt(2) * r.getInt(3))
      }
    }
  }

  test("multimodal: header-parsed width/height/duration (no codec)") {
    import spark.implicits._
    def be32(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

    // PNG: magic + IHDR length/type + width=640 height=480
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
      0x0a) ++ be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++
      Array.fill[Byte](5)(0)
    // GIF89a: LE screen size 320×200
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++
      Array.fill[Byte](6)(0)
    // JPEG: SOI, APP0 segment (skipped), SOF0 with height=99 width=77
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(6) ++
      Array.fill[Byte](4)(0) ++
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(9) ++
      Array[Byte](8) ++ be16(99) ++ be16(77) ++ Array.fill[Byte](4)(0)
    // WAV: RIFF/WAVE, fmt byte-rate 4000 B/s, data 8000 B → 2000 ms
    val wav = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(1000) ++
      le32(4000) ++ le16(4) ++ le16(32) ++
      "data".getBytes ++ le32(8000)
    val junk = "hello world this is not media".getBytes
    // MP4: mvhd duration 2500 ms, video tkhd 1280×720
    val mp4 = Mp4.build(Seq("frame".getBytes), durationMs = 2500L,
      widthPx = 1280, heightPx = 720)

    val df = Seq((1L, png), (2L, gif), (3L, jpeg), (4L, wav), (5L, junk),
      (6L, mp4))
      .toDF("media_id", "media")
    val got = Multimodal.withMeta(df)
      .select("media_id", "meta.format", "meta.width", "meta.height",
        "meta.duration_ms")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap

    assert(got(1L) == ("png", Some(640), Some(480), None))
    assert(got(2L) == ("gif", Some(320), Some(200), None))
    assert(got(3L) == ("jpeg", Some(77), Some(99), None))
    assert(got(4L) == ("riff", None, None, Some(2000L)))
    assert(got(5L) == ("unknown", None, None, None))
    assert(got(6L) == ("mp4", Some(1280), Some(720), Some(2500L)))
  }
}
