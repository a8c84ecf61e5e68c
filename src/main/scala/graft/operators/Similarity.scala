package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg.top_k_agg

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a single codegen'd scan, no
  * shuffle except the final top-k. Scale path: random-hyperplane LSH
  * buckets — probe and corpus shuffle on a small bucket key, so each
  * query compares against its bucket only (tunable recall via
  * multi-probe).
  */
object Similarity {

  /** Cosine similarity of two float arrays, accumulated in double
    * with left-to-right order (deterministic, oracle-matchable).
    * Compiles to [[graft.functions.CosineFloat]] — the same IEEE
    * sequence in one primitive loop (parity spec in
    * VecExpressionsSpec).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VecFunctions.cosine_float(a, b)

  /** Composed reference for [[cosine]] (parity spec). */
  private[operators] def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) =>
        p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Per-probe top-k of pre-scored rows via [[graft.functions.TopKAgg]]:
    * each task partial-aggregates its slice to ≤k entries per probe
    * before the shuffle, so only k·partitions rows move per probe —
    * unlike a `row_number` window, which funnels every scored row for
    * a probe through a single task.
    */
  def topKPerProbe(scored: DataFrame, k: Int,
      probeId: String, corpusId: String): DataFrame =
    scored
      .groupBy(col(probeId))
      .agg(top_k_agg(col("sim"), col(corpusId).cast("long"), k).as("__top"))
      .select(col(probeId), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(probeId), col("__e.id").as(corpusId),
        round(col("__e.score"), 4).as("sim"),
        (col("__pos") + 1).cast("int").as("rank"))

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009): combine
    * N ranked retrieval lists into one robust score per id —
    * `rrf(id) = Σ_arm 1/(k0 + rank_arm(id))`, an id absent from an
    * arm contributing 0. The standard hybrid-search combiner (lexical
    * BM25 + vector ANN): rank-based, so incomparable score scales
    * never need calibration.
    *
    * Each arm is `(name, df)` exposing `idCol` + `rankCol`; output
    * carries one nullable `rank_<name>` per arm plus `rrf`. Arms are
    * top-k-sized ranked lists, so every join input here is bounded —
    * fusion is dimension-scale work no matter how large the corpus
    * that produced the rankings (the full-outer equi-joins broadcast
    * at any sensible k).
    */
  def rrfFuse(arms: Seq[(String, DataFrame)], idCol: String,
      rankCol: String = "rank", k0: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    require(arms.map(_._1).distinct.size == arms.size,
      "rrfFuse arm names must be distinct")
    val renamed = arms.map { case (nm, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$nm"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    // fixed fold order (arm list order) keeps the double sum
    // bit-reproducible against the oracle
    val score = arms.map { case (nm, _) =>
      coalesce(lit(1.0) / (lit(k0) + col(s"rank_$nm")), lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf", score)
  }

  /** Brute-force top-k per probe: broadcast the (small) probe set,
    * score every corpus row, keep k per probe via a bounded top-k
    * aggregate. The corpus scan stays whole-stage codegen; only
    * k·partitions rows shuffle per probe.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "probe_id", probeVec: String = "probe_vec")
      : DataFrame = {
    val scored = corpus.crossJoin(broadcast(probes))
      .withColumn("sim", cosine(col(corpusVec), col(probeVec)))
    topKPerProbe(scored, k, probeId, corpusId)
  }

  /** Deterministic pseudo-random hyperplanes: `planes` vectors of
    * `dim` doubles derived from a seeded splittable generator.
    */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      val rnd = new scala.util.Random(seed + p)
      Seq.fill(dim)(rnd.nextGaussian())
    }

  /** Sign-bit LSH bucket key: bit p = (v · plane_p) >= 0. Same
    * hyperplanes on corpus and probes ⇒ cosine-similar vectors land
    * in the same bucket with high probability.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    graft.functions.VecFunctions.sign_bucket_float(vec, planes)

  /** Composed reference for [[lshBucket]] (parity spec). */
  private[operators] def lshBucketComposed(vec: Column,
      planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
      val d = aggregate(zip_with(vec, planeCol, (x, w) =>
        x.cast("double") * w), lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** LSH-bucketed ANN: corpus and probes are keyed by bucket and
    * equi-joined, then scored and top-k'd within the bucket. Misses
    * from bucket boundaries are the recall tradeoff; raise `planes`
    * fidelity or add multi-probe for tighter recall.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      planes: Seq[Seq[Double]],
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "probe_id", probeVec: String = "probe_vec")
      : DataFrame = {
    val c = corpus.withColumn("__bucket", lshBucket(col(corpusVec), planes))
    val p = probes.withColumn("__bucket", lshBucket(col(probeVec), planes))
    val scored = c.join(broadcast(p), Seq("__bucket"))
      .withColumn("sim", cosine(col(corpusVec), col(probeVec)))
    Similarity.topKPerProbe(scored, k, probeId, corpusId)
  }

  /** Multi-probe LSH ANN: each probe also searches the buckets one
    * bit-flip away (its `planes` Hamming-1 neighbors), recovering the
    * near-boundary misses that single-bucket LSH drops. Probe-side
    * fan-out only — the corpus stays bucketed once; the join key
    * count grows by planes+1 per probe, the corpus side not at all.
    * The standard recall knob when raising `planes` (which shrinks
    * buckets) would cut recall further.
    */
  def lshTopKMultiProbe(corpus: DataFrame, probes: DataFrame, k: Int,
      planes: Seq[Seq[Double]],
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "probe_id", probeVec: String = "probe_vec")
      : DataFrame = {
    val c = corpus.withColumn("__bucket", lshBucket(col(corpusVec), planes))
    val home = lshBucket(col(probeVec), planes)
    val candidates = array((home +: planes.indices.map(i =>
      home.bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val p = probes.withColumn("__bucket", explode(candidates))
    val scored = c.join(broadcast(p), Seq("__bucket"))
      .withColumn("sim", cosine(col(corpusVec), col(probeVec)))
    Similarity.topKPerProbe(scored, k, probeId, corpusId)
  }

  /** Fixed-point quantization of a float embedding: `round(x·scale)`
    * as BIGINT. All downstream dot products become exact integer
    * arithmetic — order-independent and bit-identical across engines
    * (a cross-engine-verifiable variant of the float path; also the
    * shape int8-quantized ANN indexes use at scale).
    */
  def quantize(vec: Column, scale: Int = 1000): Column =
    graft.functions.VecFunctions.quantize_vec(vec, scale)

  /** Composed reference for [[quantize]] (parity spec). */
  private[operators] def quantizeComposed(vec: Column,
      scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale, 0).cast("long"))

  /** Deterministic ±1 sign planes (seeded), for [[intLshBucket]]. */
  def signPlanes(dim: Int, planes: Int, seed: Long = 7L): Seq[Seq[Int]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(if (rnd.nextBoolean()) 1 else -1))
  }

  /** Sign-projection LSH bucket over a quantized (BIGINT) embedding
    * with ±1 planes: bit p = (q · plane_p) >= 0. Integer-exact — no
    * float-sign flips near zero, so the bucket assignment is
    * reproducible bit-for-bit in any engine.
    */
  def intLshBucket(qvec: Column, planes: Seq[Seq[Int]]): Column =
    graft.functions.VecFunctions.sign_bucket_int(qvec, planes)

  /** Composed reference for [[intLshBucket]] (parity spec). */
  private[operators] def intLshBucketComposed(qvec: Column,
      planes: Seq[Seq[Int]]): Column =
    planes.zipWithIndex.map { case (plane, i) =>
      val d = aggregate(zip_with(qvec, array(plane.map(p => lit(p.toLong)): _*),
        (x, w) => x * w), lit(0L), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Cosine over quantized (BIGINT) embeddings: integer dot products,
    * one double division at the end — deterministic across engines.
    */
  def cosineInt(a: Column, b: Column): Column =
    graft.functions.VecFunctions.cosine_int(a, b)

  /** Composed reference for [[cosineInt]] (parity spec). */
  private[operators] def cosineIntComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0L), (acc, v) => acc + v)
    dot(a, b).cast("double") /
      (sqrt(dot(a, a).cast("double")) * sqrt(dot(b, b).cast("double")))
  }

  /** Embedding-cosine near-duplicate pairs via shared LSH bucket +
    * cosine threshold — the embedding-space analogue of
    * [[Dedup.nearDupPairs]]. Float-plane convenience wrapper over
    * [[embeddingNearDupsBy]].
    */
  def embeddingNearDups(corpus: DataFrame, planes: Seq[Seq[Double]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    embeddingNearDupsBy(corpus, lshBucket(col(vecCol), planes),
      cosine, threshold, idCol, vecCol)

  /** Near-dup pairs generic over the bucket expression and similarity
    * function (float [[lshBucket]]/[[cosine]] or the integer-exact
    * [[intLshBucket]]/[[cosineInt]]).
    *
    * Exact-duplicate guard (mirrors [[Dedup.nearDupDedup]]'s
    * exact-dedup pre-pass): the bucket self-join runs over DISTINCT
    * vector values only — one representative per identical-vector
    * class — so a degenerate corpus (thousands of copies of one
    * embedding, all in one bucket) costs one groupBy instead of a
    * quadratic within-bucket scan. Duplicate classes are expanded
    * back afterwards with plain equi-joins: within-class pairs and
    * cross-class combinations are output rows either way, so that
    * expansion is output-bound, not wasted candidate work. No
    * `distinct()` anywhere — a vector has exactly one bucket and an
    * id exactly one class, so no branch can emit the same pair twice.
    */
  def embeddingNearDupsBy(corpus: DataFrame, bucket: Column,
      sim: (Column, Column) => Column, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // identical-vector classes: representative = min id. One shuffle
    // on the vector value; checkpointed because both the rep join and
    // the duplicate-class extraction read it
    val classes = corpus.groupBy(col(vecCol).as("__vec"))
      .agg(min(col(idCol)).as("__rep"), count(lit(1)).as("__cn"))
      .localCheckpoint(false)
    // membership rows for DUPLICATE classes only — in a typical
    // corpus this is a tiny (often empty) table, so everything that
    // touches it below broadcasts; singleton classes need no mapping
    // at all (rep == the only member)
    val dupMembers = corpus.select(col(idCol), col(vecCol).as("__vec"))
      .join(broadcast(classes.filter(col("__cn") >= 2)
        .select(col("__vec"), col("__rep"))), Seq("__vec"))
      .select(col(idCol), col("__rep"))
    // bucketed self-join over representatives only (the bucket
    // expression references vecCol, so re-expose __vec under it)
    val repsB = classes
      .select(col("__rep"), col("__vec").as(vecCol))
      .withColumn("__bucket", bucket)
    val l = repsB.select(col("__bucket"), col("__rep").as("ra"),
      col(vecCol).as("va"))
    val r = repsB.select(col("__bucket"), col("__rep").as("rb"),
      col(vecCol).as("vb"))
    val repPairs = l.join(r, Seq("__bucket"))
      .filter(col("ra") < col("rb"))
      .withColumn("__sim", sim(col("va"), col("vb")))
      .filter(col("__sim") >= threshold)
      .select(col("ra"), col("rb"), col("__sim"))
    // cross-class expansion: every member combination of a qualifying
    // representative pair is a true output pair (identical vectors ⇒
    // identical similarity). Broadcast left joins against the tiny
    // duplicate-membership table: a rep with no duplicate row IS its
    // class's only member
    val dm = (side: String) => dupMembers
      .select(col("__rep").as(side), col(idCol).as(s"__i$side"))
    val cross = repPairs
      .join(broadcast(dm("ra")), Seq("ra"), "left")
      .join(broadcast(dm("rb")), Seq("rb"), "left")
      .select(
        least(coalesce(col("__ira"), col("ra")),
          coalesce(col("__irb"), col("rb"))).as("a"),
        greatest(coalesce(col("__ira"), col("ra")),
          coalesce(col("__irb"), col("rb"))).as("b"),
        col("__sim"))
    // within-class pairs: identical vectors, sim = sim(v, v) — kept
    // behind the same threshold filter for exact drop-in parity.
    // Output-bound: duplicate classes only
    val classVecs = classes.filter(col("__cn") >= 2)
      .select(col("__rep").as("__crep"), col("__vec"))
    val within = dupMembers.alias("x")
      .join(dupMembers.alias("y"),
        col("x.__rep") === col("y.__rep") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .join(broadcast(classVecs), col("x.__rep") === col("__crep"))
      .withColumn("__sim", sim(col("__vec"), col("__vec")))
      .filter(col("__sim") >= threshold)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"),
        col("__sim"))
    cross.unionByName(within)
      .select(col("a"), col("b"), round(col("__sim"), 4).as("sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): partition the corpus into centroid clusters,
    * then drop every vector that has a LOWER-id neighbor at
    * `sim ≥ threshold` in the SAME cluster. Candidate generation is
    * [[embeddingNearDupsBy]] with the cluster id as the bucket — an
    * equi-join bounded by cluster size (plus its identical-vector
    * pre-dedup guard), never corpus×corpus — so the operator scales
    * exactly like IVF assignment: one codegen'd scan to cluster, one
    * bucketed self-join to pair.
    *
    * Keep rule, stated honestly: keep X iff X has no lower-id
    * in-cluster neighbor ≥ threshold — the single-pass min-id rule
    * this repo uses everywhere ([[graft.operators.Dedup]] streaming
    * "keep iff it near-dups nothing before it"), deterministic and
    * order-free. The paper's sequential greedy variant (drops can
    * re-admit later points) needs an iterative pass; at corpus scale
    * the one-pass rule is the shape that survives.
    */
  def semanticDedupBy(corpus: DataFrame, cluster: Column,
      sim: (Column, Column) => Column, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dropped = embeddingNearDupsBy(corpus, cluster, sim, threshold,
      idCol, vecCol)
      .select(col("b").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[semanticDedupBy]] over quantized vectors with fixed integer
    * centroids ([[Ivf.assignInt]] clusters + [[cosineInt]]) — the
    * cross-engine-exact form (q77).
    */
  def semanticDedup(corpus: DataFrame, centroids: Seq[Seq[Long]],
      threshold: Double, idCol: String = "vec_id",
      vecCol: String = "q"): DataFrame =
    semanticDedupBy(corpus, Ivf.assignInt(col(vecCol), centroids),
      cosineInt, threshold, idCol, vecCol)

  /** Contrastive hard-negative mining: for each anchor, keep its
    * highest-similarity candidate with a DIFFERENT label — the
    * "closest impostor" used to build contrastive/triplet training
    * pairs. Takes an already-generated candidate-pair table
    * (anchorCol, negCol, anchor label, candidate label, simCol);
    * candidate generation is the caller's choice of ANN — LSH/IVF
    * bucket joins at scale, a bounded verifier cross in oracle
    * checks (q85). Ties break on the lowest candidate id; with
    * integer-quantized cosine ([[cosineInt]]) the sims are
    * bit-identical across engines, so the winner is deterministic.
    */
  def hardNegatives(cands: DataFrame, anchorCol: String, negCol: String,
      anchorLabelCol: String, negLabelCol: String,
      simCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(anchorCol))
      .orderBy(desc(simCol), col(negCol))
    cands.filter(col(anchorLabelCol) =!= col(negLabelCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Maximal Marginal Relevance re-rank (Carbonell & Goldstein,
    * SIGIR'98): greedily pick k items maximizing
    * `λ10·rel − (10−λ10)·max_sim_to_selected` — the diversity pass a
    * retrieval stack runs AFTER rank fusion so near-duplicate hits
    * don't crowd the result page.
    *
    * Selection is inherently sequential in k and the input is a
    * top-N candidate trim (the q91 arm pattern — dimension-scale by
    * construction), so the greedy runs driver-side over the
    * collected candidates: a documented bounded collect, enforced by
    * `maxCandidates` (the RangeLookup.buildIndex class — never a
    * fact-scale action).
    *
    * Determinism contract: `relCol` and every pairwise cosine round
    * to 6 dp BEFORE entering a score, so cross-engine sqrt/division
    * ulp can't flip an argmax; score comparison itself is plain IEEE
    * on those rounded inputs, ties broken by ascending id. `vecCol`
    * is a quantized BIGINT vector ([[quantize]]); similarity is
    * integer-dot cosine ([[cosineInt]]'s formula).
    *
    * Output: (pos 1..k, idCol) in selection order.
    */
  def mmrRerank(cands: DataFrame, idCol: String, relCol: String,
      vecCol: String, k: Int, lambdaTenths: Int = 7,
      maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaTenths >= 0 && lambdaTenths <= 10,
      s"lambdaTenths in [0,10], got $lambdaTenths")
    val spark = cands.sparkSession
    def round6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val rows = cands
      .select(col(idCol).cast("long"), col(relCol).cast("double"),
        col(vecCol))
      .limit(maxCandidates + 1).collect()
    require(rows.length <= maxCandidates,
      s"mmrRerank candidates exceed maxCandidates=$maxCandidates — " +
        "trim to a top-N first (MMR is a re-ranker, not a ranker)")
    val items = rows.map { r =>
      (r.getLong(0), round6(r.getDouble(1)),
        r.getSeq[Long](2).toArray)
    }
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
        i += 1
      }
      round6(dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
    }
    val selected = scala.collection.mutable.ArrayBuffer[Int]()
    val maxSim = Array.fill(items.length)(0.0)
    val picked = Array.fill(items.length)(false)
    val rounds = math.min(k, items.length)
    var round = 0
    while (round < rounds) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < items.length) {
        if (!picked(i)) {
          val score =
            if (round == 0) lambdaTenths * items(i)._2
            else lambdaTenths * items(i)._2 -
              (10 - lambdaTenths) * maxSim(i)
          if (score > bestScore ||
            (score == bestScore && best >= 0 &&
              items(i)._1 < items(best)._1)) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true
      selected += best
      var j = 0
      while (j < items.length) {
        if (!picked(j)) {
          val s = cos(items(j)._3, items(best)._3)
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
      round += 1
    }
    import spark.implicits._
    selected.zipWithIndex
      .map { case (i, p) => ((p + 1).toLong, items(i)._1) }
      .toSeq.toDF("pos", idCol)
  }
}

/** IVF (inverted-file) ANN: k centroids are trained driver-side on a
  * sample (seeded Lloyd's iterations — centroid training is tiny and
  * one-off; the expensive parts, assignment and search, stay
  * distributed), the corpus is bucketed by nearest centroid, and each
  * probe searches only its `nprobe` nearest buckets. The bucket
  * assignment is pure column algebra (argmin over k distances), so
  * corpus bucketing is one codegen'd scan; search shuffles on the
  * small (probe × nprobe) bucket keys only.
  */
object Ivf {
  import org.apache.spark.sql.Row

  /** Seeded Lloyd's k-means over a collected sample.
    *
    * The sample is DETERMINISTIC in the data, not the layout: an
    * unordered `limit(n)` picks whichever partitions answer first, so
    * the trained centroids (and every downstream bucket assignment)
    * would differ across partition layouts, AQE decisions, and
    * cluster sizes. Membership here is by content-hash bucket
    * ([[Sampling.deterministicSample]] over the vector's rendered
    * elements) with a deterministic orderBy+limit trim, so the same
    * corpus always trains the same centroids — repartitioning the
    * input is a no-op by spec.
    */
  def trainCentroids(corpus: DataFrame, vecCol: String, k: Int,
      iters: Int = 10, sampleN: Int = 2000,
      seed: Long = 42L): Seq[Seq[Double]] = {
    val n = corpus.count()
    require(n > 0, "empty corpus")
    // 1.2× head-room over the target so hash-bucket variance rarely
    // undershoots sampleN; the orderBy+limit below trims the excess
    val rate = math.min(1.0, 1.2 * sampleN / n.toDouble)
    val keyed = corpus
      .select(col(vecCol), concat_ws(",", col(vecCol).cast("array<string>"))
        .as("__k"))
    val sample = Sampling.deterministicSample(keyed, col("__k"), rate)
      .orderBy("__k").limit(sampleN)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "empty sample (corpus rows hash-degenerate?)")
    val rnd = new scala.util.Random(seed)
    val dim = sample.head.length
    var centroids = rnd.shuffle(sample.toVector).take(k).map(_.clone()).toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids.map(_.toSeq).toSeq
  }

  /** One DISTRIBUTED Lloyd iteration over the FULL corpus in the
    * quantized integer space — [[trainCentroids]] iterates on a
    * driver-collected sample; this is the cluster-scale refinement
    * step (and the building block of corpus k-means for mixture
    * curation / SemDeDup-style clustering).
    *
    * Plan shape: assignment is the argmin column expression (one
    * codegen'd scan, no join), the per-cluster element sums are one
    * (cluster, dim) hash aggregate — map-side combined, so the
    * aggregate holds k×dim groups regardless of corpus size — and
    * only that k×dim summary is collected (k=8, dim=64 → 512 rows;
    * bounded by construction, the [[trainCentroids]] collect
    * rationale). Integer floor-division means keep the update exactly
    * reproducible cross-engine; an empty cluster keeps its previous
    * centroid (standard Lloyd convention).
    */
  def lloydStepInt(corpus: DataFrame, vecCol: String,
      centroids: Seq[Seq[Long]]): Seq[Seq[Long]] = {
    val dim = centroids.head.length
    val sums = corpus
      .select(assignInt(col(vecCol), centroids).as("__c"),
        posexplode(col(vecCol)).as(Seq("__p", "__v")))
      .groupBy("__c", "__p")
      .agg(sum("__v").as("__s"), count(lit(1)).as("__n"))
      .collect()
      .map(r => (r.getAs[Number]("__c").intValue,
        r.getAs[Number]("__p").intValue) ->
        (r.getAs[Long]("__s"), r.getAs[Long]("__n")))
      .toMap
    centroids.indices.map { c =>
      (0 until dim).map { p =>
        sums.get((c, p)) match {
          case Some((s, n)) => Math.floorDiv(s, n)
          case None => centroids(c)(p)
        }
      }
    }
  }

  private def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) {
        val x = v(i) - cs(c)(i); d += x * x; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def sqDist(vec: Column, centroid: Seq[Double]): Column =
    aggregate(zip_with(vec, array(centroid.map(lit): _*),
      (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)

  /** Nearest-centroid bucket id (argmin over k squared distances). */
  def assign(vec: Column, centroids: Seq[Seq[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(vec, c).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** The `nprobe` nearest bucket ids, as an array column. */
  def probeBuckets(vec: Column, centroids: Seq[Seq[Double]],
      nprobe: Int): Column =
    transform(
      slice(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
        struct(sqDist(vec, c).as("d"), lit(i).as("c"))
      }: _*)), 1, nprobe),
      s => s.getField("c"))

  /** Integer-exact variants over quantized (BIGINT) embeddings and
    * integer centroids — same IVF shape with engine-reproducible
    * arithmetic (see [[Similarity.quantize]]); [[trainCentroids]]
    * stays the float/recall-quality path.
    */
  private[operators] def sqDistInt(vec: Column, centroid: Seq[Long]): Column =
    aggregate(zip_with(vec, array(centroid.map(lit): _*),
      (x, c) => (x - c) * (x - c)), lit(0L), (acc, v) => acc + v)

  /** Nearest-centroid bucket over integer distances (ties → smaller
    * centroid index, exactly reproducible cross-engine).
    */
  def assignInt(vec: Column, centroids: Seq[Seq[Long]]): Column =
    graft.functions.VecFunctions.nearest_centroid_int(vec, centroids)

  /** Composed reference for [[assignInt]] (parity spec). */
  private[operators] def assignIntComposed(vec: Column,
      centroids: Seq[Seq[Long]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDistInt(vec, c).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** The `nprobe` nearest bucket ids over integer distances. */
  def probeBucketsInt(vec: Column, centroids: Seq[Seq[Long]],
      nprobe: Int): Column =
    graft.functions.VecFunctions.probe_buckets_int(vec, centroids, nprobe)

  /** Composed reference for [[probeBucketsInt]] (parity spec). */
  private[operators] def probeBucketsIntComposed(vec: Column,
      centroids: Seq[Seq[Long]], nprobe: Int): Column =
    transform(
      slice(array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
        struct(sqDistInt(vec, c).as("d"), lit(i).as("c"))
      }: _*)), 1, nprobe),
      s => s.getField("c"))

  /** IVF top-k: corpus bucketed once, probes fan out to their nprobe
    * buckets, cosine-scored within buckets, bounded top-k per probe.
    * A probe's nprobe buckets can land in different tasks; the top-k
    * aggregate's merge handles the cross-bucket combine.
    */
  def topK(corpus: DataFrame, probes: DataFrame, k: Int,
      centroids: Seq[Seq[Double]], nprobe: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      probeId: String = "probe_id", probeVec: String = "probe_vec")
      : DataFrame = {
    val c = corpus.withColumn("__bucket", assign(col(corpusVec), centroids))
    val p = probes.withColumn("__bucket",
      explode(probeBuckets(col(probeVec), centroids, nprobe)))
    val scored = c.join(broadcast(p), Seq("__bucket"))
      .withColumn("sim", Similarity.cosine(col(corpusVec), col(probeVec)))
    Similarity.topKPerProbe(scored, k, probeId, corpusId)
  }
}

/** Product quantization + asymmetric-distance (ADC) search — the
  * third classic ANN scale shape next to [[Ivf]] and the sign-LSH
  * buckets: the CORPUS compresses to one small code per subvector
  * (here `S` codes of `log2(K)` bits — memory drops from `dim`
  * floats to `S` bytes per vector, the property that lets a
  * billion-vector index live in RAM), probes stay full-precision,
  * and probe↔code distance is a per-subvector table lookup summed
  * across subvectors (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search").
  *
  * Integer-exact end to end (quantized vectors, integer codebooks,
  * integer distance tables) for the same cross-engine rationale as
  * [[Similarity.quantize]]/[[Ivf.assignInt]]: encoding and the ADC
  * ranking reproduce bit-for-bit in the DuckDB oracle. Codebooks are
  * per-subvector centroid lists `(S × K × subDim)`; production
  * trains them like [[Ivf.trainCentroids]] (per-subvector Lloyd's on
  * the deterministic sample), fixed seeded books keep the oracle
  * static.
  */
object Pq {

  /** Encode a quantized vector: per subvector, the index of its
    * nearest codebook centroid (integer distances, ties → lowest
    * index via [[Ivf.assignInt]]). Output ARRAY<INT> of length S.
    */
  def encodeInt(qvec: Column, codebooks: Seq[Seq[Seq[Long]]]): Column = {
    val w = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, s) =>
      Ivf.assignInt(slice(qvec, s * w + 1, w), cb)
    }: _*)
  }

  /** ADC distance from a full-precision (quantized-integer) probe to
    * an encoded corpus vector: Σ_s lut_s[code_s], where lut_s holds
    * the probe's squared distance to every centroid of subvector s.
    * The luts are expressions over the probe column — with a
    * broadcast single-probe (or small probe set) plan they evaluate
    * per output row in whole-stage codegen; no decode of the corpus
    * code ever happens.
    */
  def adcInt(probe: Column, codes: Column,
      codebooks: Seq[Seq[Seq[Long]]]): Column = {
    val w = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = slice(probe, s * w + 1, w)
      element_at(array(cb.map(c => Ivf.sqDistInt(sub, c)): _*),
        element_at(codes, s + 1) + 1)
    }.reduce(_ + _)
  }

  /** PQ-ADC top-k PER PROBE: encode the corpus once (S bytes per
    * row), cross the (small, broadcast) probe set, keep each probe's
    * k nearest by ADC ascending (ties → lowest corpus id) through the
    * same bounded [[graft.functions.TopKAgg]] every other ANN entry
    * point uses — map-side partials, so only k·partitions rows
    * shuffle per probe and the result is attributable per probe
    * (output: probeId, corpusId, adc, rank).
    *
    * The distance tables are materialized ON THE PROBE SIDE before
    * the broadcast — the LUT depends only on the probe, and
    * evaluating [[adcInt]]'s lut expressions per corpus row would
    * re-run S×K interpreted subvector distances per row (measured
    * ~2× the query time at sf0.1). With the LUT as a probe column,
    * the corpus-row work is S element_at lookups and adds — plain
    * codegen'd builtins, which is also the honest production shape:
    * real ADC implementations compute the tables once per query.
    */
  def adcTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      codebooks: Seq[Seq[Seq[Long]]],
      corpusId: String = "vec_id", corpusVec: String = "q",
      probeVec: String = "pq", probeId: String = "probe_id"): DataFrame =
    adcTopKEncoded(
      corpus.withColumn("__codes", encodeInt(col(corpusVec), codebooks)),
      probes, k, codebooks, corpusId, probeVec, probeId)

  /** [[adcTopK]] over an ALREADY-ENCODED corpus (a `__codes`
    * ARRAY<INT> column) — the entry point for a persisted PQ index
    * ([[AnnIndex]]), where the encode scan was paid once at build
    * time and searches read codes only.
    */
  def adcTopKEncoded(encoded: DataFrame, probes: DataFrame, k: Int,
      codebooks: Seq[Seq[Seq[Long]]],
      corpusId: String = "vec_id",
      probeVec: String = "pq", probeId: String = "probe_id"): DataFrame = {
    require(probes.columns.contains(probeId),
      s"adcTopK probes need a '$probeId' column to attribute results")
    val w = codebooks.head.head.length
    val withLuts = probes.withColumn("__luts",
      array(codebooks.zipWithIndex.map { case (cb, s) =>
        val sub = slice(col(probeVec), s * w + 1, w)
        array(cb.map(c => Ivf.sqDistInt(sub, c)): _*)
      }: _*))
    val adc = codebooks.indices.map(s =>
      element_at(element_at(col("__luts"), s + 1),
        element_at(col("__codes"), s + 1) + 1)).reduce(_ + _)
    // TopKAgg keeps (score DESC, id ASC); negating the integer
    // distance gives ADC ASC with the same lowest-id tie-break the
    // previous global ordering used. Integer ADC sums are far below
    // 2^53, so the double round-trip is exact.
    encoded.crossJoin(broadcast(withLuts))
      .withColumn("__negadc", -adc.cast("double"))
      .groupBy(col(probeId))
      .agg(graft.functions.TopKAgg.top_k_agg(col("__negadc"),
        col(corpusId).cast("long"), k).as("__top"))
      .select(col(probeId), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(probeId), col("__e.id").as(corpusId),
        (-col("__e.score")).cast("long").as("adc"),
        (col("__pos") + 1).cast("int").as("rank"))
  }
}

/** Scalar (int8) quantization — the simplest vector-compression
  * shape next to [[Pq]]: each corpus vector stores ONE integer scale
  * plus one code per dimension bounded to [-127, 127] (8 bytes/dim
  * at the quantized-long layout → ~1), and search scores corpus
  * codes against FULL-precision probes (asymmetric, the SQ analogue
  * of ADC): `score = s · Σ code_i · probe_i`. All arithmetic is
  * integer floor division and products, so the ranking is
  * bit-reproducible cross-engine — the property every other ANN
  * entry point here holds. The standard memory/recall midpoint:
  * better recall than PQ at the same probe cost, 8× smaller than raw
  * vectors (FAISS's `SQ8` index family is this shape).
  */
object Sq8 {

  /** Floor division (toward −∞) on integer columns — `pmod`-based so
    * negative numerators match the SQL `(x - ((x % s + s) % s)) / s`
    * formulation exactly. The numerator after the pmod subtraction
    * is divisible by `s`, so the double division is exact and the
    * long cast loses nothing.
    */
  private def floorDiv(x: Column, s: Column): Column =
    ((x - pmod(x, s)) / s).cast("long")

  /** Per-vector scale `max(1, ceil(maxabs / 127))` — codes land in
    * `[-127, 127]`; the all-zero vector clamps to scale 1 instead of
    * dividing by zero.
    */
  def scaleOf(qvec: Column): Column = {
    val m = array_max(transform(qvec, v => abs(v)))
    greatest(lit(1L), floorDiv(m + lit(126L), lit(127L)))
  }

  /** Codes for one vector at a given scale. */
  def encode(qvec: Column, scale: Column): Column =
    transform(qvec, v => floorDiv(v, scale))

  /** SQ8 top-k per probe: encode the corpus in-plan (scale + codes
    * per row), cross the broadcast probe set, keep each probe's k
    * LARGEST `s·⟨codes, probe⟩` scores (ties → lowest corpus id)
    * through the bounded [[graft.functions.TopKAgg]] — map-side
    * partials, k·partitions rows shuffled per probe, the same
    * scale shape as every other ANN entry point. Scores stay far
    * below 2^53, so the double round-trip through the aggregate is
    * exact. Output: (probeId, corpusId, sq8, rank).
    */
  def topK(corpus: DataFrame, probes: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "q",
      probeVec: String = "pq", probeId: String = "probe_id"): DataFrame =
    topKEncoded(
      corpus
        .withColumn("__s", scaleOf(col(corpusVec)))
        .withColumn("__c", encode(col(corpusVec), col("__s")))
        .drop(corpusVec),
      probes, k, corpusId, probeVec, probeId)

  /** [[topK]] over an already-encoded corpus (`__s` scale + `__c`
    * codes columns) — the entry point for persisted SQ8 artifacts.
    */
  def topKEncoded(encoded: DataFrame, probes: DataFrame, k: Int,
      corpusId: String = "vec_id",
      probeVec: String = "pq", probeId: String = "probe_id"): DataFrame = {
    require(probes.columns.contains(probeId),
      s"sq8 topK probes need a '$probeId' column to attribute results")
    val score = (col("__s") *
      aggregate(zip_with(col("__c"), col(probeVec), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)).cast("double")
    encoded.crossJoin(broadcast(probes))
      .groupBy(col(probeId))
      .agg(graft.functions.TopKAgg.top_k_agg(score,
        col(corpusId).cast("long"), k).as("__top"))
      .select(col(probeId), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col(probeId), col("__e.id").as(corpusId),
        col("__e.score").cast("long").as("sq8"),
        (col("__pos") + 1).cast("int").as("rank"))
  }
}
