package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StableHash

/** Deterministic sampling for training-data mixes. Unlike
  * `df.sample` (seeded per-partition RNG, changes under
  * repartitioning), membership here follows only the row's key hash,
  * so a sample is reproducible across runs, engines, and cluster
  * layouts, and re-sampling a grown corpus keeps every previously
  * selected row. All narrow operations — no shuffle.
  */
object Sampling {

  private val Buckets = 10000

  /** md5-derived bucket in [0, 10000) via the engine's shared
    * cross-engine hash ([[graft.functions.StableHash.md5Int60]]).
    */
  def hashBucket(keyCol: Column): Column =
    StableHash.md5Int60(keyCol.cast("string")) % Buckets

  /** Keep each row with probability `rate`, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: Column,
      rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"invalid rate: $rate")
    df.filter(hashBucket(keyCol) < math.round(rate * Buckets))
  }

  /** Rendezvous (highest-random-weight) shard routing: a row goes to
    * `argmax over shards of md5(key ":" shard)` — the classic HRW
    * rule (Thaler & Ravishankar 1998). Properties that matter at
    * 100 TB: placement is a pure function of (key, shard set) — no
    * routing table to keep consistent across 1000 executors — and
    * REMOVING a shard remaps only the rows that lived on it (each
    * survivor keeps its argmax), so shard loss triggers 1/n
    * redistribution instead of full reshuffle, unlike `key % n`.
    * Narrow column algebra (one md5 per shard per row), codegen'd,
    * no shuffle; cross-engine exact via the md5Int60 contract. Ties
    * break to the lexicographically greatest shard name via the
    * (weight, shard) struct max — deterministic both engines.
    */
  def rendezvousShard(keyCol: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty && shards.distinct == shards,
      s"shards must be non-empty and distinct: $shards")
    array_max(array(shards.map(sh =>
      struct(
        StableHash.md5Int60(
          concat(keyCol.cast("string"), lit(":" + sh))).as("w"),
        lit(sh).as("s"))): _*)).getField("s")
  }

  /** Build a target data mixture: derive per-stratum keep-rates so
    * the output matches `targets` proportions at the maximum feasible
    * size — the scarcest stratum (relative to its target share) is
    * kept whole and everything else is down-sampled to it; then
    * sample deterministically by key hash. Per-stratum counts are
    * collected to the driver (dimension-scale: strata are languages/
    * sources, not rows). A target stratum absent from the data makes
    * the mixture infeasible → empty result, by design.
    */
  def mixToTarget(df: DataFrame, keyCol: Column, strataCol: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"targets must be positive: $targets")
    require(math.abs(targets.values.sum - 1.0) < 1e-9,
      s"targets must sum to 1: $targets")
    val counts = df.groupBy(strataCol.as("__s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = targets.map { case (s, t) =>
      counts.getOrElse(s, 0L).toDouble / t
    }.min
    val rates = targets.map { case (s, t) =>
      val n = counts.getOrElse(s, 0L).toDouble
      // the scarce stratum's own rate is t·(n/t)/n, which double
      // arithmetic can land one ulp ABOVE 1.0 — clamp, or the
      // stratifiedSample precondition throws. The bucket threshold
      // is unchanged (round(·×10⁴) collapses the ulp either way)
      s -> (if (n == 0) 0.0 else math.min(1.0, t * cap / n))
    }
    stratifiedSample(df, keyCol, strataCol, rates, defaultRate = 0.0)
  }

  /** DSIR-style importance weighting for data selection (Xie et al.,
    * "Data Selection for Language Models via Importance Resampling"):
    * score each document by how much its hashed word-bigram features
    * look like a TARGET distribution versus the raw corpus. The
    * classic cheap domain-relevance signal — rank by weight, then
    * resample the top slice with [[deterministicSample]].
    *
    * Per-bucket log-likelihood ratios use add-one smoothing and are
    * quantized to integer micro-units before the per-doc sum, so
    * results are exact and partition-order-free (the q60 recipe).
    *
    * Scale shape: the exploded bigram stream collapses immediately
    * into a per-(doc, bucket) count table (map-side combined, one
    * shuffle on the doc/bucket pair); BOTH the bucket-count branch and
    * the scoring branch read that same aggregate. When every consumer
    * is unfiltered the plan carries ONE corpus scan with a
    * ReusedExchange; a downstream doc-id filter (q65's shape) pushes
    * below the final aggregate into the scoring branch only, which
    * diverges the two consumers and yields TWO scans — a filtered
    * scoring pass plus one unfiltered count pass (the totals must
    * cover the whole corpus, so that second scan is semantic, not
    * waste; PlanInvariantSpec pins it at exactly two). Bucket counts
    * reduce to at most `buckets` rows (a bounded dimension table) and
    * the scoring join BROADCASTS them — the Zipf-skewed feature stream
    * never shuffles on a feature key. At 100 TB this is one-to-two
    * corpus scans, one bigram-bag-sized shuffle, and one
    * doc-count-sized shuffle.
    *
    * Output: (id, n_feats, micro_importance).
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"invalid bucket count: $buckets")
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    // ONE pass over the corpus: explode, hash, and collapse to the
    // per-(doc, bucket) bag — everything downstream reuses this
    // exchange instead of re-reading the corpus
    val docBuckets = df.select(col(idCol), isTarget.as("__t"),
        explode(bigrams).as("__g"))
      .select(col(idCol), col("__t"),
        (StableHash.md5Int60(col("__g")) % buckets).as("__b"))
      .groupBy(col(idCol), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__n"))
    val counts = docBuckets.groupBy("__b").agg(
      sum("__n").as("__sc"),
      sum(when(col("__t"), col("__n")).otherwise(0L)).as("__tc"))
    // corpus/target totals via a global window over the ≤`buckets`
    // count rows — one tiny single-partition exchange, NOT a second
    // aggregation lineage that would re-scan the corpus (the plan
    // must carry exactly one unfiltered corpus pass)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val weights = counts
      .withColumn("__st", sum("__sc").over(all))
      .withColumn("__tt", sum("__tc").over(all))
      .select(col("__b"),
        round((log((col("__tc") + 1).cast("double") /
            (col("__tt") + buckets).cast("double")) -
          log((col("__sc") + 1).cast("double") /
            (col("__st") + buckets).cast("double"))) * 1e6)
          .cast("long").as("__w"))
    docBuckets.join(broadcast(weights), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum("__n").as("n_feats"),
        sum(col("__n") * col("__w")).as("micro_importance"))
  }

  /** Per-stratum deterministic sampling: a row's keep-rate is looked
    * up from `rates` by its stratum value (`defaultRate` otherwise).
    * The rate lookup compiles to a chained CASE — one codegen'd
    * predicate over the scan, no join.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      s"invalid rates: $rates default=$defaultRate")
    // math.round, not toLong: truncation would turn a rate whose
    // double product lands at n-ε (e.g. 0.29 × 10000 = 2899.999…)
    // into bucket threshold n-1, deterministically dropping one
    // bucket's worth of rows versus the declared rate
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultRate * Buckets))) { case ((stratum, rate), rest) =>
      when(strataCol === stratum, lit(math.round(rate * Buckets)))
        .otherwise(rest)
    }
    df.filter(hashBucket(keyCol) < threshold)
  }
}
