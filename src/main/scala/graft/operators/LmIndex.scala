package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis.LmCounts

/** Persisted trigram-LM count artifact — the trained-model state of
  * [[TextAnalysis.stupidBackoff]] under the [[IndexDirs]] manifest
  * discipline.
  *
  * At 100 TB the LM count pass (tokenize + three n-gram hash
  * aggregates over the whole train corpus) dwarfs every scoring run
  * that uses it, and — unlike most trained models — n-gram counts
  * are PURE SUMS: shard counts merge by `groupBy(gram).sum`, a
  * removed document's counts subtract right back out. This module
  * turns that algebra into an on-disk artifact:
  *
  * {{{
  *   <path>/uni|bi|tri/    parquet count tables (gram, count)
  *   <path>/ids/           parquet (<id>, w ±1) — the doc ledger
  *                         backing the liveness/disjointness guards
  *   <path>/deltas/d<N>/{uni,bi,tri,ids}  appended (or, for deletes,
  *                         count-NEGATED) rows — visible only once
  *                         the manifest lists d<N>
  *   <path>/manifest.json  fingerprint + committed deltas — written
  *                         LAST (commit marker)
  * }}}
  *
  * Reads aggregate base ∪ committed deltas per gram and drop
  * `sum ≤ 0` rows, so an append is O(delta counts), a delete is an
  * append of negated counts (`fp' = fp ⊕ fold(delta)`, xor
  * self-inverse — the [[AnnIndex.delete]] rule without tombstones),
  * and [[compactDeltas]] is a SEMANTIC fold: it materializes the
  * aggregated sums and drops the zeros, after which a deleted doc
  * has no trace. The doc ledger (`ids`, weight ±1) makes the guards
  * exact: a doc is live iff its weight-sum is positive.
  *
  * Reference grounding: immutable loaded artifacts serving every
  * request (directory/directory.go:230-240), applied to LM state.
  */
object LmIndex {

  type Build = IndexBuild
  val Build = IndexBuild

  /** Order-independent fingerprint over the raw train rows. */
  def fingerprint(docs: DataFrame, idCol: String,
      textCol: String): (Long, Long) =
    IndexDirs.contentFingerprint(docs, Seq(idCol, textCol))

  /** On-disk layout version: 1 added the per-id content hash column
    * to the ids ledger. Part of the reuse identity, so a pre-hash
    * artifact (reads as 0) rebuilds once instead of failing reads.
    */
  private val LayoutVersion = 1

  private case class Manifest(fp: Long, n: Long, id: String,
      text: String, lv: Int = LayoutVersion, gbParts: Int = 0,
      ibp: Int = 0, st: Long = 0L, deltas: Seq[String] = Nil,
      lastBatch: Long = -1L, baseVer: Int = 0, mv: Long = 0L) {
    /** st (the live token total) is derived state like the delta
      * list — it never gates reuse; gbParts IS layout (a different
      * gram bucketing must rebuild).
      */
    def sameIndexAs(other: Manifest): Boolean =
      copy(st = 0L, deltas = Nil, lastBatch = -1L, baseVer = 0,
        mv = 0L) ==
        other.copy(st = 0L, deltas = Nil, lastBatch = -1L, baseVer = 0,
          mv = 0L)
    /** Live base dir of a table: versioned after a [[purge]]. */
    def baseOf(sub: String): String =
      if (baseVer == 0) sub else s"$sub.v$baseVer"
  }

  private def readManifest(path: String): Option[Manifest] =
    IndexDirs.readManifest(path).map { r =>
      Manifest(r.long("fp"), r.long("n"), r.str("id"), r.str("text"),
        r.intOr("lv", 0),
        // pre-bucketing manifests read gb=0/ibp=0, which can never
        // match a requested layout — they rebuild once, safely
        r.intOr("gb", 0), r.intOr("ibp", 0), r.longOr("st", 0L),
        r.seq("deltas"), r.longOr("lb", -1L), r.intOr("bv", 0),
        mv = r.version)
    }

  private def writeManifest(path: String, mf: Manifest): Unit =
    IndexDirs.manifest()
      .put("fp", mf.fp).put("n", mf.n)
      .put("id", mf.id).put("text", mf.text)
      .put("lv", mf.lv).put("gb", mf.gbParts).put("ibp", mf.ibp)
      .put("st", mf.st)
      .put("lb", mf.lastBatch).put("bv", mf.baseVer)
      .put("deltas", mf.deltas)
      .commit(path, mf.mv)

  private val tables = Seq(
    ("uni", "__w", "__cu"), ("bi", "__b", "__cb"), ("tri", "__t3", "__ct"))

  // max(,1): a legacy (gbParts = 0) artifact compacts/purges into one
  // gb=0 partition instead of a null-partition write
  private def gbCol(key: org.apache.spark.sql.Column, mf: Manifest) =
    pmod(xxhash64(key), lit(math.max(mf.gbParts, 1))).cast("int")

  private def ibCol(id: org.apache.spark.sql.Column, mf: Manifest) =
    pmod(xxhash64(id), lit(math.max(mf.ibp, 1))).cast("int")

  /** Write the four tables of `docs` (scaled by `sign` — deletes
    * stage the SAME rows with negated counts) under `root`, each
    * count table partitioned by its key's gram-hash bucket (`gb`).
    * Returns the SIGNED token total of the staged rows — the
    * manifest-carried `st` advances by it, so the scoring-time N
    * never needs a unigram-table aggregate.
    */
  private def writeTables(docs: DataFrame, textCol: String,
      idCol: String, sign: Int, mf: Manifest, root: String): Long = {
    // ONE tokenize pass: the token arrays (plus the id ledger's
    // columns) checkpoint once, and the four table writes explode
    // from the checkpoint — it used to be four independent scans of
    // `docs`, three of them re-running the tokenizer (guide §1.2:
    // the distributed algorithm first; tokenization IS the LM
    // build's corpus cost). The [[Bm25Index.writeTables]] recipe.
    // SIZE-GATED (guide §5): for CDC deltas and small builds the
    // checkpoint is delta-sized and the wins are real; a full-corpus
    // build past the budget must NOT materialize the tokenized corpus
    // to executor-local disk — it keeps the multi-scan form (each
    // write re-tokenizes off the scan, sequentially, exactly the
    // pre-fusion shape) and derives the token total from the written
    // unigram table (gram-scale, not corpus-scale).
    val tokSrc = docs
      .select(col(idCol),
        xxhash64(col(idCol), col(textCol)).as("__ch"),
        TextAnalysis.tokens(lower(col(textCol))).as("__a"))
    val small = Par.fitsCheckpointBudget(docs)
    val toks = if (small) tokSrc.localCheckpoint() else tokSrc
    val streams = Seq(
      toks.select(explode(col("__a")).as("__w")),
      toks.select(explode(expr(TextAnalysis.lmGrams(2,
        "concat(__a[i], ' ', __a[i+1])"))).as("__b")),
      toks.select(explode(expr(TextAnalysis.lmGrams(3,
        "concat(__a[i], ' ', __a[i+1], ' ', __a[i+2])"))).as("__t3")))
    // repartition on gb before each partitioned write: one file per
    // bucket instead of (tasks × buckets) tiny files. The four
    // writes and the signed-total count are independent given the
    // checkpoint — run them CONCURRENTLY (guide §2.6)
    val gramWrites = streams.zip(tables).map {
      case (stream, (sub, key, cnt)) => () =>
        stream.groupBy(key).agg(count(lit(1)).as(cnt))
          .withColumn(cnt, col(cnt) * sign)
          .withColumn("gb", gbCol(col(key), mf))
          .repartition(col("gb"))
          .write.mode("overwrite").partitionBy("gb")
          .parquet(s"$root/$sub")
    }
    val idsWrite = () => toks
      .select(col(idCol), col("__ch"), lit(sign).as("__lw"))
      .withColumn("ib", ibCol(col(idCol), mf))
      .repartition(col("ib"))
      .write.mode("overwrite").partitionBy("ib").parquet(s"$root/ids")
    if (small) {
      // the signed total is the exploded unigram stream's row count
      // off the checkpoint (the value the written uni counts sum to —
      // same number, no read-back dependency on the uni write)
      @volatile var st = 0L
      val total = () => { st = streams.head.count() * sign }
      Par.inParallel(gramWrites ++ Seq(idsWrite, total))
      st
    } else {
      // corpus-scale: sequential scans (no checkpoint to share, and N
      // concurrent corpus scans would fight for the same I/O), total
      // read back from the staged uni table's already-signed counts
      (gramWrites :+ idsWrite).foreach(_())
      docs.sparkSession.read.parquet(s"$root/uni")
        .agg(coalesce(sum(col("__cu")), lit(0L)))
        .collect()(0).getLong(0)
    }
  }

  /** Aggregated live rows of one table: base ∪ committed deltas,
    * summed per key, `sum ≤ 0` dropped (a fully-deleted gram is
    * absent, exactly as if its docs were never trained on). `parts`
    * prunes each read to the given gb partition values — the scoring
    * path passes the scored batch's gram buckets.
    */
  private def readAgg(spark: SparkSession, path: String, mf: Manifest,
      sub: String, key: String, cnt: String,
      parts: Option[Seq[Int]] = None): DataFrame = {
    val roots = s"$path/${mf.baseOf(sub)}" +:
      mf.deltas.map(d => s"$path/deltas/$d/$sub")
    roots.map { r =>
        val df = spark.read.parquet(r)
        parts.fold(df)(w => df.filter(col("gb").isin(w.map(Int.box): _*)))
      }.reduce(_.unionByName(_))
      .groupBy(key).agg(sum(col(cnt)).as(cnt))
      .filter(col(cnt) > 0)
  }

  /** Live `(id, __ch)` ledger rows — weight-cancelled per (id,
    * contentHash), so a delete + re-append with new text leaves
    * exactly the new pair live. Each root PRUNED to `parts` ib
    * partitions when given (legacy unbucketed roots read whole —
    * correct, just unpruned).
    */
  private def liveIds(spark: SparkSession, path: String, mf: Manifest,
      parts: Option[Seq[Int]] = None): DataFrame = {
    val roots = s"$path/${mf.baseOf("ids")}" +:
      mf.deltas.map(d => s"$path/deltas/$d/ids")
    roots.map { r =>
        val df = spark.read.parquet(r)
        val pruned =
          if (parts.isDefined && df.columns.contains("ib"))
            df.filter(col("ib").isin(parts.get.map(Int.box): _*))
          else df
        pruned.select(col(mf.id), col("__ch"), col("__lw"))
      }.reduce(_.unionByName(_))
      .groupBy(mf.id, "__ch").agg(sum(col("__lw")).as("__lw"))
      .filter(col("__lw") > 0).select(col(mf.id), col("__ch"))
  }

  /** The ledger read every append/delete guard runs: pruned to the
    * probe ids' own ib buckets (O(delta buckets), never the whole
    * corpus ledger) — an id not present anywhere cannot hide outside
    * its hash bucket, so the prune never weakens the guard.
    * Package-visible so the spec pins the pruned scan in the plan.
    */
  private[operators] def liveIdsForProbe(spark: SparkSession,
      path: String, probeIds: DataFrame): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    liveIdsPruned(spark, path, mf, probeIds)
  }

  private def liveIdsPruned(spark: SparkSession, path: String,
      mf: Manifest, probeIds: DataFrame): DataFrame = {
    val parts =
      if (mf.ibp == 0) None
      else Some(probeIds.select(ibCol(col(mf.id), mf).as("ib"))
        .distinct().collect().map(_.getInt(0)).toSeq)
    liveIds(spark, path, mf, parts)
  }

  /** The manifest-visible aggregated count tables, ready for
    * [[TextAnalysis.stupidBackoffFrom]].
    */
  def counts(spark: SparkSession, path: String): LmCounts = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    val Seq(u, b, t) = tables.map { case (sub, key, cnt) =>
      readAgg(spark, path, mf, sub, key, cnt) }
    LmCounts(u, b, t)
  }

  /** [[TextAnalysis.stupidBackoff]] scoring against the persisted
    * counts — the train pass never re-runs and the token-total N
    * rides the MANIFEST (no unigram-table aggregate, no 1-row cross
    * in the serve plan). Reads the full live count tables: the right
    * shape for CORPUS-SWEEP scoring (quality gates, CCNet buckets),
    * where the batch's gram set touches every bucket anyway. A
    * pre-bucketing artifact (gbParts = 0) falls back to the live N
    * aggregate.
    */
  def score(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    TextAnalysis.stupidBackoffFrom(counts(spark, path), docs, idCol,
      textCol, alpha,
      totalTokens = if (mf.gbParts == 0) None else Some(mf.st))
  }

  /** [[score]]'s SMALL-BATCH serving shape: each count-table read is
    * PRUNED to the gb buckets the batch's own grams hash to (three
    * bounded ≤ gbParts-int collects over the batch) — a handful of
    * scored docs reads a few gram buckets of a trillion-gram LM,
    * never the whole table. Scores equal [[score]] exactly (pruning
    * only removes rows that cannot join; N rides the manifest). Use
    * [[score]] for corpus sweeps, where the batch saturates every
    * bucket and the probe passes are pure overhead.
    */
  def scoreBatch(spark: SparkSession, path: String, docs: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (mf.gbParts == 0)
      return score(spark, path, docs, idCol, textCol, alpha)
    val (u, b, t) = TextAnalysis.lmGramStreams(docs, textCol)
    def buckets(stream: DataFrame, key: String): Seq[Int] =
      stream.select(gbCol(col(key), mf).as("gb"))
        .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = LmCounts(
      readAgg(spark, path, mf, "uni", "__w", "__cu",
        Some(buckets(u, "__w"))),
      readAgg(spark, path, mf, "bi", "__b", "__cb",
        Some(buckets(b, "__b"))),
      readAgg(spark, path, mf, "tri", "__t3", "__ct",
        Some(buckets(t, "__t3"))))
    TextAnalysis.stupidBackoffFrom(pruned, docs, idCol, textCol,
      alpha, totalTokens = Some(mf.st))
  }

  /** Build the artifact at `path` unless the manifest fingerprint
    * matches the train corpus — the count pass is skipped entirely
    * on reuse.
    */
  def buildIfAbsent(train: DataFrame, textCol: String, idCol: String,
      path: String, gbParts: Int = 16, ibParts: Int = 16): Build = {
    val (fp, n) = fingerprint(train, idCol, textCol)
    val want = Manifest(fp, n, idCol, textCol, gbParts = gbParts,
      ibp = ibParts)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        IndexDirs.uncommit(path)
        val st = writeTables(train, textCol, idCol, 1, want, path)
        writeManifest(path, want.copy(st = st))
        Build(path, fp, n, reused = false)
    }
  }

  /** Extend the LM with NEW documents: only the delta pays the count
    * pass; its counts stage in `deltas/d<N>` (manifest-gated), and
    * the fingerprint composes in O(delta). `checkDisjoint` (default
    * on) verifies no delta id is already live — double-counting a
    * doc corrupts both the counts and the fingerprint.
    */
  def append(delta: DataFrame, path: String,
      checkDisjoint: Boolean = true): Build =
    appendImpl(delta, path, checkDisjoint, None)

  private def appendImpl(delta: DataFrame, path: String,
      checkDisjoint: Boolean, batchMark: Option[Long]): Build = {
    val spark = delta.sparkSession
    // layout/columns are immutable across appends (only a rebuild
    // changes them, and a rebuild uncommits), so staging off this
    // read is race-free; counters, delta list, and the disjointness
    // guard re-derive per commit attempt (multi-writer liveness —
    // the [[AggView]]/[[IndexDirs.commitWithRetry]] recipe)
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl.id, decl.text)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val probeIds = delta.select(col(decl.id)).distinct()
      .localCheckpoint(false)
    // disjointness guard, verified against the manifest an attempt
    // anchors at (a concurrent overlapping append must flip this to
    // refuse on retry)
    def disjointOk(have: Manifest): Unit = if (checkDisjoint) {
      val dupes = liveIdsPruned(spark, path, have, probeIds)
        .join(broadcast(probeIds), Seq(have.id), "left_semi")
        .count()
      require(dupes == 0,
        s"append delta shares $dupes live id(s) with the LM at " +
          s"$path — re-training a doc double-counts its grams " +
          "(pass checkDisjoint = false only when upstream proves it)")
    }
    val staged = IndexDirs.nextDeltaName(path, "d")
    // guard ∥ staging (guide §2.6); re-verified in the loop only when
    // another writer moved the manifest
    @volatile var dst = 0L
    try Par.inParallel(Seq(
      () => disjointOk(decl),
      () => dst = writeTables(delta, decl.text, decl.id, 1, decl,
        s"$path/deltas/$staged")))
    catch { case e: Throwable =>
      IndexDirs.gcDeltas(path, Seq(staged)); throw e
    }
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (batchMark.exists(_ <= have.lastBatch)) None
      else {
        if (have.mv != decl.mv) disjointOk(have)
        Some(have.copy(fp = have.fp ^ dfp, n = have.n + dn,
          st = have.st + dst, deltas = have.deltas :+ staged,
          lastBatch = batchMark.getOrElse(have.lastBatch)))
      }
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None => // a racing replay landed this batch id first
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  /** Remove documents from the LM: the count algebra makes a delete
    * an append of NEGATED counts — `delta` carries the full
    * `(id, text)` rows being removed, their n-gram counts stage with
    * `× -1`, reads sum to zero and drop the grams, and the
    * fingerprint folds the rows back out (xor self-inverse). After a
    * [[compactDeltas]], the artifact is bit-for-bit the one trained
    * without those docs. `checkPresent` verifies liveness against
    * the doc ledger.
    */
  def delete(delta: DataFrame, path: String,
      checkPresent: Boolean = true): Build = {
    val spark = delta.sparkSession
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    val (dfp, dn) = fingerprint(delta, decl.id, decl.text)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val probe = delta.select(col(decl.id),
        xxhash64(col(decl.id), col(decl.text)).as("__pch"))
      .distinct().localCheckpoint(false)
    if (checkPresent) require(probe.count() == dn,
      s"delete delta has duplicate ${decl.id} rows")
    // liveness + content verified per commit attempt against the
    // manifest the attempt anchors at (a concurrent delete of the
    // same ids must flip this from pass to refuse on retry)
    def presentOk(have: Manifest): Unit = if (checkPresent) {
      val r = liveIdsPruned(spark, path, have, probe)
        .join(broadcast(probe), Seq(have.id))
        .agg(count(lit(1)).as("live"),
          coalesce(sum(when(col("__ch") === col("__pch"), 1L)
            .otherwise(0L)), lit(0L)).as("same"))
        .collect()(0)
      require(r.getLong(0) == dn,
        s"delete delta names ${dn - r.getLong(0)} id(s) not live in " +
          s"the LM at $path (pass checkPresent = false only when " +
          "upstream proves liveness)")
      require(r.getLong(1) == dn,
        s"delete delta text differs from the trained text for " +
          s"${dn - r.getLong(1)} id(s) at $path — negated counts " +
          "computed from stale text would never cancel the stored grams")
    }
    val staged = IndexDirs.nextDeltaName(path, "d")
    // guard ∥ staging (guide §2.6): both depend only on the anchor
    // manifest; a guard failure interrupts the sibling staging and
    // GCs its dir, and the commit loop re-verifies only when another
    // writer moved the manifest — the no-race case pays the guard
    // once, off the critical path
    @volatile var dst = 0L
    try Par.inParallel(Seq(
      () => presentOk(decl),
      () => dst = writeTables(delta, decl.text, decl.id, -1, decl,
        s"$path/deltas/$staged")))
    catch { case e: Throwable =>
      IndexDirs.gcDeltas(path, Seq(staged)); throw e
    }
    val next = IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (have.mv != decl.mv) presentOk(have)
      Some(have.copy(fp = have.fp ^ dfp, n = have.n - dn,
        st = have.st + dst, deltas = have.deltas :+ staged))
    }.get
    Build(path, next.fp, next.n, reused = false)
  }

  /** Exactly-once streaming LM maintenance — the [[AnnIndex]]
    * idempotent-sink recipe (`batchId <= lastBatch` ⇒ skip).
    */
  def appendBatch(batch: DataFrame, batchId: Long, path: String,
      checkDisjoint: Boolean = false): Build =
    appendImpl(batch, path, checkDisjoint, Some(batchId))

  def foreachBatchSink(path: String, checkDisjoint: Boolean = false)
      : (DataFrame, Long) => Unit =
    (df, id) => { appendBatch(df, id, path, checkDisjoint); () }

  /** Exactly-once OP-AWARE streaming maintenance: one CDC micro-batch
    * of full `(id, text, op)` rows stages its deletes as NEGATED
    * count tables and its inserts as positive ones, then commits BOTH
    * in ONE manifest write with the batch watermark — an
    * at-least-once replay (`batchId <= lastBatch`) skips the whole
    * batch, and a crash between stagings leaves only orphans. The
    * count algebra makes a same-batch delete + insert of one id a
    * legal UPDATE (old counts cancel, new counts stand); delete rows
    * must be the exact trained rows and live — the streaming feed
    * proves this upstream (the guarded batch path is [[delete]]).
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String,
      opCol: String = "op", deleteOp: String = "D"): Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (batchId <= decl.lastBatch)
      return Build(path, decl.fp, decl.n, reused = true)
    val rows = batch.localCheckpoint(false)
    val ins = rows.filter(col(opCol) =!= deleteOp).drop(opCol)
    val del = rows.filter(col(opCol) === deleteOp).drop(opCol)
    val (ifp, inN) = fingerprint(ins, decl.id, decl.text)
    val (dfp, delN) = fingerprint(del, decl.id, decl.text)
    if (inN == 0 && delN == 0)
      return Build(path, decl.fp, decl.n, reused = true)
    var stagedDirs = Seq.empty[String]
    var dst = 0L
    if (delN > 0) {
      val staged = IndexDirs.nextDeltaName(path, "d")
      dst += writeTables(del, decl.text, decl.id, -1, decl,
        s"$path/deltas/$staged")
      stagedDirs :+= staged
    }
    if (inN > 0) {
      val staged = IndexDirs.nextDeltaName(path, "d")
      dst += writeTables(ins, decl.text, decl.id, 1, decl,
        s"$path/deltas/$staged")
      stagedDirs :+= staged
    }
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, stagedDirs) { have =>
      if (batchId <= have.lastBatch) None // a racing replay landed it
      else Some(have.copy(fp = have.fp ^ ifp ^ dfp,
        n = have.n + inN - delN, st = have.st + dst,
        deltas = have.deltas ++ stagedDirs, lastBatch = batchId))
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None =>
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  /** `writeStream.foreachBatch(LmIndex.cdcSink(path))`. */
  def cdcSink(path: String, opCol: String = "op",
      deleteOp: String = "D"): (DataFrame, Long) => Unit =
    (df, id) => { applyBatch(df, id, path, opCol, deleteOp); () }

  /** Fold the DELTA stream into one directory, O(total delta size):
    * per-gram sums across the delta dirs only, nonzero rows kept —
    * including NEGATIVE ones, which must survive to keep cancelling
    * base counts (a delete of a base-trained doc lives in the deltas
    * as negated counts until a [[purge]]). Bounds per-score listing
    * and footer costs after long append/delete streams without
    * touching the base. Crash-safe by the staging discipline.
    */
  def compactDeltas(spark: SparkSession, path: String): Int = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (decl.deltas.length < 2) return 0
    val folded = decl.deltas
    val staged = IndexDirs.nextDeltaName(path, "c")
    // the four table folds are independent — run them CONCURRENTLY
    // (guide §2.6)
    val gramFolds = tables.map { case (sub, key, cnt) => () =>
      folded.map(d => spark.read.parquet(s"$path/deltas/$d/$sub"))
        .reduce(_.unionByName(_))
        .groupBy(key).agg(sum(col(cnt)).as(cnt))
        .filter(col(cnt) =!= 0)
        .withColumn("gb", gbCol(col(key), decl))
        .repartition(col("gb"))
        .write.mode("overwrite").partitionBy("gb")
        .parquet(s"$path/deltas/$staged/$sub")
    }
    // the ids ledger cancels per (id, contentHash) pair
    val idsFold = () =>
      folded.map(d => spark.read.parquet(s"$path/deltas/$d/ids")
          .select(col(decl.id), col("__ch"), col("__lw")))
        .reduce(_.unionByName(_))
        .groupBy(decl.id, "__ch").agg(sum(col("__lw")).as("__lw"))
        .filter(col("__lw") =!= 0)
        .withColumn("ib", ibCol(col(decl.id), decl))
        .repartition(col("ib"))
        .write.mode("overwrite").partitionBy("ib")
        .parquet(s"$path/deltas/$staged/ids")
    Par.inParallel(gramFolds :+ idsFold)
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      // deltas that landed after our fold survive (count algebra is
      // order-free); a racing purge/compaction that already folded
      // any of ours makes this fold stale — drop it, theirs covered it
      if (!folded.forall(have.deltas.contains)) None
      else Some(have.copy(
        deltas = staged +: have.deltas.filterNot(folded.toSet)))
    } match {
      case Some(_) => IndexDirs.gcDeltas(path, folded); folded.length
      case None => 0
    }
  }

  /** Full SEMANTIC rewrite: materialize the aggregated live counts
    * into fresh `.v<N>` base dirs and commit with no deltas — after
    * this, deleted docs leave no trace (their grams are gone, not
    * cancelled). O(live counts); downtime-free (old manifest live
    * until the atomic swap). Returns the live doc count.
    */
  def purge(spark: SparkSession, path: String): Long =
    purgeImpl(spark, path, () => ())

  /** [[purge]] with a test seam invoked between the survivors rewrite
    * and the manifest commit — deterministic interleaving specs only.
    */
  private[operators] def purgeImpl(spark: SparkSession, path: String,
      beforeCommit: () => Unit): Long = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (decl.deltas.isEmpty) return decl.n
    // CLAIMED target version: two racing purges write disjoint .v<k>
    // dirs ([[IndexDirs.claimBaseSuffix]])
    val nextVer = IndexDirs.claimBaseSuffix(path, "base.v",
      decl.baseVer + 1)
    // eager checkpoint, then the four survivor rewrites run
    // CONCURRENTLY (guide §2.6) — independent reads of committed data
    val live = liveIds(spark, path, decl).localCheckpoint()
    Par.inParallel(tables.map { case (sub, key, cnt) => () =>
      readAgg(spark, path, decl, sub, key, cnt)
        .withColumn("gb", gbCol(col(key), decl))
        .repartition(col("gb"))
        .write.mode("overwrite").partitionBy("gb")
        .parquet(s"$path/$sub.v$nextVer")
    } :+ { () =>
      live.withColumn("__lw", lit(1))
        .withColumn("ib", ibCol(col(decl.id), decl))
        .repartition(col("ib"))
        .write.mode("overwrite").partitionBy("ib")
        .parquet(s"$path/ids.v$nextVer")
    })
    beforeCommit()
    try IndexDirs.commitWithRetry(readManifest(path),
      writeManifest(path, _: Manifest), path) { have =>
      require(have.baseVer == decl.baseVer,
        s"a concurrent purge of $path committed base version " +
          s"${have.baseVer} while this one rewrote from " +
          s"${decl.baseVer} — rerun against the new base")
      // a compaction committed mid-purge folds (some of) our snapshot
      // deltas into a c<N> dir the filterNot below would keep while
      // the new base already absorbed those rows — refuse instead of
      // double-counting (mirrors compactDeltas' stale-fold skip)
      require(decl.deltas.forall(have.deltas.contains),
        s"a concurrent compaction of $path folded deltas this purge's " +
          "rewrite already absorbed — committing would double-count " +
          "them; rerun against the compacted state")
      // appends that landed after our rewrite stay as deltas
      Some(have.copy(deltas = have.deltas.filterNot(decl.deltas.toSet),
        baseVer = nextVer))
    } catch {
      case e: IllegalArgumentException =>
        ("ids" +: tables.map(_._1)).foreach(sub =>
          IndexDirs.rmTree(s"$path/$sub.v$nextVer")) // orphaned rewrite
        throw e
    }
    IndexDirs.gcDeltas(path, decl.deltas)
    ("ids" +: tables.map(_._1)).foreach { sub =>
      IndexDirs.rmTree(s"$path/${decl.baseOf(sub)}")
    }
    live.count()
  }
}
