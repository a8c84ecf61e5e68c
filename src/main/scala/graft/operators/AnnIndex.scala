package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN indexes — the write-once artifact forms of [[Ivf]]
  * (bucket-partitioned assignments) and [[Pq]] (compressed codes).
  *
  * The per-query IVF plans (q46 shape) re-assign the whole corpus to
  * centroid buckets on every query; at 100 TB that assignment scan is
  * the dominant cost and it is IDENTICAL across queries until the
  * corpus changes. This module factors it out into an on-disk index
  * keyed by a content fingerprint of the corpus:
  *
  * {{{
  *   <path>/centroids/    parquet: (c INT, centroid ARRAY<BIGINT>)
  *   <path>/assignments/  parquet, partitionBy(bucket):
  *                          (<id>, <vec>, bucket INT)
  *   <path>/deltas/d<N>/  parquet, partitionBy(bucket): appended rows
  *                        — visible only once the manifest lists d<N>
  *   <path>/manifest.json fingerprint + params + committed delta list
  *                        — written LAST, so a half-built index is
  *                        invisible (no manifest = no index, the
  *                        MergeOnRead commit rule)
  * }}}
  *
  * Crash atomicity: every mutation follows "readers trust ONLY what
  * the manifest names". A REBUILD deletes the manifest first — the
  * index is simply absent while data directories churn, and a crash
  * mid-rebuild leaves no manifest, so the retry rebuilds from
  * scratch instead of serving torn state. An APPEND stages its rows
  * in a fresh, never-reused `deltas/d<N>` directory that no live
  * manifest references, then commits by writing the manifest that
  * lists it — a crash before the manifest write leaves an orphan
  * directory readers never touch (the retry claims the next name;
  * orphans are garbage, never corruption), and a crash after it
  * means the append fully committed.
  *
  * [[buildIfAbsent]] recomputes only the fingerprint (one
  * column-pruned agg over (id, vec)) and SKIPS the assignment scan
  * and write entirely when it matches — the "train once, query many"
  * discipline. The manifest also pins a content hash of the
  * centroids/codebooks themselves, so changing parameter VALUES (not
  * just their count) invalidates a persisted index instead of
  * silently serving results computed from stale centroids.
  * [[searchInt]] serves queries from the persisted layout: probe
  * buckets are computed per probe row, their DISTINCT set is
  * collected (probes are dimension-scale by the ANN contract — they
  * broadcast), and the assignment read is filtered on the PARTITION
  * column, so the scan touches only `≈ nprobe × |probes|` of the k
  * bucket directories no matter how large the corpus — a static
  * partition prune visible in the plan's PartitionFilters, not a bet
  * on runtime DPP.
  *
  * Reference grounding: the reference loads immutable dataset
  * artifacts once and serves every request from the loaded form
  * (directory/directory.go:230-240's snapshot discipline); this is
  * that shape for ANN state.
  */
object AnnIndex {

  /** Index state after [[buildIfAbsent]]: `reused = true` means the
    * manifest fingerprint matched and nothing was rewritten.
    */
  type Build = IndexBuild
  val Build = IndexBuild

  /** Order-independent content fingerprint of `(idCol, vecCol)` plus
    * any carried metadata columns — see
    * [[IndexDirs.contentFingerprint]].
    */
  def fingerprint(corpus: DataFrame, idCol: String,
      vecCol: String, carryCols: Seq[String] = Nil): (Long, Long) =
    IndexDirs.contentFingerprint(corpus, idCol +: vecCol +: carryCols)

  /** Deterministic content hash of the index parameters (centroid /
    * codebook VALUES, not just counts) — length-prefixed fold so
    * `[[1,2]]` and `[[1],[2]]` differ. Stored in the manifest: a
    * rebuild with different parameter values must invalidate, not
    * reuse.
    */
  private def paramsHash(xs: Seq[Seq[Long]]): Long =
    xs.foldLeft(17L) { (h, c) =>
      c.foldLeft(h * 31L + c.length)((a, v) => a * 1000003L + v)
    }

  private def pqParamsHash(books: Seq[Seq[Seq[Long]]]): Long =
    books.foldLeft(19L)((h, cb) => h * 31L + paramsHash(cb))

  /** On-disk layout version: 1 added the raw per-row content hash
    * column to the data tables (delete verification). Part of the
    * reuse identity, so a pre-hash artifact (reads as 0) rebuilds
    * once instead of failing reads.
    */
  private val LayoutVersion = 1

  /** Default tombstone bound — see [[DedupIndex.DefaultMaxTombstones]]
    * (same per-read broadcast anti-join, same purge-due point).
    */
  val DefaultMaxTombstones: Long = 1L << 20

  private case class Manifest(fp: Long, n: Long, kind: String, k: Int,
      id: String, vec: String, ph: Long, lv: Int = LayoutVersion,
      deltas: Seq[String] = Nil,
      lastBatch: Long = -1L, carry: Seq[String] = Nil,
      tombs: Seq[String] = Nil, tombCount: Long = 0L,
      baseDir: String = "", mv: Long = 0L) {
    /** Equality for reuse decisions — everything except the delta /
      * tombstone lists, the base-dir version, and the streaming batch
      * watermark (an appended or deleted-from index still satisfies a
      * matching rebuild: the composed fingerprint covers base ∪
      * deltas ∖ tombstones).
      */
    def sameIndexAs(other: Manifest): Boolean =
      copy(deltas = Nil, lastBatch = -1L, tombs = Nil, tombCount = 0L,
        baseDir = "", mv = 0L) ==
        other.copy(deltas = Nil, lastBatch = -1L, tombs = Nil,
          tombCount = 0L, baseDir = "", mv = 0L)
    /** The live base data directory: versioned after a [[purge]]. */
    def baseOr(default: String): String =
      if (baseDir.isEmpty) default else baseDir
    /** The raw-row hash the fingerprint folds — what [[delete]]
      * verifies a delta row against (ivf fingerprints carry columns;
      * pq/sq8 fingerprint (id, vec) only).
      */
    def rowHash: org.apache.spark.sql.Column =
      if (kind == "ivf") xxhash64((id +: vec +: carry).map(col): _*)
      else xxhash64(col(id), col(vec))
  }

  private def readManifest(path: String): Option[Manifest] =
    IndexDirs.readManifest(path).map { r =>
      Manifest(r.long("fp"), r.long("n"), r.strOr("kind", "ivf"),
        r.int("k"), r.str("id"), r.str("vec"),
        // a pre-hash manifest (older layout) reads as ph=0 — it can
        // never match a computed hash, so it rebuilds once, safely
        r.longOr("ph", 0L), r.intOr("lv", 0),
        r.seq("deltas"), r.longOr("lb", -1L),
        r.seq("carry"), r.seq("tombs"), r.longOr("tn", 0L),
        r.strOr("bd", ""), mv = r.version)
    }

  private def writeManifest(path: String, mf: Manifest): Unit =
    IndexDirs.manifest()
      .put("fp", mf.fp).put("n", mf.n).put("kind", mf.kind)
      .put("k", mf.k).put("id", mf.id).put("vec", mf.vec)
      .put("ph", mf.ph).put("lv", mf.lv).put("lb", mf.lastBatch)
      .put("bd", mf.baseDir).put("tn", mf.tombCount)
      .put("deltas", mf.deltas).put("carry", mf.carry)
      .put("tombs", mf.tombs)
      .commit(path, mf.mv)

  /** Uncommit + clear — see [[IndexDirs.uncommit]]. */
  private def uncommit(path: String): Unit = IndexDirs.uncommit(path)

  /** Build the IVF index at `path` unless a manifest proves the same
    * corpus (by fingerprint + count + centroid content hash) is
    * already indexed. `centroids` are the quantized-space integer
    * centroids ([[Ivf.assignInt]] semantics — typically
    * [[Ivf.trainCentroids]] output quantized, or fixed centroids
    * where reproducibility outranks recall). `carryCols` persists
    * extra metadata columns next to each vector (language, license,
    * source domain, …) for FILTERED ANN at search time
    * ([[searchInt]]'s `where`) — carried values are part of the
    * fingerprint, so metadata changes invalidate like vector changes.
    */
  def buildIfAbsent(corpus: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[Seq[Long]], path: String,
      carryCols: Seq[String] = Nil): Build = {
    val (fp, n) = fingerprint(corpus, idCol, vecCol, carryCols)
    val want = Manifest(fp, n, "ivf", centroids.length, idCol, vecCol,
      paramsHash(centroids), carry = carryCols)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        uncommit(path)
        val spark = corpus.sparkSession
        import spark.implicits._
        centroids.zipWithIndex
          .map { case (c, i) => (i, c) }.toDF("c", "centroid")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$path/centroids")
        corpus
          .select(col(idCol) +: col(vecCol) +: carryCols.map(col) :+
            want.rowHash.as("__ch") :+
            Ivf.assignInt(col(vecCol), centroids).as("bucket"): _*)
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$path/assignments")
        writeManifest(path, want)
        Build(path, fp, n, reused = false)
    }
  }

  /** The persisted centroids, in index order. */
  /** The persisted index's variant (`ivf` | `pq` | `sq8`) — public
    * so a serve router (e.g. the `annindex` SQL source) can pick the
    * matching search path without reaching into the manifest.
    */
  def kind(path: String): String =
    readManifest(path).map(_.kind).getOrElse(
      throw new IllegalStateException(s"no index at $path"))

  def centroids(spark: SparkSession, path: String): Seq[Seq[Long]] =
    spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getAs[Number]("c").intValue,
        r.getSeq[Long](r.fieldIndex("centroid"))))
      .sortBy(_._1).map(_._2).toSeq

  /** Manifest-visible LIVE rows of the index's data table
    * (`assignments` for ivf, `codes` for pq/sq8): the (possibly
    * [[purge]]-versioned) base directory plus every COMMITTED delta
    * directory, each with its own bucket partition pruning where
    * applicable, minus tombstoned ids (a broadcast anti-join —
    * tombstone lists are bounded between purges by contract). Orphan
    * (crashed, uncommitted) delta directories are never read — they
    * are not in the manifest.
    */
  private def readParts(spark: SparkSession, path: String, baseSub: String,
      mf: Manifest, bucketFilter: Option[Seq[Int]]): DataFrame = {
    val roots = s"$path/${mf.baseOr(baseSub)}" +:
      mf.deltas.map(d => s"$path/deltas/$d")
    val rows = roots.map { r =>
      val df = spark.read.parquet(r)
      bucketFilter.fold(df)(w => df.filter(col("bucket").isin(w.map(Int.box): _*)))
    }.reduce(_.unionByName(_))
    if (mf.tombs.isEmpty) rows
    else rows.join(broadcast(tombIds(spark, path, mf)),
      Seq(mf.id), "left_anti")
  }

  private def tombIds(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    mf.tombs.map(t => spark.read.parquet(s"$path/deltas/$t"))
      .reduce(_.unionByName(_)).distinct()

  private def readAssignments(spark: SparkSession, path: String,
      mf: Manifest, bucketFilter: Option[Seq[Int]]): DataFrame =
    readParts(spark, path, "assignments", mf, bucketFilter)

  /** Never-reused staged delta name — see [[IndexDirs.nextDeltaName]]
    * (crashed attempts leave uniquely-named orphans: garbage, never
    * corruption — the MergeOnRead reservation rule).
    */
  private def nextDeltaName(path: String, prefix: String): String =
    IndexDirs.nextDeltaName(path, prefix)

  /** Re-adding a tombstoned id is refused under `checkDisjoint`: the
    * tombstone anti-join in [[readParts]] is version-blind, so a
    * re-added row would be silently invisible. [[purge]] clears
    * tombstones and makes the id insertable again. `probeIds` is the
    * delta's distinct id column.
    */
  private def requireNotTombstoned(probeIds: DataFrame, spark: SparkSession,
      path: String, mf: Manifest): Unit = {
    if (mf.tombs.isEmpty) return
    val hit = tombIds(spark, path, mf)
      .join(broadcast(probeIds), Seq(mf.id), "left_semi").count()
    require(hit == 0,
      s"append delta re-adds $hit tombstoned id(s) at $path — the " +
        "tombstone filter would hide the new rows; purge() first")
  }

  private def requireDisjoint(probeIds: DataFrame, existing: DataFrame,
      idCol: String, path: String): Unit = {
    val dupes = existing.select(col(idCol))
      .join(broadcast(probeIds), Seq(idCol), "left_semi")
      .count()
    require(dupes == 0,
      s"append delta shares $dupes id(s) with the index at $path — " +
        "duplicate ids would corrupt both the rows and the xor " +
        "fingerprint (pass checkDisjoint = false only when upstream " +
        "proves disjointness)")
  }

  /** The shared commit tail of the three append kinds: the staged
    * delta dir commits through [[IndexDirs.stagedCommit]], with the
    * batch-replay skip and the disjointness/tombstone guards
    * re-verified per attempt against the manifest each attempt
    * anchors at (multi-writer liveness — the [[AggView]] recipe).
    */
  private def appendCommit(spark: SparkSession, path: String,
      decl: Manifest, staged: String, probeIds: DataFrame,
      baseSub: String, dfp: Long, dn: Long, checkDisjoint: Boolean,
      batchMark: Option[Long]): Build =
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (batchMark.exists(_ <= have.lastBatch)) None
      else {
        if (checkDisjoint) {
          requireDisjoint(probeIds,
            readParts(spark, path, baseSub, have, None), have.id, path)
          requireNotTombstoned(probeIds, spark, path, have)
        }
        Some(have.copy(fp = have.fp ^ dfp, n = have.n + dn,
          deltas = have.deltas :+ staged,
          lastBatch = batchMark.getOrElse(have.lastBatch)))
      }
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None => // a racing replay landed this batch id first
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }

  /** ANN top-k over the persisted index: probes fan out to their
    * `nprobe` nearest buckets; the corpus side reads ONLY those
    * bucket partitions (static partition filter from the collected
    * probe-bucket set — probes are dimension-scale, so the collect is
    * bounded); cosine + bounded top-k per probe. Column names follow
    * the q46 contract: output (probe_id, <idCol>, sim, rank).
    */
  def searchInt(spark: SparkSession, path: String, probes: DataFrame,
      probeIdCol: String, vecCol: String, nprobe: Int, k: Int,
      idCol: String = "vec_id",
      where: Option[Column] = None): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    val cs = centroids(spark, path)
    val p = probes.select(col(probeIdCol).as("probe_id"),
        col(vecCol).as("__pq"),
        explode(Ivf.probeBucketsInt(col(vecCol), cs, nprobe)).as("bucket"))
    val wanted = p.select("bucket").distinct().collect()
      .map(_.getAs[Number](0).intValue).toSeq
    // FILTERED ANN: `where` predicates over carried metadata columns
    // apply before scoring, stacking with the bucket partition prune
    // — Catalyst pushes plain predicates into the parquet scan, so a
    // `lang = 'en'` search reads only matching row groups of only
    // the probed buckets
    val assigned = where.foldLeft(
      readAssignments(spark, path, mf, Some(wanted)))(_.filter(_))
    val scored = assigned.join(broadcast(p), Seq("bucket"))
      .withColumn("sim", Similarity.cosineInt(col(vecCol), col("__pq")))
    Similarity.topKPerProbe(scored, k, "probe_id", idCol)
  }

  /** Incrementally extend a persisted IVF index with NEW corpus rows:
    * only the delta is assigned and written — into a fresh staged
    * `deltas/d<N>` directory (bucket-partitioned like the base, the
    * [[MergeOnRead]] delta discipline applied to ANN state) that
    * becomes visible only when the manifest commit lists it — and the
    * manifest fingerprint advances WITHOUT rescanning the base
    * corpus: the xor-fold fingerprint composes, so
    * `fp' = fp ⊕ fold(delta)` and `n' = n + |delta|` — an append
    * costs O(delta) no matter how many billions of vectors the base
    * holds. The updated manifest equals what [[buildIfAbsent]] would
    * compute over base ∪ delta, so a later rebuild attempt on the
    * full corpus correctly reuses the appended index.
    *
    * Caller contract: delta ids are disjoint from the base (CDC
    * upstream enforces key identity; duplicated ids would double
    * rows AND xor their hashes out of the fingerprint).
    * `checkDisjoint` (on by default) enforces it with one
    * broadcast semi-join count — the delta is small by contract, so
    * the base side streams its id column through a broadcast probe
    * and never shuffles; pass false only when the upstream already
    * proves disjointness and the extra base scan matters.
    */
  def append(delta: DataFrame, path: String,
      checkDisjoint: Boolean = true): Build =
    appendImpl(delta, path, checkDisjoint, None)

  /** Kind-aware fingerprint: ivf fingerprints carry columns; pq/sq8
    * fingerprint (id, vec) only — the same rows [[Manifest.rowHash]]
    * hashes.
    */
  private def fpOf(df: DataFrame, have: Manifest): (Long, Long) =
    if (have.kind == "ivf") fingerprint(df, have.id, have.vec, have.carry)
    else fingerprint(df, have.id, have.vec)

  /** Stage `delta`'s kind-appropriate rows into a fresh, never-reused
    * `deltas/d<N>` directory (invisible until a manifest commit lists
    * it — the staged-commit rule) and return the staged name.
    */
  private def stageInsert(delta: DataFrame, have: Manifest,
      path: String): String = {
    val spark = delta.sparkSession
    val staged = nextDeltaName(path, "d")
    have.kind match {
      case "ivf" =>
        val cs = centroids(spark, path)
        delta
          .select(col(have.id) +: col(have.vec) +: have.carry.map(col) :+
            have.rowHash.as("__ch") :+
            Ivf.assignInt(col(have.vec), cs).as("bucket"): _*)
          .repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$path/deltas/$staged")
      case "pq" =>
        val cbs = pqCodebooks(spark, path)
        delta
          .select(col(have.id),
            Pq.encodeInt(col(have.vec), cbs).as("codes"),
            have.rowHash.as("__ch"))
          .write.mode("overwrite").parquet(s"$path/deltas/$staged")
      case _ =>
        delta
          .withColumn("__s", Sq8.scaleOf(col(have.vec)))
          .select(col(have.id), col("__s"),
            Sq8.encode(col(have.vec), col("__s")).as("__c"),
            have.rowHash.as("__ch"))
          .write.mode("overwrite").parquet(s"$path/deltas/$staged")
    }
    staged
  }

  private def appendImpl(delta: DataFrame, path: String,
      checkDisjoint: Boolean, batchMark: Option[Long]): Build = {
    val spark = delta.sparkSession
    // kind/layout are immutable across appends (a rebuild uncommits),
    // so staging off this read is race-free; counters, lists, and the
    // guards re-derive per commit attempt (see [[appendCommit]])
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    require(decl.kind == "ivf", s"append needs an ivf index, got ${decl.kind}")
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl.id, decl.vec, decl.carry)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val probeIds = delta.select(col(decl.id)).distinct()
      .localCheckpoint(false)
    val staged = stageInsert(delta, decl, path)
    appendCommit(spark, path, decl, staged, probeIds, "assignments",
      dfp, dn, checkDisjoint, batchMark)
  }

  /** Build a persisted PQ index ([[Pq]] codes) at `path` unless the
    * manifest fingerprint + codebook content hash match — the
    * compressed-artifact twin of [[buildIfAbsent]]. Layout:
    * {{{
    *   <path>/codebooks/  parquet: (s INT, c INT, centroid ARRAY<BIGINT>)
    *   <path>/codes/      parquet: (<id>, codes ARRAY<INT>)
    *   <path>/manifest.json — written LAST (commit marker)
    * }}}
    * The codes table is S small ints per vector — the entire corpus
    * side of every future ADC search, at a fraction of the raw
    * vector bytes (the property that lets a billion-vector index
    * live hot). The encode scan (S × K subvector distances per row)
    * is paid HERE, once; searches never touch raw corpus vectors.
    */
  def buildPqIfAbsent(corpus: DataFrame, vecCol: String, idCol: String,
      codebooks: Seq[Seq[Seq[Long]]], path: String): Build = {
    val (fp, n) = fingerprint(corpus, idCol, vecCol)
    val want = Manifest(fp, n, "pq",
      codebooks.length * codebooks.head.length, idCol, vecCol,
      pqParamsHash(codebooks))
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        uncommit(path)
        val spark = corpus.sparkSession
        import spark.implicits._
        codebooks.zipWithIndex.flatMap { case (cb, s) =>
          cb.zipWithIndex.map { case (cent, c) => (s, c, cent) }
        }.toDF("s", "c", "centroid")
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$path/codebooks")
        corpus
          .select(col(idCol),
            Pq.encodeInt(col(vecCol), codebooks).as("codes"),
            want.rowHash.as("__ch"))
          .write.mode("overwrite").parquet(s"$path/codes")
        writeManifest(path, want)
        Build(path, fp, n, reused = false)
    }
  }

  /** The persisted PQ codebooks, as `(S × K × subDim)`. */
  def pqCodebooks(spark: SparkSession, path: String): Seq[Seq[Seq[Long]]] =
    spark.read.parquet(s"$path/codebooks").collect()
      .map(r => (r.getAs[Number]("s").intValue,
        r.getAs[Number]("c").intValue,
        r.getSeq[Long](r.fieldIndex("centroid"))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3.toSeq).toSeq)

  /** Incrementally extend a persisted PQ index with NEW corpus rows —
    * the [[append]] discipline applied to the codes table: only the
    * delta pays the S × K encode scan, its codes stage in a fresh
    * `deltas/d<N>` directory made visible by the manifest commit, and
    * the xor-fold fingerprint composes (`fp' = fp ⊕ fold(delta)`), so
    * a later [[buildPqIfAbsent]] on the full corpus correctly reuses
    * the appended index. Same caller contract and `checkDisjoint`
    * guard as [[append]].
    */
  def pqAppend(delta: DataFrame, path: String,
      checkDisjoint: Boolean = true): Build =
    pqAppendImpl(delta, path, checkDisjoint, None)

  private def pqAppendImpl(delta: DataFrame, path: String,
      checkDisjoint: Boolean, batchMark: Option[Long]): Build = {
    val spark = delta.sparkSession
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    require(decl.kind == "pq", s"pqAppend needs a pq index, got ${decl.kind}")
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl.id, decl.vec)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val probeIds = delta.select(col(decl.id)).distinct()
      .localCheckpoint(false)
    val staged = stageInsert(delta, decl, path)
    appendCommit(spark, path, decl, staged, probeIds, "codes",
      dfp, dn, checkDisjoint, batchMark)
  }

  /** Build a persisted SQ8 index ([[Sq8]] per-vector scale + byte
    * codes) at `path` unless the manifest fingerprint matches — the
    * parameter-free third artifact kind (no centroids to train or
    * pin: the scale derives from each vector). Layout:
    * {{{
    *   <path>/codes/        parquet: (<id>, __s BIGINT, __c ARRAY<BIGINT>)
    *   <path>/manifest.json — written LAST (commit marker)
    * }}}
    */
  def buildSq8IfAbsent(corpus: DataFrame, vecCol: String, idCol: String,
      path: String): Build = {
    val (fp, n) = fingerprint(corpus, idCol, vecCol)
    val want = Manifest(fp, n, "sq8", 0, idCol, vecCol, 0L)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        uncommit(path)
        corpus
          .withColumn("__s", Sq8.scaleOf(col(vecCol)))
          .select(col(idCol), col("__s"),
            Sq8.encode(col(vecCol), col("__s")).as("__c"),
            want.rowHash.as("__ch"))
          .write.mode("overwrite").parquet(s"$path/codes")
        writeManifest(path, want)
        Build(path, fp, n, reused = false)
    }
  }

  /** Incrementally extend a persisted SQ8 index — [[pqAppend]]'s
    * twin (delta-only encode, staged commit, composed fingerprint).
    */
  def sq8Append(delta: DataFrame, path: String,
      checkDisjoint: Boolean = true): Build =
    sq8AppendImpl(delta, path, checkDisjoint, None)

  private def sq8AppendImpl(delta: DataFrame, path: String,
      checkDisjoint: Boolean, batchMark: Option[Long]): Build = {
    val spark = delta.sparkSession
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    require(decl.kind == "sq8",
      s"sq8Append needs an sq8 index, got ${decl.kind}")
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl.id, decl.vec)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val probeIds = delta.select(col(decl.id)).distinct()
      .localCheckpoint(false)
    val staged = stageInsert(delta, decl, path)
    appendCommit(spark, path, decl, staged, probeIds, "codes",
      dfp, dn, checkDisjoint, batchMark)
  }

  /** SQ8 top-k over the persisted index: the corpus side reads only
    * (scale, codes) — [[Sq8.topKEncoded]] over base ∪ committed
    * deltas. Output: (probe_id, <idCol>, sq8, rank).
    */
  def sq8SearchInt(spark: SparkSession, path: String, probes: DataFrame,
      probeIdCol: String, vecCol: String, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    Sq8.topKEncoded(readParts(spark, path, "codes", mf, None),
      probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("pq")),
      k, corpusId = idCol)
  }

  /** Exactly-once streaming index maintenance — the `foreachBatch`
    * form of [[append]]/[[pqAppend]]/[[sq8Append]] (kind-dispatched):
    * the
    * micro-batch id is committed IN the same manifest write as the
    * delta it marks, so a batch replayed after a crash (Structured
    * Streaming's at-least-once `foreachBatch` contract) is detected
    * by `batchId <= lastBatch` and skipped without touching the
    * index — the standard idempotent-sink recipe, with the manifest
    * playing the transaction log. A crash BEFORE the manifest write
    * leaves only an orphan delta directory (never read), and the
    * replay appends cleanly.
    *
    * `checkDisjoint` defaults OFF here: the streaming upstream is
    * expected to be a keyed CDC/new-docs feed (ids disjoint by
    * construction), and a per-micro-batch base scan would turn an
    * O(batch) append into an O(index) one.
    */
  def appendBatch(batch: DataFrame, batchId: Long, path: String,
      checkDisjoint: Boolean = false): Build = {
    val have = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (batchId <= have.lastBatch)
      return Build(path, have.fp, have.n, reused = true)
    have.kind match {
      case "ivf" => appendImpl(batch, path, checkDisjoint, Some(batchId))
      case "pq" => pqAppendImpl(batch, path, checkDisjoint, Some(batchId))
      case _ => sq8AppendImpl(batch, path, checkDisjoint, Some(batchId))
    }
  }

  /** `writeStream.foreachBatch(AnnIndex.foreachBatchSink(path))` —
    * the [[appendBatch]] closure in the shape Structured Streaming
    * wants.
    */
  def foreachBatchSink(path: String, checkDisjoint: Boolean = false)
      : (DataFrame, Long) => Unit =
    (df, id) => { appendBatch(df, id, path, checkDisjoint); () }

  /** Exactly-once OP-AWARE streaming maintenance: one CDC micro-batch
    * carrying BOTH inserts and deletes (rows whose `opCol` equals
    * `deleteOp` are removals; everything else inserts — the
    * [[MergeOnRead]] change-feed shape) applies in ONE manifest
    * commit. The insert delta, the tombstone list, the composed
    * fingerprint/count, and the batch watermark become visible
    * together or not at all, so an at-least-once replay
    * (`batchId <= lastBatch`) skips the WHOLE batch — there is no
    * window where the inserts committed but the deletes did not — and
    * a crash between stagings leaves only orphan directories.
    *
    * Within one batch an id must not be both deleted and inserted:
    * the tombstone filter is version-blind and would hide the new
    * rows (delete, purge, then re-insert — or use the count-algebra
    * indexes [[LmIndex]]/[[Bm25Index]], whose [[LmIndex.applyBatch]]
    * takes same-batch updates). Delete rows must be the exact stored
    * rows and live (the streaming contract proves this upstream; the
    * in-batch duplicate/overlap checks here are O(batch), the
    * guarded batch path is [[delete]]).
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String,
      opCol: String = "op", deleteOp: String = "D",
      maxTombstones: Long = DefaultMaxTombstones): Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    if (batchId <= decl.lastBatch)
      return Build(path, decl.fp, decl.n, reused = true)
    val rows = batch.localCheckpoint(false)
    val ins = rows.filter(col(opCol) =!= deleteOp).drop(opCol)
    val del = rows.filter(col(opCol) === deleteOp).drop(opCol)
    val (ifp, inN) = fpOf(ins, decl)
    val (dfp, delN) = fpOf(del, decl)
    if (inN == 0 && delN == 0)
      return Build(path, decl.fp, decl.n, reused = true)
    // batch-local invariants check once; the tombstone bound is
    // state-dependent and re-verifies per commit attempt below
    if (delN > 0) {
      require(del.select(col(decl.id)).distinct().count() == delN,
        s"batch $batchId has duplicate delete rows")
      if (inN > 0) {
        val both = ins.select(col(decl.id))
          .join(broadcast(del.select(col(decl.id)).distinct()),
            Seq(decl.id), "left_semi").count()
        require(both == 0,
          s"batch $batchId inserts AND deletes $both shared id(s) — " +
            "the tombstone filter would hide the inserted rows")
      }
    }
    var stagedData = Seq.empty[String]
    var stagedTombs = Seq.empty[String]
    if (inN > 0) stagedData :+= stageInsert(ins, decl, path)
    if (delN > 0) {
      val staged = nextDeltaName(path, "t")
      del.select(col(decl.id)).distinct().coalesce(1)
        .write.mode("overwrite").parquet(s"$path/deltas/$staged")
      stagedTombs :+= staged
    }
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path,
      stagedData ++ stagedTombs) { have =>
      if (batchId <= have.lastBatch) None // a racing replay landed it
      else {
        require(have.tombCount + delN <= maxTombstones,
          s"index at $path would carry ${have.tombCount + delN} " +
            s"tombstones (bound $maxTombstones) — run purge() first")
        Some(have.copy(fp = have.fp ^ ifp ^ dfp,
          n = have.n + inN - delN, deltas = have.deltas ++ stagedData,
          tombs = have.tombs ++ stagedTombs,
          tombCount = have.tombCount + delN, lastBatch = batchId))
      }
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None =>
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  /** `writeStream.foreachBatch(AnnIndex.cdcSink(path))` — the
    * [[applyBatch]] closure for a mixed insert/delete CDC stream.
    */
  def cdcSink(path: String, opCol: String = "op",
      deleteOp: String = "D"): (DataFrame, Long) => Unit =
    (df, id) => { applyBatch(df, id, path, opCol, deleteOp); () }

  /** Folds the committed delta directories into ONE (`deltas/c<N>`)
    * and commits a manifest listing only it — bounding per-search
    * file-listing and footer costs after long append streams without
    * ever touching the base directory (cost ∝ total delta size, the
    * MergeOnRead compaction rule). Crash-safe by the same staging
    * discipline: the merged directory is invisible until the
    * manifest swap, and a crash mid-fold leaves the old manifest —
    * and every directory it references — fully live. Old delta
    * directories are deleted only AFTER the commit (best-effort GC).
    * Works for both index kinds (ivf deltas keep their bucket
    * partitioning; pq deltas are plain codes). Returns the number of
    * directories folded, 0 when there is nothing to compact.
    */
  def compactDeltas(spark: SparkSession, path: String): Int = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    // fewer than two directories of a kind: folding gains nothing
    val foldData = decl.deltas.length >= 2
    val foldTombs = decl.tombs.length >= 2
    if (!foldData && !foldTombs) return 0
    val foldedData = if (foldData) decl.deltas else Nil
    val foldedTombs = if (foldTombs) decl.tombs else Nil
    var staged = Seq.empty[String]
    val stagedData = if (!foldData) None else {
      val merged = foldedData
        .map(d => spark.read.parquet(s"$path/deltas/$d"))
        .reduce(_.unionByName(_))
      val s = nextDeltaName(path, "c")
      val w = (if (decl.kind == "ivf")
          merged.repartition(col("bucket")) else merged)
        .write.mode("overwrite")
      (if (decl.kind == "ivf") w.partitionBy("bucket") else w)
        .parquet(s"$path/deltas/$s")
      staged :+= s
      Some(s)
    }
    val stagedTombs = if (!foldTombs) None else {
      val s = nextDeltaName(path, "t")
      tombIds(spark, path, decl).coalesce(1)
        .write.mode("overwrite").parquet(s"$path/deltas/$s")
      staged :+= s
      Some(s)
    }
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, staged) { have =>
      // deltas/tombstones that landed after our fold survive; a
      // racing purge/compaction that already folded any of ours makes
      // this fold stale — drop it, theirs covered it
      if (!foldedData.forall(have.deltas.contains) ||
        !foldedTombs.forall(have.tombs.contains)) None
      else Some(have.copy(
        deltas = stagedData.toSeq ++
          have.deltas.filterNot(foldedData.toSet),
        tombs = stagedTombs.toSeq ++
          have.tombs.filterNot(foldedTombs.toSet)))
    } match {
      case Some(_) =>
        // post-commit GC: the folded directories are unreferenced now
        IndexDirs.gcDeltas(path, foldedData ++ foldedTombs)
        (foldedData ++ foldedTombs).length
      case None => 0
    }
  }

  /** Tombstone-delete rows from the index — any kind. `delta` must
    * carry the FULL rows being removed (`id`, `vec`, carry columns as
    * built): the composed fingerprint needs their hashes folded OUT
    * (`fp' = fp ⊕ fold(delta)`, xor being self-inverse), and the
    * pq/sq8 codes tables do not retain raw vectors to recover them
    * from — so deletes ride the same full-row CDC feed appends do
    * (the MergeOnRead delete convention). The commit is an O(delta)
    * staged tombstone id list (`deltas/t<N>`, manifest-gated like
    * data deltas); every read path anti-joins the tombstone set
    * (broadcast — bounded between purges by contract), and a later
    * [[buildIfAbsent]] over the remaining corpus correctly reuses
    * the deleted-from index.
    *
    * `checkPresent` (on by default) verifies every delta id is LIVE
    * in the index — a stale or double delete would silently corrupt
    * the fingerprint the same way a duplicate append would.
    */
  def delete(delta: DataFrame, path: String,
      checkPresent: Boolean = true,
      maxTombstones: Long = DefaultMaxTombstones): Build = {
    val spark = delta.sparkSession
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    val baseSub = if (decl.kind == "ivf") "assignments" else "codes"
    val (dfp, dn) = fingerprint(delta, decl.id, decl.vec, decl.carry)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val ids = delta.select(col(decl.id)).distinct()
      .localCheckpoint(false)
    require(ids.count() == dn,
      s"delete delta has duplicate ${decl.id} rows — each stored row " +
        "must be folded out exactly once")
    val probe = delta.select(col(decl.id), decl.rowHash.as("__pch"))
      .distinct().localCheckpoint(false)
    // state-dependent guards re-verify per commit attempt against the
    // manifest the attempt anchors at (a concurrent delete of the
    // same ids must flip liveness from pass to refuse on retry)
    def guardsOk(have: Manifest): Unit = {
      // tombstone-growth bound: the per-read broadcast anti-join is
      // only "bounded between purges" if something enforces the bound
      require(have.tombCount + dn <= maxTombstones,
        s"index at $path would carry ${have.tombCount + dn} tombstones " +
          s"(bound $maxTombstones) — run purge() to fold them into the " +
          "base before deleting more")
      if (checkPresent) {
        // liveness AND content in one pass against the stored row hash:
        // the fingerprint folds raw (id, vec[, carry]) hashes, so a
        // delete naming a live id with a stale vector would corrupt it
        // while an id-only check passes
        val r = readParts(spark, path, baseSub, have, None)
          .join(broadcast(probe), Seq(have.id))
          .agg(count(lit(1)).as("live"),
            coalesce(sum(when(col("__ch") === col("__pch"), 1L)
              .otherwise(0L)), lit(0L)).as("same"))
          .collect()(0)
        require(r.getLong(0) == dn,
          s"delete delta names ${dn - r.getLong(0)} id(s) not live in " +
            s"the index at $path — a stale or repeated delete would " +
            "corrupt the fingerprint (pass checkPresent = false only " +
            "when upstream proves liveness)")
        require(r.getLong(1) == dn,
          s"delete delta rows differ from the indexed rows for " +
            s"${dn - r.getLong(1)} id(s) at $path — the fingerprint " +
            "would fold out hashes that were never folded in")
      }
    }
    val staged = nextDeltaName(path, "t")
    // guards ∥ staging (guide §2.6): both depend only on the anchor
    // manifest; the commit loop re-verifies only when another writer
    // moved it
    try Par.inParallel(Seq(
      () => guardsOk(decl),
      () => ids.coalesce(1).write.mode("overwrite")
        .parquet(s"$path/deltas/$staged")))
    catch { case e: Throwable =>
      IndexDirs.gcDeltas(path, Seq(staged)); throw e
    }
    val next = IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (have.mv != decl.mv) guardsOk(have)
      Some(have.copy(fp = have.fp ^ dfp, n = have.n - dn,
        tombs = have.tombs :+ staged, tombCount = have.tombCount + dn))
    }.get
    Build(path, next.fp, next.n, reused = false)
  }

  /** Physically apply tombstones: rewrite the LIVE rows into a fresh
    * versioned base directory (`assignments.v<N>`/`codes.v<N>`),
    * fold committed deltas in, and commit a manifest with no deltas
    * and no tombstones — the index is downtime-free throughout (the
    * old manifest, and every directory it references, stays fully
    * live until the atomic manifest swap; the MergeOnRead `ver=`
    * rule). Cost is O(live index) — run it when the tombstone set
    * has grown past broadcast comfort, not per delete. Returns the
    * number of tombstoned ids purged.
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
    if (decl.tombs.isEmpty && decl.deltas.isEmpty) return 0L
    val baseSub = if (decl.kind == "ivf") "assignments" else "codes"
    val tombCount =
      if (decl.tombs.isEmpty) 0L
      else tombIds(spark, path, decl).count()
    // CLAIMED next base version ([[IndexDirs.claimBaseSuffix]]): two
    // racing purges write disjoint .v<k> dirs — neither can clobber
    // parquet the other's manifest might commit. Start past both the
    // manifest's current version and any orphaned .v dirs on disk.
    val fsys = IndexDirs.fs(path)
    val root = new org.apache.hadoop.fs.Path(path)
    val from = (if (!fsys.exists(root)) Array.empty[String]
      else fsys.listStatus(root).map(_.getPath.getName))
      .flatMap(n => s"^${java.util.regex.Pattern.quote(baseSub)}\\.v(\\d+)$$"
        .r.findFirstMatchIn(n).map(_.group(1).toInt))
      .foldLeft(0)(math.max) + 1
    val ver = IndexDirs.claimBaseSuffix(path, s"$baseSub.v", from)
    val newBase = s"$baseSub.v$ver"
    val live = readParts(spark, path, baseSub, decl, None)
    val w = (if (decl.kind == "ivf")
        live.repartition(col("bucket")) else live)
      .write.mode("overwrite")
    (if (decl.kind == "ivf") w.partitionBy("bucket") else w)
      .parquet(s"$path/$newBase")
    beforeCommit()
    try IndexDirs.commitWithRetry(readManifest(path),
      writeManifest(path, _: Manifest), path) { have =>
      require(have.baseOr(baseSub) == decl.baseOr(baseSub),
        s"a concurrent purge of $path committed base " +
          s"${have.baseOr(baseSub)} while this one rewrote from " +
          s"${decl.baseOr(baseSub)} — rerun against the new base")
      // a compaction committed mid-purge replaces (some of) our
      // snapshot delta/tombstone lists with fold dirs the filterNots
      // below would keep while the new base already absorbed them —
      // refuse instead of double-counting / double-hiding
      require(decl.deltas.forall(have.deltas.contains) &&
        decl.tombs.forall(have.tombs.contains),
        s"a concurrent compaction of $path folded deltas/tombstones " +
          "this purge's rewrite already absorbed — committing would " +
          "corrupt the index; rerun against the compacted state")
      // appends/deletes that landed after our rewrite survive, with
      // the surviving tombstones' (re-counted) id total
      val survTombs = have.tombs.filterNot(decl.tombs.toSet)
      val survCount =
        if (survTombs.isEmpty) 0L
        else survTombs.map(t => spark.read.parquet(s"$path/deltas/$t"))
          .reduce(_.unionByName(_)).distinct().count()
      Some(have.copy(deltas = have.deltas.filterNot(decl.deltas.toSet),
        tombs = survTombs, tombCount = survCount, baseDir = newBase))
    } catch {
      case e: IllegalArgumentException =>
        IndexDirs.rmTree(s"$path/$newBase") // orphaned rewrite
        throw e
    }
    // post-commit GC: old base version + folded delta/tombstone dirs
    IndexDirs.gcDeltas(path, decl.deltas ++ decl.tombs)
    IndexDirs.rmTree(s"$path/${decl.baseOr(baseSub)}")
    tombCount
  }

  /** ADC top-k over the persisted PQ index: probes build their
    * distance LUTs (probe-side, broadcast), the corpus side reads
    * ONLY the S-byte codes — base plus committed deltas, raw vectors
    * never leave the build step. Output matches [[Pq.adcTopK]]:
    * (probe_id, <idCol>, adc, rank).
    */
  def pqSearchInt(spark: SparkSession, path: String, probes: DataFrame,
      probeIdCol: String, vecCol: String, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no index at $path"))
    val cbs = pqCodebooks(spark, path)
    val encoded = readParts(spark, path, "codes", mf, None)
      .withColumnRenamed("codes", "__codes")
    Pq.adcTopKEncoded(encoded,
      probes.select(col(probeIdCol).as("probe_id"), col(vecCol).as("pq")),
      k, cbs, corpusId = idCol)
  }
}
