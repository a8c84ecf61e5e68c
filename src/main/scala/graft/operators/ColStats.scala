package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.StableHash
import graft.functions.StrExtremaAgg.{str_max, str_min}

/** Persisted per-column table statistics — the lakehouse stats layer
  * as an incrementally-maintained artifact under the [[IndexDirs]]
  * manifest discipline.
  *
  * Every query planner, data-quality dashboard, and ingest monitor
  * wants the same per-column profile — row/null counts, min/max,
  * sums, distinct-count estimates — and computing it is a full table
  * scan, so at 100 TB it earns the artifact treatment: pay the scan
  * once at build, then fold each ingest batch's partial profile in
  * at O(batch).
  *
  * Layout:
  * {{{
  *   <path>/scalar/   parquet, ≤ |cols| rows: (col_name, kind,
  *                    n_rows, n_nulls, min_num, max_num, sum_num,
  *                    min_str, max_str, sum_len, max_len) — exact
  *                    integer/string aggregates (length stats for
  *                    str columns: the honest row-width input a cost
  *                    model needs), cross-engine replayable
  *   <path>/regs/     parquet, ≤ |cols|·64 rows: (col_name, bucket,
  *                    register) — SPARSE per-column HLL registers
  *                    (m = 64, the [[Hll.md5Hash]] 60-bit hash over
  *                    the rendered value, so DuckDB replays every
  *                    register); serve densifies via a spine
  *   <path>/deltas/d<N>/{scalar,regs}  a batch's partial profile
  *   manifest.m<K>.json — [[IndexDirs]] atomic versioned commits
  * }}}
  *
  * ALGEBRA — append-only by design. Counts and sums are pure sums;
  * min/max and HLL registers are MONOTONE merges (min/min, max/max,
  * per-bucket max): all compose associatively across deltas, so
  * append = one partial-profile pass over the batch and compaction
  * is a fold. None of min/max/registers is RETRACTABLE — removing
  * rows can't shrink a max or un-set a register — so [[delete]] and
  * delete ops in [[applyBatch]] REFUSE with rebuild guidance instead
  * of silently serving stats a retraction has falsified (the honest
  * contract; [[AggView]] documents the same boundary for its
  * non-sum measures). The composed fingerprint makes the served
  * profile's provenance checkable: a survivors-only rebuild after
  * upstream deletes reuses iff nothing else changed.
  *
  * Multi-writer: commits ride [[IndexDirs.stagedCommit]] (anchored
  * optimistic commits with the retry-loop liveness; a lost race
  * GC's its staging), exactly-once streaming via the
  * `batchId <= lastBatch` skip — the family rules.
  */
object ColStats {

  type Build = IndexBuild
  val Build = IndexBuild

  /** m = 64 registers (bucketBits 6) over [[Hll.md5Hash]]'s 60-bit
    * value — fixed, so every engine replays the same registers.
    */
  private val BucketBits = 6
  private val HashBits = 60

  /** On-disk format version. 2 added the `hist/` log₂ histogram
    * table; 3 added string LENGTH stats (`sum_len`/`max_len` — what
    * a cost model needs for honest row-width estimates, see
    * [[graft.plans.ColStatsInjection]]). `sameIndexAs` includes it,
    * so an artifact written by an older format rebuilds instead of
    * serving a table it never wrote.
    */
  private val Fmt = 3

  private case class Manifest(fp: Long, n: Long,
      numCols: Seq[String], strCols: Seq[String],
      deltas: Seq[String] = Nil, lastBatch: Long = -1L,
      baseVer: Int = 0, fmt: Int = Fmt, lg: Int = 0, mv: Long = 0L) {
    def sameIndexAs(other: Manifest): Boolean =
      copy(deltas = Nil, lastBatch = -1L, baseVer = 0, lg = 0,
        mv = 0L) ==
        other.copy(deltas = Nil, lastBatch = -1L, baseVer = 0, lg = 0,
          mv = 0L)
  }

  private def toManifest(r: IndexDirs.ManifestReader): Manifest =
    Manifest(r.long("fp"), r.long("n"), r.seq("num"), r.seq("str"),
      r.seq("deltas"), r.longOr("lb", -1L), r.intOr("bv", 0),
      fmt = r.intOr("fmt", 1), lg = r.intOr("lg", 0), mv = r.version)

  private def readManifest(path: String): Option[Manifest] =
    IndexDirs.readManifest(path).map(toManifest)

  private def writeManifest(path: String, mf: Manifest): Unit =
    IndexDirs.manifest()
      .put("fp", mf.fp).put("n", mf.n)
      .put("num", mf.numCols).put("str", mf.strCols)
      .put("lb", mf.lastBatch).put("bv", mf.baseVer)
      .put("fmt", mf.fmt).put("lg", mf.lg)
      .put("deltas", mf.deltas)
      .commit(path, mf.mv)

  /** Signed log₂ magnitude bucket of a BIGINT — pure integer
    * arithmetic both engines replay bit-for-bit: 0 → bucket 0,
    * v > 0 → bit-length(v) (so bucket b covers [2^(b-1), 2^b − 1]),
    * v < 0 → −bit-length(−v) (mirrored). `Long.MinValue` is outside
    * the replayable domain (−v overflows; Spark wraps to −64, DuckDB
    * errors) — fine for rendered data, documented not defended.
    */
  private[operators] def histBucket(v: Column): Column =
    when(v === 0L, lit(0))
      .when(v > 0L, length(bin(v)).cast("int"))
      .otherwise(-length(bin(-v)).cast("int"))

  /** The HLL (bucket, rho) pair of a RENDERED value — ONE definition
    * shared by [[writeTables]] and the fused builder
    * ([[Profile.buildBoth]]), so the two build paths can never drift.
    */
  private[operators] def hllBucketRho(vstr: Column): (Column, Column) = {
    val h = shiftrightunsigned(
      shiftleft(StableHash.md5Int60(concat(lit("hll:"), vstr)),
        64 - HashBits), 64 - HashBits)
    val w = HashBits - BucketBits
    val rest = shiftrightunsigned(h, BucketBits)
    (h.bitwiseAND(lit(((1 << BucketBits) - 1).toLong)),
      when(rest === 0L, lit(w + 1))
        .otherwise(lit(w + 1) - length(bin(rest))))
  }

  def fingerprint(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String]): (Long, Long) =
    IndexDirs.contentFingerprint(df, numCols ++ strCols)

  /** [[fingerprint]] grouped per source FILE — the per-file partials
    * a pin refresh ([[graft.plans.ColStatsInjection.refreshPins]])
    * stores so later refreshes fingerprint only NEW files and
    * compose the rest (O(delta)). `df` must be a bare file scan.
    */
  def fingerprintByFile(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String]): Map[String, (Long, Long)] =
    IndexDirs.contentFingerprintByFile(df, numCols ++ strCols)

  /** The batch's partial profile — ONE grain-tagged pass
    * ([[Profile.fusedAggregate]]'s shape at table grain, guide
    * §1.2/§2.4: remove passes before tuning anything else). It used
    * to be three exploded scans (scalar, registers, histogram); now
    * scalar (`sc`), histogram (`hi`) and HLL (`hl`) entries explode
    * from ONE scan, one map-side-combined aggregate reduces them to
    * ≤ |cols| × (1 + 129 + 64) rows, and the three tables are cheap
    * re-aggregations of that checkpointed metadata-scale set,
    * written CONCURRENTLY (guide §2.6). At 100 TB this is one corpus
    * scan instead of three; on a merge-on-read input it is one
    * evaluation of the LWW fold instead of three.
    *
    * EXACTNESS: every per-grain expression is the shared definition
    * the separate passes used ([[histBucket]], [[hllBucketRho]], the
    * str extrema aggregates), and each output table is an
    * associative re-aggregation of the grain rows — the same algebra
    * [[Profile.buildBoth]] already rides (ProfileSpec pins the fused
    * artifacts equal to separately-built ones row for row; the
    * ColStatsSpec golden values and the q222/q223/q226 oracle twins
    * gate this path directly).
    */
  private def writeTables(df: DataFrame, mf: Manifest,
      root: String): Unit = {
    val nullL = lit(null).cast("long")
    val nullS = lit(null).cast("string")
    val nullI = lit(null).cast("int")
    def st(grain: String, name: String, kind: String, bucket: Column,
        vnum: Column, vstr: Column, rho: Column): Column =
      struct(lit(grain).as("grain"), lit(name).as("col_name"),
        lit(kind).as("kind"), bucket.cast("long").as("bucket"),
        vnum.cast("long").as("vnum"), vstr.cast("string").as("vstr"),
        rho.cast("int").as("rho"))
    def renderedNum(c: String): Column =
      col(c).cast("long").cast("string")
    val pieces =
      mf.numCols.map(c => st("sc", c, "num", lit(0L),
        col(c).cast("long"), renderedNum(c), nullI)) ++
      mf.strCols.map(c => st("sc", c, "str", lit(0L),
        nullL, col(c).cast("string"), nullI)) ++
      mf.numCols.map(c => st("hi", c, "num",
        histBucket(col(c).cast("long")),
        col(c).cast("long"), nullS, nullI)) ++
      (mf.numCols ++ mf.strCols).map { c =>
        val r = if (mf.numCols.contains(c)) renderedNum(c)
          else col(c).cast("string")
        val (b, rho) = hllBucketRho(r)
        st("hl", c, "", b, nullL, r, rho)
      }
    // project to the declared columns, then widen a
    // fewer-splits-than-cores scan before the explosion (Par.widen:
    // identity at corpus scale); the per-grain null drops mirror the
    // separate passes' own filters
    val lf = Par.widen(
        df.select((mf.numCols ++ mf.strCols).map(col): _*))
      .select(explode(array(pieces: _*)).as("e")).select("e.*")
      .filter(!(col("grain") === "hi" && col("vnum").isNull) &&
        !(col("grain") === "hl" && col("vstr").isNull))
    val isSc = col("grain") === "sc"
    val agg = lf.groupBy("grain", "col_name", "kind", "bucket")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("vstr").isNull, 1L).otherwise(0L)).as("nnull"),
        min("vnum").as("minn"), max("vnum").as("maxn"),
        // sc-only: the hi grain's vnum holds raw values too — only
        // the scalar grain's sum is ever read, and guarding keeps an
        // ANSI session from raising on an irrelevant overflow
        sum(when(isSc, col("vnum"))).as("sumn"),
        // str_min/str_max: exact binary-ordered extrema that keep the
        // corpus-scale profile pass on (Object)HashAggregate — the
        // built-in string min/max would downgrade it to SortAggregate
        str_min(when(isSc, col("vstr"))).as("mins"),
        str_max(when(isSc, col("vstr"))).as("maxs"),
        sum(when(isSc, length(col("vstr")).cast("long"))).as("sumlen"),
        max(when(isSc, length(col("vstr")).cast("long"))).as("maxlen"),
        max(col("rho")).as("maxrho"))
      .localCheckpoint()
    val writeScalar = () => agg.filter(col("grain") === "sc")
      .groupBy("col_name", "kind")
      .agg(sum("cnt").as("n_rows"), sum("nnull").as("n_nulls"),
        min("minn").as("min_num"), max("maxn").as("max_num"),
        sum("sumn").as("sum_num"),
        str_min(col("mins")).as("__mins"),
        str_max(col("maxs")).as("__maxs"),
        sum("sumlen").as("__sumlen"), max("maxlen").as("__maxlen"))
      // string extrema/lengths only mean anything for string columns;
      // a num column's digit-string stats are noise — null them at
      // the source
      .select(col("col_name"), col("kind"), col("n_rows"),
        col("n_nulls"),
        when(col("kind") === "num", col("min_num")).as("min_num"),
        when(col("kind") === "num", col("max_num")).as("max_num"),
        when(col("kind") === "num", col("sum_num")).as("sum_num"),
        when(col("kind") === "str", col("__mins")).as("min_str"),
        when(col("kind") === "str", col("__maxs")).as("max_str"),
        when(col("kind") === "str", col("__sumlen")).as("sum_len"),
        when(col("kind") === "str", col("__maxlen")).as("max_len"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/scalar")
    val writeRegs = () => agg.filter(col("grain") === "hl")
      .groupBy("col_name", "bucket")
      .agg(max(col("maxrho")).cast("int").as("register"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/regs")
    val writeHist = () => agg.filter(col("grain") === "hi")
      .select(col("col_name"), col("bucket").cast("int").as("bucket"),
        col("cnt"))
      .groupBy("col_name", "bucket")
      .agg(sum("cnt").as("cnt"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/hist")
    Par.inParallel(Seq(writeScalar, writeRegs, writeHist))
  }

  private def baseOf(mf: Manifest, sub: String): String =
    if (mf.baseVer == 0) sub else s"$sub.v${mf.baseVer}"

  private def roots(path: String, mf: Manifest,
      sub: String): Seq[String] =
    s"$path/${baseOf(mf, sub)}" +:
      mf.deltas.map(d => s"$path/deltas/$d/$sub")

  /** The scalar-profile MERGE (base ∪ deltas → one row per column):
    * sums compose as sums, extrema as extrema — shared by the live
    * read and compaction so the two can never disagree.
    */
  private def mergeScalar(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_.unionByName(_))
      .groupBy("col_name", "kind")
      .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"),
        min("min_num").as("min_num"), max("max_num").as("max_num"),
        sum("sum_num").as("sum_num"),
        str_min(col("min_str")).as("min_str"),
        str_max(col("max_str")).as("max_str"),
        sum("sum_len").as("sum_len"), max("max_len").as("max_len"))

  private def liveScalar(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    mergeScalar(roots(path, mf, "scalar").map(spark.read.parquet(_)))

  private def liveRegs(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    roots(path, mf, "regs").map(spark.read.parquet(_))
      .reduce(_.unionByName(_))
      .groupBy("col_name", "bucket")
      .agg(max("register").cast("int").as("register"))

  private def liveHist(spark: SparkSession, path: String,
      mf: Manifest): DataFrame =
    roots(path, mf, "hist").map(spark.read.parquet(_))
      .reduce(_.unionByName(_))
      .groupBy("col_name", "bucket")
      .agg(sum("cnt").as("cnt"))

  /** `df` must be DETERMINISTIC (a table/view whose plan replays the
    * same rows): the fingerprint and the three profile passes each
    * evaluate it independently — a sampled/rand()-derived input
    * would commit mutually inconsistent tables. Snapshot such inputs
    * (e.g. `localCheckpoint`) before profiling; [[applyBatch]]
    * already does for its micro-batches.
    */
  def buildIfAbsent(df: DataFrame, numCols: Seq[String],
      strCols: Seq[String], path: String): Build = {
    require((numCols ++ strCols).nonEmpty, "declare at least 1 column")
    require(numCols.intersect(strCols).isEmpty,
      s"columns declared both num and str: " +
        numCols.intersect(strCols).mkString(","))
    // bare-scan input: the fingerprint pass runs grouped by source
    // file (same scan) and the partials persist as a `ledger` table
    // beside the profile — what lets the stats bridge's registration
    // seed its pin-refresh partials SCAN-FREE even when no co-built
    // zone map exists (e.g. a partitioned base, whose partition
    // columns a zone map cannot profile). The AggView recipe.
    val bareFiles: Option[Seq[graft.plans.RelationPins.ListedFile]] =
      try graft.plans.RelationPins
        .bare(org.apache.spark.sql.GraftBridge.analyzedPlan(df))
        .map { case (_, h) => graft.plans.RelationPins.listedFiles(h) }
      catch { case scala.util.control.NonFatal(_) => None }
    val (fp, n, ledgerRows) = bareFiles match {
      case Some(files) =>
        val byFile = fingerprintByFile(df, numCols, strCols)
        val n = byFile.valuesIterator.map(_._2).sum
        val fp =
          if (n == 0) 0L
          else byFile.valuesIterator.map(_._1).foldLeft(0L)(_ ^ _)
        val strays = byFile.keySet -- files.map(_.key).toSet
        val rows =
          if (strays.nonEmpty) None
          else Some(files.map { f =>
            val (cfp, cn) = byFile.getOrElse(f.key, (0L, 0L))
            (f.key, f.uri, f.len, f.mtime, cfp, cn)
          })
        (fp, n, rows)
      case None =>
        val (fp, n) = fingerprint(df, numCols, strCols)
        (fp, n, None)
    }
    val want = Manifest(fp, n, numCols, strCols,
      lg = if (ledgerRows.isDefined) 1 else 0)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        IndexDirs.uncommit(path)
        writeTables(df, want, path)
        ledgerRows.foreach { rows =>
          val spark = df.sparkSession
          import spark.implicits._
          ZoneMap.writeArtifact(
            rows.toDF("file", "uri", "flen", "fmtime", "cfp", "cn"),
            rows.size.toLong, s"$path/ledger",
            ZoneMap.DefaultArtifactRowsPerFile)
        }
        writeManifest(path, want)
        Build(path, fp, n, reused = false)
    }
  }

  /** The build-time per-file CONTENT-FINGERPRINT ledger: file key →
    * (length, mtime, fp partial, row count) over the declared
    * columns — one row per base file the build scanned, computed in
    * the build's fingerprint pass itself. What
    * [[graft.plans.ColStatsInjection.register]] seeds its
    * pin-refresh partials from when no zone-map ledger is passed.
    * None for profiles built before the ledger existed or over
    * non-bare inputs.
    */
  def fingerprintLedger(spark: SparkSession,
      path: String): Option[Map[String, (Long, Long, Long, Long)]] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    if (mf.lg == 0) None
    else Some(spark.read.parquet(s"$path/ledger")
      .select("file", "flen", "fmtime", "cfp", "cn").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap)
  }

  /** Fused-builder hooks ([[Profile.buildBoth]]): the reuse check and
    * the manifest commit for a build whose TABLES the fused one-scan
    * pass wrote (the fused pass calls [[IndexDirs.uncommit]] before
    * writing, so commit order matches [[buildIfAbsent]]'s).
    */
  private[operators] def reusableFor(path: String, fp: Long, n: Long,
      numCols: Seq[String], strCols: Seq[String]): Boolean =
    readManifest(path).exists(
      _.sameIndexAs(Manifest(fp, n, numCols, strCols)))

  private[operators] def commitBuild(path: String, fp: Long, n: Long,
      numCols: Seq[String], strCols: Seq[String]): Unit =
    writeManifest(path, Manifest(fp, n, numCols, strCols))

  def append(delta: DataFrame, path: String): Build =
    appendImpl(delta, path, None)

  private def appendImpl(delta: DataFrame, path: String,
      batchMark: Option[Long]): Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    requireFmt3(decl, path)
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl.numCols, decl.strCols)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val staged = IndexDirs.nextDeltaName(path, "d")
    writeTables(delta, decl, s"$path/deltas/$staged")
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (batchMark.exists(_ <= have.lastBatch)) None
      else Some(have.copy(fp = have.fp ^ dfp, n = have.n + dn,
        deltas = have.deltas :+ staged,
        lastBatch = batchMark.getOrElse(have.lastBatch)))
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None => // a racing replay landed this batch id first
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  /** REFUSED: min/max and HLL registers are monotone, not
    * retractable — serving them after a row removal would be a lie.
    * Rebuild from the surviving rows instead (the fingerprint makes
    * the rebuild a no-op when nothing else changed).
    */
  def delete(delta: DataFrame, path: String): Build =
    throw new UnsupportedOperationException(
      s"column statistics at $path are append-only: min/max and " +
        "distinct-count registers cannot retract rows — rebuild " +
        "with buildIfAbsent over the surviving rows")

  /** Exactly-once streaming maintenance (`batchId <= lastBatch` ⇒
    * skip, the family rule).
    */
  def appendBatch(batch: DataFrame, batchId: Long,
      path: String): Build =
    appendImpl(batch, path, Some(batchId))

  /** Op-aware form for a shared CDC feed: inserts append; ANY delete
    * row refuses the whole batch (atomically — nothing is staged
    * first), because a retraction cannot be folded into monotone
    * stats. Feeds with deletes should rebuild downstream instead.
    */
  def applyBatch(batch: DataFrame, batchId: Long, path: String,
      opCol: String = "op", deleteOp: String = "D"): Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    if (batchId <= decl.lastBatch)
      return Build(path, decl.fp, decl.n, reused = true)
    val rows = batch.localCheckpoint(false)
    val nDel = rows.filter(col(opCol) === deleteOp).limit(1).count()
    if (nDel > 0) delete(rows, path)
    appendBatch(rows.filter(col(opCol) =!= deleteOp).drop(opCol),
      batchId, path)
  }

  def cdcSink(path: String, opCol: String = "op",
      deleteOp: String = "D"): (DataFrame, Long) => Unit =
    (df, id) => { applyBatch(df, id, path, opCol, deleteOp); () }

  /** Fold the committed deltas into ONE delta dir — same serve
    * state, fewer files ([[AggView.compactDeltas]]'s shape; all
    * merges monotone, so the fold is exact). Returns folded count.
    */
  def compactDeltas(spark: SparkSession, path: String): Int = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    if (decl.fmt < 3 || decl.deltas.length < 2) return 0
    val folded = decl.deltas
    val staged = IndexDirs.nextDeltaName(path, "c")
    // the three table folds are independent metadata-scale jobs —
    // run them CONCURRENTLY (guide §2.6)
    Par.inParallel(Seq(
      () => mergeScalar(
          folded.map(d => spark.read.parquet(s"$path/deltas/$d/scalar")))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/deltas/$staged/scalar"),
      () => folded.map(d => spark.read.parquet(s"$path/deltas/$d/regs"))
        .reduce(_.unionByName(_))
        .groupBy("col_name", "bucket")
        .agg(max("register").cast("int").as("register"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/deltas/$staged/regs"),
      () => folded.map(d => spark.read.parquet(s"$path/deltas/$d/hist"))
        .reduce(_.unionByName(_))
        .groupBy("col_name", "bucket")
        .agg(sum("cnt").as("cnt"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$path/deltas/$staged/hist")))
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      // a delta folded by a RACING compaction makes this fold stale
      if (!folded.forall(have.deltas.contains)) None
      else Some(have.copy(
        deltas = staged +: have.deltas.filterNot(folded.toSet)))
    } match {
      case Some(_) => IndexDirs.gcDeltas(path, folded); folded.length
      case None => 0
    }
  }

  /** The merged per-column profile: ≤ |cols| rows, exact integer /
    * string aggregates — (col_name, kind, n_rows, n_nulls, min_num,
    * max_num, sum_num, min_str, max_str).
    */
  /** The scalar table's shape changed at format 3 (string-length
    * stats): serving or APPENDING INTO an older artifact would throw
    * an unresolved-column error — or worse, commit a mixed-schema
    * delta that poisons every later read — so scalar readers and
    * mutators refuse with rebuild guidance instead. (`registers`/
    * `hist`/`ndv`/`quantiles` are format-stable and keep serving.)
    */
  private def requireFmt3(mf: Manifest, path: String): Unit =
    require(mf.fmt >= 3,
      s"column statistics at $path were written by format ${mf.fmt} " +
        "(scalar table without string-length stats) — rebuild with " +
        "buildIfAbsent to upgrade")

  def stats(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    requireFmt3(mf, path)
    liveScalar(spark, path, mf)
  }

  /** The committed manifest VERSION of the artifact — every
    * build/append/compact/applyBatch commit is a higher version, so
    * this is the freshness pin a consumer
    * ([[graft.plans.ColStatsInjection]]) re-checks before trusting a
    * profile it registered earlier.
    */
  def version(path: String): Long =
    readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path")).mv

  /** The artifact's committed declaration + freshness pins: the
    * declared column lists, the manifest version (the staleness pin a
    * consumer re-checks), the composed content FINGERPRINT of
    * everything the profile absorbed (what [[fingerprint]] of a
    * consistent base reproduces — the pin-REFRESH verification of
    * [[graft.plans.ColStatsInjection.refreshPins]]), and the live row
    * count.
    */
  final case class Decl(numCols: Seq[String], strCols: Seq[String],
      version: Long, fp: Long, n: Long, lastBatch: Long = -1L)

  def declaration(path: String): Decl = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    Decl(mf.numCols, mf.strCols, mf.mv, mf.fp, mf.n, mf.lastBatch)
  }

  /** The merged DENSE per-column HLL registers: |cols| × 64 rows,
    * untouched buckets as register 0 (a local spine from the
    * manifest's column list — metadata-scale).
    */
  def registers(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    import spark.implicits._
    val spine = (for {
      c <- mf.numCols ++ mf.strCols
      b <- 0 until (1 << BucketBits)
    } yield (c, b.toLong)).toDF("col_name", "bucket")
    spine.join(broadcast(liveRegs(spark, path, mf)),
        Seq("col_name", "bucket"), "left")
      .select(col("col_name"), col("bucket"),
        coalesce(col("register"), lit(0)).cast("int").as("register"))
  }

  /** The merged signed-log₂ value histogram of every numeric column:
    * (col_name, bucket, cnt), bucket = [[histBucket]] — counts are
    * pure sums, so deltas fold exactly and both engines replay every
    * bucket bit-for-bit. ≤ |numCols|·129 rows.
    */
  def hist(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no stats at $path"))
    liveHist(spark, path, mf)
  }

  /** Per-column approximate quantiles from the merged histogram:
    * for each requested fraction q, the FIRST bucket whose cumulative
    * count reaches ⌈q·n_nonnull⌉, estimated at the bucket's value
    * midpoint — the true quantile provably lies inside the chosen
    * bucket's range (the histogram is exact), so the estimate is off
    * by at most half the bucket width (a factor ≤ 2 of the
    * magnitude, the log₂-histogram contract). Float math → spec
    * territory; the oracle pins [[hist]].
    *
    * The window runs partitioned by col_name over the ≤ 129-bucket
    * histogram — metadata-scale by construction.
    */
  def quantiles(spark: SparkSession, path: String,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantile fractions must be in (0, 1], got ${qs.mkString(",")}")
    import org.apache.spark.sql.expressions.Window
    val h = hist(spark, path)
    val w = Window.partitionBy("col_name").orderBy("bucket")
    val cum = h
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("total",
        sum("cnt").over(Window.partitionBy("col_name")))
    val fracs = explode(array(qs.map(lit): _*)).as("q")
    // value midpoint of a signed log2 bucket: b=0 → 0; b>0 →
    // (2^(b-1) + 2^b - 1)/2; b<0 mirrored negative
    val mid = {
      val b = col("bucket").cast("double")
      when(col("bucket") === 0, lit(0.0))
        .when(col("bucket") > 0,
          (pow(lit(2.0), b - 1) + pow(lit(2.0), b) - 1) / 2)
        .otherwise(-(pow(lit(2.0), -b - 1) + pow(lit(2.0), -b) - 1) / 2)
    }
    cum.select(col("col_name"), col("bucket"), col("cum"),
        col("total"), fracs)
      .filter(col("cum") >= ceil(col("q") * col("total")))
      .groupBy("col_name", "q")
      .agg(min("bucket").as("bucket"))
      .select(col("col_name"), col("q"), col("bucket"),
        round(mid, 4).as("estimate"))
  }

  /** Per-column distinct-count estimate from the merged registers
    * (the [[Hll.estimate]] formula per column; float math → spec
    * territory, the oracle pins the REGISTERS).
    */
  def ndv(spark: SparkSession, path: String): DataFrame = {
    val m = 1 << BucketBits
    val alpha = 0.709 // m = 64
    registers(spark, path)
      .groupBy("col_name")
      .agg(sum(pow(lit(2.0), -col("register"))).as("__z"),
        sum(when(col("register") === 0, 1L).otherwise(0L)).as("__v"))
      .select(col("col_name"), {
        val raw = lit(alpha * m.toDouble * m.toDouble) / col("__z")
        round(when(raw <= lit(2.5 * m) && col("__v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
          .otherwise(raw), 2).as("ndv_est")
      })
  }
}
