package graft.operators

import scala.util.control.NonFatal

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, StringType}

import graft.functions.StrExtremaAgg.{str_max, str_min}
import graft.plans.RelationPins

/** Persisted incrementally-maintained aggregate view — the
  * [[LmIndex]]/[[Bm25Index]] pure-sum algebra generalized to ANY
  * grouped rollup a pipeline dashboards on: per-group `count` plus
  * user-declared SUM measures (each a row-local SQL expression), kept
  * fresh under CDC without ever re-scanning the fact corpus.
  *
  * At 100 TB the difference between "refresh the rollup" meaning a
  * full corpus aggregate versus an O(delta) append is the difference
  * between a nightly job and a continuously-serveable view — this is
  * the incremental-view-maintenance shape (self-maintainable
  * SUM/COUNT views over insert/delete streams, per the classic IVM
  * literature), rendered as an on-disk artifact under the
  * [[IndexDirs]] manifest discipline:
  *
  * {{{
  *   <path>/agg/kb=<b>/   parquet: (keys..., __cnt BIGINT,
  *                        <measure sums...>) — grouped partial sums,
  *                        partitioned by the key-hash bucket `kb`, so
  *                        a dashboard probe reads 1/kbParts of the
  *                        view, never all of it
  *   <path>/deltas/d<N>/agg  appended (or count-NEGATED) partial sums
  *   <path>/manifest.json — keys + measure expressions + fingerprint,
  *                        written LAST (atomic commit marker)
  * }}}
  *
  * Reads aggregate base ∪ committed deltas per group and drop
  * `__cnt ≤ 0` groups; append = the DELTA's grouped sums (O(delta));
  * delete = the same rows count-negated, so a retracted fact
  * subtracts right back out and [[compactDeltas]]/[[purge]] leave the
  * artifact bit-for-bit the view over the surviving facts. SUM-algebra
  * measures (sums of row-local expressions; count and mean = sum/cnt
  * ride along for free) get the full signed lifecycle; MIN/MAX
  * measures are offered APPEND-ONLY ([[Measure.kind]]) — monotone
  * under inserts, with every delete path refusing loudly, because
  * extrema are not self-maintainable under deletes.
  *
  * Unlike the doc-keyed artifacts ([[DedupIndex]], [[LmIndex]]),
  * fact rows have no identity, so deletes cannot be content-verified
  * against a ledger without storing the corpus itself; the CDC feed
  * is the source of truth (the [[MergeOnRead]] contract — deletes
  * are the table's own rows). What IS enforced: [[delete]]'s bounded
  * over-delete guard (no group's live count may go negative), and
  * the composed fingerprint, which a survivors-only rebuild
  * reuse-checks — silent corruption is detectable, and
  * [[purge]] + rebuild is the repair.
  *
  * Reference grounding: immutable loaded artifacts serving every
  * request (directory/directory.go:230-240), applied to rollup state.
  */
object AggView {

  type Build = IndexBuild
  val Build = IndexBuild

  /** A measure: `name` is the output column, `sqlExpr` a row-local
    * SQL expression over the fact columns (carried in the manifest —
    * part of the view identity). `kind` is the fold:
    *
    *  - `"sum"` (default) — the self-maintainable signed algebra:
    *    appends add, deletes retract, diff/compaction/purge all work;
    *  - `"min"` / `"max"` — APPEND-ONLY extrema: monotone under
    *    inserts (min of partial mins), NOT self-maintainable under
    *    deletes (a retracted extremum cannot be un-folded), so
    *    [[delete]], delete-bearing [[applyBatch]]es, and [[diff]]
    *    REFUSE on views declaring them — the [[ColStats]] contract
    *    applied to rollup measures. What lets the MV rewrite serve
    *    grouped `min(E)`/`max(E)` on append-only fact tables (most
    *    training-data pipelines) from the rollup.
    */
  final case class Measure(name: String, sqlExpr: String,
      kind: String = "sum")

  private case class Manifest(fp: Long, n: Long, keys: Seq[String],
      mNames: Seq[String], mExprs: Seq[String], kbParts: Int,
      deltas: Seq[String] = Nil, lastBatch: Long = -1L,
      baseVer: Int = 0, lg: Int = 0, mKinds: Seq[String] = Nil,
      mv: Long = 0L) {
    def sameIndexAs(other: Manifest): Boolean =
      // mKinds normalized through `kinds`: a pre-kind manifest (no
      // mkinds recorded) ≡ the same declaration spelled all-sum
      copy(deltas = Nil, lastBatch = -1L, baseVer = 0, lg = 0,
        mKinds = kinds, mv = 0L) ==
        other.copy(deltas = Nil, lastBatch = -1L, baseVer = 0, lg = 0,
          mKinds = other.kinds, mv = 0L)
    def baseOf(sub: String): String =
      if (baseVer == 0) sub else s"$sub.v$baseVer"
    // compat: manifests written before measure kinds existed carry
    // none — every measure was a sum
    def kinds: Seq[String] =
      if (mKinds.size == mNames.size) mKinds
      else Seq.fill(mNames.size)("sum")
    def measures: Seq[Measure] =
      mNames.lazyZip(mExprs).lazyZip(kinds).map(Measure.apply)
    def appendOnlyMeasures: Boolean = kinds.exists(_ != "sum")
  }

  private def toManifest(r: IndexDirs.ManifestReader): Manifest =
    Manifest(r.long("fp"), r.long("n"), r.seq("keys"),
      r.seq("mnames"), r.seq("mexprs"), r.int("kb"),
      r.seq("deltas"), r.longOr("lb", -1L), r.intOr("bv", 0),
      r.intOr("lg", 0), r.seq("mkinds"), mv = r.version)

  private def readManifest(path: String): Option[Manifest] =
    IndexDirs.readManifest(path).map(toManifest)

  private def writeManifest(path: String, mf: Manifest): Unit =
    IndexDirs.manifest()
      .put("fp", mf.fp).put("n", mf.n)
      .put("keys", mf.keys)
      .put("mnames", mf.mNames).put("mexprs", mf.mExprs)
      .put("mkinds", mf.kinds)
      .put("kb", mf.kbParts)
      .put("lb", mf.lastBatch).put("bv", mf.baseVer)
      .put("lg", mf.lg)
      .put("deltas", mf.deltas)
      .commit(path, mf.mv)

  /** Per-kind fold of one measure's PARTIALS — the same expression
    * serves delta writes, live reads, compactions, and purges, so
    * the folds can never drift between paths.
    */
  private def foldMeasure(m: Measure): Column = m.kind match {
    case "min" => min(col(m.name)).as(m.name)
    case "max" => max(col(m.name)).as(m.name)
    case _ => sum(col(m.name)).as(m.name)
  }

  private def kbCol(keys: Seq[String], kbParts: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(kbParts)).cast("int")

  /** The view's dependency projection: keys + evaluated measure
    * expressions. Both the fingerprint and the grouped sums run over
    * this, so two fact tables that agree on every view-relevant value
    * ARE the same view (column order, unused columns, row order all
    * irrelevant).
    */
  private def projected(facts: DataFrame, mf: Manifest): DataFrame =
    facts.select(mf.keys.map(col) ++
      mf.measures.map(m => expr(m.sqlExpr).as(m.name)): _*)

  private def fingerprint(facts: DataFrame, mf0: Manifest): (Long, Long) =
    IndexDirs.contentFingerprint(projected(facts, mf0),
      mf0.keys ++ mf0.mNames)

  /** Grouped signed partial sums of `facts` (per-kind folds for
    * min/max measures — only ever written with sign 1, the delete
    * paths refuse append-only measures), written kb-partitioned
    * (one file per bucket) under `root`.
    */
  private def writeDelta(facts: DataFrame, sign: Int, mf: Manifest,
      root: String): Unit = {
    require(sign == 1 || !mf.appendOnlyMeasures,
      "negated deltas are undefined for min/max measures")
    // deliberately NOT Par.widen'd: the grouped partial sum is one or
    // two sums per row (scan-bound), and this path also runs per
    // append on small deltas where an extra exchange is pure overhead
    projected(facts, mf)
      .groupBy(mf.keys.map(col): _*)
      .agg((count(lit(1)) * sign).as("__cnt"),
        mf.measures.map { m =>
          if (m.kind == "sum") (sum(col(m.name)) * sign).as(m.name)
          else foldMeasure(m)
        }: _*)
      .withColumn("kb", kbCol(mf.keys, mf.kbParts))
      .repartition(col("kb"))
      .write.mode("overwrite").partitionBy("kb")
      .parquet(s"$root/agg")
  }

  /** Live aggregated groups: base ∪ committed deltas summed per
    * group, `__cnt ≤ 0` groups dropped. `parts` prunes every read to
    * the given kb partitions (the [[lookup]] path).
    */
  private def liveAgg(spark: SparkSession, path: String, mf: Manifest,
      parts: Option[Seq[Int]] = None,
      where: Option[Column] = None): DataFrame = {
    val roots = s"$path/${mf.baseOf("agg")}" +:
      mf.deltas.map(d => s"$path/deltas/$d/agg")
    roots.map { r =>
        val df = spark.read.parquet(r)
        val pruned =
          parts.fold(df)(w => df.filter(col("kb").isin(w.map(Int.box): _*)))
        // a key-only predicate commutes with the per-group sum, so it
        // is applied PER ROOT (directly above each parquet scan) —
        // the scans carry it as a pushed data filter even when no
        // later optimizer pass re-runs pushdown over this subtree
        where.fold(pruned)(pruned.filter)
      }.reduce(_.unionByName(_))
      .groupBy(mf.keys.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
        mf.measures.map(foldMeasure): _*)
      .filter(col("__cnt") > 0)
  }

  /** Build the view at `path` unless the manifest matches both the
    * declaration (keys, measures, bucketing) AND the fact corpus
    * fingerprint — on reuse nothing scans but the fingerprint
    * projection.
    *
    * When `facts` is a BARE parquet scan, the fingerprint pass runs
    * grouped by source file (same scan, ≤ |files| extra rows) and
    * the per-file partials persist as a `ledger` table beside the
    * view (the [[ZoneMap]] format-4 trick) — what lets the
    * materialized-view rewrite's registration seed its pin-refresh
    * partials SCAN-FREE, so even the FIRST refresh after an append
    * fingerprints only the appended files
    * ([[graft.plans.AggViewRewrite.register]]).
    */
  def buildIfAbsent(facts: DataFrame, keys: Seq[String],
      measures: Seq[Measure], path: String, kbParts: Int = 16): Build = {
    val want0 = declManifest(keys, measures, kbParts)
    // bare-scan facts: the one fingerprint pass also yields the
    // per-file ledger rows (xor/count compose, so the summed partials
    // ARE the corpus fingerprint — bit-identical to the ungrouped
    // pass, manifest-compatible either way)
    val bareFiles: Option[Seq[RelationPins.ListedFile]] =
      try RelationPins.bare(GraftBridge.analyzedPlan(facts))
        .map { case (_, h) => RelationPins.listedFiles(h) }
      catch { case NonFatal(_) => None }
    val (fp, n, ledgerRows) = bareFiles match {
      case Some(files) =>
        val byFile = IndexDirs.contentFingerprintByFile(
          projected(facts, want0), keys ++ want0.mNames)
        composeLedger(files, byFile)
      case None =>
        val (fp, n) = fingerprint(facts, want0)
        (fp, n, None)
    }
    finishBuild(facts, want0, path, fp, n, ledgerRows)
  }

  /** One dimension of a STAR build/registration: the dim table, the
    * equi-join key pairs as (fact column, dim column) names, and the
    * join type — `"inner"` (default) or `"left"` (fact LEFT OUTER
    * JOIN dim: every fact row kept, unmatched rows null-extend the
    * dim columns — the enrichment-join shape most 100 TB pipelines
    * actually use, since dropping facts with a missing dim row is
    * rarely acceptable).
    */
  final case class StarDim(df: DataFrame,
      keys: Seq[(String, String)], joinType: String = "inner") {
    require(joinType == "inner" || joinType == "left",
      s"star dim join type must be 'inner' or 'left', got $joinType")
  }

  /** [[buildIfAbsent]] for a STAR: the view over `fact ⋈ dims`
    * (equi-joins on each [[StarDim]]'s declared (fact column, dim
    * column) pairs — inner or left per dim, every dim broadcast),
    * with the build's fingerprint pass grouped by the FACT source
    * file — each joined row composes into the partial of the fact
    * file it expanded from ([[sourceFileKey]], tagged BEFORE the
    * joins) — and persisted as the view's ledger. What lets
    * [[graft.plans.AggViewRewrite.registerStar]] seed its pin-refresh
    * partials scan-free, so even a star view's FIRST refresh after a
    * fact append joins and fingerprints only the appended files
    * (the flat path's build-time-ledger property, line for line).
    * `fact` must be a bare parquet scan (the ledger is per fact
    * file); fact and dim column names must be disjoint (the join
    * and the refresh's replay of it resolve columns by name).
    */
  def buildStarIfAbsent(fact: DataFrame, dims: Seq[StarDim],
      keys: Seq[String], measures: Seq[Measure], path: String,
      kbParts: Int = 16): Build = {
    require(dims.nonEmpty,
      "buildStarIfAbsent needs at least one dim — use buildIfAbsent " +
        "for a single-table view")
    val want0 = declManifest(keys, measures, kbParts)
    val src = "__graft_src"
    require(!(keys ++ measures.map(_.name)).contains(src),
      s"the name $src is reserved for the build's fact-file tag")
    val joined = dims.foldLeft(fact.withColumn(src, sourceFileKey)) {
      case (acc, sd) =>
        require(sd.keys.nonEmpty,
          "each dim needs at least one join key pair")
        // lower-cased: the default resolver is case-insensitive
        val clash = acc.columns.map(_.toLowerCase).toSet
          .intersect(sd.df.columns.map(_.toLowerCase).toSet)
        require(clash.isEmpty,
          "fact and dim column names must be disjoint (the join " +
            s"resolves by name); colliding: ${clash.toSeq.sorted.mkString(",")}")
        val cond = sd.keys.map { case (fc, dc) =>
          acc(fc) === sd.df(dc) }.reduce(_ && _)
        acc.join(broadcast(sd.df), cond, sd.joinType)
    }
    val bareFiles: Option[Seq[RelationPins.ListedFile]] =
      try RelationPins.bare(GraftBridge.analyzedPlan(fact))
        .map { case (_, h) => RelationPins.listedFiles(h) }
      catch { case NonFatal(_) => None }
    val (fp, n, ledgerRows) = bareFiles match {
      case Some(files) =>
        val proj = joined.select(col(src) +: (want0.keys.map(col) ++
          want0.measures.map(m => expr(m.sqlExpr).as(m.name))): _*)
        val byFile = IndexDirs.contentFingerprintByFile(proj,
          keys ++ want0.mNames, col(src))
        composeLedger(files, byFile)
      case None =>
        val (fp, n) = fingerprint(joined, want0)
        (fp, n, None)
    }
    finishBuild(joined, want0, path, fp, n, ledgerRows)
  }

  /** The declaration manifest, with the name/kind validation both
    * build entrances share.
    */
  private def declManifest(keys: Seq[String], measures: Seq[Measure],
      kbParts: Int): Manifest = {
    val names = keys ++ measures.map(_.name) :+ "__cnt" :+ "kb"
    require(names.distinct.size == names.size,
      s"keys/measure names collide (or use the reserved __cnt/kb): " +
        names.mkString(", "))
    val badKinds = measures.map(_.kind).filterNot(
      Set("sum", "min", "max"))
    require(badKinds.isEmpty,
      s"unknown measure kind(s): ${badKinds.distinct.mkString(",")} " +
        "(supported: sum, min, max)")
    Manifest(0L, 0L, keys, measures.map(_.name),
      measures.map(_.sqlExpr), kbParts,
      mKinds = measures.map(_.kind))
  }

  /** Compose per-file partials into the corpus (fp, n) and the
    * ledger rows. A scanned key outside the listing means the
    * file-key normalization drifted — the partials would seed wrong
    * refreshes, so the ledger is skipped (the fp/n are computed from
    * ALL scanned groups and stay exact regardless).
    */
  private def composeLedger(files: Seq[RelationPins.ListedFile],
      byFile: Map[String, (Long, Long)])
      : (Long, Long, Option[Seq[(String, String, Long, Long, Long, Long)]]) = {
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
  }

  /** The shared build tail: reuse check against the manifest, else
    * write the delta (and the ledger, when the fingerprint pass
    * produced one) and commit. `facts` may carry extra columns (a
    * star build's file tag) — [[writeDelta]] projects to the view's
    * dependency columns.
    */
  private def finishBuild(facts: DataFrame, want0: Manifest,
      path: String, fp: Long, n: Long,
      ledgerRows: Option[Seq[(String, String, Long, Long, Long, Long)]])
      : Build = {
    val want = want0.copy(fp = fp, n = n,
      lg = if (ledgerRows.isDefined) 1 else 0)
    readManifest(path) match {
      case Some(have) if have.sameIndexAs(want) =>
        Build(path, fp, n, reused = true)
      case _ =>
        IndexDirs.uncommit(path)
        writeDelta(facts, 1, want, path)
        ledgerRows.foreach { rows =>
          val spark = facts.sparkSession
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
    * (length, mtime, fp partial, row count) under the view's own
    * dependency projection — one row per base file the build scanned,
    * computed in the build's fingerprint pass itself. What
    * [[graft.plans.AggViewRewrite.register]] seeds its pin-refresh
    * partials from (scan-free; entries whose (length, mtime) no
    * longer match the live listing are simply not adopted). None for
    * views built before the ledger existed or over non-bare facts
    * (a joined/derived build has no one-file-per-row provenance).
    */
  def fingerprintLedger(spark: SparkSession,
      path: String): Option[Map[String, (Long, Long, Long, Long)]] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    if (mf.lg == 0) None
    else Some(spark.read.parquet(s"$path/ledger")
      .select("file", "flen", "fmtime", "cfp", "cn").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap)
  }

  /** The served view: one row per live group — keys, `cnt`, and the
    * measure sums.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    liveAgg(spark, path, mf)
      .select(mf.keys.map(col) ++ (col("__cnt").as("cnt") +:
        mf.mNames.map(col)): _*)
  }

  /** [[read]] with an optional key-only predicate pushed to every
    * root scan and an optional kb-partition prune — the serve shape
    * the materialized-view rewrite ([[graft.plans.AggViewRewrite]])
    * emits: `where` must reference only key columns (it commutes
    * with the per-group sum; this is NOT checked here — the callers
    * own that invariant), `parts` are kb partition values (the
    * [[lookup]] prune, computed driver-side from key equalities).
    */
  def readFor(spark: SparkSession, path: String,
      where: Option[Column] = None,
      parts: Option[Seq[Int]] = None): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    liveAgg(spark, path, mf, parts, where)
      .select(mf.keys.map(col) ++ (col("__cnt").as("cnt") +:
        mf.mNames.map(col)): _*)
  }

  /** The view's committed declaration + freshness pins — what a
    * query rewriter needs to decide whether a grouped aggregate can
    * be served from this artifact: the key columns, the measure
    * name/expression pairs, the kb bucketing, the manifest VERSION
    * the declaration was read at (any later maintenance commit is a
    * higher version — the rewriter's staleness pin), the live fact
    * count, the composed content FINGERPRINT of everything the view
    * absorbed (what [[factsFingerprint]] of a consistent fact table
    * reproduces — the rewriter's pin-REFRESH verification), and the
    * last applied CDC batch id (the watermark a fleet-maintained
    * base is coordinated against).
    */
  final case class Decl(keys: Seq[String], measures: Seq[Measure],
      kbParts: Int, version: Long, n: Long, fp: Long = 0L,
      lastBatch: Long = -1L)

  def declaration(path: String): Decl = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    Decl(mf.keys, mf.measures, mf.kbParts, mf.mv, mf.n, mf.fp,
      mf.lastBatch)
  }

  /** The content fingerprint of `facts` PROJECTED THROUGH the view's
    * own dependency projection (keys + evaluated measures — column
    * order, unused columns, row order all irrelevant): equal to the
    * view manifest's composed `fp` iff the view is exactly the rollup
    * of `facts`. The EXACT consistency verification a pin refresh
    * ([[graft.plans.AggViewRewrite.refreshPins]]) runs before
    * re-trusting a registration — one projected scan of the facts,
    * the same pass [[buildIfAbsent]]'s reuse check already prices.
    */
  def factsFingerprint(facts: DataFrame, path: String): (Long, Long) = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    fingerprint(facts, mf)
  }

  /** [[factsFingerprint]] grouped per source FILE
    * ([[IndexDirs.contentFingerprintByFile]] under the view's own
    * dependency projection) — the per-file partials a pin refresh
    * stores so later refreshes fingerprint only NEW files and
    * compose the rest (O(delta)). `facts` must be a bare file scan
    * (possibly of a file subset — the delta path reads just the new
    * files).
    */
  def factsFingerprintByFile(facts: DataFrame,
      path: String): Map[String, (Long, Long)] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    IndexDirs.contentFingerprintByFile(projected(facts, mf),
      mf.keys ++ mf.mNames)
  }

  /** The scheme-free source-file key of the CURRENT scan's file —
    * what a STAR delta tags its fact side with BEFORE joining the
    * dims: `input_file_name()` is single-source-only, so it must be
    * evaluated in a projection sitting directly over the fact scan,
    * not above the joins.
    */
  def sourceFileKey: Column = ZoneMap.fileKey(input_file_name())

  /** [[factsFingerprintByFile]] for JOINED (star) deltas: `facts`
    * carries the fact-side source-file key precomputed in `srcCol`
    * ([[sourceFileKey]], tagged pre-join), and the partials group by
    * it — each joined row composes into the fingerprint partial of
    * the FACT file it expanded from, so fact-file partials stay the
    * verification unit even though the projected values mix in dim
    * columns.
    */
  def factsFingerprintByFileTagged(facts: DataFrame, path: String,
      srcCol: String): Map[String, (Long, Long)] = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    val proj = facts.select(col(srcCol) +: (mf.keys.map(col) ++
      mf.measures.map(m => expr(m.sqlExpr).as(m.name))): _*)
    IndexDirs.contentFingerprintByFile(proj, mf.keys ++ mf.mNames,
      col(srcCol))
  }

  /** Per-kb-partition ZONES of the view's KEY values, computed from
    * the live folded groups: (kb, col_name, kind, n_groups, n_nulls,
    * min_num, max_num, min_str, max_str) — ≤ kbParts·|keys| rows.
    * Integral keys zone numerically; string keys in UTF-8 byte order
    * ([[graft.functions.StrExtremaAgg]]); other key types get no
    * zone rows (consumers stay conservative). What lets a consumer
    * prune kb PARTITIONS for predicates hash bucketing cannot
    * enumerate — LIKE-prefix and unbounded ranges
    * ([[graft.plans.AggViewRewrite]]'s zone prune, via the shared
    * [[ZoneTests]]). EXACT for the artifact's current committed
    * version: the consumer recomputes at every (re-)pin and only
    * serves while the pin is fresh, so zones and the served version
    * can never diverge — no second artifact, no staleness algebra.
    * One rollup-size distributed aggregate (the view's own serve
    * ceiling); the collect is ≤ kbParts·|keys| rows.
    */
  def keyZones(spark: SparkSession, path: String): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    val live = liveAgg(spark, path, mf)
    val byName = live.schema.fields.map(f => f.name -> f.dataType).toMap
    val pieces = mf.keys.flatMap { k =>
      byName(k) match {
        case LongType | IntegerType | ShortType | ByteType =>
          Some(struct(lit(k).as("col_name"), lit("num").as("kind"),
            col(k).cast("long").as("vnum"),
            lit(null).cast("string").as("vstr")))
        case DateType =>
          // days-since-epoch — the same long the consumer's zone test
          // converts a date filter value to ([[ZoneTests]]), so
          // time-keyed rollups (the common dashboard shape) range-
          // and prefix-prune exactly like integral keys
          Some(struct(lit(k).as("col_name"), lit("num").as("kind"),
            unix_date(col(k)).cast("long").as("vnum"),
            lit(null).cast("string").as("vstr")))
        case StringType =>
          Some(struct(lit(k).as("col_name"), lit("str").as("kind"),
            lit(null).cast("long").as("vnum"), col(k).as("vstr")))
        case _ => None
      }
    }
    val base = live.withColumn("kb", kbCol(mf.keys, mf.kbParts))
    if (pieces.isEmpty)
      // no zonable key: a correctly-shaped empty result
      return base.limit(0).select(col("kb"),
        lit("").as("col_name"), lit("").as("kind"),
        lit(0L).as("n_groups"), lit(0L).as("n_nulls"),
        lit(null).cast("long").as("min_num"),
        lit(null).cast("long").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    base.select(col("kb"), explode(array(pieces: _*)).as("e"))
      .select(col("kb"), col("e.*"))
      .groupBy("kb", "col_name", "kind")
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("vnum").isNull && col("vstr").isNull, 1L)
          .otherwise(0L)).as("n_nulls"),
        min("vnum").as("min_num"), max("vnum").as("max_num"),
        str_min(col("vstr")).as("min_str"),
        str_max(col("vstr")).as("max_str"))
  }

  /** Committed manifest versions of the view, ascending — the valid
    * arguments to [[readAsOf]].
    */
  def versions(path: String): Seq[Long] =
    IndexDirs.listManifestVersions(path)

  /** [[declaration]] as of a RETAINED manifest `version` — what a
    * consumer verifying the view's commit CHAIN reads (each commit's
    * fp/lastBatch pair tells a pure-maintenance commit apart from a
    * batch apply apart from an out-of-band mutation; see
    * [[graft.plans.AggViewRewrite.refreshPins]]). None when the
    * version is no longer retained.
    */
  def declarationAt(path: String, version: Long): Option[Decl] =
    IndexDirs.readManifestAt(path, version).map(toManifest).map(mf =>
      Decl(mf.keys, mf.measures, mf.kbParts, mf.mv, mf.n, mf.fp,
        mf.lastBatch))

  /** Manifest-declared key columns, in declaration order — the
    * routing metadata the SQL serve surface
    * ([[graft.sources.AggViewSource]]) uses to recognize a
    * key-complete predicate and route it through [[lookup]]'s
    * kb-pruned path.
    */
  def keys(path: String): Seq[String] =
    readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path")).keys

  /** TIME-TRAVEL serve: the view exactly as it stood at a retained
    * manifest `version` — every commit ([[buildIfAbsent]],
    * [[append]], [[delete]], [[applyBatch]]) is a new version, and
    * the last [[IndexDirs.ManifestRetain]] stay readable, so a
    * dashboard can pin "the rollup as of batch N" or diff two
    * versions without any extra storage (the versions share their
    * base and delta files).
    *
    * The window closes when a later [[compactDeltas]]/[[purge]]
    * garbage-collects files the old version lists — then this throws
    * with the files named, never serving a silently-wrong view (the
    * [[MergeOnRead]] time-travel/vacuum contract).
    */
  def readAsOf(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val mf = IndexDirs.readManifestAt(path, version).map(toManifest)
      .getOrElse(throw new IllegalStateException(
        s"no manifest version $version at $path — retained: " +
          versions(path).mkString("[", ", ", "]")))
    val f = IndexDirs.fs(path)
    val gone = (s"${mf.baseOf("agg")}" +: mf.deltas.map(d => s"deltas/$d"))
      .filterNot(sub => f.exists(new org.apache.hadoop.fs.Path(path, sub)))
    require(gone.isEmpty,
      s"manifest version $version of $path lists " +
        gone.mkString("[", ", ", "]") + ", garbage-collected by a " +
        "later compaction/purge — this version's time-travel window " +
        "has closed")
    liveAgg(spark, path, mf)
      .select(mf.keys.map(col) ++ (col("__cnt").as("cnt") +:
        mf.mNames.map(col)): _*)
  }

  /** VERSION DIFF, O(files-between-versions): per-group net change
    * between two retained manifest versions — `cnt` and every
    * measure as SIGNED deltas, groups with an all-zero net change
    * dropped. "What did batch N do to the rollup" for a monitoring
    * pipeline, priced at the BATCH, not the view: because versions
    * share their base/delta files and the measures are sum-algebra,
    * the common files cancel exactly, so the plan unions only the
    * SYMMETRIC DIFFERENCE of the two versions' file sets — for
    * adjacent versions, precisely the one delta directory that
    * commit staged (a later version's files enter negated when
    * diffing backwards, so `diff(b, a)` is `-diff(a, b)` for free).
    *
    * Both versions must carry the same view declaration (a rebuild
    * between them is a different view — refused), and the window
    * closes like [[readAsOf]]'s when a compaction/purge has GC'd a
    * differing file.
    */
  def diff(spark: SparkSession, path: String, vFrom: Long,
      vTo: Long): DataFrame = {
    def at(v: Long): Manifest =
      IndexDirs.readManifestAt(path, v).map(toManifest)
        .getOrElse(throw new IllegalStateException(
          s"no manifest version $v at $path — retained: " +
            versions(path).mkString("[", ", ", "]")))
    val (a, b) = (at(vFrom), at(vTo))
    require(a.keys == b.keys && a.mNames == b.mNames &&
      a.mExprs == b.mExprs && a.kinds == b.kinds &&
      a.kbParts == b.kbParts,
      s"versions $vFrom and $vTo of $path carry different view " +
        "declarations (a rebuild happened between them) — their " +
        "diff is not a delta of one view")
    require(!b.appendOnlyMeasures,
      "version diff needs SIGNED (sum-algebra) measures — min/max " +
        "measures have no negation, so per-group net change is not " +
        "defined for this view")
    def roots(mf: Manifest): Set[String] =
      (s"${mf.baseOf("agg")}" +: mf.deltas.map(d => s"deltas/$d/agg")).toSet
    val pos = roots(b) -- roots(a) // files vTo adds
    val neg = roots(a) -- roots(b) // files vTo no longer reads
    val f = IndexDirs.fs(path)
    val gone = (pos ++ neg).filterNot(sub =>
      f.exists(new org.apache.hadoop.fs.Path(path, sub)))
    require(gone.isEmpty,
      s"diff $vFrom..$vTo of $path needs " +
        gone.mkString("[", ", ", "]") + ", garbage-collected by a " +
        "later compaction/purge — this diff's time-travel window " +
        "has closed")
    val mNames = b.mNames
    def signed(subs: Set[String], sign: Int): Seq[DataFrame] =
      subs.toSeq.sorted.map { sub =>
        val df = spark.read.parquet(s"$path/$sub")
        df.select(b.keys.map(col) ++
          ((col("__cnt") * sign).as("__cnt") +:
            mNames.map(n => (col(n) * sign).as(n))): _*)
      }
    val parts = signed(pos, 1) ++ signed(neg, -1)
    if (parts.isEmpty) // identical file sets ⇒ empty diff, same shape
      return liveAgg(spark, path, b).limit(0)
        .select(b.keys.map(col) ++ (col("__cnt").as("cnt_delta") +:
          mNames.map(n => col(n).as(s"${n}_delta"))): _*)
    val nonZero = ((col("__cnt") =!= 0) +:
      mNames.map(n => col(n) =!= 0)).reduce(_ || _)
    parts.reduce(_.unionByName(_))
      .groupBy(b.keys.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
        mNames.map(n => sum(col(n)).as(n)): _*)
      .filter(nonZero)
      .select(b.keys.map(col) ++ (col("__cnt").as("cnt_delta") +:
        mNames.map(n => col(n).as(s"${n}_delta"))): _*)
  }

  /** Point/probe serve: groups matching `probeKeys` (a DataFrame of
    * key columns), with every table read PRUNED to the probe's kb
    * partitions (one bounded ≤ kbParts-int collect over the probe)
    * and the probe side broadcast — a dashboard filter reads its
    * buckets of the view, never the whole rollup.
    */
  def lookup(spark: SparkSession, path: String,
      probeKeys: DataFrame): DataFrame = {
    val mf = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    val probe = probeKeys.select(mf.keys.map(col): _*).distinct()
      .localCheckpoint(false)
    val parts = probe.select(kbCol(mf.keys, mf.kbParts).as("kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    liveAgg(spark, path, mf, Some(parts))
      .join(broadcast(probe), mf.keys)
      .select(mf.keys.map(col) ++ (col("__cnt").as("cnt") +:
        mf.mNames.map(col)): _*)
  }

  /** Fold NEW facts into the view: only the delta pays an aggregate;
    * its partial sums stage in `deltas/d<N>` (manifest-gated) and the
    * fingerprint composes in O(delta). Inserts need no disjointness
    * guard — the same fact appearing twice is two facts, which is
    * exactly what a sum view counts.
    *
    * MULTI-WRITER: sum algebra commutes, so N uncoordinated
    * appenders are fully supported — each stages its own claimed
    * delta dir, and a lost manifest race just re-reads and re-commits
    * ([[IndexDirs.commitWithRetry]]); no append is ever lost or
    * double-counted, in any interleaving.
    */
  def append(delta: DataFrame, path: String): Build =
    appendImpl(delta, path, None)

  private def appendImpl(delta: DataFrame, path: String,
      batchMark: Option[Long]): Build = {
    // the declaration (keys/measures/bucketing) is immutable across
    // appends — only a rebuild changes it, and a rebuild uncommits —
    // so staging off this read is race-free; only the counters and
    // delta list are re-derived per commit attempt
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    if (batchMark.exists(_ <= decl.lastBatch))
      return Build(path, decl.fp, decl.n, reused = true)
    val (dfp, dn) = fingerprint(delta, decl)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val staged = IndexDirs.nextDeltaName(path, "d")
    writeDelta(delta, 1, decl, s"$path/deltas/$staged")
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (batchMark.exists(_ <= have.lastBatch)) None
      else Some(have.copy(fp = have.fp ^ dfp, n = have.n + dn,
        deltas = have.deltas :+ staged,
        lastBatch = batchMark.getOrElse(have.lastBatch)))
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None => // another writer landed this batch id first
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  /** Retract facts: the same rows count-negated. `checkBounded`
    * (default on) verifies no group would go negative — the delta's
    * per-group counts against the live view, with every read pruned
    * to the delta's own kb buckets (O(delta groups), never the whole
    * view). Row-level verification is the CDC feed's contract (see
    * the class doc); this guard catches the gross feed bug — deleting
    * facts a group never held.
    */
  def delete(delta: DataFrame, path: String,
      checkBounded: Boolean = true): Build = {
    val spark = delta.sparkSession
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    require(!decl.appendOnlyMeasures,
      s"the view at $path declares min/max measures — APPEND-ONLY " +
        "extrema are not self-maintainable under deletes (a " +
        "retracted extremum cannot be un-folded); rebuild the view " +
        "over the surviving facts instead")
    val (dfp, dn) = fingerprint(delta, decl)
    if (dn == 0) return Build(path, decl.fp, decl.n, reused = true)
    val dg =
      if (!checkBounded) null
      else projected(delta, decl)
        .groupBy(decl.keys.map(col): _*)
        .agg(count(lit(1)).as("__dcnt"))
        .localCheckpoint(false)
    // the bounded guard verifies against the manifest an attempt
    // anchors at — it runs once against the anchor (overlapped with
    // the staging write below) and re-runs inside the commit loop
    // whenever another writer moved the manifest (a CONCURRENT delete
    // of the same rows must flip this from pass to refuse, not slip by)
    def boundedOk(have: Manifest): Unit = if (checkBounded) {
      val parts = dg.select(kbCol(have.keys, have.kbParts).as("kb"))
        .distinct().collect().map(_.getInt(0)).toSeq
      // groups the delta names that either don't exist live or hold
      // fewer rows than the delta retracts — counted via an INNER
      // broadcast join (an outer join can't broadcast its preserved
      // side): violations = delta groups − sufficiently-full matches
      val within = liveAgg(spark, path, have, Some(parts))
        .join(broadcast(dg), have.keys)
        .filter(col("__cnt") >= col("__dcnt"))
        .count()
      val over = dg.count() - within
      require(over == 0,
        s"delete delta retracts more rows than $over group(s) hold " +
          s"in the view at $path — the feed is deleting facts the " +
          "view never absorbed (pass checkBounded = false only when " +
          "upstream proves containment)")
    }
    val staged = IndexDirs.nextDeltaName(path, "d")
    // guard ∥ staging (guide §2.6): both depend only on the anchor
    // manifest; the commit loop re-verifies only when another writer
    // moved it (a concurrent delete of the same rows must still flip
    // the guard from pass to refuse on retry)
    try Par.inParallel(Seq(
      () => boundedOk(decl),
      () => writeDelta(delta, -1, decl, s"$path/deltas/$staged")))
    catch { case e: Throwable =>
      IndexDirs.gcDeltas(path, Seq(staged)); throw e
    }
    val next = IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      if (have.mv != decl.mv) boundedOk(have)
      Some(have.copy(fp = have.fp ^ dfp, n = have.n - dn,
        deltas = have.deltas :+ staged))
    }.get
    Build(path, next.fp, next.n, reused = false)
  }

  /** Exactly-once streaming maintenance and the op-aware mixed CDC
    * form — the [[LmIndex]] recipes (`batchId <= lastBatch` ⇒ skip;
    * one manifest commit makes the whole batch visible or none).
    */
  def appendBatch(batch: DataFrame, batchId: Long, path: String): Build =
    appendImpl(batch, path, Some(batchId)) // skip-check inside the loop

  def foreachBatchSink(path: String): (DataFrame, Long) => Unit =
    (df, id) => { appendBatch(df, id, path); () }

  def applyBatch(batch: DataFrame, batchId: Long, path: String,
      opCol: String = "op", deleteOp: String = "D"): Build = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    if (batchId <= decl.lastBatch)
      return Build(path, decl.fp, decl.n, reused = true)
    val rows = batch.localCheckpoint(false)
    val ins = rows.filter(col(opCol) =!= deleteOp).drop(opCol)
    val del = rows.filter(col(opCol) === deleteOp).drop(opCol)
    val (ifp, inN) = fingerprint(ins, decl)
    val (dfp, delN) = fingerprint(del, decl)
    if (inN == 0 && delN == 0)
      return Build(path, decl.fp, decl.n, reused = true)
    require(delN == 0 || !decl.appendOnlyMeasures,
      s"the view at $path declares min/max measures — a " +
        "delete-bearing batch cannot be applied (append-only " +
        "extrema have no retraction); rebuild over the survivors")
    var stagedDirs = Seq.empty[String]
    if (delN > 0) {
      val staged = IndexDirs.nextDeltaName(path, "d")
      writeDelta(del, -1, decl, s"$path/deltas/$staged")
      stagedDirs :+= staged
    }
    if (inN > 0) {
      val staged = IndexDirs.nextDeltaName(path, "d")
      writeDelta(ins, 1, decl, s"$path/deltas/$staged")
      stagedDirs :+= staged
    }
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, stagedDirs) { have =>
      if (batchId <= have.lastBatch) None // a racing replay landed it
      else Some(have.copy(fp = have.fp ^ ifp ^ dfp,
        n = have.n + inN - delN, deltas = have.deltas ++ stagedDirs,
        lastBatch = batchId))
    } match {
      case Some(next) => Build(path, next.fp, next.n, reused = false)
      case None =>
        val now = readManifest(path).getOrElse(decl)
        Build(path, now.fp, now.n, reused = true)
    }
  }

  def cdcSink(path: String, opCol: String = "op",
      deleteOp: String = "D"): (DataFrame, Long) => Unit =
    (df, id) => { applyBatch(df, id, path, opCol, deleteOp); () }

  /** Fold the delta stream into one directory — per-group sums across
    * the delta dirs only, all-zero rows dropped, NEGATIVE partials
    * kept (they must go on cancelling base rows until a [[purge]]).
    */
  def compactDeltas(spark: SparkSession, path: String): Int = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    if (decl.deltas.length < 2) return 0
    val folded = decl.deltas
    val staged = IndexDirs.nextDeltaName(path, "c")
    // all-zero-row drop applies to the SIGNED (sum) columns only —
    // an append-only min/max group always keeps a positive __cnt
    val nonZero = ((col("__cnt") =!= 0) +:
      decl.measures.filter(_.kind == "sum")
        .map(m => col(m.name) =!= 0)).reduce(_ || _)
    folded.map(d => spark.read.parquet(s"$path/deltas/$d/agg"))
      .reduce(_.unionByName(_))
      .groupBy(decl.keys.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
        decl.measures.map(foldMeasure): _*)
      .filter(nonZero)
      .withColumn("kb", kbCol(decl.keys, decl.kbParts))
      .repartition(col("kb"))
      .write.mode("overwrite").partitionBy("kb")
      .parquet(s"$path/deltas/$staged/agg")
    IndexDirs.stagedCommit(readManifest(path),
      writeManifest(path, _: Manifest), path, Seq(staged)) { have =>
      // deltas that landed after our fold survive (sum algebra is
      // order-free, so fold-first + newer-after is exact); a racing
      // purge/compaction that already folded any of ours makes this
      // fold stale — drop it, theirs covered it
      if (!folded.forall(have.deltas.contains)) None
      else Some(have.copy(
        deltas = staged +: have.deltas.filterNot(folded.toSet)))
    } match {
      case Some(_) => IndexDirs.gcDeltas(path, folded); folded.length
      case None => 0
    }
  }

  /** Survivors-only semantic rewrite into a versioned base dir —
    * after this, retracted facts leave no trace (their groups hold
    * the surviving sums, fully-retracted groups are gone). Returns
    * the live group count.
    */
  def purge(spark: SparkSession, path: String): Long =
    purgeImpl(spark, path, () => ())

  /** [[purge]] with a test seam invoked between the survivors rewrite
    * and the manifest commit — deterministic interleaving specs only.
    */
  private[operators] def purgeImpl(spark: SparkSession, path: String,
      beforeCommit: () => Unit): Long = {
    val decl = readManifest(path).getOrElse(
      throw new IllegalStateException(s"no view at $path"))
    if (decl.deltas.isEmpty)
      return liveAgg(spark, path, decl).count()
    // CLAIMED target version: two racing purges write disjoint
    // agg.v<k> dirs — neither can clobber parquet the other's
    // manifest might commit
    val nextVer = IndexDirs.claimBaseSuffix(path, "agg.v",
      decl.baseVer + 1)
    val live = liveAgg(spark, path, decl)
      .withColumn("kb", kbCol(decl.keys, decl.kbParts))
      .repartition(col("kb"))
    live.write.mode("overwrite").partitionBy("kb")
      .parquet(s"$path/agg.v$nextVer")
    beforeCommit()
    try IndexDirs.commitWithRetry(readManifest(path),
      writeManifest(path, _: Manifest), path) { have =>
      require(have.baseVer == decl.baseVer,
        s"a concurrent purge of $path committed base version " +
          s"${have.baseVer} while this one rewrote from " +
          s"${decl.baseVer} — rerun against the new base")
      // a compaction committed mid-purge folds (some of) our snapshot
      // deltas into a c<N> dir the filterNot below would KEEP — while
      // the new base already absorbed those rows, double-counting
      // every folded row. Refuse instead (the reverse direction of
      // compactDeltas' own stale-fold skip).
      require(decl.deltas.forall(have.deltas.contains),
        s"a concurrent compaction of $path folded deltas this purge's " +
          "rewrite already absorbed — committing would double-count " +
          "them; rerun against the compacted state")
      // appends that landed after our rewrite stay as deltas
      Some(have.copy(deltas = have.deltas.filterNot(decl.deltas.toSet),
        baseVer = nextVer))
    } catch {
      case e: IllegalArgumentException =>
        IndexDirs.rmTree(s"$path/agg.v$nextVer") // orphaned rewrite
        throw e
    }
    IndexDirs.gcDeltas(path, decl.deltas)
    IndexDirs.rmTree(s"$path/${decl.baseOf("agg")}")
    spark.read.parquet(s"$path/agg.v$nextVer").count()
  }
}
