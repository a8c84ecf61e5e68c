package graft.plans

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics, CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Histogram, HistogramBin, LogicalPlan, OneRowRelation, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.{Rule => CatalystRule}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.operators.{ColStats, MergeOnRead}
import graft.sources.MorRelation

/** STATISTICS INJECTION from the persisted [[ColStats]] artifact:
  * an optimizer rule that attaches the profile — row count, per-column
  * null counts, integral min/max, HLL distinct-count estimates, and
  * (new) equi-height HISTOGRAMS derived from the artifact's signed-
  * log₂ value histograms — to the registered base relation as
  * [[CatalogStatistics]], so Spark's own cost model plans from the
  * table's REAL shape instead of its raw file bytes.
  *
  * Why this matters at 100 TB: a file-source relation without catalog
  * stats estimates `sizeInBytes` as the sum of its (compressed) file
  * lengths and knows nothing about row counts or column domains. That
  * misses broadcast opportunities (a 100-byte-wide dimension inside a
  * 2 GB compressed file is broadcastable after pruning, but the file
  * length says no), and with `spark.sql.cbo.enabled` leaves join
  * reordering and filter-selectivity estimation blind — and without
  * histograms, selectivity falls back to UNIFORM assumptions that a
  * skewed column breaks by orders of magnitude. The lakehouse answer
  * is a stats layer maintained with the data — exactly what
  * [[ColStats]] already is (O(batch) CDC maintenance, delete-refusing
  * monotone algebra) — wired here into Catalyst the same way a
  * catalog table's ANALYZE results are: `CatalogStatistics` on the
  * relation, converted by Spark itself via `toPlanStats` (plain
  * `sizeInBytes` always; rowCount + per-column [[CatalogColumnStat]]
  * under `spark.sql.cbo.enabled` / `spark.sql.statsImprovements
  * .enabled`; histograms consulted by FilterEstimation/JoinEstimation
  * whenever present under CBO).
  *
  * The injected numbers follow Spark's own ANALYZE semantics, gated
  * by the profile row's KIND against the relation's type — a
  * misdeclared column (an integral column profiled in `strCols`, a
  * string profiled in `numCols`) gets NO stats rather than wrong
  * ones:
  *  - kind `num` + integral relation type: nullCount, NDV, min/max,
  *    and the equi-height histogram (all exact or honestly estimated
  *    by the profile's own algebra);
  *  - kind `str` + any relation type: nullCount and NDV (the rendered
  *    value is null iff the source is null, and renders distinctly
  *    for distinct values of the common types); string-length
  *    avg/max width for StringType relations;
  *  - kind `num` + non-integral relation type: nothing (the BIGINT
  *    cast makes every per-column number a lie).
  *
  * Freshness: registration pins the base (a parquet directory's
  * file-listing signature, or a [[MergeOnRead]] table's observable
  * state — see [[register]] for the MOR preconditions) and the
  * artifact's manifest version; either moving disables injection
  * until [[refreshPins]] VERIFIES base and artifact consistent again
  * and re-registers, or the caller re-registers manually — stale
  * statistics silently degrade plans, so they expire with the data.
  * The parquet verification is O(DELTA): per-file fingerprint
  * partials (seeded from a co-built zone map's format-4 ledger
  * and/or earlier refreshes) compose for unchanged files, so only
  * NEW files are scanned ([[RelationPins.composeFingerprint]]); the
  * MOR verification is pure metadata (the table's own compaction
  * proof). Injection never changes RESULTS, only plan choice; the
  * rule skips relations that already carry catalog stats (a real
  * ANALYZE wins).
  *
  * One exception serves RESULTS, exactly: a GLOBAL (ungrouped,
  * unfiltered) aggregate of `count(*)` / `count(col)` /
  * `min`/`max`/`sum` of integral profiled columns is rewritten to a
  * literal one-row plan ([[metadataAgg]]) — the answer-from-
  * statistics path engines serve from footers, here from the
  * artifact, with ZERO scan. Every value is exact by the profile's
  * own algebra (exact counts and extrema, the same wrapped 64-bit
  * sum); anything not exactly answerable refuses to the scan —
  * including, under `spark.sql.ansi.enabled`, a `sum` whose overflow
  * the profile cannot RULE OUT (non-ANSI sums wrap identically on
  * both paths, but an ANSI direct sum RAISES on overflow where the
  * artifact would return the wrapped value, so the serve fires only
  * when `n_nonnull × max(|min|, |max|)` provably fits in 64 bits).
  */
object ColStatsInjection extends Logging {

  /** One profiled column's exact scalars (integer-exact by the
    * artifact's contract) — the inputs of the metadata-only
    * aggregate serve. `kind` is the profile row's declaration
    * (`num`/`str`): serves are gated on it MATCHING the relation
    * type, so a misdeclared column refuses instead of answering from
    * a lossy cast.
    */
  final case class Scalar(kind: String, nRows: Long, nNulls: Long,
      minNum: Option[Long], maxNum: Option[Long], sumNum: Option[Long])

  /** What a registration pinned the BASE table at. A parquet
    * directory pins its file-listing signature; `fileFps` is the
    * refresh accelerator, not part of the pin's identity: per-file
    * content-fingerprint partials ([[RelationPins.FileFp]]) seeded
    * scan-free from a co-built zone map's format-4 ledger (`ledger`)
    * and/or accumulated by [[refreshPins]]' own verification scans,
    * so each refresh fingerprints only files it has no stored
    * partial for. A [[graft.operators.MergeOnRead]] table pins its
    * observable STATE — registrable only under the VERIFIED
    * append-only precondition (see [[register]]): a monotone profile
    * of the feed equals the folded table's profile exactly when no
    * fold ever dropped a row, which the table's own compaction
    * verification proves ([[MergeOnRead.appendOnlyRows]]).
    */
  sealed trait BasePin
  final case class FsPin(basePaths: Set[String], listingSig: Long,
      ledger: Option[String] = None,
      fileFps: Map[String, RelationPins.FileFp] = Map.empty)
      extends BasePin
  final case class MorPin(morPath: String, state: MergeOnRead.State)
      extends BasePin

  final case class Entry(statsPath: String, pin: BasePin,
      version: Long, stats: CatalogStatistics,
      scalars: Map[String, Scalar], decl: ColStats.Decl,
      withHistograms: Boolean)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  private def integralType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Pin `statsPath` as the profile of `base` AS CURRENTLY LISTED
    * and precompute the [[CatalogStatistics]] (three metadata-scale
    * reads of the artifact — ≤ |cols| scalar/NDV rows and
    * ≤ 129·|cols| histogram rows; the corpus is never touched). The
    * caller owns the assertion that the artifact profiles this table
    * — typically by registering right after [[ColStats.buildIfAbsent]]
    * (whose fingerprint proved it) or after the CDC pipeline appended
    * the same batch to both; thereafter [[refreshPins]] re-verifies
    * and re-registers as both sides move. `histograms = false` skips
    * the equi-height histogram derivation (the hist table read and
    * the per-column interpolation).
    */
  /** `ledger` (optional): the path of a ZONE MAP built over the same
    * table with the SAME declared columns (the [[graft.operators
    * .Profile.buildBoth]] co-build) — its format-4 files ledger
    * carries per-file content-fingerprint partials computed in the
    * profiling scan itself, which seed this registration's refresh
    * partials SCAN-FREE. Only entries whose (length, mtime) match
    * the live listing are adopted (a conservative filter: anything
    * else is treated as unprofiled and scanned at the next refresh);
    * a ledger whose declaration doesn't match the artifact's columns
    * refuses (its partials hash a different projection).
    */
  def register(spark: SparkSession, base: DataFrame,
      statsPath: String, histograms: Boolean = true,
      ledger: Option[String] = None): Entry = {
    val (rel, kind) = baseOf(GraftBridge.analyzedPlan(base))
      .getOrElse(throw new IllegalArgumentException(
        "register expects a bare single-relation scan (a parquet " +
          "file-source or a live mor-source read of the table the " +
          "artifact profiles); got:\n" +
          GraftBridge.analyzedPlan(base).treeString))
    val decl = ColStats.declaration(statsPath)
    val resolver = SQLConf.get.resolver
    // bounded collects: the scalar profile, NDV estimates, and log2
    // histogram are ≤ |cols| (× ≤129 buckets) rows by construction
    val ndv: Map[String, Double] =
      ColStats.ndv(spark, statsPath).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scalar = ColStats.stats(spark, statsPath).collect()
    val histByCol: Map[String, Seq[(Int, Long)]] =
      if (!histograms) Map.empty
      else ColStats.hist(spark, statsPath).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (c, rows) =>
          c -> rows.map(t => (t._2, t._3)).sortBy(_._1).toSeq
        }
    // shared per-row resolution + field extraction: the CBO column
    // stats and the metadata-agg scalars both read the profile
    // through this one helper, so the two views of one profile
    // cannot drift apart under a future edit to either pass
    def rowFor(r: org.apache.spark.sql.Row)
        : Option[(Attribute, String => Option[Long])] =
      rel.output.find(a => resolver(a.name, r.getString(0)))
        .map { attr =>
          attr -> ((c: String) =>
            if (r.isNullAt(r.fieldIndex(c))) None
            else Some(r.getAs[Long](c)))
        }
    val colStats: Map[String, CatalogColumnStat] =
      scalar.flatMap { r =>
        rowFor(r).flatMap { case (attr, longAt) =>
          val name = r.getString(0)
          val kind = r.getString(r.fieldIndex("kind"))
          val numOk = kind == "num" && integralType(attr.dataType)
          val strOk = kind == "str"
          if (!numOk && !strOk) None // misdeclared: no stats at all
          else {
            def num(col: String): Option[String] =
              if (numOk) longAt(col).map(_.toString) else None
            val nRows = r.getAs[Long]("n_rows")
            val nNulls = r.getAs[Long]("n_nulls")
            // avg string length from the artifact's exact length sums
            // — THE honest width input; fixed-width types use their
            // type width
            val avgLen: Long = attr.dataType match {
              case StringType if strOk =>
                longAt("sum_len")
                  .filter(_ => nRows > nNulls)
                  .map(s => math.max(1L, math.round(
                    s.toDouble / (nRows - nNulls))))
                  .getOrElse(attr.dataType.defaultSize.toLong)
              case dt => dt.defaultSize.toLong
            }
            Some(attr.name -> CatalogColumnStat(
              distinctCount =
                ndv.get(name).map(d => BigInt(math.max(1L, d.round))),
              min = num("min_num"), max = num("max_num"),
              nullCount = Some(BigInt(nNulls)),
              avgLen = Some(avgLen),
              maxLen = Some(attr.dataType match {
                case StringType if strOk =>
                  longAt("max_len").getOrElse(avgLen)
                case dt => dt.defaultSize.toLong
              }),
              histogram =
                if (numOk)
                  histByCol.get(name)
                    .flatMap(equiHeight(_, nRows - nNulls))
                else None))
          }
        }
      }.toMap
    val rowCount: BigInt =
      scalar.map(r => r.getAs[Long]("n_rows")).maxOption
        .map(BigInt(_)).getOrElse(0)
    // EstimationUtils.getSizePerRow's shape: 8 + Σ column widths,
    // strings as avgLen + (8 + 4) object overhead
    val rowWidth = 8L + rel.output.map { a =>
      (a.dataType, colStats.get(a.name).flatMap(_.avgLen)) match {
        case (StringType, Some(l)) => l + 8L + 4L
        case (dt, _) => dt.defaultSize.toLong
      }
    }.sum
    val catalog = CatalogStatistics(
      sizeInBytes = (rowCount * rowWidth) max 1,
      rowCount = Some(rowCount),
      colStats = colStats)
    val scalars: Map[String, Scalar] = scalar.flatMap { r =>
      rowFor(r).map { case (attr, longAt) =>
        attr.name -> Scalar(r.getString(r.fieldIndex("kind")),
          r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          longAt("min_num"), longAt("max_num"), longAt("sum_num"))
      }
    }.toMap
    val pin: BasePin = kind match {
      case scala.Left(fsRel) =>
        // a hive-PARTITIONED base is supported under one root:
        // refresh delta scans read with option("basePath", root) so
        // partition columns resolve for the appended files
        // (including appends into a NEW partition directory). With
        // several roots there is no one basePath — refuse here
        // rather than fail every later refresh.
        if (fsRel.partitionSchema.nonEmpty)
          require(RelationPins.rootPaths(fsRel).size == 1,
            "a partitioned base registers under a SINGLE root path " +
              "(refresh scans resolve partition columns via " +
              "basePath); read the table through its one root " +
              "directory")
        // only ledger entries whose (length, mtime) still match the
        // live listing are adopted — anything else is treated as
        // unprofiled and scanned at the next refresh
        def adopt(stored: Map[String, (Long, Long, Long, Long)])
            : Map[String, RelationPins.FileFp] = {
          val live = RelationPins.listedFiles(fsRel)
            .map(f => f.key -> f).toMap
          stored.collect {
            case (key, (len, mtime, cfp, cn))
                if live.get(key).exists(f =>
                  f.len == len && f.mtime == mtime) =>
              key -> RelationPins.FileFp(len, mtime, cfp, cn)
          }
        }
        val fileFps: Map[String, RelationPins.FileFp] = ledger match {
          case None =>
            // no explicit zone-map ledger: seed from the artifact's
            // OWN build-time ledger when one exists (same projection
            // by construction — the build wrote it). Best-effort: an
            // unreadable ledger degrades to the empty seed.
            try ColStats.fingerprintLedger(spark, statsPath)
              .map(adopt).getOrElse(Map.empty)
            catch { case NonFatal(_) => Map.empty }
          case Some(zmPath) =>
            val zm = graft.operators.ZoneMap.declaration(zmPath)
            require(zm.numCols == decl.numCols &&
                zm.strCols == decl.strCols,
              s"zone-map ledger at $zmPath declares columns " +
                s"(${zm.numCols.mkString(",")} | ${zm.strCols.mkString(",")})" +
                " but the stats artifact profiles " +
                s"(${decl.numCols.mkString(",")} | ${decl.strCols.mkString(",")})" +
                " — its fingerprint partials hash a different projection")
            val stored = graft.operators.ZoneMap
              .fingerprintLedger(spark, zmPath)
              .getOrElse(throw new IllegalArgumentException(
                s"zone map at $zmPath predates format 4 — no stored " +
                  "fingerprint partials; rebuild it or register without " +
                  "a ledger"))
            adopt(stored)
        }
        FsPin(RelationPins.rootPaths(fsRel),
          RelationPins.signature(fsRel), ledger, fileFps)
      case scala.Right(m) =>
        require(ledger.isEmpty,
          "ledger seeding applies to parquet bases only (a mor pin " +
            "verifies by manifest state, not file fingerprints)")
        morVerified(m.path, decl) match {
          case scala.Left(reason) => throw new IllegalArgumentException(
            s"mor table at ${m.path} not registrable: $reason")
          case scala.Right(st) => MorPin(m.path, st)
        }
    }
    val e = Entry(statsPath, pin, decl.version, catalog, scalars,
      decl, histograms)
    registry.put(statsPath, e)
    e
  }

  /** The base-relation kinds a registration can pin: a bare parquet
    * file-source scan, or a LIVE `mor`-source read (a version-pinned
    * time-travel read is a different table than the one the profile
    * tracks).
    */
  private def baseOf(p: LogicalPlan)
      : Option[(LogicalRelation,
        Either[org.apache.spark.sql.execution.datasources
          .HadoopFsRelation, MorRelation])] = p match {
    case s: SubqueryAlias => baseOf(s.child)
    case l: LogicalRelation => l.relation match {
      case h: org.apache.spark.sql.execution.datasources
          .HadoopFsRelation => Some((l, scala.Left(h)))
      case m: MorRelation if m.version.isEmpty =>
        Some((l, scala.Right(m)))
      case _ => None
    }
    case _ => None
  }

  /** The VERIFIED preconditions under which a monotone (append-only)
    * profile is exactly the folded mor table's profile — all
    * metadata-scale reads, never a scan:
    *
    *  - every fold so far provably dropped no row
    *    ([[MergeOnRead.appendOnlyRows]] — create-time key-uniqueness
    *    plus per-compaction row-count verification); a feed that
    *    deletes or re-keys flips that proof off PERMANENTLY and this
    *    refuses with rebuild guidance;
    *  - no pending unfolded batches (compaction IS the verification
    *    point — what has not been folded has not been verified);
    *  - the profile's absorbed row count equals the folded table's
    *    (the cheap content sanity the count algebra affords — an
    *    out-of-band append to either side lands here).
    *
    * The commit-chain question [[AggViewRewrite]] answers by walking
    * manifests is answered here by the count equation: ColStats is
    * append-only (deletes refuse at the artifact), so any out-of-band
    * mutation moves `n` away from the verified fold count.
    */
  private def morVerified(morPath: String,
      decl: ColStats.Decl): Either[String, MergeOnRead.State] = {
    val st = try MergeOnRead.state(morPath)
      catch { case NonFatal(ex) =>
        return scala.Left(s"mor table unreadable: $ex") }
    if (st.pending.nonEmpty)
      return scala.Left("mor table has unfolded batches — compact " +
        "first (compaction is the fold-verification point; pending " +
        "batches are unverified by construction)")
    MergeOnRead.appendOnlyRows(morPath) match {
      case None =>
        scala.Left("table is not verified append-only — create it " +
          "with trackAppendOnly = true and keep it compacted; a " +
          "feed that deletes or re-keys cannot maintain monotone " +
          "statistics (rebuild the profile over the folded table " +
          "instead)")
      case Some(rows) if rows != decl.n =>
        scala.Left(s"row counts diverge (folded table $rows vs " +
          s"profile ${decl.n}) — waiting for the other side")
      case Some(_) => scala.Right(st)
    }
  }

  /** An equi-height [[Histogram]] from the artifact's signed-log₂
    * bucket counts: boundaries at equal cumulative heights, values
    * interpolated UNIFORMLY inside each log₂ bucket (the true value
    * provably lies inside its bucket, so each boundary is off by at
    * most the bucket width — the log₂-histogram contract carried into
    * the cost model). Bin NDV is capped at both the bin's integer
    * width and its height — conservative for equality selectivity.
    * Driver-side over ≤ 129 buckets × `spark.sql.statistics
    * .histogram.numBins` bins; plan-only (never results).
    */
  private[plans] def equiHeight(buckets: Seq[(Int, Long)],
      nNonNull: Long): Option[Histogram] = {
    if (nNonNull <= 0 || buckets.isEmpty) return None
    // continuous value range of a signed log2 bucket: integers in
    // bucket 0 = {0}; +k = [2^(k-1), 2^k - 1]; -k mirrored negative.
    // Modeled as [lo, lo + count) with count = 2^(k-1) (1 for b=0).
    def width(b: Int): Double =
      if (b == 0) 1.0 else math.pow(2.0, math.abs(b) - 1)
    def lo(b: Int): Double =
      if (b == 0) 0.0
      else if (b > 0) math.pow(2.0, b - 1)
      else -(math.pow(2.0, -b) - 1)
    val total = buckets.map(_._2).sum
    if (total <= 0) return None
    val nb = math.max(1, math.min(SQLConf.get.histogramNumBins,
      total match { case t if t < Int.MaxValue => t.toInt; case _ => Int.MaxValue }))
    val height = total.toDouble / nb
    // cumulative walk: value at cumulative row position p
    val cum = buckets.scanLeft(0L)(_ + _._2).tail
    def valueAt(p: Double): Double = {
      val clamped = math.min(math.max(p, 0.0), total.toDouble)
      var i = 0
      while (i < buckets.length && cum(i) < clamped) i += 1
      if (i >= buckets.length) {
        val (b, _) = buckets.last
        lo(b) + width(b)
      } else {
        val (b, c) = buckets(i)
        val before = if (i == 0) 0L else cum(i - 1)
        val f = if (c == 0) 0.0 else (clamped - before) / c.toDouble
        lo(b) + f * width(b)
      }
    }
    val bounds = (0 to nb).map(i => valueAt(i * height))
    val bins = (0 until nb).map { i =>
      val (l, h) = (bounds(i), bounds(i + 1))
      val intWidth = math.max(1L,
        (math.floor(h) - math.ceil(l)).toLong + 1L)
      HistogramBin(l, h,
        math.max(1L, math.min(intWidth, math.round(height))))
    }
    Some(Histogram(height, bins.toArray))
  }

  def unregister(statsPath: String): Unit = {
    registry.remove(statsPath); ()
  }

  def clear(): Unit = registry.clear()

  /** Current registrations with their LIVE version freshness — the
    * ops answer to "why isn't my table planning with stats": one row
    * per registered artifact (path, base roots, injected rowCount /
    * sizeInBytes, pinned vs live manifest version). File-listing
    * base freshness is per-query (it needs the query's own relation)
    * and reports null; a MOR pin's state is readable here and
    * reports directly.
    */
  def status(spark: SparkSession): DataFrame = {
    val s = spark
    import s.implicits._
    registry.values.asScala.toSeq.sortBy(_.statsPath).map { e =>
      val liveVersion =
        try Some(ColStats.version(e.statsPath))
        catch { case NonFatal(_) => None }
      val (baseDesc, baseFresh) = e.pin match {
        case FsPin(paths, _, _, _) =>
          (paths.toSeq.sorted.mkString(","), None: Option[Boolean])
        case MorPin(p, st) =>
          (p, Some(try MergeOnRead.state(p) == st
            catch { case NonFatal(_) => false }))
      }
      (e.statsPath, baseDesc,
        e.stats.rowCount.map(_.toLong).getOrElse(-1L),
        e.stats.sizeInBytes.toLong,
        e.version, liveVersion.getOrElse(-1L),
        liveVersion.contains(e.version), baseFresh)
    }.toDF("stats_path", "base_roots", "row_count", "size_bytes",
      "pinned_version", "live_version", "version_fresh", "base_fresh")
  }

  /** Re-verify and re-register every pin whose base or artifact has
    * MOVED — the maintenance hook that keeps injection live on a
    * changing table ([[graft.plans.AggViewRewrite.refreshPins]]'s
    * twin). A pin refreshes only when VERIFIED: a parquet base's
    * live content fingerprint over the declared columns must equal
    * the artifact's composed fingerprint — computed O(DELTA) by
    * composing stored per-file partials and scanning only files
    * with none ([[RelationPins.composeFingerprint]]); a MOR base
    * re-verifies the append-only proof, pending-empty, watermark,
    * and count equations (pure metadata). A base-only append or an
    * artifact-only commit fails the check and the registration stays
    * stale (refusing, correctly) until the two converge. Returns one
    * row per registration: (stats_path, refreshed, reason).
    */
  /** `compactMor` (opt-in): when a MOR pin's table holds PENDING
    * (unfolded, hence unverified) batches, run the table's own
    * compaction first — compaction IS the fold-verification point
    * ([[MergeOnRead.compact]]'s per-bucket row-count proof) — then
    * verify and re-pin. What lets [[refreshingSink]] restore the
    * metadata-only serve immediately after each streamed batch
    * instead of waiting for the compaction cadence. A delete-bearing
    * batch still flips the append-only proof off PERMANENTLY at that
    * compaction and the refresh refuses with rebuild guidance — the
    * on-demand path changes WHEN verification runs, never what it
    * proves.
    */
  def refreshPins(spark: SparkSession,
      compactMor: Boolean = false): DataFrame = {
    val s = spark
    import s.implicits._
    val rows = registry.values.asScala.toSeq.sortBy(_.statsPath).map {
      // per-registration isolation (the ZoneMapScan.refreshPins
      // shape): a FS hiccup or malformed artifact reports as that
      // row's reason instead of throwing out of the whole pass and,
      // via refreshingSink, failing the streaming batch for every
      // other registration
      e =>
        val r = try refreshOne(spark, e, compactMor)
          catch { case NonFatal(ex) => Some(s"refresh failed: $ex") }
        (e.statsPath, r.isEmpty, r.getOrElse("re-registered"))
    }
    rows.toDF("stats_path", "refreshed", "reason")
  }

  /** None = refreshed; Some(reason) = left as-is. */
  private def refreshOne(spark: SparkSession,
      e: Entry, compactMor: Boolean = false): Option[String] = {
    val live = try ColStats.declaration(e.statsPath)
      catch { case NonFatal(ex) =>
        return Some(s"artifact unreadable: $ex") }
    if (live.numCols != e.decl.numCols ||
      live.strCols != e.decl.strCols)
      return Some("artifact declaration changed (rebuild) — " +
        "re-register")
    e.pin match {
      case p: FsPin => refreshFs(spark, e, p, live)
      case MorPin(morPath, st) =>
        val state0 = try MergeOnRead.state(morPath)
          catch { case NonFatal(ex) =>
            return Some(s"mor table unreadable: $ex") }
        // on-demand verification: fold the pending batches NOW (the
        // fold is the proof — see refreshPins' compactMor doc); a
        // compaction failure lands in the caller's NonFatal isolation
        val liveState =
          if (compactMor && state0.pending.nonEmpty) {
            MergeOnRead.compact(spark, morPath)
            MergeOnRead.state(morPath)
          } else state0
        if (liveState == st && live.version == e.version)
          return Some("already fresh")
        // the same verified preconditions as registration, plus the
        // feed-coordination watermark: the artifact must have
        // absorbed exactly the stream batches the table folded
        val (maxId, allMarked) = MergeOnRead.streamState(morPath)
        if (!allMarked)
          return Some("mor table has committed batches without " +
            "stream markers (out-of-band appends) — re-register")
        if (maxId != live.lastBatch)
          return Some(s"watermarks diverge (mor stream id $maxId " +
            s"vs stats batch ${live.lastBatch}) — waiting for the " +
            "other side")
        morVerified(morPath, live) match {
          case scala.Left(reason) => Some(reason)
          case scala.Right(_) =>
            register(spark,
              spark.read.format("mor").load(morPath), e.statsPath,
              e.withHistograms)
            None
        }
    }
  }

  private def refreshFs(spark: SparkSession, e: Entry, pin: FsPin,
      live: ColStats.Decl): Option[String] = {
    val baseDf = spark.read.parquet(pin.basePaths.toSeq.sorted: _*)
    val fsRel = RelationPins.bare(GraftBridge.analyzedPlan(baseDf))
      .map(_._2).getOrElse(
        return Some("base no longer reads as a bare parquet scan"))
    // partitioned base: the delta scan reads leaf files with
    // basePath so partition columns resolve (the register-time
    // single-root guard makes the basePath unambiguous)
    val readDelta: Seq[String] => DataFrame =
      if (fsRel.partitionSchema.isEmpty)
        uris => spark.read.parquet(uris: _*)
      else if (pin.basePaths.size == 1)
        uris => spark.read.option("basePath", pin.basePaths.head)
          .parquet(uris: _*)
      else return Some("partitioned base has several root paths — " +
        "no unambiguous basePath for delta scans; re-register under " +
        "the table's one root directory")
    if (RelationPins.signature(fsRel) == pin.listingSig &&
      live.version == e.version)
      return Some("already fresh")
    // O(delta) verification: compose stored per-file partials (from
    // the co-built zone-map ledger and/or earlier refreshes) and
    // fingerprint only files with no stored partial
    RelationPins.composeFingerprint(
      RelationPins.listedFiles(fsRel), pin.fileFps,
      uris => ColStats.fingerprintByFile(
        readDelta(uris), live.numCols, live.strCols)
    ) match {
      case scala.Left(reason) => Some(reason)
      case scala.Right((fp, n, partials)) =>
        if (fp == live.fp && n == live.n) {
          // re-register WITHOUT the ledger: the composed partials
          // supersede the seed (they also cover files the ledger has
          // not profiled yet), so re-reading the zone map here would
          // only add a failure mode — a since-deleted/rebuilt ledger
          // must not fail a refresh that composeFingerprint already
          // verified. pin.ledger is carried forward in the entry.
          val ent = register(spark, baseDf, e.statsPath,
            e.withHistograms)
          ent.pin match {
            case fs: FsPin => registry.put(e.statsPath,
              ent.copy(pin =
                fs.copy(ledger = pin.ledger, fileFps = partials)))
            case _ => ()
          }
          None
        } else {
          // cache the computed partials even on refusal: they are
          // facts about the BASE's files — once the artifact
          // converges, the next refresh verifies O(delta).
          // Compare-and-set: a concurrent manual register() between
          // the snapshot iteration and this write must WIN over the
          // stale partials-cache entry, not be clobbered by it.
          registry.replace(e.statsPath, e,
            e.copy(pin = pin.copy(fileFps = partials)))
          Some("base content and artifact profile diverge " +
            "(fingerprint mismatch) — waiting for the other side")
        }
    }
  }

  /** Wrap a CDC sink so every applied batch is followed by a pin
    * refresh ([[graft.plans.AggViewRewrite.refreshingSink]]'s twin
    * for the stats bridge): `IndexPipeline.sink(ColStats.cdcSink(p),
    * …, ColStatsInjection.refreshingSink(spark))`. With
    * `compactMor = true` the refresh folds pending MOR batches first
    * (see [[refreshPins]]), so the metadata-only serve is restored
    * the moment each batch lands — not at the next compaction.
    */
  def refreshingSink(spark: SparkSession,
      compactMor: Boolean = false): (DataFrame, Long) => Unit =
    (_, _) => { refreshPins(spark, compactMor).collect(); () }

  /** Add the rule to a live session (idempotent). NOTE: the live
    * path registers via `experimental.extraOptimizations`, which runs
    * in the final "User Provided Optimizers" batch — AFTER the CBO
    * join-reorder and filter-estimation batches — so install()-path
    * sessions get the sizeInBytes/broadcast benefit and the
    * metadata-only aggregate serve, but NOT cbo-driven join
    * reordering. For the full CBO benefit (join reorder, histogram
    * selectivity), inject at session build time with
    * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
    * — [[GraftExtensions]] injects this rule into the operator-
    * optimization batch, which runs before CBO.
    */
  def install(spark: SparkSession): Unit =
    GraftBridge.addOptimization(spark, Rule(spark))

  /** One-shot SCOPED injection: register the artifact, force `query`
    * through the optimizer (so the stats — and any plan choices they
    * drive — are baked into the returned plan), then unregister.
    */
  def injected(spark: SparkSession, base: DataFrame, statsPath: String)
      (query: => DataFrame): DataFrame = {
    install(spark)
    register(spark, base, statsPath)
    try GraftBridge.ofRows(spark, GraftBridge.optimizedPlan(query))
    finally unregister(statsPath)
  }

  /** Per-optimizer-pass memo of the two freshness probes: "does the
    * artifact still sit at its registered manifest version" (the one
    * FILESYSTEM read in the check) keyed by path, and the relation's
    * LISTING-SIGNATURE fold keyed by FILE-INDEX IDENTITY (one
    * relation instance = one in-memory listing = one fold — the
    * [[AggViewRewrite.Memo]] shape). Memoized per [[Rule.apply]]
    * invocation (never across queries — the pins guard
    * result-exactness, so they must be re-checked within every
    * plan's own optimization), bounding planning cost at one probe
    * each per artifact/relation per pass even when a query
    * references the relation many times.
    */
  private final class Memo {
    private val versions =
      scala.collection.mutable.Map.empty[String, Boolean]
    def versionFresh(e: Entry): Boolean =
      versions.getOrElseUpdate(e.statsPath,
        try ColStats.version(e.statsPath) == e.version
        catch { case NonFatal(_) => false })
    private val morStates =
      scala.collection.mutable.Map.empty[String, Option[MergeOnRead.State]]
    def morStateOf(path: String): Option[MergeOnRead.State] =
      morStates.getOrElseUpdate(path,
        try Some(MergeOnRead.state(path))
        catch { case NonFatal(_) => None })
    private val sigs =
      new java.util.IdentityHashMap[AnyRef, java.lang.Long]
    def signatureOf(
        h: org.apache.spark.sql.execution.datasources.HadoopFsRelation)
        : Long = {
      val got = sigs.get(h.location)
      if (got != null) got.longValue
      else {
        val s = RelationPins.signature(h)
        sigs.put(h.location, java.lang.Long.valueOf(s))
        s
      }
    }
  }

  final case class Rule(spark: SparkSession)
      extends CatalystRule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else {
        val memo = new Memo
        plan.transformUp {
          // a GLOBAL min/max/count/sum aggregate over a registered
          // relation is answered from the profile outright — no scan
          case agg: Aggregate =>
            try metadataAgg(agg, memo).getOrElse(agg)
            catch {
              case NonFatal(e) =>
                logWarning(s"colstats metadata-agg skipped: $e")
                agg
            }
          // a relation that already carries catalog stats (a real
          // ANALYZE, or this rule in an earlier pass) is left alone
          case l: LogicalRelation if l.catalogTable.isEmpty =>
            try inject(l, memo).getOrElse(l)
            catch {
              case NonFatal(e) =>
                logWarning(s"colstats injection skipped: $e")
                l
            }
        }
      }
  }

  /** The fresh registered entry for this relation, if any: roots
    * match, base listing unchanged, artifact version unchanged.
    */
  private def freshEntry(l: LogicalRelation,
      memo: Memo): Option[Entry] = l.relation match {
    case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      val roots = RelationPins.rootPaths(h)
      // sorted: with several registered artifacts for one table, the
      // chosen one never depends on map iteration order; collected
      // WITH the typed pin (pattern match, no cast) so a future edit
      // to the filter can't introduce a ClassCastException here
      val cands = registry.values.asScala.collect {
        case e @ Entry(_, fs: FsPin, _, _, _, _, _)
            if fs.basePaths == roots => (e, fs)
      }.toSeq.sortBy(_._1.statsPath)
      if (cands.isEmpty) None
      else {
        val sig = memo.signatureOf(h)
        cands.collectFirst { case (e, fs)
            if fs.listingSig == sig && memo.versionFresh(e) => e }
      }
    case m: MorRelation if m.version.isEmpty =>
      registry.values.asScala.toSeq.sortBy(_.statsPath).find { e =>
        e.pin match {
          case MorPin(p, st) => p == m.path &&
            memo.morStateOf(p).contains(st) && memo.versionFresh(e)
          case _ => false
        }
      }
    case _ => None
  }

  private def inject(l: LogicalRelation,
      memo: Memo): Option[LogicalRelation] =
    freshEntry(l, memo).map { e =>
      l.copy(catalogTable = Some(CatalogTable(
        identifier = TableIdentifier("graft_colstats_injected"),
        tableType = CatalogTableType.EXTERNAL,
        storage = CatalogStorageFormat.empty,
        schema = l.relation.schema,
        provider = Some("parquet"),
        stats = Some(e.stats))))
    }

  // ---------------------------------------------------------------
  // metadata-only aggregate serve

  /** Strip pure column-pruning projections; ANY filter disqualifies
    * (a filtered aggregate is not the profiled table's).
    */
  private def bareChild(p: LogicalPlan): Option[LogicalRelation] =
    p match {
      case l: LogicalRelation => Some(l)
      case Project(pl, c)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareChild(c)
      case _ => None
    }

  /** Rewrite a GLOBAL (ungrouped, unfiltered) aggregate whose every
    * output is `count(*)`, `count(col)`, `min/max(col)` (integral),
    * or `sum(col)` (integral) over PROFILED columns into a literal
    * one-row plan — the answer-from-statistics serve every engine's
    * metadata-only path provides, here from the artifact. min/max
    * are exact because the profile's extrema are exact (monotone
    * merges of exact per-batch extrema); sum is the same wrapped
    * 64-bit sum the query's own `sum(BIGINT-cast)` computes; count
    * algebra is exact. Every serve additionally requires the profile
    * row's KIND to match the relation type (`num` needs an integral
    * relation column — a lossy cast profiles nulls and truncations;
    * `str` renders null iff the source is null, so count(col) stays
    * exact for any type). Refuses on DISTINCT/FILTER, non-integral
    * min/max/sum, any WHERE, any unprofiled or misdeclared column,
    * and — under ANSI — a sum whose 64-bit overflow the profile's
    * own bounds cannot rule out (see the object doc).
    */
  private def metadataAgg(agg: Aggregate,
      memo: Memo): Option[Aggregate] = {
    if (agg.groupingExpressions.nonEmpty) return None
    val rel = bareChild(agg.child).getOrElse(return None)
    val e = freshEntry(rel, memo).getOrElse(return None)
    if (e.scalars.isEmpty) return None
    val nRows = e.scalars.values.head.nRows

    def scalarOf(x: Expression): Option[(Scalar, Attribute)] = x match {
      case a: AttributeReference =>
        e.scalars.get(a.name).map(_ -> a)
      case _ => None
    }
    def numOk(s: Scalar, a: Attribute): Boolean =
      s.kind == "num" && integralType(a.dataType)
    def numLit(v: Option[Long], dt: DataType): Expression = v match {
      case None => Literal(null, dt)
      case Some(x) => dt match {
        case ByteType => Literal(x.toByte)
        case ShortType => Literal(x.toShort)
        case IntegerType => Literal(x.toInt)
        case _ => Literal(x)
      }
    }
    // |sum| ≤ n_nonnull · max(|min|, |max|): when that bound fits in
    // 64 bits, the direct ANSI sum cannot have raised and the wrapped
    // artifact sum is bit-equal to it
    def sumProvablySafe(s: Scalar): Boolean =
      (s.minNum, s.maxNum) match {
        case (Some(lo), Some(hi)) =>
          val bound = BigInt(s.nRows - s.nNulls) *
            BigInt(lo).abs.max(BigInt(hi).abs)
          bound <= BigInt(Long.MaxValue)
        case _ => true // no non-null values: the sum serves null
      }

    def answer(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(children)
            if children.nonEmpty &&
              children.forall(c => c.foldable && c.eval() != null) =>
          Some(Literal(nRows))
        case Count(Seq(c)) if !c.foldable =>
          // exact iff "profiled null" == "source null": any type for
          // a str profile (rendering preserves nulls), integral only
          // for a num profile (a failed long-cast counts as null)
          scalarOf(c).collect {
            case (s, a) if s.kind == "str" || numOk(s, a) =>
              Literal(s.nRows - s.nNulls)
          }
        case m: aggregate.Min =>
          scalarOf(m.child).collect {
            case (s, a) if numOk(s, a) => numLit(s.minNum, a.dataType)
          }
        case m: aggregate.Max =>
          scalarOf(m.child).collect {
            case (s, a) if numOk(s, a) => numLit(s.maxNum, a.dataType)
          }
        case sm: Sum =>
          scalarOf(sm.child).collect {
            case (s, a) if numOk(s, a) && ae.dataType == LongType &&
                (!SQLConf.get.ansiEnabled || sumProvablySafe(s)) =>
              if (s.nRows == s.nNulls) Literal(null, LongType)
              else Literal(s.sumNum.getOrElse(0L))
          }
        case _ => None
      }
    }

    val newExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al: Alias => al.child match {
        case ae: AggregateExpression => answer(ae) match {
          case Some(lit) => Alias(lit, al.name)(exprId = al.exprId)
          case None => return None
        }
        case _ => return None
      }
      case _ => return None
    }
    // keep the node an Aggregate over one synthetic row, so the
    // plan's shape (and output nullability) matches what any parent
    // expects from a global aggregate; Catalyst folds it to a
    // one-row LocalRelation
    val out = Aggregate(Nil, newExprs, OneRowRelation())
    val same = out.output.size == agg.output.size &&
      out.output.zip(agg.output).forall { case (n, o) =>
        n.exprId == o.exprId && n.name == o.name && n.dataType == o.dataType
      }
    if (same) Some(out) else None
  }
}
