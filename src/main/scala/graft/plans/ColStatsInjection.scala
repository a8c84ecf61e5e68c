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
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, OneRowRelation, Project}
import org.apache.spark.sql.catalyst.rules.{Rule => CatalystRule}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

import graft.operators.ColStats

/** STATISTICS INJECTION from the persisted [[ColStats]] artifact:
  * an optimizer rule that attaches the profile — row count, per-column
  * null counts, integral min/max, HLL distinct-count estimates — to
  * the registered base relation as [[CatalogStatistics]], so Spark's
  * own cost model plans from the table's REAL shape instead of its
  * raw file bytes.
  *
  * Why this matters at 100 TB: a file-source relation without catalog
  * stats estimates `sizeInBytes` as the sum of its (compressed) file
  * lengths and knows nothing about row counts or column domains. That
  * misses broadcast opportunities (a 100-byte-wide dimension inside a
  * 2 GB compressed file is broadcastable after pruning, but the file
  * length says no), and with `spark.sql.cbo.enabled` leaves join
  * reordering and filter-selectivity estimation blind. The lakehouse
  * answer is a stats layer maintained with the data — exactly what
  * [[ColStats]] already is (O(batch) CDC maintenance, delete-refusing
  * monotone algebra) — wired here into Catalyst the same way a
  * catalog table's ANALYZE results are: `CatalogStatistics` on the
  * relation, converted by Spark itself via `toPlanStats` (plain
  * `sizeInBytes` always; rowCount + per-column [[CatalogColumnStat]]
  * under `spark.sql.cbo.enabled` / `spark.sql.statsImprovements
  * .enabled`).
  *
  * The injected numbers follow Spark's own ANALYZE semantics:
  * `sizeInBytes` = rowCount × schema row width (the
  * `EstimationUtils.getOutputSize` formula), per-column
  * distinctCount/nullCount for every profiled column, and min/max
  * only for INTEGRAL relation columns (the artifact profiles numeric
  * columns cast to BIGINT — exact for integral sources, a lie for
  * fractional ones, so fractional min/max is withheld).
  *
  * Freshness: registration pins the base file listing
  * ([[RelationPins.signature]]) and the artifact's manifest version;
  * either moving disables injection until re-registration — stale
  * statistics silently degrade plans, so they expire with the data.
  * Injection never changes RESULTS, only plan choice; the rule skips
  * relations that already carry catalog stats (a real ANALYZE wins).
  *
  * One exception serves RESULTS, exactly: a GLOBAL (ungrouped,
  * unfiltered) aggregate of `count(*)` / `count(col)` /
  * `min`/`max`/`sum` of integral profiled columns is rewritten to a
  * literal one-row plan ([[metadataAgg]]) — the answer-from-
  * statistics path engines serve from footers, here from the
  * artifact, with ZERO scan. Every value is exact by the profile's
  * own algebra (exact counts and extrema, the same wrapped 64-bit
  * sum); anything not exactly answerable refuses to the scan.
  */
object ColStatsInjection extends Logging {

  /** One profiled column's exact scalars (integer-exact by the
    * artifact's contract) — the inputs of the metadata-only
    * aggregate serve.
    */
  final case class Scalar(nRows: Long, nNulls: Long,
      minNum: Option[Long], maxNum: Option[Long], sumNum: Option[Long])

  final case class Entry(statsPath: String, basePaths: Set[String],
      listingSig: Long, version: Long, stats: CatalogStatistics,
      scalars: Map[String, Scalar])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Pin `statsPath` as the profile of `base` AS CURRENTLY LISTED
    * and precompute the [[CatalogStatistics]] (two metadata-scale
    * reads of the artifact — ≤ |cols| rows each; the corpus is never
    * touched). The caller owns the assertion that the artifact
    * profiles this table — typically by registering right after
    * [[ColStats.buildIfAbsent]] (whose fingerprint proved it) or
    * after the CDC pipeline appended the same batch to both.
    */
  def register(spark: SparkSession, base: DataFrame,
      statsPath: String): Entry = {
    val (rel, fsRel) = RelationPins.bare(GraftBridge.analyzedPlan(base))
      .getOrElse(throw new IllegalArgumentException(
        "register expects a bare single-file-source scan (the table " +
          "the artifact profiles); got:\n" +
          GraftBridge.analyzedPlan(base).treeString))
    val version = ColStats.version(statsPath)
    val resolver = SQLConf.get.resolver
    // bounded collects: the scalar profile and NDV estimates are
    // ≤ |cols| rows by construction
    val ndv: Map[String, Double] =
      ColStats.ndv(spark, statsPath).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scalar = ColStats.stats(spark, statsPath).collect()
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
        rowFor(r).map { case (attr, longAt) =>
          val name = r.getString(0)
          val integral = attr.dataType match {
            case ByteType | ShortType | IntegerType | LongType => true
            case _ => false
          }
          def num(col: String): Option[String] =
            if (integral) longAt(col).map(_.toString) else None
          val nRows = r.getAs[Long]("n_rows")
          val nNulls = r.getAs[Long]("n_nulls")
          // avg string length from the artifact's exact length sums
          // — THE honest width input; fixed-width types use their
          // type width
          val avgLen: Long = attr.dataType match {
            case StringType =>
              longAt("sum_len")
                .filter(_ => nRows > nNulls)
                .map(s => math.max(1L, math.round(
                  s.toDouble / (nRows - nNulls))))
                .getOrElse(attr.dataType.defaultSize.toLong)
            case dt => dt.defaultSize.toLong
          }
          attr.name -> CatalogColumnStat(
            distinctCount =
              ndv.get(name).map(d => BigInt(math.max(1L, d.round))),
            min = num("min_num"), max = num("max_num"),
            nullCount = Some(BigInt(nNulls)),
            avgLen = Some(avgLen),
            maxLen = Some(attr.dataType match {
              case StringType =>
                longAt("max_len").getOrElse(avgLen)
              case dt => dt.defaultSize.toLong
            }))
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
        attr.name -> Scalar(r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_nulls"),
          longAt("min_num"), longAt("max_num"), longAt("sum_num"))
      }
    }.toMap
    val e = Entry(statsPath, RelationPins.rootPaths(fsRel),
      RelationPins.signature(fsRel), version, catalog, scalars)
    registry.put(statsPath, e)
    e
  }

  def unregister(statsPath: String): Unit = {
    registry.remove(statsPath); ()
  }

  def clear(): Unit = registry.clear()

  /** Current registrations with their LIVE version freshness — the
    * ops answer to "why isn't my table planning with stats": one row
    * per registered artifact (path, base roots, injected rowCount /
    * sizeInBytes, pinned vs live manifest version). Base-listing
    * freshness is per-query (it needs the query's own relation) and
    * is not evaluated here.
    */
  def status(spark: SparkSession): DataFrame = {
    val s = spark
    import s.implicits._
    registry.values.asScala.toSeq.sortBy(_.statsPath).map { e =>
      val liveVersion =
        try Some(ColStats.version(e.statsPath))
        catch { case NonFatal(_) => None }
      (e.statsPath, e.basePaths.toSeq.sorted.mkString(","),
        e.stats.rowCount.map(_.toLong).getOrElse(-1L),
        e.stats.sizeInBytes.toLong,
        e.version, liveVersion.getOrElse(-1L),
        liveVersion.contains(e.version))
    }.toDF("stats_path", "base_roots", "row_count", "size_bytes",
      "pinned_version", "live_version", "version_fresh")
  }

  /** Add the rule to a live session (idempotent). Config-time
    * sessions get it from [[GraftExtensions]].
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

  /** Per-optimizer-pass memo of "does the artifact still sit at its
    * registered manifest version" — the one FILESYSTEM read in the
    * freshness check. Memoized per [[Rule.apply]] invocation (never
    * across queries — the pin guards result-exactness, so it must be
    * re-checked within every plan's own optimization), it bounds the
    * planning cost at one manifest read per artifact per pass even
    * when a query references the relation many times.
    */
  private type VersionMemo =
    scala.collection.mutable.Map[String, Boolean]

  final case class Rule(spark: SparkSession)
      extends CatalystRule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else {
        val memo: VersionMemo = scala.collection.mutable.Map.empty
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
      memo: VersionMemo): Option[Entry] = {
    val h = l.relation match {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation => h
      case _ => return None
    }
    val roots = RelationPins.rootPaths(h)
    val cands = registry.values.asScala.filter(_.basePaths == roots)
    if (cands.isEmpty) return None
    val sig = RelationPins.signature(h)
    cands.find { e =>
      e.listingSig == sig &&
        memo.getOrElseUpdate(e.statsPath,
          try ColStats.version(e.statsPath) == e.version
          catch { case NonFatal(_) => false })
    }
  }

  private def inject(l: LogicalRelation,
      memo: VersionMemo): Option[LogicalRelation] =
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
    * algebra is exact. Refuses on DISTINCT/FILTER, non-integral
    * min/max/sum (the artifact profiles numerics as BIGINT), any
    * WHERE, or any unprofiled column.
    */
  private def metadataAgg(agg: Aggregate,
      memo: VersionMemo): Option[Aggregate] = {
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
    def integral(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def numLit(v: Option[Long], dt: DataType): Expression = v match {
      case None => Literal(null, dt)
      case Some(x) => dt match {
        case ByteType => Literal(x.toByte)
        case ShortType => Literal(x.toShort)
        case IntegerType => Literal(x.toInt)
        case _ => Literal(x)
      }
    }

    def answer(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(children)
            if children.nonEmpty &&
              children.forall(c => c.foldable && c.eval() != null) =>
          Some(Literal(nRows))
        case Count(Seq(c)) if !c.foldable =>
          scalarOf(c).map { case (s, _) => Literal(s.nRows - s.nNulls) }
        case m: aggregate.Min =>
          scalarOf(m.child).collect {
            case (s, a) if integral(a.dataType) =>
              numLit(s.minNum, a.dataType)
          }
        case m: aggregate.Max =>
          scalarOf(m.child).collect {
            case (s, a) if integral(a.dataType) =>
              numLit(s.maxNum, a.dataType)
          }
        case sm: Sum =>
          scalarOf(sm.child).collect {
            case (s, a) if integral(a.dataType) &&
                ae.dataType == LongType =>
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
