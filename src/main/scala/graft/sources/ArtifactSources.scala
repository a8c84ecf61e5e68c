package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  EqualTo, Filter, In, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}

import graft.operators.{AggView, AnnIndex, Bm25Index, ColStats,
  DedupIndex, LmIndex, MergeOnRead, VecStats}

/** SQL serve surface for the persisted analytics artifacts: the
  * Scala-API serve paths ([[AggView.read]]/[[AggView.lookup]],
  * [[VecStats.summary]]) exposed as registered data sources, so a
  * pure-SQL user queries artifact state like any table —
  *
  * {{{
  *   CREATE TEMPORARY VIEW rollup USING aggview
  *     OPTIONS (path '/idx/rollup' [, asOfVersion '3']);
  *   SELECT * FROM rollup WHERE rf = 'R' AND ls = 'F';
  *
  *   spark.read.format("vecstats").load("/idx/embstats")
  * }}}
  *
  * Deliberately a THIN routing layer (DSv1 relation, not a DSv2
  * re-implementation): `buildScan` composes the SAME DataFrame the
  * Scala API serves — base ∪ committed deltas, summed per group,
  * kb-partition-pruned — and hands Spark its `InternalRow` RDD, so
  * the pruned parquet scans, the broadcast probe join, and the
  * manifest discipline are shared, never duplicated at row level.
  * Column pruning projects the inner plan (Catalyst prunes the scans
  * underneath); a KEY-COMPLETE equality predicate (every view key
  * constrained by `=` or `IN`) routes through [[AggView.lookup]], so
  * `WHERE rf = 'R' AND ls = 'F'` reads 1/kbParts of the view exactly
  * like the Scala dashboard probe. All filters are reported
  * unhandled — the engine re-evaluates them above the scan, so the
  * routing is a pure prune, never a correctness dependency.
  */
object AggViewServe {

  /** Does the runtime class of a pushed-filter literal match the
    * column's external type? (A mismatched literal would fail row
    * encoding mid-job — route those to the full read instead.)
    */
  private def typed(v: Any, dt: DataType): Boolean = (v, dt) match {
    case (null, _) => false
    case (_: String, StringType) => true
    case (_: java.lang.Long, LongType) => true
    case (_: java.lang.Integer, IntegerType) => true
    case _ => false
  }

  /** Cap on the key-combination cartesian a lookup probe may expand
    * to — past it, the full read is the better plan anyway.
    */
  private val MaxProbeRows = 256

  /** The inner DataFrame the relation executes — shared by
    * [[AggViewRelation.buildScan]] and the plan-invariant spec, so
    * what the spec pins IS the production path.
    */
  def plan(spark: SparkSession, path: String, asOf: Option[Long],
      filters: Seq[Filter]): DataFrame = {
    val base = asOf match {
      case Some(v) => return AggView.readAsOf(spark, path, v)
      case None => AggView.read(spark, path)
    }
    val keys = AggView.keys(path)
    val schemaByName = base.schema.fields.map(f => f.name -> f).toMap
    // per-key literal value sets from the pushed equality predicates
    val sets: Map[String, Seq[Any]] = filters.collect {
      case EqualTo(a, v) if keys.contains(a) => a -> Seq(v)
      case In(a, vs) if keys.contains(a) => a -> vs.toSeq
    }.groupBy(_._1)
      // conjunctive filters on one key intersect
      .map { case (k, vs) => k -> vs.map(_._2.toSet).reduce(_ & _).toSeq }
    val complete = keys.nonEmpty && keys.forall(k =>
      sets.get(k).exists(vs => vs.nonEmpty &&
        vs.forall(typed(_, schemaByName(k).dataType))))
    if (!complete) return base
    val combos = keys.foldLeft(Seq(Seq.empty[Any])) { (acc, k) =>
      for { a <- acc; v <- sets(k) } yield a :+ v
    }
    if (combos.isEmpty || combos.size > MaxProbeRows) return base
    val probeSchema = StructType(keys.map(schemaByName))
    val probe = spark.createDataFrame(
      spark.sparkContext.parallelize(combos.map(Row.fromSeq), 1),
      probeSchema)
    AggView.lookup(spark, path, probe)
  }
}

/** `spark.read.format("aggview").option("path", …)` /
  * `CREATE TEMPORARY VIEW … USING aggview` — see [[AggViewServe]].
  * Options: `path` (required), `asOfVersion` (optional — serve a
  * retained manifest version, the [[AggView.readAsOf]] time travel).
  */
class AggViewSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "aggview"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("aggview requires a path"))
    new AggViewRelation(ctx.sparkSession, path,
      parameters.get("asofversion").map(_.toLong))
  }
}

class AggViewRelation(spark: SparkSession, path: String,
    asOf: Option[Long]) extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType =
    AggViewServe.plan(spark, path, asOf, Nil).schema
  // rows hand over as InternalRow straight from the inner plan
  override def needConversion: Boolean = false
  // every filter re-evaluates above the scan: lookup routing is a
  // prune, never trusted as exact
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = AggViewServe.plan(spark, path, asOf, filters.toSeq)
      .select(requiredColumns.map(col).toIndexedSeq: _*)
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }
}

/** `spark.read.format("vecstats").option("path", …)` — the
  * [[VecStats.summary]] monitoring table (dim, n, mean, std) as a
  * SQL-queryable source. The table is ≤ dims rows by construction;
  * column pruning projects the inner plan.
  */
class VecStatsSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "vecstats"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("vecstats requires a path"))
    // asOfVersion = aggview option parity: serve a retained manifest
    // version (VecStats.summaryAsOf) — the pin pinnedVersions hands
    // a fleet-consistent SQL reader
    new VecStatsRelation(ctx.sparkSession, path,
      parameters.get("asofversion").map(_.toLong))
  }
}

/** Shared scaffold for the thin serve relations: the subclass names
  * the inner DataFrame (the SAME plan the Scala API serves) and the
  * scaffold handles schema, column pruning (projecting the inner
  * plan, so Catalyst prunes the scans underneath), `InternalRow`
  * handover, and the all-filters-unhandled contract (the engine
  * re-evaluates every predicate above the scan — source routing is a
  * prune, never a correctness dependency).
  */
abstract class InnerPlanRelation(spark: SparkSession)
    extends BaseRelation with PrunedFilteredScan {
  protected def inner: DataFrame
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = inner.schema
  override def needConversion: Boolean = false
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    inner.select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

class VecStatsRelation(spark: SparkSession, path: String,
    asOf: Option[Long] = None) extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame = asOf match {
    case Some(v) => VecStats.summaryAsOf(spark, path, v)
    case None => VecStats.summary(spark, path)
  }
}

/** `CREATE TEMPORARY VIEW hits USING bm25 OPTIONS (path …,
  * terms 'spark,join'[, k1 '1.2'][, b '0.75'])` — the
  * [[Bm25Index.score]] retrieval serve (reads |terms| tb partitions
  * + the candidates' dlb buckets; N/avgdl from the manifest) as a
  * SQL-queryable source: a parameterized view over artifact state,
  * one per query-term set.
  */
class Bm25Source extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "bm25"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("bm25 requires a path"))
    val terms = parameters.getOrElse("terms",
      throw new IllegalArgumentException(
        "bm25 requires terms (comma-separated query terms)"))
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    new Bm25ScoreRelation(ctx.sparkSession, path, terms,
      parameters.getOrElse("k1", "1.2").toDouble,
      parameters.getOrElse("b", "0.75").toDouble)
  }
}

class Bm25ScoreRelation(spark: SparkSession, path: String,
    terms: Seq[String], k1: Double, b: Double)
    extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame =
    Bm25Index.score(spark, path, terms, k1, b)
}

/** Option plumbing shared by the probe-parameterized sources: the
  * probe/doc rows come from ANY registered SQL view or table, named
  * by option — `spark.table(name)` resolves it at scan time, so the
  * whole flow (stage a probe view, parameterize the serve over it,
  * select) stays in SQL:
  *
  * {{{
  *   CREATE TEMPORARY VIEW probes AS SELECT ... ;
  *   CREATE TEMPORARY VIEW hits USING annindex
  *     OPTIONS (path '/idx/ann', probeView 'probes', k '3');
  * }}}
  */
private[sources] object ServeOptions {
  def required(parameters: Map[String, String], fmt: String,
      key: String): String =
    parameters.getOrElse(key.toLowerCase,
      throw new IllegalArgumentException(s"$fmt requires $key"))
}

/** `CREATE TEMPORARY VIEW hits USING annindex OPTIONS (path …,
  * probeView …[, probeId 'probe_id'][, probeVec 'q'][, nprobe '1']
  * [, k '10'])` — persisted-ANN search as a probe-parameterized SQL
  * view, ROUTED BY THE ARTIFACT'S OWN KIND: an `ivf` index serves
  * [[AnnIndex.searchInt]] (reads ONLY the probed bucket partitions;
  * output `(probe_id, vec_id, sim, rank)`), a `pq` index
  * [[AnnIndex.pqSearchInt]] (ADC over the S-byte codes; `adc`
  * instead of `sim`, `nprobe` ignored), an `sq8` index
  * [[AnnIndex.sq8SearchInt]]. One SQL surface for all three
  * variants — the manifest knows which search path fits its layout.
  */
class AnnIndexSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "annindex"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new AnnSearchRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "annindex", "path"),
      ServeOptions.required(parameters, "annindex", "probeView"),
      parameters.getOrElse("probeid", "probe_id"),
      parameters.getOrElse("probevec", "q"),
      parameters.getOrElse("nprobe", "1").toInt,
      parameters.getOrElse("k", "10").toInt)
}

class AnnSearchRelation(spark: SparkSession, path: String,
    probeView: String, probeId: String, probeVec: String,
    nprobe: Int, k: Int) extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame = {
    val probes = spark.table(probeView)
    AnnIndex.kind(path) match {
      case "ivf" => AnnIndex.searchInt(spark, path, probes,
        probeId, probeVec, nprobe, k)
      case "pq" => AnnIndex.pqSearchInt(spark, path, probes,
        probeId, probeVec, k)
      case "sq8" => AnnIndex.sq8SearchInt(spark, path, probes,
        probeId, probeVec, k)
      case other => throw new IllegalStateException(
        s"annindex at $path has unknown kind '$other'")
    }
  }
}

/** `CREATE TEMPORARY VIEW flagged USING dedupindex OPTIONS (path …,
  * probeView …[, probeText 'text'][, probeId 'doc_id']
  * [, thresholdTenths '5'])` — the [[DedupIndex.screen]] combined
  * exact+near ingest screen (probe digests against the persisted
  * digest ledger, probe signatures against the persisted band keys;
  * the corpus is never re-shingled) as a probe-parameterized SQL
  * view. Output: `(new_id, corpus_id, kind, matches, est_jaccard)`.
  */
class DedupIndexSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "dedupindex"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new DedupScreenRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "dedupindex", "path"),
      ServeOptions.required(parameters, "dedupindex", "probeView"),
      parameters.getOrElse("probetext", "text"),
      parameters.getOrElse("probeid", "doc_id"),
      parameters.getOrElse("thresholdtenths", "5").toInt)
}

class DedupScreenRelation(spark: SparkSession, path: String,
    probeView: String, probeText: String, probeId: String,
    thresholdTenths: Int) extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame =
    DedupIndex.screen(spark, path, spark.table(probeView),
      probeText, probeId, thresholdTenths)
}

/** `CREATE TEMPORARY VIEW scored USING lmindex OPTIONS (path …,
  * docsView …[, docId 'doc_id'][, docText 'text'][, alpha '0.4'])` —
  * the [[LmIndex.scoreBatch]] stupid-backoff serve (each count-table
  * read pruned to the gb buckets the batch's own grams hash to; the
  * token total rides the manifest) as a doc-parameterized SQL view.
  */
class LmIndexSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "lmindex"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new LmScoreRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "lmindex", "path"),
      ServeOptions.required(parameters, "lmindex", "docsView"),
      parameters.getOrElse("docid", "doc_id"),
      parameters.getOrElse("doctext", "text"),
      parameters.getOrElse("alpha", "0.4").toDouble)
}

class LmScoreRelation(spark: SparkSession, path: String,
    docsView: String, docId: String, docText: String, alpha: Double)
    extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame =
    LmIndex.scoreBatch(spark, path, spark.table(docsView),
      docId, docText, alpha)
}

/** `CREATE TEMPORARY VIEW tbl USING mor OPTIONS (path …
  * [, version '3'])` — the [[MergeOnRead]] CDC table as a SQL
  * source: the live read folds committed deltas over the bucketed
  * base (base never rewritten outside compaction); `version` serves
  * a retained manifest version ([[MergeOnRead.readAt]] time travel).
  * A live read routes pushed filters through
  * [[MergeOnRead.readWhere]]: when the table carries a zone map
  * (`buildZoneMap` after a `clusterBy` compaction), `WHERE` clauses
  * skip base files transparently — no zone map, plain read. Every
  * filter is reported unhandled and re-evaluates above the scan.
  */
class MorSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "mor"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new MorRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "mor", "path"),
      parameters.get("version").map(_.toLong))
}

class MorRelation(spark: SparkSession, val path: String,
    val version: Option[Long]) extends BaseRelation
    with PrunedFilteredScan {
  private def inner(filters: Seq[Filter]): DataFrame = version match {
    case Some(v) => MergeOnRead.readAt(spark, path, v)
    case None => MergeOnRead.readWhere(spark, path, filters)
  }
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = inner(Nil).schema
  override def needConversion: Boolean = false
  // pruning is conservative, never exact — re-evaluate everything
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    inner(filters.toIndexedSeq)
      .select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

/** `CREATE TEMPORARY VIEW profile USING colstats OPTIONS (path …
  * [, table 'stats'|'registers'|'ndv'|'hist'|'quantiles'
  * [, qs '0.5,0.9,0.99']])` — the persisted per-column
  * table-statistics artifact ([[graft.operators.ColStats]]) as a SQL
  * source: the merged scalar profile (default), the dense per-column
  * HLL registers, the distinct-count estimates, the signed-log₂
  * value histogram, or histogram-derived quantile estimates at the
  * `qs` fractions.
  */
class ColStatsSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "colstats"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new ColStatsRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "colstats", "path"),
      parameters.getOrElse("table", "stats"),
      parameters.getOrElse("qs", "0.5,0.9,0.99")
        .split(",").map(_.trim).filter(_.nonEmpty).map(_.toDouble)
        .toIndexedSeq)
}

class ColStatsRelation(spark: SparkSession, path: String,
    table: String, qs: Seq[Double]) extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame = table match {
    case "stats" => ColStats.stats(spark, path)
    case "registers" => ColStats.registers(spark, path)
    case "ndv" => ColStats.ndv(spark, path)
    case "hist" => ColStats.hist(spark, path)
    case "quantiles" => ColStats.quantiles(spark, path, qs)
    case other => throw new IllegalArgumentException(
      "colstats table must be stats|registers|ndv|hist|quantiles, " +
        s"got '$other'")
  }
}

/** `spark.read.format("indexmeta").load(path)` — OBSERVABILITY over
  * any [[graft.operators.IndexDirs]]-managed artifact: one row per
  * retained manifest version (the time-travel window), with the
  * fields every family shares (`bv` base version, `lb` last applied
  * CDC batch, `deltas`) surfaced typed and the full manifest JSON
  * carried verbatim for family-specific fields. Lets an operator
  * answer "which version is live, how many deltas are pending, what
  * batch watermark has this artifact reached, which versions can I
  * still time-travel to" from SQL, uniformly across all seven
  * artifact families. Resolved fresh per scan (≤ ManifestRetain
  * rows — metadata-scale by construction).
  */
class IndexMetaSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "indexmeta"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    new IndexMetaRelation(ctx.sparkSession,
      ServeOptions.required(parameters, "indexmeta", "path"))
}

class IndexMetaRelation(spark: SparkSession, path: String)
    extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame = {
    import spark.implicits._
    graft.operators.ArtifactMeta.versions(path)
      .map(m => (m.version, m.live, m.baseVer, m.lastBatch,
        m.nDeltas, m.manifestJson))
      .toDF("version", "live", "base_ver", "last_batch", "n_deltas",
        "manifest_json")
  }
}

/** `CREATE TEMPORARY VIEW t USING zonemap OPTIONS (path …)` — the
  * profiled table served THROUGH its zone map
  * ([[graft.operators.ZoneMap]]): every pushed comparison/null-test
  * filter on a declared zone column prunes the FILE LIST before the
  * parquet scan is even planned, so `SELECT … WHERE k BETWEEN a AND
  * b` reads only the files whose [min,max] zone intersects — SQL
  * gets transparent data skipping with zero query changes. Every
  * filter is reported unhandled and re-evaluates above the scan:
  * pruning is a prune, never a correctness dependency. Option
  * `table 'stats'` serves the metadata-scale stats table itself
  * (observability: one row per file × column).
  */
class ZoneMapSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "zonemap"
  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = ServeOptions.required(parameters, "zonemap", "path")
    parameters.getOrElse("table", "data") match {
      case "data" => new ZoneMapRelation(ctx.sparkSession, path)
      case "stats" => new ZoneMapStatsRelation(ctx.sparkSession, path)
      case other => throw new IllegalArgumentException(
        s"zonemap table must be data|stats, got '$other'")
    }
  }
}

class ZoneMapRelation(spark: SparkSession, path: String)
    extends BaseRelation with PrunedFilteredScan {
  import graft.operators.ZoneMap
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = ZoneMap.tableSchema(spark, path)
  override def needConversion: Boolean = false
  // pruning is conservative, never exact — re-evaluate everything
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    ZoneMap.scan(spark, path, filters.toIndexedSeq)
      .select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
}

class ZoneMapStatsRelation(spark: SparkSession, path: String)
    extends InnerPlanRelation(spark) {
  override protected def inner: DataFrame =
    graft.operators.ZoneMap.stats(spark, path)
}
