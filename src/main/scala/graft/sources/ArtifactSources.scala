package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  EqualTo, Filter, In, PrunedFilteredScan, RelationProvider}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType,
  StringType, StructType}

import graft.operators.{AggView, Bm25Index, VecStats}

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
    new VecStatsRelation(ctx.sparkSession, path)
  }
}

class VecStatsRelation(spark: SparkSession, path: String)
    extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = VecStats.summary(spark, path).schema
  override def needConversion: Boolean = false
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val df = VecStats.summary(spark, path)
      .select(requiredColumns.map(col).toIndexedSeq: _*)
    df.queryExecution.toRdd.asInstanceOf[RDD[Row]]
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
    extends BaseRelation with PrunedFilteredScan {
  private def scored = Bm25Index.score(spark, path, terms, k1, b)
  override def sqlContext: SQLContext = spark.sqlContext
  override val schema: StructType = scored.schema
  override def needConversion: Boolean = false
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] =
    filters
  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    scored.select(requiredColumns.map(col).toIndexedSeq: _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
}
