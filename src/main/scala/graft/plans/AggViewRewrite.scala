package graft.plans

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.{Rule => CatalystRule}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DoubleType

import graft.operators.AggView

/** MATERIALIZED-VIEW QUERY REWRITE over the persisted [[AggView]]
  * artifact: an optimizer rule that recognizes a grouped SUM/COUNT
  * aggregate on the FACT table and transparently serves it from the
  * registered view — the query keeps scanning "the table" as far as
  * the user is concerned, while the plan reads the ≤ |groups|-row
  * rollup instead of the 100 TB corpus. The classic
  * answering-queries-using-views shape (Goldstein & Larson,
  * SIGMOD'01), restricted to the SUM-algebra views [[AggView]] can
  * maintain incrementally.
  *
  * A rewrite fires only when ALL of the following hold — anything
  * else falls through to the base scan, never to a wrong answer:
  *
  *  - the aggregate's child is the registered base relation (a
  *    single parquet [[HadoopFsRelation]]), under at most
  *    column-pruning projections and deterministic filters;
  *  - the base relation's FILE LISTING (name, length, mtime of every
  *    file) is bit-identical to the listing pinned at registration —
  *    any append/compaction/overwrite of the fact table silently
  *    disables the rewrite until the view is re-synced and
  *    re-registered;
  *  - the view's manifest VERSION still equals the registered pin —
  *    any maintenance commit on the artifact likewise disables the
  *    rewrite until re-registration (the two pins together are the
  *    coherence contract: base and view were observed consistent at
  *    register time, and neither has moved since);
  *  - every filter references only view KEY columns (key predicates
  *    commute with the per-group sums); when the filters pin EVERY
  *    key with an equality literal or a bounded IN-list (≤ 256
  *    combinations), the rewrite additionally computes the key-hash
  *    buckets driver-side and emits the kb-partition-pruned read —
  *    the q209 dashboard-probe plan from plain SQL over the base
  *    table;
  *  - every grouping expression is a key column, and every aggregate
  *    is `count(*)` (→ `sum(cnt)`, coalesced to 0 for the global
  *    empty case) or `sum(E)` where E is one of the view's declared
  *    measure expressions (matched on the optimizer-normalized
  *    canonical form, so literal folding / implicit casts don't
  *    break the match). `count(E)` and double-typed `avg(E)`
  *    additionally rewrite when the view declares E's NULL COUNTER
  *    as a measure (`CASE WHEN E IS NULL THEN 0 ELSE 1 END`):
  *    count(E) = its sum, avg(E) = sum-measure / counter with the
  *    divisor NULL'd at 0 (all-null group ⇒ null, ANSI-safe).
  *    Otherwise `avg`/`count(col)`, and always DISTINCT/FILTER'd
  *    aggregates, refuse: their null/distinct semantics are not
  *    derivable from a plain (sum, count) rollup.
  *
  * Group-by on a SUBSET of the view keys re-aggregates the rollup
  * (sum of partial sums — the sum algebra that makes the view
  * self-maintainable also makes it roll up), so one registered view
  * serves the whole cube below its key set.
  *
  * Wiring: [[GraftExtensions]] injects the rule at session-creation
  * time; [[AggViewRewrite.install]] adds it to a live session's
  * `experimental.extraOptimizations`. Registration is process-local
  * ([[register]]/[[unregister]]) — for a one-shot scoped rewrite
  * (e.g. a benchmarked query that must not affect later plans), use
  * [[rewritten]], which registers, forces optimization, and
  * unregisters.
  */
object AggViewRewrite extends PredicateHelper with Logging {

  /** A registered view: the artifact path, the base relation's root
    * paths + file-listing signature, and the manifest-version pin.
    */
  final case class Entry(viewPath: String, basePaths: Set[String],
      listingSig: Long, version: Long, decl: AggView.Decl)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Pin `viewPath` as the rollup of `base` AS CURRENTLY LISTED.
    * `base` must be a bare single-relation parquet scan (the same
    * DataFrame the view was built/synced from); the caller owns the
    * assertion that the view IS that table's rollup — typically by
    * registering right after [[AggView.buildIfAbsent]] (whose
    * fingerprint check proved exactly that) or after a CDC batch
    * that applied the same changes to both.
    */
  def register(spark: SparkSession, base: DataFrame,
      viewPath: String): Entry = {
    val (_, fsRel) = bareRelation(GraftBridge.analyzedPlan(base))
      .getOrElse(throw new IllegalArgumentException(
        "register expects a bare single-file-source scan (the fact " +
          "table the view rolls up); got:\n" +
          GraftBridge.analyzedPlan(base).treeString))
    val decl = AggView.declaration(viewPath)
    val reserved = Seq("cnt")
    require((decl.keys ++ decl.measures.map(_.name))
        .forall(n => !reserved.contains(n)),
      "view key/measure named 'cnt' would collide with the served " +
        "count column — not rewritable")
    val e = Entry(viewPath, rootPaths(fsRel), signature(fsRel),
      decl.version, decl)
    registry.put(viewPath, e)
    e
  }

  def unregister(viewPath: String): Unit = { registry.remove(viewPath); () }

  def clear(): Unit = registry.clear()

  /** Current registrations with their LIVE freshness — the ops
    * answer to "why didn't my query rewrite": one row per registered
    * view (path, base roots, keys, measures, pinned version, and
    * whether the pin still matches the artifact's current manifest).
    * Base-listing freshness is per-query (it needs the query's own
    * relation) and is not evaluated here.
    */
  def status(spark: SparkSession): DataFrame = {
    val s = spark
    import s.implicits._
    registry.values.asScala.toSeq.sortBy(_.viewPath).map { e =>
      val liveVersion =
        try Some(AggView.declaration(e.viewPath).version)
        catch { case NonFatal(_) => None }
      (e.viewPath, e.basePaths.toSeq.sorted.mkString(","),
        e.decl.keys.mkString(","),
        e.decl.measures.map(_.name).mkString(","),
        e.version, liveVersion.getOrElse(-1L),
        liveVersion.contains(e.version))
    }.toDF("view_path", "base_roots", "keys", "measures",
      "pinned_version", "live_version", "version_fresh")
  }

  /** Add the rule to a live session (idempotent). Config-time
    * sessions get it from [[GraftExtensions]].
    */
  def install(spark: SparkSession): Unit =
    GraftBridge.addOptimization(spark, Rule(spark))

  /** One-shot SCOPED rewrite: register the view, force `df` through
    * the optimizer (so the rewrite — if legal — is baked into the
    * returned plan), then unregister, leaving no process-global
    * state behind. The returned DataFrame executes the rewritten
    * plan regardless of later registry changes.
    */
  def rewritten(spark: SparkSession, base: DataFrame, viewPath: String)
      (query: => DataFrame): DataFrame = {
    install(spark)
    register(spark, base, viewPath)
    try GraftBridge.ofRows(spark, GraftBridge.optimizedPlan(query))
    finally unregister(viewPath)
  }

  final case class Rule(spark: SparkSession)
      extends CatalystRule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          try tryRewrite(spark, agg).getOrElse(agg)
          catch {
            case NonFatal(e) =>
              logWarning(s"aggview rewrite skipped: $e")
              agg
          }
      }
  }

  // ---------------------------------------------------------------
  // matching

  private def bareRelation(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation)] =
    RelationPins.bare(p)

  /** Strip column-pruning projections and collect deterministic
    * filter conjuncts between the aggregate and the relation.
    */
  private def decompose(p: LogicalPlan)
      : Option[(LogicalRelation, HadoopFsRelation, Seq[Expression])] =
    p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => Some((l, h, Nil))
        case _ => None
      }
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        decompose(c)
      case Filter(cond, c)
          if cond.deterministic && !SubqueryExpression.hasSubquery(cond) =>
        decompose(c).map { case (l, h, fs) =>
          (l, h, splitConjunctivePredicates(cond) ++ fs)
        }
      case _ => None
    }

  private def rootPaths(h: HadoopFsRelation): Set[String] =
    RelationPins.rootPaths(h)

  private def signature(h: HadoopFsRelation): Long =
    RelationPins.signature(h)

  private def tryRewrite(spark: SparkSession,
      agg: Aggregate): Option[Aggregate] = {
    val (rel, fsRel, filters) = decompose(agg.child).getOrElse(return None)
    val roots = rootPaths(fsRel)
    val cands = registry.values.asScala.filter(_.basePaths == roots).toSeq
    if (cands.isEmpty) return None
    val sig = signature(fsRel)
    // prefer the COARSEST sufficient view: fewer keys = fewer rollup
    // groups = the smallest artifact that can still answer
    cands.sortBy(_.decl.keys.size).iterator
      .map(e => rewriteWith(spark, agg, rel, filters, e, sig))
      .collectFirst { case Some(a) => a }
  }

  private def rewriteWith(spark: SparkSession, agg: Aggregate,
      rel: LogicalRelation, filters: Seq[Expression], e: Entry,
      sig: Long): Option[Aggregate] = {
    // freshness pins: base listing unchanged, view manifest unchanged
    if (sig != e.listingSig) return None
    val cur = try AggView.declaration(e.viewPath)
      catch { case NonFatal(_) => return None }
    if (cur.version != e.version || cur.keys != e.decl.keys ||
      cur.measures != e.decl.measures) return None

    val resolver = SQLConf.get.resolver
    // key name (manifest spelling) -> base attribute
    val keyAttr: Map[String, Attribute] = e.decl.keys.flatMap { k =>
      rel.output.find(a => resolver(a.name, k)).map(k -> _)
    }.toMap
    if (keyAttr.size != e.decl.keys.size) return None
    val keyAttrSet = AttributeSet(keyAttr.values)
    val keyNameOf: Map[ExprId, String] =
      keyAttr.map { case (n, a) => a.exprId -> n }

    // filters may touch keys only
    if (!filters.forall(_.references.subsetOf(keyAttrSet))) return None

    // grouping expressions must BE key attributes
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference if keyAttrSet.contains(a) => a
      case _ => return None
    }

    // optimizer-normalized measure expressions over THIS relation
    // instance, keyed by canonical form
    val measureOf: Map[Expression, String] = e.decl.measures.flatMap { m =>
      normalizedMeasure(spark, rel, m.sqlExpr).map(_ -> m.name)
    }.toMap
    if (measureOf.size != e.decl.measures.size) return None

    // kb partition prune when every key is pinned by equality or a
    // bounded IN-list: each conjunct's value set is a SUPERSET of
    // the matching rows' key values, so when several conjuncts pin
    // one key, any of them is sound — take the smallest
    val keyVals: Map[String, Seq[Literal]] = filters.collect {
      case EqualTo(a: AttributeReference, l: Literal)
          if keyAttrSet.contains(a) && l.value != null =>
        keyNameOf(a.exprId) -> Seq(l)
      case EqualTo(l: Literal, a: AttributeReference)
          if keyAttrSet.contains(a) && l.value != null =>
        keyNameOf(a.exprId) -> Seq(l)
      case EqualNullSafe(a: AttributeReference, l: Literal)
          if keyAttrSet.contains(a) => keyNameOf(a.exprId) -> Seq(l)
      case EqualNullSafe(l: Literal, a: AttributeReference)
          if keyAttrSet.contains(a) => keyNameOf(a.exprId) -> Seq(l)
      case In(a: AttributeReference, vs)
          if keyAttrSet.contains(a) && vs.forall(_.isInstanceOf[Literal]) =>
        keyNameOf(a.exprId) ->
          vs.collect { case l: Literal if l.value != null => l }
      case InSet(a: AttributeReference, vs)
          if keyAttrSet.contains(a) =>
        keyNameOf(a.exprId) -> vs.toSeq.filter(_ != null)
          .map(v => Literal(v, a.dataType))
    }.groupBy(_._1)
      .map { case (k, kvs) => k -> kvs.map(_._2).minBy(_.size) }
    val parts: Option[Seq[Int]] = {
      val sets = e.decl.keys.map(k => keyVals.getOrElse(k, Nil))
      // BigInt: a Long product of many IN-list sizes can overflow
      // and wrap UNDER the cap, unleashing the cross-product fold
      if (sets.forall(_.nonEmpty) &&
        sets.map(s => BigInt(s.size)).product <= 256) {
        val tuples = sets.foldLeft(Seq(Seq.empty[Literal]))(
          (acc, s) => acc.flatMap(t => s.map(t :+ _)))
        Some(tuples.map { t =>
          // same hash the writer used: xxhash64(keys in decl order)
          val h = new XxHash64(t, 42L)
            .eval(InternalRow.empty).asInstanceOf[Long]
          java.lang.Math.floorMod(h, e.decl.kbParts.toLong).toInt
        }.distinct)
      } else None
    }

    // the pushed key predicate, re-addressed to the view's columns
    val whereCol: Option[Column] = filters.reduceOption(And).map { c =>
      GraftBridge.column(c.transform {
        case a: AttributeReference if keyAttrSet.contains(a) =>
          UnresolvedAttribute.quoted(keyNameOf(a.exprId))
      })
    }

    val viewPlan = GraftBridge.analyzedPlan(
      AggView.readFor(spark, e.viewPath, whereCol, parts))
    val vOut = viewPlan.output
    // .get: a missing column is impossible by construction (readFor
    // serves keys/cnt/measures); if it ever happens the Rule-level
    // NonFatal guard turns it into a skipped rewrite
    def vAttr(name: String): Attribute =
      vOut.find(a => resolver(a.name, name)).get
    val cntAttr = vAttr("cnt")

    // a NULL-COUNTER measure for expression E: a declared measure
    // whose normalized form is `CASE WHEN E IS NULL THEN 0 ELSE 1
    // END` (or the IF spelling) — what makes count(E) and avg(E)
    // derivable from the rollup despite their null-skipping
    // semantics. Probed on demand: the candidate counter is BUILT
    // from the query's own (already-normalized) E and run through
    // the same optimizer normal form the declared measures got.
    def counterMeasure(e: Expression): Option[String] = {
      def probe(x: Expression): Option[String] =
        try {
          val tiny = Project(Seq(Alias(x, "__m")()), rel)
          GraftBridge.optimize(spark, GraftBridge.analyze(spark, tiny))
            .collectFirst { case Project(Seq(a: Alias), _) =>
              a.child.canonicalized
            }.flatMap(measureOf.get)
        } catch { case NonFatal(_) => None }
      probe(CaseWhen(Seq((IsNull(e), Literal(0))), Some(Literal(1))))
        .orElse(probe(If(IsNull(e), Literal(0), Literal(1))))
    }

    def rewriteAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      ae.aggregateFunction match {
        case Count(children)
            if children.nonEmpty &&
              children.forall(c => c.foldable && c.eval() != null) =>
          // count(*) / count(<non-null literal>) = total row count
          Some(Coalesce(Seq(
            Sum(cntAttr).toAggregateExpression(), Literal(0L))))
        case Count(Seq(e)) if !e.foldable =>
          // count(col): the view must carry E's null counter
          counterMeasure(e).map { cName =>
            Coalesce(Seq(
              Sum(vAttr(cName)).toAggregateExpression(), Literal(0L)))
          }
        case a: Average if ae.dataType == DoubleType =>
          // avg(E) = sum-measure / counter-measure. The divisor is
          // NULL'd when 0 (an all-null group), so the result is null
          // exactly like the direct plan — and never an ANSI
          // divide-by-zero. Double-typed averages only: a decimal
          // average's scale arithmetic is not replayed here.
          for {
            sName <- measureOf.get(a.child.canonicalized)
            cName <- counterMeasure(a.child)
          } yield {
            val s = Cast(Sum(vAttr(sName)).toAggregateExpression(),
              DoubleType)
            val c = Cast(Sum(vAttr(cName)).toAggregateExpression(),
              DoubleType)
            Divide(s,
              If(EqualTo(c, Literal(0d)), Literal(null, DoubleType), c))
          }
        case s: Sum =>
          measureOf.get(s.child.canonicalized).map { mName =>
            val re = Sum(vAttr(mName)).toAggregateExpression()
            if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
          }
        case _ => None
      }
    }

    def rewriteExpr(expr: Expression): Option[Expression] = expr match {
      case ae: AggregateExpression => rewriteAgg(ae)
      case a: AttributeReference if keyAttrSet.contains(a) =>
        Some(vAttr(keyNameOf(a.exprId)))
      case _: AttributeReference => None
      case _: Literal => Some(expr)
      case other =>
        val kids = other.children.map(rewriteExpr)
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if keyAttrSet.contains(a) =>
        Alias(vAttr(keyNameOf(a.exprId)), a.name)(exprId = a.exprId)
      case al: Alias =>
        rewriteExpr(al.child) match {
          case Some(c) => Alias(c, al.name)(exprId = al.exprId)
          case None => return None
        }
      case _ => return None
    }
    val newGroups = groupAttrs.map(a => vAttr(keyNameOf(a.exprId)))
    val out = Aggregate(newGroups, newAggExprs, viewPlan)

    // never emit a plan whose output differs from the original
    val same = out.output.size == agg.output.size &&
      out.output.zip(agg.output).forall { case (n, o) =>
        n.exprId == o.exprId && n.name == o.name && n.dataType == o.dataType
      }
    if (same) Some(out) else None
  }

  /** Parse, analyze, and optimizer-normalize one measure expression
    * against the query's own relation node (so attribute ids line up
    * and canonical comparison with the query side is exact).
    */
  private def normalizedMeasure(spark: SparkSession,
      rel: LogicalRelation, sqlExpr: String): Option[Expression] =
    try {
      val parsed = GraftBridge.parseExpression(spark, sqlExpr)
      val tiny = Project(Seq(Alias(parsed, "__m")()), rel)
      val norm = GraftBridge.optimize(spark, GraftBridge.analyze(spark, tiny))
      norm.collectFirst {
        case Project(Seq(a: Alias), _) if a.child.resolved =>
          a.child.canonicalized
      }
    } catch { case NonFatal(_) => None }
}
