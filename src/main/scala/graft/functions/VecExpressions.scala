package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen helpers for the quantized-vector expression family.
  *
  * The Column-algebra formulations (`aggregate(zip_with(...))` per
  * centroid/plane) run as INTERPRETED higher-order functions — one
  * lambda invocation per element per centroid, boxed. These helpers
  * do the same arithmetic in tight primitive loops; each expression
  * is property-locked bit-identical to its composed reference
  * (VecExpressionsSpec), including the composed forms' null/mismatch
  * edge semantics, so they are drop-in swaps under the DuckDB hash
  * contract.
  */
object VecOps {

  private def anyNull(v: ArrayData): Boolean = {
    var i = 0
    val n = v.numElements()
    while (i < n) { if (v.isNullAt(i)) return true; i += 1 }
    false
  }

  /** round(x·scale) per element, HALF_UP through BigDecimal exactly
    * like Spark's `round(double, 0)`; null elements stay null.
    *
    * Deliberate deviation (same pattern as [[cosineInt]]'s zero-vector
    * NULL): a NaN/Infinite element quantizes to NULL. The composed
    * reference's trailing `.cast("long")` throws under ANSI mode
    * (Spark's round passes NaN/Inf through unchanged), and
    * BigDecimal.valueOf would throw NumberFormatException here — one
    * degenerate embedding must not kill a 100 TB job.
    */
  def quantize(v: ArrayData, scale: Int, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val d = (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) *
          scale
        if (!d.isNaN && !d.isInfinite)
          out(i) = java.lang.Long.valueOf(java.math.BigDecimal.valueOf(d)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
            .toLong)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Integer-exact cosine: three long dot products, one IEEE double
    * division. Null (boxed) when the composed form's zip_with/
    * aggregate chain would null out: length mismatch or any null
    * element. The ONE deliberate deviation from the composed
    * reference: a zero vector (no direction → zero denominator)
    * returns NULL here, where the composed Divide under ANSI mode
    * throws DIVIDE_BY_ZERO — one degenerate embedding must not kill
    * a 100 TB job.
    */
  def cosineInt(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n || anyNull(a) || anyNull(b)) return null
    var ab = 0L
    var aa = 0L
    var bb = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      val y = b.getLong(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    if (aa == 0L || bb == 0L) return null
    java.lang.Double.valueOf(
      ab.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble)))
  }

  /** Sign-projection bucket: bit p = (q · plane_p) >= 0. A null
    * element or length mismatch nulls every plane's dot product in
    * the composed form, whose `when(d >= 0, bit).otherwise(0)` then
    * contributes 0 — reproduced here.
    */
  def signBucket(q: ArrayData, planes: Array[Array[Long]]): Long = {
    if (anyNull(q)) return 0L
    val n = q.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (plane.length == n) {
        var d = 0L
        var i = 0
        while (i < n) { d += q.getLong(i) * plane(i); i += 1 }
        if (d >= 0) bucket |= 1L << p
      }
      p += 1
    }
    bucket
  }

  /** Float/double cosine with the composed chain's exact IEEE
    * sequence: each element cast to double, three LEFT-TO-RIGHT
    * sequential folds, one division. Null on mismatch/null element;
    * null (not ANSI error) on a zero denominator, like [[cosineInt]].
    */
  def cosineFloat(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n || anyNull(a) || anyNull(b)) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) return null
    java.lang.Double.valueOf(ab / denom)
  }

  /** Float-plane sign bucket, per-plane LEFT-TO-RIGHT double fold —
    * [[signBucket]]'s semantics over double planes.
    */
  def signBucketFloat(v: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Long = {
    if (anyNull(v)) return 0L
    val n = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (plane.length == n) {
        var d = 0.0
        var i = 0
        while (i < n) {
          d += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) *
            plane(i)
          i += 1
        }
        if (d >= 0) bucket |= 1L << p
      }
      p += 1
    }
    bucket
  }

  private def sqDists(q: ArrayData,
      centroids: Array[Array[Long]]): Array[Long] = {
    val n = q.numElements()
    val ds = new Array[Long](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0L
      var i = 0
      while (i < n) { val t = q.getLong(i) - cent(i); d += t * t; i += 1 }
      ds(c) = d
      c += 1
    }
    ds
  }

  /** argmin centroid index, ties → smaller index. Malformed input
    * (null element / dimension mismatch) nulls every distance in the
    * composed form, whose struct array_min then lands on index 0 —
    * reproduced.
    */
  def nearestCentroid(q: ArrayData, centroids: Array[Array[Long]]): Int = {
    if (anyNull(q) || q.numElements() != centroids(0).length) return 0
    val ds = sqDists(q, centroids)
    var best = 0
    var c = 1
    while (c < ds.length) { if (ds(c) < ds(best)) best = c; c += 1 }
    best
  }

  /** The `nprobe` nearest centroid indices ascending by (distance,
    * index) — the composed `array_sort` of (d, c) structs. Malformed
    * input → indices 0..nprobe-1, like the composed all-null sort.
    */
  def probeBuckets(q: ArrayData, centroids: Array[Array[Long]],
      nprobe: Int): ArrayData = {
    val k = math.min(nprobe, centroids.length)
    if (anyNull(q) || q.numElements() != centroids(0).length)
      return new GenericArrayData(Array.tabulate[Any](k)(identity))
    val ds = sqDists(q, centroids)
    val idx = Array.range(0, centroids.length).sortBy(i => (ds(i), i))
    new GenericArrayData(idx.take(k).map(i => i: Any))
  }
}

/** quantize_vec(array<float|double>) → ARRAY<BIGINT>. */
case class QuantizeVec(child: Expression, scale: Int)
    extends UnaryExpression {
  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_vec requires ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override protected def nullSafeEval(v: Any): Any =
    VecOps.quantize(v.asInstanceOf[ArrayData], scale, elemType == FloatType)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = " +
      s"graft.functions.VecOps.quantize($c, $scale, ${elemType == FloatType});")
  override protected def withNewChildInternal(c: Expression): QuantizeVec =
    copy(c)
  override def prettyName: String = "quantize_vec"
}

/** cosine_int(array<bigint>, array<bigint>) → DOUBLE (null on
  * mismatch/null element, like the composed chain).
  */
case class CosineInt(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_int requires two ARRAY<BIGINT> arguments, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosineInt(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecOps.cosineInt($a, $b);
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_r.doubleValue();
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineInt = copy(l, r)
  override def prettyName: String = "cosine_int"
}

/** cosine_float(array<float|double>, array<float|double>) → DOUBLE
  * (null on mismatch/null element/zero vector).
  */
case class CosineFloat(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
          ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_float requires two ARRAY<FLOAT|DOUBLE> arguments, got $other")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosineFloat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecOps.cosineFloat(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |${ev.isNull} = (${ev.value}_r == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}_r.doubleValue();
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineFloat = copy(l, r)
  override def prettyName: String = "cosine_float"
}

/** sign_bucket_float(array<float|double>) → BIGINT bucket over baked
  * double planes.
  */
case class SignBucketFloat(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket_float requires ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.signBucketFloat(v.asInstanceOf[ArrayData], planeArr, isFloat)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecOps.signBucketFloat($c, $ref, " +
        s"$isFloat);")
  }
  override protected def withNewChildInternal(c: Expression)
      : SignBucketFloat = copy(c)
  override def prettyName: String = "sign_bucket_float"
}

/** sign_bucket_int(array<bigint>) → BIGINT bucket over baked ±1
  * planes.
  */
case class SignBucketInt(child: Expression, planes: Seq[Seq[Int]])
    extends UnaryExpression {
  private lazy val planeArr: Array[Array[Long]] =
    planes.map(_.map(_.toLong).toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket_int requires ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.signBucket(v.asInstanceOf[ArrayData], planeArr)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecOps.signBucket($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): SignBucketInt =
    copy(c)
  override def prettyName: String = "sign_bucket_int"
}

/** nearest_centroid_int(array<bigint>) → INT argmin over baked
  * centroids.
  */
case class NearestCentroidInt(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression {
  private lazy val centArr: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_int requires ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    VecOps.nearestCentroid(v.asInstanceOf[ArrayData], centArr)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centArr, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecOps.nearestCentroid($c, $ref);")
  }
  override protected def withNewChildInternal(c: Expression)
      : NearestCentroidInt = copy(c)
  override def prettyName: String = "nearest_centroid_int"
}

/** probe_buckets_int(array<bigint>) → ARRAY<INT>: nprobe nearest
  * centroid indices.
  */
case class ProbeBucketsInt(child: Expression, centroids: Seq[Seq[Long]],
    nprobe: Int) extends UnaryExpression {
  private lazy val centArr: Array[Array[Long]] =
    centroids.map(_.toArray).toArray
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"probe_buckets_int requires ARRAY<BIGINT>, got $other")
  }
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    VecOps.probeBuckets(v.asInstanceOf[ArrayData], centArr, nprobe)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centArr, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VecOps.probeBuckets($c, $ref, $nprobe);")
  }
  override protected def withNewChildInternal(c: Expression)
      : ProbeBucketsInt = copy(c)
  override def prettyName: String = "probe_buckets_int"
}

/** Column API for the vector expression family. Null-input edges are
  * wrapped to match the composed Column formulations exactly (which
  * collapse a NULL input to 0 / [0..nprobe) through their
  * `otherwise` branches rather than propagating null).
  */
object VecFunctions {
  import org.apache.spark.sql.functions.{array, coalesce, lit}
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def ex(c: Column): Expression = GraftBridge.expression(c)

  def quantize_vec(c: Column, scale: Int = 1000): Column =
    col(QuantizeVec(ex(c), scale))
  def cosine_int(a: Column, b: Column): Column =
    col(CosineInt(ex(a), ex(b)))
  def cosine_float(a: Column, b: Column): Column =
    col(CosineFloat(ex(a), ex(b)))
  def sign_bucket_float(c: Column, planes: Seq[Seq[Double]]): Column =
    coalesce(col(SignBucketFloat(ex(c), planes)), lit(0L))
  def sign_bucket_int(c: Column, planes: Seq[Seq[Int]]): Column =
    coalesce(col(SignBucketInt(ex(c), planes)), lit(0L))
  def nearest_centroid_int(c: Column, centroids: Seq[Seq[Long]]): Column =
    coalesce(col(NearestCentroidInt(ex(c), centroids)), lit(0))
  def probe_buckets_int(c: Column, centroids: Seq[Seq[Long]],
      nprobe: Int): Column =
    coalesce(col(ProbeBucketsInt(ex(c), centroids, nprobe)),
      array((0 until math.min(nprobe, centroids.length)).map(lit): _*))

  /** SQL registration for the argument-only members of the family
    * (the plane/centroid-parameterized expressions carry baked tables
    * and stay Scala-API-only).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    GraftBridge.registerFunction(spark, "cosine_int", { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"cosine_int(a, b) takes 2 arguments, got ${es.length}")
      CosineInt(es(0), es(1))
    })
    GraftBridge.registerFunction(spark, "cosine_float", { es =>
      if (es.length != 2) throw new IllegalArgumentException(
        s"cosine_float(a, b) takes 2 arguments, got ${es.length}")
      CosineFloat(es(0), es(1))
    })
    GraftBridge.registerFunction(spark, "quantize_vec", { es =>
      if (es.isEmpty || es.length > 2) throw new IllegalArgumentException(
        s"quantize_vec(vec[, scale]) takes 1 or 2 arguments, got ${es.length}")
      val scale = if (es.length == 2) es(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"quantize_vec: scale must be an integer literal, got $other")
      } else 1000
      QuantizeVec(es(0), scale)
    })
  }
}
