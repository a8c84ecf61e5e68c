package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Container-header parsing for multimodal columns: width / height /
  * duration straight from the magic bytes — real metadata decode, no
  * codec required. Pixel/sample decode stays stubbed
  * ([[graft.operators.Multimodal]]); header geometry is fully
  * specified by the container formats:
  *
  *  - PNG: IHDR width/height, big-endian u32 at offsets 16/20
  *  - GIF: logical screen size, little-endian u16 at offsets 6/8
  *  - JPEG: SOFn segment height/width (marker scan)
  *  - RIFF/WAVE: duration = data-chunk bytes / fmt byte-rate
  *  - MP4/ISO-BMFF: mvhd timescale/duration + video tkhd 16.16
  *    width/height ([[graft.operators.Mp4.meta]])
  */
object MediaOps {

  private def u16be(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int =
    ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u32le(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)
  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length &&
      s.indices.forall(j => (b(i + j) & 0xff) == s.charAt(j))

  /** (width, height, duration_ms) as an InternalRow; null when the
    * container is unrecognized or the header is truncated.
    */
  def dims(b: Array[Byte]): InternalRow = {
    if (b == null) return null
    val png = b.length >= 24 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG") &&
      ascii(b, 12, "IHDR")
    if (png)
      return row((u32be(b, 16) & 0x7fffffffL).toInt,
        (u32be(b, 20) & 0x7fffffffL).toInt, null)
    if (b.length >= 10 && ascii(b, 0, "GIF8"))
      return row(u16le(b, 6), u16le(b, 8), null)
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      return jpegDims(b)
    if (ascii(b, 0, "RIFF") && ascii(b, 8, "WAVE"))
      return wavDuration(b)
    if (ascii(b, 4, "ftyp")) {
      // ISO-BMFF: mvhd duration + video-track tkhd dimensions
      val (w, h, d) = graft.operators.Mp4.meta(b)
      return if (w.isEmpty && h.isEmpty && d.isEmpty) null
        else row(w.map(Int.box).orNull, h.map(Int.box).orNull,
          d.map(Long.box).orNull)
    }
    null
  }

  private def row(w: Any, h: Any, d: Any): InternalRow =
    new GenericInternalRow(Array[Any](w, h, d))

  /** [[FrameSlices]] kernel (public: called from generated code). */
  def frameSlicesArray(b: Array[Byte], n: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null) return null
    if (graft.operators.Mp4.isFragmented(b))
      // one NULL element → posexplode keeps one accounting row
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](null))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.operators.Multimodal.frameSlices(b, n).toArray[Any])
  }

  /** [[DHash64]] kernel (public: called from generated code): the
    * classic difference hash over a decoded grayscale image — box-
    * average the pixels onto a 9×8 grid (exact integer boundaries
    * `gx·w/9`, `gy·h/8`), then bit `gy·8+gx` = [cell(gx) > cell(gx+1)]
    * per row. Cell comparison is cross-multiplied (sumL·areaR >
    * sumR·areaL) so no division ever rounds — bit-exact and therefore
    * oracle-replayable. Null for images under 9×8 or a null struct
    * field. Products stay < 2^63 for any image the bounded decoder
    * admits (≤ 16 M px).
    */
  def dhash64(px: InternalRow): java.lang.Long = {
    if (px == null || px.isNullAt(0) || px.isNullAt(1) || px.isNullAt(2))
      return null
    val w = px.getInt(0)
    val h = px.getInt(1)
    if (w < 9 || h < 8) return null
    val pixels = px.getArray(2)
    if (pixels.numElements() != w * h) return null
    val sums = new Array[Long](9 * 8)
    val areas = new Array[Long](9 * 8)
    var gy = 0
    while (gy < 8) {
      val ys = gy * h / 8; val ye = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val xs = gx * w / 9; val xe = (gx + 1) * w / 9
        var s = 0L
        var y = ys
        while (y < ye) {
          var x = xs
          while (x < xe) { s += pixels.getInt(y * w + x); x += 1 }
          y += 1
        }
        sums(gy * 9 + gx) = s
        areas(gy * 9 + gx) = (ye - ys).toLong * (xe - xs)
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val l = gy * 9 + gx; val r = l + 1
        if (sums(l) * areas(r) > sums(r) * areas(l))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** [[DecodeGrayPx]] kernel (public: called from generated code). */
  def decodeGrayRow(b: Array[Byte]): InternalRow =
    graft.operators.Multimodal.decodeGray(b) match {
      case Some((w, h, px)) => new GenericInternalRow(Array[Any](w, h,
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(px)))
      case None => null
    }

  /** Scan JPEG segments for the first SOFn (C0–CF except C4/C8/CC):
    * payload = precision u8, height u16be, width u16be.
    */
  private def jpegDims(b: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 9 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return null // lost sync
      var marker = b(pos + 1) & 0xff
      while (marker == 0xff && pos + 9 < b.length) { // fill bytes
        pos += 1; marker = b(pos + 1) & 0xff
      }
      if (marker >= 0xd0 && marker <= 0xd9) pos += 2 // standalone
      else {
        val segLen = u16be(b, pos + 2)
        if (segLen < 2) return null
        val sof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (sof) return row(u16be(b, pos + 7), u16be(b, pos + 5), null)
        pos += 2 + segLen
      }
    }
    null
  }

  /** Walk RIFF chunks for `fmt ` (byte-rate) and `data` (payload
    * size); duration_ms = data bytes · 1000 / byte-rate.
    */
  private def wavDuration(b: Array[Byte]): InternalRow = {
    var pos = 12
    var byteRate = 0L
    var dataSize = -1L
    while (pos + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
      val size = u32le(b, pos + 4)
      if (ascii(b, pos, "fmt ") && pos + 20 <= b.length)
        byteRate = u32le(b, pos + 16)
      else if (ascii(b, pos, "data")) dataSize = size
      // advance in Long: a forged 32-bit chunk size near 2^31 would
      // overflow an Int advance to a NEGATIVE pos and index out of
      // bounds; clamping to b.length just ends the walk
      val next = pos.toLong + 8L + size + (size & 1L)
      pos = if (next > b.length) b.length else next.toInt
    }
    if (byteRate > 0 && dataSize >= 0)
      row(null, null, dataSize * 1000L / byteRate)
    else null
  }
}

/** media_dims(binary) → STRUCT<width INT, height INT, duration_ms
  * BIGINT>; NULL for unrecognized containers. Codegen'd — runs inside
  * the scan stage like the other metadata columns.
  */
case class MediaDims(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaOps.dims(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MediaOps.dims($c);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): MediaDims =
    copy(c)
  override def prettyName: String = "media_dims"
}

object MediaDims {
  def media_dims(c: Column): Column =
    GraftBridge.column(MediaDims(GraftBridge.expression(c)))
}

/** frame_slices(binary, n) → ARRAY<BINARY> of up to n demuxed frame
  * payloads — the codegen face of the MP4 sample-table walk
  * ([[graft.operators.Multimodal.frameSlices]]): keyframe slices for
  * MP4s, equal byte slices otherwise, a single NULL element for a
  * FRAGMENTED MP4 (so `posexplode` keeps exactly one accounting row
  * per such file, mirroring `decodeFrames`' typed error path), NULL
  * for NULL input. Composed with `posexplode` the demux stays inside
  * whole-stage codegen — the expression/generator variant of the
  * mapPartitions operator (which remains the shape for codecs that
  * want per-partition init).
  */
case class FrameSlices(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"invalid frame count: $n")
  override def dataType: DataType = ArrayType(BinaryType)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaOps.frameSlicesArray(v.asInstanceOf[Array[Byte]], n)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MediaOps.frameSlicesArray($c, $n);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): FrameSlices =
    copy(child = c)
  override def prettyName: String = "frame_slices"
}

/** decode_gray_px(binary) → STRUCT<width INT, height INT, pixels
  * ARRAY<INT>> — the codegen face of the bounded image decode
  * ([[graft.operators.Multimodal.decodeGray]]: header-dimension check
  * before any pixel allocation, raw band-0 samples for single-band
  * images, BT.601 luminance otherwise). NULL when the codec rejects
  * the payload — the per-frame error row.
  */
case class DecodeGrayPx(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("pixels", ArrayType(IntegerType))))
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaOps.decodeGrayRow(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MediaOps.decodeGrayRow($c);
         |${ev.isNull} = (${ev.value} == null);
         |if (${ev.isNull}) { ${ev.value} = ${CodeGenerator.defaultValue(dataType)}; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): DecodeGrayPx =
    copy(c)
  override def prettyName: String = "decode_gray_px"
}

/** dhash64(STRUCT<width, height, pixels>) → BIGINT difference hash —
  * composes over [[DecodeGrayPx]]'s output so decode→hash stays one
  * codegen stage. NULL when the struct (or any field) is NULL or the
  * image is smaller than the 9×8 grid.
  */
case class DHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaOps.dhash64(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("dh")
      s"""
         |java.lang.Long $tmp = graft.functions.MediaOps.dhash64($c);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1L : $tmp.longValue();
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): DHash64 =
    copy(c)
  override def prettyName: String = "dhash64"
}

object MediaFrameFunctions {
  def frame_slices(c: Column, n: Int): Column =
    GraftBridge.column(FrameSlices(GraftBridge.expression(c), n))
  def decode_gray_px(c: Column): Column =
    GraftBridge.column(DecodeGrayPx(GraftBridge.expression(c)))
  def dhash64(c: Column): Column =
    GraftBridge.column(DHash64(GraftBridge.expression(c)))
}
