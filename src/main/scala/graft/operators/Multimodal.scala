package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `BINARY` with
  * typed metadata, plus decode / feature-extract / frame-sample
  * stages.
  *
  * The Spark-side plumbing — schema, format sniffing, partition-
  * friendly batched decode shape, output contracts — is real and
  * tested. The actual media decoding is STUBBED with a deterministic
  * fake (this container ships no image/audio codecs): every
  * `*Stub` function documents exactly what a production decoder
  * replaces.
  */
object Multimodal {

  /** Canonical media row schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Magic-byte format sniffing over the first bytes — pure built-ins
    * (hex compare), runs in the scan stage.
    */
  def detectFormat(media: Column): Column = {
    val head8 = lower(hex(substring(media, 1, 8)))
    when(head8.startsWith("ffd8ff"), "jpeg")
      .when(head8.startsWith("89504e47"), "png")
      .when(head8.startsWith("474946"), "gif")
      .when(head8.startsWith("52494646"), "riff")
      .when(substring(head8, 9, 8) === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Attach sniffed metadata to raw (media_id, media) rows. Width /
    * height / duration are parsed straight from the container header
    * ([[graft.functions.MediaOps]] — PNG IHDR, GIF screen size, JPEG
    * SOFn, WAV byte-rate); NULL when the container is unrecognized.
    * Pixel/sample decode stays stubbed ([[fakeDecodeFeatures]]) —
    * header geometry needs no codec.
    */
  def withMeta(df: DataFrame, mediaCol: String = "media"): DataFrame =
    df.withColumn("__dims",
        graft.functions.MediaDims.media_dims(col(mediaCol)))
      .withColumn("meta", struct(
        detectFormat(col(mediaCol)).as("format"),
        length(col(mediaCol)).cast(LongType).as("n_bytes"),
        col("__dims.width").as("width"),
        col("__dims.height").as("height"),
        col("__dims.duration_ms").as("duration_ms")))
      .drop("__dims")

  /** Feature extraction with the production batch shape: partition-
    * local iteration, one float vector per row, fixed dimension.
    *
    * STUB: the "features" are a 16-bin byte histogram (deterministic
    * fake). A real implementation replaces `fakeDecodeFeatures` with
    * a codec + model call batched per partition — the mapPartitions
    * shape (amortized per-partition model init, streaming iterator,
    * no driver collect) is exactly what a GPU/codec UDF needs.
    */
  def extractFeatures(df: DataFrame, mediaCol: String = "media",
      idCol: String = "media_id", dim: Int = 16): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idPos = df.columns.indexOf(idCol)
    val mediaPos = df.columns.indexOf(mediaCol)
    require(idPos >= 0 && mediaPos >= 0)
    df.mapPartitions { it =>
      // production: initialize decoder/model ONCE per partition here
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaPos)
        Row(r.getLong(idPos),
          if (bytes == null) null else fakeDecodeFeatures(bytes, dim))
      }
    }
  }

  /** STUB decoder: normalized 16-bin histogram of byte values.
    * Replace with real image decode + embedding model.
    */
  private[operators] def fakeDecodeFeatures(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    val hist = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) * dim / 256) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    hist.map(_ / n)
  }

  /** Frame sampling with the production output contract: one row per
    * (media_id, frame_idx) with a binary frame payload.
    *
    * STUB: "frames" are n equal byte slices of the container.
    * A real implementation demuxes keyframes; the explode shape,
    * ordering column and payload type are the engine contract.
    */
  def sampleFramesStub(df: DataFrame, n: Int,
      mediaCol: String = "media", idCol: String = "media_id"): DataFrame = {
    val sliceLen = greatest(floor(length(col(mediaCol)) / n).cast("int"),
      lit(1))
    df.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(n - 1)),
        i => substring(col(mediaCol), (i * sliceLen + 1).cast("int"),
          sliceLen))))
      .select(col(idCol), col("pos").as("frame_idx"),
        col("col").as("frame"))
      .filter(length(col("frame")) > 0)
  }
}
