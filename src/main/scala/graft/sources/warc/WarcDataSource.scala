package graft.sources.warc

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual,
  StringContains, StringStartsWith, DataSourceRegister}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 batch connector for WARC web archives:
  * `spark.read.format("warc").load(dir)`.
  *
  * Spark-first design (SURVEY §7.3 preference (c)): the format plugs
  * into Catalyst through the connector API, so column pruning and
  * filter pushdown arrive from the optimizer for free —
  * `.explain("formatted")` shows `PushedFilters` / `ReadSchema`
  * exactly like the built-in parquet scan, and both REACH the byte
  * stream:
  *
  *  - pruning `payload` means record bodies are `skip`ped, never
  *    allocated (metadata-only crawl scans read header bytes only);
  *  - pushed header predicates (`warc_type`, `target_uri` prefix,
  *    `http_status`, `content_length` bounds) are evaluated after the
  *    header parse and BEFORE the body read, so rejected records skip
  *    their bodies too. Pushed filters are fully applied by the
  *    source (returned as both pushed and post-scan residual = none).
  *
  * Partition planning is one `InputPartition` per archive file —
  * `.warc.gz` members carry no mid-file sync marker, so the file is
  * the parallelism unit (Common Crawl's own fan-out shape: a 100 TB
  * crawl is ~90 k × ~1 GiB archives → ~90 k tasks, ideal granularity
  * for a 1000-executor cluster). Record iteration is strictly
  * streaming: peak memory = one content block.
  *
  * Options: `tolerant` (default false) — treat a truncated tail
  * record as end-of-file instead of failing the task (the S4
  * error-budget stance for mid-transfer crawl files).
  * `offsetRetain` (streaming only, default 0 = off) — compact the
  * seen-file offset to the N newest processed names plus a date
  * floor; see [[WarcMicroBatchStream]] for the retention-window
  * semantics.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcTable.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WarcTable(WarcTable.paths(properties),
      properties.getOrDefault("tolerant", "false").toBoolean,
      properties.getOrDefault("offsetRetain", "0").toInt)
}

object WarcTable {
  /** Header fields first, payload last — pruning away the payload is
    * the common (metadata-scan) case.
    */
  val Schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_index", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    // body-derived columns (requesting any of them reads the body):
    // charset = WHATWG-sniffed encoding of an HTTP payload; text =
    // WET-style extracted plain text (HTML boilerplate-stripped,
    // text/* decoded, else NULL)
    StructField("charset", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  /** Columns whose value needs the record body — excluded from
    * pushdown (pushed filters run BEFORE the body read) and any of
    * them forces the body read even with `payload` pruned away.
    */
  val BodyColumns: Set[String] = Set("payload", "charset", "text")

  /** `load(p)` lands in `path`; `load(p1, p2, …)` in `paths` as a
    * JSON string array (connector contract).
    */
  def paths(properties: JMap[String, String]): Seq[String] = {
    val multi = Option(properties.get("paths")).map { js =>
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readValue(js, classOf[Array[String]]).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(properties.get("path")).toSeq
    val all = multi ++ single
    require(all.nonEmpty, "warc source requires a path")
    all
  }
}

class WarcTable(paths: Seq[String], tolerant: Boolean,
    offsetRetain: Int = 0)
    extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, tolerant, offsetRetain)
}

class WarcScanBuilder(paths: Seq[String], tolerant: Boolean,
    offsetRetain: Int = 0)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = WarcTable.Schema
  private var pushed: Array[Filter] = Array.empty

  /** A filter is pushable iff it references header fields only —
    * everything but the body-derived columns is known before the
    * body read.
    */
  private def pushable(f: Filter): Boolean =
    f.references.nonEmpty &&
      f.references.forall(r => !WarcTable.BodyColumns(r)) && (f match {
      case _: EqualTo | _: In | _: IsNotNull | _: StringStartsWith |
           _: StringContains | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual => true
      case _ => false
    })

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(pushable)
    pushed = sup
    unsup // residual the engine must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new WarcScan(paths, required, pushed, tolerant, offsetRetain)
}

class WarcScan(
    paths: Seq[String],
    required: StructType,
    filters: Array[Filter],
    tolerant: Boolean,
    offsetRetain: Int = 0) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required, filters, tolerant,
      hadoopConf, offsetRetain)
  override def description(): String =
    s"WarcScan PushedFilters: ${filters.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${required.catalogString}"

  /** Session Hadoop conf captured at PLAN time (spark.hadoop.* —
    * object-store credentials, endpoints) and shipped to readers; a
    * bare `new Configuration()` would silently drop any FS
    * configured through the Spark session.
    */
  private val hadoopConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  /** Driver-side listing through the Hadoop FS API (works for
    * file://, hdfs://, object stores with a connector on the
    * classpath). Directories expand one level; hidden files skipped.
    * One partition per file — see class doc for why.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = hadoopConf.value
    val files = paths.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      val st = fs.getFileStatus(hp)
      if (st.isDirectory)
        fs.listStatus(hp).toSeq.filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString)
      else Seq(st.getPath.toString)
    }.sorted
    files.map(f => WarcInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters, tolerant, hadoopConf)
}

case class WarcInputPartition(file: String) extends InputPartition

class WarcReaderFactory(
    required: StructType,
    filters: Array[Filter],
    tolerant: Boolean,
    hadoopConf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      p.asInstanceOf[WarcInputPartition].file, required, filters, tolerant,
      hadoopConf)
}

class WarcPartitionReader(
    file: String,
    required: StructType,
    filters: Array[Filter],
    tolerant: Boolean,
    hadoopConf: SerializableConfiguration) extends PartitionReader[InternalRow] {

  private val wantPayload =
    required.fieldNames.exists(WarcTable.BodyColumns)

  private def field(r: Warc.Record, name: String): Any = name match {
    case "file" => r.file
    case "record_index" => r.recordIndex
    case "warc_type" => r.warcType
    case "record_id" => r.recordId
    case "target_uri" => if (r.targetUri.isEmpty) null else r.targetUri
    case "warc_date" => r.date
    case "content_type" => r.contentType
    case "content_length" => r.contentLength
    case "http_status" => r.httpStatus.orNull
    case "http_content_type" => r.httpContentType.orNull
    case "charset" =>
      if (r.payload == null || r.httpStatus.isEmpty) null
      else Warc.detectCharset(r.httpContentType, r.payload)
    case "text" => Warc.payloadText(r.httpContentType, r.payload)
    case "payload" => r.payload
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Number) => java.lang.Long.compare(x, y.longValue)
    case (x: Int, y: Number) => java.lang.Long.compare(x.toLong, y.longValue)
    case (x: String, y: Any) =>
      // pushed filters are removed from post-scan evaluation, so the
      // order here MUST be Spark's own (UTF-8 binary): Java
      // String.compareTo diverges on supplementary-plane chars
      UTF8String.fromString(x)
        .compareTo(UTF8String.fromString(String.valueOf(y)))
    case _ => throw new IllegalArgumentException(s"uncomparable: $a vs $b")
  }

  private def eval(f: Filter, r: Warc.Record): Boolean = f match {
    case IsNotNull(a) => field(r, a) != null
    case EqualTo(a, v) =>
      val x = field(r, a); x != null && cmp(x, v) == 0
    case In(a, vs) =>
      val x = field(r, a); x != null && vs.exists(v => cmp(x, v) == 0)
    case GreaterThan(a, v) =>
      val x = field(r, a); x != null && cmp(x, v) > 0
    case GreaterThanOrEqual(a, v) =>
      val x = field(r, a); x != null && cmp(x, v) >= 0
    case LessThan(a, v) =>
      val x = field(r, a); x != null && cmp(x, v) < 0
    case LessThanOrEqual(a, v) =>
      val x = field(r, a); x != null && cmp(x, v) <= 0
    case StringStartsWith(a, p) =>
      val x = field(r, a); x != null && x.asInstanceOf[String].startsWith(p)
    case StringContains(a, p) =>
      val x = field(r, a); x != null && x.asInstanceOf[String].contains(p)
    case _ => true
  }

  private val stream = {
    val hp = new HPath(file)
    hp.getFileSystem(hadoopConf.value).open(hp)
  }
  private val it = Warc.records(stream, file, wantPayload, tolerant,
    r => filters.forall(eval(_, r)))
  private var current: Warc.Record = _

  override def next(): Boolean = {
    if (it.hasNext) { current = it.next(); true } else false
  }

  override def get(): InternalRow = {
    val vals = required.fields.map { f =>
      field(current, f.name) match {
        case null => null
        case s: String => UTF8String.fromString(s)
        case x => x
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = stream.close()
}
