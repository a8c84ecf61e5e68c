package graft.sources.warc

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Streaming side of the WARC source: `spark.readStream.format("warc")
  * .load(dir)` — the crawl drop-folder pattern (new `.warc.gz`
  * archives land in a bucket; each micro-batch processes exactly the
  * newly arrived files).
  *
  * Offsets are the SET of file names already processed, serialized as
  * a sorted JSON array — arrival order is irrelevant (crawl uploads
  * finish out of lexicographic order), restart-safe via the stream
  * checkpoint, and exactly-once by construction: a batch is the set
  * difference `end.files -- start.files`, so a file is planned in
  * precisely one batch. Archives are immutable once written (the WARC
  * convention), so no file-modification tracking is needed.
  *
  * Scale note: the offset grows with the file count, like Spark's own
  * FileStreamSource seen-map. At crawl scale (~90 k archives) that is
  * a few MB of checkpoint state; beyond that, production compacts by
  * date prefix — the partition-pruned directory layout the Catalog
  * module already models (S1).
  */
class WarcMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    filters: Array[Filter],
    tolerant: Boolean,
    hadoopConf: SerializableConfiguration) extends MicroBatchStream {

  private def listNow(): Seq[String] = {
    val conf = hadoopConf.value
    paths.flatMap { p =>
      val hp = new HPath(p)
      val fs = hp.getFileSystem(conf)
      if (!fs.exists(hp)) Seq.empty
      else {
        val st = fs.getFileStatus(hp)
        if (st.isDirectory)
          fs.listStatus(hp).toSeq.filter(s => s.isFile &&
            !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
            .map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }.sorted
  }

  override def initialOffset(): Offset = WarcOffset(Seq.empty)
  override def latestOffset(): Offset = WarcOffset(listNow())
  override def deserializeOffset(json: String): Offset =
    WarcOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcOffset].files.toSet
    end.asInstanceOf[WarcOffset].files
      .filterNot(seen)
      .map(f => WarcInputPartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters, tolerant, hadoopConf)
}

case class WarcOffset(files: Seq[String]) extends Offset {
  override def json(): String =
    new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(files.sorted.toArray)
}

object WarcOffset {
  def fromJson(json: String): WarcOffset =
    WarcOffset(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(json, classOf[Array[String]]).toSeq)
}
