package graft.sources.warc

import java.util.concurrent.atomic.AtomicReference

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
  * sorted JSON — arrival order is irrelevant (crawl uploads finish
  * out of lexicographic order), restart-safe via the stream
  * checkpoint, and exactly-once by construction: a batch is the set
  * difference of the two offsets' covered sets, so a file is planned
  * in precisely one batch. Archives are immutable once written (the
  * WARC convention), so no file-modification tracking is needed.
  *
  * Scale note — offset COMPACTION (`offsetRetain`): the explicit set
  * grows with the file count, like Spark's own FileStreamSource
  * seen-map. At crawl scale (~90 k archives) that is a few MB of
  * checkpoint state; over months of incremental crawls it is
  * unbounded. With `offsetRetain = N > 0` the offset keeps only the
  * N greatest processed names explicit and summarizes everything
  * older under a `floor` watermark: a name ≤ floor is processed by
  * definition. The floor only ever advances in `commit()` — over
  * files a completed batch has durably processed — so no pending
  * file can be folded under it.
  *
  * IMPORTANT — the retention window is a file COUNT, not a time
  * window: after each committed batch the floor rises to the
  * (offsetRetain+1)-th greatest processed NAME, regardless of how
  * recent that name's date prefix is. The documented tradeoff
  * (analogous to FileStreamSource's `maxFileAge`, but counted in
  * files): a LATE arrival whose name sorts below the floor is
  * treated as already processed and skipped. Size `offsetRetain`
  * strictly above the maximum number of files the upload pipeline
  * can deliver out of name order across ONE commit interval — with
  * frequent small batches that bound is what matters, not wall-clock
  * lateness. Crawl archives are date-prefixed (lexicographic name
  * order IS archive-date order), so `offsetRetain ≥ files-per-day ×
  * max-late-days` gives the date-window reading of the same knob.
  */
class WarcMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    filters: Array[Filter],
    tolerant: Boolean,
    hadoopConf: SerializableConfiguration,
    offsetRetain: Int = 0) extends MicroBatchStream {

  /** Greatest floor this stream instance knows to be safe — advanced
    * at `commit()` (batch durably done) and seeded from any offset
    * Spark hands back from the durable log (`deserializeOffset`), so
    * a restart resumes compaction without re-deriving it.
    */
  private val knownFloor = new AtomicReference[Option[String]](None)

  private def raiseFloor(candidate: Option[String]): Unit =
    knownFloor.updateAndGet { cur =>
      (cur.toSeq ++ candidate.toSeq).maxOption
    }

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

  override def latestOffset(): Offset = {
    val floor = knownFloor.get()
    WarcOffset(listNow().filterNot(f => floor.exists(f <= _)), floor)
  }

  override def deserializeOffset(json: String): Offset = {
    val o = WarcOffset.fromJson(json)
    // anything Spark replays from the offset log was durably written
    // after its files were planned — its floor is proven safe
    raiseFloor(o.floor)
    o
  }

  /** Batch `end` is durably processed: every name `end` covers may
    * now compact. Keep the `offsetRetain` greatest names explicit and
    * advance the floor to the greatest name being folded.
    */
  override def commit(end: Offset): Unit =
    if (offsetRetain > 0) {
      val o = end.asInstanceOf[WarcOffset]
      val sorted = o.files.sorted
      if (sorted.length > offsetRetain)
        raiseFloor(Some(sorted(sorted.length - offsetRetain - 1)))
    }

  override def stop(): Unit = ()

  override def planInputPartitions(
      start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[WarcOffset]
    end.asInstanceOf[WarcOffset].files
      .filterNot(s.covers)
      .map(f => WarcInputPartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, filters, tolerant, hadoopConf)
}

/** Processed-set offset: covered = `{f : f <= floor} ∪ files`.
  * `floor = None` (the default, and the only shape ever produced
  * with compaction off) serializes to the bare sorted JSON array of
  * the pre-compaction format, so existing checkpoints read and
  * re-write unchanged; a set floor serializes to
  * `{"floor": ..., "files": [...]}` and both shapes parse.
  */
case class WarcOffset(files: Seq[String],
    floor: Option[String] = None) extends Offset {

  // covers() is called once per end-offset file during
  // planInputPartitions — at crawl scale (~90k archives) a Seq
  // membership walk would be O(|end|×|start|) string compares per
  // micro-batch plan; the set makes the whole plan O(|end|)
  @transient private lazy val fileSet: Set[String] = files.toSet

  def covers(f: String): Boolean =
    floor.exists(f <= _) || fileSet(f)

  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    floor match {
      case None => m.writeValueAsString(files.sorted.toArray)
      case Some(fl) =>
        val node = m.createObjectNode()
        node.put("floor", fl)
        node.set[com.fasterxml.jackson.databind.node.ArrayNode]("files",
          m.valueToTree(files.sorted.toArray))
        m.writeValueAsString(node)
    }
  }
}

object WarcOffset {
  def fromJson(json: String): WarcOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(json)
    if (node.isArray)
      WarcOffset(m.convertValue(node, classOf[Array[String]]).toSeq)
    else
      WarcOffset(
        m.convertValue(node.get("files"), classOf[Array[String]]).toSeq,
        Option(node.get("floor")).filterNot(_.isNull).map(_.asText()))
  }
}
