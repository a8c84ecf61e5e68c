package graft.operators

import org.apache.spark.sql.DataFrame

/** One CDC feed, many artifacts: fan a micro-batch out to several
  * idempotent index sinks ([[DedupIndex.cdcSink]],
  * [[Bm25Index.cdcSink]], [[LmIndex.cdcSink]], [[AnnIndex.cdcSink]],
  * [[MergeOnRead.foreachBatchSink]] — anything with a per-batch-id
  * skip) from a single Structured Streaming `foreachBatch`.
  *
  * The composition provides NO cross-artifact atomicity — each
  * artifact commits independently — and doesn't need it: every sink
  * is exactly-once against its OWN watermark, so a crash between
  * sinks followed by the at-least-once replay re-applies the batch
  * only to the artifacts that missed it. The fleet of artifacts
  * CONVERGES to the sequential fold of the feed; the only observable
  * anomaly is bounded staleness of the crashed-past artifacts until
  * the replay lands, which is the same anomaly an independent
  * per-artifact stream would show.
  *
  * The batch is localCheckpointed once so N artifacts don't re-run
  * the upstream micro-batch plan N times.
  *
  * Reference grounding: the reference maintains several annotator
  * datasets from one update signal, each swapped independently
  * (directory/directory.go:230-240); this is that shape for index
  * maintenance.
  */
object IndexPipeline {

  /** `writeStream.foreachBatch(IndexPipeline.sink(a, b, c))`. */
  def sink(sinks: ((DataFrame, Long) => Unit)*)
      : (DataFrame, Long) => Unit =
    (df, id) => {
      val batch = df.localCheckpoint(false)
      sinks.foreach(s => s(batch, id))
    }
}
