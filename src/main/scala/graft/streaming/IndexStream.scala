package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.corpus.SourceFile
import graft.index.{IndexBuilder, InvertedIndex}

/** Streaming index ingest: each micro-batch becomes one appended EPOCH
  * of the inverted index (the Iceberg-snapshot analog of the north
  * star — "docIDs assigned per snapshot"): contiguous docId ranges per
  * batch, per-epoch posting lists with avgdl-safe block-max bounds,
  * global termstats refreshed per commit.
  *
  * Exactly-once: the epoch payload fingerprint is the micro-batch id;
  * IndexBuilder.appendStages records committed fingerprints in
  * meta.props, so a batch replayed after a crash between the index
  * commit and the stream checkpoint is a structural no-op, and a batch
  * that died mid-append resumes from its last completed stage.
  */
object IndexStream {

  /** Start appending every micro-batch of `files` to the index at
    * `dir` (which must already hold a base build — possibly of zero
    * epochs' worth of appends).
    *
    * With `lambdaDir` set (a λ pipeline already built over the base via
    * LambdaPipeline.build), each committed micro-batch also extends the
    * λ table through the frozen-graph incremental path
    * (LambdaPipeline.appendEpochs) — O(batch docs) per commit, so the
    * stream keeps BOTH the inverted index and the λ re-ranking signal
    * continuously blended-searchable. Exactly-once carries over: the
    * per-epoch λ stage fingerprints chain the epoch payload
    * fingerprints, so a replayed batch no-ops on the λ side too.
    */
  def start(spark: SparkSession, files: Dataset[SourceFile], dir: String,
      params: IndexBuilder.Params, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      lambdaDir: Option[String] = None): StreamingQuery = {
    // one λ handle for the life of the query: the frozen CSR broadcast /
    // vocab / graph props are per-handle lazy state, so each micro-batch
    // pays O(batch docs), not O(graph) driver work + a new broadcast
    val liCache =
      new java.util.concurrent.atomic.AtomicReference[graft.lambda.LambdaIndex]()
    files.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[SourceFile], batchId: Long) =>
        if (!batch.isEmpty) {
          val idx = IndexBuilder.append(spark, batch, dir,
            appendFp = s"stream-batch:$batchId", params)
          lambdaDir.foreach { ld =>
            liCache.set(graft.lambda.LambdaPipeline.appendEpochs(
              spark, idx, ld, Option(liCache.get())))
          }
        }
        ()
      }
      .start()
  }

  /** Convenience: current queryable handle over the ingested index. */
  def index(spark: SparkSession, dir: String): InvertedIndex =
    new InvertedIndex(spark, dir)
}
