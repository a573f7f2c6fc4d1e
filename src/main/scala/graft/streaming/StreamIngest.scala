package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.io.SnapshotStore

/** Streaming ingestion into a [[SnapshotStore]] with end-to-end
  * exactly-once semantics — the streaming analog of the reference's
  * at-least-once queue consumption with redelivery
  * (`azure_service.py:65`, `main.py:396-397`): Structured Streaming's
  * `foreachBatch` re-invokes a failed epoch with the SAME `batchId`, and
  * the sink turns that at-least-once delivery into exactly-once by
  * recording the `(appId, batchId)` high-water mark inside the one
  * manifest commit that also publishes the data
  * ([[SnapshotStore.appendExactlyOnce]]) — a replayed epoch is a no-op,
  * never a duplicate snapshot. The mark is carried forward through
  * compaction and upsert, so table maintenance can't resurrect a replay.
  *
  * At 100 TB this is the micro-batch landing path: each epoch appends one
  * snapshot (executors write data files, ONE driver-side rename commits),
  * downstream batch consumers follow with [[SnapshotStore.readRange]]
  * incremental scans keyed by the snapshot ids the commits allocate.
  */
object StreamIngest {

  /** Configure (not start) the writer; callers add trigger/checkpoint and
    * `.start()`. `statsCol` flows into the manifest min/max stats so the
    * landed snapshots stay prunable. */
  def writer(
      stream: DataFrame,
      store: SnapshotStore,
      appId: String,
      statsCol: Option[String] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the batch is consumed by exactly one job (the parquet write);
        // manifest stats are read back from the LANDED files, so the
        // stream lineage is never recomputed
        store.appendExactlyOnce(batch, appId, batchId, statsCol); ()
      }

  /** Convenience: start with a processing-time trigger and checkpoint. */
  def start(
      stream: DataFrame,
      store: SnapshotStore,
      appId: String,
      checkpointDir: String,
      statsCol: Option[String] = None) =
    writer(stream, store, appId, statsCol)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(0L))
      .start()
}
