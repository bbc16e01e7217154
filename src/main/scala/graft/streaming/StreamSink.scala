package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Exactly-once-shaped file egress for streaming pipelines — the sink
  * side of the streaming surface (sources/round-trips cover ingest).
  *
  * Structured Streaming's contract: a failed micro-batch is REPLAYED
  * with the SAME batchId. The sink is exactly-once iff reprocessing a
  * batchId is idempotent. For file egress the standard pattern is
  * batchId-keyed partition overwrite: each batch lands in its own
  * `batch=<id>` directory with mode overwrite, so a replay rewrites
  * the same directory instead of appending duplicates. Downstream
  * readers see the union of committed directories — at 100 TB this is
  * exactly how warehouse ingestion lands micro-batches (per-batch
  * directories + a compaction job owned by the table maintenance
  * layer, not the stream).
  */
object StreamSink {

  /** The idempotent per-batch writer, exposed for direct testing: the
    * replay of a batchId overwrites its own directory — no dup rows. */
  def writeBatch(base: String)(df: DataFrame, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$base/batch=$batchId")

  /** Wire a streaming Dataset to the idempotent parquet sink. */
  def parquetSink[T](ds: Dataset[T], base: String): DataStreamWriter[T] =
    ds.writeStream.foreachBatch {
      (batch: Dataset[T], batchId: Long) =>
        writeBatch(base)(batch.toDF(), batchId)
    }
}
