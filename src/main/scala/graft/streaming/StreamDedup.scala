package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest deduplication — the streaming counterpart of
  * operators.Dedup.exact for a documents-shaped stream.
  *
  * Scale design: state is the content hash ONLY (16 bytes per distinct
  * doc, not the document), partitioned by hash across executors — the
  * same layout the batch hash-groupBy shuffles to. The watermark bounds
  * state: a duplicate arriving later than the horizon is passed through
  * rather than growing state forever, which is the standard
  * at-scale trade (exact within the horizon, windowed beyond it).
  */
object StreamDedup {

  /** Drop rows whose normalized-text md5 was already seen within the
    * watermark horizon. Input needs columns (doc_id, ts, text). */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("h", md5(lower(trim(col("text")))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("h")
}
