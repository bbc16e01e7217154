package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batches per partition.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (byte-level statistics standing in for pixel
  * decoding — clearly marked below). Everything around it is the real
  * Spark-side design: binary payload + metadata struct schema, batched
  * per-partition processing via mapPartitions over a typed Dataset (the
  * Scala analogue of mapInPandas: one iterator pass, no per-row UDF
  * overhead, constant memory), and feature columns that flow back into
  * ordinary relational ops. At 100 TB the same plan holds: decode is
  * map-side only, no shuffle until the final small aggregate.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int,
                      height: Int, format: String)
  case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
                           frames: Int, thumb_hash: Long)

  /** STUB decode: byte statistics in place of a real image decode.
    * A production build swaps this body for an actual codec; the
    * signature (batch iterator -> batch iterator) is the real contract. */
  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.payload.length) { sum += r.payload(i) & 0xFF; i += 1 }
      // "frame sampling": one frame per 64-byte block, as a stand-in
      val frames = math.max(1, r.payload.length / 64)
      // "thumbnail": polynomial hash of the first 32 bytes
      var h = 1469598103934665603L
      i = 0
      while (i < math.min(32, r.payload.length)) {
        h = (h ^ (r.payload(i) & 0xFF)) * 1099511628211L
        i += 1
      }
      MediaFeatures(r.doc_id, r.payload.length,
        if (r.payload.length == 0) 0.0 else sum.toDouble / r.payload.length,
        frames, h)
    }

  /** Build the media table (payload = utf8 bytes of the text standing in
    * for an encoded image), run the batched decode, aggregate features. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 640).cast("int").as("width"),
        lit(480).as("height"),
        lit("fake/raw").as("format"))
      .as[MediaRow]
    media
      .mapPartitions(decodeBatch)
      .toDF()
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("mean_byte"), 4).as("avg_mean_byte"),
        sum("frames").as("total_frames"),
        countDistinct("thumb_hash").as("distinct_thumbs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (mediaFeatures _))

  /** Oracle covers the REAL plumbing invariants (payload sizes, frame
    * count arithmetic, batch cardinality); mean_byte/thumb_hash are
    * stub-internal but mean_byte is byte arithmetic DuckDB can replay
    * over the same utf8 bytes. */
  val oracles: Map[String, String] = Map(
    "media_features" ->
      """WITH m AS (
           SELECT doc_id,
             octet_length(CAST(text AS BLOB)) AS n_bytes,
             greatest(1, octet_length(CAST(text AS BLOB)) // 64) AS frames,
             list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
               / CAST(length(text) AS DOUBLE) AS mean_byte,
             substr(text, 1, 32) AS thumb_src
           FROM documents)
         SELECT count(*) AS n_media,
           sum(n_bytes) AS total_bytes,
           round(avg(mean_byte), 4) AS avg_mean_byte,
           sum(frames) AS total_frames,
           count(DISTINCT thumb_src) AS distinct_thumbs
         FROM m""")
}
