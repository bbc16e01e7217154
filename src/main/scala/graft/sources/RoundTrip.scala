package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.util.Tables

/** Source/sink coverage proof: the documents table round-tripped
  * through JSON lines and ORC (parquet is the driver's native format
  * and rides along as the control row).
  *
  * The check is a content CHECKSUM, not a row count: per row,
  * md5-lower-64 of "doc_id|text" (assembled to match DuckDB's
  * `md5_number_lower` exactly — see Dedup.simhashRel), XOR-folded
  * across the table and masked to 63 bits so both engines agree on
  * signedness. Any lost row, reordered byte, or mangled character
  * flips the checksum, so the DuckDB oracle (which reads only the
  * original parquet) certifies every format's round-trip losslessly.
  */
object RoundTrip {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // CSV cannot natively distinguish an empty string from NULL on read
  // (both parse back as null), so empties are tagged with a sentinel the
  // reader maps back. \u0001 delimiters keep it out of any plausible text.
  private val EmptySentinel = "\u0001EMPTY\u0001"

  private def checksummed(df: DataFrame, format: String): DataFrame =
    df
      .withColumn("hx",
        md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))))
      // masked-63-bit parity hash; XOR of masked values equals the
      // oracle's masked XOR since bit 63 is dropped either way
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("checksum"))
      .select(lit(format).as("format"), col("n_docs"), col("checksum"))

  /** One row per format (json, orc, parquet) with identical
    * (n_docs, checksum) iff the round-trips are lossless. */
  def roundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val fp = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(
      new java.io.File(d).getCanonicalPath))
    val base = new java.io.File(s"target/roundtrip_$fp").getAbsolutePath
    docs.write.mode("overwrite").json(s"$base/json")
    docs.write.mode("overwrite").orc(s"$base/orc")
    // CSV needs explicit quote/escape discipline to stay lossless on
    // free text (quotes inside quoted fields escaped by doubling — the
    // RFC 4180 convention both the writer and reader are pinned to)
    // emptyValue tags empty strings so the reader can tell "" from
    // NULL (Spark's CSV default reads both back as null, which would
    // null the md5 concat and silently drop the doc from the checksum)
    // write-side trimming is ON by default and strips leading/trailing
    // chars <= ' ' from unquoted fields — lossy for padded text (and it
    // would eat the sentinel's \u0001 delimiters); read side defaults
    // to no trimming, so disabling the writer makes both sides exact
    docs.write.mode("overwrite")
      .option("quote", "\"").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("emptyValue", EmptySentinel)
      .csv(s"$base/csv")
    val viaJson = s.read.schema(docSchema).json(s"$base/json")
    val viaOrc = s.read.orc(s"$base/orc")
    // multiLine: quoted fields may carry embedded newlines; without it
    // the reader splits records mid-field. multiLine disables record
    // splitting, so each file parses as one unit — fine at this
    // certification scale; a 100 TB CSV ingest would pre-escape \n.
    val viaCsv = s.read.schema(docSchema)
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(s"$base/csv")
      .withColumn("text",
        when(col("text") === EmptySentinel, lit(""))
          .otherwise(col("text")))
    checksummed(viaJson, "json")
      .union(checksummed(viaOrc, "orc"))
      .union(checksummed(viaCsv, "csv"))
      .union(checksummed(docs, "parquet"))
      .orderBy("format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("sources_roundtrip" -> (roundTrip _))

  val oracles: Map[String, String] = Map(
    "sources_roundtrip" ->
      """WITH c AS (
           SELECT count(*) AS n_docs,
             CAST(bit_xor(md5_number_lower(
               CAST(doc_id AS VARCHAR) || '|' || text))
               & 9223372036854775807 AS BIGINT) AS checksum
           FROM documents)
         SELECT f.format, c.n_docs, c.checksum
         FROM c CROSS JOIN (VALUES ('csv'), ('json'), ('orc'), ('parquet'))
           f(format)
         ORDER BY f.format""")
}
