package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loader for the driver-generated test data.
  *
  * Tables (TESTDATA.md): region nation customer supplier part orders
  * lineitem events documents embeddings — one parquet file each under
  * the scale-factor directory.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` has shipped in three parquet encodings across driver data
    * regenerations: TIMESTAMP(NANOS) (reads as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set in Verify/Bench
    * session builders), micros with `isAdjustedToUTC=false` (reads as
    * TIMESTAMP_NTZ in Spark 4), and plain UTC micros (TimestampType).
    * Normalize ALL of them to TimestampType so downstream `unix_micros`
    * consumers see one type. The NTZ→LTZ cast is exact under the pinned
    * UTC session zone, and parity-safe: DuckDB reads the same naive
    * micros for the oracle.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
