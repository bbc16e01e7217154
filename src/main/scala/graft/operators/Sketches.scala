package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Distributed cardinality sketching with an ENGINE-IDENTICAL
  * estimate — the determinism HLL implementations can't offer across
  * engines (Spark's datasketches HLL and DuckDB's approx_count_distinct
  * use different register layouts, so their estimates never hash-match).
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every element,
  * keep the k smallest distinct hashes; if the k-th smallest is h_k on
  * a hash space of size M, the distinct count is ~ (k-1) * M / h_k.
  * With the md5-lower-64 parity hash (same value in DuckDB via
  * md5_number_lower, masked to the positive 63-bit range) and double
  * division quantized by round(), both engines compute the identical
  * estimate — so the APPROXIMATE sketch gets an EXACT oracle.
  *
  * Scale shape: the sketch is a scan + per-partition top-k merged as a
  * TakeOrdered (k rows cross the wire per partition, no full shuffle of
  * distinct values); the k-row tail and the exact count (kept here only
  * to report the realized error) meet in a 1x1 cross join. At 100 TB
  * the exact branch is dropped and the sketch alone answers the
  * cardinality question in one pass; sketches for different columns or
  * partitions union-merge by re-taking the k smallest of the union —
  * associative, so it parallelizes like any partial aggregate.
  */
object Sketches {

  private val K = 256

  /** KMV estimate of distinct (l_partkey, l_suppkey) pairs in lineitem
    * vs the exact count, with realized relative error. */
  def kmv(s: SparkSession, d: String): DataFrame = {
    // The hash-distinct set is persisted: the k-tail and the exact
    // count are two tiny consumers of one computation, not two corpus
    // scans ([[graft.util.Md5Lower64]] holds the single-conv parity
    // assembly — the per-byte fold was the profile's hot spot).
    val hashed = Tables.lineitem(s, d)
      .select(md5(concat(col("l_partkey").cast("string"), lit("|"),
        col("l_suppkey").cast("string"))).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select("h").distinct()
      .persist()
    val tail = hashed.orderBy("h").limit(K)
      .agg(max("h").as("kth_hash"), count(lit(1)).as("n_min"))
    val exact = hashed.agg(count(lit(1)).as("exact_distinct"))
    exact.crossJoin(tail)
      .withColumn("kmv_estimate",
        when(col("exact_distinct") <= K, col("exact_distinct"))
          .otherwise(round(lit((K - 1).toDouble) * lit(9.223372036854775808e18)
            / col("kth_hash").cast("double")).cast("bigint")))
      .select(
        col("exact_distinct"), lit(K).as("k"), col("kth_hash"),
        col("kmv_estimate"),
        round(lit(100.0) * (col("kmv_estimate") - col("exact_distinct"))
          / col("exact_distinct"), 2).as("rel_err_pct"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv" -> (kmv _))

  val oracles: Map[String, String] = Map(
    "sketch_kmv" ->
      """WITH h AS (
           SELECT DISTINCT CAST(md5_number_lower(
             CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))
             & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         kth AS (SELECT max(h) AS kth_hash, count(*) AS n_min
                 FROM (SELECT h FROM h ORDER BY h LIMIT 256)),
         ex AS (SELECT count(*) AS exact_distinct FROM h),
         est AS (
           SELECT ex.exact_distinct, 256 AS k, kth.kth_hash,
             CASE WHEN ex.exact_distinct <= 256 THEN ex.exact_distinct
               ELSE CAST(round(255.0 * 9223372036854775808.0
                 / CAST(kth.kth_hash AS DOUBLE)) AS BIGINT) END
               AS kmv_estimate
           FROM ex CROSS JOIN kth)
         SELECT exact_distinct, k, kth_hash, kmv_estimate,
           round(100.0 * (kmv_estimate - exact_distinct) / exact_distinct, 2)
             AS rel_err_pct
         FROM est""")
}
