package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Executable SQL entry point: the reference dialect, including the one
  * DDL statement the reference registers that plain rewriting cannot
  * express — `CREATE INDEX <name> ON <table> USING TRTREE(<boxcol>)`
  * (ref src/index/rtree_module.cpp:432-441).
  *
  * Spark has no rowid-fetch index; the semantic equivalent of the MEOS
  * R-tree is a WRITE-TIME LAYOUT: the table is materialized
  * range-clustered on the box column's leading (x, t) coordinates, so
  * parquet row-group min/max statistics on the flattened box fields
  * become tight, and the natural `boxcol && const` predicates — which
  * [[graft.plans.BoxPredicateRule]] rewrites into sargable min/max
  * conjuncts — prune at the scan exactly where the reference's optimizer
  * swaps in an R-tree index scan (ref rtree_optimize_scan.cpp:20-147).
  * The view name is re-bound to the clustered layout, so subsequent
  * queries through it accelerate with no further rewriting.
  */
object MobSql {

  private val buildSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private val createIndexRe =
    """(?is)^\s*CREATE\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s+USING\s+TRTREE\s*\(\s*(\w+)\s*\)\s*;?\s*$""".r

  /** Run one statement of the reference dialect. */
  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case createIndexRe(idxName, table, boxCol) =>
      createTrtreeLayout(spark, idxName, table, boxCol)
      spark.emptyDataFrame // DDL yields no rows, like the reference
    case other =>
      spark.sql(SqlRewriter.rewrite(other))
  }

  private def createTrtreeLayout(spark: SparkSession, idxName: String,
                                 table: String, boxCol: String): Unit = {
    val df = spark.table(table)
    val st = df.schema(boxCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // leading cluster keys: spatial min if the box has one, then time
    val keys = Seq("xmin", "tmin", "lower")
      .filter(st.fieldNames.contains)
      .map(f => col(s"$boxCol.$f"))
    require(keys.nonEmpty, s"$boxCol has no box/span min fields to cluster on")
    // fresh path per build: a re-issued CREATE INDEX would otherwise read
    // and overwrite the same parquet dir the view is bound to, which
    // Spark rejects ("Cannot overwrite a path that is also being read
    // from") — monotone suffix makes the statement idempotent
    val dir = new java.io.File(
      s"target/trtree_${table}_${idxName}_${buildSeq.incrementAndGet()}")
      .getAbsolutePath
    df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView(table)
  }
}
