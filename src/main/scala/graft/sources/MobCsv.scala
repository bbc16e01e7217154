package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}

/** CSV ingest for mobility data — the engine's analogue of loading the
  * reference's types from text files (its workloads arrive as CSV whose
  * columns hold temporal/spatial literals like
  * `[Point(1 1)@2000-01-01, ...]`).
  *
  * Spark's CSV reader handles the file format (splittable scan,
  * schema-on-read, pushdown of simple predicates); the mobility columns
  * come in as strings and are materialized into the engine's struct
  * encodings by the same SQL constructors queries use — so a CSV-loaded
  * table and a parquet-loaded one are indistinguishable downstream.
  */
object MobCsv {

  /** Read a headered CSV and parse the named columns with the given
    * mobility constructors, e.g. `Map("trip" -> "tgeompoint")` turns
    * string column `trip` into a temporal-point struct column. */
  def read(s: SparkSession, path: String,
           mobCols: Map[String, String] = Map.empty): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val raw = s.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    mobCols.foldLeft(raw) { case (df, (name, ctor)) =>
      df.withColumn(name, expr(s"$ctor(`$name`)"))
    }
  }

  /** Write a DataFrame to CSV, serializing mobility struct columns back
    * to their text form with asText (lossless round-trip). */
  def write(df: DataFrame, path: String, mobCols: Seq[String]): Unit = {
    val out = mobCols.foldLeft(df)((d, c) =>
      d.withColumn(c, expr(s"asText(`$c`)")))
    out.write.option("header", "true").mode("overwrite").csv(path)
  }
}
