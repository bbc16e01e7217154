package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    berlinmod.BerlinMod.load(spark, nVehicles = 141,
      tripsMin = 9, tripsMax = 14, ptsMin = 30, ptsMax = 120)
    spark.sql("SELECT * FROM Trips").count()
    spark.sql("SELECT * FROM SegCells").count()
    spark.sql("SELECT * FROM SegTime").count()
    val qs = berlinmod.BerlinMod.queries(spark)
    for ((n, df) <- qs) {
      val t0 = System.nanoTime()
      val c = df.count()
      println(f"[scratch] $n%-4s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$c")
    }
    spark.stop()
  }
}
