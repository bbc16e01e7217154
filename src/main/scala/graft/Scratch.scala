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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    berlinmod.BerlinMod.load(spark, nVehicles = 141,
      tripsMin = 9, tripsMax = 14, ptsMin = 30, ptsMax = 120)
    spark.sql("SELECT * FROM Trips").count()
    spark.sql("SELECT * FROM SegCells").count()
    val hitsSql = berlinmod.BerlinMod.segHitsSqlForScratch("PointCells")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    time("hits")(spark.sql(hitsSql).count())
    time("hits again")(spark.sql(hitsSql).count())
    time("pointcount")(spark.sql(
      s"""WITH hits AS ($hitsSql)
          SELECT PointId, COUNT(DISTINCT VehicleId) AS Hits
          FROM hits GROUP BY PointId""").count())
    time("q17 window")(spark.sql(
      s"""WITH hits AS ($hitsSql),
          PointCount AS (
            SELECT PointId, COUNT(DISTINCT VehicleId) AS Hits
            FROM hits GROUP BY PointId)
          SELECT PointId, Hits FROM (
            SELECT PointId, Hits, MAX(Hits) OVER () AS mx FROM PointCount)
          WHERE Hits = mx ORDER BY PointId""").count())
    spark.stop()
  }
}
