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

    def oldQ8 = spark.sql(
      """SELECT l.Licence, p.PeriodId,
           round(SUM(length(atTime(t.Trip, p.Period))), 6) AS Dist
         FROM Trips t, Licences1 l, Periods1 p
         WHERE t.VehicleId = l.VehicleId
           AND t.ttmin <= p.Tend AND p.Tstart <= t.ttmax
         GROUP BY l.Licence, p.PeriodId
         ORDER BY l.Licence, p.PeriodId""")
    def oldQ9 = spark.sql(
      """WITH Distances AS (
           SELECT p.PeriodId, t.VehicleId,
             SUM(length(atTime(t.Trip, p.Period))) AS Dist
           FROM Trips t, Periods p
           WHERE t.ttmin <= p.Tend AND p.Tstart <= t.ttmax
           GROUP BY p.PeriodId, t.VehicleId)
         SELECT PeriodId, round(MAX(Dist), 6) AS MaxDist
         FROM Distances GROUP BY PeriodId ORDER BY PeriodId""")

    for ((nv, tmin, tmax, pmin, pmax) <- Seq((20, 2, 4, 10, 50), (60, 5, 8, 20, 80),
        (141, 9, 14, 30, 120))) {
      berlinmod.BerlinMod.load(spark, nVehicles = nv,
        tripsMin = tmin, tripsMax = tmax, ptsMin = pmin, ptsMax = pmax)
      val qs = berlinmod.BerlinMod.queries(spark).toMap
      for ((name, oldDf, newDf) <- Seq(("q8", oldQ8, qs("q8")), ("q9", oldQ9, qs("q9")))) {
        val a = oldDf.collect().map(_.toString).sorted
        val b = newDf.collect().map(_.toString).sorted
        val ok = a.sameElements(b)
        println(s"[scratch] nv=$nv $name old=${a.length} new=${b.length} match=$ok")
        if (!ok) {
          (a.toSet -- b.toSet).take(3).foreach(r => println(s"  only-old: $r"))
          (b.toSet -- a.toSet).take(3).foreach(r => println(s"  only-new: $r"))
        }
      }
    }
    spark.stop()
  }
}
