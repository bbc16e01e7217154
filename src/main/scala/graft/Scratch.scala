package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.001")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (i <- 1 to 2) {
      time(s"mob_q6 #$i") { operators.MobilityOps.q6StboxFilter(spark, d).count() }
      time(s"mob_q1 #$i") { operators.MobilityOps.q1TimeSpan(spark, d).count() }
    }
    spark.stop()
  }
}
