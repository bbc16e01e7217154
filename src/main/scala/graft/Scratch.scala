package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    for (i <- 1 to 3) {
      time(s"q3_star_join #$i") { operators.Relational.q3StarJoin(spark, d).count() }
      time(s"q9_scalar   #$i") { operators.Relational.q9ScalarSubquery(spark, d).count() }
      time(s"q11_set_ops #$i") { operators.Relational.q11SetOps(spark, d).count() }
    }
    spark.stop()
  }
}
