package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    if (sys.env.contains("SCRATCH_PRETOUCH")) {
      val t0 = System.nanoTime()
      graft.util.HeapWarm.pretouch()
      println(f"[scratch] pretouch ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
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
    val d = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
      spark.catalog.clearCache()
      System.gc()
    }
    val only = sys.env.get("SCRATCH_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SCRATCH_REPS", "1").toInt
    val explain = sys.env.contains("SCRATCH_EXPLAIN")
    for {
      _ <- 1 to reps
      (name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
      if name != "berlinmod_e2e" && only.forall(_.contains(name))
    } {
      if (explain) {
        println(s"===== $name =====")
        println(fn(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      } else time(name) { fn(spark, d).count() }
    }
    spark.stop()
  }
}
