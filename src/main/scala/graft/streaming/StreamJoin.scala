package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream INTERVAL join — the streaming analogue of
  * the batch theta/as-of joins (rel_q14, mob_q8): each probe matches the
  * same user's events whose event time falls in [probe - 10 min, probe].
  *
  * Scale shape: both sides carry event-time watermarks and the join
  * condition bounds event time against probe time from BOTH directions,
  * so Spark derives a state-eviction bound for each side — state is
  * (watermark + interval) worth of rows per side, constant in stream
  * length, and the join parallelizes by the user_id equi-key. */
object StreamJoin {

  val WindowMinutes = 10

  def intervalJoin(events: DataFrame, probes: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "1 hour")
    val p = probes.select(col("user_id").as("probe_user"), col("pts"))
      .withWatermark("pts", "1 hour")
    e.join(p,
      col("user_id") === col("probe_user") &&
        col("ts") >= col("pts") - expr(s"INTERVAL $WindowMinutes MINUTES") &&
        col("ts") <= col("pts"))
      .select(col("user_id"), col("pts"), col("ts"), col("value"))
  }
}
