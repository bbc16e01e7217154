package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over the events schema (the reference has no
  * streaming surface — SURVEY §1.1 — so this is the additive streaming
  * path of the engine, built on the same span semantics as
  * MobilityOps.q4Sessions):
  *
  *  - `windowedCounts`: watermarked sliding-window aggregation —
  *    pure built-ins, shuffle on (window, event_type) only.
  *  - `sessionize`: per-user session spans via
  *    flatMapGroupsWithState + event-time timeout: state is one open
  *    span `[first, last+gap)` per user; a session is emitted exactly
  *    when the watermark passes its close — the streaming equivalent of
  *    SpanSetAlg.normalize over per-event spans.
  */
object StreamSessions {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  // start/last in MICROSECONDS: events carry micro precision and the
  // batch sessionizer (mob_q4_sessions) is exact in micros -- millis
  // state would silently truncate session widths
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, start: java.sql.Timestamp,
                     end: java.sql.Timestamp, n_events: Int, total_value: Double)

  val GapMs: Long = 30 * 60 * 1000L
  val GapUs: Long = GapMs * 1000L

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def tsOf(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Watermarked 10-minute windows sliding by 5, counts per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total"))

  /** Session spans with a 30-minute inactivity gap. `horizon` is the
    * watermark delay — callers replaying bounded history (StreamGate)
    * widen it past the full event span so arrival order can never make
    * a row late. */
  def sessionize(spark: SparkSession, events: DataFrame,
                 horizon: String = "1 hour"): Dataset[Session] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "value").as[Ev]
      .withWatermark("ts", horizon)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          def toSession(st: SessionState): Session =
            Session(uid, tsOf(st.start), tsOf(st.last + GapUs), st.n, st.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toSeq.sortBy(e => micros(e.ts))
            val closed = scala.collection.mutable.ArrayBuffer[Session]()
            var cur = state.getOption
            for (e <- sorted) {
              val t = micros(e.ts)
              cur match {
                case Some(st) if t - st.last <= GapUs =>
                  cur = Some(st.copy(last = math.max(st.last, t), n = st.n + 1,
                    sum = st.sum + e.value))
                case Some(st) =>
                  closed += toSession(st)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              // the timeout API is millis; round UP so it never fires
              // inside the still-open micro window
              state.setTimeoutTimestamp(Math.floorDiv(st.last + GapUs + 999L, 1000L))
            }
            closed.iterator
          }
      }
  }
}
