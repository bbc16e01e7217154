package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Temporal/spatiotemporal operator coverage over the driver's `events`
  * table (SURVEY §2.2), verified against plain-SQL DuckDB oracles that
  * recompute the same semantics independently (interpolation via window
  * functions, span-set merge via gaps-and-islands, trajectory length via
  * lag+hypot).
  *
  * Per-user temporal values are built with the registered mobility
  * functions (collect_list → *seq constructors — the same two-phase
  * pipeline the reference's BerlinMOD loader uses,
  * ref benchmark/BerlinMOD/sql/load/07_trips.sql:26-37).
  *
  * Scale notes: one groupBy(user_id) shuffle builds each per-user value;
  * everything downstream is a map-side expression on the grouped row.
  * At 100 TB the same plan holds — sequences are bounded per entity, the
  * shuffle is the unavoidable entity-grouping one, and all filters on
  * span/box bounds are plain column comparisons (prunable, codegen).
  */
object MobilityOps {

  private def cf(name: String, cols: Column*): Column = call_function(name, cols: _*)

  /** Per-user tfloat sequence of (value @ ts), linear interp. */
  private def userSeq(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"))
      .groupBy("user_id")
      .agg(cf("tfloatseq",
        collect_list(cf("tfloat", col("value"), col("ts"))),
        lit("linear")).as("seq"))
  }

  /** timeSpan / numInstants accessors on per-user sequences. */
  def q1TimeSpan(s: SparkSession, d: String): DataFrame =
    userSeq(s, d)
      .select(
        col("user_id"),
        cf("numinstants", col("seq")).cast("long").as("n_events"),
        round((unix_micros(cf("endtimestamp", col("seq"))) -
          unix_micros(cf("starttimestamp", col("seq")))) / 1000000.0, 6)
          .as("width_s"))
      .orderBy("user_id")

  /** valueAtTimestamp with linear interpolation at a fixed probe time,
    * restricted to users whose domain contains it (op_contains). */
  def q2ValueAt(s: SparkSession, d: String): DataFrame = {
    val probe = lit("2024-01-15 00:00:00").cast("timestamp")
    userSeq(s, d)
      .filter(cf("op_contains", cf("timespan", col("seq")), probe))
      .select(
        col("user_id"),
        round(cf("valueattimestamp", col("seq"), probe), 6).as("v_at"))
      .orderBy("user_id")
  }

  /** atTime restriction to a fixed window + duration of the clipped part. */
  def q3AtTime(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val w = cf("tstzspan",
      lit("2024-01-10 00:00:00").cast("timestamp"),
      lit("2024-01-20 00:00:00").cast("timestamp"))
    userSeq(s, d)
      .withColumn("clipped", cf("attime", col("seq"), w))
      .filter(col("clipped").isNotNull)
      .select(
        col("user_id"),
        round((unix_micros(cf("endtimestamp", col("clipped"))) -
          unix_micros(cf("starttimestamp", col("clipped")))) / 1000000.0, 6)
          .as("dur_s"))
      .orderBy("user_id")
  }

  /** Session spans: per-event [ts, ts+30min) spans merged through the
    * span-set normalizer; oracle recomputes with gaps-and-islands SQL. */
  def q4Sessions(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .select(col("user_id"),
        cf("tstzspan", col("ts"),
          col("ts") + expr("INTERVAL 30 MINUTES")).as("sp"))
      .groupBy("user_id")
      .agg(cf("spanset", collect_list(col("sp"))).as("ss"))
      .select(
        col("user_id"),
        cf("numspans", col("ss")).cast("long").as("num_sessions"),
        round(cf("width", col("ss"), lit(false)).cast("long") / 1000000.0, 6)
          .as("total_s"))
      .orderBy("user_id")
  }

  /** 2D trajectory length: x=value, y=props.k, linear tgeompoint per user. */
  def q5TrajLength(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .groupBy("user_id")
      .agg(cf("tgeompointseq",
        collect_list(cf("tgeompoint", cf("st_point", col("value"), col("y")), col("ts"))),
        lit("linear")).as("traj"))
      .select(col("user_id"),
        round(cf("length", col("traj")), 2).as("traj_len"))
      .orderBy("user_id")
  }

  /** Spatiotemporal bounding-box filter: users whose trajectory stbox
    * overlaps a constant box (the reference's R-tree query pattern,
    * rtree_optimize_scan.cpp — here a sargable predicate). */
  def q6StboxFilter(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val boxDf = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("value"),
        get_json_object(col("props"), "$.k").cast("double").as("y"))
      .groupBy("user_id")
      .agg(cf("tgeompointseq",
        collect_list(cf("tgeompoint", cf("st_point", col("value"), col("y")), col("ts"))),
        lit("linear")).as("traj"))
      .withColumn("box", cf("to_stbox", col("traj")))
    val qbox = cf("stbox", lit("STBOX X((0,0),(120,40))"))
    boxDf
      .filter(cf("op_overlaps", col("box"), qbox))
      .agg(count(lit(1)).as("n_users"),
        round(sum(cf("area", col("box"))), 2).as("total_area"))
  }

  /** whenTrue over a step TBOOL (value > 150): total true-hold seconds. */
  def q7WhenTrue(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), (col("value") > 150).as("hot"))
      .groupBy("user_id")
      .agg(cf("tboolseq",
        collect_list(cf("tbool", col("hot"), col("ts"))),
        lit("step")).as("seq"))
      .withColumn("tt", cf("whentrue", col("seq")))
      .select(
        col("user_id"),
        coalesce(cf("width", col("tt"), lit(false)).cast("long"), lit(0L)).as("true_us"))
      .select(col("user_id"),
        round(col("true_us") / 1000000.0, 6).as("true_s"))
      .orderBy("user_id")
  }

  /** AS-OF JOIN: for every (user, day boundary), the latest event at or
    * before the boundary. Composed the scale-right way: tag-union the
    * probe grid with the events, ONE shuffle on user_id, and carry the
    * last event forward with an ignore-nulls last_value window — the
    * classic distributed as-of (no per-probe range join, no skew:
    * each user's stream is one sorted partition-run regardless of probe
    * count). DuckDB's native ASOF JOIN is the oracle. */
  def q8AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val dayGrid = s.range(1, 31)
      .select(timestamp_add("DAY", col("id").cast("int"),
        to_timestamp(lit("2024-01-01"))).as("gts"))
    val probe = e.select("user_id").distinct().crossJoin(broadcast(dayGrid))
    val tagE = e.select(col("user_id"), col("ts"), col("event_id"),
      col("value"), lit(1).as("is_e"))
    val tagP = probe.select(col("user_id"), col("gts").as("ts"),
      lit(null).cast("long").as("event_id"),
      lit(null).cast("double").as("value"), lit(0).as("is_e"))
    // at an exact-boundary tie the event sorts first (is_e desc), so
    // ts <= gts semantics match ASOF JOIN's >=
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_e").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE ignore-nulls window over a struct that is null for probe rows:
    // both output fields come from the SAME matched event row. (Two
    // independent last_value aggregates could mix fields from different
    // rows when an event carries a NULL value — ASOF JOIN returns one row.)
    tagE.unionByName(tagP)
      .withColumn("last_ev", last(
        when(col("is_e") === 1, struct(col("event_id"), col("value"))),
        ignoreNulls = true).over(w))
      .filter(col("is_e") === 0 && col("last_ev").isNotNull)
      .select(col("user_id"), col("ts").as("gts"),
        col("last_ev.event_id").as("last_event_id"),
        round(col("last_ev.value"), 2).as("last_value"))
      .orderBy("user_id", "gts")
  }

  /** NTv2 grid-shift transform, end-to-end through the production path:
    * a spec-conformant `.gsb` written and shipped with `addFile`
    * ([[graft.core.SynthNtv2]]), resolved per-executor via SparkFiles,
    * bilinearly interpolated inside `transform()`'s datum step
    * (EpsgRegistry.datumToWgs), points built with st_point and read back
    * with st_x/st_y. The synthetic grid samples a bilinear field with
    * binary-fraction coefficients, so the DuckDB oracle's closed form
    * matches bit-for-bit (see SynthNtv2 scaladoc). 1 681 quarter-degree
    * points; everything is a zero-shuffle projection over spark.range. */
  def q9GridShift(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    graft.core.SynthNtv2.install(s)
    val pt = cf("st_transform",
      cf("st_point", col("lon_in"), col("lat_in")),
      lit(4275), lit(4326))
    s.range(1681)
      .select(
        col("id"),
        (lit(30.0) + col("id") % 41 * lit(0.25)).as("lon_in"),
        (lit(-10.0) + expr("id div 41") * lit(0.25)).as("lat_in"))
      .select(col("id"), col("lon_in"), col("lat_in"),
        round(cf("st_x", pt), 7).as("lon_out"),
        round(cf("st_y", pt), 7).as("lat_out"))
      .orderBy("id")
  }

  /** The irregular-hexagon vertex offsets of [[q10PolygonOps]] — exact
    * binary fractions, so both engines build bit-identical vertices
    * from (cx, cy, r). Listed CCW; a simple (non-self-intersecting)
    * ring by construction. */
  private val PolyOffsets: Seq[(Double, Double)] = Seq(
    (2.0, 0.0), (1.0, 1.5), (-1.0, 2.0),
    (-2.0, 0.5), (-1.0, -1.0), (0.5, -1.5))

  /** `geo_polygon_ops` gate entry — the r13 spatial-measure tier
    * (duckdb-spatial subset, r12 verdict missing #3): per user, build
    * an irregular hexagon at (user_id % 10, user_id % 7) scaled by a
    * value-derived radius, and measure it with the new kernels —
    * st_makepolygon / st_npoints / st_isvalid / st_area / st_perimeter
    * / st_centroid / st_envelope, plus an exact nseg=1 point buffer
    * (the rotated square: no trig, so the oracle replays it
    * bit-for-bit). All vertex arithmetic is exact binary fractions;
    * the DuckDB oracle recomputes every measure from the same vertex
    * formulas with the same left-to-right shoelace/edge sums —
    * geometry never crosses the engine boundary. Plan shape: one
    * events aggregate + a map-side projection; nothing corpus-shaped
    * beyond the per-user avg. */
  def q10PolygonOps(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val ring = PolyOffsets :+ PolyOffsets.head
    val xs = array(ring.map { case (ox, _) =>
      col("cx") + col("r") * lit(ox) }: _*)
    val ys = array(ring.map { case (_, oy) =>
      col("cy") + col("r") * lit(oy) }: _*)
    val poly = cf("st_makepolygon", xs, ys)
    val cen = cf("st_centroid", poly)
    Tables.events(s, d)
      .groupBy("user_id").agg(round(avg("value"), 2).as("r0"))
      // the sqrt(2) factor is load-bearing: a finite-decimal radius
      // puts the measures' exact decimal expansions ON 6dp rounding
      // half-boundaries for whole residue classes (2r² with r = 1 +
      // k·1e-4 lands exactly on .5 for every k ≡ 5 mod 10), where
      // Spark's BigDecimal HALF_UP and DuckDB's float round disagree
      // within an ulp; the irrational scale gives every derived value
      // full-mantissa distance from the boundaries (measured min
      // margin 2.5e-9 across both gate SFs, vs ~1e-13 fp noise)
      .withColumn("r",
        col("r0") / lit(100.0) * sqrt(lit(2.0)) + lit(1.0))
      .withColumn("cx", (col("user_id") % 10).cast("double"))
      .withColumn("cy", (col("user_id") % 7).cast("double"))
      .select(col("user_id"),
        cf("st_npoints", poly).as("n_pts"),
        cf("st_isvalid", poly).as("valid"),
        round(cf("st_area", poly), 6).as("area"),
        round(cf("st_perimeter", poly), 6).as("perim"),
        round(cf("st_x", cen), 6).as("cen_x"),
        round(cf("st_y", cen), 6).as("cen_y"),
        round(cf("st_area", cf("st_envelope", poly)), 6).as("env_area"),
        round(cf("st_area", cf("st_buffer",
          cf("st_point", col("cx"), col("cy")), col("r"), lit(1))), 6)
          .as("buf_area"))
      .orderBy("user_id")
  }

  /** Oracle SQL (DuckDB) — all wrapped in a micros-truncation CTE so both
    * engines see identical timestamps (Spark reads the nanos parquet
    * truncated to micros). */
  private val E =
    """WITH e AS (SELECT event_id, user_id, value, props,
       CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts FROM events)"""

  val oracles: Map[String, String] = Map(
    "mob_q1_timespan" ->
      s"""$E
         SELECT user_id, count(*) AS n_events,
           round(epoch(max(ts)) - epoch(min(ts)), 6) AS width_s
         FROM e GROUP BY user_id ORDER BY user_id""",
    "mob_q2_value_at" ->
      s"""$E, b AS (
           SELECT user_id,
             max(CASE WHEN ts <= TIMESTAMP '2024-01-15' THEN ts END) AS t0,
             min(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN ts END) AS t1
           FROM e GROUP BY user_id
           HAVING min(ts) <= TIMESTAMP '2024-01-15'
              AND max(ts) >= TIMESTAMP '2024-01-15')
         SELECT b.user_id,
           round(CASE WHEN b.t0 = b.t1 THEN v0.value
             ELSE v0.value + (v1.value - v0.value)
               * (epoch(TIMESTAMP '2024-01-15') - epoch(b.t0))
               / (epoch(b.t1) - epoch(b.t0)) END, 6) AS v_at
         FROM b
         JOIN e v0 ON v0.user_id = b.user_id AND v0.ts = b.t0
         JOIN e v1 ON v1.user_id = b.user_id AND v1.ts = b.t1
         ORDER BY b.user_id""",
    "mob_q3_at_time" ->
      s"""$E
         SELECT user_id,
           round(epoch(least(max(ts), TIMESTAMP '2024-01-20'))
             - epoch(greatest(min(ts), TIMESTAMP '2024-01-10')), 6) AS dur_s
         FROM e GROUP BY user_id
         HAVING max(ts) >= TIMESTAMP '2024-01-10'
            AND min(ts) <= TIMESTAMP '2024-01-20'
         ORDER BY user_id""",
    "mob_q4_sessions" ->
      s"""$E, s AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
           FROM e),
         g AS (
           SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM s),
         per AS (
           SELECT user_id, sid,
             epoch_us(max(ts)) + 1800000000 - epoch_us(min(ts)) AS sess_us
           FROM g GROUP BY user_id, sid)
         SELECT user_id, count(*) AS num_sessions,
           round(CAST(sum(sess_us) AS BIGINT) / 1000000.0, 6) AS total_s
         FROM per GROUP BY user_id ORDER BY user_id""",
    "mob_q5_traj_length" ->
      s"""$E, p AS (
           SELECT user_id, ts, value AS x,
             CAST(json_extract_string(props, 'k') AS DOUBLE) AS y
           FROM e),
         seg AS (
           SELECT user_id,
             sqrt(power(x - lag(x) OVER w, 2) + power(y - lag(y) OVER w, 2)) AS len
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts))
         SELECT user_id, round(sum(len), 2) AS traj_len
         FROM seg WHERE len IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "mob_q6_stbox_filter" ->
      s"""$E, p AS (
           SELECT user_id, value AS x,
             CAST(json_extract_string(props, 'k') AS DOUBLE) AS y
           FROM e),
         box AS (
           SELECT user_id, min(x) xmin, max(x) xmax, min(y) ymin, max(y) ymax
           FROM p GROUP BY user_id)
         SELECT count(*) AS n_users,
           round(sum((xmax - xmin) * (ymax - ymin)), 2) AS total_area
         FROM box
         WHERE xmin <= 120 AND 0 <= xmax AND ymin <= 40 AND 0 <= ymax""",
    "mob_q7_when_true" ->
      s"""$E, s AS (
           SELECT user_id, ts, value > 150 AS hot,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS nxt
           FROM e)
         SELECT user_id,
           round(CAST(coalesce(sum(CASE WHEN hot AND nxt IS NOT NULL
             THEN epoch_us(nxt) - epoch_us(ts) END), 0) AS BIGINT)
             / 1000000.0, 6) AS true_s
         FROM s GROUP BY user_id ORDER BY user_id""",
    "mob_q8_asof_join" ->
      s"""$E, probe AS (
           SELECT u.user_id, TIMESTAMP '2024-01-01' + g.d * INTERVAL 1 DAY AS gts
           FROM (SELECT DISTINCT user_id FROM e) u,
                generate_series(1, 30) AS g(d))
         SELECT p.user_id, p.gts, ev.event_id AS last_event_id,
                round(ev.value, 2) AS last_value
         FROM probe p ASOF JOIN e ev
           ON p.user_id = ev.user_id AND p.gts >= ev.ts
         ORDER BY p.user_id, p.gts""",
    // closed form of the synthetic grid's bilinear shift field — bilinear
    // interpolation of a bilinear function is the function (SynthNtv2)
    // every measure recomputed from the same exact-fraction vertex
    // formulas with ordered left-to-right shoelace/edge sums — the
    // geometry itself never crosses the engine boundary
    "geo_polygon_ops" ->
      """WITH u AS (
           SELECT user_id,
             round(avg(value), 2) / 100.0 * sqrt(2.0) + 1.0 AS r,
             CAST(user_id % 10 AS DOUBLE) AS cx,
             CAST(user_id % 7 AS DOUBLE) AS cy
           FROM events GROUP BY user_id),
         offs(k, ox, oy) AS (VALUES
           (0, 2.0, 0.0), (1, 1.0, 1.5), (2, -1.0, 2.0),
           (3, -2.0, 0.5), (4, -1.0, -1.0), (5, 0.5, -1.5),
           (6, 2.0, 0.0)),
         ring AS (
           SELECT u.user_id, o.k,
             u.cx + u.r * o.ox AS x, u.cy + u.r * o.oy AS y
           FROM u CROSS JOIN offs o),
         edges AS (
           SELECT a.user_id, a.k, a.x AS x0, a.y AS y0,
             b.x AS x1, b.y AS y1
           FROM ring a JOIN ring b
             ON b.user_id = a.user_id AND b.k = a.k + 1),
         -- ORDERED folds (list_sum over list(... ORDER BY k)): the Spark
         -- kernels fold edges left-to-right, and ~10% of the buffer rows
         -- sit EXACTLY on a 6dp half-boundary (2r² with r = 1 + k/1e4
         -- resonates), so an unordered SUM's reassociation dust would
         -- flip the rounding — both engines must compute the identical
         -- double, not merely a close one
         m AS (
           SELECT user_id,
             list_sum(list(x0 * y1 - x1 * y0 ORDER BY k)) AS s2a,
             list_sum(list(sqrt((x1 - x0) * (x1 - x0)
               + (y1 - y0) * (y1 - y0)) ORDER BY k)) AS perim,
             list_sum(list((x0 + x1) * (x0 * y1 - x1 * y0) ORDER BY k))
               AS sx,
             list_sum(list((y0 + y1) * (x0 * y1 - x1 * y0) ORDER BY k))
               AS sy
           FROM edges GROUP BY user_id),
         ext AS (
           SELECT user_id, min(x) AS xmin, max(x) AS xmax,
             min(y) AS ymin, max(y) AS ymax
           FROM ring GROUP BY user_id),
         boffs(k, bx, by) AS (VALUES
           (0, 1.0, 0.0), (1, 0.0, 1.0), (2, -1.0, 0.0),
           (3, 0.0, -1.0), (4, 1.0, 0.0)),
         bring AS (
           SELECT u.user_id, b.k,
             u.cx + u.r * b.bx AS x, u.cy + u.r * b.by AS y
           FROM u CROSS JOIN boffs b),
         bedges AS (
           SELECT a.user_id, a.k, a.x AS x0, a.y AS y0,
             b.x AS x1, b.y AS y1
           FROM bring a JOIN bring b
             ON b.user_id = a.user_id AND b.k = a.k + 1),
         bm AS (
           SELECT user_id,
             list_sum(list(x0 * y1 - x1 * y0 ORDER BY k)) AS s2a
           FROM bedges GROUP BY user_id)
         SELECT u.user_id, 7 AS n_pts, TRUE AS valid,
           round(abs(m.s2a) / 2.0, 6) AS area,
           round(m.perim, 6) AS perim,
           round(m.sx / (3.0 * m.s2a), 6) AS cen_x,
           round(m.sy / (3.0 * m.s2a), 6) AS cen_y,
           round(abs((ext.xmax - ext.xmin) * (ext.ymax - ext.ymin)), 6)
             AS env_area,
           round(abs(bm.s2a) / 2.0, 6) AS buf_area
         FROM u JOIN m USING (user_id) JOIN ext USING (user_id)
           JOIN bm USING (user_id)
         ORDER BY u.user_id""",
    "geo_gridshift" ->
      """WITH pts AS (
           SELECT i AS id,
             30 + (i % 41) * CAST(0.25 AS DOUBLE) AS lon_in,
             -10 + (i // 41) * CAST(0.25 AS DOUBLE) AS lat_in
           FROM range(0, 1681) t(i))
         SELECT id, lon_in, lat_in,
           round(lon_in - (-2 + (lon_in - 30) / 16 - (lat_in + 10) / 128
             + (lon_in - 30) * (lat_in + 10) / 1024) / 3600, 7) AS lon_out,
           round(lat_in + (1.5 + (lon_in - 30) / 32 + (lat_in + 10) / 64
             + (lon_in - 30) * (lat_in + 10) / 512) / 3600, 7) AS lat_out
         FROM pts ORDER BY id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mob_q1_timespan" -> (q1TimeSpan _),
    "mob_q2_value_at" -> (q2ValueAt _),
    "mob_q3_at_time" -> (q3AtTime _),
    "mob_q4_sessions" -> (q4Sessions _),
    "mob_q5_traj_length" -> (q5TrajLength _),
    "mob_q6_stbox_filter" -> (q6StboxFilter _),
    "mob_q7_when_true" -> (q7WhenTrue _),
    "mob_q8_asof_join" -> (q8AsofJoin _),
    "geo_gridshift" -> (q9GridShift _),
    "geo_polygon_ops" -> (q10PolygonOps _))
}
