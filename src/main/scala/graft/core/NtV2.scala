package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.ConcurrentHashMap

/** NTv2 grid-shift support — the published `.gsb` binary format
  * (Natural Resources Canada "National Transformation v2" developer
  * guide; the same format PROJ consumes as `+nadgrids=`). This closes
  * the one accuracy gap the Helmert-only registry documents
  * (EpsgRegistry.scala:24-27): where a published grid covers a point,
  * datum shifts interpolate the survey-measured distortion field
  * (decimetre class) instead of the 1-10 m nominal 7-parameter fit.
  * The reference gets this through MEOS/PROJ grid files
  * (ref src/geo/geoset.cpp:106-122 — PROJ consults its grid dir before
  * falling back to towgs84); we reproduce the same resolution order:
  * grid if present and covering, else Helmert.
  *
  * Grid DISTRIBUTION is Spark-idiomatic rather than PROJ_LIB-idiomatic:
  * ship the `.gsb` with `SparkContext.addFile` (or `spark-submit
  * --files`) under its canonical published name and every executor
  * resolves it via `SparkFiles.get` on first use — the same mechanism
  * that ships side-data like tokenizer vocabularies. [[GridStore]]
  * caches one parsed grid per JVM per name. Without the file, behavior
  * is EXACTLY the registry's r7 behavior (Helmert), so shipping a grid
  * is a pure accuracy upgrade, never a requirement.
  *
  * Format notes (all public):
  *  - 11 overview records of 16 bytes (8-byte ASCII key + 8-byte value);
  *    ints occupy 4 bytes + 4 pad. Both endiannesses exist in the wild;
  *    detected from NUM_OREC == 11.
  *  - per sub-grid: 11 header records (S_LAT/N_LAT/E_LONG/W_LONG/
  *    LAT_INC/LONG_INC in arc-seconds, GS_COUNT nodes), then GS_COUNT
  *    16-byte nodes of 4 float32: lat shift, lon shift (arc-seconds,
  *    LONGITUDE POSITIVE WEST — the format's one famous trap), lat/lon
  *    accuracy.
  *  - nodes run row-major from (S_LAT, E_LONG), longitude increasing
  *    west, then latitude increasing north.
  */
object NtV2 {

  /** One sub-grid. Extents/increments in arc-seconds, west-positive
    * longitudes (`eLon <= wLon` numerically). `latShift`/`lonShift` are
    * the node fields widened to Double (float32 in the file). */
  final case class SubGrid(name: String, parent: String,
                           sLat: Double, nLat: Double,
                           eLon: Double, wLon: Double,
                           latInc: Double, lonInc: Double,
                           latShift: Array[Double],
                           lonShift: Array[Double]) {
    val nCols: Int = math.round((wLon - eLon) / lonInc).toInt + 1
    val nRows: Int = math.round((nLat - sLat) / latInc).toInt + 1
    require(nRows >= 2 && nCols >= 2,
      s"sub-grid $name: degenerate ${nRows}x$nCols extent (bilinear " +
        "interpolation needs a 2x2 cell; a 1-row/1-column grid would " +
        "index out of bounds)")
    require(latShift.length == nCols * nRows,
      s"sub-grid $name: ${latShift.length} nodes != $nRows x $nCols")

    def contains(lonWestSec: Double, latSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat &&
        lonWestSec >= eLon && lonWestSec <= wLon

    /** Bilinear (lat, lon) shift in arc-seconds at a west-positive
      * point, which must be inside the extent. */
    def interp(lonWestSec: Double, latSec: Double): (Double, Double) = {
      val cf = (lonWestSec - eLon) / lonInc
      val rf = (latSec - sLat) / latInc
      val c = math.min(nCols - 2, math.max(0, cf.toInt))
      val r = math.min(nRows - 2, math.max(0, rf.toInt))
      val fx = cf - c
      val fy = rf - r
      val i00 = r * nCols + c
      @inline def bl(a: Array[Double]): Double =
        a(i00) * (1 - fx) * (1 - fy) + a(i00 + 1) * fx * (1 - fy) +
          a(i00 + nCols) * (1 - fx) * fy + a(i00 + nCols + 1) * fx * fy
      (bl(latShift), bl(lonShift))
    }
  }

  /** A parsed grid file: the source→target datum shift field. */
  final case class GridFile(subGrids: IndexedSeq[SubGrid]) {

    /** Interpolated (latShiftSec, lonShiftWestSec) at an EAST-positive
      * lon/lat degree point, or None if no sub-grid covers it. Among
      * covering sub-grids the DENSEST wins (children refine parents —
      * the standard NTv2 resolution rule). */
    def shiftSec(lonEastDeg: Double, latDeg: Double)
        : Option[(Double, Double)] = {
      val lonW = -lonEastDeg * 3600.0
      val lat = latDeg * 3600.0
      var best: SubGrid = null
      var i = 0
      while (i < subGrids.length) {
        val g = subGrids(i)
        if (g.contains(lonW, lat) &&
            (best == null || g.latInc < best.latInc)) best = g
        i += 1
      }
      if (best == null) None else Some(best.interp(lonW, lat))
    }

    /** Source-datum lon/lat → target-datum lon/lat (east-positive
      * degrees): lat gains the lat shift, east-longitude LOSES the
      * west-positive lon shift. None outside every sub-grid. */
    def forwardShift(lonDeg: Double, latDeg: Double)
        : Option[(Double, Double)] =
      shiftSec(lonDeg, latDeg).map { case (dLat, dLonW) =>
        (lonDeg - dLonW / 3600.0, latDeg + dLat / 3600.0)
      }

    /** Target-datum → source-datum: fixed-point iteration on the
      * forward field (shift gradients are ~1e-5, so 4 rounds converge
      * far below float32 node precision). None if the iterate leaves
      * the grid. */
    def inverseShift(lonDeg: Double, latDeg: Double)
        : Option[(Double, Double)] = {
      var lon = lonDeg
      var lat = latDeg
      var i = 0
      while (i < 4) {
        forwardShift(lon, lat) match {
          case Some((fLon, fLat)) =>
            lon += lonDeg - fLon
            lat += latDeg - fLat
          case None => return None
        }
        i += 1
      }
      Some((lon, lat))
    }
  }

  // ------------------------------------------------------------- parsing

  private def key(bb: ByteBuffer): String = {
    val b = new Array[Byte](8)
    bb.get(b)
    new String(b, "US-ASCII").trim
  }
  private def str8(bb: ByteBuffer): String = key(bb)
  private def int4(bb: ByteBuffer): Int = { val v = bb.getInt; bb.getInt; v }

  /** Parse a `.gsb` byte array (endianness auto-detected). */
  def parse(bytes: Array[Byte]): GridFile = {
    val probe = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
    val order =
      if (probe.getInt == 11) ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN
    val bb = ByteBuffer.wrap(bytes).order(order)
    var nSub = 0
    var i = 0
    while (i < 11) {
      val k = key(bb)
      k match {
        case "NUM_OREC" | "NUM_SREC" => int4(bb)
        case "NUM_FILE" => nSub = int4(bb)
        case _ => bb.position(bb.position() + 8) // strings/doubles, 8 bytes
      }
      i += 1
    }
    val subs = (0 until nSub).map { _ =>
      var name = ""; var parent = ""
      var sLat = 0.0; var nLat = 0.0; var eLon = 0.0; var wLon = 0.0
      var latInc = 0.0; var lonInc = 0.0; var count = 0
      var j = 0
      while (j < 11) {
        key(bb) match {
          case "SUB_NAME" => name = str8(bb)
          case "PARENT" => parent = str8(bb)
          case "CREATED" | "UPDATED" => str8(bb)
          case "S_LAT" => sLat = bb.getDouble
          case "N_LAT" => nLat = bb.getDouble
          case "E_LONG" => eLon = bb.getDouble
          case "W_LONG" => wLon = bb.getDouble
          case "LAT_INC" => latInc = bb.getDouble
          case "LONG_INC" => lonInc = bb.getDouble
          case "GS_COUNT" => count = int4(bb)
          case _ => bb.position(bb.position() + 8)
        }
        j += 1
      }
      val la = new Array[Double](count)
      val lo = new Array[Double](count)
      var k = 0
      while (k < count) {
        la(k) = bb.getFloat.toDouble
        lo(k) = bb.getFloat.toDouble
        bb.getFloat; bb.getFloat // accuracies, unused
        k += 1
      }
      SubGrid(name, parent, sLat, nLat, eLon, wLon, latInc, lonInc, la, lo)
    }
    GridFile(subs)
  }

  // ------------------------------------------------------------- writing

  private def putKey(bb: ByteBuffer, k: String): Unit =
    bb.put(String.format("%-8s", k).getBytes("US-ASCII"), 0, 8)
  private def putStr(bb: ByteBuffer, k: String, v: String): Unit = {
    putKey(bb, k); putKey(bb, v)
  }
  private def putInt(bb: ByteBuffer, k: String, v: Int): Unit = {
    putKey(bb, k); bb.putInt(v); bb.putInt(0)
  }
  private def putDbl(bb: ByteBuffer, k: String, v: Double): Unit = {
    putKey(bb, k); bb.putDouble(v)
  }

  /** Serialize a [[GridFile]] as spec-conformant `.gsb` bytes (node
    * values narrowed to float32, zero accuracies). Used by the specs'
    * round-trip pins and by [[graft.operators.MobilityOps]]'s
    * grid-shift gate entry to build its deterministic test grid. */
  def write(gf: GridFile,
            order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val size = 11 * 16 +
      gf.subGrids.map(s => 11 * 16 + s.latShift.length * 16).sum
    val bb = ByteBuffer.allocate(size).order(order)
    putInt(bb, "NUM_OREC", 11)
    putInt(bb, "NUM_SREC", 11)
    putInt(bb, "NUM_FILE", gf.subGrids.length)
    putStr(bb, "GS_TYPE", "SECONDS")
    putStr(bb, "VERSION", "NTv2.0")
    putStr(bb, "SYSTEM_F", "SOURCE")
    putStr(bb, "SYSTEM_T", "TARGET")
    putDbl(bb, "MAJOR_F", 6378137.0)
    putDbl(bb, "MINOR_F", 6356752.314)
    putDbl(bb, "MAJOR_T", 6378137.0)
    putDbl(bb, "MINOR_T", 6356752.314)
    gf.subGrids.foreach { s =>
      putStr(bb, "SUB_NAME", s.name)
      putStr(bb, "PARENT", s.parent)
      putStr(bb, "CREATED", "GRAFT")
      putStr(bb, "UPDATED", "GRAFT")
      putDbl(bb, "S_LAT", s.sLat)
      putDbl(bb, "N_LAT", s.nLat)
      putDbl(bb, "E_LONG", s.eLon)
      putDbl(bb, "W_LONG", s.wLon)
      putDbl(bb, "LAT_INC", s.latInc)
      putDbl(bb, "LONG_INC", s.lonInc)
      putInt(bb, "GS_COUNT", s.latShift.length)
      var k = 0
      while (k < s.latShift.length) {
        bb.putFloat(s.latShift(k).toFloat)
        bb.putFloat(s.lonShift(k).toFloat)
        bb.putFloat(0f); bb.putFloat(0f)
        k += 1
      }
    }
    bb.array()
  }
}

/** Deterministic synthetic NTv2 grid for the `geo_gridshift` gate entry
  * and the NtV2 specs. Real grids cannot ship in a zero-egress build, so
  * the gate proves the MECHANISM end-to-end — write a spec-conformant
  * `.gsb`, distribute it with `addFile`, resolve it on executors through
  * [[GridStore]], interpolate it inside `transform()` — against a DuckDB
  * oracle that recomputes the closed form. The node values sample a
  * BILINEAR function of lon/lat whose coefficients are small binary
  * fractions: bilinear interpolation reproduces a bilinear function
  * exactly, and every intermediate (quarter-degree points, half-degree
  * cells, 2^-k coefficients) is exactly representable in float32/float64,
  * so the Spark result and the oracle's closed form agree BIT FOR BIT —
  * a full-hash gate row, not a tolerance check.
  *
  * The extent (30..40 E, 10..0 S — open Indian Ocean) deliberately
  * covers no CrsRegistrySpec worked example, so installing it under the
  * NTF grid's canonical name changes nothing else.
  */
object SynthNtv2 {
  val fileName = "ntf_r93.gsb"

  /** Closed-form lat shift (arc-seconds) — mirrored by the oracle SQL. */
  def dLatSec(lonE: Double, lat: Double): Double = {
    val u = lonE - 30.0; val v = lat + 10.0
    1.5 + u / 32 + v / 64 + u * v / 512
  }
  /** Closed-form west-positive lon shift (arc-seconds). */
  def dLonWestSec(lonE: Double, lat: Double): Double = {
    val u = lonE - 30.0; val v = lat + 10.0
    -2.0 + u / 16 - v / 128 + u * v / 1024
  }

  /** 21 x 21 nodes, half-degree cells over 30..40 E / -10..0 N. */
  def grid: NtV2.GridFile = {
    val la = new Array[Double](21 * 21)
    val lo = new Array[Double](21 * 21)
    var r = 0
    while (r < 21) {
      val lat = -10.0 + r * 0.5
      var c = 0
      while (c < 21) {
        val lonE = 40.0 - c * 0.5 // nodes run east→west (lonW increasing)
        la(r * 21 + c) = dLatSec(lonE, lat)
        lo(r * 21 + c) = dLonWestSec(lonE, lat)
        c += 1
      }
      r += 1
    }
    NtV2.GridFile(IndexedSeq(NtV2.SubGrid("GRAFT0", "NONE",
      sLat = -36000.0, nLat = 0.0, eLon = -144000.0, wLon = -108000.0,
      latInc = 1800.0, lonInc = 1800.0, la, lo)))
  }

  /** Write the grid once under its canonical name and distribute it to
    * every executor with `addFile` — the production deployment shape
    * for real grids (`spark-submit --files ntf_r93.gsb`). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_grids")
    dir.mkdirs()
    val f = new java.io.File(dir, fileName)
    if (!f.isFile)
      java.nio.file.Files.write(f.toPath, NtV2.write(grid))
    spark.sparkContext.addFile(f.getAbsolutePath)
    GridStore.invalidate(fileName)
  }
}

/** Per-JVM resolver + cache for NTv2 grids by canonical file name.
  * Resolution order (first hit wins, result cached):
  *  1. bytes injected with [[put]] (tests);
  *  2. `$GRAFT_GRID_DIR/<name>` — the PROJ_LIB analogue for
  *     cluster images that bake grids into the executor filesystem;
  *  3. `SparkFiles.get(<name>)` — grids shipped with
  *     `SparkContext.addFile` / `spark-submit --files`, the idiomatic
  *     way to distribute side-files to every executor.
  * Hits are cached for the life of the JVM. Misses are cached PER
  * RESOLUTION TOKEN — the task attempt id on executors, a driver-side
  * epoch (bumped by [[put]]/[[remove]]/[[invalidate]]) on the driver —
  * so per-row lookups inside a task never stat the filesystem more than
  * once, yet a grid shipped with `addFile` MID-SESSION is picked up by
  * every JVM at its next task with no driver-side coordination (the r8
  * design cached misses forever on executors, silently pinning
  * Helmert-class results after a late install). */
object GridStore {
  private val hits = new ConcurrentHashMap[String, NtV2.GridFile]()
  private val misses = new ConcurrentHashMap[String, java.lang.Long]()
  private val injected = new ConcurrentHashMap[String, Array[Byte]]()
  private val driverEpoch = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Miss-cache validity token: unique per task attempt on executors
    * (attempt ids are nonnegative, mapped below -1 to never collide with
    * driver epochs), the invalidation epoch on the driver. */
  private def token: Long =
    Option(org.apache.spark.TaskContext.get())
      .map(tc => -1L - tc.taskAttemptId())
      .getOrElse(driverEpoch.get())

  def put(name: String, bytes: Array[Byte]): Unit = {
    injected.put(name, bytes)
    hits.remove(name); misses.remove(name)
    driverEpoch.incrementAndGet()
  }
  def remove(name: String): Unit = {
    injected.remove(name)
    hits.remove(name); misses.remove(name)
    driverEpoch.incrementAndGet()
  }
  def invalidate(name: String): Unit = {
    hits.remove(name); misses.remove(name)
    driverEpoch.incrementAndGet()
  }

  def find(name: String): Option[NtV2.GridFile] = {
    val g = hits.get(name)
    if (g != null) return Some(g)
    val t = token
    val m = misses.get(name)
    if (m != null && m.longValue == t) return None
    resolve(name) match {
      case some @ Some(gf) => hits.put(name, gf); some
      case None => misses.put(name, java.lang.Long.valueOf(t)); None
    }
  }

  private def resolve(name: String): Option[NtV2.GridFile] = {
    Option(injected.get(name)).map(NtV2.parse).orElse {
      val fromDir = sys.env.get("GRAFT_GRID_DIR")
        .map(d => new java.io.File(d, name)).filter(_.isFile)
      val fromSpark =
        try {
          val f = new java.io.File(org.apache.spark.SparkFiles.get(name))
          if (f.isFile) Some(f) else None
        } catch { case _: Exception => None } // no SparkEnv yet
      fromDir.orElse(fromSpark).map(f =>
        NtV2.parse(java.nio.file.Files.readAllBytes(f.toPath)))
    }
  }
}
