package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Multimodal column plumbing: image/audio as opaque `binary` columns
  * with typed metadata, processed in batches per partition.
  *
  * The decode step is REAL for three formats that need no external
  * codec: PPM P6 images (even doc_ids), PCM WAV audio (odd doc_ids),
  * and — the production format — PNG (all docs, `media_png`: chunk walk
  * with CRC32 verification, zlib inflate, all five scanline filters;
  * cross-validated both ways against the JVM's ImageIO in
  * PipelineOpsSpec). Payloads are synthesized from each document's utf8
  * bytes — a full binary ENCODE, then an honest DECODE that derives
  * width/height/sample-count from the bytes and computes true
  * pixel/sample statistics. The DuckDB oracle replays the same stats
  * from the same source bytes.
  *
  * The Spark-side shape is the 100 TB design: binary payload + metadata
  * struct schema, batched per-partition processing via mapPartitions
  * over a typed Dataset (the Scala analogue of mapInPandas: one iterator
  * pass, no per-row UDF overhead, constant memory); decode is map-side
  * only, no shuffle until the final small aggregate.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int,
                      height: Int, format: String)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
                           n_units: Long, mean_unit: Double)

  // ---- encode: synthesize real PPM/WAV binaries from text bytes ----

  /** PPM P6: "P6\n<w> <h>\n255\n" + w*h*3 raw RGB bytes. Pixels are the
    * doc's utf8 bytes (cycled if the doc is shorter than one row). */
  private def encodePpm(id: Long, tb: Array[Byte]): MediaRow = {
    val w = 8
    val h = math.max(1, tb.length / 24) // 24 bytes = one 8-pixel RGB row
    val n = w * h * 3
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) { out(header.length + i) = tb(i % tb.length); i += 1 }
    MediaRow(id, out, w, h, "ppm")
  }

  /** Canonical 44-byte PCM WAV header + 16-bit LE mono samples: sample j
    * is the doc's utf8 byte pair (2j, 2j+1), little-endian signed. */
  private def encodeWav(id: Long, tb: Array[Byte]): MediaRow = {
    val n = tb.length / 2
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    System.arraycopy(tb, 0, out, 44, dataSize)
    MediaRow(id, out, 0, 0, "wav")
  }

  private def encodeBatch(rows: Iterator[(Long, String)]): Iterator[MediaRow] =
    rows.map { case (id, text) =>
      // empty docs pad to one space byte so the cycled fill in encodePpm
      // never divides by zero; the DuckDB oracle mirrors the convention
      // via coalesce(nullif(text, ''), ' ')
      val raw = text.getBytes("UTF-8")
      val tb = if (raw.isEmpty) Array[Byte](' '.toByte) else raw
      if (id % 2 == 0) encodePpm(id, tb) else encodeWav(id, tb)
    }

  // ---- decode: parse the headers, compute true pixel/sample stats ----

  /** Parse "P6\n<w> <h>\n255\n" + raw RGB; returns pixel count and the
    * mean RGB byte value. The parsed dims are cross-checked against the
    * row's metadata. */
  private def decodePpm(r: MediaRow): MediaFeatures = {
    val p = r.payload
    require(p(0) == 'P' && p(1) == '6', "not a P6 PPM")
    // header = 3 whitespace-separated ints after the magic
    var i = 2
    def nextInt(): Int = {
      while (Character.isWhitespace(p(i))) i += 1
      var v = 0
      while (!Character.isWhitespace(p(i))) { v = v * 10 + (p(i) - '0'); i += 1 }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    i += 1 // single whitespace after maxval, then raw data
    require(maxval == 255 && w == r.width && h == r.height,
      s"PPM header ($w x $h, $maxval) disagrees with metadata")
    val n = w * h * 3
    var sum = 0L
    var k = 0
    while (k < n) { sum += p(i + k) & 0xFF; k += 1 }
    MediaFeatures(r.doc_id, r.format, p.length, w.toLong * h,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Parse the PCM WAV header + 16-bit LE samples; returns sample count
    * and the mean absolute sample value. */
  private def decodeWav(r: MediaRow): MediaFeatures = {
    val p = r.payload
    val bb = java.nio.ByteBuffer.wrap(p).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(p(0) == 'R' && p(1) == 'I' && p(8) == 'W', "not a RIFF/WAVE")
    val channels = bb.getShort(22)
    val bits = bb.getShort(34)
    val dataSize = bb.getInt(40)
    require(channels == 1 && bits == 16, "expected 16-bit mono PCM")
    val n = dataSize / 2
    var sum = 0L
    var j = 0
    while (j < n) { sum += math.abs(bb.getShort(44 + 2 * j).toInt); j += 1 }
    MediaFeatures(r.doc_id, r.format, p.length, n.toLong,
      if (n == 0) 0.0 else sum.toDouble / n)
  }

  private def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map(r => if (r.format == "ppm") decodePpm(r) else decodeWav(r))

  // ---- PNG: a production format, dependency-free on the JVM ----

  /** Paeth predictor (PNG spec §9, filter type 4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private def beInt(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    beInt(data.length) ++ t ++ data ++ beInt(crc32(t, data))
  }

  /** A REAL 8-bit grayscale PNG (spec-conformant: signature, IHDR, one
    * IDAT with zlib-deflated filtered scanlines, IEND, per-chunk CRC32).
    * Pixels are the doc's utf8 bytes cycled over an 8 x h image — the
    * same fill convention as [[encodePpm]], so the oracle's pixel math
    * is shared. Row y uses filter type y % 5, so every decode exercises
    * all five PNG filters (None/Sub/Up/Average/Paeth), not just the
    * trivial one. */
  private def encodePng(id: Long, tb: Array[Byte]): (Long, Array[Byte]) = {
    val w = 8
    val h = math.max(1, tb.length / 8)
    val raw = Array.tabulate(h * w)(i => tb(i % tb.length))
    val filtered = new Array[Byte](h * (w + 1))
    var y = 0
    while (y < h) {
      val ft = y % 5
      filtered(y * (w + 1)) = ft.toByte
      var x = 0
      while (x < w) {
        val cur = raw(y * w + x) & 0xFF
        val left = if (x > 0) raw(y * w + x - 1) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * w + x) & 0xFF else 0
        val ul = if (x > 0 && y > 0) raw((y - 1) * w + x - 1) & 0xFF else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        filtered(y * (w + 1) + 1 + x) = v.toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val bos = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = beInt(w) ++ beInt(h) ++
      Array[Byte](8, 0, 0, 0, 0) // bit depth 8, grayscale, no interlace
    val sig = Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)
    (id, sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.emptyByteArray))
  }

  case class PngFeatures(doc_id: Long, n_pixels: Long, mean_px: Double,
                         crc_ok: Int)

  /** Full PNG decode: chunk walk with CRC verification, zlib inflate,
    * scanline unfiltering for all five filter types, pixel stats. Throws
    * on any structural violation — the gate would surface a corrupt
    * encode as a query error, not a silent stat drift. */
  private[graft] def decodePng(id: Long, p: Array[Byte]): PngFeatures = {
    require(
      (p(0) & 0xFF) == 137 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G',
      "not a PNG signature")
    val bb = java.nio.ByteBuffer.wrap(p) // PNG ints are big-endian
    var off = 8
    var w = 0; var h = 0; var crcOk = 1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      val len = bb.getInt(off)
      val tag = new String(p, off + 4, 4, "US-ASCII")
      val want = bb.getInt(off + 8 + len)
      val c = new java.util.zip.CRC32
      c.update(p, off + 4, 4 + len)
      if (c.getValue.toInt != want) crcOk = 0
      tag match {
        case "IHDR" =>
          w = bb.getInt(off + 8); h = bb.getInt(off + 12)
          require(p(off + 16) == 8 && p(off + 17) == 0,
            "expected 8-bit grayscale")
          require(p(off + 20) == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(p, off + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val filtered = new Array[Byte](h * (w + 1))
    var got = 0
    while (got < filtered.length && !infl.finished())
      got += infl.inflate(filtered, got, filtered.length - got)
    infl.end()
    require(got == filtered.length, s"IDAT inflated to $got bytes")
    // unfilter in place into raw scanlines
    val raw = new Array[Int](h * w)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (w + 1)) & 0xFF
      var x = 0
      while (x < w) {
        val fv = filtered(y * (w + 1) + 1 + x) & 0xFF
        val left = if (x > 0) raw(y * w + x - 1) else 0
        val up = if (y > 0) raw((y - 1) * w + x) else 0
        val ul = if (x > 0 && y > 0) raw((y - 1) * w + x - 1) else 0
        raw(y * w + x) = ft match {
          case 0 => fv
          case 1 => (fv + left) & 0xFF
          case 2 => (fv + up) & 0xFF
          case 3 => (fv + (left + up) / 2) & 0xFF
          case 4 => (fv + paeth(left, up, ul)) & 0xFF
          case t => throw new IllegalArgumentException(s"filter $t")
        }
        x += 1
      }
      y += 1
    }
    var sum = 0L
    var i = 0
    while (i < raw.length) { sum += raw(i); i += 1 }
    PngFeatures(id, raw.length.toLong, sum.toDouble / raw.length, crcOk)
  }

  private[graft] def encodePngPayload(id: Long, text: String)
      : (Long, Array[Byte]) = {
    val rawB = text.getBytes("UTF-8")
    encodePng(id, if (rawB.isEmpty) Array[Byte](' '.toByte) else rawB)
  }

  /** Every doc encoded as a real grayscale PNG, then fully decoded
    * (CRC + inflate + all-five-filters unfilter) back to pixel stats —
    * map-side only, the aggregate is the single shuffle. The oracle
    * replays the pixel stats from the cycled source bytes; crc_ok
    * counting every row certifies the decode path ran, not a stub. */
  def mediaPng(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => encodePngPayload(id, text) })
      .mapPartitions(_.map { case (id, p) => decodePng(id, p) })
      .toDF()
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_pixels").as("total_pixels"),
        round(avg("mean_px"), 4).as("avg_pixel"),
        sum("crc_ok").as("n_crc_ok"))
  }

  // ---- video analogue: multi-frame payloads, frame sampling, resize ----

  case class FrameFeatures(doc_id: Long, n_frames: Int, n_sampled: Int,
                           mean_sampled: Double, mean_resized: Double)

  /** "Video" = K concatenated P6 frames (K = 1 + doc_id % 4), each frame
    * the doc's PPM from [[encodePpm]]. */
  private def encodeFrames(id: Long, tb: Array[Byte]): (Long, Array[Byte]) = {
    val one = encodePpm(id, tb).payload
    val k = 1 + (id % 4).toInt
    val out = new Array[Byte](one.length * k)
    var f = 0
    while (f < k) { System.arraycopy(one, 0, out, f * one.length, one.length); f += 1 }
    (id, out)
  }

  /** Frame-sample (every 2nd frame, starting at 0) and resize (x2
    * nearest-neighbor decimation: pixels at even (x, y)) — both computed
    * from a REAL parse of each concatenated P6 frame. */
  private def decodeFrames(id: Long, p: Array[Byte]): FrameFeatures = {
    var off = 0
    var frame = 0
    var sampled = 0
    var sumAll = 0L; var nAll = 0L
    var sumRz = 0L; var nRz = 0L
    while (off < p.length) {
      require(p(off) == 'P' && p(off + 1) == '6', "not a P6 frame")
      var i = off + 2
      def nextInt(): Int = {
        while (Character.isWhitespace(p(i))) i += 1
        var v = 0
        while (!Character.isWhitespace(p(i))) { v = v * 10 + (p(i) - '0'); i += 1 }
        v
      }
      val w = nextInt(); val h = nextInt(); nextInt() // maxval
      i += 1
      if (frame % 2 == 0) { // frame sampling: keep even frames
        sampled += 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = i + (y * w + x) * 3
            val px = (p(base) & 0xFF) + (p(base + 1) & 0xFF) + (p(base + 2) & 0xFF)
            sumAll += px; nAll += 3
            if (x % 2 == 0 && y % 2 == 0) { sumRz += px; nRz += 3 }
            x += 1
          }
          y += 1
        }
      }
      off = i + w * h * 3
      frame += 1
    }
    FrameFeatures(id, frame, sampled,
      if (nAll == 0) 0.0 else sumAll.toDouble / nAll,
      if (nRz == 0) 0.0 else sumRz.toDouble / nRz)
  }

  /** Frame-sampling + resize feature extraction over multi-frame
    * payloads — same batched map-side shape as [[mediaFeatures]]. */
  def mediaFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // same empty-doc pad convention as encodeBatch
        val raw = text.getBytes("UTF-8")
        encodeFrames(id, if (raw.isEmpty) Array[Byte](' '.toByte) else raw)
      })
      .mapPartitions(_.map { case (id, p) => decodeFrames(id, p) })
      .toDF()
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_frames").as("total_frames"),
        sum("n_sampled").as("total_sampled"),
        round(avg("mean_sampled"), 4).as("avg_sampled"),
        round(avg("mean_resized"), 4).as("avg_resized"))
  }

  /** Encode each doc's bytes as a real PPM/WAV binary, run the batched
    * header-parsing decode, aggregate per-format feature stats. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(encodeBatch)
    media
      .mapPartitions(decodeBatch)
      .toDF()
      .groupBy("format")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        sum("n_units").as("total_units"),
        round(avg("mean_unit"), 4).as("avg_unit"))
      .orderBy("format")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _),
    "media_png" -> (mediaPng _))

  /** The oracle replays the true pixel/sample statistics from the same
    * source bytes: PPM pixels are the doc's bytes cycled over w*h*3,
    * WAV samples are LE signed 16-bit byte pairs; header sizes are
    * reproduced arithmetically ("P6\n8 <h>\n255\n" = 10 + digits(h);
    * WAV = 44). Documents are ASCII, so ascii(char) = utf8 byte. */
  val oracles: Map[String, String] = Map(
    "media_png" ->
      """WITH p AS (
           SELECT doc_id, coalesce(nullif(text, ''), ' ') AS text
           FROM documents),
         m AS (
           SELECT doc_id, string_split(text, '') AS cs,
             octet_length(CAST(text AS BLOB)) AS len,
             greatest(1, octet_length(CAST(text AS BLOB)) // 8) AS h
           FROM p),
         f AS (
           SELECT doc_id, 8 * h AS npx,
             list_avg(list_transform(range(8 * h),
               i -> ascii(cs[1 + (i % len)]))) AS mean_px
           FROM m)
         SELECT count(*) AS n_media,
           CAST(sum(npx) AS BIGINT) AS total_pixels,
           round(avg(mean_px), 4) AS avg_pixel,
           CAST(count(*) AS BIGINT) AS n_crc_ok
         FROM f""",
    "media_frames" ->
      """WITH p AS (
           SELECT doc_id, coalesce(nullif(text, ''), ' ') AS text
           FROM documents),
         m AS (
           SELECT doc_id, string_split(text, '') AS cs,
             octet_length(CAST(text AS BLOB)) AS len,
             greatest(1, octet_length(CAST(text AS BLOB)) // 24) AS h,
             1 + doc_id % 4 AS k
           FROM p),
         f AS (
           SELECT doc_id, k, (k + 1) // 2 AS sampled,
             list_avg(list_transform(range(24 * h),
               i -> ascii(cs[1 + (i % len)]))) AS mean_sampled,
             list_avg(list_transform(
               flatten(flatten(list_transform(range(0, h, 2), y ->
                 list_transform([0, 2, 4, 6], x ->
                   list_transform(range(3), c -> (y * 8 + x) * 3 + c))))),
               i -> ascii(cs[1 + (i % len)]))) AS mean_resized
           FROM m)
         SELECT count(*) AS n_media, CAST(sum(k) AS BIGINT) AS total_frames,
           CAST(sum(sampled) AS BIGINT) AS total_sampled,
           round(avg(mean_sampled), 4) AS avg_sampled,
           round(avg(mean_resized), 4) AS avg_resized
         FROM f""",
    "media_features" ->
      """WITH p AS (
           SELECT doc_id, coalesce(nullif(text, ''), ' ') AS text
           FROM documents),
         m AS (
           SELECT doc_id, string_split(text, '') AS cs,
             octet_length(CAST(text AS BLOB)) AS len
           FROM p),
         ppm AS (
           SELECT doc_id, len, cs,
             greatest(1, len // 24) AS h
           FROM m WHERE doc_id % 2 = 0),
         ppm_f AS (
           SELECT 'ppm' AS format,
             10 + length(CAST(h AS VARCHAR)) + 24 * h AS n_bytes,
             8 * h AS n_units,
             list_avg(list_transform(range(24 * h),
               i -> ascii(cs[1 + (i % len)]))) AS mean_unit
           FROM ppm),
         wav AS (
           SELECT doc_id, len, cs, len // 2 AS n FROM m WHERE doc_id % 2 = 1),
         wav_f AS (
           SELECT 'wav' AS format,
             44 + 2 * n AS n_bytes,
             n AS n_units,
             coalesce(list_avg(list_transform(
               list_transform(range(n),
                 j -> ascii(cs[2*j + 1]) + 256 * ascii(cs[2*j + 2])),
               v -> abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END))),
               0.0) AS mean_unit
           FROM wav),
         allf AS (SELECT * FROM ppm_f UNION ALL SELECT * FROM wav_f)
         SELECT format, count(*) AS n_media,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(n_units) AS BIGINT) AS total_units,
           round(avg(mean_unit), 4) AS avg_unit
         FROM allf GROUP BY format ORDER BY format""")
}
