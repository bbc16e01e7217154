package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File,
  FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** WebDataset-style tar-shard sink + source for the documents table —
  * the shard format large-scale training-data pipelines actually ship
  * (a corpus is distributed as `shard-%05d.tar` files; each sample is a
  * group of members sharing a key: here `<key>.txt` payload +
  * `<key>.json` metadata). The reference's source surface covers
  * columnar/CSV formats (the `test/sql` load directives); tar shards
  * are the pipeline-side analogue this library adds for multimodal /
  * text corpora.
  *
  * Everything is dependency-free POSIX ustar (IEEE 1003.1-1988): 512-
  * byte headers (octal size, checksum over a space-filled field),
  * payload padded to 512, two zero blocks at end — written and parsed
  * by this file, cross-validated both directions against GNU tar in
  * TarShardsSpec.
  *
  * Scale shape: a shard is the unit of parallelism in BOTH directions.
  * The sink hash-partitions samples by `doc_id % nShards` and each task
  * streams its shards sequentially (one pass, O(1) memory per member);
  * the source maps one task per shard file (`spark.read` never holds a
  * whole shard in memory — members stream off the tar walk). At 100 TB
  * that is exactly how WebDataset corpora are produced and consumed:
  * thousands of independent ~100 MB-1 GB tars, no shuffle anywhere, and
  * the shard list IS the split list. Determinism: fixed header fields
  * (mode 644, uid/gid 0, mtime 0), keys zero-padded to sort, samples
  * written in key order within a shard — so shard bytes are a pure
  * function of the table and the gate can certify the LAYOUT (byte
  * accounting replayed in SQL) as well as the content (md5 checksum).
  */
object TarShards {

  private val Block = 512

  /** One parsed tar member: sample key (member name up to the first
    * '.'), the extension after it, and the payload bytes. */
  final case class Member(key: String, ext: String, bytes: Array[Byte])

  // ---- ustar writer ----------------------------------------------------

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the 1988 convention)
    val s = java.lang.Long.toOctalString(v)
    val b = new Array[Byte](width)
    val digits = width - 1
    val pad = digits - s.length
    var i = 0
    while (i < pad) { b(i) = '0'; i += 1 }
    System.arraycopy(s.getBytes(UTF_8), 0, b, pad, s.length)
    b(width - 1) = 0
    b
  }

  /** ustar header for a regular file `name` of `size` bytes. */
  private[sources] def header(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](Block)
    val nb = name.getBytes(UTF_8)
    require(nb.length <= 100, s"tar member name too long: $name")
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octal(420, 8), 0, h, 100, 8) // mode 0644
    System.arraycopy(octal(0, 8), 0, h, 108, 8) // uid
    System.arraycopy(octal(0, 8), 0, h, 116, 8) // gid
    System.arraycopy(octal(size, 12), 0, h, 124, 12)
    System.arraycopy(octal(0, 12), 0, h, 136, 12) // mtime 0: deterministic
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces first
    h(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes(UTF_8), 0, h, 257, 5) // magic NUL-term
    h(263) = '0'; h(264) = '0' // version "00"
    var sum = 0L
    var i = 0
    while (i < Block) { sum += (h(i) & 0xff); i += 1 }
    // checksum: 6 octal digits, NUL, space (GNU/POSIX layout)
    val cs = java.lang.Long.toOctalString(sum)
    val csPad = 6 - cs.length
    i = 0
    while (i < csPad) { h(148 + i) = '0'; i += 1 }
    System.arraycopy(cs.getBytes(UTF_8), 0, h, 148 + csPad, cs.length)
    h(154) = 0
    h(155) = ' '
    h
  }

  private def padTo(out: java.io.OutputStream, size: Long): Unit = {
    val rem = (size % Block).toInt
    if (rem != 0) out.write(new Array[Byte](Block - rem))
  }

  /** Append one member; returns the archived size (header + padded
    * payload) so callers can account bytes. */
  private def writeMember(out: java.io.OutputStream, name: String,
      bytes: Array[Byte]): Long = {
    out.write(header(name, bytes.length.toLong))
    out.write(bytes)
    padTo(out, bytes.length.toLong)
    Block + ((bytes.length.toLong + Block - 1) / Block) * Block
  }

  // ---- ustar reader ----------------------------------------------------

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && h(i) != 0 && h(i) != ' ') {
      v = v * 8 + (h(i) - '0'); i += 1
    }
    v
  }

  private def readFully(in: java.io.InputStream, b: Array[Byte]): Boolean = {
    var off = 0
    while (off < b.length) {
      val n = in.read(b, off, b.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  /** Stream all regular-file members of one tar (verifying each header
    * checksum); directory/link members are skipped, a zero block ends
    * the walk. */
  def readTar(in: java.io.InputStream): Iterator[Member] =
    new Iterator[Member] {
      private var nextM: Member = null
      private var done = false
      private def advance(): Unit = {
        while (nextM == null && !done) {
          val h = new Array[Byte](Block)
          if (!readFully(in, h) || h.forall(_ == 0)) { done = true }
          else {
            var stored = 0L
            var unsigned = 0L
            var i = 0
            while (i < Block) {
              val raw = if (i >= 148 && i < 156) ' '.toByte else h(i)
              unsigned += (raw & 0xff)
              i += 1
            }
            stored = parseOctal(h, 148, 8)
            require(stored == unsigned,
              s"tar header checksum mismatch: $stored != $unsigned")
            val nameEnd = h.indexOf(0.toByte) match {
              case -1 => 100
              case n => math.min(n, 100)
            }
            val name = new String(h, 0, nameEnd, UTF_8)
            val size = parseOctal(h, 124, 12)
            val typeflag = h(156)
            val padded = ((size + Block - 1) / Block) * Block
            if (typeflag == '0' || typeflag == 0) {
              val bytes = new Array[Byte](size.toInt)
              require(readFully(in, bytes), s"truncated tar member $name")
              var skip = padded - size
              while (skip > 0) skip -= in.skip(skip)
              val dot = name.lastIndexOf('.')
              val (key, ext) =
                if (dot < 0) (name, "") else (name.take(dot), name.drop(dot + 1))
              nextM = Member(key, ext, bytes)
            } else {
              var skip = padded
              while (skip > 0) skip -= in.skip(skip)
            }
          }
        }
      }
      def hasNext: Boolean = { advance(); nextM != null }
      def next(): Member = {
        advance()
        val m = nextM; nextM = null; m
      }
    }

  // ---- Spark sink ------------------------------------------------------

  /** JSON metadata member for one doc — deterministic field order, no
    * escaping needed (lang/source are machine tokens; the free text
    * lives in the .txt member, not here). The oracle reconstructs this
    * exact string to replay the byte accounting. */
  private def metaJson(docId: Long, lang: String, source: String,
      nChars: Long): String =
    s"""{"doc_id":$docId,"lang":"$lang","source":"$source","n_chars":$nChars}"""

  /** Write the documents table as `nShards` WebDataset-style tar shards
    * under `out`. Shard assignment is `doc_id % nShards`; within a
    * shard, samples are written in doc_id order with zero-padded keys.
    * Each executor task writes the shard(s) hash-partitioned to it,
    * streaming one member at a time. Returns the shard file paths. */
  def writeShards(docs: DataFrame, out: String, nShards: Int): Seq[String] = {
    val dir = new File(out)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
    } else dir.mkdirs()
    val outAbs = dir.getAbsolutePath
    docs
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("source"), col("n_chars").cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        var cur: java.io.OutputStream = null
        var curShard = -1
        def roll(shard: Int): Unit = {
          if (cur != null) { cur.write(new Array[Byte](2 * Block)); cur.close() }
          cur = new BufferedOutputStream(
            new FileOutputStream(f"$outAbs/shard-$shard%05d.tar"), 1 << 16)
          curShard = shard
        }
        rows.foreach { r =>
          val shard = r.getInt(5)
          if (shard != curShard) roll(shard)
          val key = f"${r.getLong(0)}%016d"
          writeMember(cur, s"$key.txt", r.getString(1).getBytes(UTF_8))
          writeMember(cur, s"$key.json",
            metaJson(r.getLong(0), r.getString(2), r.getString(3),
              r.getLong(4)).getBytes(UTF_8))
        }
        if (cur != null) { cur.write(new Array[Byte](2 * Block)); cur.close() }
      }
    // every residue class gets a shard file even when no row hashed to
    // it (possible with sparse doc_ids or nDocs < nShards): an empty
    // ustar archive is just the 1024-byte end-of-archive — keeps
    // n_shards and tar_bytes consistent with the oracle, which charges
    // end-of-archive bytes for all nShards shards (r9 ADVICE)
    (0 until nShards).foreach { i =>
      val f = new File(f"$outAbs/shard-$i%05d.tar")
      if (!f.exists()) {
        val o = new FileOutputStream(f)
        try o.write(new Array[Byte](2 * Block)) finally o.close()
      }
    }
    dir.listFiles().map(_.getAbsolutePath).sorted.toSeq
  }

  // ---- Spark source ----------------------------------------------------

  /** Read tar shards back as one row per member: (shard, key, ext,
    * bytes). One task per shard — the WebDataset split model. */
  def readShards(s: SparkSession, shardPaths: Seq[String]): DataFrame = {
    import s.implicits._
    s.createDataset(shardPaths)
      .repartition(math.max(1, shardPaths.size))
      .flatMap { p =>
        val shard = new File(p).getName
        val in = new BufferedInputStream(new FileInputStream(p), 1 << 16)
        // stream member-by-member (never a whole shard in memory — a
        // production shard is ~1 GB): the stream closes on exhaustion;
        // a task killed mid-iteration leaks the fd until GC, the
        // standard closing-iterator trade-off (r9 ADVICE)
        val base = readTar(in).map(m => (shard, m.key, m.ext, m.bytes))
        new Iterator[(String, String, String, Array[Byte])] {
          private var open = true
          def hasNext: Boolean = open && {
            val h = base.hasNext
            if (!h) { in.close(); open = false }
            h
          }
          def next(): (String, String, String, Array[Byte]) = base.next()
        }
      }
      .toDF("shard", "key", "ext", "bytes")
  }

  // ---- gate entry -------------------------------------------------------

  /** Round-trip certification: documents → tar shards → parse back →
    * one row of content + layout evidence. `checksum` is the masked
    * XOR-fold of md5("doc_id|text") over the PARSED .txt members (any
    * lost sample, reordered byte, or mangled UTF-8 flips it);
    * `tar_bytes` is the on-disk total of all shards, which the oracle
    * replays purely from the table via the ustar size arithmetic
    * (512-byte header + payload padded to 512 per member, 1024-byte
    * end-of-archive per shard) — so the gate pins the FORMAT, not just
    * the content. `meta_ok` counts .json members whose n_chars field
    * round-trips, certifying the metadata member the same way. */
  def tarRoundTrip(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // shard count tracks the corpus (~64k samples per shard, floor 8):
    // shards are the unit of parallelism, so a decade of data means 10x
    // the shards, not 10x the shard size — the oracle replays the same
    // arithmetic from count(*)
    val nDocs = docs.count()
    val nShards = math.max(8L, (nDocs + 65535) / 65536).toInt
    val fp = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(
      new File(d).getCanonicalPath))
    val out = s"target/tar_shards_$fp"
    val paths = writeShards(docs, out, nShards)
    val tarBytes = paths.map(p => new File(p).length()).sum
    val members = readShards(s, paths)
    val txt = members.filter(col("ext") === "txt")
      .select(col("key").cast("long").as("doc_id"),
        col("bytes").cast("string").as("text"))
    val meta = members.filter(col("ext") === "json")
      .select(col("key").cast("long").as("doc_id"),
        from_json(col("bytes").cast("string"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id LONG, lang STRING, source STRING, n_chars LONG"))
          .as("m"))
    val metaOk = meta
      .filter(col("m.doc_id") === col("doc_id"))
      .agg(count(lit(1)).as("meta_ok"),
        sum("m.n_chars").as("meta_chars"))
    val content = txt
      .withColumn("hx",
        md5(concat(col("doc_id").cast("string"), lit("|"), col("text"))))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("checksum"),
        sum(octet_length(col("text"))).as("payload_bytes"))
    content.crossJoin(metaOk)
      .select(lit(nShards).as("n_shards"), col("n_docs"), col("checksum"),
        col("payload_bytes"), lit(tarBytes).as("tar_bytes"),
        col("meta_ok"), col("meta_chars"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("sources_tar" -> (tarRoundTrip _))

  /** The oracle never opens a tar: it replays the member sizes (the
    * metadata JSON reconstructed character-for-character) and the ustar
    * padding arithmetic straight from the parquet table. */
  val oracles: Map[String, String] = Map(
    "sources_tar" ->
      """WITH m AS (
           SELECT doc_id, strlen(text) AS txt_len,
             strlen('{"doc_id":' || CAST(doc_id AS VARCHAR) ||
                    ',"lang":"' || lang || '","source":"' || source ||
                    '","n_chars":' || CAST(n_chars AS VARCHAR) || '}')
               AS json_len,
             n_chars
           FROM documents),
         ns AS (
           SELECT CAST(greatest(8, (count(*) + 65535) // 65536)
             AS INTEGER) AS n
           FROM documents)
         SELECT ns.n AS n_shards,
           (SELECT count(*) FROM documents) AS n_docs,
           (SELECT CAST(bit_xor(md5_number_lower(
              CAST(doc_id AS VARCHAR) || '|' || text))
              & 9223372036854775807 AS BIGINT) FROM documents) AS checksum,
           CAST(sum(txt_len) AS BIGINT) AS payload_bytes,
           CAST(sum(512 + CAST(ceil(txt_len / 512.0) AS BIGINT) * 512
             + 512 + CAST(ceil(json_len / 512.0) AS BIGINT) * 512)
             + ns.n * 1024 AS BIGINT) AS tar_bytes,
           count(*) AS meta_ok,
           CAST(sum(n_chars) AS BIGINT) AS meta_chars
         FROM m, ns
         GROUP BY ns.n""")
}
