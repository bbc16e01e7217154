package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim float vectors).
  *
  * Scale design: the query set is tiny and BROADCAST; the corpus is only
  * scanned (never shuffled) — each partition scores its vectors against
  * every query, then a per-query top-k (window over cos) runs on the
  * small scored result. The LSH variant prunes the scan with
  * sign-projection buckets: at 100 TB the corpus would be bucketed at
  * write time so a query touches only matching buckets (partition
  * pruning), with multi-probe for recall.
  */
object Similarity {

  /** Native codegen'd dot product ([[graft.functions.VecDot]], resolved
    * through the session registry) — stays inside whole-stage codegen
    * and reads the unsafe array directly; no UDF invocation or boxing
    * in the per-candidate hot loop. Callers register via [[reg]]. */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private def reg(s: SparkSession): Unit =
    graft.functions.GraftFunctions.register(s)

  private[graft] val queryIds = Seq(1L, 7L, 42L, 99L, 123L, 200L, 256L, 300L, 404L, 499L)

  /** Exact brute-force cosine top-5 per query vector (the correctness
    * baseline an ANN index is judged against). */
  def annTopK(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 stream),
    * generalized to any plane count: plane p is a function of p alone,
    * so `planesN(k)` is a PREFIX of `planesN(k')` for k < k' — a scaled
    * family extends the fixed 8-plane gate family rather than replacing
    * it. */
  private def planesN(count: Int): Array[Array[Double]] =
    Array.tabulate(count) { p =>
      var x = 0x9E3779B97F4A7C15L * (p + 1)
      Array.fill(64) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545F4914F6CDD1DL) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }

  /** The fixed 8-plane gate family (256 buckets). */
  private val planes: Array[Array[Double]] = planesN(8)

  /** Sign-LSH bucket id (8-bit) of a vector: 8 plane dot products via the
    * native vec_dot kernel, sign bits OR'd — pure codegen'd expressions,
    * no ScalaUDF (the planes ride along as array literals). */
  private def bucket(v: Column): Column =
    planes.indices.map { p =>
      when(dot(v, typedLit(planes(p).toSeq)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** A query bucket + its 1-bit flips (multi-probe) — builtin array/xor. */
  private def probes(b: Column): Column =
    array(b +: (0 until 8).map(i => b.bitwiseXOR(lit(1 << i))): _*)

  /** Bucket + 1-bit + 2-bit flips (37 distinct probe ids) — the denser
    * probe set the [[annGraphSearch]] GRAPH BUILD uses: a node's true
    * neighbors can sit two sign-bits away, and a graph missing those
    * edges caps beam-search recall no matter how long the search runs
    * (measured 0.66 with 1-bit-built edges, r10). Probe ids are
    * distinct, so each (node, candidate) pair still matches at most
    * once. */
  private val flips2: Seq[Int] =
    (0 until 8).map(1 << _) ++
      (for (i <- 0 until 8; j <- i + 1 until 8) yield (1 << i) | (1 << j))
  private def probes2(b: Column): Column =
    array(b +: flips2.map(m => b.bitwiseXOR(lit(m))): _*)

  /** Sign-projection LSH bucketed search: candidates share >= 7 of 8
    * signs with the query (multi-probe on 1-bit flips). Exact-oracle
    * checked: the hash family is deterministic, so the oracle SQL
    * replicates the same planes/buckets/probes in DuckDB (plane
    * literals interpolated from [[planes]]) and must match
    * bit-for-bit — see [[lshOracleSelect]]. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v")))
    // multi-probe: explode each query into its bucket + all 1-bit flips,
    // then EQUI-join on the bucket id — the join stays hash/broadcast
    // (a hamming-UDF join condition would force a nested loop)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), explode(probes(col("bkt"))).as("bkt"))
    val scored = e.join(broadcast(q), Seq("bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** The 100 TB path: the corpus is MATERIALIZED partitioned by LSH
    * bucket (write-time layout), so a probe touches only the matching
    * partition directories — Spark's dynamic partition pruning (visible
    * as a dynamicpruning PartitionFilter) skips the rest of the corpus
    * at the SCAN, where the in-memory variant above still reads every
    * row. Same hash family and scoring as [[annLsh]] — identical rows. */
  /** Materialize the bucket-partitioned corpus layout if absent or stale
    * (the write-time "index build" — callable from a load/warm-up phase).
    * The layout path carries a full-path fingerprint so two datasets with
    * the same basename cannot collide, and the build reruns whenever the
    * source parquet is newer than the layout's _SUCCESS marker — a
    * regenerated dataset cannot silently keep serving a stale index. */
  def buildLshLayout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    // `_f32` names the layout SCHEMA generation: vectors are stored as
    // the source's own float32 (the r8 layout widened them to float64
    // before writing — 2x the scan bytes for zero information, and the
    // bucketed scan is the wall clock of this query at 100x). Scoring
    // stays float64: the read path casts back, and since every stored
    // value IS a float32 the cast reproduces the r8 doubles bit-for-bit
    // — same cosines, same oracle. The schema tag in the path keeps a
    // pre-upgrade on-disk layout from being misread.
    val layout = graft.util.Layouts.dir("ann_bucketed_f32", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      val dbl = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vd"),
          col("embedding").as("v"))
      // norm and bucket are FLOAT64 functions of the vector (the same
      // values the in-memory path computes); only the vector itself is
      // stored narrow
      dbl.withColumn("n", sqrt(dot(col("vd"), col("vd"))))
        .withColumn("bkt", bucket(col("vd")))
        .drop("vd")
        .write.partitionBy("bkt").mode("overwrite").parquet(layout.toString)
    }
    layout
  }

  def annLshBucketed(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildLshLayout(s, d)
    // scan reads the float32 layout (half the bytes of the r8 layout);
    // the cast widens to float64 BEFORE any arithmetic, so scoring is
    // bit-identical to the in-memory path (PlanSpec asserts the scan
    // schema is float and the scored column double)
    val e = s.read.parquet(layout.toString)
      .withColumn("v", col("v").cast("array<double>"))
    // query side reads the BASE table (single file, isin pushed to the
    // scan), not the 256-directory layout — scanning every partition to
    // find 10 ids would defeat the pruning the layout exists for
    val q = Tables.embeddings(s, d)
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v")))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), explode(probes(col("bkt"))).as("bkt"))
    val scored = e.join(broadcast(q), Seq("bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** Nearest-centroid assignment against the codebook: the flattened
    * centroid matrix rides along as an array literal and the argmin runs
    * in the native vec_nearest_cell kernel — codegen'd, no ScalaUDF.
    * True L2 (not max-dot) so skewed norms still land in the right cell. */
  private def nearestCell(cents: Array[Array[Double]])(v: Column): Column =
    call_function("vec_nearest_cell", v, typedLit(cents.flatten.toSeq))

  /** The `nprobe` nearest centroids of a query vector (native kernel). */
  private def probeCells(cents: Array[Array[Double]], nprobe: Int)(v: Column): Column =
    call_function("vec_probe_cells", v, typedLit(cents.flatten.toSeq), lit(nprobe))

  /** IVF (inverted-file) ANN: a k-means coarse quantizer, then per-query
    * search restricted to the `nprobe` nearest cells.
    *
    * Scale design: the quantizer is trained on a BOUNDED deterministic
    * sample (k x 100 vectors, smallest xxhash64(vec_id) — a few MB no
    * matter the corpus size, the same regime faiss trains in) with
    * Lloyd's on the driver; only the k x 64 codebook is broadcast back.
    * The corpus is scanned once for cell assignment and never shuffled;
    * search is an equi-join on cell id. At 100 TB the corpus would be
    * written partitioned by cell (same layout trick as [[annLshBucketed]])
    * so a probe reads ~nprobe/k of the data. Rows-only check (recall vs
    * [[annTopK]] is the quality measure; k-means is not SQL-expressible). */
  private val IvfK = 32
  private[operators] val IvfNProbe = 6

  /** Codebooks stashed PER QUERY KEY ("ann_ivf" = freshly trained,
    * "ann_ivf_bucketed" = loaded from the on-disk layout). The codebook
    * is a deterministic function of the dataset, so once a query has
    * produced it, [[oracles]] can interpolate it into the DuckDB oracle
    * SQL (as the LSH planes are) and the oracle replays cell
    * assignment, nprobe probing, and scoring independently — turning
    * the approximate IVF queries into exact hash checks. Keyed rather
    * than last-writer-wins so a stale on-disk layout can never leak one
    * query's codebook into the OTHER query's oracle. Verify runs every
    * query before dumping oracle_sql.json, so the stash is always
    * populated there; if no IVF query ran, the IVF oracle entries are
    * simply omitted (rows-only, as before). */
  private val trainedCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Trained artifacts are keyed by (query, dataset dir) — the r12
    * generalization of the r11 lang-ID/plane-family fix: a session that
    * runs a codebook query against TWO dirs must not dump dir A's
    * oracle with dir B's codebook. [[Verify]] always threads the dir it
    * dumps for; `lastStashDir` is only the no-arg ad-hoc fallback. */
  @volatile private var lastStashDir: String = null
  private def stashKey(name: String, d: String): String =
    name + "@" + new java.io.File(d).getCanonicalPath
  private def stashCodebook(name: String, d: String,
                            c: Array[Array[Double]]): Unit = {
    trainedCodebooks.put(stashKey(name, d), c)
    lastStashDir = d
  }
  private[operators] def codebookFor(name: String, dumpDir: Option[String])
      : Option[Array[Array[Double]]] =
    dumpDir.orElse(Option(lastStashDir))
      .flatMap(d => Option(trainedCodebooks.get(stashKey(name, d))))
  private def stashPq(name: String, d: String,
                      c: Array[Array[Array[Double]]]): Unit = {
    trainedPq.put(stashKey(name, d), c)
    lastStashDir = d
  }
  private def pqFor(name: String, dumpDir: Option[String])
      : Option[Array[Array[Array[Double]]]] =
    dumpDir.orElse(Option(lastStashDir))
      .flatMap(d => Option(trainedPq.get(stashKey(name, d))))

  /** Deterministic k-means codebook: trained on a BOUNDED sample (k x 100
    * vectors with smallest xxhash64(vec_id) — a few MB at any corpus
    * size, the regime faiss trains in), Lloyd's on the driver, only the
    * k x dim codebook leaves. Identical data -> identical codebook, so
    * the in-memory and write-time IVF paths assign identical cells. */
  private def trainCodebook(e: DataFrame): Array[Array[Double]] = {
    val k = IvfK
    val iters = 8
    val sample: Array[Array[Double]] = e
      .withColumn("hk", xxhash64(col("vec_id")))
      .orderBy("hk").limit(k * 100)
      .collect().map(_.getSeq[Double](1).toArray)
    var cents = sample.take(k).map(_.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](cents(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ct = cents(c)
          var dist = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - ct(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        counts(best) += 1
        val sb = sums(best)
        var i = 0
        while (i < v.length) { sb(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c)))
    }
    cents
  }

  def annIvf(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val nprobe = IvfNProbe
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = trainCodebook(e)
    stashCodebook("ann_ivf", d, cents)
    val withCell = e
      .withColumn("cell", nearestCell(cents)(col("v")))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val q = withCell.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), explode(probeCells(cents, nprobe)(col("v"))).as("cell"))
    val scored = withCell.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** Write-time IVF layout: the corpus materialized PARTITIONED BY its
    * coarse-quantizer cell (parity with [[buildLshLayout]]), codebook
    * persisted beside it — a probe reads only its nprobe cell
    * directories (partition pruning at the scan), ~nprobe/k of the
    * corpus at any scale. Same staleness rules as the LSH layout. */
  def buildIvfLayout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    // `_f32l` schema generation — see [[buildLshLayout]] for the f32
    // vector convention (stored as source float32, norms/cells in
    // float64); the `l` marks the metadata (label) column carried since
    // r12 so FILTERED searches can evaluate their predicate at the
    // pruned scan ([[annFilteredBucketed]]) — the tag keeps a pre-r12
    // on-disk layout from being misread
    val layout = graft.util.Layouts.dir("ann_ivf_f32l", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cents = trainCodebook(e)
      import s.implicits._
      cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"${layout}_codebook")
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("vd"),
          col("embedding").as("v"), col("label"))
        .withColumn("cell", nearestCell(cents)(col("vd")))
        .withColumn("n", sqrt(dot(col("vd"), col("vd"))))
        .drop("vd")
        .write.partitionBy("cell").mode("overwrite").parquet(layout.toString)
    }
    layout
  }

  /** IVF search over the write-time layout — identical rows to
    * [[annIvf]] (same deterministic codebook), but the corpus scan is
    * partition-pruned to the probed cells instead of reading every row. */
  def annIvfBucketed(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildIvfLayout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    stashCodebook("ann_ivf_bucketed", d, cents)
    // float32 layout scan, widened before any arithmetic (bit-identical
    // scoring — see [[buildLshLayout]])
    val e = s.read.parquet(layout.toString)
      .withColumn("v", col("v").cast("array<double>"))
    // query side reads the BASE table (single file, isin pushed to the
    // scan), not the k cell directories
    val q = Tables.embeddings(s, d)
      .filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"),
        explode(probeCells(cents, IvfNProbe)(col("v"))).as("cell"))
    val scored = e.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** Product quantization (Jegou et al. 2011): the 64-dim vector splits
    * into PqM = 8 subspaces of 8 dims; each subspace gets its own
    * 256-centroid codebook (8-bit subquantizers — the paper's standard
    * configuration), so a vector compresses to 8 one-byte codes (64-bit
    * codes, 64x smaller than the raw doubles). Queries scan the CODES
    * with an ADC (asymmetric distance computation) lookup table — the
    * 100 TB argument: the similarity scan reads 8 bytes/vector instead
    * of 512, and the table of query-to-centroid distances (M x 256
    * doubles per query) is broadcast, so the scan stays embarrassingly
    * parallel with no shuffle until the final per-query top-k.
    *
    * Shape here: codebooks train like IVF's (bounded deterministic
    * sample, Lloyd's on the driver); corpus encoding is M
    * vec_nearest_cell kernel calls (codegen'd); the ADC join explodes
    * codes to (vec_id, j, code) rows and equi-joins the broadcast
    * lookup, summing the M quantized subspace distances per
    * (query, vector) — every stage a scan, broadcast join, or
    * partial+final agg. The compressed scan only SHORTLISTS (top-64 per
    * query); the final top-5 is an exact re-rank of the shortlist — the
    * standard two-stage PQ pipeline (full vectors are fetched for 64
    * rows per query, a vanishing fraction at scale). Recall@5 vs
    * [[annTopK]] on the gate's near-random synthetic space (neighbor
    * gaps ~0.01 cosine — the hard regime) went 0.80 -> 0.98 when the
    * subquantizers moved from 4-bit to these 8-bit codebooks;
    * PipelineOpsSpec pins >= 0.8. Exact-oracle checked: the codebooks
    * interpolate into DuckDB as VALUES literals ([[pqOracleSelect]]),
    * which replays assignment, lookup, shortlist, and re-rank
    * bit-for-bit. */
  private val PqM = 8       // subspaces
  private val PqSub = 8     // dims per subspace (PqM * PqSub = 64)
  private val PqK = 256     // centroids per subspace (8-bit codes)

  /** Per-subspace deterministic Lloyd's — same bounded-sample regime as
    * [[trainCodebook]], one codebook per subspace over its 8-dim slice.
    * Sample is PqK x 20 = 5 120 rows (driver-side Lloyd's stays ~1 s at
    * any corpus size — the bounded-collect argument). */
  private def trainPqCodebooks(e: DataFrame): Array[Array[Array[Double]]] = {
    val iters = 8
    val sample: Array[Array[Double]] = e
      .withColumn("hk", xxhash64(col("vec_id")))
      .orderBy("hk").limit(PqK * 20)
      .collect().map(_.getSeq[Double](1).toArray)
    Array.tabulate(PqM) { j =>
      val sub = sample.map(v => v.slice(j * PqSub, (j + 1) * PqSub))
      var cents = sub.take(PqK).map(_.clone())
      for (_ <- 1 to iters) {
        val sums = Array.fill(PqK)(new Array[Double](PqSub))
        val counts = new Array[Int](PqK)
        sub.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < PqK) {
            val ct = cents(c)
            var dist = 0.0; var i = 0
            while (i < PqSub) { val t = v(i) - ct(i); dist += t * t; i += 1 }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          counts(best) += 1
          val sb = sums(best)
          var i = 0
          while (i < PqSub) { sb(i) += v(i); i += 1 }
        }
        cents = Array.tabulate(PqK)(c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c)))
      }
      cents
    }
  }

  private val trainedPq =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Array[Double]]]]()

  def annPq(s: SparkSession, d: String): DataFrame = {
    reg(s)
    // L2-NORMALIZE before encoding: the baseline ranks by cosine, and on
    // the unit sphere L2 is monotone in cosine (||a-b||^2 = 2 - 2cos),
    // so the ADC metric and the target metric agree for any input
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("n", sqrt(dot(col("v0"), col("v0"))))
      .select(col("vec_id"), expr("transform(v0, x -> x / n)").as("v"))
    val cbs = trainPqCodebooks(e)
    stashPq("ann_pq", d, cbs)
    // corpus -> (vec_id, j, code): one nearest-cell kernel per subspace
    val codeCols = (0 until PqM).map { j =>
      struct(lit(j).as("j"),
        call_function("vec_nearest_cell",
          slice(col("v"), j * PqSub + 1, PqSub),
          typedLit(cbs(j).flatten.toSeq)).as("code"))
    }
    val codes = e
      .select(col("vec_id"), explode(array(codeCols: _*)).as("jc"))
      .select(col("vec_id"), col("jc.j").as("j"), col("jc.code").as("code"))
    // broadcast ADC lookup: query x subspace x centroid -> quantized d
    import s.implicits._
    val cells = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
    }.toSeq.toDF("j", "code", "c")
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val adc = q.crossJoin(cells)
      .select(col("query_id"), col("j"), col("code"),
        round(expr("aggregate(zip_with(slice(qv, j * 8 + 1, 8), c," +
          " (x, y) -> (x - y) * (x - y)), 0d, (acc, t) -> acc + t)"), 6)
          .as("dsub"))
    val scored = codes.join(broadcast(adc), Seq("j", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dsub").as("d2"))
    // ADC shortlist (top-64 in the compressed domain; round at 1e-6 =
    // the dsub quantum so the cut is engine-stable), then EXACT re-rank
    // of the shortlist only — the standard PQ pipeline: full vectors are
    // read for 64 rows per query, not the corpus
    val shortlist = shortlistTopK(
      scored.select(col("query_id"), round(col("d2"), 6).as("d2r"),
        col("vec_id")), 64)
    // the shortlist is 64 ids/query — BROADCAST it so the rerank is a
    // broadcast-hash-join over the corpus scan: without the hint the
    // planner (blind to the aggregate's output size) picks a sort-merge
    // join and shuffles every full vector (measured 2.6 GB at 5M
    // vectors — the true source of the r7 "2.8 GB ADC shuffle")
    val rerank = e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(q.withColumnRenamed("qv", "qv2")), "query_id")
      .withColumn("cos", dot(col("v"), col("qv2")))
    rankedTopK(rerank, 5)
  }

  /** IVF-PQ composite (the faiss IndexIVFPQ shape, Jegou et al. 2011
    * §V): an IVF coarse quantizer restricts the scan to nprobe cells AND
    * the in-cell scan reads 8-byte PQ codes of the RESIDUAL (v - cell
    * centroid) instead of raw vectors — the standard billion-scale
    * layout (residuals have ~1/k the variance of raw vectors, so the
    * same 64-bit budget quantizes much finer).
    *
    * 100 TB shape: corpus written partitioned by cell with codes beside
    * ids (8 B + id per vector); a query reads nprobe/k of THAT — the two
    * reductions multiply (nprobe/k of the corpus x 64x smaller rows).
    * Both codebooks are bounded driver-side samples (same regime as
    * [[trainCodebook]]/[[trainPqCodebooks]]); the ADC table
    * (queries x nprobe x M x 256 rows) is broadcast; scoring is an
    * equi-join on (cell, j, code) + partial-final sum; the exact re-rank
    * touches 64 full vectors per query. Exact-oracled:
    * [[ivfPqOracleSelect]] interpolates BOTH codebooks and replays
    * assignment, residual encoding, ADC, shortlist, and re-rank. */
  def annIvfPq(s: SparkSession, d: String): DataFrame = {
    reg(s)
    import s.implicits._
    // normalize first: ADC then ranks by L2 on the unit sphere, which is
    // monotone in cosine (same argument as annPq)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("n", sqrt(dot(col("v0"), col("v0"))))
      .select(col("vec_id"), expr("transform(v0, x -> x / n)").as("v"))
    val cents = trainCodebook(e)
    stashCodebook("ann_ivfpq", d, cents)
    val cellsDf = cents.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c")
    // residual encode: r = v - centroid(cell)
    val withCell = e.withColumn("cell", nearestCell(cents)(col("v")))
    val res = withCell.join(broadcast(cellsDf), "cell")
      .select(col("vec_id"), col("cell"),
        expr("zip_with(v, c, (x, y) -> x - y)").as("r"))
    val cbs = trainPqCodebooks(res.select(col("vec_id"), col("r")))
    stashPq("ann_ivfpq", d, cbs)
    val codeCols = (0 until PqM).map { j =>
      struct(lit(j).as("j"),
        call_function("vec_nearest_cell",
          slice(col("r"), j * PqSub + 1, PqSub),
          typedLit(cbs(j).flatten.toSeq)).as("code"))
    }
    val codes = res
      .select(col("vec_id"), col("cell"), explode(array(codeCols: _*)).as("jc"))
      .select(col("vec_id"), col("cell"), col("jc.j").as("j"),
        col("jc.code").as("code"))
    // query ADC: per probed cell, the lookup is against the QUERY residual
    // in that cell — (query, cell, j, code) -> quantized subspace distance
    val cbRows = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
    }.toSeq.toDF("j", "code", "cc")
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(probeCells(cents, IvfNProbe)(col("v"))).as("cell"))
      .join(broadcast(cellsDf), "cell")
      .select(col("query_id"), col("qv"), col("cell"),
        expr("zip_with(qv, c, (x, y) -> x - y)").as("qr"))
    val adc = q.crossJoin(cbRows)
      .select(col("query_id"), col("cell"), col("j"), col("code"),
        round(expr("aggregate(zip_with(slice(qr, j * 8 + 1, 8), cc," +
          " (x, y) -> (x - y) * (x - y)), 0d, (acc, t) -> acc + t)"), 6)
          .as("dsub"))
    val scored = codes.join(broadcast(adc), Seq("cell", "j", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy("query_id", "vec_id")
      .agg(sum("dsub").as("d2"))
    val shortlist = shortlistTopK(
      scored.select(col("query_id"), round(col("d2"), 6).as("d2r"),
        col("vec_id")), 64)
    val qFull = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv2"))
    // the shortlist is 64 ids/query — BROADCAST it so the rerank is a
    // broadcast-hash-join over the corpus scan: without the hint the
    // planner (blind to the aggregate's output size) picks a sort-merge
    // join and shuffles every full vector (measured 2.6 GB at 5M
    // vectors — the true source of the r7 "2.8 GB ADC shuffle")
    val rerank = e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(qFull), "query_id")
      .withColumn("cos", dot(col("v"), col("qv2")))
    rankedTopK(rerank, 5)
  }

  /** Write-time IVF-PQ layout: PQ ENCODING IS INGEST WORK, NOT QUERY
    * WORK — the scale probe measured the in-memory [[annIvfPq]] growing
    * ~3x/decade almost entirely in the per-vector encode (M nearest-of-
    * 256 kernel calls), which a production system pays once at write
    * time. This materializes ONE row per vector — (vec_id, codes) with
    * the M = 8 one-byte codes PACKED into a single BIGINT (code_j in
    * bits [8j, 8j+8)) — partitioned by coarse cell with both codebooks
    * beside it. That is the literal PQ storage promise: 8 bytes of code
    * per vector, and the query path reads ~nprobe/k of THAT without
    * re-encoding, exploding, or joining per-code rows (the r7 layout
    * kept 8 (j, code) rows per vector, which forced a corpus-
    * proportional join+groupBy at query time — 2.8 GB shuffle at 5M
    * vectors). Same staleness rules as [[buildIvfLayout]]. */
  def buildIvfPqLayout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    import s.implicits._
    // "2" = packed-codes schema; a stale r7 (vec_id, j, code) layout dir
    // can linger without ever being read
    val layout = graft.util.Layouts.dir("ann_ivfpq2", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        .withColumn("n", sqrt(dot(col("v0"), col("v0"))))
        .select(col("vec_id"), expr("transform(v0, x -> x / n)").as("v"))
      val cents = trainCodebook(e)
      val cellsDf = cents.toSeq.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "c")
      val res = e.withColumn("cell", nearestCell(cents)(col("v")))
        .join(broadcast(cellsDf), "cell")
        .select(col("vec_id"), col("cell"),
          expr("zip_with(v, c, (x, y) -> x - y)").as("r"))
      val cbs = trainPqCodebooks(res.select(col("vec_id"), col("r")))
      cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"${layout}_coarse")
      cbs.zipWithIndex.flatMap { case (cb, j) =>
        cb.zipWithIndex.map { case (c, code) => (j, code, c.toSeq) }
      }.toSeq.toDF("j", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"${layout}_pq")
      // pack the M codes into one long: code_j occupies bits [8j, 8j+8)
      // (each vec_nearest_cell is a codegen'd kernel call; the sum of
      // disjoint shifted bytes is the bitwise pack)
      val packed = (0 until PqM).map { j =>
        shiftleft(call_function("vec_nearest_cell",
          slice(col("r"), j * PqSub + 1, PqSub),
          typedLit(cbs(j).flatten.toSeq)).cast("bigint"), 8 * j)
      }.reduce(_ + _)
      res.select(col("vec_id"), col("cell"), packed.as("codes"))
        .write.partitionBy("cell").mode("overwrite").parquet(layout.toString)
    }
    layout
  }

  /** Bounded per-group top-k as a MERGEABLE partial+final aggregate —
    * the scale-correct form of
    * `row_number() OVER (PARTITION BY g ORDER BY key, id) <= k`: the
    * window shuffles EVERY scored row to its group's reducer
    * (corpus-proportional in the ANN family), where this keeps at most
    * k (key, id, payload) triples per group per partition, so the only
    * exchange carries k-bounded partial states (~KBs). Ordering is
    * (key asc, id asc) — callers negate the key for descending; the
    * payload rides along for output (e.g. the unrounded cosine). */
  private final class TopKOrdered(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long, Double), Array[(Double, Long, Double)],
        Array[(Long, Double)]] {
    def zero: Array[(Double, Long, Double)] = Array.empty
    def reduce(buf: Array[(Double, Long, Double)],
               x: (Double, Long, Double)): Array[(Double, Long, Double)] = {
      val n = buf.length
      if (n == cap && {
        val last = buf(n - 1)
        last._1 < x._1 || (last._1 == x._1 && last._2 <= x._2)
      }) buf
      else {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val m = buf(mid)
          if (m._1 < x._1 || (m._1 == x._1 && m._2 < x._2)) lo = mid + 1
          else hi = mid
        }
        val outN = math.min(n + 1, cap)
        val out = new Array[(Double, Long, Double)](outN)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = x
        System.arraycopy(buf, lo, out, lo + 1, outN - lo - 1)
        out
      }
    }
    def merge(a: Array[(Double, Long, Double)],
              b: Array[(Double, Long, Double)]): Array[(Double, Long, Double)] = {
      val outN = math.min(a.length + b.length, cap)
      val out = new Array[(Double, Long, Double)](outN)
      var i = 0; var j = 0; var k = 0
      while (k < outN) {
        out(k) =
          if (j >= b.length || (i < a.length && {
            val x = a(i); val y = b(j)
            x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)
          })) { val t = a(i); i += 1; t }
          else { val t = b(j); j += 1; t }
        k += 1
      }
      out
    }
    def finish(buf: Array[(Double, Long, Double)]): Array[(Long, Double)] =
      buf.map(t => (t._2, t._3))
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[(Double, Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[(Double, Long, Double)]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[(Long, Double)]]()
  }

  /** The standard ANN result tail — per-query top-k by
    * (round(cos, 6) desc, vec_id asc) emitting (query_id, rank,
    * neighbor_id, round(cos, 5)) — via [[TopKOrdered]] instead of a
    * row_number window. Row-identical to the window form (same ordering
    * and tie-break); the per-partition partial keeps k rows per query,
    * so at 50M vectors the exchange carries KBs, not the scored set.
    *
    * FALLBACK CAVEAT (r12 probe forensics): ObjectHashAggregate falls
    * back to SORT-based aggregation past
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct keys per partition — for the n-GROUP uses
    * (the graph BUILD's per-vector top-M; queries group by 10 ids and
    * never hit this) the fallback SORTS the whole scored stream per
    * partition (measured: 2.7 GB of sorter spill at a 50k-vector build,
    * ~full-stream disk at 500k). Because TopKOrdered's state is
    * k-BOUNDED, the hash map costs only ~400 B x groups-per-partition,
    * so the session mains raise the threshold to 1M (~400 MB/task worst
    * case) and the build streams through the map with zero sort — a
    * production deployment should carry the same setting on build jobs. */
  private def rankedTopK(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKOrdered(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long, Double)]())
    scored
      .groupBy("query_id")
      .agg(agg(-round(col("cos"), 6), col("vec_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p._1").as("neighbor_id"), round(col("p._2"), 5).as("cos"))
      .orderBy("query_id", "rank")
  }

  /** PQ-family ADC shortlist — per-query k smallest by (d2r asc,
    * vec_id asc) — same bounded-aggregate shape as [[rankedTopK]].
    * Input columns: (query_id, d2r, vec_id); output (query_id, vec_id). */
  private def shortlistTopK(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKOrdered(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long, Double)]())
    scored
      .groupBy("query_id")
      .agg(agg(col("d2r"), col("vec_id"), lit(0.0)).as("top"))
      .select(col("query_id"), explode(col("top")).as("p"))
      .select(col("query_id"), col("p._1").as("vec_id"))
  }

  /** IVF-PQ search over the write-time layout — identical rows to
    * [[annIvfPq]] (same deterministic codebooks), but the corpus is
    * never re-encoded OR shuffled: the scan reads only the probed cells'
    * packed-code rows (partition pruning on the driver-computed
    * probe-cell list), the ADC sum is a per-row projection against a
    * broadcast per-(query, cell) lookup array, the shortlist is a
    * 64-bounded partial+final aggregate ([[TopKOrdered]]), and the exact
    * re-rank reads full vectors for 64 ids per query. */
  def annIvfPqBucketed(s: SparkSession, d: String): DataFrame = {
    reg(s)
    import s.implicits._
    val layout = buildIvfPqLayout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_coarse")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val cbs: Array[Array[Array[Double]]] = {
      val rows = s.read.parquet(s"${layout}_pq")
        .orderBy("j", "code").collect()
      Array.tabulate(PqM)(j => rows.filter(_.getInt(0) == j)
        .map(_.getSeq[Double](2).toArray))
    }
    stashCodebook("ann_ivfpq_bucketed", d, cents)
    stashPq("ann_ivfpq_bucketed", d, cbs)
    // query vectors: a bounded collect (10 ids) so the probed-cell list
    // becomes a LITERAL isin filter -> partition pruning at the scan
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("n", sqrt(dot(col("v0"), col("v0"))))
      .select(col("vec_id"), expr("transform(v0, x -> x / n)").as("v"))
    val qVecs: Array[(Long, Array[Double])] =
      e.filter(col("vec_id").isin(queryIds: _*)).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def nearestCells(v: Array[Double], nprobe: Int): Seq[Int] =
      cents.zipWithIndex.map { case (c, i) =>
        var d2 = 0.0; var k = 0
        while (k < v.length) { val t = v(k) - c(k); d2 += t * t; k += 1 }
        (d2, i)
      }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2).toSeq
    val probed: Map[Long, Seq[Int]] =
      qVecs.map { case (id, v) => id -> nearestCells(v, IvfNProbe) }.toMap
    val allCells = probed.values.flatten.toSeq.distinct.sorted
    // per-(query, probed cell) ADC LOOKUP ARRAY (M x 256 = 2048 doubles),
    // built driver-side and BROADCAST — the scored path is then a pure
    // per-row projection over the packed codes: 8 element_at terms, no
    // join on code rows, no groupBy, no corpus-proportional shuffle
    // (the r7 shape shuffled 2.8 GB here at 5M vectors)
    val lutRows: Seq[(Long, Int, Seq[Double])] = for {
      (qid, qv) <- qVecs.toSeq
      cell <- probed(qid)
    } yield {
      val cc = cents(cell)
      val lut = new Array[Double](PqM * PqK)
      var j = 0
      while (j < PqM) {
        var code = 0
        while (code < PqK) {
          val cb = cbs(j)(code)
          var d2 = 0.0; var k = 0
          while (k < PqSub) {
            val t = (qv(j * PqSub + k) - cc(j * PqSub + k)) - cb(k)
            d2 += t * t; k += 1
          }
          // HALF_UP to match Spark round() and DuckDB round() exactly
          lut(j * PqK + code) =
            BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          code += 1
        }
        j += 1
      }
      (qid, cell, lut.toSeq)
    }
    val luts = lutRows.toDF("query_id", "cell", "lut")
    val codes = s.read.parquet(layout.toString)
      .filter(col("cell").isin(allCells: _*))
    // ADC sum as an 8-term projection: lut[j*256 + byte_j(codes)]
    val adcSum = (0 until PqM).map { j =>
      element_at(col("lut"),
        shiftright(col("codes"), 8 * j).bitwiseAND(lit(255L)).cast("int")
          + lit(j * PqK + 1))
    }.reduce(_ + _)
    val scored = codes.join(broadcast(luts), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), round(adcSum, 6).as("d2r"), col("vec_id"))
    // per-query shortlist via the bounded partial+final aggregate: each
    // partition keeps at most 64 (d2r, vec_id) pairs per query, so the
    // only exchange on the scored path carries <= partitions x queries
    // x 64 tiny structs (~KBs) — same ordering/tie-break as the r7
    // window (round(d2,6) asc, vec_id asc), so the shortlist SET is
    // identical and the exact re-rank below is unchanged
    val shortlist = shortlistTopK(scored, 64)
    val qFull = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv2"))
    // the shortlist is 64 ids/query — BROADCAST it so the rerank is a
    // broadcast-hash-join over the corpus scan: without the hint the
    // planner (blind to the aggregate's output size) picks a sort-merge
    // join and shuffles every full vector (measured 2.6 GB at 5M
    // vectors — the true source of the r7 "2.8 GB ADC shuffle")
    val rerank = e.join(broadcast(shortlist), "vec_id")
      .join(broadcast(qFull), "query_id")
      .withColumn("cos", dot(col("v"), col("qv2")))
    rankedTopK(rerank, 5)
  }

  /** Sign-LSH bucketed near-duplicate PAIRS (cos >= 0.4) — the sublinear
    * 100 TB path for embedding dedup: candidates must share >= 7 of 8
    * projection signs (own bucket + 1-bit flips), so the corpus
    * self-joins per bucket instead of all-pairs. Candidate volume is
    * sum over buckets of |b|^2 / corpus^2 of the exact join's work; at
    * 100 TB the bucket count scales up (more planes) to hold bucket
    * sizes bounded. Exact-oracle checked ([[lshPairsOracle]] replicates
    * the hash family in DuckDB); recall is additionally measured
    * against the exact [[graft.operators.Dedup.embCosinePairs]] in the
    * spec. */
  def embLshPairs(s: SparkSession, d: String): DataFrame = {
    reg(s)
    embLshPairsFrom(
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
      minCos = 0.4)
  }

  /** Core of [[embLshPairs]] over any (vec_id, v) frame — also driven by
    * the planted-duplicates recall spec. Recall contract: sign agreement
    * per plane is 1 - angle/pi, so >= 7/8 shared signs retains
    * essentially all TRUE near-duplicates (cos >= 0.9 -> ~97%+) but only
    * a sample of weak-similarity pairs (cos ~ 0.45 -> ~17%); use the
    * exact block-nested join (Dedup.embCosinePairs) when the threshold
    * sits in that regime. */
  def embLshPairsFrom(vecs: DataFrame, minCos: Double): DataFrame = {
    reg(vecs.sparkSession)
    val e = vecs
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v")))
    val probed = e.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("n").as("nb"), explode(probes(col("bkt"))).as("bkt"))
    e.join(probed, Seq("bkt"))
      .filter(col("vec_id") < col("id_b"))
      .select(col("vec_id").as("id_a"), col("id_b"),
        (dot(col("v"), col("vb")) / (col("n") * col("nb"))).as("cos0"))
      .filter(col("cos0") >= minCos)
      .groupBy("id_a", "id_b").agg(round(max("cos0"), 5).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication — cluster the
    * embedding space with the deterministic k-means codebook, then
    * WITHIN each cluster remove every vector that is cos >= tau to an
    * earlier-ranked clustermate (rank = distance to own centroid, the
    * paper's kept-representative rule, ties by id). The design point is
    * that clustering BOUNDS the quadratic: pair work is sum over cells
    * of |cell|^2, never corpus^2, and at 100 TB k grows with the corpus
    * to hold cell sizes flat while cells process embarrassingly
    * parallel (one shuffle on cell id). Emits one row per REMOVED
    * vector with its keeper and similarity. Exact-oracle checked via
    * the interpolated codebook (same trick as IVF/PQ). */
  def semDedup(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val tau = 0.4
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = trainCodebook(e)
    stashCodebook("dedup_semantic", d, cents)
    import s.implicits._
    val cells = cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "c")
    val assigned = e
      .withColumn("cell", nearestCell(cents)(col("v")))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .join(broadcast(cells), "cell")
      .withColumn("d2c", expr(
        "aggregate(zip_with(v, c, (x, y) -> (x - y) * (x - y))," +
          " 0d, (acc, t) -> acc + t)"))
      .withColumn("rk", row_number().over(Window.partitionBy("cell")
        .orderBy(round(col("d2c"), 6).asc, col("vec_id").asc)))
      .select("cell", "vec_id", "v", "n", "rk")
    val a = assigned.select(col("cell"), col("vec_id").as("keep_id"),
      col("v").as("va"), col("n").as("na"), col("rk").as("rka"))
    val removed = assigned.join(a, "cell")
      .filter(col("rka") < col("rk"))
      .withColumn("cos", dot(col("v"), col("va")) / (col("n") * col("na")))
      .filter(col("cos") >= tau)
      .groupBy(col("vec_id"), col("cell"))
      .agg(min(struct(col("rka"), col("keep_id"), col("cos"))).as("kp"))
      .select(col("vec_id"), col("cell"), col("kp.keep_id").as("kept_id"),
        round(col("kp.cos"), 5).as("cos"))
      .orderBy("vec_id")
    removed
  }

  /** Cross-modal subcorpus diagnostic: per-language embedding CENTROIDS
    * (embeddings joined to documents on the id) and the cosine between
    * every language pair's centroid — the drift check a training
    * pipeline runs per data source. Fully relational: posexplode to
    * (lang, dim, x), one partial+final avg per (lang, dim), centroid
    * components QUANTIZED to 6 decimals before the cosine (same trick
    * as tf-idf's idf: both engines then fold identical doubles), and a
    * tiny (langs x dims) self-join for the pairwise cosine. Scales as
    * one corpus scan + one narrow shuffle; the pair stage is
    * vocabulary-sized, not corpus-sized. */
  def embLangCentroids(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("v"))
    val docs = Tables.documents(s, d).select("doc_id", "lang")
    val cent = e.join(docs, "doc_id")
      .select(col("lang"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("lang", "pos")
      .agg(round(avg("x"), 6).as("m"))
    cent.as("a")
      .join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(
        sum(col("a.m") * col("b.m")).as("dotp"),
        sum(col("a.m") * col("a.m")).as("na"),
        sum(col("b.m") * col("b.m")).as("nb"))
      .select(col("lang_a"), col("lang_b"),
        round(col("dotp") / (sqrt(col("na")) * sqrt(col("nb"))), 4).as("cos"))
      .orderBy("lang_a", "lang_b")
  }

  /** 16 deterministic ±1 JL sign rows (splitmix64 stream, distinct
    * seed from [[planes]]). Database-friendly random projections
    * (Achlioptas 2003): ±1 entries preserve the Johnson-Lindenstrauss
    * distance guarantee while the projection is pure add/subtract. */
  private val jlSigns: Array[Array[Double]] = Array.tabulate(16) { j =>
    var x = 0xBF58476D1CE4E5B9L * (j + 3)
    Array.fill(64) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      if ((((x * 0x2545F4914F6CDD1DL) >>> 11) & 1L) == 0L) 1.0 else -1.0
    }
  }

  /** Johnson-Lindenstrauss random projection 64 -> 16 dims with a
    * distance-preservation report. Projection p_j = (1/sqrt(16)) *
    * <v, sign_j> runs as 16 native vec_dot kernels against broadcast
    * literal sign rows — one corpus scan, zero shuffle, whole-stage
    * codegen: exactly how a 100 TB corpus halves its ANN cost before
    * bucketing. The report pairs the first 64 vectors (deterministic,
    * k-bounded at any SF) and emits original vs projected Euclidean
    * distance and their ratio — E[ratio^2] = 1 with std ~ sqrt(2/k) by
    * the JL lemma (the spec pins the envelope). Distances via the
    * three-dot-product identity on both engines; projected coords
    * quantized at 1e-6 before distancing -> exact oracle. */
  def embRandomProjection(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val proj = emb.select(col("vec_id"), col("v"),
      array((0 until 16).map(j =>
        round(dot(col("v"), typedLit(jlSigns(j).toSeq)) * 0.25, 6)): _*)
        .as("p"))
    val sample = proj.orderBy("vec_id").limit(64)
    val a = sample.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("p").as("pa"))
    val b = sample.select(col("vec_id").as("id_b"), col("v").as("vb"),
      col("p").as("pb"))
    a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .withColumn("d2o", greatest(lit(0.0),
        dot(col("va"), col("va")) + dot(col("vb"), col("vb"))
          - lit(2.0) * dot(col("va"), col("vb"))))
      .withColumn("d2p", greatest(lit(0.0),
        dot(col("pa"), col("pa")) + dot(col("pb"), col("pb"))
          - lit(2.0) * dot(col("pa"), col("pb"))))
      .select(col("id_a"), col("id_b"),
        round(sqrt(col("d2o")), 5).as("d_orig"),
        round(sqrt(col("d2p")), 5).as("d_proj"),
        // duplicate vectors give d_orig = 0; pin the 0/0 case to NULL on
        // both engines rather than inherit each engine's NaN/div-by-zero
        // convention
        when(col("d2o") > 0,
          round(sqrt(col("d2p")) / sqrt(col("d2o")), 4)).as("ratio"))
      .orderBy("id_a", "id_b")
  }

  /** Embedding-space outlier report: distance of each vector to the
    * corpus centroid, z-scored — the "far from the data manifold"
    * quality signal (mislabeled / corrupted / off-distribution samples
    * cluster in the tail; SemDeDup's prototype-distance cousin). Two
    * scans + a broadcast 1-row centroid/moment state: centroid = one
    * partial+final per-dim average; distances via the three-dot-product
    * identity against the broadcast centroid (native vec_dot, codegen);
    * moments from 6dp-quantized distance sums (the rel_q19 precedent —
    * engines' native stddev partials merge in different orders) so the
    * z-scores replay exactly. Top-20 by |z| (deterministic tiebreak).
    * Centroid coordinates quantized at 6dp before distancing — exact
    * oracle. */
  def embOutliers(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dim = 64
    val cent = emb
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(round(avg("x"), 6).as("m"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
        .as("cm"))
      .select(transform(col("cm"), e => e.getField("m")).as("c"))
    val dists = emb.crossJoin(broadcast(cent))
      .withColumn("dist", round(sqrt(greatest(lit(0.0),
        dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), col("c"))
          + dot(col("c"), col("c")))), 6))
      .select("vec_id", "dist")
    val st = dists.agg(
      count(lit(1)).as("n"),
      round(sum("dist"), 6).as("msum"),
      round(sum(col("dist") * col("dist")), 6).as("ssum"))
    dists.crossJoin(broadcast(st))
      .withColumn("z", round(
        (col("dist") - col("msum") / col("n")) /
          sqrt((col("ssum") - col("msum") * col("msum") / col("n"))
            / (col("n") - 1)), 4))
      .select(col("vec_id"), col("dist"), col("z"))
      .orderBy(abs(col("z")).desc, col("vec_id").asc)
      .limit(20)
  }

  /** k-NN GRAPH build: every vector's top-3 cosine neighbors among its
    * sign-LSH bucket and the 8 one-bit-flip probes — the batch backbone
    * of semantic clustering / SemDeDup-style graph methods. Unlike
    * [[annLsh]] (tiny broadcast query set), BOTH sides here are the
    * corpus, so the probe side is NOT broadcast: the plan is a plain
    * shuffle equi-join on the bucket id — each bucket's candidates
    * co-locate, candidate volume is sum over buckets of
    * |bucket| x |probers|, never corpus^2, and the per-query top-3 is
    * the bounded [[TopKOrdered]] aggregate (the exchange carries <= 3
    * rows per query — output-sized). Each (query, neighbor) pair matches at
    * most once (a vector lives in ONE bucket; the 9 probed ids are
    * distinct), so no dedup step is needed. Interpolated plane
    * literals make the bucketing engine-identical -> exact oracle. */
  def annKnnGraph(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .withColumn("bkt", bucket(col("v")))
    val q = e.select(col("vec_id").as("query_id"), col("v").as("qv"),
      col("n").as("qn"), explode(probes(col("bkt"))).as("bkt"))
    val scored = e.join(q, Seq("bkt"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 3)
  }

  /** Distances of every vector to each of the current centroids, as an
    * expanded-square projection (||v||² − 2 v·c + ||c||²; the v·c term
    * is one [[dot]] kernel per centroid against an array LITERAL, so
    * the whole assignment is a zero-shuffle codegen'd map). Distances
    * are clamped at 0 (float cancellation near a centroid) and
    * QUANTIZED to 6 decimals before the argmin, so both engines rank
    * identical doubles; ties break to the lowest cluster id
    * (array_position returns the FIRST minimal slot). */
  private def kmAssign(e: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val vv = dot(col("v"), col("v"))
    val dists = array(cents.map { c =>
      val cc = c.map(x => x * x).sum
      round(greatest(lit(0.0), vv - lit(2.0) * dot(col("v"), typedLit(c.toSeq))
        + lit(cc)), 6)
    }: _*)
    e.withColumn("dists", dists)
      .withColumn("cluster",
        (array_position(col("dists"), array_min(col("dists"))) - 1).cast("int"))
      .withColumn("dist", element_at(col("dists"), col("cluster") + 1))
  }

  /** Distributed Lloyd's k-means over the full embeddings table — the
    * clustering primitive semantic-dedup / IVF coarse quantizers are
    * built on, here as a first-class entry with a fully INDEPENDENT
    * oracle (DuckDB replays the same deterministic iterations from the
    * same init — not a Spark-trained codebook inlined into the SQL).
    *
    * Scale shape: per iteration the corpus is SCANNED once — assignment
    * is a broadcast-literal map ([[kmAssign]]), the centroid update is
    * one partial+final avg per (cluster, dim) — and only the k×dim
    * rounded means (k-bounded) return to the driver. No corpus-sized
    * shuffle or state anywhere; at 100 TB each iteration is exactly one
    * pass with a (k·dim)-row aggregate, the textbook Spark k-means.
    * Determinism: init = the k lowest-vec_id vectors; empty clusters
    * keep their previous centroid; means quantized to 6 decimals (same
    * trick as tf-idf's idf — both engines then fold identical doubles
    * next iteration). */
  def embKmeans(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val k = 8
    val iters = 3
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    var cents: Array[Array[Double]] = e.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    var assigned: DataFrame = null
    for (it <- 1 to iters) {
      assigned = kmAssign(e, cents)
      if (it < iters) {
        val means = assigned
          .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("cluster", "pos").agg(round(avg("x"), 6).as("m"))
          .collect() // k x dim rows — k-bounded, never corpus-shaped
        val next = cents.map(_.clone()) // empty clusters carry over
        means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
        cents = next
      }
    }
    e.unpersist() // final assignment re-reads the scan lazily if needed
    assigned
      .select(col("vec_id"), col("cluster"), col("dist"))
      .orderBy("vec_id")
  }

  /** Greedy k-center (farthest-point) coreset selection over the
    * embeddings — the data-SELECTION primitive (pick a maximally
    * diverse k-subset as a coverage coreset / eval probe set /
    * annotation batch), complementing [[embKmeans]] (partition
    * everything) and [[embDbscan]] (density families). Gonzalez's
    * 2-approximation: start from the lowest vec_id, then k−1 times pick
    * the point FARTHEST from the selected set; the reported `radius`
    * (the picked point's min-distance at selection, i.e. the coverage
    * radius before it joined) is non-increasing by construction — a
    * spec asserts that invariant.
    *
    * Scale shape: each round is ONE scan of the cached table — the
    * min-distance is an `array_min` over per-center expanded-square
    * kernels against array LITERALS (zero shuffle), and the argmax is a
    * 1-row TakeOrdered; only the picked row returns to the driver.
    * Round r evaluates r kernels, k²/2 total — but all r share the
    * round's single deserialize pass over the cached vectors, which is
    * the actual cost at the gate k = 16 (measured at 100x = 5M vectors:
    * 29 s warm, 512 B shuffle, zero spill — linear in n for fixed k).
    * MATERIALIZING the running min instead (persist (vec_id, v, md) per
    * round, `least`-fold one new kernel) pays a full cache re-write per
    * round for the k²/2 → k kernel saving; tried and rejected here —
    * the double-generation churn OOMs an 8g heap at 100x while saving
    * only flops the shared scan already amortizes. It becomes the right
    * trade when k is large enough that kernel flops dominate the scan
    * (k ≳ a few hundred at this dim).
    * Determinism: distances quantized to 6 decimals before the argmax
    * (the [[kmAssign]] trick), ties break to the lowest vec_id; centers
    * are DATA POINTS (full-precision literals), so unlike k-means no
    * computed values feed later rounds and the DuckDB oracle replays
    * every round bit-exactly from the same least-chained arithmetic
    * (min of independently rounded kernels = the rounded set's min). */
  def embKcenter(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val k = 16
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val vv = dot(col("v"), col("v"))
    def distTo(c: Array[Double]): Column = {
      val cc = c.map(x => x * x).sum
      round(sqrt(greatest(lit(0.0),
        vv - lit(2.0) * dot(col("v"), typedLit(c.toSeq)) + lit(cc))), 6)
    }
    val first = e.orderBy("vec_id").limit(1).collect()(0)
    var sel = Vector(first.getSeq[Double](1).toArray)
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])](
      (0, first.getLong(0), None))
    for (r <- 1 until k) {
      val picked = e
        .withColumn("md", array_min(array(sel.map(distTo): _*)))
        .orderBy(col("md").desc, col("vec_id").asc).limit(1)
        .select("vec_id", "v", "md").collect()(0) // 1 row — k-bounded
      sel :+= picked.getSeq[Double](1).toArray
      picks += ((r, picked.getLong(0), Some(picked.getDouble(2))))
    }
    e.unpersist()
    import s.implicits._
    picks.toSeq.toDF("sel_rank", "vec_id", "radius")
  }

  /** Unrolled DuckDB replay of [[embKcenter]]: p0 = lowest vec_id, then
    * m_r carries the least-chained 6dp min-distance (same values as the
    * Spark side's array_min over independently rounded kernels — min of
    * the same rounded set), p_r the (md DESC, vec_id ASC) argmax. Each
    * m_r MUST be MATERIALIZED: it is referenced twice (by m_{r+1} and by
    * p_r, which m_{r+1} also joins), so DuckDB's default CTE inlining
    * would expand the depth-16 chain into 2^15 scans of the base table
    * ("too many open files" observed live at k=16). */
  private val kcenterOracle: String = {
    val k = 16
    def distSql(centerCte: String): String =
      s"""round(sqrt(greatest(0.0, list_dot_product(e.v, e.v)
         - 2.0 * list_dot_product(e.v, $centerCte.v)
         + list_dot_product($centerCte.v, $centerCte.v))), 6)"""
    val iters = (1 until k).map { r =>
      val md =
        if (r == 1) distSql("p0")
        else s"least(e.md, ${distSql(s"p${r - 1}")})"
      s"""m$r AS MATERIALIZED (SELECT e.vec_id, e.v, $md AS md
            FROM ${if (r == 1) "emb" else s"m${r - 1}"} e
            CROSS JOIN p${r - 1}),
          p$r AS (SELECT vec_id, v, md FROM m$r
            ORDER BY md DESC, vec_id ASC LIMIT 1)"""
    }.mkString(",\n")
    val out = (1 until k)
      .map(r => s"SELECT $r AS sel_rank, vec_id, md AS radius FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        p0 AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 1),
        $iters
        SELECT 0 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS radius FROM p0
        UNION ALL $out
        ORDER BY sel_rank"""
  }

  /** GRAPH-based ANN — the navigable-graph (HNSW-class) search shape,
    * the one modern ANN family the r9 verdict listed missing. This is
    * the deterministic single-layer variant (NSW-style): HNSW proper
    * seeds its layer assignment from an RNG, which no exact oracle
    * could replay, so the hierarchy is replaced by a FIXED entry set
    * and the search by a width-W beam over a degree-M neighbor graph —
    * the same greedy-descent mechanics, deterministic end to end.
    *
    *  - Graph build ([[buildGraphLayout]], UNTIMED load phase like the
    *    LSH/IVF layouts): the [[annKnnGraph]] construction at
    *    out-degree M = 8 over the denser 2-bit probe pool
    *    ([[probes2]]), made undirected — bucketed, output-sized
    *    exchanges, written once at ingest exactly as HNSW construction
    *    is. The gate keeps the FIXED 8-plane family (exact-oracle
    *    parity), under which per-bucket population grows with the
    *    corpus; a production build raises the plane count so buckets
    *    track n (the [[buildLshLayout]] write-time pattern, decade-
    *    proved there), which the hash family supports without changing
    *    the search. Probe policy: auditAtBase (see
    *    PipelineScaleProbe).
    *  - Search: entry set = vec_id < [[GraphEntryBound]] (64); L =
    *    [[GraphL]] (4) unrolled rounds of: candidates = beam ∪
    *    neighbors(beam), exact-cosine score, keep top-W = [[GraphW]]
    *    (16) per query by (round(cos,6) desc, id asc). The constants
    *    are shared vals interpolated into BOTH the Spark plan and the
    *    DuckDB oracle (the BloomJoinM discipline) so they cannot drift
    *    one-sided.
    *    Each round's candidate set is ≤ |Q|·W·(M+1) rows — broadcast
    *    against the graph and the vector table, so the per-round joins
    *    are point-lookup-shaped, never corpus-shaped; at 100 TB the
    *    graph is a bucketed table and beam expansion touches O(W·M)
    *    rows per query per round (the sub-linear search HNSW exists
    *    for), while [[annTopK]] stays the brute-force audit.
    *
    * Exact oracle: everything is deterministic (fixed entries, fixed
    * rounds, quantized tie-breaks), so DuckDB replays build + L rounds
    * as unrolled CTEs and must match bit-for-bit. Measured recall@5 vs
    * [[annTopK]]: 0.88 at sf0.01 (PipelineOpsSpec pins a floor). */
  /** Shared navigable-graph constants — interpolated into the Spark
    * plan AND the DuckDB oracle, which must stay in bit-for-bit
    * lockstep. */
  private val GraphM = 8          // out-degree of the neighbor graph
  private val GraphW = 16         // beam width per round
  private val GraphL = 4          // unrolled beam-expansion rounds
  private val GraphEntryBound = 64 // entry set: vec_id < bound

  /** The navigable-graph edge build behind [[annGraphSearch]]:
    * out-degree-M knn edges from the 2-bit-probe candidate pool, made
    * UNDIRECTED (the NSW navigability trick — reverse links let the
    * beam climb out of a poor entry neighborhood; 1-bit-built directed
    * edges capped recall at 0.66, this build measures 0.88 vs the
    * exact top-5). */
  private def graphEdges(s: SparkSession, d: String, m: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val eb = e.withColumn("bkt", bucket(col("v")))
    val qside = eb.select(col("vec_id").as("query_id"), col("v").as("qv"),
      col("n").as("qn"), explode(probes2(col("bkt"))).as("bkt"))
    val fwd = rankedTopK(
      eb.join(qside, Seq("bkt"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn"))),
      m)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Write-time graph layout (the HNSW-build analogue): graph
    * construction is INGEST work, not query work — same contract as
    * [[buildLshLayout]]/[[buildIvfLayout]] (bench/probe build it in the
    * untimed load phase; a cold call falls back to building inline). */
  def buildGraphLayout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    val layout = graft.util.Layouts.dir("ann_graph", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      graphEdges(s, d, GraphM)
        .write.mode("overwrite").parquet(layout.getPath)
    }
    layout
  }

  /** The width-[[GraphW]] / [[GraphL]]-round beam search over an
    * arbitrary (src, dst) neighbor graph — shared by the fixed-family
    * gate entry and the n-scaled production build. `e` is the
    * (vec_id, v, n) corpus frame; the beam/candidate frames stay
    * |Q|-bounded throughout, so every join here is point-lookup-shaped
    * regardless of corpus size. */
  private def beamSearch(e: DataFrame, edges: DataFrame): DataFrame =
    beamSearchAudited(e, edges)._1

  /** [[beamSearch]] plus its audit frame: the DISTINCT (query_id,
    * vec_id) pairs the search scored across all rounds — the
    * scored-candidate budget the hierarchical variant must beat at equal
    * beam width (PipelineOpsSpec). `rounds` widens the unrolled loop;
    * `extraEntry` unions per-query seed rows into the fixed entry set
    * (the scaled variant's quantizer seeding — see [[annGraphScaled]]). */
  private[graft] def beamSearchAudited(
      e: DataFrame, edges: DataFrame,
      rounds: Int = GraphL,
      extraEntry: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val W = GraphW; val L = rounds
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"))
    def score(cand: DataFrame): DataFrame = cand
      .join(e.select("vec_id", "v", "n"), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    def topW(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= W)
        .select("query_id", "vec_id", "cos")
    }
    val entry0 = q.select(col("query_id"))
      .crossJoin(e.filter(col("vec_id") < GraphEntryBound).select(col("vec_id")))
    val entry = extraEntry
      .map(x => entry0.unionByName(x).distinct())
      .getOrElse(entry0)
    var scoredSets = Seq(entry.select("query_id", "vec_id"))
    // the beam is referenced twice per round (cand = beam ∪ neighbors,
    // then re-rank): checkpoint the |Q|·W-row beam each round or the
    // lineage doubles per round (2^L recompute at the scaled L)
    var beam = topW(score(entry)).localCheckpoint(true)
    for (_ <- 1 to L) {
      val expand = beam.select(col("query_id"), col("vec_id").as("src"))
        .join(edges, Seq("src"))
        .select(col("query_id"), col("dst").as("vec_id"))
      val cand = beam.select("query_id", "vec_id")
        .unionByName(expand).distinct()
      scoredSets :+= cand
      beam = topW(score(cand)).localCheckpoint(true)
    }
    val w5 = Window.partitionBy("query_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)
    val res = beam.withColumn("rank", row_number().over(w5).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 5).as("cos"))
      .orderBy("query_id", "rank")
    (res, scoredSets.reduce(_ unionByName _).distinct())
  }

  def annGraphSearch(s: SparkSession, d: String): DataFrame =
    annGraphSearchAudited(s, d)._1

  private[graft] def annGraphSearchAudited(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val layout = buildGraphLayout(s, d)
    beamSearchAudited(e, s.read.parquet(layout.getPath))
  }

  // ---- n-scaled production graph build (r10 verdict #2) ------------------

  /** Target bucket population for the scaled build's hash family. */
  private val GraphTargetBucket = 64

  /** Per-bucket candidate cap for the scaled build. The plane count
    * holds the MEAN bucket near [[GraphTargetBucket]], but real corpora
    * are clustered (near-duplicate embeddings share every sign bit —
    * measured: the synthetic corpus at 500k vectors put 6 205 candidates
    * per vector through a mean-64 family), so the bound must hold by
    * CONSTRUCTION, not by expectation: each bucket contributes at most
    * its [[GraphBuildCap]] lowest-vec_id members as candidates, making
    * candidates/vector ≤ cap·(P+1) under ANY skew. vec_id order (not a
    * hash) keeps the sample aligned with the id-ascending tie-break the
    * exact top-k uses, so cos-tied duplicate clusters resolve to the
    * same representatives. */
  private val GraphBuildCap = 32

  /** Plane count that tracks the corpus: P = max(3, ceil(log2(n/T)))
    * holds per-bucket population ≈ [[GraphTargetBucket]] at any n, so
    * candidate volume per vector is ≈ T·(P+1) — bounded by a LOG of the
    * corpus size, where the fixed 8-plane gate family grows linearly
    * ([[PipelineScaleProbe]] auditAtBase note: ~36B candidate pairs at
    * 500k vectors; this build measures ~450M there). The floor is 3,
    * not the fixed family's 8: an 8-plane floor at the 500-vector gate
    * SFs makes 256 buckets of ~2 members — a graph built from ~18
    * candidates per node, recall-capped at 0.56-0.60 no matter how the
    * walk is seeded. P = 3 restores the design's own mean-bucket ≈ T
    * at tiny n (8 buckets × ~62); production corpora (n ≥ 2^3·T = 512)
    * are governed by the log term either way. */
  private[graft] def scaledPlaneCount(n: Long): Int =
    math.max(3, math.ceil(
      math.log(math.max(n, 1).toDouble / GraphTargetBucket) / math.log(2.0)
    ).toInt)

  /** P-plane sign bucket (codegen'd — plane literals + vec_dot). */
  private def bucketN(v: Column, pl: Array[Array[Double]]): Column =
    pl.indices.map { p =>
      when(dot(v, typedLit(pl(p).toSeq)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Query bucket + its P 1-bit flips (the scaled family's probe set:
    * 2-bit flips would square the probe count as P grows — the scaled
    * build keeps P+1 probes and buys recall back with bucket granularity
    * that TRACKS n instead). */
  private def probes1N(b: Column, p: Int): Column =
    array(b +: (0 until p).map(i => b.bitwiseXOR(lit(1 << i))): _*)

  /** 1-bit + 2-bit flip masks of a P-plane bucket (the [[flips2]]
    * family generalized to any P). */
  private def masks2N(p: Int): Seq[Int] =
    (0 until p).map(1 << _) ++
      (for (i <- 0 until p; j <- i + 1 until p) yield (1 << i) | (1 << j))

  /** Bucket + 1-bit + 2-bit flip probe set for a P-plane family —
    * used by [[annGraphAppend]]'s candidate generation (per-BATCH-
    * VECTOR work, O(P²) probes affordable; appended edges persist, so
    * candidate quality is graph quality). NOT used for search SEEDING:
    * measured at 500k vectors, 2-bit seeds REGRESSED recall@5 0.72 →
    * 0.58 — the broad low-precision entry pool dilutes the W=16 beam
    * with high-cos-but-poorly-connected entries — while at the gate
    * SFs the P = 3 floor alone already lifts recall to 0.84 / 0.92.
    * The shipped seeding stays 1-bit ([[probes1N]]). */
  private def probes2N(b: Column, p: Int): Column =
    array(b +: masks2N(p).map(m => b.bitwiseXOR(lit(m))): _*)

  /** The skew-proof per-bucket candidate cap as a BOUNDED min-k
    * partial+final aggregate over (bkt, vec_id) IDS ONLY — emits the
    * ≤[[GraphBuildCap]] lowest-vec_id members of every bucket as
    * (bkt, vec_id) rows. The r11 form — `row_number() OVER (PARTITION
    * BY bkt ORDER BY vec_id)` — was a window: ALL members of a bucket
    * (full 64-double vectors and norms included) land in one task and
    * get SORTED before the `<= cap` filter drops them (measured 2.7 GB
    * of disk spill at 500k vectors; a degenerate near-dup corpus makes
    * the biggest bucket O(n) rows in a single-task sort that no
    * plane-count growth fixes, since identical vectors share every
    * sign bit at any P). Here each partition keeps at most cap ids per
    * bucket ([[TopKOrdered]]), the one exchange carries cap-bounded
    * ids-only partial states, and callers re-join vectors only for the
    * capped representatives. The selected set is identical by
    * construction (same lowest-ids-per-bucket rule; the double sort
    * key is exact for ids < 2^53). */
  private def cappedBucketIds(eb: DataFrame): DataFrame = {
    val agg = udaf(new TopKOrdered(GraphBuildCap),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long, Double)]())
    eb.select(col("bkt"), col("vec_id"))
      .groupBy("bkt")
      .agg(agg(col("vec_id").cast("double"), col("vec_id"), lit(0.0))
        .as("top"))
      .select(col("bkt"), explode(col("top")).as("p"))
      .select(col("bkt"), col("p._1").as("vec_id"))
  }

  /** Recorded plane count per dataset dir — the [[trainedCodebooks]]
    * convention: the oracle must interpolate the exact plane family the
    * query derived from the corpus count. */
  private val scaledGraphP =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()
  @volatile private var lastScaledDir: String = null
  // the append entry keeps its OWN last-dir slot: sharing lastScaledDir
  // would let a cross-dir append evict the scaled entries' fallback key
  // and silently drop their oracles from a no-arg dump (r12 review)
  @volatile private var lastAppendDir: String = null

  private def scaledPFor(s: SparkSession, d: String): Int = {
    val p = scaledGraphP.computeIfAbsent(d,
      _ => scaledPlaneCount(Tables.embeddings(s, d).count()))
    lastScaledDir = d
    p
  }

  /** The production navigable-graph BUILD: out-degree-[[GraphM]] knn
    * edges from an n-SCALED sign-LSH candidate pool. Plan shape: one
    * bucket-keyed shuffle of (P+1) ids+vector probe rows per vector
    * (≈ n·(P+1) rows — linear in n with a log-n factor), candidates
    * scored inside the joined stage by the native kernel, and the
    * per-vector top-M taken by the BOUNDED [[TopKOrdered]] partial+final
    * aggregate — the scored pair stream is never shuffled. Undirected
    * closure is one ids-only exchange of n·M edges. This is the build
    * the fixed-family gate variant's auditAtBase note promises: candidate
    * volume per vector ≈ T·(P+1) stays ~constant-per-vector across
    * decades (measured rows in SURVEY §8), where the fixed family's
    * grows linearly. */
  /** Approx-shortlist width of the scaled build's probe stage:
    * [[GraphM]] exact edges are re-ranked out of 2·M SQ8-shortlisted
    * candidates per vector. The asymmetric estimator (query quantized,
    * candidate exact — the [[annSq8Packed]] direction reversed) keeps
    * per-dim error ≤ range/510, so the exact top-M sits inside the
    * approx top-2M wherever the rank-M→2M cosine gap exceeds the
    * accumulated recon error — pinned exactly (edge-set equality vs
    * the float build) in PipelineOpsSpec at both gate SFs. */
  private val GraphShortlist = 2 * GraphM

  /** The forward (directed) half of the scaled build as a PURE plan —
    * split out so the window-free plan assertion can inspect the whole
    * candidate-scoring subtree (the eager materialization in
    * [[graphEdgesScaled]] would otherwise execute and hide it).
    *
    * SHUFFLE-BYTE DISCIPLINE (r12 verdict #2): the probe stream — the
    * build's dominant exchange, n·(P+1) rows — carries 64 SQ8 CODE
    * BYTES per vector instead of the 512-byte float64 array (measured
    * 43.6 GB of shuffle at the 5M probe with float probes). Scoring
    * against the code side is the fused `sq8_dot` decode-dot kernel
    * (candidate side exact floats — the asymmetric estimator, half the
    * error of code×code); the per-vector approx top-[[GraphShortlist]]
    * is the bounded [[TopKOrdered]] aggregate, and only those ids
    * re-join full-precision vectors (two uniform vec_id-keyed
    * exchanges of the base table) for the exact top-[[GraphM]] rank —
    * the `ann_sq8` rerank discipline applied to the build itself. */
  private[graft] def graphFwdEdgesScaled(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val p = scaledPFor(s, d)
    val pl = planesN(p)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    // per-dimension SQ8 bounds as plan literals (one 1-row bounded
    // collect — exact min/max doubles, no FP-order dependence)
    val bRow = sq8Bounds(e.select(col("vec_id"), col("v"))).collect()(0)
    val qlo = typedLit(bRow.getSeq[Double](0))
    val qhi = typedLit(bRow.getSeq[Double](1))
    val eb = e.withColumn("bkt", bucketN(col("v"), pl))
    // candidate side: at most GraphBuildCap lowest-id members per bucket
    // (the skew-proof bound — see the cappedBucketIds scaladoc), vectors
    // re-joined for the capped representatives only (one vec_id-keyed
    // exchange of the base table — uniform unique key, no skew)
    val capped = e.join(
      cappedBucketIds(eb).select(col("vec_id").as("capped_id"), col("bkt")),
      col("vec_id") === col("capped_id"))
      .drop("capped_id")
    val qside = eb.select(col("vec_id").as("query_id"),
      call_function("sq8_encode", col("v"), qlo, qhi).as("qcode"),
      col("n").as("qn"), explode(probes1N(col("bkt"), p)).as("bkt"))
    // SHUFFLE_HASH on the capped side: the planner's default here is a
    // sort-merge join, which SORTS the n·(P+1)-row probe stream
    // (hundreds of MB of sorter spill per decade for rows the join
    // could stream); hashing the ≤cap·2^P capped side per partition
    // costs MBs and the probe stream is never sorted. The scored output
    // feeds the bounded TopKOrdered partial aggregate map-side (see
    // [[rankedTopK]]'s fallback note on the r12 probes).
    val short = shortlistTopK(
      capped.hint("shuffle_hash").join(qside, Seq("bkt"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("d2r", -round(
          call_function("sq8_dot", col("qcode"), qlo, qhi, col("v"))
            / (col("n") * col("qn")), 6)),
      GraphShortlist)
    // exact re-rank of the ids-only shortlist: re-join float vectors
    // for BOTH ends (n·2M shortlist rows against the uniform-keyed base
    // table; shuffle_hash — neither side needs a sort)
    val rerank = short
      .join(e.hint("shuffle_hash").select("vec_id", "v", "n"), Seq("vec_id"))
      .join(e.hint("shuffle_hash").select(col("vec_id").as("query_id"),
        col("v").as("qv"), col("n").as("qn")), Seq("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    rankedTopK(rerank, GraphM)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
  }

  /** Undirected closure of [[graphFwdEdgesScaled]]. The forward edges
    * feed the union TWICE (fwd ∪ reverse); without the eager
    * materialization the whole candidate-scoring subtree executes
    * twice — measured as a full 2x on every build metric (r12 probe). */
  private[graft] def graphEdgesScaled(s: SparkSession, d: String): DataFrame = {
    val fwd = graphFwdEdgesScaled(s, d).localCheckpoint(true)
    fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** `ann_graph_scaled` gate entry: the n-scaled BUILD (unconditional —
    * the build IS what this entry times and proves; no layout cache, so
    * every timed row measures construction, not a warm read) followed
    * by the [[beamSearchAudited]] walk seeded from the query's own
    * quantizer buckets (see the body comment). Exact oracle: the plane
    * family is deterministic given the corpus count, recorded per-dir
    * and interpolated ([[trainedCodebooks]] convention); at the
    * 500-vector gate SFs [[scaledPlaneCount]] gives P = 3 (8 buckets ≈
    * the design's mean-[[GraphTargetBucket]] target), and the oracle
    * replays that exact family, probe sets, cap, and seeding. */
  def annGraphScaled(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val p = scaledPFor(s, d)
    val pl = planesN(p)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    // quantizer-seeded entry (the coarse-quantizer-seeds-the-graph-walk
    // hybrid, the DiskANN/SPANN shape): each query's beam starts at the
    // capped members of its own bucket and its P 1-bit-flip probes, in
    // addition to the fixed global set, so the walk begins inside the
    // right neighborhood instead of having to traverse there — a
    // fixed-entry beam cannot cross a log-n-diameter graph (measured
    // recall@5 at 500k vectors: 0.34 unseeded at L = 4, 0.36 unseeded
    // even at L = P = 13 rounds, 0.52 own-bucket-seeded, 0.72 with
    // 1-bit probe seeding; the gate's exact-oracle twin of this number
    // is the row itself). The seed probes stay 1-BIT: the denser 2-bit
    // set was tried in r12 and REGRESSED 500k recall to 0.58 (see
    // [[probes2N]]'s scaladoc) — precision of the entry pool matters
    // more than its breadth once the graph is navigable. Entry work
    // per query is ≤ GraphEntryBound + GraphBuildCap·(P+1) rows —
    // corpus-size-independent.
    val eb = e.withColumn("bkt", bucketN(col("v"), pl))
    val seed = eb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"),
        explode(probes1N(col("bkt"), p)).as("bkt"))
      .join(cappedBucketIds(eb), Seq("bkt"))
      .select("query_id", "vec_id")
    // materialize the edge table ONCE: every checkpointed beam round
    // references `edges`, and an un-materialized build would re-execute
    // per round (measured 65 s vs 26 s at 500k vectors)
    val edges = graphEdgesScaled(s, d).localCheckpoint(true)
    beamSearchAudited(e, edges, extraEntry = Some(seed))._1
  }

  /** `ann_graph_scaled_stats` gate entry: the bounded-candidates
    * EVIDENCE row — (n_vec, n_planes, cap, n_cand_pairs, cand_per_vec)
    * for the scaled build's capped candidate generator, computed in
    * CLOSED FORM from the bucket histogram (pairs into bucket b =
    * min(pop_b, cap) candidates × probes targeting b, minus each capped
    * member's own-bucket self match) — two bucket-shaped aggregates and
    * a bucket-keyed join, NO pair materialization, so the decade rows
    * cost ~a corpus scan at any n while proving candidates/vector stays
    * ≤ cap·(P+1) under the measured skew. */
  def annGraphScaledStats(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val p = scaledPFor(s, d)
    val pl = planesN(p)
    val b = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), bucketN(col("v"), pl).as("bkt"))
    val pop = b.groupBy("bkt").agg(count(lit(1)).as("pop"))
    val phits = b.select(explode(probes1N(col("bkt"), p)).as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("ph"))
    val capped = least(col("pop"), lit(GraphBuildCap.toLong))
    pop.join(phits, Seq("bkt"))
      .agg(sum(capped * col("ph") - capped).as("n_cand_pairs"))
      .crossJoin(b.agg(count(lit(1)).as("n_vec")))
      .select(col("n_vec"), lit(p).as("n_planes"),
        lit(GraphBuildCap).as("cap"), col("n_cand_pairs"),
        round(col("n_cand_pairs").cast("double") / col("n_vec"), 2)
          .as("cand_per_vec"))
  }

  // ---- scalar quantization (SQ8) ANN --------------------------------------

  /** `ann_sq8` gate entry: scalar-quantized search — the third classic
    * quantization family next to IVF and PQ (FAISS's SQ8): each
    * dimension is affinely mapped to an int in [0, 255] against its
    * per-dimension corpus min/max; candidates are ranked by the
    * approximate cosine of the DEQUANTIZED reconstructions (the affine
    * map distorts relative dot products, so the raw integer dot ranks
    * wrong — measured recall 0.4; reconstruction fixes the estimator),
    * and the top-64 shortlist is re-ranked by exact cosine.
    *
    * Scale shape: the bounds are one per-dimension min/max aggregate
    * (exact values — no FP-order dependence); encode is a map-side
    * projection; scoring is the [[annTopK]] scan shape (query side
    * broadcast, corpus only scanned) except each vector reads 64 BYTES
    * + one norm instead of 256/512 — the 4-8x scan-byte cut is the
    * reason SQ8 exists at 100 TB; the shortlist is the bounded
    * [[TopKOrdered]] partial+final aggregate and the re-rank touches 64
    * ids per query. Exact oracle: bounds re-derived in DuckDB (min/max
    * of the same doubles are the same doubles), identical quantize /
    * dequantize arithmetic, the same left-to-right dot fold both
    * engines already agree on, 6-dp-rounded rank keys.
    *
    * NOTE: this gate variant is the ORACLE form — it scans the full
    * float64 vectors AND reconstructs per row (both engines must see
    * exact doubles), which costs ~3x the brute-force scan. The
    * production operator is [[annSq8Packed]]: identical rows, but the
    * scan reads the ~72 B/vector write-time layout through the fused
    * `sq8_dot` codegen kernel — reach for that one. */
  def annSq8(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bounds = sq8Bounds(e)
    // quantize + dequantize in ONE native codegen kernel (sq8_recon):
    // the chained higher-order transform lambdas are CodegenFallback —
    // interpreted per element, measured 5x the brute-force scan cost
    val enc = e.crossJoin(broadcast(bounds))
      .withColumn("dq",
        call_function("sq8_recon", col("v"), col("lo"), col("hi")))
      .select(col("vec_id"), col("v"),
        sqrt(dot(col("v"), col("v"))).as("n"), col("dq"))
    val q = enc.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), col("dq").as("qdq"))
    val scored = enc.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("ascore",
        dot(col("dq"), col("qdq")) / (col("n") * col("qn")))
    val short = shortlistTopK(
      scored.withColumn("d2r", -round(col("ascore"), 6)), 64)
    // broadcast the 64-ids-per-query shortlist: a post-aggregate frame
    // has no size stats, so the rerank join against the corpus would
    // otherwise sort-merge-shuffle all of it (1.3 GB at 5M vectors)
    val rerank = broadcast(short)
      .join(enc.select("vec_id", "v", "n"), Seq("vec_id"))
      .join(broadcast(q.select("query_id", "qv", "qn")), Seq("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    rankedTopK(rerank, 5)
  }

  /** Per-dimension (lo, hi) bounds frame shared by the SQ8 paths. */
  private def sq8Bounds(e: DataFrame): DataFrame =
    e.select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("lo"), col("hi")))).as("b"))
      .select(transform(col("b"), x => x.getField("lo")).as("lo"),
        transform(col("b"), x => x.getField("hi")).as("hi"))

  /** Write-time SQ8 layout (the production form of [[annSq8]]): the
    * corpus stored as (vec_id, norm, 64 PACKED BYTES of codes) plus a
    * one-row bounds table — the scan of the search path reads ~72 B
    * per vector instead of 512 B of float64 (the 4-8x scan-byte cut
    * SQ8 exists for, now measured rather than argued). Encode is
    * ingest work, cached by the standard mtime marker. */
  def buildSq8Layout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    val layout = graft.util.Layouts.dir("ann_sq8", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      sq8Bounds(e).coalesce(1).write.mode("overwrite")
        .parquet(s"${layout}_bounds")
      val bounds = s.read.parquet(s"${layout}_bounds")
      e.crossJoin(broadcast(bounds))
        .select(col("vec_id"),
          sqrt(dot(col("v"), col("v"))).as("n"),
          call_function("sq8_encode", col("v"), col("lo"), col("hi"))
            .as("code"))
        .write.mode("overwrite").parquet(layout.getPath)
    }
    layout
  }

  /** `ann_sq8_packed` gate entry: [[annSq8]]'s search over the packed
    * write-time layout — the corpus scan reads codes + norms only (no
    * float64 vectors), decodes with the native kernel, and only the
    * 64-per-query re-rank ids touch the full-precision base table.
    * Row-identical to `ann_sq8` (encode∘decode reproduces the same
    * reconstruction bytes-for-bits), so it shares the oracle. */
  def annSq8Packed(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildSq8Layout(s, d)
    val bounds = s.read.parquet(s"${layout.getPath}_bounds")
    // codes stay PACKED through the scan; scoring decodes inline in the
    // fused sq8_dot kernel (a per-row decode-to-array allocation made
    // the packed path SLOWER than the full-precision scan: 4.7 s vs
    // 2.4 s at 5M vectors)
    val enc = s.read.parquet(layout.getPath)
      .crossJoin(broadcast(bounds))
      .select(col("vec_id"), col("n"), col("code"), col("lo"), col("hi"))
    // query side reads the BASE table (10 ids, isin pushed to the scan)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .crossJoin(broadcast(bounds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        sqrt(dot(col("v"), col("v"))).as("qn"),
        call_function("sq8_recon", col("v"), col("lo"), col("hi"))
          .as("qdq"))
    val scored = enc.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("ascore",
        call_function("sq8_dot", col("code"), col("lo"), col("hi"),
          col("qdq")) / (col("n") * col("qn")))
    val short = shortlistTopK(
      scored.withColumn("d2r", -round(col("ascore"), 6)), 64)
    val rerank = broadcast(short)
      .join(e.withColumn("n", sqrt(dot(col("v"), col("v"))))
        .select("vec_id", "v", "n"), Seq("vec_id"))
      .join(broadcast(q.select("query_id", "qv", "qn")), Seq("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    rankedTopK(rerank, 5)
  }

  // ---- layout introspection (r11 verdict #8) ------------------------------

  /** ANN-layout observability — the partitioned-dir sibling of
    * [[graft.sqlx.MobSql.describeLayout]] (both are the repo's answer
    * to the reference's drafted-but-disabled index pragmas,
    * ref src/index/rtree_pragmas.cpp:214-220): one row per partition
    * key (IVF `cell` / LSH-family `bkt`) of a built layout with its
    * row count, file count, and vec_id extent — the bucket histogram
    * that tells an operator whether a layout is balanced BEFORE a
    * query stumbles on the skew. Metadata-shaped: the scan reads the
    * partition column (from directory names), `vec_id`, and file
    * names only. */
  def describeAnnLayout(s: SparkSession, layoutDir: String): DataFrame = {
    val df = s.read.parquet(layoutDir)
    val key = Seq("cell", "bkt").find(df.columns.contains).getOrElse(
      throw new IllegalArgumentException(
        s"$layoutDir has no cell/bkt partition column"))
    df.select(col(key).cast("long").as("part_key"), col("vec_id"),
        input_file_name().as("f"))
      .groupBy("part_key")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("f")).as("n_files"),
        min("vec_id").as("min_vec_id"), max("vec_id").as("max_vec_id"))
      .orderBy("part_key")
  }

  /** `layout_describe` gate entry: [[describeAnnLayout]] over the
    * IVF,SQ8 layout, projected to its oracle-able columns (file counts
    * depend on the writer's task layout; the histogram does not). The
    * DuckDB oracle replays cell assignment from the interpolated
    * codebook and re-derives the same histogram — the introspection
    * surface is exact-checked, not rows-only. */
  def layoutDescribeGate(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildIvfSq8Layout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    stashCodebook("layout_describe", d, cents)
    describeAnnLayout(s, layout.getPath)
      .select("part_key", "n_rows", "min_vec_id", "max_vec_id")
  }

  /** DuckDB replay of [[layoutDescribeGate]]: cell assignment from the
    * interpolated codebook ([[ivfOracleSelect]]'s CTE), then the same
    * per-cell histogram. */
  private def layoutDescribeOracle(cents: Array[Array[Double]]): String = {
    val vals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    s"""WITH cells(cell, c) AS (VALUES $vals),
       emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       dist AS (
         SELECT e.vec_id, cl.cell,
           list_sum(list_transform(generate_series(1, len(cl.c)),
             i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
         FROM emb e CROSS JOIN cells cl),
       assigned AS (
         SELECT vec_id, cell FROM (
           SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
           FROM dist) WHERE rk = 1)
       SELECT CAST(cell AS BIGINT) AS part_key, count(*) AS n_rows,
         min(vec_id) AS min_vec_id, max(vec_id) AS max_vec_id
       FROM assigned GROUP BY 1 ORDER BY 1"""
  }

  // ---- incremental graph maintenance (r11 verdict #7) ---------------------

  /** Recorded base-split plane count per dir — the [[scaledGraphP]]
    * oracle-interpolation convention for [[annGraphAppend]]. */
  private val appendGraphP =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** `ann_graph_append` gate entry: BATCH-shaped incremental maintenance
    * for the scaled navigable graph — the streaming-corpus story the
    * TRTREE append/compact path already has, applied to the ANN layout.
    * A deterministic 10% batch (vec_id % 10 = 7) "arrives" against the
    * index built over the other 90%: each new vector probes its own
    * bucket plus the [[probes2N]] 1-/2-bit flips in the BASE corpus's
    * capped buckets (the index's plane family is FIXED at build time —
    * an append must not re-derive planes from the grown count, or every
    * batch would rewrite the whole layout) and takes its top-[[GraphM]]
    * nearest capped candidates as its adjacency. Every shuffle is
    * BATCH-shaped: |batch|·(1+P+P(P-1)/2) probe rows in, |batch|·M edge
    * rows out; the base side contributes only its ≤cap·2^P capped
    * representatives and is never re-scored corpus × corpus. In production the new edges plus
    * their reverses union into the edge table as a file append (the
    * `dedup_incremental` shape); the gate row emits the computed
    * adjacency (query_id = new vector, rank, neighbor_id, cos). Exact
    * oracle: split rule, plane family (recorded per dir), capped-member
    * rule, and both rankings replayed in SQL. */
  def annGraphAppend(s: SparkSession, d: String): DataFrame = {
    val (capped, p) = appendFrozenIndex(s, d)
    val batch = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .filter(pmod(col("vec_id"), lit(10)) === 7)
    appendEdgesAgainst(capped, batch, p)
  }

  /** The FROZEN index side of the append — the base (90%) split's
    * capped bucket representatives under its recorded plane family.
    * Split out so [[graft.streaming.StreamGate.streamGraphAppendSink]]
    * can materialize it ONCE as load phase and probe it per
    * micro-batch: an index's plane family and capped members are fixed
    * at build time; arriving data must never re-derive them. */
  private[graft] def appendFrozenIndex(s: SparkSession,
                                       d: String): (DataFrame, Int) = {
    reg(s)
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .filter(pmod(col("vec_id"), lit(10)) =!= 7)
    val p = appendGraphP.computeIfAbsent(d,
      _ => scaledPlaneCount(base.count()))
    lastAppendDir = d
    val eb = base.withColumn("bkt", bucketN(col("v"), planesN(p)))
    val capped = base.join(
      cappedBucketIds(eb).select(col("vec_id").as("capped_id"), col("bkt")),
      col("vec_id") === col("capped_id"))
      .drop("capped_id")
    (capped, p)
  }

  /** Batch-shaped adjacency for `batch` (vec_id, v, n) against the
    * frozen capped representatives: each arriving vector probes its own
    * bucket plus the [[probes2N]] 1-/2-bit flips and takes its
    * top-[[GraphM]] nearest capped candidates. Per-vector work is
    * independent of every other arriving vector, so ANY partition of
    * the batch — including a micro-batched stream — emits identical
    * rows.
    *
    * 2-bit probe set: the append is per-BATCH-VECTOR work (the
    * probes2N budget argument), and appended edges PERSIST — candidate
    * quality here is graph quality forever after, so the denser set is
    * the right spend. Measured at the gate SFs: the rank-1 edge lands
    * in the exact top-10 for 100% of batch vectors (top-5: 0.96-0.98);
    * exact-top-1 EQUALITY is 0.54-0.66 — bounded by the cap itself
    * (the true NN is often not among its bucket's 32 lowest-id
    * representatives), which is the same bound the build and the
    * seeded search operate under. */
  private[graft] def appendEdgesAgainst(capped: DataFrame, batch: DataFrame,
                                        p: Int): DataFrame = {
    val qside = batch.select(col("vec_id").as("query_id"),
      col("v").as("qv"), col("n").as("qn"),
      explode(probes2N(bucketN(col("v"), planesN(p)), p)).as("bkt"))
    // base and batch are disjoint splits, so no self-match filter needed;
    // shuffle_hash keeps the probe stream unsorted (graphFwdEdgesScaled)
    val scored = capped.hint("shuffle_hash").join(qside, Seq("bkt"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, GraphM)
  }

  /** The [[annGraphAppend]] oracle keyed to a dump dir (the plane
    * family is recorded at query time) — shared verbatim by the
    * streaming twin, whose micro-batched union provably equals the
    * batch append's rows. */
  private[graft] def graphAppendOracleFor(dumpDir: Option[String])
      : Option[String] =
    dumpDir.orElse(Option(lastAppendDir))
      .flatMap(d => Option(appendGraphP.get(d)))
      .map(p => graphAppendOracle(p))

  // ---- IVF × SQ8 composition (r11 verdict #4) -----------------------------

  /** Write-time IVF,SQ8 layout — FAISS's canonical production index
    * family ("IVF,SQ8"): the corpus stored as (vec_id, norm, 64 packed
    * SQ8 code bytes) PARTITIONED BY its coarse-quantizer cell, with the
    * k-means codebook and the global per-dimension bounds as one-file
    * sidecars. The two halves' savings MULTIPLY: a probe reads
    * ~nprobe/k of the corpus ([[buildIvfLayout]]'s partition pruning)
    * and each row it reads is ~72 B instead of 512 ([[buildSq8Layout]]'s
    * byte cut) — at nprobe/k = 6/32 that is ~2.6% of the brute-force
    * scan bytes. Same mtime staleness rules as every layout. */
  def buildIvfSq8Layout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    val layout = graft.util.Layouts.dir("ann_ivfsq8", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val cents = trainCodebook(e)
      import s.implicits._
      cents.toSeq.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"${layout}_codebook")
      sq8Bounds(e).coalesce(1).write.mode("overwrite")
        .parquet(s"${layout}_bounds")
      val bounds = s.read.parquet(s"${layout}_bounds")
      e.crossJoin(broadcast(bounds))
        .select(col("vec_id"),
          sqrt(dot(col("v"), col("v"))).as("n"),
          call_function("sq8_encode", col("v"), col("lo"), col("hi"))
            .as("code"),
          nearestCell(cents)(col("v")).as("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(layout.getPath)
    }
    layout
  }

  /** `ann_ivf_sq8` gate entry: IVF cell pruning × SQ8 packed bytes over
    * the write-time layout. The scan reads ONLY the probed cells'
    * packed-code rows (the probed-cell list is a driver-computed
    * LITERAL isin filter — static partition pruning, the
    * [[annIvfPqBucketed]] convention) and scores them with the fused
    * `sq8_dot` decode-dot kernel; the 64-id shortlist is the bounded
    * [[TopKOrdered]] aggregate and only those ids touch the
    * full-precision base table for the exact re-rank. Exact oracle:
    * codebook + bounds interpolated (the [[trainedCodebooks]]
    * convention), DuckDB replays cell assignment, nprobe probing, the
    * identical quantize/dequantize arithmetic, and both rankings. */
  /** Driver-side replica of the `vec_probe_cells` kernel: the `nprobe`
    * nearest centroids of `v`, ties (d2 asc, cell asc) — used wherever
    * a probed-cell list must become a pruning LITERAL (bounded driver
    * work: k×dim distance sums for one query vector). */
  private def nearestCellsLocal(cents: Array[Array[Double]],
                                v: Array[Double], nprobe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      var d2 = 0.0; var k = 0
      while (k < v.length) { val t = v(k) - c(k); d2 += t * t; k += 1 }
      (d2, i)
    }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2).toSeq

  def annIvfSq8(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildIvfSq8Layout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    stashCodebook("ann_ivf_sq8", d, cents)
    val bounds = s.read.parquet(s"${layout.getPath}_bounds")
    val eBase = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // query vectors: a bounded collect (10 ids) so the probed-cell list
    // becomes a LITERAL isin filter -> partition pruning at the scan
    val qVecs: Array[(Long, Array[Double])] =
      eBase.filter(col("vec_id").isin(queryIds: _*)).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probed: Map[Long, Seq[Int]] =
      qVecs.map { case (id, v) =>
        id -> nearestCellsLocal(cents, v, IvfNProbe) }.toMap
    val allCells = probed.values.flatten.toSeq.distinct.sorted
    // query side: reconstructed query (the symmetric estimator annSq8
    // uses) x its nprobe cells — <= 60 rows, broadcast
    val q = eBase.filter(col("vec_id").isin(queryIds: _*))
      .crossJoin(broadcast(bounds))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        sqrt(dot(col("v"), col("v"))).as("qn"),
        call_function("sq8_recon", col("v"), col("lo"), col("hi"))
          .as("qdq"))
    import s.implicits._
    val qCells = probed.toSeq
      .flatMap { case (id, cs) => cs.map(c => (id, c)) }
      .toDF("query_id", "cell")
    val qq = q.select("query_id", "qn", "qdq")
      .join(broadcast(qCells), Seq("query_id"))
    // packed scan of the probed cells only; codes stay packed through
    // the scan and decode inside the fused kernel (annSq8Packed note)
    val enc = s.read.parquet(layout.getPath)
      .filter(col("cell").isin(allCells: _*))
      .crossJoin(broadcast(bounds))
    val scored = enc.join(broadcast(qq), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("ascore",
        call_function("sq8_dot", col("code"), col("lo"), col("hi"),
          col("qdq")) / (col("n") * col("qn")))
    val short = shortlistTopK(
      scored.withColumn("d2r", -round(col("ascore"), 6)), 64)
    val rerank = broadcast(short)
      .join(eBase.withColumn("n", sqrt(dot(col("v"), col("v"))))
        .select("vec_id", "v", "n"), Seq("vec_id"))
      .join(broadcast(q.select("query_id", "qv", "qn")), Seq("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    rankedTopK(rerank, 5)
  }

  // ---- metadata-filtered ANN (pre-filter below the cell join) -------------

  /** The filtered-search predicate: `label % 3 = 0` (embeddings carry an
    * int cluster label; ~1/3 selective on both corpora). */
  private def filterPred(c: Column): Column = c % 3 === 0

  /** Filter-aware probe widening: a ~1/3-selective predicate thins each
    * probed cell's candidate pool by ~3x, so the filtered search keeps
    * its effective candidate count (and recall) by probing proportionally
    * more cells — ⌈nprobe/selectivity⌉ capped at k/2, the adaptive-nprobe
    * rule production IVF stores apply under filters. Measured recall@5 vs
    * the exact FILTERED brute force: 0.62 at nprobe=6, 0.84 at 16
    * (RetrievalSpec pins the floor). */
  private val FilteredNProbe = 16

  /** Metadata-filtered ANN — "top-k neighbors AMONG rows passing a
    * predicate", the filtered-vector-search shape every production
    * vector store exposes (RAG collections filter by source / license /
    * language before ranking). Reference counterpart: the TRTREE scan's
    * residual predicates composing with the index probe
    * (`rtree_index_scan.cpp` applies the remaining table filters on the
    * index's candidate rows).
    *
    * Scale design — PRE-filter, not post-filter. The predicate sits
    * BELOW the cell equi-join, so (a) over the cell-partitioned
    * write-time layout it evaluates in the scan STAGE of the probed
    * cells, before any join or shuffle (this gate predicate is
    * arithmetic, so it filters rows as they stream off the scan; an
    * equality/range predicate — `lang = 'en'`, `license IN (...)` —
    * additionally reaches the parquet row-group stats as a pushed
    * filter), and (b) top-k ranks the filtered candidate stream, so
    * every query still returns k rows. The naive alternative — post-filtering an unfiltered
    * top-k — returns < k (possibly zero) rows whenever the predicate is
    * selective; RetrievalSpec pins that failure mode and a recall floor
    * vs the exact filtered brute force. Exact-oracled via the IVF
    * codebook-interpolation convention ([[ivfOracleSelect]]). Queries
    * themselves are NOT filtered: any caller may search a filtered
    * collection. */
  def annFiltered(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
        col("label"))
    val cents = trainCodebook(e)
    stashCodebook("ann_filtered", d, cents)
    val withCell = e
      .withColumn("cell", nearestCell(cents)(col("v")))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val q = withCell.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"),
        explode(probeCells(cents, FilteredNProbe)(col("v"))).as("cell"))
    val scored = withCell.filter(filterPred(col("label")))
      .join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  /** IVF-served vector leg for the hybrid retrieval stack
    * ([[Retrieval.hybridRrfIvf]]): cosine scores to the 1-row query-
    * vector frame, restricted to the query's nprobe nearest cells of
    * the write-time IVF layout — at 100 TB the leg reads ~nprobe/k of
    * the corpus via partition pruning where [[Retrieval.hybridRrf]]'s
    * in-memory leg scans it all. The query vector is ONE row (the PRF
    * mean), so the bounded collect turns the probed-cell list into a
    * literal isin → static partition pruning at the scan (the
    * [[annIvfSq8]] convention). Returns (doc_id, r6) scored candidates;
    * the caller ranks and fuses. Codebook stashed under the gate key so
    * the oracle replays cell assignment + probing exactly. */
  private[operators] def ivfVectorLeg(s: SparkSession, d: String,
                                      qvDf: DataFrame): DataFrame = {
    reg(s)
    val layout = buildIvfLayout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    stashCodebook("hybrid_rrf_ivf", d, cents)
    val qv: Array[Double] = qvDf.collect()(0).getSeq[Double](0).toArray
    val probed: Seq[Int] = nearestCellsLocal(cents, qv, IvfNProbe)
    // qn: sequential 64-term sum — the same IEEE result the oracle's
    // list_dot_product produces, so the literal folds identically
    val qn = math.sqrt(qv.map(x => x * x).sum)
    s.read.parquet(layout.toString)
      .filter(col("cell").isin(probed: _*))
      .withColumn("v", col("v").cast("array<double>"))
      .withColumn("r6", round(
        dot(col("v"), typedLit(qv.toSeq)) / (col("n") * lit(qn)), 6))
      .select(col("vec_id").as("doc_id"), col("r6"))
  }

  /** [[rankedTopK]] exposed to the retrieval stack: per-query top-`k`
    * of a (query_id, vec_id, cos) scored frame as the bounded
    * partial+final aggregate — the rank tail a query BATCH needs (a
    * per-query row_number window would sort each query's full
    * candidate stream in one task; this keeps k rows per query per
    * partition and exchanges KBs). */
  private[operators] def topKPerQuery(scored: DataFrame,
                                      k: Int): DataFrame =
    rankedTopK(scored, k)

  /** [[ivfVectorLeg]] generalized to a query BATCH
    * ([[graft.operators.Retrieval.hybridRrfBatch]]): `qvs` is a small
    * (query_id, qv) frame (one PRF vector per query). The probed-cell
    * UNION becomes the layout scan's static pruning literal — the scan
    * reads ≤ |queries|·nprobe of the cell directories ONCE, shared by
    * every query — and each query scores only its OWN cells' rows via
    * the broadcast (query_id, cell) pair table, so candidate volume per
    * query stays nprobe/k of the corpus exactly as in the single-query
    * leg. Returns (query_id, doc_id, r6); the caller ranks and fuses.
    * Codebook stashed under the batch gate key for oracle replay. */
  private[operators] def ivfVectorLegBatch(s: SparkSession, d: String,
                                           qvs: DataFrame): DataFrame = {
    reg(s)
    val layout = buildIvfLayout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    stashCodebook("hybrid_rrf_batch", d, cents)
    // bounded collect: |queries| rows (the annFilteredBucketed shape) —
    // per-query probed cells are computed against the driver-held
    // 32-row codebook and shipped back as the pruning literal + the
    // broadcast pair table
    val qRows: Array[(Long, Array[Double])] = qvs.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    import s.implicits._
    val probedPairs: Seq[(Long, Int)] = qRows.toSeq.flatMap { case (id, v) =>
      nearestCellsLocal(cents, v, IvfNProbe).map(c => (id, c)) }
    val qCells = probedPairs.toDF("query_id", "cell")
    val allCells = probedPairs.map(_._2).distinct.sorted
    val q = qvs
      .select(col("query_id"), col("qv"),
        sqrt(dot(col("qv"), col("qv"))).as("qn"))
      .join(broadcast(qCells), Seq("query_id"))
    s.read.parquet(layout.toString)
      .filter(col("cell").isin(allCells: _*))
      .withColumn("v", col("v").cast("array<double>"))
      .join(broadcast(q), Seq("cell"))
      .withColumn("r6",
        round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 6))
      .select(col("query_id"), col("vec_id").as("doc_id"), col("r6"))
  }

  /** [[annFiltered]] over the write-time IVF layout — IDENTICAL rows
    * (same deterministic codebook, widened probe set, predicate,
    * scoring, ranking), but the scale claim is realized at the scan:
    * the layout carries the metadata column (`_f32l` schema), so the
    * label predicate evaluates inside the ≤16 PRUNED cell directories —
    * partition pruning cuts the rows to nprobe/k and the predicate cuts
    * them again by its selectivity before any join or shuffle
    * (plan-asserted: cell PartitionFilters + the predicate in the
    * streamed join side). Query vectors are a bounded 10-row collect so
    * the probed-cell union becomes the pruning literal (the
    * [[annIvfSq8]] convention). Same oracle form as [[annFiltered]]
    * with the layout-loaded codebook. */
  def annFilteredBucketed(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val layout = buildIvfLayout(s, d)
    val cents: Array[Array[Double]] = s.read.parquet(s"${layout}_codebook")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    stashCodebook("ann_filtered_bucketed", d, cents)
    val eBase = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qVecs: Array[(Long, Array[Double])] =
      eBase.filter(col("vec_id").isin(queryIds: _*)).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    import s.implicits._
    val probedPairs: Seq[(Long, Int)] = qVecs.toSeq
      .flatMap { case (id, v) =>
        nearestCellsLocal(cents, v, FilteredNProbe).map(c => (id, c)) }
    val qCells = probedPairs.toDF("query_id", "cell")
    val allCells = probedPairs.map(_._2).distinct.sorted
    val q = eBase.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        sqrt(dot(col("v"), col("v"))).as("qn"))
      .join(broadcast(qCells), Seq("query_id"))
    val e = s.read.parquet(layout.toString)
      .filter(col("cell").isin(allCells: _*))
      .filter(filterPred(col("label")))
      .withColumn("v", col("v").cast("array<double>"))
    val scored = e.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
    rankedTopK(scored, 5)
  }

  // ---- deterministic hierarchical HNSW (r10 verdict #3) ------------------

  /** Layer cap, upper-layer beam width, and rounds-per-upper-layer. */
  private val HnswLCap = 4
  private val HnswWUp = 4
  private val HnswRUp = 2

  /** Deterministic HNSW layer assignment: `level = min(trailing_zeros(
    * md5_lower64(vec_id)), cap)` — the geometric(1/2) level distribution
    * HNSW draws from an RNG, made REPLAYABLE (an RNG level could never
    * be oracled; this one is a pure function of vec_id both engines
    * compute identically). trailing_zeros(h) = bit_count((h & -h) - 1),
    * with h = 0 mapping to 64 and the cap clamping it. */
  private def levelExpr: Column =
    least(expr("bit_count((lvh & -lvh) - 1)"), lit(HnswLCap)).cast("int")

  private def withLevel(e: DataFrame): DataFrame = e
    .withColumn("lvx", md5(col("vec_id").cast("string")))
    .withColumn("lvh", graft.util.Md5Lower64.of("lvx"))
    .withColumn("lev", levelExpr)
    .drop("lvx", "lvh")

  /** Per-layer navigable edges: layer l contains the vectors with
    * level >= l; its edge set is the [[graphEdges]] construction (2-bit
    * probe pool, top-[[GraphM]], undirected) restricted to members.
    * Build cost sums to < 2x the layer-0 build (layer sizes halve). */
  private def hnswEdges(s: SparkSession, d: String): DataFrame = {
    val e = withLevel(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v")))))
    (0 to HnswLCap).map { l =>
      val eb = e.filter(col("lev") >= l)
        .withColumn("bkt", bucket(col("v")))
      val qside = eb.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"), explode(probes2(col("bkt"))).as("bkt"))
      val fwd = rankedTopK(
        eb.join(qside, Seq("bkt"))
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            dot(col("v"), col("qv")) / (col("n") * col("qn"))),
        GraphM)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .select(lit(l).as("lay"), col("src"), col("dst"))
    }.reduce(_ unionByName _)
  }

  /** Write-time HNSW layout (ingest work, like [[buildGraphLayout]]). */
  def buildHnswLayout(s: SparkSession, d: String): java.io.File = {
    reg(s)
    val layout = graft.util.Layouts.dir("ann_hnsw", d)
    if (graft.util.Layouts.stale(layout, d, "embeddings")) {
      hnswEdges(s, d).write.mode("overwrite").parquet(layout.getPath)
    }
    layout
  }

  /** `ann_hnsw` gate entry — hierarchical navigable-graph search with
    * DETERMINISTIC layers (the multi-layer variant the single-layer NSW
    * entry [[annGraphSearch]] stands in for): entry is the single
    * (level desc, vec_id asc) apex node instead of the fixed
    * [[GraphEntryBound]]-node set; each upper layer l = LCap..1 runs
    * [[HnswRUp]] beam rounds at width [[HnswWUp]] over that layer's
    * edges (the logarithmic descent — ref counterpart: the R-tree's
    * level descent, src/index/rtree_module.cpp:49); layer 0 then runs
    * the same [[GraphW]]/[[GraphL]] beam the NSW entry runs, seeded by
    * the descent instead of 64 fixed entries. Equal layer-0 beam width,
    * FEWER distinct scored candidates (PipelineOpsSpec pins both that
    * and a recall floor). Exact oracle: every piece — levels, per-layer
    * edges, descent, tie-breaks — is deterministic and unrolled into
    * CTEs. */
  def annHnsw(s: SparkSession, d: String): DataFrame =
    annHnswAudited(s, d)._1

  private[graft] def annHnswAudited(
      s: SparkSession, d: String): (DataFrame, DataFrame) = {
    reg(s)
    val e = withLevel(Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v")))))
    val edges = s.read.parquet(buildHnswLayout(s, d).getPath)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("n").as("qn"))
    // descent scoring does NOT exclude the query itself: the apex (or a
    // beam node) may BE the query, and its neighborhood is exactly where
    // the search should go — self is dropped only from the final ranking
    // (where the NSW entry never hits this: its entry set has 64 nodes)
    def score(cand: DataFrame): DataFrame = cand
      .join(e.select("vec_id", "v", "n"), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("n") * col("qn")))
      .select("query_id", "vec_id", "cos")
    def topW(scored: DataFrame, w0: Int): DataFrame = {
      val w = Window.partitionBy("query_id")
        .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= w0)
        .select("query_id", "vec_id", "cos")
    }
    def expandWith(beam: DataFrame, lay: Int): DataFrame = {
      val ed = edges.filter(col("lay") === lay).select("src", "dst")
      beam.select("query_id", "vec_id")
        .unionByName(beam.select(col("query_id"), col("vec_id").as("src"))
          .join(ed, Seq("src"))
          .select(col("query_id"), col("dst").as("vec_id")))
        .distinct()
    }
    // apex entry: the single (level desc, vec_id asc) node — the HNSW
    // top-of-hierarchy start, deterministic and never empty
    val apex = e.orderBy(col("lev").desc, col("vec_id").asc).limit(1)
      .select(col("vec_id"))
    val entry = q.select(col("query_id")).crossJoin(apex)
    var scoredSets = Seq(entry)
    // each round references the beam TWICE (cand = beam ∪ neighbors,
    // then re-rank), so an unmaterialized 12-round descent doubles its
    // lineage per round (~2^12 recompute). The beam is |Q|·W rows —
    // checkpoint it EVERY round; values are unchanged (the oracle needs
    // the VALUES deterministic, not the physical plan). A sparser
    // cadence saves nothing measurable: the rounds are driver-latency
    // bound, and skipped checkpoints just re-execute the prior rounds'
    // window/distinct exchanges inside longer per-job stage chains.
    var beam = topW(score(entry), HnswWUp).localCheckpoint(true)
    for (l <- HnswLCap to 1 by -1; _ <- 1 to HnswRUp) {
      val cand = expandWith(beam, l)
      scoredSets :+= cand
      beam = topW(score(cand), HnswWUp).localCheckpoint(true)
    }
    for (_ <- 1 to GraphL) {
      val cand = expandWith(beam, 0)
      scoredSets :+= cand
      beam = topW(score(cand), GraphW).localCheckpoint(true)
    }
    val w5 = Window.partitionBy("query_id")
      .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)
    val res = beam.filter(col("vec_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w5).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 5).as("cos"))
      .orderBy("query_id", "rank")
    (res, scoredSets.reduce(_ unionByName _).distinct())
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_graph_search" -> (annGraphSearch _),
    "ann_graph_scaled" -> (annGraphScaled _),
    "ann_graph_scaled_stats" -> (annGraphScaledStats _),
    "ann_graph_append" -> (annGraphAppend _),
    "layout_describe" -> (layoutDescribeGate _),
    "ann_hnsw" -> (annHnsw _),
    "ann_sq8" -> (annSq8 _),
    "ann_sq8_packed" -> (annSq8Packed _),
    "ann_ivf_sq8" -> (annIvfSq8 _),
    "ann_filtered" -> (annFiltered _),
    "ann_filtered_bucketed" -> (annFilteredBucketed _),
    "emb_kcenter" -> (embKcenter _),
    "emb_kmeans" -> (embKmeans _),
    "emb_pagerank" -> (embPagerank _),
    "emb_dbscan" -> (embDbscan _),
    "ann_knn_graph" -> (annKnnGraph _),
    "emb_outliers" -> (embOutliers _),
    "emb_random_projection" -> (embRandomProjection _),
    "ann_topk" -> (annTopK _),
    "ann_lsh" -> (annLsh _),
    "ann_lsh_bucketed" -> (annLshBucketed _),
    "ann_ivf" -> (annIvf _),
    "ann_ivf_bucketed" -> (annIvfBucketed _),
    "ann_pq" -> (annPq _),
    "ann_ivfpq" -> (annIvfPq _),
    "ann_ivfpq_bucketed" -> (annIvfPqBucketed _),
    "dedup_semantic" -> (semDedup _),
    "dedup_emb_lsh" -> (embLshPairs _),
    "emb_lang_centroids" -> (embLangCentroids _))

  /** DuckDB-side replica of the sign-LSH hash family: the plane
    * literals are interpolated from [[planes]] (Double.toString
    * round-trips exactly, so DuckDB folds the identical doubles) and
    * the bucket id is the same sum of sign bits the Spark side
    * computes. Lets the driver hash-check the APPROXIMATE queries
    * exactly, not just rows-only. */
  private def planeLit(p: Int): String =
    planes(p).mkString("[", ",", "]")

  private val sqlBucket: String =
    planes.indices.map { p =>
      s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private val sqlProbes: String =
    "[bkt, " + (0 until 8).map(i => s"xor(bkt,${1 << i})").mkString(", ") + "]"

  private val lshOracleSelect: String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
               $sqlBucket AS bkt FROM emb),
       q AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
               unnest($sqlProbes) AS bkt
             FROM b WHERE vec_id IN (1, 7, 42, 99, 123, 200, 256, 300, 404, 499)),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
           list_dot_product(e.v, q.qv) / (e.n * q.qn) AS cos
         FROM b e JOIN q ON e.bkt = q.bkt AND e.vec_id <> q.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM scored)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  private val lshPairsOracle: String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
               $sqlBucket AS bkt FROM emb),
       probed AS (SELECT vec_id AS id_b, v AS vb, n AS nb,
               unnest($sqlProbes) AS bkt FROM b),
       pairs AS (
         SELECT e.vec_id AS id_a, p.id_b,
           list_dot_product(e.v, p.vb) / (e.n * p.nb) AS cos0
         FROM b e JOIN probed p ON e.bkt = p.bkt AND e.vec_id < p.id_b
         WHERE list_dot_product(e.v, p.vb) / (e.n * p.nb) >= 0.4)
       SELECT id_a, id_b, round(max(cos0), 5) AS cos
       FROM pairs GROUP BY 1, 2 ORDER BY 1, 2"""

  /** IVF oracle: the codebook rides along as a VALUES literal; DuckDB
    * independently re-derives cell assignment (sequential (v-c)^2 sum,
    * ties to the lowest cell — the [[graft.functions.VectorKernels]]
    * semantics), the nprobe=6 probe set, and the per-cell scoring. */
  private def ivfOracleSelect(cents: Array[Array[Double]],
                              candPred: String = "",
                              nprobe: Int = IvfNProbe): String = {
    val vals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    s"""WITH cells(cell, c) AS (VALUES $vals),
       emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
       dist AS (
         SELECT e.vec_id, e.v, e.label, cl.cell,
           list_sum(list_transform(generate_series(1, len(cl.c)),
             i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
         FROM emb e CROSS JOIN cells cl),
       rk AS (
         SELECT vec_id, v, label, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
         FROM dist),
       assigned AS (
         SELECT r.vec_id, r.v, r.label,
           sqrt(list_dot_product(r.v, r.v)) AS n, r.cell
         FROM rk r WHERE r.rk = 1),
       q AS (
         SELECT a.vec_id AS query_id, a.v AS qv, a.n AS qn, r.cell
         FROM assigned a JOIN rk r ON r.vec_id = a.vec_id AND r.rk <= $nprobe
         WHERE a.vec_id IN (1, 7, 42, 99, 123, 200, 256, 300, 404, 499)),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
           list_dot_product(e.v, q.qv) / (e.n * q.qn) AS cos
         FROM assigned e JOIN q ON e.cell = q.cell AND e.vec_id <> q.query_id
         $candPred),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM scored)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB replay of [[annIvfSq8]]: the codebook rides along as a
    * VALUES literal ([[ivfOracleSelect]]'s cell assignment + nprobe
    * probing), bounds re-derived (exact min/max), identical
    * quantize/dequantize arithmetic ([[sq8Oracle]]'s), candidates
    * restricted to cell matches, (round(ascore, 6) desc, id asc)
    * 64-shortlist, exact-cosine re-rank. */
  private def ivfSq8OracleSelect(cents: Array[Array[Double]]): String = {
    val vals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    s"""WITH cells(cell, c) AS (VALUES $vals),
       emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       bounds AS (
         SELECT list(lo ORDER BY pos) AS lo, list(hi ORDER BY pos) AS hi
         FROM (SELECT pos, min(x) AS lo, max(x) AS hi FROM (
                 SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
                 FROM emb) GROUP BY pos)),
       dist AS (
         SELECT e.vec_id, e.v, cl.cell,
           list_sum(list_transform(generate_series(1, len(cl.c)),
             i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
         FROM emb e CROSS JOIN cells cl),
       crk AS MATERIALIZED (
         SELECT vec_id, v, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
         FROM dist),
       enc0 AS (
         SELECT r.vec_id, r.v, r.cell,
           sqrt(list_dot_product(r.v, r.v)) AS n, lo, hi,
           list_transform(generate_series(1, len(r.v)), i ->
             CASE WHEN hi[i] > lo[i] THEN
               greatest(0, least(255, CAST(floor((r.v[i] - lo[i])
                 / (hi[i] - lo[i]) * 255.0 + 0.5) AS INTEGER)))
             ELSE 0 END) AS q
         FROM crk r CROSS JOIN bounds WHERE r.rk = 1),
       enc AS MATERIALIZED (
         SELECT vec_id, v, cell, n,
           list_transform(generate_series(1, len(q)), i ->
             lo[i] + CAST(q[i] AS DOUBLE) * (hi[i] - lo[i]) / 255.0) AS dq
         FROM enc0),
       qs AS (
         SELECT e.vec_id AS query_id, e.v AS qv, e.n AS qn, e.dq AS qdq,
           r.cell
         FROM enc e JOIN crk r ON r.vec_id = e.vec_id
           AND r.rk <= $IvfNProbe
         WHERE e.vec_id IN (${queryIds.mkString(", ")})),
       scored AS (
         SELECT qs.query_id, e.vec_id,
           list_dot_product(e.dq, qs.qdq) / (e.n * qs.qn) AS ascore
         FROM enc e JOIN qs ON e.cell = qs.cell
           AND e.vec_id <> qs.query_id),
       short AS (
         SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
             ORDER BY round(ascore, 6) DESC, vec_id ASC) AS rk
           FROM scored) WHERE rk <= 64),
       rerank AS (
         SELECT s.query_id, s.vec_id AS neighbor_id,
           list_dot_product(e.v, qe.v) / (e.n * qe.n) AS cos
         FROM short s
         JOIN enc e ON e.vec_id = s.vec_id
         JOIN enc qe ON qe.vec_id = s.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM rerank)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** PQ oracle: the M per-subspace codebooks ride along as one VALUES
    * literal (j, code, centroid); DuckDB re-derives code assignment
    * (sequential fold, ties to the lowest code — the kernel semantics),
    * the ADC lookup, and the compressed-domain ranking. */
  private def pqOracleSelect(cbs: Array[Array[Array[Double]]]): String = {
    val vals = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) =>
        s"($j, $code, ${c.mkString("[", ",", "]")})"
      }
    }.mkString(",\n")
    s"""WITH cb(j, code, c) AS (VALUES $vals),
       emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
       emb AS (SELECT vec_id, list_transform(v0,
           x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM emb0),
       sub AS (
         SELECT vec_id, js.j, v[js.j * 8 + 1 : js.j * 8 + 8] AS sv
         FROM emb, (SELECT unnest(range(8)) AS j) js),
       dist AS (
         SELECT s.vec_id, s.j, cb.code,
           list_sum(list_transform(generate_series(1, 8),
             i -> (s.sv[i] - cb.c[i]) * (s.sv[i] - cb.c[i]))) AS d2
         FROM sub s JOIN cb ON cb.j = s.j),
       codes AS (
         SELECT vec_id, j, code FROM (
           SELECT vec_id, j, code,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code)
               AS rk
           FROM dist) WHERE rk = 1),
       q AS (SELECT vec_id AS query_id, j, sv FROM sub
             WHERE vec_id IN (1, 7, 42, 99, 123, 200, 256, 300, 404, 499)),
       adc AS (
         SELECT q.query_id, q.j, cb.code,
           round(list_sum(list_transform(generate_series(1, 8),
             i -> (q.sv[i] - cb.c[i]) * (q.sv[i] - cb.c[i]))), 6) AS dsub
         FROM q JOIN cb ON cb.j = q.j),
       scored AS (
         SELECT a.query_id, c.vec_id, sum(a.dsub) AS d2
         FROM codes c JOIN adc a ON a.j = c.j AND a.code = c.code
         WHERE c.vec_id <> a.query_id
         GROUP BY 1, 2),
       shortlist AS (
         SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(d2, 6) ASC, vec_id ASC) AS adc_rank
           FROM scored) WHERE adc_rank <= 64),
       rerank AS (
         SELECT s.query_id, s.vec_id AS neighbor_id,
           list_dot_product(e.v, qe.v) AS cos
         FROM shortlist s
         JOIN emb e ON e.vec_id = s.vec_id
         JOIN emb qe ON qe.vec_id = s.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM rerank)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** IVF-PQ oracle: BOTH codebooks ride along as VALUES literals; DuckDB
    * re-derives normalization, cell assignment, residual encoding, the
    * per-cell query-residual ADC table, the compressed shortlist, and the
    * exact re-rank — the full two-quantizer pipeline, bit-for-bit. */
  private def ivfPqOracleSelect(cents: Array[Array[Double]],
                                cbs: Array[Array[Array[Double]]]): String = {
    val cellVals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    val cbVals = cbs.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (c, code) =>
        s"($j, $code, ${c.mkString("[", ",", "]")})"
      }
    }.mkString(",\n")
    s"""WITH cells(cell, c) AS (VALUES $cellVals),
       cb(j, code, cc) AS (VALUES $cbVals),
       emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
       emb AS (SELECT vec_id, list_transform(v0,
           x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM emb0),
       dist AS (
         SELECT e.vec_id, e.v, cl.cell, cl.c,
           list_sum(list_transform(generate_series(1, len(cl.c)),
             i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
         FROM emb e CROSS JOIN cells cl),
       rk AS (
         SELECT vec_id, v, cell, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
         FROM dist),
       assigned AS (
         SELECT vec_id, v, cell,
           list_transform(generate_series(1, len(c)),
             i -> v[i] - c[i]) AS r
         FROM rk WHERE rk = 1),
       sub AS (
         SELECT vec_id, cell, js.j, r[js.j * 8 + 1 : js.j * 8 + 8] AS sv
         FROM assigned, (SELECT unnest(range(8)) AS j) js),
       cdist AS (
         SELECT s.vec_id, s.cell, s.j, cb.code,
           list_sum(list_transform(generate_series(1, 8),
             i -> (s.sv[i] - cb.cc[i]) * (s.sv[i] - cb.cc[i]))) AS d2
         FROM sub s JOIN cb ON cb.j = s.j),
       codes AS (
         SELECT vec_id, cell, j, code FROM (
           SELECT vec_id, cell, j, code,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code)
               AS rk
           FROM cdist) WHERE rk = 1),
       q AS (
         SELECT a.vec_id AS query_id, a.v AS qv, r.cell,
           list_transform(generate_series(1, len(r.c)),
             i -> a.v[i] - r.c[i]) AS qr
         FROM assigned a JOIN rk r ON r.vec_id = a.vec_id AND r.rk <= $IvfNProbe
         WHERE a.vec_id IN (1, 7, 42, 99, 123, 200, 256, 300, 404, 499)),
       qsub AS (
         SELECT query_id, cell, js.j, qr[js.j * 8 + 1 : js.j * 8 + 8] AS sv
         FROM q, (SELECT unnest(range(8)) AS j) js),
       adc AS (
         SELECT s.query_id, s.cell, s.j, cb.code,
           round(list_sum(list_transform(generate_series(1, 8),
             i -> (s.sv[i] - cb.cc[i]) * (s.sv[i] - cb.cc[i]))), 6) AS dsub
         FROM qsub s JOIN cb ON cb.j = s.j),
       scored AS (
         SELECT a.query_id, c.vec_id, sum(a.dsub) AS d2
         FROM codes c
         JOIN adc a ON a.cell = c.cell AND a.j = c.j AND a.code = c.code
         WHERE c.vec_id <> a.query_id
         GROUP BY 1, 2),
       shortlist AS (
         SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(d2, 6) ASC, vec_id ASC) AS adc_rank
           FROM scored) WHERE adc_rank <= 64),
       rerank AS (
         SELECT s.query_id, s.vec_id AS neighbor_id,
           list_dot_product(e.v, qe.v) AS cos
         FROM shortlist s
         JOIN emb e ON e.vec_id = s.vec_id
         JOIN emb qe ON qe.vec_id = s.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM rerank)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  /** SemDeDup oracle: codebook as a VALUES literal; DuckDB re-derives
    * assignment, the centroid-distance rank, and the earlier-clustermate
    * removal rule. */
  private def semDedupOracle(cents: Array[Array[Double]]): String = {
    val vals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    s"""WITH cells(cell, c) AS (VALUES $vals),
       emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       dist AS (
         SELECT e.vec_id, e.v, cl.cell,
           list_sum(list_transform(generate_series(1, len(cl.c)),
             i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
         FROM emb e CROSS JOIN cells cl),
       asg AS (
         SELECT vec_id, v, cell, d2, sqrt(list_dot_product(v, v)) AS n
         FROM (SELECT vec_id, v, cell, d2,
             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
           FROM dist) WHERE rk = 1),
       rnk AS (
         SELECT vec_id, v, n, cell,
           row_number() OVER (PARTITION BY cell
             ORDER BY round(d2, 6), vec_id) AS rk
         FROM asg),
       pairs AS (
         SELECT b.vec_id, b.cell, a.vec_id AS keep_id, a.rk AS rka,
           list_dot_product(b.v, a.v) / (b.n * a.n) AS cos
         FROM rnk b JOIN rnk a ON a.cell = b.cell AND a.rk < b.rk
         WHERE list_dot_product(b.v, a.v) / (b.n * a.n) >= 0.4),
       sel AS (
         SELECT vec_id, cell, keep_id, cos,
           row_number() OVER (PARTITION BY vec_id, cell ORDER BY rka) AS pr
         FROM pairs)
       SELECT vec_id, cell, keep_id AS kept_id, round(cos, 5) AS cos
       FROM sel WHERE pr = 1 ORDER BY vec_id"""
  }

  /** The k-NN-graph CTE block ([[annKnnGraph]]'s oracle body), shared
    * with the PageRank oracle so both replay the identical edge set. */
  private def knnGraphCtes: String =
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
                 $sqlBucket AS bkt FROM emb),
         q AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
                 unnest($sqlProbes) AS bkt
               FROM b),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             list_dot_product(e.v, q.qv) / (e.n * q.qn) AS cos
           FROM b e JOIN q ON e.bkt = q.bkt AND e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
           FROM scored)"""

  /** Edge-build CTEs shared by the graph-ANN oracles: requires prior
    * CTEs `gq` (query_id, qv, qn, bkt — the probe-exploded side, whose
    * probe set is what differs between the fixed-family and scaled
    * variants) and a candidate-side CTE (`b` for the uncapped gate
    * family, `bc` for the scaled build's per-bucket cap) with
    * (vec_id, v, n, bkt). Emits `gedges` (src, dst): top-[[GraphM]] by
    * (round(cos,6) desc, id asc), made undirected. */
  private def graphEdgeCtes(candSide: String = "b"): String =
    s"""gscored AS (
           SELECT gq.query_id, e.vec_id AS neighbor_id,
             list_dot_product(e.v, gq.qv) / (e.n * gq.qn) AS cos
           FROM $candSide e JOIN gq ON e.bkt = gq.bkt
             AND e.vec_id <> gq.query_id),
         granked AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
           FROM gscored),
         gedges AS (
           SELECT DISTINCT src, dst FROM (
             SELECT query_id AS src, neighbor_id AS dst
             FROM granked WHERE rank <= $GraphM
             UNION ALL
             SELECT neighbor_id AS src, query_id AS dst
             FROM granked WHERE rank <= $GraphM))"""

  /** Unrolled beam-search CTE tail shared by the graph-ANN oracles:
    * requires prior CTEs `emb` (vec_id, v), `b` (vec_id, v, n, ...) and
    * `gedges` (src, dst). `nRounds` rounds (the gate's [[GraphL]], or
    * the scaled variant's recorded log-n count) of candidates =
    * beam ∪ neighbors(beam), exact-cosine score, top-[[GraphW]] by
    * (round(cos,6) desc, id asc) — the same deterministic mechanics the
    * Spark [[beamSearch]] loop runs. b$i is referenced twice by the
    * next candidate union, so it is MATERIALIZED (DuckDB's default CTE
    * inlining doubles the plan per round — the emb_kcenter lesson). */
  private def beamSearchSqlTail(nRounds: Int = GraphL,
                                extraEntrySql: Option[String] = None): String = {
    def roundCtes(i: Int): String = {
      val src = if (i == 0) "entry" else s"c$i"
      s"""s$i AS (
           SELECT c.query_id, c.vec_id,
             list_dot_product(e.v, qq.qv) / (e.n * qq.qn) AS cos
           FROM $src c JOIN b e USING (vec_id) JOIN qq USING (query_id)
           WHERE c.vec_id <> c.query_id),
         b$i AS MATERIALIZED (
           SELECT query_id, vec_id, cos FROM (
             SELECT s$i.*, row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, vec_id ASC) AS rk FROM s$i)
           WHERE rk <= $GraphW)"""
    }
    def candCte(i: Int): String =
      s"""c$i AS (
           SELECT DISTINCT query_id, vec_id FROM (
             SELECT query_id, vec_id FROM b${i - 1}
             UNION ALL
             SELECT p.query_id, g.dst AS vec_id
             FROM b${i - 1} p JOIN gedges g ON g.src = p.vec_id))"""
    val rounds = (roundCtes(0) +: (1 to nRounds).flatMap(i =>
      Seq(candCte(i), roundCtes(i)))).mkString(",\n         ")
    val entryCte = extraEntrySql match {
      case None =>
        s"""entry AS (SELECT qq.query_id, e.vec_id
                   FROM qq CROSS JOIN emb e WHERE e.vec_id < $GraphEntryBound)"""
      case Some(x) =>
        s"""entry AS (SELECT qq.query_id, e.vec_id
                   FROM qq CROSS JOIN emb e WHERE e.vec_id < $GraphEntryBound
                   UNION
                   $x)"""
    }
    s"""qq AS (SELECT vec_id AS query_id, v AS qv, n AS qn FROM b
                WHERE vec_id IN (${queryIds.mkString(", ")})),
         $entryCte,
         $rounds
         SELECT query_id, rk AS rank, vec_id AS neighbor_id,
           round(cos, 5) AS cos
         FROM (
           SELECT b$nRounds.*, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, vec_id ASC) AS INTEGER) AS rk
           FROM b$nRounds)
         WHERE rk <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB bucket expression for the first `p` planes of the scaled
    * family (generalizes [[sqlBucket]]). */
  private def sqlBucketN(p: Int): String = {
    val pl = planesN(p)
    pl.indices.map { i =>
      s"(CASE WHEN list_dot_product(v, ${pl(i).mkString("[", ",", "]")}) > 0" +
        s" THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** Oracle for [[annGraphScaled]] given the recorded plane count:
    * same edge-build + beam-search CTEs as the fixed-family oracle, but
    * the bucket uses the P-plane family and the probe set is the 1-bit
    * flip family the scaled build runs. */
  private def graphScaledOracle(p: Int): String = {
    val probes1 =
      "[bkt, " + (0 until p).map(i => s"xor(bkt,${1 << i})").mkString(", ") + "]"
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         b AS MATERIALIZED (
               SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
                 ${sqlBucketN(p)} AS bkt FROM emb),
         bc AS (SELECT vec_id, v, n, bkt FROM (
                  SELECT b.*, row_number() OVER (PARTITION BY bkt
                    ORDER BY vec_id ASC) AS brk FROM b)
                WHERE brk <= $GraphBuildCap),
         gq AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
                  unnest($probes1) AS bkt FROM b),
         ${graphEdgeCtes("bc")},
         ${beamSearchSqlTail(GraphL, Some(
           s"""SELECT qb.query_id, bc.vec_id
               FROM (SELECT vec_id AS query_id, unnest($probes1) AS bkt
                     FROM b
                     WHERE vec_id IN (${queryIds.mkString(", ")})) qb
               JOIN bc USING (bkt)"""))}"""
  }

  /** DuckDB replay of [[annGraphAppend]]: the 90/10 split rule, the
    * base corpus's P-plane family and lowest-ids-per-bucket cap, the
    * batch's 2-bit probe set (the denser family the append deliberately
    * spends on — see the annGraphAppend body), and the top-M ranking. */
  private def graphAppendOracle(p: Int): String = {
    val probes2 =
      "[bkt, " + masks2N(p).map(m => s"xor(bkt,$m)").mkString(", ") + "]"
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         b AS MATERIALIZED (
               SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
                 ${sqlBucketN(p)} AS bkt FROM emb WHERE vec_id % 10 <> 7),
         bc AS (SELECT vec_id, v, n, bkt FROM (
                  SELECT b.*, row_number() OVER (PARTITION BY bkt
                    ORDER BY vec_id ASC) AS brk FROM b)
                WHERE brk <= $GraphBuildCap),
         nb0 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
                 ${sqlBucketN(p)} AS bkt FROM emb WHERE vec_id % 10 = 7),
         nb AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
                 unnest($probes2) AS bkt FROM nb0),
         scored AS (
           SELECT nb.query_id, bc.vec_id AS neighbor_id,
             list_dot_product(bc.v, nb.qv) / (bc.n * nb.qn) AS cos
           FROM bc JOIN nb USING (bkt)),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
           FROM scored)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= $GraphM ORDER BY query_id, rank"""
  }

  /** Oracle for [[annGraphScaledStats]]: the identical closed-form
    * bucket-histogram computation over the P-plane 1-bit-probe family
    * and per-bucket cap. */
  private def graphScaledStatsOracle(p: Int): String = {
    val probes1 =
      "[bkt, " + (0 until p).map(i => s"xor(bkt,${1 << i})").mkString(", ") + "]"
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         b AS (SELECT vec_id, ${sqlBucketN(p)} AS bkt FROM emb),
         pop AS (SELECT bkt, count(*) AS pop FROM b GROUP BY 1),
         phits AS (SELECT bkt, count(*) AS ph FROM (
             SELECT unnest($probes1) AS bkt FROM b) GROUP BY 1),
         cand AS (SELECT CAST(sum(least(pop, $GraphBuildCap) * ph
                    - least(pop, $GraphBuildCap)) AS BIGINT) AS n_cand_pairs
                  FROM pop JOIN phits USING (bkt)),
         nv AS (SELECT count(*) AS n_vec FROM b)
       SELECT nv.n_vec, $p AS n_planes, $GraphBuildCap AS cap,
         cand.n_cand_pairs,
         round(CAST(cand.n_cand_pairs AS DOUBLE) / nv.n_vec, 2)
           AS cand_per_vec
       FROM cand CROSS JOIN nv"""
  }

  /** Unrolled DuckDB replay of [[annHnsw]]: deterministic levels
    * (bit_count trailing-zeros of the portable md5 hash), per-layer
    * member-restricted edge builds, the apex descent, and the layer-0
    * beam — every CTE in bit-for-bit lockstep with the Spark loop. */
  private def hnswOracle: String = {
    val sqlProbes2 =
      "[bkt, " + flips2.map(m => s"xor(bkt,$m)").mkString(", ") + "]"
    val layerCtes = (0 to HnswLCap).map { l =>
      s"""gq$l AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
                  unnest($sqlProbes2) AS bkt FROM b WHERE lev >= $l),
         gs$l AS (
           SELECT gq$l.query_id, e.vec_id AS neighbor_id,
             list_dot_product(e.v, gq$l.qv) / (e.n * gq$l.qn) AS cos
           FROM b e JOIN gq$l ON e.bkt = gq$l.bkt
             AND e.vec_id <> gq$l.query_id
           WHERE e.lev >= $l),
         gr$l AS (
           SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
           FROM gs$l),
         ge$l AS MATERIALIZED (
           SELECT DISTINCT src, dst FROM (
             SELECT query_id AS src, neighbor_id AS dst
             FROM gr$l WHERE rank <= $GraphM
             UNION ALL
             SELECT neighbor_id AS src, query_id AS dst
             FROM gr$l WHERE rank <= $GraphM))"""
    }.mkString(",\n         ")
    // hb$i is referenced TWICE by the next round's candidate union —
    // without MATERIALIZED, DuckDB's default CTE inlining doubles the
    // plan per round (2^12 scans over 12 rounds: "Too many open files",
    // the emb_kcenter lesson). Same for the shared b/qq/ge tables.
    def sCte(i: Int, src: String, w: Int): String =
      s"""hs$i AS (
           SELECT c.query_id, c.vec_id,
             list_dot_product(e.v, qq.qv) / (e.n * qq.qn) AS cos
           FROM $src c JOIN b e USING (vec_id) JOIN qq USING (query_id)),
         hb$i AS MATERIALIZED (
           SELECT query_id, vec_id, cos FROM (
             SELECT hs$i.*, row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, vec_id ASC) AS rk FROM hs$i)
           WHERE rk <= $w)"""
    def cCte(i: Int, lay: Int): String =
      s"""hc$i AS (
           SELECT DISTINCT query_id, vec_id FROM (
             SELECT query_id, vec_id FROM hb${i - 1}
             UNION ALL
             SELECT p.query_id, g.dst AS vec_id
             FROM hb${i - 1} p JOIN ge$lay g ON g.src = p.vec_id))"""
    // round schedule mirrors the Spark loop: apex, then RUp rounds per
    // upper layer LCap..1 at width WUp, then GraphL rounds at layer 0
    // at width GraphW
    val sched =
      (HnswLCap to 1 by -1).flatMap(l => Seq.fill(HnswRUp)((l, HnswWUp))) ++
        Seq.fill(GraphL)((0, GraphW))
    val rounds = (sCte(0, "e0", HnswWUp) +: sched.zipWithIndex.flatMap {
      case ((lay, w), k) => Seq(cCte(k + 1, lay), sCte(k + 1, s"hc${k + 1}", w))
    }).mkString(",\n         ")
    val last = sched.length
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         b0v AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n,
                 $sqlBucket AS bkt,
                 CAST(md5_number_lower(CAST(vec_id AS VARCHAR))
                   & 9223372036854775807 AS BIGINT) AS lvh
               FROM emb),
         b AS MATERIALIZED (SELECT vec_id, v, n, bkt,
                 CAST(least(bit_count((lvh & -lvh) - 1), $HnswLCap)
                   AS INTEGER) AS lev
               FROM b0v),
         $layerCtes,
         qq AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv, n AS qn
                FROM b
                WHERE vec_id IN (${queryIds.mkString(", ")})),
         apex AS (SELECT vec_id FROM b
                  ORDER BY lev DESC, vec_id ASC LIMIT 1),
         e0 AS (SELECT qq.query_id, apex.vec_id FROM qq CROSS JOIN apex),
         $rounds
         SELECT query_id, rk AS rank, vec_id AS neighbor_id,
           round(cos, 5) AS cos
         FROM (
           SELECT hb$last.*, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, vec_id ASC) AS INTEGER) AS rk
           FROM hb$last WHERE vec_id <> query_id)
         WHERE rk <= 5 ORDER BY query_id, rank"""
  }

  /** DuckDB replay of [[annSq8]]: bounds re-derived (exact min/max),
    * identical quantize/dequantize arithmetic, candidates ranked by the
    * dequantized-reconstruction cosine ((round(ascore, 6) desc, id asc)
    * shortlist — the raw integer dot ranks wrong, see [[annSq8]]),
    * exact-cosine re-rank of the 64-id shortlist. */
  private val sq8Oracle: String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
       bounds AS (
         SELECT list(lo ORDER BY pos) AS lo, list(hi ORDER BY pos) AS hi
         FROM (SELECT pos, min(x) AS lo, max(x) AS hi FROM (
                 SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
                 FROM emb) GROUP BY pos)),
       enc0 AS (
         SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n, lo, hi,
           list_transform(generate_series(1, len(v)), i ->
             CASE WHEN hi[i] > lo[i] THEN
               greatest(0, least(255, CAST(floor((v[i] - lo[i])
                 / (hi[i] - lo[i]) * 255.0 + 0.5) AS INTEGER)))
             ELSE 0 END) AS q
         FROM emb CROSS JOIN bounds),
       enc AS (
         SELECT vec_id, v, n,
           list_transform(generate_series(1, len(q)), i ->
             lo[i] + CAST(q[i] AS DOUBLE) * (hi[i] - lo[i]) / 255.0) AS dq
         FROM enc0),
       qs AS (SELECT vec_id AS query_id, v AS qv, n AS qn, dq AS qdq
              FROM enc WHERE vec_id IN (${queryIds.mkString(", ")})),
       scored AS (
         SELECT qs.query_id, e.vec_id,
           list_dot_product(e.dq, qs.qdq) / (e.n * qs.qn) AS ascore
         FROM enc e CROSS JOIN qs WHERE e.vec_id <> qs.query_id),
       short AS (
         SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id, row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(ascore, 6) DESC, vec_id ASC) AS rk
           FROM scored) WHERE rk <= 64),
       rerank AS (
         SELECT s.query_id, s.vec_id AS neighbor_id,
           list_dot_product(e.v, q.qv) / (e.n * q.qn) AS cos
         FROM short s
         JOIN enc e ON e.vec_id = s.vec_id
         JOIN qs q ON q.query_id = s.query_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
             ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
         FROM rerank)
       SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  /** One PageRank iteration's CTE in FIXED-POINT arithmetic: ranks are
    * 1e-9-scaled BIGINTs, each edge contributes `ri // deg` (floor
    * integer division), and the damped update is
    * `(15*SCALE)//(100*n) + (85*inflow)//100` — every op exact and
    * ASSOCIATIVE, so the result is independent of summation order and
    * engine. Doubles can't give that here: contributions `r/2` of
    * 9-dp-grid ranks land exactly on half-grid points, where both the
    * rounding tie-break (Spark decimal-string vs DuckDB binary) and
    * the IEEE summation order flip the last digit. Nodes with no
    * in-edges take the teleport term via the left join's coalesce. */
  private def prIterSql(i: Int): String =
    s"""r$i AS (SELECT nd.node,
           (15000000000 // (100 * nn.n))
             + (85 * coalesce(f.inflow, 0)) // 100 AS ri
         FROM nodes nd CROSS JOIN nn
         LEFT JOIN (
           SELECT e.dst AS node, sum(p.ri // d.deg) AS inflow
           FROM edges e
           JOIN r${i - 1} p ON e.src = p.node
           JOIN deg d ON e.src = d.src
           GROUP BY e.dst) f ON f.node = nd.node)"""

  private def pagerankOracle: String =
    s"""WITH $knnGraphCtes,
         edges AS (SELECT query_id AS src, neighbor_id AS dst
                   FROM ranked WHERE rank <= 3),
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         nodes AS (SELECT vec_id AS node FROM emb),
         nn AS (SELECT count(*) AS n FROM nodes),
         r0 AS (SELECT node, 1000000000 // nn.n AS ri
                FROM nodes CROSS JOIN nn),
         ${(1 to 5).map(prIterSql).mkString(",\n         ")}
         SELECT node AS vec_id, CAST(ri AS DOUBLE) / 1e9 AS pr FROM r5
         ORDER BY vec_id"""

  /** PageRank over the [[annKnnGraph]] edge set — graph centrality in
    * embedding space, the link-analysis quality signal a crawl-scale
    * curation pipeline computes (and a second consumer of the k-NN
    * graph, as SemDeDup is of k-means). Five damped iterations
    * (d = 0.85, no dangling redistribution — dangling mass decays,
    * which is fine for a per-node diagnostic and keeps both replays
    * identical), in 1e-9 FIXED-POINT integer arithmetic (see
    * [[prIterSql]]) so the replay is exact regardless of engine or
    * summation order.
    *
    * Scale shape: the edge list is built once and CACHED (corpus × k
    * rows); each iteration is one edge-sized join + one node-sized
    * aggregate — the canonical Spark PageRank loop. At 100 TB you'd
    * co-partition edges and ranks on src (one-time bucketing amortized
    * over iterations) and checkpoint the rank lineage every few
    * rounds; at gate scale the single linear lineage is optimal. */
  def embPagerank(s: SparkSession, d: String): DataFrame = {
    val edges = annKnnGraph(s, d)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = Tables.embeddings(s, d).select(col("vec_id").as("node"))
    val n = nodes.count()
    val scale = 1000000000L
    var ranks = nodes.withColumn("ri", lit(scale / n))
    for (_ <- 1 to 5) {
      val inflow = edges.join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("ri div deg")).as("inflow"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(15L * scale / (100L * n)) +
            expr("(85 * coalesce(inflow, 0L)) div 100")).as("ri"))
    }
    // the cache stays marked: the loop is LAZY, so the edge subtree is
    // referenced 6 times in one final plan — it materializes once at
    // first access and the other references reuse it (unpersisting here
    // would drop the mark before any action ran). Output converts the
    // fixed-point rank once: long → double is exact below 2^53 and the
    // single /1e9 is one IEEE op, identical everywhere.
    ranks
      .select(col("node").as("vec_id"),
        (col("ri").cast("double") / lit(1e9)).as("pr"))
      .orderBy("vec_id")
  }

  /** DBSCAN over embedding space (eps-ball = cosine >= 0.38,
    * minPts = 3) — the density-clustering counterpart to [[embKmeans]]:
    * finds arbitrarily-shaped dense regions and explicitly labels
    * NOISE, which is what a curation pipeline wants for "template
    * families + one-off junk" corpora where k-means would force every
    * outlier into a centroid. Fully deterministic variant: border
    * points join the MINIMUM cluster rep among their core neighbors
    * (classic DBSCAN leaves that order-dependent), so the DuckDB
    * oracle replays the exact assignment.
    *
    * Stages and scale shape: (1) eps-neighbor pairs via the exact
    * block-nested cosine join ([[Dedup.embCosinePairsAt]]) — the
    * O(n^2)-work audit generator; at 100 TB swap in the LSH-bucketed
    * candidate generator ([[embLshPairsFrom]]), which prunes to
    * near-threshold candidates and leaves every later stage untouched.
    * (2) degree count -> core points (one aggregate). (3) connected
    * components over CORE-CORE edges only (density connectivity never
    * crosses a border point) via the graph-size-adaptive
    * [[Dedup.componentLabels]] — union-find in one task for small
    * graphs, pointer-jumping min-label at scale. (4) border points by
    * one edge-sized join + min aggregate. Everything after the pair
    * join is edge- or node-sized, never corpus^2. */
  def embDbscan(s: SparkSession, d: String): DataFrame = {
    val minPts = 3
    val pairs = Dedup.embCosinePairsAt(s, d, 0.38)
      .select("id_a", "id_b")
      .persist()
    pairs.count()
    // both edge directions from the cached pair table (cheap to re-derive)
    val sym = pairs
      .select(explode(array(
        struct(col("id_a").as("a"), col("id_b").as("b")),
        struct(col("id_b").as("a"), col("id_a").as("b")))).as("e"))
      .select("e.a", "e.b")
    val core = sym.groupBy(col("a").as("vec_id"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") + 1 >= minPts) // the point itself counts
      .select("vec_id")
    val coreEdges = pairs
      .join(core.withColumnRenamed("vec_id", "id_a"), "id_a")
      .join(core.withColumnRenamed("vec_id", "id_b"), "id_b")
      .select("id_a", "id_b")
    // isolated cores (all-border neighborhoods) have no core-core edge
    // and never reach componentLabels — they seed their own cluster
    val coreLab = core
      .join(Dedup.componentLabels(s, coreEdges)
          .withColumnRenamed("doc_id", "vec_id"),
        Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("lbl"), col("vec_id")).as("cluster"))
    val border = sym
      .join(coreLab.select(col("vec_id").as("b"), col("cluster").as("ncl")), "b")
      .join(core.withColumnRenamed("vec_id", "a"), Seq("a"), "left_anti")
      .groupBy(col("a").as("vec_id"))
      .agg(min("ncl").as("cluster"))
    val assigned = coreLab.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    val out = Tables.embeddings(s, d).select("vec_id")
      .join(assigned, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
      .orderBy("vec_id")
    pairs.unpersist()
    out
  }

  private def dbscanOracle: String =
    """WITH RECURSIVE e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.v, b.v) >= 0.38),
       sym AS (SELECT id_a AS a, id_b AS b FROM p
               UNION ALL SELECT id_b, id_a FROM p),
       core AS (SELECT a AS vec_id FROM sym GROUP BY a
                HAVING count(*) + 1 >= 3),
       ce AS (SELECT s.a, s.b FROM sym s
              JOIN core ca ON s.a = ca.vec_id
              JOIN core cb ON s.b = cb.vec_id),
       reach(a, b) AS (
         SELECT a, b FROM ce
         UNION
         SELECT r.a, ce.b FROM reach r JOIN ce ON r.b = ce.a),
       corelab AS (
         SELECT c.vec_id,
           least(c.vec_id, coalesce(min(r.b), c.vec_id)) AS cluster
         FROM core c LEFT JOIN reach r ON r.a = c.vec_id
         GROUP BY c.vec_id),
       border AS (
         SELECT s.a AS vec_id, min(l.cluster) AS cluster
         FROM sym s JOIN corelab l ON s.b = l.vec_id
         WHERE s.a NOT IN (SELECT vec_id FROM core)
         GROUP BY s.a)
       SELECT n.vec_id,
         coalesce(cl.cluster, bo.cluster, -1) AS cluster,
         CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
              WHEN bo.vec_id IS NOT NULL THEN 'border'
              ELSE 'noise' END AS role
       FROM e n
       LEFT JOIN corelab cl ON n.vec_id = cl.vec_id
       LEFT JOIN border bo ON n.vec_id = bo.vec_id
       ORDER BY n.vec_id"""

  /** One k-means iteration's CTE block: distances to the incoming
    * centroid set `cPrev` (same expanded square + 6-dp quantization as
    * [[kmAssign]]), argmin assignment, and — unless final — 6-dp mean
    * centroids with empty clusters inheriting from `cPrev`. */
  private def kmIterSql(i: Int, cPrev: String, last: Boolean): String = {
    val base = s"""
         d$i AS (SELECT e.vec_id, c.cid,
             round(greatest(0.0, list_dot_product(e.v, e.v)
               - 2 * list_dot_product(e.v, c.c)
               + list_dot_product(c.c, c.c)), 6) AS dist
           FROM emb e CROSS JOIN $cPrev c),
         a$i AS (SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
           FROM d$i)"""
    if (last) base
    else base + s""",
         m$i AS (SELECT cid, pos, round(avg(x), 6) AS m FROM (
             SELECT a.cid, generate_subscripts(e.v, 1) AS pos,
               unnest(e.v) AS x
             FROM emb e JOIN a$i a ON e.vec_id = a.vec_id AND a.rn = 1)
           GROUP BY cid, pos),
         c$i AS (SELECT p.cid, coalesce(n.c, p.c) AS c FROM $cPrev p
           LEFT JOIN (SELECT cid, list(m ORDER BY pos) AS c FROM m$i
                      GROUP BY cid) n USING (cid))"""
  }

  private val kmeansOracle: String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
         c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
             v AS c
           FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)),
         ${kmIterSql(1, "c0", last = false)},
         ${kmIterSql(2, "c1", last = false)},
         ${kmIterSql(3, "c2", last = true)}
         SELECT vec_id, cid AS cluster, dist FROM a3 WHERE rn = 1
         ORDER BY vec_id"""

  def oracles: Map[String, String] = oraclesFor(None)

  /** Oracle map threaded with the dataset dir being dumped: the
    * scaled-graph entries interpolate the plane family recorded for
    * THAT dir ([[scaledGraphP]] already keys per dir), so a session
    * that runs against two dirs and dumps for the first cannot pick up
    * the second dir's family. The no-arg form falls back to the
    * last-run dir (ad-hoc use only; [[Verify]] always threads). */
  /** The exact brute-force top-5 oracle — shared with the streaming
    * twin `stream_ann_topk_sink` (graft.streaming.StreamGate), whose
    * per-batch-top-5-then-global-top-5 composition returns the
    * identical rows (cosine top-k distributes over any partition of
    * the corpus). */
  private[graft] val annTopkOracleSql: String =
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS query_id, v AS qv FROM emb
               WHERE vec_id IN (1, 7, 42, 99, 123, 200, 256, 300, 404, 499)),
         scored AS (
           SELECT q.query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(e.v, q.qv) AS cos
           FROM emb e JOIN q ON e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id
               ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
           FROM scored)
         SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
         FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  def oraclesFor(dumpDir: Option[String]): Map[String, String] = Map(
    "emb_kcenter" -> kcenterOracle,
    "emb_kmeans" -> kmeansOracle,
    // approximate LSH queries, EXACT oracles: DuckDB runs the identical
    // deterministic hash family (planes interpolated as literals)
    "ann_lsh" -> lshOracleSelect,
    "ann_lsh_bucketed" -> lshOracleSelect,
    "dedup_emb_lsh" -> lshPairsOracle,
    "ann_topk" -> annTopkOracleSql,
    "ann_knn_graph" ->
      s"""WITH $knnGraphCtes
         SELECT query_id, rank, neighbor_id, round(cos, 5) AS cos
         FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""",
    "ann_graph_search" -> {
      val sqlProbes2 =
        "[bkt, " + flips2.map(m => s"xor(bkt,$m)").mkString(", ") + "]"
      s"""WITH $knnGraphCtes,
         gq AS (SELECT vec_id AS query_id, v AS qv, n AS qn,
                  unnest($sqlProbes2) AS bkt FROM b),
         ${graphEdgeCtes()},
         ${beamSearchSqlTail()}"""
    },
    "ann_hnsw" -> hnswOracle,
    "ann_sq8" -> sq8Oracle,
    // row-identical to ann_sq8 (encode∘decode reproduces the same
    // reconstructions) — same oracle text
    "ann_sq8_packed" -> sq8Oracle,
    "emb_pagerank" -> pagerankOracle,
    "emb_dbscan" -> dbscanOracle,
    "emb_outliers" ->
      """WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         cent AS (
           SELECT list(m ORDER BY pos) AS c FROM (
             SELECT pos, round(avg(x), 6) AS m FROM (
               SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS x
               FROM emb)
             GROUP BY pos)),
         dists AS (
           SELECT vec_id, round(sqrt(greatest(0.0,
             list_dot_product(v, v) - 2.0 * list_dot_product(v, c)
             + list_dot_product(c, c))), 6) AS dist
           FROM emb CROSS JOIN cent),
         st AS (
           SELECT count(*) AS n, round(sum(dist), 6) AS msum,
             round(sum(dist * dist), 6) AS ssum
           FROM dists)
         SELECT vec_id, dist,
           round((dist - msum / n)
             / sqrt((ssum - msum * msum / n) / (n - 1)), 4) AS z
         FROM dists CROSS JOIN st
         ORDER BY abs(z) DESC, vec_id ASC LIMIT 20""",
    "emb_random_projection" -> {
      val projList = (0 until 16)
        .map(j => s"round(list_dot_product(v, ${jlSigns(j)
          .mkString("[", ",", "]")}) * 0.25, 6)")
        .mkString("[", ", ", "]")
      s"""WITH emb AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         samp AS (
           SELECT vec_id, v, $projList AS p
           FROM emb ORDER BY vec_id LIMIT 64),
         pr AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             greatest(0.0, list_dot_product(a.v, a.v)
               + list_dot_product(b.v, b.v)
               - 2.0 * list_dot_product(a.v, b.v)) AS d2o,
             greatest(0.0, list_dot_product(a.p, a.p)
               + list_dot_product(b.p, b.p)
               - 2.0 * list_dot_product(a.p, b.p)) AS d2p
           FROM samp a JOIN samp b ON a.vec_id < b.vec_id)
         SELECT id_a, id_b, round(sqrt(d2o), 5) AS d_orig,
           round(sqrt(d2p), 5) AS d_proj,
           CASE WHEN d2o > 0 THEN round(sqrt(d2p) / sqrt(d2o), 4)
                ELSE NULL END AS ratio
         FROM pr ORDER BY id_a, id_b"""
    },
    "emb_lang_centroids" ->
      """WITH sel AS (
           SELECT d.lang,
             generate_subscripts(e.embedding, 1) AS pos,
             unnest(CAST(e.embedding AS DOUBLE[])) AS x
           FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
         cent AS (
           SELECT lang, pos, round(avg(x), 6) AS m
           FROM sel GROUP BY 1, 2)
         SELECT a.lang AS lang_a, b.lang AS lang_b,
           round(sum(a.m * b.m)
             / (sqrt(sum(a.m * a.m)) * sqrt(sum(b.m * b.m))), 4) AS cos
         FROM cent a JOIN cent b
           ON a.pos = b.pos AND a.lang < b.lang
         GROUP BY 1, 2 ORDER BY 1, 2""") ++
    Seq("ann_ivf", "ann_ivf_bucketed").flatMap { k =>
      codebookFor(k, dumpDir).map(c => k -> ivfOracleSelect(c))
    }.toMap ++
    // filtered ANN: same codebook replay, candidates restricted by the
    // metadata predicate (the Spark side pushes it below the cell join)
    Seq("ann_filtered", "ann_filtered_bucketed").flatMap { k =>
      codebookFor(k, dumpDir).map(c => k ->
        ivfOracleSelect(c, "WHERE e.label % 3 = 0", FilteredNProbe))
    }.toMap ++
    codebookFor("ann_ivf_sq8", dumpDir)
      .map(c => "ann_ivf_sq8" -> ivfSq8OracleSelect(c)).toMap ++
    codebookFor("layout_describe", dumpDir)
      .map(c => "layout_describe" -> layoutDescribeOracle(c)).toMap ++
    pqFor("ann_pq", dumpDir)
      .map(c => "ann_pq" -> pqOracleSelect(c)).toMap ++
    Seq("ann_ivfpq", "ann_ivfpq_bucketed").flatMap { k =>
      for {
        cents <- codebookFor(k, dumpDir)
        cbs <- pqFor(k, dumpDir)
      } yield k -> ivfPqOracleSelect(cents, cbs)
    }.toMap ++
    codebookFor("dedup_semantic", dumpDir)
      .map(c => "dedup_semantic" -> semDedupOracle(c)).toMap ++
    // scaled-graph entries: plane count recorded from the corpus count
    // at query time (omitted when the queries haven't run — the
    // IVF-codebook convention), keyed by the dir being dumped
    dumpDir.orElse(Option(lastScaledDir))
      .flatMap(d => Option(scaledGraphP.get(d))).toSeq
      .flatMap(p => Seq(
        "ann_graph_scaled" -> graphScaledOracle(p),
        "ann_graph_scaled_stats" -> graphScaledStatsOracle(p))).toMap ++
    // append entry: BASE-split plane count, recorded at query time
    graphAppendOracleFor(dumpDir)
      .map(sql => "ann_graph_append" -> sql).toMap
}
