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
object Similarity extends SimilarityIvf with SimilarityQuant
    with SimilarityGraph {

  /** Native codegen'd dot product ([[graft.functions.VecDot]], resolved
    * through the session registry) — stays inside whole-stage codegen
    * and reads the unsafe array directly; no UDF invocation or boxing
    * in the per-candidate hot loop. Callers register via [[reg]]. */
  private[operators] def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  private[operators] def reg(s: SparkSession): Unit =
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
  private[operators] def planesN(count: Int): Array[Array[Double]] =
    Array.tabulate(count) { p =>
      var x = 0x9E3779B97F4A7C15L * (p + 1)
      Array.fill(64) {
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545F4914F6CDD1DL) >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
    }

  /** The fixed 8-plane gate family (256 buckets). */
  private[operators] val planes: Array[Array[Double]] = planesN(8)

  /** Sign-LSH bucket id (8-bit) of a vector: 8 plane dot products via the
    * native vec_dot kernel, sign bits OR'd — pure codegen'd expressions,
    * no ScalaUDF (the planes ride along as array literals). */
  private[operators] def bucket(v: Column): Column =
    planes.indices.map { p =>
      when(dot(v, typedLit(planes(p).toSeq)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** A query bucket + its 1-bit flips (multi-probe) — builtin array/xor. */
  private[operators] def probes(b: Column): Column =
    array(b +: (0 until 8).map(i => b.bitwiseXOR(lit(1 << i))): _*)

  /** Bucket + 1-bit + 2-bit flips (37 distinct probe ids) — the denser
    * probe set the [[annGraphSearch]] GRAPH BUILD uses: a node's true
    * neighbors can sit two sign-bits away, and a graph missing those
    * edges caps beam-search recall no matter how long the search runs
    * (measured 0.66 with 1-bit-built edges, r10). Probe ids are
    * distinct, so each (node, candidate) pair still matches at most
    * once. */
  private[operators] val flips2: Seq[Int] =
    (0 until 8).map(1 << _) ++
      (for (i <- 0 until 8; j <- i + 1 until 8) yield (1 << i) | (1 << j))

  private[operators] def probes2(b: Column): Column =
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

  private[operators] def stashKey(name: String, d: String): String =
    name + "@" + new java.io.File(d).getCanonicalPath

  private[operators] def stashCodebook(name: String, d: String,
                            c: Array[Array[Double]]): Unit = {
    trainedCodebooks.put(stashKey(name, d), c)
    lastStashDir = d
  }

  private[operators] def codebookFor(name: String, dumpDir: Option[String])
      : Option[Array[Array[Double]]] =
    dumpDir.orElse(Option(lastStashDir))
      .flatMap(d => Option(trainedCodebooks.get(stashKey(name, d))))

  private[operators] def stashPq(name: String, d: String,
                      c: Array[Array[Array[Double]]]): Unit = {
    trainedPq.put(stashKey(name, d), c)
    lastStashDir = d
  }

  private def pqFor(name: String, dumpDir: Option[String])
      : Option[Array[Array[Array[Double]]]] =
    dumpDir.orElse(Option(lastStashDir))
      .flatMap(d => Option(trainedPq.get(stashKey(name, d))))

  /** Bounded per-group top-k as a MERGEABLE partial+final aggregate —
    * the scale-correct form of
    * `row_number() OVER (PARTITION BY g ORDER BY key, id) <= k`: the
    * window shuffles EVERY scored row to its group's reducer
    * (corpus-proportional in the ANN family), where this keeps at most
    * k (key, id, payload) triples per group per partition, so the only
    * exchange carries k-bounded partial states (~KBs). Ordering is
    * (key asc, id asc) — callers negate the key for descending; the
    * payload rides along for output (e.g. the unrounded cosine). */
  private[operators] final class TopKOrdered(cap: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Double, Long, Double), Array[Double], Array[(Long, Double)]] {
    // Buffer = FLAT primitive Array[Double] of (key, id, payload)
    // triples, ascending by (key, id) — ~1/3 the boxed-tuple footprint
    // (r13: the 2M-wide shortlist state at 1M hash-aggregate groups per
    // task OOM'd the 24g probe heap under the boxed encoding; flat
    // k=16 costs what boxed k=8 did). Ids ride as doubles — exact for
    // ids < 2^53, the same representation the sort KEY already used.
    def zero: Array[Double] = Array.empty
    def reduce(buf: Array[Double], x: (Double, Long, Double)): Array[Double] = {
      val n = buf.length / 3
      val xk = x._1; val xi = x._2.toDouble
      if (n == cap && {
        val lk = buf(3 * n - 3); val li = buf(3 * n - 2)
        lk < xk || (lk == xk && li <= xi)
      }) buf
      else {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          val mk = buf(3 * mid); val mi = buf(3 * mid + 1)
          if (mk < xk || (mk == xk && mi < xi)) lo = mid + 1
          else hi = mid
        }
        val outN = math.min(n + 1, cap)
        val out = new Array[Double](outN * 3)
        System.arraycopy(buf, 0, out, 0, lo * 3)
        out(lo * 3) = xk; out(lo * 3 + 1) = xi; out(lo * 3 + 2) = x._3
        System.arraycopy(buf, lo * 3, out, lo * 3 + 3, (outN - lo - 1) * 3)
        out
      }
    }
    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      val an = a.length / 3; val bn = b.length / 3
      val outN = math.min(an + bn, cap)
      val out = new Array[Double](outN * 3)
      var i = 0; var j = 0; var k = 0
      while (k < outN) {
        val takeA = j >= bn || (i < an && {
          val ak = a(3 * i); val ai = a(3 * i + 1)
          val bk = b(3 * j); val bi = b(3 * j + 1)
          ak < bk || (ak == bk && ai <= bi)
        })
        if (takeA) { System.arraycopy(a, 3 * i, out, 3 * k, 3); i += 1 }
        else { System.arraycopy(b, 3 * j, out, 3 * k, 3); j += 1 }
        k += 1
      }
      out
    }
    def finish(buf: Array[Double]): Array[(Long, Double)] =
      Array.tabulate(buf.length / 3)(i =>
        (buf(3 * i + 1).toLong, buf(3 * i + 2)))
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Array[Double]]()
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
  private[operators] def rankedTopK(scored: DataFrame, k: Int): DataFrame = {
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
  private[operators] def shortlistTopK(scored: DataFrame, k: Int): DataFrame = {
    val agg = udaf(new TopKOrdered(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Double, Long, Double)]())
    scored
      .groupBy("query_id")
      .agg(agg(col("d2r"), col("vec_id"), lit(0.0)).as("top"))
      .select(col("query_id"), explode(col("top")).as("p"))
      .select(col("query_id"), col("p._1").as("vec_id"))
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
  private[operators] val jlSigns: Array[Array[Double]] = Array.tabulate(16) { j =>
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

  /** Distances of every vector to each of the current centroids, as an
    * expanded-square projection (||v||² − 2 v·c + ||c||²; the v·c term
    * is one [[dot]] kernel per centroid against an array LITERAL, so
    * the whole assignment is a zero-shuffle codegen'd map). Distances
    * are clamped at 0 (float cancellation near a centroid) and
    * QUANTIZED to 6 decimals before the argmin, so both engines rank
    * identical doubles; ties break to the lowest cluster id
    * (array_position returns the FIRST minimal slot). */
  private[operators] def kmAssign(e: DataFrame, cents: Array[Array[Double]]): DataFrame = {
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
  private[operators] def planeLit(p: Int): String =
    planes(p).mkString("[", ",", "]")

  private[operators] val sqlBucket: String =
    planes.indices.map { p =>
      s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private[operators] val sqlProbes: String =
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
