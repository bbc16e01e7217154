package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Retrieval-stack operators for an LLM data/serving pipeline: hybrid
  * lexical+vector search with reciprocal-rank fusion, diversity
  * re-ranking (maximal marginal relevance), and offline rank-quality
  * evaluation (nDCG) — the layer between the index operators
  * ([[Similarity]]'s ANN family, [[Quality.bm25]]'s posting-list shape)
  * and a serving application. Reference counterpart: mobilityduck has no
  * retrieval surface; these extend the pipeline family the same way the
  * dedup/ANN operators do (builder brief: training-data pipeline ops are
  * first-class). Everything here is deterministic and fully
  * SQL-expressible, so every entry is an exact-hash gate row with a
  * STATIC DuckDB oracle — no trained-artifact interpolation needed.
  *
  * Scale design (100 TB): each leg is the already-scaled operator it
  * composes — the BM25 leg's explode filters to the query terms AT THE
  * SCAN (the posting-list fetch; at scale it reads an inverted index,
  * [[TextAnalysis]]'s `text_inverted_index` layout), the vector leg is
  * a map-only cosine scan (at scale: any [[Similarity]] ANN index —
  * the legs only need a (doc_id, rank ≤ K) list). Everything AFTER the
  * legs — fusion, MMR, nDCG — operates on K-bounded per-query lists
  * (K ≤ 20 here), so fusion cost is O(queries · K) regardless of corpus
  * size: broadcast joins of rank lists, never a corpus-shaped shuffle.
  */
object Retrieval {

  private def reg(s: SparkSession): Unit =
    graft.functions.GraftFunctions.register(s)

  /** Native codegen dot product ([[graft.functions.VectorExprs]]). */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** The fixed keyword query — identical to [[Quality.bm25]]'s, so the
    * lexical leg is the SAME ranking a user of `text_bm25` sees. */
  private val QueryTerms = Seq("spark", "table", "join")

  /** RRF smoothing constant (Cormack et al. 2009's k = 60). */
  private val RrfK = 60

  /** Legs keep their top [[LegK]]; fusion emits the top [[FusedK]]. */
  private val LegK = 20
  private val FusedK = 10

  /** BM25 scores for [[QueryTerms]] over `documents` — the ONE
    * quantized scorer [[Quality.bm25Score]] over the brute tf
    * derivation, so the lexical leg is the SAME ranking a `text_bm25`
    * user sees by construction (RetrievalSpec additionally pins the
    * rank agreement). */
  private def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val (tf, stats) = Quality.bm25TfDl(Tables.documents(s, d), QueryTerms)
    Quality.bm25Score(tf, stats)
  }

  /** Rank a scored frame's top-`k`: `rank = 1..k` by (`by` desc, id
    * asc). The global window runs AFTER an orderBy().limit(k), so the
    * single-partition exchange it forces holds ≤ k rows — a bounded
    * tail, same defense as the repo's TakeOrdered tails. */
  private def rankTopK(df: DataFrame, id: String, by: String, k: Int,
                       rankName: String): DataFrame =
    df.orderBy(col(by).desc, col(id).asc).limit(k)
      .withColumn(rankName,
        row_number().over(Window.orderBy(col(by).desc, col(id).asc)))
      .select(col(id), col(rankName))

  /** The lexical leg: BM25 top-20 as (doc_id, lex_rank). Eagerly
    * localCheckpointed (bounded: 20 rows) because every consumer reuses
    * it at least twice — as the PRF seed AND in the fusion join (nDCG
    * adds a third use; the IVF twin's qv collect a separate job) — and
    * without the checkpoint each reuse re-executes the corpus-shaped
    * BM25 pipeline (measured: the IVF twin reading the PRUNED layout
    * benched SLOWER than the brute-force hybrid at 100x because it paid
    * BM25 twice). */
  private def lexLeg(s: SparkSession, d: String): DataFrame =
    rankTopK(bm25Scores(s, d), "doc_id", "r4", LegK, "lex_rank")
      .localCheckpoint(true)

  /** Postings are hashed into [[PostingBuckets]] term buckets — the
    * partition key a query's posting fetch prunes on. */
  private val PostingBuckets = 64

  /** Write-time INVERTED-INDEX layout: the full (term, doc_id, tf)
    * posting table partitioned by `tb = xxhash64(term) % 64`, with the
    * document length DENORMALIZED onto each posting row (so scoring
    * needs no corpus-sized dl join) and the corpus stats (avgdl, n) in
    * a 1-row sidecar. The parity twin of [[Similarity.buildIvfLayout]]
    * for the lexical leg: a k-term query reads ≤ k of 64 bucket
    * directories — at 100 TB the posting fetch is partition-pruned I/O
    * proportional to the query terms' document frequency, where
    * [[bm25Scores]] explodes EVERY document's tokens per query batch
    * (the measured 1000x wall: the explode leg shuffles 144 MB and
    * dominates both hybrid entries). Same staleness rule as the ANN
    * layouts: rebuilt when the source parquet is newer than the
    * layout's _SUCCESS marker. */
  def buildPostingLayout(s: SparkSession, d: String): java.io.File = {
    val layout = graft.util.Layouts.dir("postings", d)
    if (graft.util.Layouts.stale(layout, d, "documents")) {
      val docs = Tables.documents(s, d)
      val toks = split(col("text"), " ")
      val dl = docs.select(col("doc_id"), size(toks).as("dl"))
      dl.agg(round(avg("dl"), 6).as("avgdl"), count(lit(1)).as("n"))
        .coalesce(1).write.mode("overwrite").parquet(s"${layout}_stats")
      docs.select(col("doc_id"), explode(toks).as("term"), size(toks).as("dl"))
        .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(xxhash64(col("term")), lit(PostingBuckets)))
        .write.partitionBy("tb").mode("overwrite").parquet(layout.toString)
    }
    layout
  }

  /** [[lexLeg]] served from the posting layout — identical ranks (same
    * tf/df/dl/stats, same quantized arithmetic, proven by the unchanged
    * exact-hash oracle), but the scan reads only the query terms'
    * bucket directories: partition pruning on `tb` plus an ordinary
    * pushed `term IN (...)` filter inside them. The term→bucket hashes
    * come from a 3-row bounded collect (Spark's own xxhash64, so driver
    * and layout agree by construction). */
  private[graft] def postingScores(s: SparkSession, d: String): DataFrame = {
    val layout = buildPostingLayout(s, d)
    import s.implicits._
    val buckets: Seq[Long] = QueryTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(PostingBuckets)))
      .collect().map(_.getLong(0)).distinct.toSeq
    val stats = s.read.parquet(s"${layout}_stats")
    // the pruned posting fetch yields the same (doc_id, term, tf, dl)
    // schema the brute derivation produces — one shared scorer
    val tf = s.read.parquet(layout.toString)
      .filter(col("tb").isin(buckets: _*))
      .filter(col("term").isin(QueryTerms: _*))
      .select("doc_id", "term", "tf", "dl")
    Quality.bm25Score(tf, stats)
  }

  private def lexLegIndexed(s: SparkSession, d: String): DataFrame =
    rankTopK(postingScores(s, d), "doc_id", "r4", LegK, "lex_rank")
      .localCheckpoint(true)

  /** Embeddings as (vec_id, v float64). */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** The pseudo-relevance query vector: per-dimension mean (rounded to
    * 6 decimals) of the lexical top-3 docs' embeddings — Rocchio-style
    * feedback standing in for a text encoder (none can ship in this
    * container; production swaps this one-row frame for the encoder's
    * output). One row, broadcast everywhere it is used. */
  private def prfVector(s: SparkSession, d: String,
                        lex: DataFrame): DataFrame = {
    val seed = lex.filter(col("lex_rank") <= 3)
      .select(col("doc_id").as("vec_id"))
    emb(s, d).join(broadcast(seed), "vec_id")
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("pos").agg(round(avg("x"), 6).as("m"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m)))," +
        " p -> p.m)").as("qv"))
  }

  /** The vector leg: cosine-to-`qv` top-20 as (doc_id, vec_rank).
    * localCheckpointed (bounded: 20 rows) like [[lexLeg]] — retrievalNdcg
    * consumes it twice (fusion + per-leg nDCG) and would otherwise
    * re-execute the corpus-wide cosine scan AND the PRF-vector
    * derivation behind it (r12 advice). */
  private def vecLeg(s: SparkSession, d: String, qv: DataFrame): DataFrame = {
    val scored = emb(s, d).crossJoin(broadcast(qv))
      .withColumn("r6", round(
        dot(col("v"), col("qv")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("qv"), col("qv")))),
        6))
      .select(col("vec_id").as("doc_id"), col("r6"))
    rankTopK(scored, "doc_id", "r6", LegK, "vec_rank")
      .localCheckpoint(true)
  }

  /** Hybrid search: the BM25 leg and the vector leg fused with
    * reciprocal-rank fusion — `rrf = Σ_legs 1/(60 + rank)`, a leg a doc
    * is absent from contributing 0 (Cormack/Clarke/Buettcher 2009; the
    * fusion every production hybrid store ships because it needs no
    * score calibration between BM25's unbounded scores and cosine's
    * [-1, 1]). Output: fused top-10 as (doc_id, lex_rank, vec_rank,
    * rrf), ranks NULL where a leg didn't retrieve the doc.
    *
    * Plan shape: two bounded rank lists (≤ 20 rows each) full-outer
    * joined — at any corpus size the fusion stage touches 2·K rows per
    * query; the corpus is only read inside the legs, each of which is
    * index-served at scale (inverted index / ANN layout). */
  /** THE RRF fusion — one copy serving both hybrid entries and nDCG:
    * full-outer join of two (doc_id, *_rank) lists, rrf = Σ 1/(60 +
    * rank) with an absent leg contributing 0, fused top-[[FusedK]]. */
  private def fuseRrf(lex: DataFrame, vec: DataFrame): DataFrame =
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(FusedK)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)

  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val lex = lexLeg(s, d)
    fuseRrf(lex, vecLeg(s, d, prfVector(s, d, lex)))
  }

  /** [[hybridRrf]] with BOTH legs served by write-time layouts — the
    * PRODUCTION hybrid. The lexical leg reads the inverted-index
    * posting layout ([[lexLegIndexed]]: partition-pruned to the query
    * terms' ≤3 of 64 buckets — identical ranks to [[lexLeg]], so this
    * substitution leaves the oracle untouched); the vector leg reads
    * ~nprobe/k of the corpus through the IVF layout's static partition
    * pruning ([[Similarity.ivfVectorLeg]]); fusion is unchanged
    * (two ≤20-row rank lists). A separate gate entry rather than a twin
    * because the IVF-pruned top-20 is a different (approximate) leg
    * ranking, so the fused rows differ from [[hybridRrf]]'s —
    * RetrievalSpec pins the overlap floor between the two fused lists,
    * the exact-hash oracle (codebook interpolated, the IVF convention)
    * pins engine parity. */
  def hybridRrfIvf(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val lex = lexLegIndexed(s, d)
    val scored = Similarity.ivfVectorLeg(s, d, prfVector(s, d, lex))
    fuseRrf(lex, rankTopK(scored, "doc_id", "r6", LegK, "vec_rank"))
  }

  /** The deterministic query BATCH ([[hybridRrfBatch]]): 12 two-term
    * keyword queries over the corpus vocabulary (every term exists in
    * both the driver tables' and [[graft.scale.SynthCorpus]]'s common
    * vocabulary, so the batch entry carries decade rows unchanged).
    * Production swaps this literal for a queries table/stream; the
    * operators only see a (query_id, term) frame. */
  private[graft] val BatchQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "table"), 2L -> Seq("join", "hash"),
    3L -> Seq("window", "stream"), 4L -> Seq("sort", "merge"),
    5L -> Seq("filter", "scan"), 6L -> Seq("group", "agg"),
    7L -> Seq("query", "fast"), 8L -> Seq("slow", "batch"),
    9L -> Seq("row", "column"), 10L -> Seq("key", "value"),
    11L -> Seq("order", "line"), 12L -> Seq("data", "big"))

  /** `hybrid_rrf_batch` gate entry — the hybrid stack generalized from
    * ONE hardcoded query to a 12-query BATCH, both legs index-served
    * (r12 verdict #3: the O(queries·K) fusion claim and the posting
    * layout's pruning under a term-set UNION, measured rather than
    * asserted).
    *
    * Leg shapes at scale:
    *  - LEXICAL: one pruned posting fetch for the UNION of the batch's
    *    terms (static `tb IN (...)` partition pruning — ≤ |terms| of 64
    *    bucket dirs read once, shared by all queries), BM25 idf/norm
    *    computed once per term/doc ([[Quality.bm25ScoreBatch]]), then a
    *    broadcast (query_id, term) fan-out and ONE (query_id, doc_id)
    *    aggregate. Adding a query adds only its terms' posting rows —
    *    leg cost scales with Σ df(term), never with corpus × queries.
    *  - VECTOR: per-query Rocchio PRF vectors (12 bounded rows) probed
    *    through the IVF layout with the probed-cell UNION as the scan's
    *    pruning literal ([[Similarity.ivfVectorLegBatch]]); each query
    *    scores only its own nprobe cells via the broadcast pair table.
    *  - RANK/FUSION: per-query top-[[LegK]] via the bounded
    *    [[Similarity.topKPerQuery]] aggregate (KBs exchanged), then the
    *    (query_id, doc_id)-keyed full-outer RRF join over 2·K·|queries|
    *    rows — fusion cost is O(queries·K) regardless of corpus size.
    * Output: per-query fused top-[[FusedK]] as (query_id, doc_id,
    * lex_rank, vec_rank, rrf, fused_rank). Exact oracle: the batch is a
    * VALUES literal, BM25/PRF/cell-probing/fusion replayed per query in
    * DuckDB with the stashed codebook (the IVF convention). */
  /** The batch's pruned posting fetch — the UNION of the 24 terms'
    * bucket hashes as the scan's static `tb IN (...)` partition-pruning
    * literal (≤ |terms| of 64 dirs read once, shared by all queries).
    * Split out so RetrievalSpec can pin the PartitionFilters on the
    * pre-checkpoint plan. */
  private[graft] def batchPostingTf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val layout = buildPostingLayout(s, d)
    val allTerms = BatchQueries.flatMap(_._2).distinct
    // term→bucket hashes via Spark's own xxhash64 (bounded: |terms|
    // rows) so driver literal and layout agree by construction
    val buckets: Seq[Long] = allTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(PostingBuckets)))
      .collect().map(_.getLong(0)).distinct.sorted.toSeq
    s.read.parquet(layout.toString)
      .filter(col("tb").isin(buckets: _*))
      .filter(col("term").isin(allTerms: _*))
      .select("doc_id", "term", "tf", "dl")
  }

  def hybridRrfBatch(s: SparkSession, d: String): DataFrame = {
    reg(s)
    import s.implicits._
    val layout = buildPostingLayout(s, d)
    val stats = s.read.parquet(s"${layout}_stats")
    val tf = batchPostingTf(s, d)
    val qterms = BatchQueries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val lexB = Similarity.topKPerQuery(
      Quality.bm25ScoreBatch(tf, qterms, stats)
        .select(col("query_id"), col("doc_id").as("vec_id"),
          col("r4").as("cos")), LegK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("lex_rank"))
      // bounded (12·20 rows); consumed by the PRF seed AND the fusion
      .localCheckpoint(true)
    // per-query PRF vectors: mean of each query's lexical top-3 docs'
    // embeddings — 12 bounded rows
    val seeds = lexB.filter(col("lex_rank") <= 3)
      .select("query_id", "doc_id")
    val qvs = emb(s, d)
      .join(broadcast(seeds), col("vec_id") === col("doc_id"))
      .select(col("query_id"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("query_id", "pos").agg(round(avg("x"), 6).as("m"))
      .groupBy("query_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m)))," +
        " p -> p.m)").as("qv"))
      // bounded (12 rows); ivfVectorLegBatch collects it for the
      // probed-cell literals AND embeds it in the returned plan — the
      // checkpoint keeps the corpus-wide PRF derivation from running
      // twice (the same r12-advice class as lexB/vecLeg)
      .localCheckpoint(true)
    val vecB = Similarity.topKPerQuery(
      Similarity.ivfVectorLegBatch(s, d, qvs)
        .select(col("query_id"), col("doc_id").as("vec_id"),
          col("r6").as("cos")), LegK)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vec_rank"))
    // (query_id, doc_id)-keyed RRF fusion over ≤ 2·K rows per query;
    // the per-query fused rank window partitions ≤ 40-row groups
    lexB.join(vecB, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("vec_rank")), lit(0.0)), 6))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("rrf").desc, col("doc_id").asc)))
      .filter(col("fused_rank") <= FusedK)
      .select(col("query_id"), col("doc_id"), col("lex_rank"),
        col("vec_rank"), col("rrf"), col("fused_rank"))
      .orderBy("query_id", "fused_rank")
  }

  /** MMR balance: `mmr = λ·relevance − (1−λ)·max-sim-to-selected`. */
  private val MmrLambda = 0.7
  private val MmrQueryId = 42L
  private val MmrK = 5

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    * greedily pick 5 of the query's top-20 cosine candidates, each round
    * choosing the candidate maximizing λ·rel − (1−λ)·max(sim to already
    * selected) — the diversity re-rank that keeps a RAG context window
    * from filling with near-duplicates of one passage. Query = vec_id
    * 42's embedding; rel and pairwise sims are cosines rounded to 6
    * decimals, so the greedy argmax (ties to lowest vec_id) replays
    * identically in DuckDB — the oracle unrolls the 5 rounds as chained
    * CTEs (the ann_hnsw beam convention). Output: (pick 1..5, vec_id,
    * rel, mmr) where round 1's mmr is λ·rel (empty selected set).
    *
    * Plan shape: ONE corpus-shaped stage (the top-20 candidate scan —
    * at scale, any ANN index); everything after operates on the 20-row
    * candidate frame (20×19 pairwise sims, 5 driver-scheduled bounded
    * rounds — k and K are constants, so the loop is O(1) tiny-frame
    * jobs, no collect, no corpus work). */
  def retrievalMmr(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val e = emb(s, d)
    val q = e.filter(col("vec_id") === MmrQueryId)
      .select(col("v").as("qv"), sqrt(dot(col("v"), col("v"))).as("qn"))
    val cand = e.filter(col("vec_id") =!= MmrQueryId)
      .crossJoin(broadcast(q))
      .withColumn("rel", round(
        dot(col("v"), col("qv")) / (sqrt(dot(col("v"), col("v"))) * col("qn")),
        6))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(LegK)
      .select(col("vec_id"), col("v"), col("rel"))
      // the 20-row candidate frame feeds 5 rounds of joins + a pairwise
      // self-join; localCheckpoint keeps the corpus scan from
      // re-executing once per round (bounded: 20 rows)
      .localCheckpoint(true)
    val sims = cand.select(col("vec_id").as("id_a"), col("v").as("va"))
      .join(broadcast(cand.select(col("vec_id").as("id_b"), col("v").as("vb"))),
        col("id_a") =!= col("id_b"))
      .withColumn("sim", round(
        dot(col("va"), col("vb")) /
          (sqrt(dot(col("va"), col("va"))) * sqrt(dot(col("vb"), col("vb")))),
        6))
      .select("id_a", "id_b", "sim")
      .localCheckpoint(true)
    val first = cand
      .withColumn("mmr", round(lit(MmrLambda) * col("rel"), 6))
      .orderBy(col("mmr").desc, col("vec_id").asc).limit(1)
      .select(lit(1).as("pick"), col("vec_id"), col("rel"), col("mmr"))
    var selected = first
    for (r <- 2 to MmrK) {
      val next = cand
        .join(selected.select(col("vec_id")), Seq("vec_id"), "left_anti")
        .join(sims, col("vec_id") === col("id_a"))
        .join(broadcast(selected.select(col("vec_id").as("id_b"))), Seq("id_b"))
        .groupBy(col("vec_id"), col("rel"))
        .agg(max(col("sim")).as("msim"))
        .withColumn("mmr", round(
          lit(MmrLambda) * col("rel") - lit(1.0 - MmrLambda) * col("msim"), 6))
        .orderBy(col("mmr").desc, col("vec_id").asc).limit(1)
        .select(lit(r).as("pick"), col("vec_id"), col("rel"), col("mmr"))
      selected = selected.unionByName(next)
    }
    selected.orderBy("pick")
  }

  /** Offline rank-quality evaluation: nDCG@10 of the three rankings
    * [[hybridRrf]] produces (lexical leg, vector leg, fused) against a
    * graded-relevance standard — the metric a training-data/RAG team
    * actually tracks when tuning a retriever mix. Relevance anchor: the
    * exact-cosine ranking to the LEXICAL TOP-1 doc's embedding (grade =
    * 11 − exact_rank for the exact top-10, else 0) — independent of
    * both legs' ranking functions (BM25 ranks by terms; the vector leg
    * ranks against the top-3 MEAN), so no leg is trivially perfect.
    * DCG = Σ (2^grade − 1)/log2(pos + 1); IDCG is the same sum over
    * grades 10..1 (grades are distinct by construction), making the
    * normalizer a shared constant. Output: (leg, ndcg) — 3 rows.
    *
    * Plan shape: the grade table is one more bounded rank list (exact
    * top-10), the metric a 3-leg × ≤20-row broadcast join + one
    * 3-group aggregate — nothing corpus-shaped beyond the legs. */
  def retrievalNdcg(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val lex = lexLeg(s, d)
    val vec = vecLeg(s, d, prfVector(s, d, lex))
    // fuse the legs already in hand — calling hybridRrf here would
    // re-execute both corpus-shaped legs a second time
    val fused = fuseRrf(lex, vec)
      .withColumn("fused_rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("fused_rank"))
    // relevance anchor: exact cosine to the lexical top-1's embedding
    val anchor = lex.filter(col("lex_rank") === 1)
      .select(col("doc_id").as("vec_id"))
    val av = emb(s, d).join(broadcast(anchor), "vec_id")
      .select(col("v").as("qv"), sqrt(dot(col("v"), col("v"))).as("qn"))
    val graded = emb(s, d).crossJoin(broadcast(av))
      .withColumn("r6", round(
        dot(col("v"), col("qv")) / (sqrt(dot(col("v"), col("v"))) * col("qn")),
        6))
      .select(col("vec_id").as("doc_id"), col("r6"))
    val grades = rankTopK(graded, "doc_id", "r6", FusedK, "grank")
      .select(col("doc_id"), (lit(11) - col("grank")).cast("double").as("grade"))
    // IDCG over the distinct grades 10..1 — a closed-form constant
    val idcg = (1 to FusedK)
      .map(i => (math.pow(2.0, 11.0 - i) - 1.0) / (math.log(i + 1.0) / math.log(2.0)))
      .sum
    def legNdcg(leg: DataFrame, rankCol: String, name: String): DataFrame =
      leg.filter(col(rankCol) <= FusedK)
        .join(broadcast(grades), Seq("doc_id"), "left_outer")
        .withColumn("g", coalesce(col("grade"), lit(0.0)))
        .agg(round(
          sum((pow(lit(2.0), col("g")) - 1.0) /
            (log(col(rankCol) + 1.0) / log(lit(2.0)))) / lit(idcg), 6)
          .as("ndcg"))
        .select(lit(name).as("leg"), col("ndcg"))
    legNdcg(lex, "lex_rank", "lex")
      .unionByName(legNdcg(vec, "vec_rank", "vec"))
      .unionByName(legNdcg(fused, "fused_rank", "fused"))
      .orderBy("leg")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_rrf" -> (hybridRrf _),
    "hybrid_rrf_ivf" -> (hybridRrfIvf _),
    "hybrid_rrf_batch" -> (hybridRrfBatch _),
    "retrieval_mmr" -> (retrievalMmr _),
    "retrieval_ndcg" -> (retrievalNdcg _))

  // ---- DuckDB oracles (static — no trained artifacts) --------------------

  /** The shared leg CTEs: BM25 scores (text_bm25's SQL), lexical top-20
    * ranks, the PRF mean vector, and the vector-leg top-20 ranks. */
  private val legCtes: String =
    s"""d AS (
       SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     dl AS (SELECT doc_id, len(toks) AS dl FROM d),
     stats AS (SELECT round(avg(dl), 6) AS avgdl, count(*) AS n FROM dl),
     tf AS (
       SELECT doc_id, tok AS term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
       WHERE tok IN ('spark', 'table', 'join') GROUP BY 1, 2),
     dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
     idf AS (
       SELECT term,
         round(ln((stats.n - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
       FROM dfq CROSS JOIN stats),
     sc AS (
       SELECT tf.doc_id,
         round(sum(idf.idf * tf.tf * 2.2 / (tf.tf
           + round(1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl), 6))), 4) AS r4
       FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
       CROSS JOIN stats
       GROUP BY 1),
     lex AS (
       SELECT doc_id, row_number() OVER (ORDER BY r4 DESC, doc_id) AS lex_rank
       FROM sc ORDER BY r4 DESC, doc_id LIMIT $LegK),
     emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     qv AS (
       SELECT list(m ORDER BY pos) AS qv FROM (
         SELECT pos, round(avg(x), 6) AS m FROM (
           SELECT generate_subscripts(e.v, 1) AS pos, unnest(e.v) AS x
           FROM emb e JOIN lex ON e.vec_id = lex.doc_id
           WHERE lex.lex_rank <= 3)
         GROUP BY pos)),
     vsc AS (
       SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.v, qv.qv)
           / (sqrt(list_dot_product(e.v, e.v))
              * sqrt(list_dot_product(qv.qv, qv.qv))), 6) AS r6
       FROM emb e CROSS JOIN qv),
     vec AS (
       SELECT doc_id, row_number() OVER (ORDER BY r6 DESC, doc_id) AS vec_rank
       FROM vsc ORDER BY r6 DESC, doc_id LIMIT $LegK)"""

  private val hybridOracle: String =
    s"""WITH $legCtes,
     fused AS (
       SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         lex.lex_rank, vec.vec_rank,
         round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0.0)
             + coalesce(1.0 / ($RrfK + vec.vec_rank), 0.0), 6) AS rrf
       FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
     SELECT doc_id, lex_rank, vec_rank, rrf FROM fused
     ORDER BY rrf DESC, doc_id LIMIT $FusedK"""

  /** The 5 MMR rounds unrolled as chained CTEs (the ann_hnsw beam
    * convention: bounded driver-round loops replay as CTE chains). */
  private val mmrOracle: String = {
    val lam = MmrLambda
    val oneMinus = 1.0 - MmrLambda
    val rounds = (2 to MmrK).map { r =>
      s"""s$r AS (
       SELECT $r AS pick, c.vec_id, c.rel,
         round($lam * c.rel - $oneMinus * max(s.sim), 6) AS mmr
       FROM cand c
       JOIN sim s ON s.id_a = c.vec_id
       JOIN sel${r - 1} t ON s.id_b = t.vec_id
       WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
       GROUP BY c.vec_id, c.rel
       ORDER BY mmr DESC, c.vec_id LIMIT 1),
     sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)"""
    }.mkString(",\n     ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn
           FROM emb WHERE vec_id = $MmrQueryId),
     cand AS (
       SELECT e.vec_id, e.v,
         round(list_dot_product(e.v, q.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * q.qn), 6) AS rel
       FROM emb e CROSS JOIN q WHERE e.vec_id <> $MmrQueryId
       ORDER BY rel DESC, e.vec_id LIMIT $LegK),
     sim AS (
       SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
       FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
     sel1 AS (
       SELECT 1 AS pick, vec_id, rel, round($lam * rel, 6) AS mmr
       FROM cand ORDER BY round($lam * rel, 6) DESC, vec_id LIMIT 1),
     $rounds
     SELECT pick, vec_id, rel, mmr FROM sel$MmrK ORDER BY pick"""
  }

  private val ndcgOracle: String = {
    val idcg = (1 to FusedK)
      .map(i => (math.pow(2.0, 11.0 - i) - 1.0) / (math.log(i + 1.0) / math.log(2.0)))
      .sum
    s"""WITH $legCtes,
     fused0 AS (
       SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0.0)
             + coalesce(1.0 / ($RrfK + vec.vec_rank), 0.0), 6) AS rrf
       FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id),
     fused AS (
       SELECT doc_id,
         row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
       FROM fused0 ORDER BY rrf DESC, doc_id LIMIT $FusedK),
     av AS (
       SELECT e.v AS qv, sqrt(list_dot_product(e.v, e.v)) AS qn
       FROM emb e JOIN lex ON e.vec_id = lex.doc_id
       WHERE lex.lex_rank = 1),
     gsc AS (
       SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.v, av.qv)
           / (sqrt(list_dot_product(e.v, e.v)) * av.qn), 6) AS r6
       FROM emb e CROSS JOIN av),
     grades AS (
       SELECT doc_id, CAST(11 - grank AS DOUBLE) AS grade FROM (
         SELECT doc_id, row_number() OVER (ORDER BY r6 DESC, doc_id) AS grank
         FROM gsc ORDER BY r6 DESC, doc_id LIMIT $FusedK)),
     legs AS (
       SELECT 'lex' AS leg, doc_id, lex_rank AS rnk FROM lex
         WHERE lex_rank <= $FusedK
       UNION ALL
       SELECT 'vec' AS leg, doc_id, vec_rank AS rnk FROM vec
         WHERE vec_rank <= $FusedK
       UNION ALL
       SELECT 'fused' AS leg, doc_id, fused_rank AS rnk FROM fused)
     SELECT l.leg,
       round(sum((pow(2.0, coalesce(g.grade, 0.0)) - 1.0)
         / (ln(l.rnk + 1.0) / ln(2.0))) / $idcg, 6) AS ndcg
     FROM legs l LEFT JOIN grades g USING (doc_id)
     GROUP BY l.leg ORDER BY l.leg"""
  }

  /** DuckDB replay of [[hybridRrfIvf]]: the leg CTEs (BM25 ranks + PRF
    * vector), then the IVF codebook as a VALUES literal — cell
    * assignment (sequential (v−c)² sum, ties to lowest cell), the qv's
    * nprobe nearest cells, cosine over candidates in probed cells, and
    * the identical RRF fusion. */
  private def hybridIvfOracle(cents: Array[Array[Double]]): String = {
    val vals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    val np = Similarity.IvfNProbe
    s"""WITH $legCtes,
     cells(cell, c) AS (VALUES $vals),
     dist AS (
       SELECT e.vec_id, e.v, cl.cell,
         list_sum(list_transform(generate_series(1, len(cl.c)),
           i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
       FROM emb e CROSS JOIN cells cl),
     rk AS (
       SELECT vec_id, v, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
       FROM dist),
     assigned AS (
       SELECT r.vec_id, r.v, sqrt(list_dot_product(r.v, r.v)) AS n, r.cell
       FROM rk r WHERE r.rk = 1),
     qcells AS (
       SELECT cl.cell
       FROM cells cl CROSS JOIN qv
       ORDER BY list_sum(list_transform(generate_series(1, len(cl.c)),
         i -> (qv.qv[i] - cl.c[i]) * (qv.qv[i] - cl.c[i]))), cl.cell
       LIMIT $np),
     vsc2 AS (
       SELECT e.vec_id AS doc_id,
         round(list_dot_product(e.v, qv.qv)
           / (e.n * sqrt(list_dot_product(qv.qv, qv.qv))), 6) AS r6
       FROM assigned e JOIN qcells USING (cell) CROSS JOIN qv),
     vec2 AS (
       SELECT doc_id, row_number() OVER (ORDER BY r6 DESC, doc_id) AS vec_rank
       FROM vsc2 ORDER BY r6 DESC, doc_id LIMIT $LegK),
     fused AS (
       SELECT coalesce(lex.doc_id, vec2.doc_id) AS doc_id,
         lex.lex_rank, vec2.vec_rank,
         round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0.0)
             + coalesce(1.0 / ($RrfK + vec2.vec_rank), 0.0), 6) AS rrf
       FROM lex FULL OUTER JOIN vec2 ON lex.doc_id = vec2.doc_id)
     SELECT doc_id, lex_rank, vec_rank, rrf FROM fused
     ORDER BY rrf DESC, doc_id LIMIT $FusedK"""
  }

  /** DuckDB replay of [[hybridRrfBatch]]: the query batch as a VALUES
    * literal, the union-term BM25 leg, per-query PRF vectors, the IVF
    * codebook (interpolated per the convention) with per-query probed
    * cells, and the (query_id, doc_id)-keyed fusion — every leg CTE is
    * the single-query oracle's generalized with a query_id column. */
  private def batchOracle(cents: Array[Array[Double]]): String = {
    val qvals = BatchQueries
      .flatMap { case (q, ts) => ts.map(t => s"($q, '$t')") }
      .mkString(", ")
    val termList = BatchQueries.flatMap(_._2).distinct
      .map(t => s"'$t'").mkString(", ")
    val cvals = cents.zipWithIndex
      .map { case (c, i) => s"($i, ${c.mkString("[", ",", "]")})" }
      .mkString(",\n")
    val np = Similarity.IvfNProbe
    s"""WITH queries AS (
       SELECT CAST(q AS BIGINT) AS query_id, t AS term
       FROM (VALUES $qvals) v(q, t)),
     d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     dl AS (SELECT doc_id, len(toks) AS dl FROM d),
     stats AS (SELECT round(avg(dl), 6) AS avgdl, count(*) AS n FROM dl),
     tf AS (
       SELECT doc_id, tok AS term, count(*) AS tf
       FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
       WHERE tok IN ($termList) GROUP BY 1, 2),
     dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
     idf AS (
       SELECT term,
         round(ln((stats.n - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
       FROM dfq CROSS JOIN stats),
     sc AS (
       SELECT q.query_id, tf.doc_id,
         round(sum(idf.idf * tf.tf * 2.2 / (tf.tf
           + round(1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl), 6))), 4) AS r4
       FROM tf JOIN queries q USING (term) JOIN idf USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats
       GROUP BY 1, 2),
     lex AS (
       SELECT query_id, doc_id, lex_rank FROM (
         SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY r4 DESC, doc_id) AS lex_rank
         FROM sc) WHERE lex_rank <= $LegK),
     emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     qvx AS (
       SELECT lex.query_id, generate_subscripts(e.v, 1) AS pos,
         unnest(e.v) AS x
       FROM emb e JOIN lex ON e.vec_id = lex.doc_id
       WHERE lex.lex_rank <= 3),
     qv AS (
       SELECT query_id, list(m ORDER BY pos) AS qv FROM (
         SELECT query_id, pos, round(avg(x), 6) AS m FROM qvx
         GROUP BY 1, 2)
       GROUP BY query_id),
     cells(cell, c) AS (VALUES $cvals),
     dist AS (
       SELECT e.vec_id, e.v, cl.cell,
         list_sum(list_transform(generate_series(1, len(cl.c)),
           i -> (e.v[i] - cl.c[i]) * (e.v[i] - cl.c[i]))) AS d2
       FROM emb e CROSS JOIN cells cl),
     rk AS (
       SELECT vec_id, v, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
       FROM dist),
     assigned AS (
       SELECT r.vec_id, r.v, sqrt(list_dot_product(r.v, r.v)) AS n, r.cell
       FROM rk r WHERE r.rk = 1),
     qcells AS (
       SELECT query_id, cell FROM (
         SELECT qv.query_id, cl.cell,
           row_number() OVER (PARTITION BY qv.query_id
             ORDER BY list_sum(list_transform(generate_series(1, len(cl.c)),
               i -> (qv.qv[i] - cl.c[i]) * (qv.qv[i] - cl.c[i]))), cl.cell)
             AS crk
         FROM cells cl CROSS JOIN qv) WHERE crk <= $np),
     vsc AS (
       SELECT qv.query_id, e.vec_id AS doc_id,
         round(list_dot_product(e.v, qv.qv)
           / (e.n * sqrt(list_dot_product(qv.qv, qv.qv))), 6) AS r6
       FROM assigned e
       JOIN qcells qc ON e.cell = qc.cell
       JOIN qv ON qv.query_id = qc.query_id),
     vec AS (
       SELECT query_id, doc_id, vec_rank FROM (
         SELECT query_id, doc_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY r6 DESC, doc_id) AS vec_rank
         FROM vsc) WHERE vec_rank <= $LegK),
     fused AS (
       SELECT coalesce(lex.query_id, vec.query_id) AS query_id,
         coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         lex.lex_rank, vec.vec_rank,
         round(coalesce(1.0 / ($RrfK + lex.lex_rank), 0.0)
             + coalesce(1.0 / ($RrfK + vec.vec_rank), 0.0), 6) AS rrf
       FROM lex FULL OUTER JOIN vec
         ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
     SELECT query_id, doc_id, lex_rank, vec_rank, rrf, fused_rank FROM (
       SELECT query_id, doc_id, lex_rank, vec_rank, rrf,
         row_number() OVER (PARTITION BY query_id
           ORDER BY rrf DESC, doc_id) AS fused_rank
       FROM fused) WHERE fused_rank <= $FusedK
     ORDER BY query_id, fused_rank"""
  }

  def oracles: Map[String, String] = oraclesFor(None)

  /** Oracles with the dataset dir being dumped threaded through (the
    * [[Similarity.oraclesFor]] convention) so the IVF-leg codebook is
    * THAT dir's, not whichever dir last ran. */
  def oraclesFor(dumpDir: Option[String]): Map[String, String] = Map(
    "hybrid_rrf" -> hybridOracle,
    "retrieval_mmr" -> mmrOracle,
    "retrieval_ndcg" -> ndcgOracle) ++
    // IVF-leg hybrid: codebook interpolated when the query has run
    // (the IVF-codebook convention — omitted otherwise, rows-only)
    Similarity.codebookFor("hybrid_rrf_ivf", dumpDir)
      .map(c => "hybrid_rrf_ivf" -> hybridIvfOracle(c)).toMap ++
    Similarity.codebookFor("hybrid_rrf_batch", dumpDir)
      .map(c => "hybrid_rrf_batch" -> batchOracle(c)).toMap
}
