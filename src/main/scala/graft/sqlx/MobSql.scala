package graft.sqlx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, floor, greatest, least, lit, max, min, shiftleft, shiftright}

/** Executable SQL entry point: the reference dialect, including the one
  * DDL statement the reference registers that plain rewriting cannot
  * express — `CREATE INDEX <name> ON <table> USING TRTREE(<boxcol>)`
  * (ref src/index/rtree_module.cpp:432-441).
  *
  * Spark has no rowid-fetch index; the semantic equivalent of the MEOS
  * R-tree is a WRITE-TIME LAYOUT: the table is materialized
  * range-clustered on the box column's leading (x, t) coordinates, so
  * parquet row-group min/max statistics on the flattened box fields
  * become tight, and the natural `boxcol && const` predicates — which
  * [[graft.plans.BoxPredicateRule]] rewrites into sargable min/max
  * conjuncts — prune at the scan exactly where the reference's optimizer
  * swaps in an R-tree index scan (ref rtree_optimize_scan.cpp:20-147).
  * The view name is re-bound to the clustered layout, so subsequent
  * queries through it accelerate with no further rewriting.
  */
object MobSql {

  private val buildSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private val createIndexRe =
    """(?is)^\s*CREATE\s+INDEX\s+(\w+)\s+ON\s+(\w+)\s+USING\s+TRTREE\s*\(\s*(\w+)\s*\)\s*(ZORDER|HILBERT)?\s*;?\s*$""".r

  private val describeRe =
    """(?is)^\s*DESCRIBE\s+TRTREE\s+(\w+)\s*;?\s*$""".r

  /** Layout bookkeeping for the maintenance surface: the clustered dir
    * plus any un-clustered append tails currently read alongside it
    * (the immutable-files answer to the reference R-tree's
    * Insert/Append, rtree_module.cpp:106-261). `curve` records which
    * cluster key the layout was built with ("range", "zorder" or
    * "hilbert") so compaction re-applies the same one. */
  private final case class LayoutState(boxCol: String, layoutDir: String,
                                       tailDirs: List[String],
                                       curve: String) // "range"|"zorder"|"hilbert"
  private val layouts =
    new java.util.concurrent.ConcurrentHashMap[String, LayoutState]()

  /** Run one statement of the reference dialect. */
  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case createIndexRe(idxName, table, boxCol, curve) =>
      createTrtreeLayout(spark, idxName, table, boxCol,
        if (curve == null) "range" else curve.toLowerCase)
      spark.emptyDataFrame // DDL yields no rows, like the reference
    case describeRe(table) =>
      describeLayout(spark, table)
    case other =>
      spark.sql(SqlRewriter.rewrite(other))
  }

  /** `DESCRIBE TRTREE <table>` — the observability surface the
    * reference drafted and left disabled (`pragma_rtree_index_info` /
    * `rtree_vacuum_index`, ref src/index/rtree_pragmas.cpp:214-220,
    * registration commented out in HEAD): one row per (part, file,
    * clustering coordinate) of the bound layout, with the file's row
    * count and the coordinate's [lo, hi] extent — the write-time twin
    * of the R-tree pragma's per-page bounding boxes. `part` is the
    * clustered layout or an un-compacted append tail; `curve` records
    * the cluster key kind (range | zorder | hilbert). The extents are
    * computed with a column-pruned scan of ONLY the box-min coordinates
    * grouped by `input_file_name()` (KBs per file at any table size —
    * footer-statistics-shaped work, one task per file), so describing a
    * 100 TB layout costs a metadata-sized scan, not a table read. */
  def describeLayout(spark: SparkSession, table: String): DataFrame = {
    import org.apache.spark.sql.functions.{array, count, explode, expr,
      input_file_name, max => smax, regexp_extract, struct}
    val st = layouts.get(table)
    require(st != null, s"$table has no TRTREE layout to describe")
    val boxSt = spark.read.parquet(st.layoutDir).schema(st.boxCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val coords = Seq("xmin", "ymin", "zmin", "tmin", "lower")
      .filter(boxSt.fieldNames.contains)
    def part(role: String, dir: String): DataFrame = {
      val base = spark.read.parquet(dir).select(
        coords.map(c => col(s"${st.boxCol}.$c").cast("double").as(c)) :+
          input_file_name().as("file"): _*)
      val aggs = count(lit(1)).as("n_rows") +:
        coords.flatMap(c => Seq(min(col(c)).as(s"lo_$c"),
          smax(col(c)).as(s"hi_$c")))
      base.groupBy("file").agg(aggs.head, aggs.tail: _*)
        .select(col("file"), col("n_rows"),
          explode(array(coords.map(c => struct(lit(c).as("coord"),
            col(s"lo_$c").as("lo"), col(s"hi_$c").as("hi"))): _*)).as("e"))
        .select(lit(role).as("part"), lit(st.curve).as("curve"),
          regexp_extract(col("file"), "([^/]+)$", 1).as("file"),
          col("n_rows"), col("e.coord").as("coord"),
          col("e.lo").as("lo"), col("e.hi").as("hi"))
    }
    (part("layout", st.layoutDir) +:
      st.tailDirs.zipWithIndex.map { case (t, i) => part(s"tail-$i", t) })
      .reduce(_ unionByName _)
      .orderBy("part", "file", "coord")
  }

  /** Leading cluster keys: spatial min if the box has one, then time. */
  private def clusterKeys(df: DataFrame, boxCol: String) = {
    val st = df.schema(boxCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val keys = Seq("xmin", "tmin", "lower")
      .filter(st.fieldNames.contains)
      .map(f => col(s"$boxCol.$f"))
    require(keys.nonEmpty, s"$boxCol has no box/span min fields to cluster on")
    keys
  }

  /** Space-filling-curve cluster key (`USING TRTREE(box) ZORDER` or
    * `... HILBERT`): quantize up to three box-min coordinates against
    * their global ranges and fold them into one curve key, so a file's
    * min/max statistics bound a HYPER-RECTANGLE rather than an interval
    * of the leading coordinate. A 1-D range key degrades on off-axis
    * predicates — a box tight in y but wide in x prunes nothing when
    * the layout leads with x — which is exactly the 2-D locality the
    * reference's R-tree pages give it (ref src/index/rtree_module.cpp:49).
    * ZORDER interleaves the quantized bits; HILBERT runs the
    * [[graft.functions.HilbertCurve]] kernel, whose face-adjacent steps
    * avoid the Z-curve's diagonal jumps (tighter blobs per key range at
    * high skew — PlanSpec pins ≤ Z-order post-pruning rows on the
    * off-axis query). The per-dim bounds come from one tiny write-time
    * aggregate; degenerate dims (constant coordinate) quantize to 0 and
    * drop out of the curve. */
  private def curveKey(df: DataFrame, boxCol: String, curve: String)
      : org.apache.spark.sql.Column = {
    val st = df.schema(boxCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val dims = Seq("xmin", "ymin", "zmin", "tmin", "lower")
      .filter(st.fieldNames.contains).take(3)
    require(dims.nonEmpty, s"$boxCol has no box/span min fields to curve on")
    val aggExprs = dims.flatMap(f => Seq(
      min(col(s"$boxCol.$f").cast("double")),
      max(col(s"$boxCol.$f").cast("double"))))
    val bounds = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    // empty table: min/max are null — any constant key is a correct
    // layout for zero rows (matches the range path's no-op)
    if (bounds.isNullAt(0)) return lit(0L)
    val lo = Array.tabulate(dims.length)(i => bounds.getDouble(2 * i))
    val hi = Array.tabulate(dims.length)(i => bounds.getDouble(2 * i + 1))
    // 21 bits/dim at 3 dims; capped below 63 so `1L << bits` stays
    // positive when a box type exposes a single min field (63/1 would
    // be Long.MinValue and clamp every key to 0 — silently unclustered)
    val bits = math.min(63 / dims.length, 21)
    val maxQ = (1L << bits) - 1
    val quantized = dims.zipWithIndex.map { case (f, di) =>
      val range = if (hi(di) > lo(di)) hi(di) - lo(di) else 1.0
      least(lit(maxQ), greatest(lit(0L),
        floor((col(s"$boxCol.$f").cast("double") - lit(lo(di)))
          / lit(range) * lit((1L << bits).toDouble)).cast("long")))
    }
    if (curve == "hilbert") {
      // Hilbert key: face-adjacent curve steps — a contiguous key range
      // is a tighter spatial blob than the Z-curve's (which jumps
      // diagonally at every power-of-two boundary); the native
      // [[graft.functions.HilbertCurve]] kernel does Skilling's
      // transform per row
      org.apache.spark.sql.functions.call_function("hilbert_key",
        org.apache.spark.sql.functions.array(quantized: _*),
        lit(bits))
    } else {
      var z: org.apache.spark.sql.Column = lit(0L)
      for (bit <- 0 until bits; (q, di) <- quantized.zipWithIndex)
        z = z.bitwiseOR(shiftleft(
          shiftright(q, bit).bitwiseAND(lit(1L)),
          bit * dims.length + di))
      z
    }
  }

  /** Write `df` clustered for pruning: range keys or a curve key.
    *
    * Range bounds must be a deterministic function of the DATA:
    * `repartitionByRange`'s RangePartitioner seeds its reservoir sample
    * from `rdd.id` — a session-history artifact — so two builds of the
    * SAME table could otherwise land rows in different files and prune
    * differently (observed: the Hilbert-vs-Z-order scan-row comparison
    * flipping with which tests ran earlier in the JVM). Scoping the
    * sample size to 1M rows/partition makes the reservoir keep EVERY
    * row at any build this side of ~32M rows per input partition —
    * exact quantile bounds, no randomness left. An index build is the
    * one place that sample cost is right: it is a one-time write-path
    * job, and a 100 TB build would cap input partitions well below the
    * ~16 MB/partition driver sketch this implies. */
  private def clusterWrite(spark: SparkSession, df: DataFrame,
                           boxCol: String, curve: String,
                           dir: String): Unit = {
    // the 1M sample size is scoped to an ISOLATED session clone
    // (fresh SQLConf, shared SparkContext + cache) rather than
    // set/finally-restored on the caller's conf: a concurrent query on
    // the shared session (parallel suites) would silently inherit the
    // temporary value, and two interleaved clusterWrites could leak it
    // permanently by capturing each other's "prev" (r12 advice). The
    // analyzed plan is re-bound because temp views are session-scoped.
    val writer = spark.newSession()
    // clones start from the SparkContext conf, NOT the parent's runtime
    // conf — copy the parent's settable SQL conf wholesale so the
    // layout write behaves like every other write in the caller's
    // session (codec, timezone, partition count, ...), then override
    // only the write-path knobs below. Non-settable/static entries are
    // skipped (they are identical across sessions by construction).
    spark.conf.getAll.foreach { case (k, v) =>
      try writer.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    writer.conf.set(
      "spark.sql.execution.rangeExchange.sampleSizePerPartition",
      (1 << 20).toString)
    // AQE must not coalesce the range exchange: a numPartitions-less
    // repartitionByRange is coalescing-eligible, and tiny builds would
    // collapse to ONE file — one min/max envelope, zero row-group
    // pruning. The layout's file count is part of its determinism
    // contract, so pin it here rather than inherit the caller's AQE.
    writer.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    val dfw = org.apache.spark.sql.graft.ColumnBridge.ofRows(
      writer, df.queryExecution.analyzed)
    if (curve == "zorder" || curve == "hilbert") {
      graft.functions.GraftFunctions.register(writer)
      dfw.withColumn("__ckey", curveKey(dfw, boxCol, curve))
        .repartitionByRange(col("__ckey"))
        .sortWithinPartitions("__ckey")
        .drop("__ckey")
        .write.mode("overwrite").parquet(dir)
    } else {
      val keys = clusterKeys(dfw, boxCol)
      dfw.repartitionByRange(keys: _*)
        .sortWithinPartitions(keys: _*)
        .write.mode("overwrite").parquet(dir)
    }
  }

  /** Re-bind the table view to the layout plus its append tails. */
  private def bind(spark: SparkSession, table: String,
                   st: LayoutState): Unit = {
    val full = st.tailDirs.foldLeft(spark.read.parquet(st.layoutDir)) {
      (d, t) => d.unionByName(spark.read.parquet(t))
    }
    full.createOrReplaceTempView(table)
  }

  private def createTrtreeLayout(spark: SparkSession, idxName: String,
                                 table: String, boxCol: String,
                                 curve: String): Unit = {
    val df = spark.table(table)
    // fresh path per build: a re-issued CREATE INDEX would otherwise read
    // and overwrite the same parquet dir the view is bound to, which
    // Spark rejects ("Cannot overwrite a path that is also being read
    // from") — monotone suffix makes the statement idempotent
    val dir = new java.io.File(
      s"target/trtree_${table}_${idxName}_${buildSeq.incrementAndGet()}")
      .getAbsolutePath
    clusterWrite(spark, df, boxCol, curve, dir)
    val st = LayoutState(boxCol, dir, Nil, curve)
    layouts.put(table, st)
    bind(spark, table, st)
  }

  /** Index maintenance, append half: new rows land in an UN-CLUSTERED
    * tail dir and the view becomes layout UNION ALL tails — writes stay
    * O(batch), readers see the rows immediately, and pruning on the
    * clustered part is untouched (the tails scan unpruned until the
    * next [[compactLayout]]). This is the documented SURVEY §8f.9
    * story for the reference's R-tree Insert/Append. */
  def appendToLayout(spark: SparkSession, table: String,
                     rows: DataFrame): Unit = {
    val st = layouts.get(table)
    require(st != null, s"$table has no TRTREE layout to append to")
    val dir = new java.io.File(
      s"target/trtree_${table}_tail_${buildSeq.incrementAndGet()}")
      .getAbsolutePath
    rows.write.mode("overwrite").parquet(dir)
    val st2 = st.copy(tailDirs = st.tailDirs :+ dir)
    layouts.put(table, st2)
    bind(spark, table, st2)
  }

  /** Index maintenance, re-layout half: merge the append tails back
    * into ONE range-clustered layout (fresh dir, same cluster keys) and
    * re-bind the view — after this every row is behind tight row-group
    * min/max statistics again. Row-preserving by construction (one
    * repartitionByRange over the union); idempotent (compacting a
    * compacted table just rewrites it). The 100 TB cadence is the
    * standard LSM-ish one: appends amortize O(batch), one re-layout
    * pass per maintenance window pays O(table) — exactly what the
    * reference's BulkConstruct does on its side of the
    * immutable/mutable divide. */
  def compactLayout(spark: SparkSession, table: String): Unit = {
    val st = layouts.get(table)
    require(st != null, s"$table has no TRTREE layout to compact")
    val df = spark.table(table) // layout ∪ tails, as currently bound
    val dir = new java.io.File(
      s"target/trtree_${table}_compact_${buildSeq.incrementAndGet()}")
      .getAbsolutePath
    clusterWrite(spark, df, st.boxCol, st.curve, dir)
    val st2 = LayoutState(st.boxCol, dir, Nil, st.curve)
    layouts.put(table, st2)
    bind(spark, table, st2)
  }
}
