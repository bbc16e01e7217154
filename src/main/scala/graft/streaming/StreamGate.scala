package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.util.Tables

/** Streaming surface wired into the OFFICIAL correctness gate.
  *
  * The other streaming specs run against MemoryStream inside ScalaTest;
  * this one runs a real bounded file-source stream end-to-end — file
  * source → online LSH near-dup ([[StreamNearDup]]) → idempotent
  * per-batch parquet sink ([[StreamSink]]) — and returns the final
  * sunk table verified with exact Jaccard, which makes it DuckDB-
  * oracle-checkable against the SAME SQL as the batch operator
  * (`dedup_minhash_lsh`).
  *
  * Why the outputs must agree: the stream's map side is hash-identical
  * to batch (same shingles, same `minhash_sig` kernel, same band key).
  * Per (band, bucket): a bucket with <= 64 members emits exactly the
  * all-pairs set regardless of arrival order or batch splits; an
  * over-full bucket emits a superset of batch (batch drops the bucket
  * entirely, the stream pairs the first 64 arrivals). So streaming
  * candidates ⊇ batch candidates, and after the exact-Jaccard >= 0.5
  * verification both equal the exact-join oracle whenever batch recall
  * is 1.0 — which the batch oracle already asserts on the gate data.
  */
object StreamGate {

  /** Per-batch (batchId, triggerExecution ms) of the LAST
    * [[streamNearDupSink]] run — surfaced into target/bench.json so a
    * wall-clock drift on that row decomposes into its micro-batches. */
  @volatile var lastNearDupBatchesMs: Seq[(Long, Long)] = Nil

  /** Per-batch STATE-STORE metrics of the last [[streamNearDupSink]]
    * run, one compact JSON object per micro-batch (batch id, provider,
    * total state rows, state memory bytes, rows updated) — the evidence
    * the bench artifact records for the bounded-state claim: at 100 TB
    * continuous ingest the state store is the component that must not
    * grow with the stream, and these numbers are what a deployment
    * alerts on. */
  @volatile var lastNearDupStateJson: String = "[]"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  /** The RocksDB state store — Spark's production provider for large
    * continuous state (bounded heap: state lives off-heap in RocksDB
    * memtables/SSTs; incremental checkpoints ship only changed files).
    * The OSS class name, resolved from the Spark jars on the classpath. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Provider the gate streams run on. Default ROCKSDB — the choice a
    * 100 TB continuous-ingest deployment makes (the default in-heap
    * HDFSBackedStateStoreProvider holds every key's state as JVM
    * objects, so executor heap bounds total state; RocksDB bounds heap
    * regardless of state size and checkpoints incrementally).
    * `GRAFT_STATE_STORE=hdfs` selects the in-heap default instead; the
    * entries are output-deterministic by design, so the provider can
    * never change rows — StreamingSpec runs one stateful entry under
    * BOTH providers and asserts identical output. */
  def stateStoreProvider: Option[String] =
    providerOverride.getOrElse(
      sys.env.getOrElse("GRAFT_STATE_STORE", "rocksdb")) match {
      case "hdfs"    => None // Spark's default in-heap provider
      case "rocksdb" => Some(RocksDbProvider)
      case other     => Some(other) // explicit provider class
    }

  /** Test seam: StreamingSpec's provider-toggle test runs one gate
    * entry under BOTH providers in one JVM (env vars can't flip
    * per-test). Overrides GRAFT_STATE_STORE when set. */
  @volatile private[graft] var providerOverride: Option[String] = None

  /** Best-effort removal of a gate entry's temp root (staging +
    * checkpoint + sink) once its result is materialized — the dirs are
    * per-invocation and would otherwise accumulate under /tmp. */
  private def deleteRecursively(root: String): Unit = try {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val p = Paths.get(root)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => Files.deleteIfExists(f))
  } catch {
    // Files.walk wraps mid-iteration I/O errors (e.g. a Spark shutdown
    // thread concurrently removing a checkpoint temp file) in
    // UncheckedIOException — a RuntimeException; cleanup must never
    // fail a gate entry whose result is already materialized
    case _: java.io.IOException | _: java.io.UncheckedIOException => ()
  }

  /** Run `body` (which starts and awaits a streaming query) with the
    * session's state-store provider set per [[stateStoreProvider]],
    * restoring the previous conf after. The provider is bound to a
    * checkpoint at FIRST query start; every gate entry uses a fresh
    * checkpoint dir, so setting it per run is exact. */
  private def withStateProvider[T](s: SparkSession)(body: => T): T =
    stateStoreProvider match {
      case None => body
      case Some(cls) =>
        val prev = s.conf.getOption(ProviderKey)
        s.conf.set(ProviderKey, cls)
        try body
        finally prev match {
          case Some(v) => s.conf.set(ProviderKey, v)
          case None    => s.conf.unset(ProviderKey)
        }
    }

  /** `stream_neardup_sink` gate entry: documents(d) replayed as a
    * 4-file stream (maxFilesPerTrigger=1 → 4 real micro-batches of
    * state accumulation), near-dup pairs sunk idempotently, the sunk
    * union re-read and exact-verified. Output schema/ordering matches
    * `dedup_minhash_lsh` exactly. */
  def streamNearDupSink(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_gate_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    // Constant event time: no row can be late at ANY batch split, so
    // the watermark never filters input and the pair set is the
    // arrival-order-invariant one argued in the scaladoc.
    Tables.documents(s, d)
      .select(col("doc_id"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"),
        col("text"))
      .repartitionByRange(4, col("doc_id"))
      .write.mode("overwrite").parquet(staging)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("ts", TimestampType),
      StructField("text", StringType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
    val pairs = StreamNearDup.nearDupPairs(s, stream)
    // see StreamNearDup.nearDupPairs scaladoc: the conservative global-
    // watermark check flags any stateful op below flatMapGroupsWithState;
    // this pipeline provably emits nothing older than the watermark
    val ccKey =
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    val prev = s.conf.getOption(ccKey)
    s.conf.set(ccKey, "false")
    // The stateful shuffle partition count is fixed at the query's FIRST
    // start and becomes the state-store count: every micro-batch commits
    // one delta file per state partition per stateful op, so 32
    // partitions x 4 batches is 4x the checkpoint I/O of 8 — and on this
    // box that I/O, not compute, dominated the r7 wall clock (11 s for a
    // 500-doc stream). 8 partitions is still full parallelism for the
    // gate's bounded stream; a 100 TB deployment sizes this to its
    // cluster the same way (state scale-out is a partition-count choice
    // at query start, not a code change). Output is partition-invariant.
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = s.conf.get(spKey)
    s.conf.set(spKey, math.min(prevSp.toInt, 8).toString)
    try {
      val q = withStateProvider(s) {
        val q0 = StreamSink.parquetSink(pairs, out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
        q0.awaitTermination()
        q0
      }
      // per-batch trigger durations for the bench artifact: the r7->r6
      // drift on this row was unattributable without them
      lastNearDupBatchesMs = q.recentProgress.toSeq.map { p =>
        (p.batchId, Option(p.durationMs.get("triggerExecution"))
          .map(_.longValue).getOrElse(-1L))
      }
      // per-batch state-store metrics (bench artifact): provider, total
      // state rows, state memory — the bounded-state evidence
      val provider = stateStoreProvider.map(_.split('.').last)
        .getOrElse("HDFSBackedStateStoreProvider")
      lastNearDupStateJson = q.recentProgress.toSeq.map { p =>
        val ops = p.stateOperators.toSeq
        val rows = ops.map(_.numRowsTotal).sum
        val mem = ops.map(_.memoryUsedBytes).sum
        val upd = ops.map(_.numRowsUpdated).sum
        // a RocksDB-only custom metric: present (>= 0) iff the RocksDB
        // provider actually ran the batch — the echo of the conf alone
        // can't prove engagement (StreamingSpec's toggle test reads this)
        val sst = ops.flatMap(o =>
          Option(o.customMetrics.get("rocksdbSstFileSize")).map(_.longValue))
        val sstPart =
          if (sst.isEmpty) "-1" else sst.sum.toString
        s"""{"batch":${p.batchId},"provider":"$provider",""" +
          s""""state_rows":$rows,"state_mem_bytes":$mem,""" +
          s""""rows_updated":$upd,"rocksdb_sst_bytes":$sstPart}"""
      }.mkString("[", ",", "]")
    } finally {
      s.conf.set(spKey, prevSp)
      prev match {
        case Some(v) => s.conf.set(ccKey, v)
        case None    => s.conf.unset(ccKey)
      }
    }
    // union of committed batch=<id> dirs (explicit schema: an all-empty
    // run still reads; temp dirs live until the JVM's /tmp is reaped)
    val sunk = s.read
      .schema(StructType(Seq(
        StructField("id_a", LongType), StructField("id_b", LongType),
        StructField("ts", TimestampType))))
      .parquet(s"$out/batch=*")
    // identical verification tail to the batch operator: exact shingle
    // Jaccard >= 0.5 on the candidate pairs, same aliases and ordering
    val docSh = graft.operators.Dedup.shingleHashes(s, d)
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("shs"))
    val res = sunk.select("id_a", "id_b").distinct()
      .join(docSh.select(col("doc_id").as("id_a"), col("shs").as("sha")),
        "id_a")
      .join(docSh.select(col("doc_id").as("id_b"), col("shs").as("shb")),
        "id_b")
      .withColumn("i", call_function("vec_inter_sorted",
        col("sha"), col("shb")))
      .withColumn("j",
        col("i") / (size(col("sha")) + size(col("shb")) - col("i")))
      .filter(col("j") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("j"), 4).as("jac"))
      .orderBy("id_a", "id_b")
      // materialize (bounded: candidate pairs) so the per-invocation
      // temp root can be removed — the r13 cleanup, applied to every
      // sink (this one previously leaked staging + checkpoint + sink)
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  /** `stream_sessions_sink` gate entry: the events table replayed as a
    * bounded stream through the stateful sessionizer and the idempotent
    * sink, then aggregated to the batch `mob_q4_sessions` shape (same
    * oracle SQL).
    *
    * Determinism: all files land in ONE data batch (FileStreamSource
    * does not order batches by event time, so splitting could process
    * the sentinel first and mark everything late). The state function
    * sorts each user's history; sessions closed by a later event emit
    * inline, and each user's LAST session is flushed by the event-time
    * timeout that the sentinel-advanced watermark fires in the trailing
    * no-data batch AvailableNow runs — so the stateful timeout path is
    * still what produces the final sessions. */
  def streamSessionsSink(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_sess_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
      col("value"))
    val Array(minTs, maxTs) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val spanSec = (maxTs - minTs) / 1000000L + 1
    val horizon = s"${spanSec + 3600} seconds"
    // sentinel: far enough that watermark = sentinel - horizon clears
    // every last-event + gap close; user -1 never closes and is dropped
    val sentinelTs = maxTs + (spanSec + 7200 + 1800) * 1000000L
    ev.unionByName(s.range(1).select(lit(-1L).as("user_id"),
        timestamp_micros(lit(sentinelTs)).as("ts"), lit(0.0).as("value")))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(staging)
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("value", org.apache.spark.sql.types.DoubleType))))
      .parquet(staging)
    val sessions = StreamSessions.sessionize(s, stream, horizon)
    withStateProvider(s) {
      StreamSink.parquetSink(sessions, out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    val res = s.read
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("start", TimestampType), StructField("end", TimestampType),
        StructField("n_events", org.apache.spark.sql.types.IntegerType),
        StructField("total_value", org.apache.spark.sql.types.DoubleType))))
      .parquet(s"$out/batch=*")
      .filter(col("user_id") >= 0)
      .groupBy("user_id")
      .agg(count(lit(1)).as("num_sessions"),
        round((sum(unix_micros(col("end")) - unix_micros(col("start"))) /
          1000000.0), 6).as("total_s"))
      .orderBy("user_id")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  /** `stream_hll_sink` gate entry: the events table replayed as a
    * bounded stream; per-day HyperLogLog REGISTERS accumulate in a
    * watermarked windowed aggregate (the same p=10 / md5-parity
    * register math as the batch `sketch_hll`), stream through the
    * idempotent sink as finalized windows, and the estimate is computed
    * on read — the streaming-sketch layout a 100 TB pipeline runs
    * ("distinct users per day, continuously"): register state is
    * bounded (<= 1024 rows per open window), merges by max, and the
    * sunk table is replayable.
    *
    * Determinism (same argument as the sessions entry): one data batch,
    * then a far-future sentinel advances the watermark in AvailableNow's
    * trailing batch so every real window finalizes; the sentinel's own
    * window stays below the watermark and never emits. Registers are
    * arrival-order-invariant (max), so the sunk table equals the batch
    * register table and the DuckDB oracle replays the whole pipeline
    * from the raw parquet. */
  def streamHllSink(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_hll_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
    val maxTs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    // sentinel 3 days past the last event: watermark reaches
    // sentinel - 1s in the trailing batch, past every real day window
    val sentinelTs = maxTs + 3L * 86400L * 1000000L
    ev.unionByName(s.range(1).select(lit(-1L).as("user_id"),
        timestamp_micros(lit(sentinelTs)).as("ts")))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(staging)
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType))))
      .parquet(staging)
    val regs = stream
      .withWatermark("ts", "1 second")
      .withColumn("hx", md5(col("user_id").cast("string")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .withColumn("bucket", graft.operators.Hll.bucket(col("h")))
      .withColumn("rho", graft.operators.Hll.rho(col("h")))
      .groupBy(window(col("ts"), "1 day").as("win"), col("bucket"))
      .agg(max("rho").as("reg"))
      .select(col("win.start").as("day"), col("bucket"), col("reg"))
    withStateProvider(s) {
      StreamSink.parquetSink(regs, out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    val sunk = s.read
      .schema(StructType(Seq(
        StructField("day", TimestampType), StructField("bucket", LongType),
        StructField("reg", org.apache.spark.sql.types.IntegerType))))
      .parquet(s"$out/batch=*")
      // defensive re-merge: append emits each finalized (day, bucket)
      // once, but replayed batch dirs must stay idempotent
      .groupBy("day", "bucket").agg(max("reg").as("reg"))
    val Hll = graft.operators.Hll
    val state = sunk.groupBy("day")
      .agg(count(lit(1)).as("n_nonempty"),
        sum(expr(Hll.RegTermSql)).as("s_ne"))
      .select(col("day"), (lit(Hll.M) - col("n_nonempty")).cast("long")
        .as("v_empty"), col("s_ne"))
    val exact = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("exact_distinct"))
    val res = state.join(exact, "day")
      .withColumn("hll_estimate",
        Hll.estimate(col("v_empty"),
          Hll.sScaled(col("v_empty"), col("s_ne"))))
      .select(col("day"), col("v_empty"), col("exact_distinct"),
        col("hll_estimate"),
        round(lit(100.0) * (col("hll_estimate") - col("exact_distinct"))
          / col("exact_distinct"), 2).as("rel_err_pct"))
      .orderBy("day")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  /** `stream_countmin_sink` gate entry: per-day COUNT-MIN counters over
    * user activity accumulating in a watermarked windowed aggregate —
    * the same 4 x 1024 position carve as the batch `sketch_countmin` —
    * finalized through the idempotent sink; the probe estimates each
    * day's top-5 users' event counts against exact. The streaming
    * heavy-hitter layout a 100 TB pipeline runs continuously
    * ("who dominates today's traffic?"): counter state is bounded
    * (<= 4096 rows per open window), merges by +, and the sunk table is
    * replayable. Counters are sums — arrival-order-invariant — so the
    * sunk table equals a batch replay and the DuckDB oracle recomputes
    * the whole pipeline from the raw parquet (all-integer: no float
    * quantization anywhere). Sentinel/watermark determinism argument is
    * [[streamHllSink]]'s verbatim. */
  def streamCountMinSink(s: SparkSession, d: String): DataFrame = {
    val w = 1024
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_cm_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
    val maxTs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val sentinelTs = maxTs + 3L * 86400L * 1000000L
    ev.unionByName(s.range(1).select(lit(-1L).as("user_id"),
        timestamp_micros(lit(sentinelTs)).as("ts")))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(staging)
    val stream = s.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType))))
      .parquet(staging)
    // one definition of the (i, p) carve for BOTH the streaming build
    // and the batch probe below (the sketch_countmin drift argument)
    def positions = explode(array((0 until 4).map(i =>
      struct(lit(i).as("i"),
        pmod(expr(s"h div ${math.pow(w, i).toLong}"), lit(w)).as("p"))): _*))
    val counters = stream
      .withWatermark("ts", "1 second")
      .withColumn("hx", md5(col("user_id").cast("string")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select(col("ts"), positions.as("rp"))
      .groupBy(window(col("ts"), "1 day").as("win"),
        col("rp.i").as("i"), col("rp.p").as("p"))
      .agg(count(lit(1)).as("c"))
      .select(col("win.start").as("day"), col("i"), col("p"), col("c"))
    withStateProvider(s) {
      StreamSink.parquetSink(counters, out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .start()
        .awaitTermination()
    }
    val sunk = s.read
      .schema(StructType(Seq(
        StructField("day", TimestampType),
        StructField("i", org.apache.spark.sql.types.IntegerType),
        StructField("p", LongType), StructField("c", LongType))))
      .parquet(s"$out/batch=*")
      // each finalized (day, i, p) emits once; max keeps replayed batch
      // dirs idempotent (the streamHllSink convention)
      .groupBy("day", "i", "p").agg(max("c").as("c"))
    val exact = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy("day")
      .orderBy(col("exact_cnt").desc, col("user_id").asc)
    val probes = exact
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= 5)
      .withColumn("hx", md5(col("user_id").cast("string")))
      .withColumn("h", graft.util.Md5Lower64.of("hx"))
      .select(col("day"), col("user_id"), col("exact_cnt"), positions.as("rp"))
      .select(col("day"), col("user_id"), col("exact_cnt"),
        col("rp.i").as("i"), col("rp.p").as("p"))
    val res = probes.join(sunk, Seq("day", "i", "p"))
      .groupBy("day", "user_id", "exact_cnt")
      .agg(min("c").as("cm_estimate"))
      .select(col("day"), col("user_id"), col("exact_cnt"),
        col("cm_estimate"),
        (col("cm_estimate") - col("exact_cnt")).as("overcount"))
      .orderBy("day", "user_id")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  /** `stream_join_sink` gate entry: the watermarked stream-stream
    * INTERVAL join ([[StreamJoin.intervalJoin]]) run as a real
    * two-file-source stream end-to-end — every event joined to the
    * same user's PURCHASE probes within [probe − 10 min, probe], match
    * rows sunk per-batch, the sunk table re-read and aggregated per
    * user. The streaming enrichment shape a 100 TB ingest runs
    * continuously (attach recent context to each conversion event);
    * state is watermark-bounded on BOTH sides (the join condition
    * bounds event time from both directions, so each side evicts at
    * watermark + interval — constant in stream length), and the join
    * parallelizes by the user_id equi-key.
    *
    * Determinism: an APPEND-mode inner stream-stream join emits each
    * qualifying pair exactly once regardless of batch splits or
    * arrival order, and the per-user aggregate sums exact integer
    * CENTS (`round(value·100)` — no FP summation-order exposure), so
    * the sunk table equals a batch replay and the DuckDB oracle
    * recomputes the whole join from the raw parquet. Sentinels use
    * DISTINCT user ids (−1 events / −2 probes) so the rows that push
    * both watermarks past the data can never join each other. */
  def streamJoinSink(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_join_").toString
    val evDir = s"$tmp/ev"; val prDir = s"$tmp/pr"
    val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
      col("value"), col("event_type"))
    val maxTs = ev.agg(max(unix_micros(col("ts")))).collect()(0).getLong(0)
    val sentinelTs = maxTs + 3L * 86400L * 1000000L
    ev.select(col("user_id"), col("ts"), col("value"))
      .unionByName(s.range(1).select(lit(-1L).as("user_id"),
        timestamp_micros(lit(sentinelTs)).as("ts"), lit(0.0).as("value")))
      .repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(evDir)
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"))
      .unionByName(s.range(1).select(lit(-2L).as("user_id"),
        timestamp_micros(lit(sentinelTs)).as("pts")))
      .repartitionByRange(4, col("pts"))
      .write.mode("overwrite").parquet(prDir)
    val evStream = s.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("ts", TimestampType),
        StructField("value", org.apache.spark.sql.types.DoubleType))))
      .parquet(evDir)
    val prStream = s.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("pts", TimestampType))))
      .parquet(prDir)
    val joined = StreamJoin.intervalJoin(evStream, prStream)
    // same stateful-shuffle-partition pinning as streamNearDupSink: the
    // count is fixed at first start and becomes the state-store count,
    // and a stream-stream join commits FOUR state stores per partition
    // per batch (left/right keyToNumValues + keyWithIndexToValue), so
    // checkpoint I/O — not compute — dominated this row at 32 partitions
    // (6.5 s in r9). 8 is still full parallelism for the bounded gate
    // stream; output is partition-invariant (append-mode inner join).
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = s.conf.get(spKey)
    s.conf.set(spKey, math.min(prevSp.toInt, 8).toString)
    try {
      withStateProvider(s) {
        StreamSink.parquetSink(joined, out)
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
      }
    } finally s.conf.set(spKey, prevSp)
    val res = s.read
      .schema(StructType(Seq(
        StructField("user_id", LongType), StructField("pts", TimestampType),
        StructField("ts", TimestampType),
        StructField("value", org.apache.spark.sql.types.DoubleType))))
      .parquet(s"$out/batch=*")
      // no defensive re-merge here: join rows carry no within-batch
      // finalization, and [[StreamSink.writeBatch]]'s batchId-keyed
      // overwrite already makes replays duplicate-free — a distinct()
      // would wrongly collapse genuinely identical match rows
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_matches"), sum("cents").as("sum_cents"))
      .orderBy("user_id")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  /** `stream_ann_topk_sink` gate entry — CONTINUOUS ANN serving: the
    * embeddings corpus replayed as a 4-file stream
    * (maxFilesPerTrigger=1 → 4 real micro-batches of ingest); each
    * micro-batch scores its ARRIVALS against the 10 fixed query
    * vectors (a broadcast 10-row frame) and sinks only the batch's
    * per-query top-5; the final read takes the global top-5 of the
    * ≤ 4·5 sunk winners per query. Correctness argument: cosine top-k
    * DISTRIBUTES over any partition of the corpus (each true global
    * winner is within its own batch's top-5), so the output rows equal
    * `ann_topk` EXACTLY — the entry shares its oracle
    * ([[graft.operators.Similarity.annTopkOracleSql]]), regardless of
    * how the stream splits.
    *
    * Scale design: per-batch work is BATCH-sized (a map-side score of
    * the arrivals + a per-query bounded rank), no streaming state at
    * all — the sunk winners table IS the state, and it grows by
    * 5·|queries| rows per batch independent of corpus size. This is
    * the append-ingest serving shape: a corpus that grows by stream
    * keeps an always-current exact top-k without ever re-scanning old
    * data ([[graft.operators.Similarity.annGraphAppend]] is the
    * index-maintenance sibling for the approximate indexes). */
  def streamAnnTopkSink(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import org.apache.spark.sql.expressions.Window
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_ann_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val e0 = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e0.repartitionByRange(4, col("vec_id"))
      .write.mode("overwrite").parquet(staging)
    val q = e0
      .filter(col("vec_id").isin(graft.operators.Similarity.queryIds: _*))
      .withColumn("qn", sqrt(call_function("vec_dot", col("v"), col("v"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
    // per-batchId overwrite ([[StreamSink.writeBatch]]) — a replayed or
    // partially-committed batch rewrites its OWN dir instead of
    // appending duplicate winners that would evict true top-5 rows in
    // the final rank (r12 advice)
    val sinkBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      StreamSink.writeBatch(out)(
        batch
          .withColumn("n",
            sqrt(call_function("vec_dot", col("v"), col("v"))))
          .join(broadcast(q), col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            call_function("vec_dot", col("v"), col("qv"))
              / (col("n") * col("qn")))
          .withColumn("rk", row_number().over(Window.partitionBy("query_id")
            .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)))
          .filter(col("rk") <= 5)
          .select("query_id", "vec_id", "cos"), batchId)
      ()
    }
    val q0 = stream.writeStream.foreachBatch(sinkBatch)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q0.awaitTermination()
    // global top-5 of the sunk per-batch winners — the serving read.
    // Materialized eagerly so the staging/checkpoint dirs can be
    // deleted before returning (they were previously leaked).
    val served = s.read.parquet(s"$out/batch=*")
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(round(col("cos"), 6).desc, col("vec_id").asc)))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 5).as("cos"))
      .orderBy("query_id", "rank")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    served
  }

  /** `stream_graph_append_sink` gate entry — STREAMING index
    * maintenance: the pairing of [[streamAnnTopkSink]] (serving) with
    * [[graft.operators.Similarity.annGraphAppend]] (batch maintenance).
    * The 10% arriving split (vec_id % 10 = 7) replays as a 4-file
    * stream; load phase materializes the FROZEN index side once (the
    * base split's plane family + capped bucket representatives — an
    * index must never re-derive its hash family from arriving data);
    * each micro-batch computes its arrivals' adjacency against that
    * frozen frame and appends it to the graph layout as an idempotent
    * per-batchId parquet dir — the TRTREE append-tail discipline
    * applied to the ANN graph. Correctness: each arriving vector's
    * adjacency is computed entirely within its own micro-batch against
    * the frozen base (per-vector work is batch-independent —
    * [[graft.operators.Similarity.appendEdgesAgainst]]), so the sunk
    * union EQUALS the batch append's rows exactly and the entry shares
    * its oracle verbatim.
    *
    * Scale design: zero streaming state; per-batch work is
    * |arrivals|·(1+P+P(P−1)/2) probe rows against the ≤cap·2^P capped
    * frame — never corpus-shaped; the layout grows by |arrivals|·M edge
    * rows per batch, and a compaction pass (the TRTREE compact shape)
    * folds tails into the base layout off the serving path. */
  def streamGraphAppendSink(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val Sim = graft.operators.Similarity
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_stream_gappend_").toString
    val staging = s"$tmp/in"; val out = s"$tmp/out"; val ck = s"$tmp/ck"
    val e0 = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n", sqrt(call_function("vec_dot", col("v"), col("v"))))
    e0.filter(pmod(col("vec_id"), lit(10)) === 7)
      .repartitionByRange(4, col("vec_id"))
      .write.mode("overwrite").parquet(staging)
    // frozen index side, materialized once (load phase): micro-batches
    // re-READ it — recomputing per batch would re-run the base count,
    // bucketing and cap aggregate 4x
    val (capped0, p) = Sim.appendFrozenIndex(s, d)
    capped0.write.mode("overwrite").parquet(s"$tmp/capped")
    val capped = s.read.parquet(s"$tmp/capped")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      StructField("n", org.apache.spark.sql.types.DoubleType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging)
    val q0 = stream.writeStream.foreachBatch {
        (batch: DataFrame, batchId: Long) =>
          StreamSink.writeBatch(out)(
            Sim.appendEdgesAgainst(capped, batch, p), batchId)
          ()
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q0.awaitTermination()
    val res = s.read.parquet(s"$out/batch=*")
      .select("query_id", "rank", "neighbor_id", "cos")
      .orderBy("query_id", "rank")
      .localCheckpoint(true)
    deleteRecursively(tmp)
    res
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("stream_neardup_sink" -> (streamNearDupSink _),
        "stream_ann_topk_sink" -> (streamAnnTopkSink _),
        "stream_graph_append_sink" -> (streamGraphAppendSink _),
        "stream_sessions_sink" -> (streamSessionsSink _),
        "stream_hll_sink" -> (streamHllSink _),
        "stream_countmin_sink" -> (streamCountMinSink _),
        "stream_join_sink" -> (streamJoinSink _))

  /** Dir-keyed oracles ([[graft.operators.Similarity.oraclesFor]]
    * convention): the static map plus the streaming graph append's
    * shared batch-append oracle (plane family recorded at query time). */
  def oraclesFor(dumpDir: Option[String]): Map[String, String] =
    oracles ++
      graft.operators.Similarity.graphAppendOracleFor(dumpDir)
        .map(sql => "stream_graph_append_sink" -> sql).toMap

  /** DuckDB replay of the per-day register pipeline ([[streamHllSink]])
    * straight from the raw events parquet — arrival-order-invariant
    * registers make the streamed and batch-replayed state identical. */
  val oracles: Map[String, String] = {
    val Hll = graft.operators.Hll
    Map(
      // identical rows to ann_topk (per-batch-top-5 → global-top-5
      // composes to the exact answer) — the SAME oracle text
      "stream_ann_topk_sink" ->
        graft.operators.Similarity.annTopkOracleSql,
      "stream_countmin_sink" ->
      """WITH e AS (
           SELECT date_trunc('day', ts) AS day, user_id FROM events),
         h AS (
           SELECT day, user_id,
             CAST(md5_number_lower(CAST(user_id AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h
           FROM e),
         rp(i, dv) AS (VALUES (0, 1), (1, 1024), (2, 1048576),
           (3, 1073741824)),
         counters AS (
           SELECT day, rp.i, (h.h // rp.dv) % 1024 AS p,
             count(*) AS c
           FROM h CROSS JOIN rp GROUP BY 1, 2, 3),
         ex AS (
           SELECT day, user_id, count(*) AS exact_cnt FROM e GROUP BY 1, 2),
         top AS (
           SELECT day, user_id, exact_cnt FROM (
             SELECT day, user_id, exact_cnt,
               row_number() OVER (PARTITION BY day
                 ORDER BY exact_cnt DESC, user_id ASC) AS rk
             FROM ex) WHERE rk <= 5),
         probes AS (
           SELECT t.day, t.user_id, t.exact_cnt, rp.i,
             (CAST(md5_number_lower(CAST(t.user_id AS VARCHAR))
               & 9223372036854775807 AS BIGINT) // rp.dv) % 1024 AS p
           FROM top t CROSS JOIN rp)
         SELECT p.day, p.user_id, p.exact_cnt,
           CAST(min(c.c) AS BIGINT) AS cm_estimate,
           CAST(min(c.c) AS BIGINT) - p.exact_cnt AS overcount
         FROM probes p
         JOIN counters c ON c.day = p.day AND c.i = p.i AND c.p = p.p
         GROUP BY 1, 2, 3 ORDER BY p.day, p.user_id""",
      "stream_hll_sink" ->
      s"""WITH h AS (
           SELECT DISTINCT date_trunc('day', ts) AS day,
             CAST(md5_number_lower(CAST(user_id AS VARCHAR))
               & 9223372036854775807 AS BIGINT) AS h
           FROM events),
         regs AS (${Hll.regsSql("day, ")}),
         st AS (${Hll.stSql("day, ")}),
         ex AS (
           SELECT date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS exact_distinct
           FROM events GROUP BY 1),
         est AS (
           SELECT st.day, CAST(st.v_empty AS BIGINT) AS v_empty,
             ex.exact_distinct,
             ${Hll.rawEstSql("st.v_empty", "st.s_ne")} AS raw_est
           FROM st JOIN ex ON st.day = ex.day),
         fin AS (
           SELECT day, v_empty, exact_distinct,
             ${Hll.estimateSql("raw_est", "v_empty")} AS hll_estimate
           FROM est)
         SELECT day, v_empty, exact_distinct, hll_estimate,
           round(100.0 * (hll_estimate - exact_distinct) / exact_distinct, 2)
             AS rel_err_pct
         FROM fin ORDER BY day""",
      "stream_join_sink" ->
      // the batch statement of the streamed interval join: APPEND-mode
      // inner join emits each qualifying pair exactly once, integer
      // cents make the per-user sums arrival-order-invariant
      """WITH p AS (
           SELECT user_id, ts AS pts FROM events
           WHERE event_type = 'purchase'),
         e AS (
           SELECT user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         j AS (
           SELECT e.user_id, e.cents
           FROM e JOIN p ON e.user_id = p.user_id
             AND e.ts >= p.pts - INTERVAL 10 MINUTE
             AND e.ts <= p.pts)
         SELECT user_id, count(*) AS n_matches,
           CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM j GROUP BY user_id ORDER BY user_id""")
  }
}
