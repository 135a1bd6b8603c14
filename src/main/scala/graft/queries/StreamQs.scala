package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming queries (SURVEY.md §2.10), run to completion inside
  * the registry so the SAME DuckDB oracle gate covers the streaming path.
  *
  * Each query drives a real `readStream` → transform → memory-sink stream
  * with `Trigger.AvailableNow` (process-everything-then-stop), then returns
  * the sink table. Outputs are arrival-order-independent by construction —
  * windowed aggregates, distinct key sets, and monotone running-state maxima
  * — so batch SQL over the same parquet is an exact oracle even though file
  * split order is not deterministic.
  */
object StreamQs {

  private val sinkId = new AtomicInteger(0)

  /** The file stream source requires a DIRECTORY of data files; testdata
    * tables are single read-only files, and ScaleUp-written tables are
    * parquet DIRECTORIES (whose part files a file stream will not find
    * through one directory symlink — it does not recurse). Stage a
    * per-table temp dir holding symlinks to the actual part file(s)
    * (cheap, idempotent) and stream from that. */
  private def asStreamDir(path: String): String = {
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    def listed(p: Path): Seq[Path] = {
      val s = Files.list(p) // Files.list streams must be closed (fd leak)
      try s.iterator().asScala.toSeq finally s.close()
    }
    val src0 = Paths.get(path)
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stream_${Integer.toHexString(path.hashCode)}")
    Files.createDirectories(dir)
    val parts =
      if (Files.isDirectory(src0))
        listed(src0).filter(_.getFileName.toString.endsWith(".parquet"))
      else Seq(src0)
    for (src <- parts) linkOne(dir, src)
    // a REWRITTEN parquet directory gets fresh UUID part names, so links
    // staged for the previous write would dangle (the file source stats
    // them and dies) — drop any link not in the current part set
    val current = parts.map(_.getFileName.toString).toSet
    for (link <- listed(dir) if !current.contains(link.getFileName.toString))
      Files.deleteIfExists(link)
    dir.toString
  }

  private def linkOne(dir: java.nio.file.Path, src: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    val link = dir.resolve(src.getFileName)
    // A pre-existing link may be stale (regenerated testdata at a different
    // target, or a path.hashCode collision between two dataset dirs) — verify
    // it points at THIS source and recreate it if not, rather than silently
    // streaming the wrong or missing file. Concurrent JVMs race the
    // delete/create window, so a lost race re-validates instead of failing.
    def ensure(attempt: Int): Unit =
      try {
        if (Files.isSymbolicLink(link)) {
          if (Files.readSymbolicLink(link) != src) {
            Files.delete(link)
            Files.createSymbolicLink(link, src)
          }
        } else {
          Files.deleteIfExists(link)
          Files.createSymbolicLink(link, src)
        }
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.NoSuchFileException if attempt < 3 =>
          ensure(attempt + 1)
      }
    ensure(0)
  }

  /** Stateful-operator partition count for the streaming queries. Every
    * stateful partition commits its state stores (delta file + snapshot
    * bookkeeping) per micro-batch — a FIXED cost that dominates when state
    * is small: st4 at sf0.1 runs 8.4s with 32 partitions, 2.7s with 8,
    * 12.7s with 64. Partition count never changes results (outputs are
    * key-partitioned and arrival-order-independent), so default it low for
    * the replay-a-table harness scale and raise via conf on a real cluster
    * where state volume, not store count, is the bottleneck. */
  private def statePartitions(s: SparkSession): String =
    s.conf.getOption("spark.graft.stream.statePartitions").getOrElse("8")

  /** A child session with the stateful partition override — scoped so the
    * override never leaks into batch queries sharing the outer session. */
  private def streamSession(s: SparkSession): SparkSession =
    Q.scopedSession(s, "spark.sql.shuffle.partitions" -> statePartitions(s))

  /** Run a streaming DataFrame to completion into a memory sink; return the
    * collected table (registered on the stream's own session). */
  private def runToMemory(df: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"graft_sink_${sinkId.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  val qs: Seq[Q] = Seq(

    // ST1: tumbling 1-day windowed counts + exact-decimal value sums over the
    // event stream (streaming form of A2). Watermark far beyond the data span
    // so no window is ever dropped; complete mode emits the final state.
    Q("st1_stream_window_counts",
      (s, d) => {
        val ss = streamSession(s)
        val agg = Streams.eventStream(ss, asStreamDir(s"$d/events.parquet"))
          .withWatermark("ts", "90 days")
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n"), col("total_value"))
        runToMemory(agg, OutputMode.Complete())
      },
      Some("""SELECT date_trunc('day', ts) AS window_start, event_type,
             |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ST2: streaming key dedup (`dropDuplicatesWithinWatermark`, so the
    // per-key state is watermark-bounded — see Streams.dedupByKey's
    // scaladoc) — the reference's incremental append + transaction-id dedup
    // (`pipeline_handler.py:299-355`). Projected to the key columns first, so
    // keep-first-arrival is order-independent.
    Q("st2_stream_dedup_keys",
      (s, d) => {
        val ss = streamSession(s)
        val pairs = Streams.eventStream(ss, asStreamDir(s"$d/events.parquet"))
          .select(col("ts"), col("user_id"), col("event_type"))
        val dd = Streams.dedupByKey(pairs, "user_id", "90 days")
          .select(col("user_id"))
        runToMemory(dd, OutputMode.Append())
      },
      Some("SELECT DISTINCT user_id FROM events")),

    // ST4: watermarked stream-stream interval join — each purchase joined to
    // the same user's clicks in the 10 minutes before it. Both sides
    // watermarked far beyond the data span (nothing pruned), so the append
    // output is the exact deterministic pair set of the batch join.
    Q("st4_stream_stream_join",
      (s, d) => {
        val ss = streamSession(s)
        def side(tpe: String, pfx: String) =
          Streams.eventStream(ss, asStreamDir(s"$d/events.parquet"))
            .filter(col("event_type") === tpe)
            .select(col("user_id").as(s"${pfx}_user"), col("event_id").as(s"${pfx}_id"),
              col("ts").as(s"${pfx}_ts"))
            .withWatermark(s"${pfx}_ts", "90 days")
        val joined = side("purchase", "p").join(side("click", "c"),
          expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 10 MINUTES AND c_ts <= p_ts"))
          .select(col("p_id"), col("c_id"),
            (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
        runToMemory(joined, OutputMode.Append())
      },
      Some("""SELECT p.event_id AS p_id, c.event_id AS c_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
             |FROM events p JOIN events c
             |  ON p.user_id = c.user_id
             | AND p.event_type = 'purchase' AND c.event_type = 'click'
             | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts""".stripMargin)),

    // ST5: streaming session windows, oracle-gated. With zero lateness the
    // final watermark is max(ts), and append mode emits exactly the
    // sessions the watermark closed — a set batch SQL can name: sessions
    // whose [start, last+gap) end is AT OR before the final watermark
    // (eviction is end <= watermark, pinned by SessionBoundarySpec). The
    // session boundary is session_window's half-open rule (a step of
    // exactly gap starts a new session → batch lag >= gap).
    Q("st5_stream_sessions",
      (s, d) => {
        val sessions = Streams.userSessions(
          Streams.eventStream(streamSession(s), asStreamDir(s"$d/events.parquet")),
          "30 minutes", "0 seconds")
        runToMemory(sessions, OutputMode.Append())
          .select(col("user_id"), Q.usecs(col("session_start")).as("start_us"),
            col("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
             |m AS (SELECT user_id, event_id, us,
             |  CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 1800000000
             |       THEN 1 ELSE 0 END AS nf
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
             |sn AS (SELECT user_id, us,
             |  SUM(nf) OVER (PARTITION BY user_id ORDER BY us, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM m),
             |g AS (SELECT user_id, grp, MIN(us) AS start_us, MAX(us) AS last_us,
             |      COUNT(*) AS n_events FROM sn GROUP BY 1, 2)
             |SELECT user_id, start_us, n_events FROM g
             |WHERE last_us + 1800000000 <= (SELECT MAX(us) FROM e)""".stripMargin)),

    // ST3: custom keyed state via mapGroupsWithState — running per-user
    // totals. Totals are monotone, so max-per-user over the update-mode
    // emissions equals the final state regardless of micro-batch slicing.
    Q("st3_stream_running_totals",
      (s, d) => {
        val ss = streamSession(s)
        val stream = Streams.eventStream(ss, asStreamDir(s"$d/events.parquet"))
        val totals = Streams.runningUserTotals(ss, stream).toDF()
        runToMemory(totals, OutputMode.Update())
          .groupBy(col("userId").as("user_id"))
          .agg(max(col("n")).as("n_events"), max(col("purchases")).as("n_purchases"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
             |FROM events GROUP BY user_id""".stripMargin)),

    // ST6: streaming curation front door — the row-local c2 gates applied
    // on ingest: language + quality filter, leakage-safe split assignment,
    // and content-fingerprint dedup (keep-first) in streaming state. The
    // output is keyed on the fingerprint and split is a pure function of
    // it, so the result SET is arrival-order-independent and batch SQL is
    // an exact oracle. Dedup state is fingerprint-sized (no watermark: the
    // documents table has no event time — this is a whole-corpus replay; a
    // production ingest bounds it with an ingest-time watermark, st2-style).
    Q("st6_stream_curation_gate",
      (s, d) => {
        import graft.ops.TextAnalysis
        val ss = streamSession(s)
        val gated = Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet"))
          .filter(col("lang") === "en" && TextAnalysis.qualityScore("text") >= 0.8)
        val keyed = TextAnalysis.splitAssign(gated, "doc_id", "source", "text")
          .select(col("fp"), col("split"))
          .dropDuplicates("fp")
        runToMemory(keyed, OutputMode.Append())
      },
      Some {
        import graft.ops.TextAnalysis
        s"""SELECT DISTINCT ${TextAnalysis.fingerprintSql("text")} AS fp,
           |  ${TextAnalysis.splitAssignSql("text")} AS split
           |FROM documents
           |WHERE lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8""".stripMargin
      }),

    // ST7: streaming NEAR-dup ingest — st6 gates on exact fingerprints only;
    // this runs the whole corpus through `Streams.nearDupIngest`, the
    // foreachBatch seat of d8's delta-vs-index minhash gate: each micro-batch
    // shingles ITSELF, joins its LSH bands against the persisted corpus
    // signature table, verifies candidates at exact Jaccard, and commits
    // accepted+rejected rows (with their signatures) in one atomic swap.
    // The corpus replay arrives in doc_id order, so the arrival-order gate
    // ("near-dups any previously-arrived doc") is exactly "near-dups a
    // smaller-id doc" — the set batch SQL names below. Restart/replay
    // resumability is pinned by StreamsSpec.
    Q("st7_stream_neardup_ingest",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st7_").toString
        Streams.nearDupIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet")),
            s"$base/state", s"$base/ckpt", threshold = 0.5)
          .awaitTermination()
        ss.read.parquet(s"$base/state").select(col("doc_id"), col("accepted"))
      },
      Some(s"""WITH ${DedupQs.shinglesCte},
              |lanes AS (
              |  SELECT doc_id,
              |    ('0x' || substr(h, 1, 8))::BIGINT AS x1,
              |    ('0x' || substr(h, 9, 8))::BIGINT AS x2
              |  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)),
              |mh AS (
              |  SELECT doc_id,
              |${graft.ops.Dedup.minhashMinsSql(8)}
              |  FROM lanes GROUP BY doc_id),
              |bands AS (
              |${(0 until 4).map(b =>
                   s"  SELECT doc_id, $b AS band, CAST(mh_${2 * b} AS VARCHAR) || '|' || CAST(mh_${2 * b + 1} AS VARCHAR) AS sig FROM mh")
                   .mkString("\n  UNION ALL\n")}),
              |cands AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.sig = b.sig AND b.doc_id < a.doc_id
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
              |inter AS (
              |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              |  FROM cands c
              |  JOIN sh a ON a.doc_id = c.id_a
              |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              |  GROUP BY 1, 2),
              |rej AS (
              |  SELECT DISTINCT c.id_a AS doc_id
              |  FROM cands c
              |  LEFT JOIN inter USING (id_a, id_b)
              |  JOIN sizes sa ON sa.doc_id = c.id_a
              |  JOIN sizes sb ON sb.doc_id = c.id_b
              |  WHERE round(COALESCE(n_inter, 0)
              |    / CAST(sa.n_sh + sb.n_sh - COALESCE(n_inter, 0) AS DOUBLE), 6) >= 0.5)
              |SELECT d.doc_id, r.doc_id IS NULL AS accepted
              |FROM documents d LEFT JOIN rej r ON d.doc_id = r.doc_id""".stripMargin)),

    // ST8: streaming benchmark decontamination — the t6/t6b gate as an
    // ingest seat: the benchmark shingle set collapses once to a broadcast
    // Bloom filter + exact verify frame, each arriving micro-batch probes
    // it map-side and upserts its per-doc report keyed on doc_id. Per-doc
    // results are batching- and arrival-order-independent, so the state
    // table equals the batch result exactly — the same oracle as t6/t6b.
    Q("st8_stream_decontaminate",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st8_").toString
        val docs = graft.core.Tables.documents(ss, d)
        Streams.decontaminateIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet"))
              .filter(col("doc_id") % 97 =!= 0),
            docs.filter(col("doc_id") % 97 === 0),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        ss.read.parquet(s"$base/state")
          .select(col("doc_id"), col("n_shingles"), col("n_contam"),
            col("contam_ratio"), col("flagged"))
      },
      Some(TextQs.decontaminateOracle)),

    // ST9: streaming ingest with BOUNDED small files — the two-zone
    // landing/base pattern: each micro-batch lands idempotently in its own
    // batch dir, committed batches fold into a compacted base table under
    // the TableSwap protocol, and the read view (base ∪ unmerged landing,
    // anti-joined on batch ids already in base) is exactly-once at every
    // point. Content is batching-independent, so batch SQL is the oracle;
    // the file-count bound and crash-window idempotence are StreamsSpec's.
    Q("st9_stream_compacted_ingest",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st9_").toString
        Streams.compactingIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet")),
            s"$base/tbl", s"$base/ckpt")
          .awaitTermination()
        Streams.readIngested(ss, s"$base/tbl")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
      },
      Some("""SELECT source, COUNT(*) AS n,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY source""".stripMargin)),

    // ST10: streaming heavy-hitters — t24's count-min sketch as an ingest
    // seat: each micro-batch lands its own depth×width partial counter
    // table (replay-idempotent: a replayed batch OVERWRITES its batch_id
    // dir rather than double-adding), and the current sketch is the
    // re-summed union of partials — addition IS the sketch's merge
    // operator, so the streamed counters equal the batch sketch exactly
    // and t24's oracle carries over unchanged. Multi-batch equality and
    // restart-resume are StreamsSpec's.
    Q("st11_stream_cdc_census",
      (s, d) => {
        // t28's chunk census as an ingest seat: per-batch partial censuses
        // land by batch_id (replay = overwrite, counts additive), and the
        // per-doc dup rollup runs against the MERGED census — equal to the
        // batch stats exactly, so t28's oracle carries over unchanged.
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st11_").toString
        Streams.cdcIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet")),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        import graft.ops.TextAnalysis
        TextAnalysis.cdcChunkStatsFromCensus(
          TextAnalysis.cdcChunkInstances(
            graft.core.Tables.documents(ss, d), "doc_id", "text"),
          Streams.cdcMergedCensus(ss, s"$base/state"), "doc_id")
      },
      Some(graft.ops.TextAnalysis.cdcChunkStatsSql("doc_id", "text", "documents"))),

    Q("st12_stream_source_drift",
      (s, d) => {
        // t26's drift monitor as an ingest seat: per-batch (source, bucket)
        // count partials land by batch_id (replay = overwrite, counts
        // additive), and the KL/TVD report runs off the MERGED spine via
        // the same sourceDriftFromBuckets code as batch t26 — streamed
        // monitoring equals the batch report exactly, oracle unchanged.
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st12_").toString
        Streams.driftIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet")),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        graft.ops.TextAnalysis.sourceDriftFromBuckets(
          Streams.driftMergedBuckets(ss, s"$base/state").localCheckpoint(true),
          "source")
      },
      Some(graft.ops.TextAnalysis.sourceDriftSql("source", "text", "documents"))),

    Q("st10_stream_heavy_hitters",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st10_").toString
        Streams.cmsIngest(
            Streams.documentStream(ss, asStreamDir(s"$d/documents.parquet")),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        import graft.ops.TextAnalysis
        TextAnalysis.cmsHeavyHittersFromCounters(
          TextAnalysis.cmsWordSpine(
            graft.core.Tables.documents(ss, d), "text").localCheckpoint(true),
          Streams.cmsMergedCounters(ss, s"$base/state"))
      },
      Some(graft.ops.TextAnalysis.cmsHeavyHittersSql("text", "documents"))),

    // ST13: streaming quantile-sketch ingest (Streams.quantileIngest) —
    // the third sketch's ingest seat next to st10 (CMS) and a4d's batch
    // merge (HLL): per-batch (bucket, cnt) histogram partials land by
    // batch_id, the current state is the bucket-wise re-sum, and because
    // the a18 bucketing is deterministic the merged state must equal the
    // one-pass batch histogram BIT-FOR-BIT — asserted by the
    // stream_matches_batch column (a full-outer bucket compare), with
    // quantiles answered FROM the merged state.
    Q("st13_stream_value_quantiles",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st13_").toString
        Streams.quantileIngest(
            Streams.eventStream(ss, asStreamDir(s"$d/events.parquet"))
              .filter(col("value").isNotNull && col("value") >= 0),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        import graft.ops.QuantileSketch
        val merged = Streams.quantileMergedHistogram(ss, s"$base/state")
          .localCheckpoint(true)
        val direct = QuantileSketch.histogram(
          graft.core.Tables.events(ss, d)
            .filter(col("value").isNotNull && col("value") >= 0),
          Seq.empty, "value")
        val bad = merged.withColumnRenamed("cnt", "cm")
          .join(direct.withColumnRenamed("cnt", "cd"), Seq("bucket"), "full_outer")
          .agg(count(when(not(col("cm") <=> col("cd")), lit(1))).as("n_bad"))
        QuantileSketch.quantiles(merged.withColumn("grp", lit("all")),
            Seq("grp"), Seq(("p50", 1, 2), ("p95", 19, 20)))
          .crossJoin(broadcast(bad))
          .select(col("n"), col("n_buckets"), col("p50_low"), col("p95_low"),
            (col("n_bad") === 0).as("stream_matches_batch"))
      },
      Some {
        import graft.ops.QuantileSketch._
        s"""WITH src AS (
           |  SELECT ${qunitsSql("value")} AS qv
           |  FROM events
           |  WHERE value IS NOT NULL AND value >= 0 AND value < 100000000000000.0),
           |h AS (SELECT ${bucketIdSql("qv")} AS bucket, COUNT(*) AS cnt
           |      FROM src GROUP BY 1),
           |c AS (SELECT bucket,
           |        SUM(cnt) OVER (ORDER BY bucket) AS cum,
           |        SUM(cnt) OVER () AS n
           |      FROM h)
           |SELECT CAST(MAX(n) AS BIGINT) AS n, COUNT(*) AS n_buckets,
           |  CAST(${bucketLowSql(
              "MIN(CASE WHEN cum >= (n * 1 + 1) // 2 THEN bucket END)")}
           |    AS DOUBLE) / 10000 AS p50_low,
           |  CAST(${bucketLowSql(
              "MIN(CASE WHEN cum >= (n * 19 + 19) // 20 THEN bucket END)")}
           |    AS DOUBLE) / 10000 AS p95_low,
           |  true AS stream_matches_batch
           |FROM c""".stripMargin
      }),

    // ST14: streaming HLL ingest (Streams.hllIngest) — the distinct-count
    // sketch's ingest seat, completing the trio (st10 CMS counts, st13
    // value quantiles, st14 distinct users): per-(batch, event_type)
    // 256-byte hll_state register partials land by batch_id, the current
    // sketch is their element-wise-max union (hll_merge), and because
    // register max is associative, commutative AND IDEMPOTENT the merged
    // readout equals the one-pass batch sketch regardless of batching or
    // replay — asserted per group by stream_matches_batch (full readout
    // equality vs a direct hll_sketch), with the int64-safe s_hi/s_lo/zeros
    // readout answered FROM the merged state (the a4c/a4d contract).
    Q("st14_stream_distinct_sketch",
      (s, d) => {
        val ss = streamSession(s)
        graft.plans.HllSketch.register(ss)
        val base = java.nio.file.Files.createTempDirectory("graft_st14_").toString
        Streams.hllIngest(
            Streams.eventStream(ss, asStreamDir(s"$d/events.parquet")),
            s"$base/state", s"$base/ckpt", "user_id", "event_type")
          .awaitTermination()
        val merged = Streams.hllMergedSketch(ss, s"$base/state")
        // the same null-row pre-filter as hllIngest: an event_type whose
        // user_ids are all NULL must vanish on BOTH engines (the oracle's
        // hx filters before grouping), not linger as an all-zero sketch
        val direct = graft.core.Tables.events(ss, d)
          .filter(col("user_id").isNotNull)
          .groupBy(col("event_type").as("grp"))
          .agg(expr("hll_sketch(CAST(user_id AS STRING))").as("hd"),
            countDistinct(col("user_id")).as("n_exact"))
        merged.join(direct, Seq("grp"))
          .select(col("grp"), col("n_exact"),
            col("h.s_hi").as("s_hi"), col("h.s_lo").as("s_lo"),
            col("h.zeros").as("n_zero"),
            (col("h.s_hi") === col("hd.s_hi") &&
              col("h.s_lo") === col("hd.s_lo") &&
              col("h.zeros") === col("hd.zeros"))
              .as("stream_matches_batch"))
      },
      Some(s"""WITH ${Aggregates.hllOracleCtes(
               "SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS sv FROM events")},
             |ex AS (
             |  SELECT event_type AS grp, COUNT(DISTINCT user_id) AS n_exact
             |  FROM events GROUP BY 1)
             |SELECT e.grp, e.n_exact, s_hi, s_lo,
             |  CAST(zeros AS INTEGER) AS n_zero, true AS stream_matches_batch
             |FROM ex e JOIN sk2 USING (grp)""".stripMargin)),

    // ST15: streaming ingest of the unified EVENTS TABLE's event-sourced
    // slices (ev2's check-ins / pipeline customer events / campaign flows /
    // crew contacts — ONE slice definition shared with the batch mart, so
    // the stream can never drift from the table it feeds). The reference
    // REBUILDS events.csv from scratch daily (`build_events_table.py`);
    // this seat is the incremental form: arrivals are normalized to the
    // unified schema and deduplicated on the reference's (customer, type,
    // date, details) key with dropDuplicatesWithinWatermark, so the dedup
    // state is genuinely watermark-bounded (plain dropDuplicates without
    // the event-time column in the key subset never evicts). Keep-first-
    // arrival is order-independent HERE by construction — slice event_types
    // are disjoint and every non-key column is a function of the key (see
    // eventSlices' scaladoc) — so the streaming output set equals batch
    // DISTINCT whenever duplicate arrivals land within the 90-day horizon
    // of their first (always, in this harness and in the reference's
    // 3x/day cadence), and the oracle can say so exactly (the st2
    // discipline).
    // Firebase parties and linked transactions arrive via their own marts
    // (different systems in the reference), not this feed.
    Q("st15_stream_events_union",
      (s, d) => {
        val ss = streamSession(s)
        val dd = EventsTable.eventSlices(
            Streams.eventStream(ss, asStreamDir(s"$d/events.parquet")))
          .withWatermark("ts", "90 days")
          .dropDuplicatesWithinWatermark(
            "customer_id", "event_type", "event_date", "details")
          .drop("ts", "prio")
        runToMemory(dd, OutputMode.Append())
      },
      Some(s"""SELECT DISTINCT customer_id, event_date, event_type, details,
              |  source, entry_method, amount
              |FROM (
              |${EventsTable.eventSlicesSql})""".stripMargin)),

    // ST16: streaming PCA-moment ingest (Streams.pcaMomentsIngest) — the
    // projection model's state joins the mergeable-ingest family (st10 CMS
    // counts, st13 value quantiles, st14 distinct users): per-batch
    // per-dimension (n, Σq, Σq²) BIGINT moment partials land by batch_id,
    // the current state is their per-dimension integer SUM (the k14b
    // merge), and the merged readout equals the one-pass batch moments
    // integer-for-integer — asserted per dimension by stream_matches_batch
    // against a direct batch aggregation, with the moments answered FROM
    // the merged state (the a4c/a4d contract: the state is the product,
    // Pca.fit refreshes from it without a corpus re-scan).
    Q("st16_stream_pca_moments",
      (s, d) => {
        val ss = streamSession(s)
        val base = java.nio.file.Files.createTempDirectory("graft_st16_").toString
        Streams.pcaMomentsIngest(
            Streams.embeddingStream(ss, asStreamDir(s"$d/embeddings.parquet")),
            s"$base/state", s"$base/ckpt")
          .awaitTermination()
        val merged = Streams.pcaMergedMoments(ss, s"$base/state")
        val direct = graft.core.Tables.embeddings(ss, d)
          .filter(col("embedding").isNotNull)
          .select(posexplode(col("embedding")).as(Seq("pos", "x")))
          .withColumn("qv", floor(col("x").cast("double") * 1024).cast("long"))
          .groupBy(col("pos"))
          .agg(count(lit(1)).as("n_x"), sum(col("qv")).as("m_x"),
            sum(col("qv") * col("qv")).as("g_x"))
        merged.join(direct, Seq("pos"))
          .select(col("pos"), col("n").as("n_vectors"),
            col("m").as("mean_num"), col("g").as("gram_diag"),
            (col("n") === col("n_x") && col("m") === col("m_x") &&
              col("g") === col("g_x")).as("stream_matches_batch"))
      },
      Some("""WITH q AS (
             |  SELECT CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS qv
             |  FROM embeddings WHERE embedding IS NOT NULL)
             |SELECT pos, COUNT(*) AS n_vectors,
             |  CAST(SUM(qv) AS BIGINT) AS mean_num,
             |  CAST(SUM(qv * qv) AS BIGINT) AS gram_diag,
             |  true AS stream_matches_batch
             |FROM q GROUP BY pos""".stripMargin)),

    // ST17: streaming transaction waterfall — the reference's MOST-RUN
    // incremental pattern (`pipeline_handler.py:299-355`: fetch-last-N-days
    // → concat → drop_duplicates(transaction_id) on a 3×/day cron) as a
    // continuous query, feeding cm2's match waterfall. Three readers of the
    // same ledger stand in for the three daily re-syncs — every transaction
    // arrives three times, and the watermark-keyed dedup
    // (dropDuplicatesWithinWatermark on the transaction id, state evicted
    // once the watermark passes each key's first arrival) keeps exactly
    // one. The surviving arrivals flow through the SAME waterfall body the
    // batch mart uses (EventsTable.matchWaterfall — one definition, two
    // readers, the ev2/st15 discipline) with the three dimension frames as
    // stream-static joins. Re-sent copies are bit-identical (the re-sync
    // re-reads one ledger), so which copy survives is immaterial and the
    // streaming output equals the batch cm2 mart exactly — the oracle IS
    // cm2's oracle.
    Q("st17_stream_txn_waterfall",
      (s, d) => {
        val ss = streamSession(s)
        val dir = asStreamDir(s"$d/orders.parquet")
        val resync = Seq.fill(3)(Streams.orderStream(ss, dir))
          .reduce(_.unionByName(_))
        val arrivals = resync
          .withColumn("ts", col("o_orderdate"))
          .withWatermark("ts", "90 days")
          .dropDuplicatesWithinWatermark("o_orderkey")
          .drop("ts")
        val (mem, passes, emails) = EventsTable.waterfallDims(ss, d)
        val matched = EventsTable.matchWaterfall(
          EventsTable.txnFeedFrom(arrivals), mem, passes, emails)
        runToMemory(matched, OutputMode.Append())
      },
      Some(EventsTable.customerTransactionsSql),
      // promoted on landing: the LARGEST untimed query by 3-rep median
      // (8.47 s at sf0.1 — dominated by per-batch state-store commits on
      // three file streams, the honest price of the re-sync simulation)
      bench = true),
  )
}
