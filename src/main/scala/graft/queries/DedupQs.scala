package graft.queries

import graft.core.Tables
import graft.ops.{Dedup, Normalize}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication queries over `documents` (BASELINE north star ops).
  * Oracles re-derive the full pipelines in DuckDB SQL — the md5-based hashing
  * makes every stage engine-portable. */
object DedupQs {

  // Shared oracle CTEs: distinct 3-gram shingles per doc.
  private[queries] val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT doc_id, unnest(list_transform(
      |    range(greatest(len(string_split(text, ' ')) - 2, 0)),
      |    i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS shingle
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3)""".stripMargin

  /** Shared oracle CTE chain for the 64-bit banded simhash: toks → votes →
    * sig (4 × 16-bit bands) → pairs (band collisions) → ham (exact hamming).
    * Mirrors `Dedup.simhash64Bands`/`simhash64NearDup`. */
  private val simhash64CtesSql: String = {
    val hx = "ascii(substr(md5(tok), i % 32 + 1, 1))"
    val bandCols = (0 until 4).map(b =>
      s"    CAST(SUM(CASE WHEN votes > 0 AND bit // 16 = $b THEN (1 << (bit % 16)) ELSE 0 END) AS INT) AS b$b")
      .mkString(",\n")
    val bandJoins = (0 until 4).map(k =>
      s"    SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sig a JOIN sig b ON a.b$k = b.b$k AND a.doc_id < b.doc_id")
      .mkString("\n    UNION ALL\n")
    val hamming = (0 until 4).map(k => s"bit_count(xor(sa.b$k, sb.b$k))").mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |votes AS (
       |  SELECT doc_id, i AS bit,
       |    SUM(((($hx - CASE WHEN $hx >= 97 THEN 87 ELSE 48 END) >> (i // 32)) & 1) * 2 - 1) AS votes
       |  FROM toks, range(64) t(i) WHERE tok <> '' GROUP BY 1, 2),
       |sig AS (
       |  SELECT doc_id,
       |$bandCols
       |  FROM votes GROUP BY doc_id),
       |pairs AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |$bandJoins)),
       |ham AS (
       |  SELECT id_a, id_b, CAST($hamming AS BIGINT) AS hamming
       |  FROM pairs JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b)""".stripMargin
  }

  // Shared oracle pieces for the verified-LSH pair queries (d2/d9): the full
  // shingle → minhash-lane → band → candidate → intersection/size CTE chain,
  // the exact-Jaccard expression, and the final join block.
  private val jaccardSql =
    "round(COALESCE(n_inter, 0) / CAST(sa.n_sh + sb.n_sh - COALESCE(n_inter, 0) AS DOUBLE), 6)"

  private def lshOracleCtes = s"""$shinglesCte,
     |lanes AS (
     |  SELECT doc_id,
     |    ('0x' || substr(h, 1, 8))::BIGINT AS x1,
     |    ('0x' || substr(h, 9, 8))::BIGINT AS x2
     |  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)),
     |mh AS (
     |  SELECT doc_id,
     |${Dedup.minhashMinsSql(8)}
     |  FROM lanes GROUP BY doc_id),
     |bands AS (
     |${(0 until 4).map(b =>
         s"  SELECT doc_id, $b AS band, CAST(mh_${2 * b} AS VARCHAR) || '|' || CAST(mh_${2 * b + 1} AS VARCHAR) AS sig FROM mh")
         .mkString("\n  UNION ALL\n")}),
     |cands AS (
     |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
     |  FROM bands a JOIN bands b
     |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
     |  GROUP BY 1, 2),
     |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
     |inter AS (
     |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
     |  FROM cands c
     |  JOIN sh a ON a.doc_id = c.id_a
     |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
     |  GROUP BY 1, 2)""".stripMargin

  private val lshOracleFrom = """FROM cands c
     |LEFT JOIN inter USING (id_a, id_b)
     |JOIN sizes sa ON sa.doc_id = c.id_a
     |JOIN sizes sb ON sb.doc_id = c.id_b""".stripMargin

  /** The d5 near-dup pair graph (simhash64, hamming <= 3) as a checkpointed
    * (nodes, edges) pair — the shared scaffold of d6/gr2/gr3/gr4, so a
    * change to the pair source (threshold, checkpoint policy) lands in one
    * place. */
  private def nearDupGraph(s: org.apache.spark.sql.SparkSession,
      d: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val pairs = Dedup.simhash64NearDupManku(Tables.documents(s, d), "doc_id", "text", 3)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    val nodes = pairs.select(col("id_a").as("id"))
      .unionByName(pairs.select(col("id_b").as("id"))).distinct()
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    (nodes, edges)
  }

  /** The c5 UniMax allocation + cut over a PRE-BUILT weighted frame
    * (doc_id, lang, weight_ppm, eff_tokens_ppm) — one definition, two
    * readers: the registry query above it builds the frame from the pair
    * graph inline (self-contained oracle), the pipeline's soft_budget_mix
    * seat injects the MATERIALIZED soft_dedup_weights mart joined to the
    * doc spine for lang, so the simhash pair build runs once per pipeline
    * run (the ev2 injection pattern). Allocation state is LANGUAGE-count
    * rows (KB, driver-side, the BPE-table pattern); the cut is the
    * t16/t33 two-level sharded prefix sum. */
  private[graft] def softCurationCut(s: org.apache.spark.sql.SparkSession,
      weighted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.ops.TextAnalysis
    import s.implicits._
    val sizes = weighted.groupBy(col("lang"))
      .agg(sum(col("eff_tokens_ppm")).as("sz")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    val alloc = TextAnalysis.unimaxAllocation(sizes,
      budget = 24000L * 1000000L, capNum = 6, capDen = 5)
    val allocDf = alloc.map { case (l, _, a, rule) => (l, a, rule) }
      .toDF("lang", "lang_budget_ppm", "alloc_rule")
    TextAnalysis.stratifiedTokenRank(weighted, "lang", "doc_id",
        col("eff_tokens_ppm"), "softcur")
      .withColumnRenamed("cum_tokens", "cum_eff_ppm")
      .join(broadcast(allocDf), Seq("lang"))
      .filter(col("cum_eff_ppm") <= col("lang_budget_ppm"))
      .select(col("doc_id"), col("lang"), col("weight_ppm"),
        col("eff_tokens_ppm"), col("cum_eff_ppm"),
        col("lang_budget_ppm"), col("alloc_rule"))
  }

  /** The verified MinHash-LSH pair frame (keeps jaccardFor's
    * n_inter/n_a/n_b so consumers can derive further metrics).
    * Materialization frontiers, A/B-measured in rounds 3-4:
    * - ONE heavy pass over RAW shingles (no distinct shuffle — minhash is
    *   duplicate-insensitive); the verify stage semi-filters to candidate
    *   docs before deduping and sizing.
    * - The signature table checkpoints (ONE row per doc — the natural
    *   persist point; the band self-join's two renamed branches defeat
    *   ReuseExchange, so without it the shingle+md5 pipeline runs twice
    *   more: 2.2s -> 0.7s at sf0.1). The petabyte shingle stream is never
    *   materialized anywhere.
    * - The tiny candidate set checkpoints (three consumers: semi-filter,
    *   intersection, final join; ~0.5s at sf0.1 vs replaying signatures). */
  private def lshVerified(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val shRaw = Dedup.shingles(Tables.documents(s, d), "doc_id", "text", 3, dedup = false)
    val mh = Dedup.minhash(shRaw, "doc_id", 8).localCheckpoint(true)
    // capped candidate generator is the production default: bit-identical
    // to uncapped here (bucket max 8 at sf0.1 << 1024 — see
    // Dedup.DefaultLshMaxBucket), so the uncapped oracle still matches
    val cands = Dedup.lshCandidatesCapped(Dedup.lshBands(mh, "doc_id", 2, 8),
        "doc_id", Dedup.DefaultLshMaxBucket)
      .localCheckpoint(true)
    Dedup.jaccardFor(cands, shRaw, "doc_id")
  }


  /** The c2/c3 curation gate stack as ONE plan: language → quality (t2) →
    * repetition head-concentration (t12) → unigram-surprisal LM band (t15)
    * → exact-dup keeper (d1) → simhash64 near-dup drop (d5) → [c3 only:
    * d9 containment drop] → leakage-safe content-fingerprint split (t13) →
    * deterministic-shuffle GLOBAL token budget over the train split (t16).
    * Each gate is corpus-derived but applied per-row via semi-joins on the
    * narrow doc_id key — the wide text column never re-shuffles. Val/test
    * docs bypass the budget (cum_tokens NULL): the budget shapes what we
    * TRAIN on, the eval sets stay complete. */
  private def curationStack(s: org.apache.spark.sql.SparkSession, d: String,
      containment: Boolean): org.apache.spark.sql.DataFrame = {
    import graft.ops.TextAnalysis
    val (gated, _) = gatedFrame(s, d, containment)
    val train = TextAnalysis.globalTokenBudget(
      gated.filter(col("split") === "train"),
      "doc_id", col("n_tokens"), budget = 15000L, salt = "budget")
      .select(col("doc_id"), col("source"), col("split"),
        col("n_tokens"), col("cum_tokens"))
    val evalSets = gated.filter(col("split") =!= "train")
      .withColumn("cum_tokens", lit(null).cast("long"))
    train.unionByName(evalSets)
  }

  /** C4: the same gate stack, but the train budget buys IMPORTANCE (t29's
    * DSIR selection) instead of a deterministic-random sample — "the 15k
    * most target-like tokens that survived curation". Scores come from the
    * corpus-level DSIR model (t23); the tier cut runs over the gated train
    * subset only. */
  private def curationStackDsir(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import graft.ops.TextAnalysis
    val docs = Tables.documents(s, d)
    // the DSIR model scores off the SAME checkpointed word-count spine the
    // gates consume — one corpus explode for gates + model
    val (gated, dw) = gatedFrame(s, d, containment = false)
    val scores = TextAnalysis.dsirScoresFromCounts(dw,
        docs.select(col("doc_id"), (col("lang") === "en" &&
          TextAnalysis.qualityScore("text") >= 0.8).as("__t")), "doc_id")
      .select(col("doc_id"), col("n_words"), col("dsir_score"))
    val trainSel = TextAnalysis.importanceBudgetFromScores(
        gated.filter(col("split") === "train").select("doc_id")
          .join(scores, "doc_id"), "doc_id", budget = 15000L)
      .select(col("doc_id"), col("dsir_score"), col("tier_before"))
    val train = gated.filter(col("split") === "train")
      .join(trainSel, Seq("doc_id")) // inner: only budget-selected docs
    val evalSets = gated.filter(col("split") =!= "train")
      .withColumn("dsir_score", lit(null).cast("double"))
      .withColumn("tier_before", lit(null).cast("long"))
    val cols = Seq("doc_id", "source", "split", "n_tokens",
      "dsir_score", "tier_before")
    train.select(cols.map(col): _*).unionByName(evalSets.select(cols.map(col): _*))
  }

  /** The shared gate stack through the checkpointed narrow `gated` frame
    * (doc_id, source, split, n_tokens) — c2/c3/c4 diverge only in how the
    * train budget is spent. */
  private def gatedFrame(s: org.apache.spark.sql.SparkSession, d: String,
      containment: Boolean)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import graft.ops.TextAnalysis
    val docs = Tables.documents(s, d)
    // ONE corpus explode for all three word-side consumers: the shared
    // (doc, word, count) spine feeds the repetition gate, the surprisal
    // gate, AND the simhash votes (each otherwise re-explodes the text).
    val dw = Dedup.wordCounts(docs, "doc_id", "text").localCheckpoint(true)
    val keepRep = TextAnalysis.repetitionStatsFromCounts(dw, docs, "doc_id", "text")
      .filter(!col("repetitive")).select("doc_id")
    val keepSurp = TextAnalysis.unigramSurprisalFromCounts(dw, "doc_id")
      .filter(!col("unusual")).select("doc_id")
    val keepers = Dedup.exactDupGroups(docs, "doc_id", "text")
      .select(col("keeper_id").as("doc_id"))
    val nearDrop = Dedup.simhash64NearDupMankuFromCounts(dw, "doc_id", 3)
      .select(col("id_b").as("doc_id")).distinct()
    val base = docs
      .filter(col("lang") === "en" && TextAnalysis.qualityScore("text") >= 0.8)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(keepRep, Seq("doc_id"), "left_semi")
      .join(keepSurp, Seq("doc_id"), "left_semi")
      .join(nearDrop, Seq("doc_id"), "left_anti")
    // the d9 gate, over SURVIVORS of the earlier gates — not the raw
    // corpus: a doc already dropped for quality must not take a good doc
    // down with it (full-corpus containment would), and shingling only the
    // gated slice is proportionally cheaper at any scale. The keep-set
    // checkpoints NARROW (ids only) so the gate stack runs once; survivors
    // re-derive from the cheap columnar scan, never by replaying gates.
    // Drop policy: the CONTAINED side goes (the quote, not the quoting
    // doc); mutual containment keeps the min id, consistent with the
    // exact-dup keeper rule.
    val gatedPre = if (!containment) base else {
      val keepIds = base.select(col("doc_id")).localCheckpoint(true)
      val survivors = docs.join(keepIds, Seq("doc_id"), "left_semi")
      val contDrop = Dedup.containmentPairs(survivors, "doc_id", "text", k = 3,
          maxDf = 4, floor = 0.8)
        .select(when(col("containment_a") >= 0.8 && col("containment_b") >= 0.8,
            greatest(col("id_a"), col("id_b")))
          .when(col("containment_a") >= 0.8, col("id_a"))
          .otherwise(col("id_b")).as("doc_id")).distinct()
      survivors.join(contDrop, Seq("doc_id"), "left_anti")
    }
    // t13's content-fingerprint split, inlined from the same public
    // threshold constants so the gated frame is scanned once instead of
    // re-joined onto itself
    val h = TextAnalysis.hashUnit(TextAnalysis.fingerprint(col("text")), "split")
    val gated = gatedPre
      .withColumn("split",
        when(h < TextAnalysis.SplitTrainUpper, "train")
          .when(h < TextAnalysis.SplitValUpper, "val")
          .otherwise("test"))
      // narrow eager checkpoint (the d6 pattern): the train/eval union
      // below consumes the gated frame TWICE — without materialization
      // each branch replays the whole gate stack (simhash LSH + two
      // corpus explodes), doubling the heaviest work at any scale. Only
      // (doc_id, source, split, n_tokens) is kept; text never re-ships.
      .withColumn("n_tokens", TextAnalysis.wsTokens(col("text")))
      .select(col("doc_id"), col("source"), col("split"), col("n_tokens"))
      .localCheckpoint(true)
    (gated, dw)
  }

  /** DuckDB oracle for [[curationStack]] — same gates, same thresholds;
    * the containment CTEs mirror d9's rare-shingle blocking verbatim. */
  private def curationOracleSql(containment: Boolean): String = {
    import graft.ops.TextAnalysis
    val gateWhere =
      s"""WHERE lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8
         |    AND doc_id IN (SELECT doc_id FROM keepers)
         |    AND doc_id IN (SELECT doc_id FROM rep WHERE NOT repetitive)
         |    AND doc_id IN (SELECT doc_id FROM surp WHERE NOT unusual)
         |    AND doc_id NOT IN (SELECT doc_id FROM near_drop)""".stripMargin
    val gateSelect =
      s"""SELECT doc_id, source, ${TextAnalysis.wsTokensSql("text")} AS n_tokens,
         |    ${TextAnalysis.splitAssignSql("text")} AS split,
         |    ${TextAnalysis.hashUnitSql("doc_id", "budget")} AS h
         |  FROM documents
         |  $gateWhere""".stripMargin
    // containment runs over SURVIVORS of the other gates (pregate), so a
    // quality-dropped doc can't take a good doc down with it; rarity (df)
    // is measured on the surviving corpus too, mirroring the Spark side
    val gatedCte = if (!containment) s"gated AS (\n  $gateSelect)" else
      s"""pregate AS (
         |  $gateSelect),
         |sh AS (
         |  SELECT DISTINCT doc_id, unnest(list_transform(
         |    range(greatest(len(string_split(text, ' ')) - 2, 0)),
         |    i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' '))) AS shingle
         |  FROM documents WHERE len(string_split(text, ' ')) >= 3
         |    AND doc_id IN (SELECT doc_id FROM pregate)),
         |rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= 4),
         |rs AS (SELECT doc_id, shingle FROM sh JOIN rare USING (shingle)),
         |ccands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM rs a JOIN rs b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
         |csizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         |cinter AS (
         |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
         |  FROM ccands c
         |  JOIN sh a ON a.doc_id = c.id_a
         |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2),
         |cont AS (
         |  SELECT id_a, id_b,
         |    round(COALESCE(n_inter, 0) / CAST(sa.n_sh AS DOUBLE), 6) AS ca,
         |    round(COALESCE(n_inter, 0) / CAST(sb.n_sh AS DOUBLE), 6) AS cb
         |  FROM ccands
         |  LEFT JOIN cinter USING (id_a, id_b)
         |  JOIN csizes sa ON sa.doc_id = id_a
         |  JOIN csizes sb ON sb.doc_id = id_b),
         |cont_drop AS (
         |  SELECT DISTINCT CASE
         |    WHEN ca >= 0.8 AND cb >= 0.8 THEN greatest(id_a, id_b)
         |    WHEN ca >= 0.8 THEN id_a ELSE id_b END AS doc_id
         |  FROM cont WHERE ca >= 0.8 OR cb >= 0.8),
         |gated AS (
         |  SELECT * FROM pregate
         |  WHERE doc_id NOT IN (SELECT doc_id FROM cont_drop))""".stripMargin
    s"""WITH ${curationGateCtes(gatedCte)},
       |train AS (
       |  SELECT doc_id, source, split, n_tokens,
       |    CAST(SUM(n_tokens) OVER (ORDER BY h, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM gated WHERE split = 'train')
       |SELECT doc_id, source, split, n_tokens, cum_tokens
       |FROM train WHERE cum_tokens <= 15000
       |UNION ALL
       |SELECT doc_id, source, split, n_tokens, CAST(NULL AS BIGINT) AS cum_tokens
       |FROM gated WHERE split <> 'train'""".stripMargin
  }

  /** The WITH-body through `gated` shared by every curation oracle. */
  private def curationGateCtes(gatedCte: String): String = {
    import graft.ops.TextAnalysis
    s"""$simhash64CtesSql,
       |rep AS (${TextAnalysis.repetitionStatsSql("doc_id", "text", "documents")}),
       |surp AS (${TextAnalysis.unigramSurprisalSql("doc_id", "text", "documents")}),
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id FROM documents
       |  GROUP BY md5(${Normalize.normTextSql("text")})),
       |near_drop AS (SELECT DISTINCT id_b AS doc_id FROM ham WHERE hamming <= 3),
       |$gatedCte""".stripMargin
  }

  /** DuckDB oracle for [[curationStackDsir]]: the c2 gate CTEs + the t23
    * DSIR score chain (d-prefixed names — the gate CTEs own the plain
    * ones) + t29's tier cut restricted to the gated train subset. */
  private def curationDsirOracleSql: String = {
    import graft.ops.TextAnalysis
    val gateSelect =
      s"""SELECT doc_id, source, ${TextAnalysis.wsTokensSql("text")} AS n_tokens,
         |    ${TextAnalysis.splitAssignSql("text")} AS split
         |  FROM documents
         |  WHERE lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8
         |    AND doc_id IN (SELECT doc_id FROM keepers)
         |    AND doc_id IN (SELECT doc_id FROM rep WHERE NOT repetitive)
         |    AND doc_id IN (SELECT doc_id FROM surp WHERE NOT unusual)
         |    AND doc_id NOT IN (SELECT doc_id FROM near_drop)""".stripMargin
    s"""WITH ${curationGateCtes(s"gated AS (\n  $gateSelect)")},
       |${TextAnalysis.dsirModelCtesSql("d",
            s"lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8",
            "documents")},
       |dd AS (
       |  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
       |    round(CAST(SUM(cnt * lam) AS DOUBLE), 6) AS dsir_score
       |  FROM ddb JOIN dlam USING (b) GROUP BY 1),
       |dsel AS (
       |  SELECT g.doc_id, g.source, g.split, g.n_tokens, dd.n_words, dd.dsir_score
       |  FROM gated g JOIN dd USING (doc_id) WHERE g.split = 'train'),
       |dti AS (SELECT dsir_score, CAST(SUM(n_words) AS BIGINT) AS vt
       |        FROM dsel GROUP BY 1),
       |dtt AS (
       |  SELECT dsir_score, vt, CAST(COALESCE(SUM(vt) OVER (
       |    ORDER BY dsir_score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS tier_before
       |  FROM dti),
       |dj AS (
       |  SELECT dsel.*, tier_before, vt FROM dsel JOIN dtt USING (dsir_score)),
       |dbd AS (
       |  SELECT *, SUM(n_words) OVER (PARTITION BY dsir_score
       |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tc
       |  FROM dj WHERE tier_before < 15000 AND tier_before + vt > 15000)
       |SELECT doc_id, source, split, n_tokens, dsir_score, tier_before
       |FROM dj WHERE tier_before + vt <= 15000
       |UNION ALL
       |SELECT doc_id, source, split, n_tokens, dsir_score, tier_before
       |FROM dbd WHERE tier_before + tc <= 15000
       |UNION ALL
       |SELECT doc_id, source, split, n_tokens,
       |  CAST(NULL AS DOUBLE) AS dsir_score, CAST(NULL AS BIGINT) AS tier_before
       |FROM gated WHERE split <> 'train'""".stripMargin
  }

  val qs: Seq[Q] = Seq(

    // D1: exact dedup via normalized-text hash groups.
    Q("d1_exact_dedup",
      (s, d) => Dedup.exactDupGroups(Tables.documents(s, d), "doc_id", "text"),
      Some(s"""SELECT md5(${Normalize.normTextSql("text")}) AS text_hash,
              |MIN(doc_id) AS keeper_id, COUNT(*) AS group_size
              |FROM documents GROUP BY 1""".stripMargin)),

    // D1b: exact dedup with PRIORITY keeper election — on a cross-source
    // dup, keep the copy from the most trusted source family (the mixRates
    // ladder: srcN % 4 == 0 most trusted), id as tiebreak. Same single
    // aggregation as d1; the keeper is a min over a (rank, id) struct.
    Q("d1b_priority_dedup",
      (s, d) => Dedup.exactDupGroupsBy(Tables.documents(s, d), "doc_id", "text",
        expr("CAST(substring(source, 4) AS INT) % 4")),
      Some(s"""WITH h AS (
              |  SELECT doc_id, md5(${Normalize.normTextSql("text")}) AS text_hash,
              |    -- TRY_CAST, not CAST: DuckDB CAST throws on a non-numeric
              |    -- tail where Spark CAST yields NULL — the sentinel must be
              |    -- reachable on both engines
              |    COALESCE(TRY_CAST(substr(source, 4) AS INT) % 4,
              |      9223372036854775807) AS rank FROM documents)
              |SELECT text_hash, doc_id AS keeper_id, group_size FROM (
              |  SELECT text_hash, doc_id,
              |    ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY rank, doc_id) AS rn,
              |    COUNT(*) OVER (PARTITION BY text_hash) AS group_size
              |  FROM h)
              |WHERE rn = 1""".stripMargin)),

    // D2: full MinHash-LSH near-dup pipeline — shingle → 8 minhashes (ONE
    // md5 per shingle: two 32-bit lanes, affine combinations mod a 32-bit
    // prime) → 4 bands of 2 → bucket-join candidates → exact-Jaccard
    // verification.
    Q("d2_minhash_lsh",
      (s, d) => lshVerified(s, d)
        .withColumn("is_dup", col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), col("n_bands"), col("jaccard"), col("is_dup")),
      Some(s"""WITH $lshOracleCtes
              |SELECT c.id_a, c.id_b, c.n_bands,
              |  $jaccardSql AS jaccard,
              |  $jaccardSql >= 0.5 AS is_dup
              |$lshOracleFrom""".stripMargin),
      bench = true),

    // D9: near-CONTAINMENT detection — |A∩B|/|A| and /|B| are asymmetric,
    // so a short doc quoted inside a long one scores high containment at
    // LOW Jaccard. Symmetric minhash-LSH structurally misses that regime
    // (a 10%-Jaccard pair collides on a 2-hash band w.p. ~1%), so
    // candidates come from RARE-SHINGLE BLOCKING instead: any pair sharing
    // a shingle with document frequency <= 4 is verified exactly. A quoted
    // passage shares ALL its shingles with the quoting doc, so one rare
    // shingle anywhere in the quote surfaces the pair; per-shingle fanout
    // is df-capped at 4² pairs, so candidate volume is bounded no matter
    // how large the corpus — the reason common shingles must be excluded.
    Q("d9_containment",
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          k = 3, maxDf = 4, floor = 0.2)
        .withColumn("contained",
          col("containment_a") >= 0.8 || col("containment_b") >= 0.8)
        .select(col("id_a"), col("id_b"), col("n_shared_rare"), col("jaccard"),
          col("containment_a"), col("containment_b"), col("contained")),
      Some(s"""WITH $shinglesCte,
              |rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= 4),
              |rs AS (SELECT doc_id, shingle FROM sh JOIN rare USING (shingle)),
              |cands AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_rare
              |  FROM rs a JOIN rs b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
              |inter AS (
              |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              |  FROM cands c
              |  JOIN sh a ON a.doc_id = c.id_a
              |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              |  GROUP BY 1, 2)
              |SELECT c.id_a, c.id_b, c.n_shared_rare,
              |  $jaccardSql AS jaccard,
              |  round(COALESCE(n_inter, 0) / CAST(sa.n_sh AS DOUBLE), 6) AS containment_a,
              |  round(COALESCE(n_inter, 0) / CAST(sb.n_sh AS DOUBLE), 6) AS containment_b,
              |  (round(COALESCE(n_inter, 0) / CAST(sa.n_sh AS DOUBLE), 6) >= 0.8
              |    OR round(COALESCE(n_inter, 0) / CAST(sb.n_sh AS DOUBLE), 6) >= 0.8)
              |    AS contained
              |$lshOracleFrom
              |WHERE round(COALESCE(n_inter, 0) / CAST(sa.n_sh AS DOUBLE), 6) >= 0.2
              |   OR round(COALESCE(n_inter, 0) / CAST(sb.n_sh AS DOUBLE), 6) >= 0.2""".stripMargin)),

    // D8: incremental near-dup — a delta ingest batch (doc_id % 5 = 0)
    // matched against the already-indexed corpus (the rest). Cross-side
    // band collisions only; in production the corpus subtree is a persisted
    // signature-table scan, so a new batch never re-pays corpus shingling.
    Q("d8_incremental_minhash",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.incrementalNearDup(
            docs.filter(col("doc_id") % 5 === 0),
            docs.filter(col("doc_id") % 5 =!= 0),
            "doc_id", "text", 3, numHashes = 8, bandSize = 2)
          .withColumn("is_dup", col("jaccard") >= 0.5)
          .select(col("id_a"), col("id_b"), col("n_bands"), col("jaccard"), col("is_dup"))
      },
      Some(s"""WITH $shinglesCte,
              |lanes AS (
              |  SELECT doc_id,
              |    ('0x' || substr(h, 1, 8))::BIGINT AS x1,
              |    ('0x' || substr(h, 9, 8))::BIGINT AS x2
              |  FROM (SELECT doc_id, md5(shingle) AS h FROM sh)),
              |mh AS (
              |  SELECT doc_id,
              |${Dedup.minhashMinsSql(8)}
              |  FROM lanes GROUP BY doc_id),
              |bands AS (
              |${(0 until 4).map(b =>
                  s"  SELECT doc_id, $b AS band, CAST(mh_${2 * b} AS VARCHAR) || '|' || CAST(mh_${2 * b + 1} AS VARCHAR) AS sig FROM mh")
                  .mkString("\n  UNION ALL\n")}),
              |cands AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.sig = b.sig
              |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
              |  GROUP BY 1, 2),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
              |inter AS (
              |  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              |  FROM cands c
              |  JOIN sh a ON a.doc_id = c.id_a
              |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
              |  GROUP BY 1, 2)
              |SELECT c.id_a, c.id_b, c.n_bands,
              |  round(COALESCE(n_inter, 0) / CAST(sa.n_sh + sb.n_sh - COALESCE(n_inter, 0) AS DOUBLE), 6) AS jaccard,
              |  round(COALESCE(n_inter, 0) / CAST(sa.n_sh + sb.n_sh - COALESCE(n_inter, 0) AS DOUBLE), 6) >= 0.5 AS is_dup
              |FROM cands c
              |LEFT JOIN inter USING (id_a, id_b)
              |JOIN sizes sa ON sa.doc_id = c.id_a
              |JOIN sizes sb ON sb.doc_id = c.id_b""".stripMargin)),

    // D3: 16-bit SimHash fingerprints (frequency-weighted bit votes).
    Q("d3_simhash",
      (s, d) => Dedup.simhash16(Tables.documents(s, d), "doc_id", "text"),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |votes AS (
             |  SELECT doc_id, i AS bit,
             |    SUM((ascii(substr(md5(tok), i + 1, 1)) % 2) * 2 - 1) AS votes
             |  FROM toks, range(16) t(i) WHERE tok <> '' GROUP BY 1, 2)
             |SELECT doc_id,
             |  CAST(SUM(CASE WHEN votes > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
             |FROM votes GROUP BY doc_id""".stripMargin)),

    // D3b: SimHash collision groups — documents sharing an identical 16-bit
    // fingerprint are dedup candidates (hamming-0 buckets; the planted
    // near-dups collide because a 1-2 token edit rarely flips a bit vote).
    Q("d3b_simhash_groups",
      (s, d) => {
        val sig = Dedup.simhash16(Tables.documents(s, d), "doc_id", "text")
        val w = Window.partitionBy(col("simhash"))
        sig.withColumn("group_size", count(lit(1)).over(w))
          .filter(col("group_size") > 1)
          .select(col("simhash"), col("doc_id"), col("group_size"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |votes AS (
             |  SELECT doc_id, i AS bit,
             |    SUM((ascii(substr(md5(tok), i + 1, 1)) % 2) * 2 - 1) AS votes
             |  FROM toks, range(16) t(i) WHERE tok <> '' GROUP BY 1, 2),
             |sig AS (
             |  SELECT doc_id,
             |    CAST(SUM(CASE WHEN votes > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
             |  FROM votes GROUP BY doc_id)
             |SELECT simhash, doc_id, group_size FROM (
             |  SELECT simhash, doc_id, COUNT(*) OVER (PARTITION BY simhash) AS group_size FROM sig)
             |WHERE group_size > 1""".stripMargin)),

    // D5: 64-bit SimHash near-dup via hamming-banded LSH. The ENGINE uses
    // the Manku '07 6-block/20-table banding (chance collisions n²/2^33,
    // not n²/2^17 — the sf10 probe measured the 4×16 design's 176M
    // candidate pairs for 79k true edges at 500k docs); the ORACLE keeps
    // the 4 × 16-bit band spelling (pigeonhole: hamming <= 3 over 4 bands
    // forces >= 1 identical band). Both generators are lossless and the
    // hamming filter exact, so the hash gate is a CROSS-ALGORITHM
    // completeness check (the gr2 discipline), not a replay.
    Q("d5_simhash64_neardup",
      (s, d) => Dedup.simhash64NearDupManku(Tables.documents(s, d), "doc_id", "text", 3),
      Some(
        s"""WITH $simhash64CtesSql
           |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 3""".stripMargin)),

    // D6: near-dup CLUSTER collapse — the end-product of pairwise dedup.
    // D5's pair graph is closed transitively (connected components via
    // iterative min-label propagation, O(diameter) shuffle rounds) and each
    // cluster elects its minimum doc_id as the canonical keeper. Per-pair
    // drop policies over-drop on chains (A~B, B~C need not drop both B and
    // C's whole neighborhoods); the component view is the policy-complete
    // one. Only docs appearing in >= 1 pair are clustered — the component
    // state is pair-graph-sized, not corpus-sized.
    Q("d6_neardup_clusters",
      (s, d) => {
        import graft.ops.Identity
        val (nodes, edges) = nearDupGraph(s, d)
        // keeper via window-min (not id === comp_id): exactly one keeper per
        // cluster even if label propagation hit maxIter (see semanticDedup)
        val cw = Window.partitionBy(col("comp_id"))
        Identity.connectedComponents(nodes, edges)
          .withColumn("cluster_size", count(lit(1)).over(cw))
          .withColumn("__min_id", min(col("id")).over(cw))
          .select(col("id").as("doc_id"), col("comp_id").as("cluster_id"),
            col("cluster_size"), (col("id") === col("__min_id")).as("is_keeper"))
      },
      Some(
        s"""WITH RECURSIVE $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |uedges AS (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |reach(id, r) AS (
           |  SELECT DISTINCT src, src FROM uedges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN uedges e ON reach.r = e.src),
           |comps AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
           |sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comps GROUP BY 1)
           |SELECT id AS doc_id, cluster_id, cluster_size, id = cluster_id AS is_keeper
           |FROM comps JOIN sized USING (cluster_id)""".stripMargin)),

    // D13: SOFT dedup — down-WEIGHT duplicate clusters instead of dropping
    // them (the sampling-weight form of d6's keep/drop verdict, the public
    // SoftDeDup idea: duplicated content is useful but over-represented, so
    // give every member of a near-dup cluster weight 1/cluster_size and
    // each content unit contributes exactly one doc-mass regardless of copy
    // count; docs outside any cluster keep weight 1). Exact integer ppm
    // floors — the weighted token mass (eff_tokens_ppm) is what the c5
    // soft-curation capstone's UniMax budget mixer consumes in place of
    // n_tokens when dedup is soft rather than hard (see c5_soft_curation
    // below — the end-to-end SoftDeDup recipe).
    // Scale: d6's candidate-sized cluster graph + ONE left join on the doc
    // key; no new corpus pass (n_tokens is the scan-speed whitespace count).
    Q("d13_soft_dedup_weights",
      (s, d) => {
        import graft.ops.{Identity, TextAnalysis}
        val (nodes, edges) = nearDupGraph(s, d)
        val cw = Window.partitionBy(col("comp_id"))
        val clusters = Identity.connectedComponents(nodes, edges)
          .withColumn("cluster_size", count(lit(1)).over(cw))
          .select(col("id").as("doc_id"), col("cluster_size"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            TextAnalysis.wsTokens(col("text")).as("n_tokens"))
          .join(clusters, Seq("doc_id"), "left")
          .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
          .withColumn("weight_ppm",
            expr("CAST(1000000 AS BIGINT) div cluster_size"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("cluster_size"), col("weight_ppm"),
            (col("n_tokens") * col("weight_ppm")).as("eff_tokens_ppm"))
      },
      Some(
        s"""WITH RECURSIVE $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |uedges AS (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |reach(id, r) AS (
           |  SELECT DISTINCT src, src FROM uedges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN uedges e ON reach.r = e.src),
           |comps AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
           |sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comps GROUP BY 1),
           |cl AS (SELECT id AS doc_id, cluster_size
           |       FROM comps JOIN sized USING (cluster_id))
           |SELECT d.doc_id, d.source,
           |  ${graft.ops.TextAnalysis.wsTokensSql("d.text")} AS n_tokens,
           |  CAST(COALESCE(cl.cluster_size, 1) AS BIGINT) AS cluster_size,
           |  CAST(1000000 // COALESCE(cl.cluster_size, 1) AS BIGINT)
           |    AS weight_ppm,
           |  CAST(${graft.ops.TextAnalysis.wsTokensSql("d.text")} *
           |    (1000000 // COALESCE(cl.cluster_size, 1)) AS BIGINT)
           |    AS eff_tokens_ppm
           |FROM documents d LEFT JOIN cl USING (doc_id)""".stripMargin)),

    // C5: SOFT-dedup curation capstone — the public SoftDeDup recipe
    // end-to-end: d13's 1/cluster_size down-weighting feeds the t33 UniMax
    // budget mixer, so the language budget is spent on WEIGHTED token mass
    // (eff_tokens_ppm) instead of raw n_tokens. A language whose volume is
    // inflated by near-dup farms no longer crowds the budget: its duplicated
    // mass counts once, not once per copy — the allocation shifts toward
    // genuinely-diverse languages while every doc (including duplicates)
    // stays eligible for selection. All-integer arithmetic throughout
    // (ppm weights, floor-division allocation, BIGINT prefix sums), so the
    // oracle replays the whole chain — pair graph → components → weights →
    // allocation recurrence → per-language cut — exactly.
    // Scale: d13's candidate-sized cluster graph + one left join; the
    // allocation state is LANGUAGE-count rows (KB, the BPE-table pattern);
    // the cut is the t16/t33 two-level sharded prefix sum, so no language
    // ever gathers on one partition. Budget is in ppm-token units
    // (24k tokens × 1e6), far inside int64.
    Q("c5_soft_curation",
      (s, d) => {
        import graft.ops.{Identity, TextAnalysis}
        val (nodes, edges) = nearDupGraph(s, d)
        val cw = Window.partitionBy(col("comp_id"))
        val clusters = Identity.connectedComponents(nodes, edges)
          .withColumn("cluster_size", count(lit(1)).over(cw))
          .select(col("id").as("doc_id"), col("cluster_size"))
        // checkpointed frontier: the sizes collect and the prefix-sum cut
        // are separate jobs — without it each replays the pair graph + CC
        val weighted = Tables.documents(s, d)
          .filter(col("lang").isNotNull && col("text").isNotNull)
          .select(col("doc_id"), col("lang"),
            TextAnalysis.wsTokens(col("text")).as("n_tokens"))
          .join(clusters, Seq("doc_id"), "left")
          .withColumn("weight_ppm", expr(
            "CAST(1000000 AS BIGINT) div coalesce(cluster_size, CAST(1 AS BIGINT))"))
          .withColumn("eff_tokens_ppm", col("n_tokens") * col("weight_ppm"))
          .drop("cluster_size", "n_tokens")
          .localCheckpoint(true)
        softCurationCut(s, weighted)
      },
      Some(
        s"""WITH RECURSIVE $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |uedges AS (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |reach(id, r) AS (
           |  SELECT DISTINCT src, src FROM uedges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN uedges e ON reach.r = e.src),
           |comps AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
           |sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM comps GROUP BY 1),
           |cl AS (SELECT id AS doc_id, cluster_size
           |       FROM comps JOIN sized USING (cluster_id)),
           |t AS (
           |  SELECT d.doc_id, d.lang,
           |    CAST(1000000 // COALESCE(cl.cluster_size, 1) AS BIGINT)
           |      AS weight_ppm,
           |    CAST(${graft.ops.TextAnalysis.wsTokensSql("d.text")} *
           |      (1000000 // COALESCE(cl.cluster_size, 1)) AS BIGINT)
           |      AS eff_tokens_ppm,
           |    ${graft.ops.TextAnalysis.hashUnitSql("d.doc_id", "softcur")} AS h
           |  FROM documents d LEFT JOIN cl USING (doc_id)
           |  WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
           |sz AS (SELECT lang, SUM(eff_tokens_ppm) AS s FROM t GROUP BY 1),
           |ord AS (
           |  SELECT lang, s,
           |    CAST(row_number() OVER (ORDER BY s, lang) AS BIGINT) AS i,
           |    (SELECT COUNT(*) FROM sz) AS l
           |  FROM sz),
           |alloc AS (
           |  SELECT i, lang, s, l,
           |    least(s * 6 // 5, 24000000000 // l) AS a,
           |    24000000000 - least(s * 6 // 5, 24000000000 // l) AS rem
           |  FROM ord WHERE i = 1
           |  UNION ALL
           |  SELECT o.i, o.lang, o.s, o.l,
           |    least(o.s * 6 // 5, p.rem // (o.l - o.i + 1)),
           |    p.rem - least(o.s * 6 // 5, p.rem // (o.l - o.i + 1))
           |  FROM alloc p JOIN ord o ON o.i = p.i + 1),
           |cum AS (
           |  SELECT doc_id, lang, weight_ppm, eff_tokens_ppm,
           |    CAST(SUM(eff_tokens_ppm) OVER (PARTITION BY lang
           |      ORDER BY h, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_eff_ppm
           |  FROM t)
           |SELECT c.doc_id, c.lang, c.weight_ppm, c.eff_tokens_ppm,
           |  c.cum_eff_ppm, CAST(a.a AS BIGINT) AS lang_budget_ppm,
           |  CASE WHEN a.a = a.s * 6 // 5 THEN 'epoch_cap'
           |       ELSE 'budget_share' END AS alloc_rule
           |FROM cum c JOIN alloc a ON a.lang = c.lang
           |WHERE c.cum_eff_ppm <= a.a""".stripMargin),
      // promoted on landing: second-largest untimed query by 3-rep median
      // (5.41 s at sf0.1) — the promote-the-largest-untimed discipline
      bench = true),

    // GR1: PageRank centrality over the d5 near-dup pair graph (symmetrized)
    // — the canonical-doc-authority signal: inside a duplication cluster the
    // doc most linked-to by near-dups ranks highest (a graph-global keeper
    // signal where d6's min-id keeper is arbitrary). 8 power-iteration
    // rounds in EXACT integer fixed-point (ops/Graph.pageRank), so the
    // oracle replays all 8 rounds in chained CTEs and the ranks hash-match
    // bit-for-bit — the BPE-loop oracle pattern applied to a graph operator.
    Q("gr1_pagerank_neardup",
      (s, d) => {
        val pairs = Dedup.simhash64NearDupManku(Tables.documents(s, d), "doc_id",
          "text", 3).select(col("id_a"), col("id_b"))
        val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        graft.ops.Graph.pageRank(edges, "src", "dst", iters = 8)
          .select(col("node").as("doc_id"), col("rank_e12"))
      },
      Some {
        val rounds = (1 to 8).map { k =>
          val prev = if (k == 1) "r0" else s"r${k - 1}"
          s"""r$k AS (
             |  SELECT nd.node,
             |    150000000000 // nn.n + COALESCE(s.c, CAST(0 AS BIGINT)) AS r
             |  FROM nd CROSS JOIN nn
             |  LEFT JOIN (
             |    SELECT e.dst AS node,
             |      CAST(SUM((p.r * 85) // (100 * d.deg)) AS BIGINT) AS c
             |    FROM $prev p JOIN e ON p.node = e.src
             |    JOIN deg d ON d.src = e.src
             |    GROUP BY 1) s ON s.node = nd.node)""".stripMargin
        }.mkString(",\n")
        s"""WITH $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |e AS (SELECT id_a AS src, id_b AS dst FROM np
           |      UNION ALL SELECT id_b, id_a FROM np),
           |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
           |nd AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
           |nn AS (SELECT COUNT(*) AS n FROM nd),
           |r0 AS (SELECT node, 1000000000000 // n AS r FROM nd CROSS JOIN nn),
           |$rounds
           |SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_e12 FROM r8""".stripMargin
      },
      bench = true),

    // GR2: connected components by LARGE-STAR/SMALL-STAR contraction
    // (Graph.connectedComponentsStar, Kiveris '14) over the same d5
    // near-dup graph d6 clusters by min-label propagation. Propagation is
    // O(diameter) rounds — right for these shallow dup clusters, degenerate
    // on chains; star contraction is O(log n) on ANY topology (GraphSpec:
    // a 256-node path closes in <= 10 rounds where propagation needs 255,
    // and pins equality against union-find AND propagation on random
    // graphs). In-query the labels carry the EDGE-CONSISTENCY verdict —
    // every edge's endpoints share a component (one join, no second CC) —
    // while the oracle independently recomputes the components by recursive
    // transitive closure: the hash gate IS the cross-algorithm check.
    Q("gr2_cc_star",
      (s, d) => {
        import graft.ops.Graph
        val (nodes, edges) = nearDupGraph(s, d)
        val star = Graph.connectedComponentsStar(nodes, edges).localCheckpoint(true)
        val lab = star.select(col("id"), col("comp_id"))
        val badEdges = edges
          .join(lab.toDF("id", "ca"), col("src") === col("id")).drop("id")
          .join(lab.toDF("id", "cb"), col("dst") === col("id")).drop("id")
          .agg(count(when(col("ca") =!= col("cb"), lit(1))).as("n_bad"))
        star.crossJoin(broadcast(badEdges))
          .select(col("id").as("doc_id"), col("comp_id").as("cluster_id"),
            (col("n_bad") === 0 && col("comp_id") <= col("id")).as("edges_consistent"))
      },
      Some(
        s"""WITH RECURSIVE $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |uedges AS (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |reach(id, r) AS (
           |  SELECT DISTINCT src, src FROM uedges
           |  UNION
           |  SELECT reach.id, e.dst FROM reach JOIN uedges e ON reach.r = e.src),
           |comps AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
           |SELECT id AS doc_id, cluster_id, true AS edges_consistent
           |FROM comps""".stripMargin)),

    // GR3: COMMUNITY detection by deterministic synchronous label
    // propagation (Graph.labelPropagation, Raghavan '07) over the same d5
    // near-dup graph — NOT a gr2 duplicate: components merge through ANY
    // bridge, communities CUT weak ones. A near-dup chain a~b~c where a,c
    // are dissimilar is one component (gr2 merges it) but, density
    // permitting, two communities — the over-merge guard transitive
    // closure cannot express. 4 fixed rounds, count-then-min-label
    // tie-break, so the oracle replays every round exactly and the labels
    // hash-match (the gr1 unrolled-rounds pattern). community_size is
    // emitted per row for the volume audit.
    Q("gr3_label_communities",
      (s, d) => {
        import graft.ops.Graph
        val (nodes, edges) = nearDupGraph(s, d)
        val lp = Graph.labelPropagation(nodes, edges, iters = 4)
        val cw = Window.partitionBy(col("community_id"))
        lp.withColumn("community_size", count(lit(1)).over(cw))
          .select(col("id").as("doc_id"), col("community_id"),
            col("community_size"))
      },
      Some {
        // EVERY CTE in the round chain (and the head) is referenced exactly
        // ONCE: DuckDB INLINES a CTE referenced more than once, so a
        // twice-referenced round chain re-expands the whole simhash subtree
        // 2^rounds times. The self-vote row guarantees every node appears
        // in its own vote count, so the per-round pick alone IS the next
        // label set — no LEFT JOIN back to the previous round needed. The
        // pick is a row_number window (cnt DESC, lbl ASC), native integer
        // ordering — matching Spark's min_by(lbl, struct(-cnt, lbl)) on the
        // full signed 64-bit id domain (a printf-encoded composite key
        // would misorder negative ids).
        val rounds = (1 to 4).map { k =>
          val prev = if (k == 1) "l0" else s"l${k - 1}"
          s"""c$k AS (
             |  SELECT e.dst AS nid, pl.lbl, COUNT(*) AS cnt
             |  FROM uedges e JOIN $prev pl ON pl.id = e.src
             |  GROUP BY 1, 2),
             |l$k AS (
             |  SELECT nid AS id, lbl FROM c$k
             |  QUALIFY row_number() OVER (
             |    PARTITION BY nid ORDER BY cnt DESC, lbl) = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |sym AS (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |nd AS (SELECT src AS id FROM sym UNION SELECT dst FROM sym),
           |-- self-vote rows: the deterministic oscillation damper
           |uedges AS (SELECT * FROM sym UNION SELECT id, id FROM nd),
           |l0 AS (SELECT id, id AS lbl FROM nd),
           |$rounds
           |SELECT id AS doc_id, lbl AS community_id,
           |  COUNT(*) OVER (PARTITION BY lbl) AS community_size
           |FROM l4""".stripMargin
      },
      bench = true),

    // GR4: k-core DUP-FARM gate (Graph.kCore, Matula-Beck '83 peeling) over
    // the same d5 near-dup graph — the density policy the other graph views
    // cannot express: components (gr2) merge through ANY bridge, label
    // communities (gr3) partition without measuring density; the 2-core
    // keeps exactly the docs with >= 2 SURVIVING near-dup neighbors, i.e.
    // cyclic/dense duplication (template farms, generated boilerplate)
    // while organic pair/chain duplication peels away. A 12-round peel
    // BUDGET (measured depth: 3 at sf0.1, 7-9 at sf1 — chains lengthen
    // with corpus growth) + an in-query `converged` verdict (final min
    // degree >= k — the fixpoint claim is CHECKED, the gr2 pattern); the
    // Spark side exits early at the fixpoint, which is bit-identical
    // because post-fixpoint rounds are no-ops, and that is exactly why the
    // oracle may replay all 12 unconditionally. Each twice-referenced
    // oracle CTE is pinned MATERIALIZED so DuckDB cannot re-inline the
    // simhash subtree 2^rounds times (the gr3 lesson, other direction:
    // peeling NEEDS two references per round — degree + filter — so
    // materialization, not restructuring, is the fix).
    Q("gr4_kcore_dupfarms",
      (s, d) => {
        import graft.ops.Graph
        val (nodes, edges) = nearDupGraph(s, d)
        Graph.kCore(nodes, edges, k = 2, rounds = 12)
          .select(col("id").as("doc_id"), col("in_core"),
            col("core_degree"), col("converged"))
      },
      Some {
        val k = 2
        val rounds = (1 to 12).map { i =>
          val prev = if (i == 1) "e0" else s"e${i - 1}"
          s"""k$i AS MATERIALIZED (
             |  SELECT src AS id FROM $prev GROUP BY 1 HAVING COUNT(*) >= $k),
             |e$i AS MATERIALIZED (
             |  SELECT e.src, e.dst FROM $prev e
             |  JOIN k$i a ON e.src = a.id JOIN k$i b ON e.dst = b.id)""".stripMargin
        }.mkString(",\n")
        s"""WITH $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |e0 AS MATERIALIZED (
           |  SELECT id_a AS src, id_b AS dst FROM np
           |  UNION SELECT id_b, id_a FROM np),
           |nd AS (SELECT src AS id FROM e0 UNION SELECT dst FROM e0),
           |$rounds,
           |degf AS MATERIALIZED (
           |  SELECT src AS id, COUNT(*) AS core_degree FROM e12 GROUP BY 1),
           |conv AS (
           |  SELECT COALESCE(MIN(core_degree) >= $k, true) AS converged
           |  FROM degf)
           |SELECT n.id AS doc_id, d.id IS NOT NULL AS in_core,
           |  COALESCE(d.core_degree, 0) AS core_degree, c.converged
           |FROM nd n LEFT JOIN degf d ON d.id = n.id CROSS JOIN conv c""".stripMargin
      },
      bench = true),

    // GR6: per-node triangle counts + local clustering coefficient
    // (Graph.triangleCounts, degree-ordered "node iterator++") over the same
    // d5 near-dup graph — the LOCAL density readout the other graph views
    // can't give: gr4's 2-core is a binary gate (in the dense region or
    // not), the clustering coefficient MEASURES each doc's neighborhood
    // closure (1000 = my near-dups are all near-dups of each other — a
    // template clique; 0 = a hub stitching unrelated dups — a boilerplate
    // wrapper). Engine enumerates wedges ONLY at each triangle's lowest
    // (degree, id)-rank corner (per-vertex out-degree O(√m), hubs
    // contribute zero wedges), closed by one semi-join; the oracle counts
    // the identical triangle set by the plain a<b<c triple join — the hash
    // gate is a cross-algorithm check (the gr2 discipline).
    Q("gr6_triangle_count",
      (s, d) => {
        import graft.ops.Graph
        val (nodes, edges) = nearDupGraph(s, d)
        Graph.triangleCounts(nodes, edges)
          .select(col("id").as("doc_id"), col("degree"),
            col("n_triangles"), col("clustering_milli"))
      },
      Some(
        s"""WITH $simhash64CtesSql,
           |np AS (SELECT id_a, id_b FROM ham WHERE hamming <= 3),
           |ue AS (
           |  SELECT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b
           |  FROM np WHERE id_a <> id_b GROUP BY 1, 2),
           |nd AS (SELECT a AS id FROM ue UNION SELECT b FROM ue),
           |deg AS (
           |  SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
           |  FROM (SELECT a AS id FROM ue UNION ALL SELECT b FROM ue)
           |  GROUP BY 1),
           |tri AS (
           |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM ue e1 JOIN ue e2 ON e2.a = e1.b
           |  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b),
           |tn AS (
           |  SELECT id, CAST(COUNT(*) AS BIGINT) AS t
           |  FROM (SELECT x AS id FROM tri
           |        UNION ALL SELECT y FROM tri
           |        UNION ALL SELECT z FROM tri)
           |  GROUP BY 1)
           |SELECT n.id AS doc_id, d.degree,
           |  COALESCE(tn.t, 0) AS n_triangles,
           |  CASE WHEN d.degree >= 2
           |    THEN (2000 * COALESCE(tn.t, 0)) // (d.degree * (d.degree - 1))
           |    ELSE 0 END AS clustering_milli
           |FROM nd n JOIN deg d USING (id) LEFT JOIN tn USING (id)""".stripMargin),
      bench = true),

    // C1: end-to-end corpus curation — the LLM-training-data pipeline as ONE
    // declared plan: language gate → quality gate → exact-dedup keeper →
    // simhash near-dup removal (keep the lower id) → per-source token budget
    // (running sum window; per-source, never a global single-partition
    // window). Composes the d1/d5/t2/t3 operators.
    Q("c1_corpus_curation",
      (s, d) => {
        import graft.ops.TextAnalysis
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val keepers = Dedup.exactDupGroups(docs, "doc_id", "text")
          .select(col("keeper_id").as("doc_id"))
        val nearDrop = Dedup.simhash64NearDupManku(docs, "doc_id", "text", 3)
          .select(col("id_b").as("doc_id")).distinct()
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.filter(col("lang") === "en" && TextAnalysis.qualityScore("text") >= 0.8)
          .join(keepers, Seq("doc_id"), "left_semi")
          .join(nearDrop, Seq("doc_id"), "left_anti")
          .withColumn("tok", TextAnalysis.wsTokens(col("text")))
          .withColumn("cum_tok", sum(col("tok")).over(w))
          .filter(col("cum_tok") <= 3000)
          .select(col("doc_id"), col("source"), col("tok"), col("cum_tok"))
      },
      Some {
        import graft.ops.TextAnalysis
        s"""WITH $simhash64CtesSql,
           |keepers AS (
           |  SELECT MIN(doc_id) AS doc_id FROM documents
           |  GROUP BY md5(${Normalize.normTextSql("text")})),
           |near_drop AS (SELECT DISTINCT id_b AS doc_id FROM ham WHERE hamming <= 3),
           |eligible AS (
           |  SELECT doc_id, source, ${TextAnalysis.wsTokensSql("text")} AS tok
           |  FROM documents
           |  WHERE lang = 'en' AND ${TextAnalysis.qualityScoreSql("text")} >= 0.8
           |    AND doc_id IN (SELECT doc_id FROM keepers)
           |    AND doc_id NOT IN (SELECT doc_id FROM near_drop))
           |SELECT doc_id, source, tok,
           |  CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
           |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
           |FROM eligible
           |QUALIFY cum_tok <= 3000""".stripMargin
      }),

    // C2: curation v2 — the full training-data gate stack as ONE declared
    // plan: language → quality (t2) → repetition head-concentration (t12) →
    // unigram-surprisal LM band (t15) → exact-dup keeper (d1) → simhash64
    // near-dup drop (d5) → leakage-safe content-fingerprint split (t13) →
    // deterministic-shuffle GLOBAL token budget over the train split (t16).
    // Each gate is corpus-derived (repetition/surprisal stats over the whole
    // table) but applied per-row via semi-joins on the narrow doc_id key —
    // the wide text column never re-shuffles. Val/test docs bypass the
    // budget (cum_tokens NULL): the budget shapes what we TRAIN on, the
    // eval sets stay complete.
    Q("c2_curation_v2", (s, d) => curationStack(s, d, containment = false),
      Some(curationOracleSql(containment = false)), bench = true),

    // C3: curation v3 — c2's stack PLUS the d9 containment gate: a doc
    // whose shingles are >= 80% contained in another (quoted passages,
    // boilerplate wrappers) is the dominant residual dup class in web
    // corpora that symmetric near-dup (Jaccard) structurally misses — a
    // quote inside a 10x-longer doc sits at ~9% Jaccard but 100%
    // containment. Rare-shingle blocking keeps candidate volume df-capped
    // at any corpus size (the d9 scale argument).
    Q("c3_curation_containment", (s, d) => curationStack(s, d, containment = true),
      Some(curationOracleSql(containment = true)), bench = true),

    // C4: curation with IMPORTANCE-bought training tokens — c2's gate
    // stack, but the 15k-token train budget is spent on the highest
    // DSIR-scoring survivors (t29's tier cut over the gated train subset)
    // instead of a deterministic-random sample (t16). The round-6 ml/
    // selection pieces composed into the flagship: gates decide what is
    // CLEAN, importance decides what is WORTH the budget. Eval splits
    // bypass selection (NULL score) — budgets shape training, never eval.
    Q("c4_curation_dsir", (s, d) => curationStackDsir(s, d),
      Some(curationDsirOracleSql), bench = true),

    // D4: n-gram Jaccard near-dup, blocked by source (all within-block pairs,
    // exact — the non-LSH comparison point).
    Q("d4_ngram_jaccard",
      (s, d) => {
        val ds = Dedup.shingles(
          Tables.documents(s, d).withColumn("doc_src", col("source")), "doc_id", "text", 3)
          .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        val a = ds.toDF("id_a", "sa_shingle", "src_a")
        val b = ds.toDF("id_b", "sb_shingle", "src_b")
        val sizes = ds.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
        val inter = a.join(b, col("src_a") === col("src_b") &&
            col("sa_shingle") === col("sb_shingle") && col("id_a") < col("id_b"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.toDF("ja", "n_a"), col("id_a") === col("ja"))
          .join(sizes.toDF("jb", "n_b"), col("id_b") === col("jb"))
          .withColumn("jaccard", round(col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6))
          .filter(col("jaccard") >= 0.3)
          .select(col("id_a"), col("id_b"), col("jaccard"))
      },
      Some(s"""WITH $shinglesCte,
              |ds AS (
              |  SELECT sh.doc_id, shingle, source FROM sh
              |  JOIN documents USING (doc_id)),
              |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM ds GROUP BY 1),
              |inter AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
              |  FROM ds a JOIN ds b
              |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT id_a, id_b,
              |  round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) AS jaccard
              |FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
              |WHERE round(n_inter / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE), 6) >= 0.3""".stripMargin)),

    // D10: EXACT all-pairs Jaccard join via lossless prefix filtering
    // (Dedup.prefixJaccardPairs — AllPairs, Bayardo '07) over d2's 3-gram
    // shingle universe. The guarantee d2's MinHash-LSH cannot give: EVERY
    // pair with shingle-set J >= 0.5 is found (LSH misses a qualifying pair
    // whenever it collides on no band), and every emitted pair is exactly
    // verified, yet no O(n²) comparison — candidates only where PREFIXES
    // (the rarest n - ceil(τn) + 1 shingles under the global (df, shingle)
    // order) intersect, pre-pruned by the τ·|a| <= |b| <= |a|/τ size
    // filter. OpsSpec pins completeness against the brute-force quadratic.
    Q("d10_prefix_jaccard",
      (s, d) => Dedup.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          1, 2, shingleK = 3)
        .select(col("id_a"), col("id_b"), col("n_inter"),
          col("n_a"), col("n_b"), col("jaccard")),
      Some(s"""WITH $shinglesCte,
             |sz AS (SELECT doc_id, COUNT(*) AS n_tok FROM sh GROUP BY 1),
             |dfq AS (SELECT shingle, COUNT(*) AS dfq FROM sh GROUP BY 1),
             |rnk AS (SELECT t.doc_id, t.shingle,
             |    row_number() OVER (PARTITION BY t.doc_id
             |                       ORDER BY f.dfq, t.shingle) AS rn
             |  FROM sh t JOIN dfq f ON t.shingle = f.shingle),
             |pref AS (SELECT r.doc_id, r.shingle, s.n_tok, r.rn
             |  FROM rnk r JOIN sz s ON r.doc_id = s.doc_id
             |  WHERE r.rn <= s.n_tok - (s.n_tok * 1 + 1) // 2 + 1),
             |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM pref a JOIN pref b
             |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             |  WHERE b.n_tok * 2 >= a.n_tok * 1 AND a.n_tok * 2 >= b.n_tok * 1
             |    AND least(a.n_tok - a.rn, b.n_tok - b.rn) + 1
             |        >= ((a.n_tok + b.n_tok) * 1 + 2) // 3),
             |inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
             |  FROM cand c
             |  JOIN sh ta ON ta.doc_id = c.id_a
             |  JOIN sh tb ON tb.doc_id = c.id_b AND tb.shingle = ta.shingle
             |  GROUP BY 1, 2)
             |SELECT c.id_a, c.id_b, i.n_inter, sa.n_tok AS n_a, sb.n_tok AS n_b,
             |  round(i.n_inter / CAST(sa.n_tok + sb.n_tok - i.n_inter AS DOUBLE), 6)
             |    AS jaccard
             |FROM cand c
             |JOIN inter i ON c.id_a = i.id_a AND c.id_b = i.id_b
             |JOIN sz sa ON sa.doc_id = c.id_a
             |JOIN sz sb ON sb.doc_id = c.id_b
             |WHERE i.n_inter * 2 >= (sa.n_tok + sb.n_tok - i.n_inter) * 1""".stripMargin),
      bench = true),

    // D11: EXACT all-pairs tf-idf COSINE similarity join (the WEIGHTED
    // complement of d10's set-Jaccard AllPairs — Bayardo '07's primary
    // target): shared RARE terms score higher, the boilerplate-robust
    // near-dup signal. Spark prunes with the lossless norm-bound prefix
    // filter over the 3-gram term universe (the d10 lesson, re-measured:
    // the unigram universe leaves candidates ~= all pairs on this corpus
    // because its unigram-cosine body sits just below tau); the ORACLE is
    // an independent
    // BRUTE FORCE over all term-sharing pairs — the hash gate IS the
    // cross-algorithm completeness check (the gr2 discipline), stronger
    // than d10's filter-replay oracle. All-integer milli-weights ⇒ exact
    // dot/norm arithmetic ⇒ full hash gate.
    Q("d11_cosine_allpairs",
      (s, d) => Dedup.cosinePrefixPairs(Tables.documents(s, d),
        "doc_id", "text", tauNum = 3, tauDen = 5, shingleK = 3),
      Some("""WITH de AS (SELECT doc_id, text FROM documents),
             |toks AS (SELECT doc_id, unnest(list_transform(
             |    range(greatest(len(string_split(text, ' ')) - 2, 0)),
             |    i -> array_to_string(string_split(text, ' ')[i + 1:i + 3], ' ')))
             |    AS word
             |  FROM de),
             |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tfc
             |  FROM toks WHERE word <> '' GROUP BY 1, 2),
             |dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS dfq
             |  FROM tf GROUP BY 1),
             |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM de),
             |wp AS (SELECT doc_id, word, wi FROM (
             |    SELECT doc_id, word, tfc * CAST(round(ln(
             |        CAST(n_docs AS DOUBLE) / CAST(dfq AS DOUBLE)) * 1000, 0)
             |        AS BIGINT) AS wi
             |    FROM tf JOIN dfq USING (word) CROSS JOIN n)
             |  WHERE wi > 0),
             |n2 AS (SELECT doc_id, CAST(SUM(wi * wi) AS BIGINT) AS n2
             |  FROM wp GROUP BY 1),
             |dots AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    CAST(SUM(a.wi * b.wi) AS BIGINT) AS dot
             |  FROM wp a JOIN wp b
             |    ON a.word = b.word AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d.id_a, d.id_b, d.dot, na.n2 AS n2_a, nb.n2 AS n2_b,
             |  round(CAST(d.dot AS DOUBLE) /
             |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
             |    AS cosine
             |FROM dots d
             |JOIN n2 na ON na.doc_id = d.id_a
             |JOIN n2 nb ON nb.doc_id = d.id_b
             |WHERE CAST(d.dot AS HUGEINT) * d.dot * 25
             |  >= CAST(na.n2 AS HUGEINT) * nb.n2 * 9""".stripMargin),
      bench = true),

    // D12: cross-source contamination matrix — the CORPUS-granularity
    // overlap question (which sources share content with which: benchmark
    // contamination between splits, syndication between crawls) next to
    // the d-family's doc-pair question. The self-join fans out by SOURCE
    // occupancy per shingle (a fixed small domain), never by doc count —
    // pair volume <= S²·vocab at any corpus size; the matrix is S(S-1)/2
    // rows. Exact integer ppm ratios ⇒ full hash gate.
    Q("d12_source_overlap",
      (s, d) => Dedup.sourceOverlap(Tables.documents(s, d),
        "source", "text", k = 3, floorPpm = 100000L),
      Some("""WITH sh AS (
             |  SELECT DISTINCT source, unnest(list_transform(
             |    range(greatest(len(string_split(text, ' ')) - 2, 0)),
             |    i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')))
             |    AS shingle
             |  FROM documents WHERE len(string_split(text, ' ')) >= 3),
             |tot AS (
             |  SELECT d.source, CAST(COALESCE(t.n_sh, 0) AS BIGINT) AS n_sh
             |  FROM (SELECT DISTINCT source FROM documents) d
             |  LEFT JOIN (SELECT source, COUNT(*) AS n_sh FROM sh
             |             GROUP BY 1) t USING (source)),
             |inter AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    CAST(COUNT(*) AS BIGINT) AS n_inter
             |  FROM sh a JOIN sh b
             |    ON a.shingle = b.shingle AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT ta.source AS src_a, tb.source AS src_b,
             |  ta.n_sh AS n_a, tb.n_sh AS n_b,
             |  COALESCE(n_inter, 0) AS n_inter,
             |  CASE WHEN ta.n_sh + tb.n_sh - COALESCE(n_inter, 0) = 0
             |    THEN CAST(0 AS BIGINT)
             |    ELSE (1000000 * COALESCE(n_inter, 0))
             |      // (ta.n_sh + tb.n_sh - COALESCE(n_inter, 0)) END
             |    AS jaccard_ppm,
             |  CASE WHEN least(ta.n_sh, tb.n_sh) = 0 THEN CAST(0 AS BIGINT)
             |    ELSE (1000000 * COALESCE(n_inter, 0))
             |      // least(ta.n_sh, tb.n_sh) END AS containment_ppm,
             |  CASE WHEN least(ta.n_sh, tb.n_sh) = 0 THEN FALSE
             |    ELSE (1000000 * COALESCE(n_inter, 0))
             |      // least(ta.n_sh, tb.n_sh) >= 100000 END AS contaminated
             |FROM tot ta JOIN tot tb ON ta.source < tb.source
             |LEFT JOIN inter ON src_a = ta.source AND src_b = tb.source"""
        .stripMargin),
      bench = true)
  )
}
