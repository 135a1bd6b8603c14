package graft.queries

import graft.core.Tables
import graft.ops.SimilaritySearch
import org.apache.spark.sql.functions._

/** Embedding similarity search over `embeddings` (BASELINE north star ops).
  * Fixed-order double dot products make cosine values engine-identical
  * (see dotSql below for why decimal casts are NOT). */
object SimilarityQs {

  // Oracle-side ascending-index DOUBLE dot product of two list<float>
  // expressions, mirroring SimilaritySearch.dotExpr (plans.FloatDot).
  // float→double widening is exact on both engines and the in-order SUM over
  // range() reproduces FloatDot's fold order, so every intermediate double is
  // bit-identical — unlike float→DECIMAL casts, whose scaling arithmetic is
  // engine-specific (DuckDB scales in float, Spark rounds the widened
  // double; measured divergent on 46/64 elements of a real vector pair).
  // DuckDB 1.0's range() only accepts constants, so the testdata's fixed
  // dimensionality (64 at every sf) is inlined; the Spark side stays
  // dimension-agnostic.
  private val dim = 64

  private def dotSql(a: String, b: String): String =
    s"""(SELECT SUM(CAST($a[i + 1] AS DOUBLE) * CAST($b[i + 1] AS DOUBLE))
       |  FROM range($dim) t(i))""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""round(${dotSql(a, b)} /
       |  (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)""".stripMargin

  /** Recall VERDICT for ANN paths whose probe structure is not
    * SQL-expressible (learned centroids, PQ codebooks): the query computes
    * approx AND exact top-k in one plan, emits how it did against the
    * contract — n_results must equal k and the exact-overlap must reach
    * `minHit` — and the oracle asserts the contract holds. The driver's
    * hash gate then machine-checks the recall floor instead of recording a
    * rows-only result. Both 1-row sides meet in a 1×1 cross join
    * (nljByDesign). The exact side is the verification harness, not the
    * scale path. */
  private def recallVerdict(approx: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame, k: Int, minHit: Int)
      : org.apache.spark.sql.DataFrame = {
    val hit = exact.select(col("vec_id"))
      .join(approx.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
    val n = approx.agg(count(lit(1)).as("n_results"))
    hit.crossJoin(n).select(lit(k.toLong).as("k"), col("n_results"),
      lit(minHit.toLong).as("min_hit"),
      (col("n_hit") >= minHit && col("n_results") === k).as("recall_ok"))
  }

  private def recallVerdictSql(k: Int, minHit: Int): String =
    s"SELECT CAST($k AS BIGINT) AS k, CAST($k AS BIGINT) AS n_results, " +
      s"CAST($minHit AS BIGINT) AS min_hit, true AS recall_ok"

  // Shared CTE block (sig, cand) for every SRP-LSH oracle: the SAME
  // hyperplane numerators SimilaritySearch uses, spelled as exact (k/1024.0)
  // list literals; in-order SUM over range() reproduces float_dot's fold, so
  // every sign bit matches the Spark plan.
  private def planeDot(p: IndexedSeq[Int]): String = {
    val lit = p.map(k => s"($k/1024.0)").mkString("[", ", ", "]")
    s"(SELECT SUM(CAST(embedding[i + 1] AS DOUBLE) * ($lit)[i + 1]) FROM range($dim) t(i))"
  }

  /** One SRP band value as a SQL expression (bits sign-projections packed
    * into an int) — band `b` of the (bands, bits) family. */
  private def srpBandSql(bands: Int, bits: Int, b: Int): String = {
    val h = graft.ops.SimilaritySearch.srpNumerators(bands * bits, dim)
    (0 until bits).map(j =>
      s"(CASE WHEN ${planeDot(h(b * bits + j))} > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString("    (", " + ", ")")
  }

  /** Shared k11/k12 oracle chain: per-cell integer-quantized (1/1024 grid)
    * centroid SUM vectors and each member's exact-integer cosine to its own
    * centroid, ending in CTE `cs` (vec_id, label, cos_centroid). One copy so
    * the grid constant / rounding / zero-norm guard cannot drift between
    * the two hash gates (both mirror SimilaritySearch.quantizedCentroidScores). */
  private def centroidCosCtes: String =
    s"""q AS (
       |  SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cpos AS (
       |  SELECT label, i AS pos, CAST(SUM(qv[i + 1]) AS BIGINT) AS s
       |  FROM q, range($dim) t(i) GROUP BY 1, 2),
       |cent AS (SELECT label, list(s ORDER BY pos) AS c FROM cpos GROUP BY 1),
       |sc AS (
       |  SELECT vec_id, q.label AS label,
       |    CAST((SELECT SUM(qv[i + 1] * c[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS dot,
       |    CAST((SELECT SUM(qv[i + 1] * qv[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS nv,
       |    CAST((SELECT SUM(c[i + 1] * c[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS nc
       |  FROM q JOIN cent USING (label)),
       |cs AS (
       |  SELECT vec_id, label,
       |    CASE WHEN nv = 0 OR nc = 0 THEN 0.0
       |      ELSE round(CAST(dot AS DOUBLE) /
       |        (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))), 6)
       |    END AS cos_centroid
       |  FROM sc)""".stripMargin

  private def srpSigCte(bands: Int, bits: Int): String = {
    val bandCols = (0 until bands).map { b =>
      s"${srpBandSql(bands, bits, b)} AS b$b"
    }.mkString(",\n")
    s"""sig AS (
       |  SELECT vec_id,
       |$bandCols
       |  FROM embeddings)""".stripMargin
  }

  private def srpCandCtes(bands: Int, bits: Int): String = {
    val bandJoins = (0 until bands).map(k =>
      s"    SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM sig a JOIN sig b ON a.b$k = b.b$k AND a.vec_id < b.vec_id")
      .mkString("\n    UNION ALL\n")
    s"""${srpSigCte(bands, bits)},
       |cand AS (
       |  SELECT id_a, id_b, COUNT(*) AS n_bands FROM (
       |$bandJoins)
       |  GROUP BY 1, 2)""".stripMargin
  }

  private def srpOracle(bands: Int, bits: Int, threshold: Double): String =
    s"""WITH ${srpCandCtes(bands, bits)}
       |SELECT id_a, id_b, n_bands, ${cosSql("a.embedding", "b.embedding")} AS cos_sim
       |FROM cand JOIN embeddings a ON a.vec_id = id_a JOIN embeddings b ON b.vec_id = id_b
       |WHERE ${cosSql("a.embedding", "b.embedding")} >= $threshold""".stripMargin

  val qs: Seq[Q] = Seq(

    // K1: brute-force exact top-10 cosine neighbors of vec_id 0 — the
    // correctness baseline every ANN variant is judged against.
    Q("k1_knn_bruteforce",
      (s, d) => SimilaritySearch.topKNeighbors(
        Tables.embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 10),
      Some(s"""WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
              |scored AS (
              |  SELECT vec_id, ${cosSql("embedding", "q_vec")} AS cos_sim
              |  FROM embeddings, q WHERE vec_id <> 0)
              |SELECT vec_id, cos_sim,
              |  CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
              |FROM scored
              |QUALIFY row_number() OVER (ORDER BY cos_sim DESC, vec_id) <= 10""".stripMargin),
      bench = true),

    // K9: SQ8 scalar-quantized ANN (faiss QT_8bit pattern) — top-10 by
    // approximate cosine over per-vector symmetric int8 codes. The scales
    // cancel out of the cosine, every dot is exact integer arithmetic, so
    // the whole path is oracle-REPLICATED (full hash gate), not verdict-
    // gated like the learned-codebook paths: quantization is deterministic
    // arithmetic both engines can run.
    Q("k9_sq8_ann",
      (s, d) => SimilaritySearch.topKNeighborsSq8(
        Tables.embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 10),
      Some(s"""WITH sc AS (
              |  SELECT vec_id, embedding,
              |    list_max(list_transform(embedding,
              |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
              |  FROM embeddings),
              |codes AS (
              |  SELECT vec_id,
              |    CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
              |         ELSE list_transform(embedding,
              |           x -> round(CAST(x AS DOUBLE) / s, 0)) END AS qv
              |  FROM sc),
              |q AS (SELECT qv AS q_qv FROM codes WHERE vec_id = 0),
              |scored AS (
              |  SELECT vec_id, round(
              |    (SELECT SUM(qv[i + 1] * q_qv[i + 1]) FROM range($dim) t(i)) /
              |    (sqrt((SELECT SUM(qv[i + 1] * qv[i + 1]) FROM range($dim) t(i))) *
              |     sqrt((SELECT SUM(q_qv[i + 1] * q_qv[i + 1]) FROM range($dim) t(i)))),
              |    6) AS sq8_cos
              |  FROM codes, q WHERE vec_id <> 0)
              |SELECT vec_id, sq8_cos,
              |  CAST(row_number() OVER (ORDER BY sq8_cos DESC, vec_id) AS BIGINT) AS rank
              |FROM scored
              |QUALIFY row_number() OVER (ORDER BY sq8_cos DESC, vec_id) <= 10""".stripMargin)),

    // K10: IVF × SQ8 — the faiss workhorse composition: the coarse cell
    // prunes the scan (k2's shape), the int8 codes price the scoring
    // (k9's). Both halves are deterministic arithmetic, so the composed
    // path keeps the full hash gate.
    Q("k10_sq8_ivf",
      (s, d) => SimilaritySearch.topKNeighborsSq8(
        Tables.embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 5,
        bucketCol = Some("label")),
      Some(s"""WITH sc AS (
              |  SELECT vec_id, label, embedding,
              |    list_max(list_transform(embedding,
              |      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
              |  FROM embeddings),
              |codes AS (
              |  SELECT vec_id, label,
              |    CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS DOUBLE))
              |         ELSE list_transform(embedding,
              |           x -> round(CAST(x AS DOUBLE) / s, 0)) END AS qv
              |  FROM sc),
              |q AS (SELECT qv AS q_qv, label AS q_label FROM codes WHERE vec_id = 0),
              |scored AS (
              |  SELECT vec_id, round(
              |    (SELECT SUM(qv[i + 1] * q_qv[i + 1]) FROM range($dim) t(i)) /
              |    (sqrt((SELECT SUM(qv[i + 1] * qv[i + 1]) FROM range($dim) t(i))) *
              |     sqrt((SELECT SUM(q_qv[i + 1] * q_qv[i + 1]) FROM range($dim) t(i)))),
              |    6) AS sq8_cos
              |  FROM codes, q WHERE vec_id <> 0 AND label = q_label)
              |SELECT vec_id, sq8_cos,
              |  CAST(row_number() OVER (ORDER BY sq8_cos DESC, vec_id) AS BIGINT) AS rank
              |FROM scored
              |QUALIFY row_number() OVER (ORDER BY sq8_cos DESC, vec_id) <= 5""".stripMargin)),

    // K11: per-cell embedding outliers — flag vectors whose cosine to
    // their own cell centroid sits at or below the cell's exact 5th
    // percentile (mislabeled docs / encoder failures / adversarial
    // inputs). Scoring runs in floor-quantized INTEGER space against the
    // cell component-SUM vector (same cosine as the mean — 1/n cancels),
    // so every dot/norm is an exact order-free BIGINT sum and the full
    // hash gate applies; the cut uses the a17 histogram rank-pick, never
    // a per-cell sort.
    Q("k11_embedding_outliers",
      (s, d) => SimilaritySearch.centroidOutliers(
        Tables.embeddings(s, d), "vec_id", "embedding", "label"),
      Some(s"""WITH ${centroidCosCtes},
              |p AS (
              |  SELECT label, percentile_disc(0.05) WITHIN GROUP (ORDER BY cos_centroid) AS p05
              |  FROM cs GROUP BY 1)
              |SELECT vec_id, label, cos_centroid, p05,
              |  cos_centroid <= p05 AS is_outlier
              |FROM cs JOIN p USING (label)""".stripMargin),
      bench = true),

    // K12: cluster-quality report (Davies–Bouldin-style read) — per cell:
    // cohesion (mean member cosine to own centroid) vs separation (cosine
    // to the nearest OTHER centroid), `coherent` when members hug their
    // center tighter than the closest rival. Same integer-exact centroid
    // frame as k11 ⇒ full hash gate; separation is an L×L centroid
    // self-pairing (L = 10 cells), never corpus-sized.
    Q("k12_cluster_quality",
      (s, d) => SimilaritySearch.clusterQuality(
        Tables.embeddings(s, d), "vec_id", "embedding", "label"),
      Some(s"""WITH ${centroidCosCtes},
              |coh0 AS (
              |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(SUM(CAST(cos_centroid AS DECIMAL(18,6))) * 1000000
              |      AS BIGINT) AS s6
              |  FROM cs GROUP BY 1),
              |coh AS (
              |  SELECT label, n,
              |    CAST(CASE WHEN s6 < 0
              |      THEN -((2 * (-s6) + n) // (2 * n))
              |      ELSE (2 * s6 + n) // (2 * n) END AS DOUBLE) / 1000000.0
              |      AS mean_cos
              |  FROM coh0),
              |cc AS (
              |  SELECT a.label AS la, b.label AS lb,
              |    CAST((SELECT SUM(a.c[i + 1] * b.c[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS d,
              |    CAST((SELECT SUM(a.c[i + 1] * a.c[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS na,
              |    CAST((SELECT SUM(b.c[i + 1] * b.c[i + 1]) FROM range($dim) t(i)) AS BIGINT) AS nb
              |  FROM cent a JOIN cent b ON a.label <> b.label),
              |sep AS (
              |  SELECT la, lb, CASE WHEN na = 0 OR nb = 0 THEN 0.0
              |    ELSE round(CAST(d AS DOUBLE) /
              |      (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))), 6) END AS sp
              |  FROM cc),
              |nearest AS (
              |  SELECT la AS label, lb AS nearest_cell, sp AS centroid_sep
              |  FROM sep
              |  QUALIFY row_number() OVER (PARTITION BY la ORDER BY sp DESC, lb) = 1)
              |SELECT coh.label AS label, n, mean_cos, nearest_cell, centroid_sep,
              |  centroid_sep IS NULL OR mean_cos > centroid_sep AS coherent
              |FROM coh LEFT JOIN nearest ON coh.label = nearest.label""".stripMargin)),

    // K2: partition-pruned ANN — search only the query's coarse bucket
    // (label = stand-in IVF cell). The scan shrinks by the bucket count; on a
    // cluster the bucket is the partition-pruning key.
    Q("k2_knn_ivf_bucket",
      (s, d) => SimilaritySearch.topKNeighbors(
        Tables.embeddings(s, d), "vec_id", "embedding", queryId = 0L, k = 5,
        bucketCol = Some("label")),
      Some(s"""WITH q AS (SELECT embedding AS q_vec, label AS q_label FROM embeddings WHERE vec_id = 0),
              |scored AS (
              |  SELECT vec_id, ${cosSql("embedding", "q_vec")} AS cos_sim
              |  FROM embeddings, q WHERE vec_id <> 0 AND label = q_label)
              |SELECT vec_id, cos_sim,
              |  CAST(row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
              |FROM scored
              |QUALIFY row_number() OVER (ORDER BY cos_sim DESC, vec_id) <= 5""".stripMargin)),

    // K2b: true IVF search — rank coarse cells by centroid cosine, probe
    // the top 2, brute-force only inside them (O(N·nprobe/cells) scan).
    // The centroid means divide decimals, and decimal-division rounding
    // rules differ between engines, so the IVF VALUES aren't DuckDB-
    // portable; the query instead emits the operator's STRUCTURAL verdict:
    // its result must EQUAL the exact top-k restricted to the probed
    // cells, at every rank. That contract holds at any scale factor for a
    // correct implementation — unlike a recall-vs-global floor, which is a
    // property of the cell partition (the testdata's `label` cells are
    // geometry-arbitrary, so global recall belongs to k2c, whose LEARNED
    // cells earn it).
    Q("k2b_knn_ivf_centroid",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val ivf = SimilaritySearch.topKNeighborsIvf(emb, "vec_id", "embedding",
          "label", queryId = 0L, k = 5, nprobe = 2)
        val probed = SimilaritySearch.probedBuckets(emb, "vec_id", "embedding",
          "label", queryId = 0L, nprobe = 2)
        val restricted = emb.filter(col("vec_id") === 0L).unionByName(
          emb.filter(col("vec_id") =!= 0L).join(broadcast(probed),
            col("label") === col("__probe_bucket"), "left_semi"))
        val exact = SimilaritySearch.topKNeighbors(restricted, "vec_id",
          "embedding", queryId = 0L, k = 5)
        val a = ivf.select(col("vec_id"), col("rank"))
        val b = exact.select(col("vec_id"), col("rank"))
        val extra = a.exceptAll(b).agg(count(lit(1)).as("n_extra"))
        val missing = b.exceptAll(a).agg(count(lit(1)).as("n_missing"))
        val n = ivf.agg(count(lit(1)).as("n_results"))
        n.crossJoin(extra).crossJoin(missing)
          .select(lit(5L).as("k"), col("n_results"),
            (col("n_extra") === 0 && col("n_missing") === 0 &&
              col("n_results") === 5).as("restricted_exact"))
      },
      Some("SELECT CAST(5 AS BIGINT) AS k, CAST(5 AS BIGINT) AS n_results, " +
        "true AS restricted_exact")),

    // K2c: IVF over LEARNED cells — deterministic k-means coarse quantizer
    // (exact-decimal centroid means, id-tie-broken assignment) feeding the
    // centroid-probed search. Same recall-verdict gate as k2b (same
    // decimal-division portability reason); IvfSpec additionally proves
    // cover/determinism.
    Q("k2c_knn_ivf_kmeans",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cells = SimilaritySearch.kmeansAssign(emb, "vec_id", "embedding",
          k = 8, iters = 3)
        recallVerdict(
          SimilaritySearch.topKNeighborsIvf(emb.join(cells, "vec_id"),
            "vec_id", "embedding", "cell", queryId = 0L, k = 5, nprobe = 2),
          SimilaritySearch.topKNeighbors(emb, "vec_id", "embedding",
            queryId = 0L, k = 5),
          k = 5, minHit = 3)
      },
      Some(recallVerdictSql(k = 5, minHit = 3))),

    // K4: SRP-LSH (cosine LSH) near-neighbor pairs — 4 bands × 6 sign
    // projections; candidates collide on >= 1 band (equi-join, never
    // all-pairs: ~8.3k of 124,750 possible pairs at sf0.01), exact
    // double-fold cosine verifies. The hyperplanes are dyadic k/1024
    // literals from a fixed LCG — exact in FLOAT, DOUBLE, and as SQL text —
    // generated once in SimilaritySearch.srpNumerators for BOTH engines.
    Q("k4_srp_lsh",
      (s, d) => SimilaritySearch.srpNearPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", dim,
        bands = 4, bits = 6, threshold = 0.4),
      Some(srpOracle(bands = 4, bits = 6, threshold = 0.4))),

    // K3: embedding-cosine near-dup pairs within buckets (dedup by vector).
    Q("k3_embedding_neardup",
      (s, d) => SimilaritySearch.nearDupPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", "label", threshold = 0.4),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS bucket,
              |${cosSql("a.embedding", "b.embedding")} AS cos_sim
              |FROM embeddings a JOIN embeddings b
              |  ON a.label = b.label AND a.vec_id < b.vec_id
              |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4""".stripMargin)),

    // D7: SemDeDup-style semantic dedup — SRP-LSH cosine pairs collapsed to
    // clusters (connected components), min-id keeper, one row per vector.
    // The embedding analogue of d6's text-simhash cluster collapse; the pair
    // graph is banded-candidate-sized, never all-pairs.
    Q("d7_semantic_dedup",
      (s, d) => SimilaritySearch.semanticDedup(
        Tables.embeddings(s, d), "vec_id", "embedding", dim,
        bands = 4, bits = 6, threshold = 0.4),
      Some(s"""WITH RECURSIVE ${srpCandCtes(4, 6)},
              |np AS (
              |  SELECT id_a, id_b
              |  FROM cand JOIN embeddings a ON a.vec_id = id_a
              |    JOIN embeddings b ON b.vec_id = id_b
              |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4),
              |uedges AS (
              |  SELECT id_a AS src, id_b AS dst FROM np
              |  UNION SELECT id_b, id_a FROM np),
              |reach(id, r) AS (
              |  SELECT DISTINCT src, src FROM uedges
              |  UNION
              |  SELECT reach.id, e.dst FROM reach JOIN uedges e ON reach.r = e.src),
              |comps AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
              |allv AS (
              |  SELECT vec_id, COALESCE(cluster_id, vec_id) AS cluster_id
              |  FROM embeddings LEFT JOIN comps ON vec_id = id),
              |sized AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM allv GROUP BY 1)
              |SELECT vec_id, cluster_id, cluster_size, vec_id = cluster_id AS is_keeper
              |FROM allv JOIN sized USING (cluster_id)""".stripMargin)),

    // K6: product-quantization ADC search + exact RERANK — candidates are
    // scored from m-byte PQ codes via a per-query m×k lookup table, never
    // from raw vectors (the billion-vector index memory shape); the ADC
    // top-5% shortlist is then reranked with exact cosine (Jégou '11's
    // IVFADC+R stage — the rerank touches only shortlist-many raw vectors).
    // Decimal-mean centroids make ADC distances non-portable to DuckDB →
    // recall-verdict gate vs the exact top-k, with the ADC arithmetic
    // itself proven exactly in IvfSpec.
    Q("k6_pq_adc",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val shortlist = SimilaritySearch.topKNeighborsPq(emb, "vec_id",
            "embedding", dim, queryId = 0L, k = 25, m = 4, kCodes = 16, iters = 2)
          .select(col("vec_id"))
        val sub = emb.join(shortlist, Seq("vec_id"), "left_semi")
          .unionByName(emb.filter(col("vec_id") === 0L))
        val rerank = SimilaritySearch.topKNeighborsL2(sub, "vec_id", "embedding",
          queryId = 0L, k = 5)
        val exact = SimilaritySearch.topKNeighborsL2(emb, "vec_id", "embedding",
          queryId = 0L, k = 5)
        // distance-competitive verdict: on concentrated synthetic vectors
        // top-k SET overlap is near-random for any quantizer, so the honest
        // PQ contract is the approximation RATIO — every returned
        // candidate's TRUE distance within 15% of the exact 5th-best
        val worst = rerank.agg(max(col("l2_dist")).as("adc_worst"),
          count(lit(1)).as("n_results"))
        val bound = exact.agg(max(col("l2_dist")).as("exact_kth"))
        worst.crossJoin(bound).select(lit(5L).as("k"), col("n_results"),
          (col("adc_worst") <= lit(1.15) * col("exact_kth") &&
            col("n_results") === 5).as("ratio_ok"))
      },
      Some("SELECT CAST(5 AS BIGINT) AS k, CAST(5 AS BIGINT) AS n_results, " +
        "true AS ratio_ok"),
      bench = true),

    // K5: k-NN JOIN — top-3 cosine neighbors for EVERY vector among its
    // SRP band-collision candidates (the all-queries ANN build, vs k1's
    // single query). Candidate equi-join + per-query rank window; no
    // all-pairs stage anywhere.
    Q("k5_knn_join_lsh",
      (s, d) => SimilaritySearch.knnJoinLsh(
        Tables.embeddings(s, d), "vec_id", "embedding", dim,
        bands = 4, bits = 6, k = 3),
      Some(s"""WITH ${srpCandCtes(4, 6)},
              |scored AS (
              |  SELECT id_a, id_b, ${cosSql("a.embedding", "b.embedding")} AS cos_sim
              |  FROM cand JOIN embeddings a ON a.vec_id = id_a
              |    JOIN embeddings b ON b.vec_id = id_b),
              |sym AS (
              |  SELECT id_a AS vec_id, id_b AS neighbor_id, cos_sim FROM scored
              |  UNION ALL SELECT id_b, id_a, cos_sim FROM scored)
              |SELECT vec_id, neighbor_id, cos_sim,
              |  CAST(row_number() OVER (PARTITION BY vec_id
              |    ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
              |FROM sym
              |QUALIFY row_number() OVER (PARTITION BY vec_id
              |  ORDER BY cos_sim DESC, neighbor_id) <= 3""".stripMargin),
      bench = true),

    // K8: ANN quality evaluation as a first-class op — recall@5 of the
    // SRP-cell MULTIPROBE search (the query's 4-bit angular cell plus its
    // hamming-1 neighbors: cells one sign-flip away, where true neighbors
    // land when the query sits close to a hyperplane) against the exact
    // brute-force top-5. The report is one row; the semi-join runs on two
    // k-row result sets. (The learned-quantizer paths get the same
    // treatment driver-side in IvfSpec — their cell ranking isn't
    // SQL-portable.)
    Q("k8_ann_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val exact = SimilaritySearch.topKNeighbors(
          emb, "vec_id", "embedding", queryId = 0L, k = 5)
        val cells = SimilaritySearch.diversitySample(emb, "vec_id", "embedding",
          dim, bits = 4, quota = Long.MaxValue, salt = "k8")
          .select(col("vec_id"), col("cell"))
        val approx = SimilaritySearch.topKNeighbors(
          emb.join(cells, "vec_id"), "vec_id", "embedding", queryId = 0L, k = 5,
          bucketCol = Some("cell"), probeHamming = 1)
        exact.join(approx.select(col("vec_id")), Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .select(lit(5).as("k"), col("n_hit"),
            round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
      },
      Some(s"""WITH sig AS (
              |  SELECT vec_id, ${srpBandSql(1, 4, 0)} AS cell FROM embeddings),
              |q AS (
              |  SELECT embedding AS q_vec, cell AS q_cell
              |  FROM embeddings JOIN sig USING (vec_id) WHERE vec_id = 0),
              |scored AS (
              |  SELECT e.vec_id, sig.cell, ${cosSql("e.embedding", "q_vec")} AS cos_sim,
              |    q_cell FROM embeddings e JOIN sig USING (vec_id), q
              |  WHERE e.vec_id <> 0),
              |exact AS (
              |  SELECT vec_id FROM scored
              |  QUALIFY row_number() OVER (ORDER BY cos_sim DESC, vec_id) <= 5),
              |approx AS (
              |  SELECT vec_id FROM scored WHERE bit_count(xor(cell, q_cell)) <= 1
              |  QUALIFY row_number() OVER (ORDER BY cos_sim DESC, vec_id) <= 5)
              |SELECT 5 AS k, CAST(COUNT(*) AS BIGINT) AS n_hit,
              |  round(COUNT(*) / 5.0, 6) AS recall
              |FROM exact WHERE vec_id IN (SELECT vec_id FROM approx)""".stripMargin)),

    // K13: ANN probe-budget operating-point sweep — k8's recall
    // measurement expanded over hamming radii 0/1/2: per probe budget,
    // how many candidates the search scans and what recall@5 it buys.
    // The ml3 idea applied to retrieval: THIS row set is how an nprobe
    // budget gets chosen. Recall and scan count are both monotone in the
    // radius (spec-asserted); every side is exact arithmetic, full hash
    // gate.
    Q("k13_ann_probe_sweep",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val cells = SimilaritySearch.diversitySample(emb, "vec_id", "embedding",
          dim, bits = 4, quota = Long.MaxValue, salt = "k8")
          .select(col("vec_id"), col("cell"))
        val withCells = emb.join(cells, "vec_id").localCheckpoint(true)
        val exact = SimilaritySearch.topKNeighbors(
          emb, "vec_id", "embedding", queryId = 0L, k = 5)
        val qCell = withCells.filter(col("vec_id") === 0L)
          .select(col("cell").as("q_cell"))
        Seq(0, 1, 2).map { r =>
          val approx = SimilaritySearch.topKNeighbors(
            withCells, "vec_id", "embedding", queryId = 0L, k = 5,
            bucketCol = Some("cell"), probeHamming = r)
          val scanned = withCells.filter(col("vec_id") =!= 0L)
            .crossJoin(broadcast(qCell))
            .filter(expr(s"bit_count(cell ^ q_cell) <= $r"))
            .agg(count(lit(1)).as("n_scanned"))
          exact.join(approx.select(col("vec_id")), Seq("vec_id"), "left_semi")
            .agg(count(lit(1)).as("n_hit"))
            .crossJoin(scanned)
            .select(lit(r).as("radius"), lit(5L).as("k"),
              col("n_scanned"), col("n_hit"),
              round(col("n_hit").cast("double") / 5.0, 6).as("recall"))
        }.reduce(_ unionByName _)
      },
      Some(s"""WITH sig AS (
              |  SELECT vec_id, ${srpBandSql(1, 4, 0)} AS cell FROM embeddings),
              |q AS (
              |  SELECT embedding AS q_vec, cell AS q_cell
              |  FROM embeddings JOIN sig USING (vec_id) WHERE vec_id = 0),
              |scored AS (
              |  SELECT e.vec_id, sig.cell, ${cosSql("e.embedding", "q_vec")} AS cos_sim,
              |    q_cell FROM embeddings e JOIN sig USING (vec_id), q
              |  WHERE e.vec_id <> 0),
              |exact AS (
              |  SELECT vec_id FROM scored
              |  QUALIFY row_number() OVER (ORDER BY cos_sim DESC, vec_id) <= 5),
              |r AS (SELECT unnest([0, 1, 2]) AS radius),
              |ap AS (
              |  SELECT radius, vec_id FROM scored CROSS JOIN r
              |  WHERE bit_count(xor(cell, q_cell)) <= radius
              |  QUALIFY row_number() OVER (PARTITION BY radius
              |    ORDER BY cos_sim DESC, vec_id) <= 5),
              |sc AS (
              |  SELECT radius, CAST(COUNT(*) AS BIGINT) AS n_scanned
              |  FROM scored CROSS JOIN r
              |  WHERE bit_count(xor(cell, q_cell)) <= radius GROUP BY 1),
              |hits AS (
              |  SELECT radius, CAST(COUNT(*) AS BIGINT) AS n_hit FROM ap
              |  WHERE vec_id IN (SELECT vec_id FROM exact) GROUP BY 1)
              |SELECT radius, CAST(5 AS BIGINT) AS k, n_scanned,
              |  COALESCE(n_hit, 0) AS n_hit,
              |  round(COALESCE(n_hit, 0) / 5.0, 6) AS recall
              |FROM sc LEFT JOIN hits USING (radius)""".stripMargin)),

    // K7: embedding-space stratified DIVERSITY sample — a 4-bit SRP band
    // cuts the space into 16 angular cells, a salted-hash quota keeps at
    // most 20 vectors per cell. Dense regions are capped at the same
    // budget as sparse ones: coverage sampling, the curation complement of
    // d7's near-duplicate removal.
    Q("k7_diversity_sample",
      (s, d) => SimilaritySearch.diversitySample(
          Tables.embeddings(s, d), "vec_id", "embedding", dim,
          bits = 4, quota = 20L, salt = "k7")
        .select(col("vec_id"), col("cell"), col("sample_rank")),
      Some {
        import graft.ops.TextAnalysis
        s"""WITH sig AS (
           |  SELECT vec_id, CAST(${srpBandSql(1, 4, 0)} AS INTEGER) AS cell
           |  FROM embeddings)
           |SELECT vec_id, cell, rnk AS sample_rank FROM (
           |  SELECT vec_id, cell,
           |    ROW_NUMBER() OVER (PARTITION BY cell
           |      ORDER BY ${TextAnalysis.hashUnitSql("vec_id", "k7")}, vec_id) AS rnk
           |  FROM sig)
           |WHERE rnk <= 20""".stripMargin
      }),

    // K14: PCA dimensionality reduction for the embedding corpus — the
    // shrink-before-indexing step (float[64] → float[8] feeding ANN /
    // semantic dedup). The distributed work is exact integer moment
    // accumulation on the k11 1/1024 grid (one BIGINT Gram/mean partial per
    // partition, combined by exact addition — partitioning-independent and
    // SQL-replayable); the d×d eigendecomposition is driver-side Jacobi on
    // KB-sized state (the BPE-merge-table license). The oracle recomputes
    // n, per-dimension mean numerators and Gram diagonal EXACTLY with
    // unnest + integer sums (hash gate on the distributed moments) and
    // asserts the eigen verdicts: orthonormal components, descending
    // eigenvalues, Σλ = trace(C).
    Q("k14_pca_moments",
      (s, d) => {
        import s.implicits._
        val model = graft.ops.Pca.fit(Tables.embeddings(s, d), "embedding",
          dim = 64, r = 8)
        val ortho = {
          val c = model.components
          val errs = for (k <- c.indices; l <- k until c.length) yield {
            val dot = (0 until model.dim).map(i => c(k)(i) * c(l)(i)).sum
            math.abs(dot - (if (k == l) 1.0 else 0.0))
          }
          errs.max < 1e-9
        }
        val monotone = model.eigvals.zip(model.eigvals.tail)
          .forall { case (a, b) => a >= b }
        val eigsum = math.abs(model.eigSum - model.traceC) <=
          1e-6 * math.max(1.0, math.abs(model.traceC))
        (0 until model.dim).map(i => (i, model.n, model.meanNum(i),
            model.gramDiag(i), ortho, monotone, eigsum))
          .toDF("pos", "n_vectors", "mean_num", "gram_diag",
            "ortho_ok", "monotone_ok", "eigsum_ok")
      },
      Some("""WITH q AS (
             |  SELECT vec_id,
             |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS qv
             |  FROM embeddings WHERE embedding IS NOT NULL)
             |SELECT pos, COUNT(*) AS n_vectors,
             |  CAST(SUM(qv) AS BIGINT) AS mean_num,
             |  CAST(SUM(qv * qv) AS BIGINT) AS gram_diag,
             |  true AS ortho_ok, true AS monotone_ok, true AS eigsum_ok
             |FROM q GROUP BY pos""".stripMargin)),

    // K14b: DAILY-MERGE lifecycle for the PCA moment state — the a4d/a18b
    // pattern applied to the third mergeable state family: k14's moments
    // (n, Σq per dim, Σq² per dim — and the full Gram triangle in fit) are
    // plain BIGINT sums, so per-day partials merge into the whole-corpus
    // moments by exact integer ADDITION. At 100 TB that's the difference
    // between refreshing the projection model from (days × d)-row KB-sized
    // stored partials and re-scanning the corpus: each day pays one
    // quantize-and-sum pass over its own arrivals, the merge reads only
    // stored state, and fit() consumes the merged moments unchanged.
    // The query emits the merged moments per dimension AS DATA (hash-gated
    // like k14) plus merge verdicts: merged-from-daily (two-level
    // aggregation, day then total) equals the direct whole-corpus
    // aggregation — different plan, identical integers, the proof the
    // merge is exact rather than approximately so.
    Q("k14b_pca_moments_merge_daily",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), (col("vec_id") % 3).as("day"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .withColumn("qv", floor(col("x").cast("double") * 1024).cast("long"))
          .select(col("day"), col("pos"), col("qv"))
        val daily = q.groupBy(col("day"), col("pos"))
          .agg(count(lit(1)).as("n_d"), sum(col("qv")).as("m_d"),
            sum(col("qv") * col("qv")).as("g_d"))
        val merged = daily.groupBy(col("pos"))
          .agg(count(lit(1)).as("n_days"), sum(col("n_d")).as("n_vectors"),
            sum(col("m_d")).as("mean_num"), sum(col("g_d")).as("gram_diag"))
        val direct = q.groupBy(col("pos"))
          .agg(count(lit(1)).as("n_x"), sum(col("qv")).as("m_x"),
            sum(col("qv") * col("qv")).as("g_x"))
        merged.join(direct, Seq("pos"))
          .select(col("pos"), col("n_days"), col("n_vectors"),
            col("mean_num"), col("gram_diag"),
            (col("n_vectors") === col("n_x") &&
              col("mean_num") === col("m_x") &&
              col("gram_diag") === col("g_x")).as("merge_exact"))
      },
      Some("""WITH q AS (
             |  SELECT vec_id % 3 AS day,
             |    CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
             |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024) AS BIGINT) AS qv
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |daily AS (
             |  SELECT day, pos, COUNT(*) AS n_d,
             |    CAST(SUM(qv) AS BIGINT) AS m_d,
             |    CAST(SUM(qv * qv) AS BIGINT) AS g_d
             |  FROM q GROUP BY 1, 2)
             |SELECT pos, COUNT(*) AS n_days,
             |  CAST(SUM(n_d) AS BIGINT) AS n_vectors,
             |  CAST(SUM(m_d) AS BIGINT) AS mean_num,
             |  CAST(SUM(g_d) AS BIGINT) AS gram_diag,
             |  true AS merge_exact
             |FROM daily GROUP BY pos""".stripMargin)),

    // K15: ANN in PCA space — the k14 composition payoff: project the
    // corpus float[64] → float[32] (one narrow pass + a KB-sized model
    // broadcast, UNCENTERED fit — diagonalizing the second-moment matrix
    // preserves dot-product geometry where mean-subtraction would distort
    // every angle) and run the exact cosine top-k INSIDE the projected
    // space: every downstream distance costs d/r = 2× less compute and the
    // candidate frame 2× less shuffle/IO. The recall-verdict gate (k2b
    // pattern) pins the measured operating point. Honest caveat, measured
    // not assumed: THIS synthetic corpus is near-isotropic (top-32 of 64
    // dims hold only ~65% of the energy; top-8 ~20%), so even 2×
    // compression costs ~40% of the top-10 — on real embedding corpora
    // with decaying spectra the same operator earns r ≪ d. The spectrum
    // itself is k14's hash-gated output, so the flatness claim is
    // oracle-backed, not an excuse.
    Q("k15_pca_ann",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val model = graft.ops.Pca.fit(emb, "embedding", dim = 64, r = 32,
          centered = false)
        val proj = graft.ops.Pca.project(emb, "embedding", model, "pvec")
          .select(col("vec_id"), col("pvec").as("embedding"))
        recallVerdict(
          SimilaritySearch.topKNeighbors(proj, "vec_id", "embedding",
            queryId = 0L, k = 10),
          SimilaritySearch.topKNeighbors(emb, "vec_id", "embedding",
            queryId = 0L, k = 10),
          k = 10, minHit = 4)
      },
      Some(recallVerdictSql(10, 4))),

    // K16: incremental SEMANTIC dedup — the embedding-side d8
    // (SimilaritySearch.incrementalSemanticAccept): a delta batch
    // (vec_id % 5 == 0 stands in for today's new vectors) pays its own SRP
    // signatures plus a banded join against the corpus index — never a
    // corpus re-scan — and is accepted only with no cosine near-dup
    // >= 0.4 in the corpus NOR at a lower id within the batch (greedy
    // min-id intra-batch collapse). Exact cosine verifies every band
    // collision, so the whole decision is oracle-replayable.
    Q("k16_incremental_embed_dedup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        SimilaritySearch.incrementalSemanticAccept(
          emb.filter(col("vec_id") % 5 === 0),
          emb.filter(col("vec_id") % 5 =!= 0),
          "vec_id", "embedding", dim, bands = 4, bits = 6, threshold = 0.4)
      },
      Some {
        val bandJoinsCross = (0 until 4).map(k =>
          s"    SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM ds a JOIN cs b ON a.b$k = b.b$k")
          .mkString("\n    UNION ALL\n")
        val bandJoinsIntra = (0 until 4).map(k =>
          s"    SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM ds a JOIN ds b ON a.b$k = b.b$k AND b.vec_id < a.vec_id")
          .mkString("\n    UNION ALL\n")
        s"""WITH ${srpSigCte(4, 6)},
           |ds AS (SELECT * FROM sig WHERE vec_id % 5 = 0),
           |cs AS (SELECT * FROM sig WHERE vec_id % 5 <> 0),
           |cc AS (SELECT DISTINCT id_a, id_b FROM (
           |$bandJoinsCross)),
           |ci AS (SELECT DISTINCT id_a, id_b FROM (
           |$bandJoinsIntra)),
           |nc AS (SELECT id_a, COUNT(*) AS n FROM cc
           |  JOIN embeddings a ON a.vec_id = id_a
           |  JOIN embeddings b ON b.vec_id = id_b
           |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4
           |  GROUP BY 1),
           |nd AS (SELECT id_a, COUNT(*) AS n FROM ci
           |  JOIN embeddings a ON a.vec_id = id_a
           |  JOIN embeddings b ON b.vec_id = id_b
           |  WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.4
           |  GROUP BY 1)
           |SELECT e.vec_id,
           |  CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_corpus_dups,
           |  CAST(COALESCE(nd.n, 0) AS BIGINT) AS n_delta_dups,
           |  COALESCE(nc.n, 0) = 0 AND COALESCE(nd.n, 0) = 0 AS accepted
           |FROM embeddings e
           |LEFT JOIN nc ON nc.id_a = e.vec_id
           |LEFT JOIN nd ON nd.id_a = e.vec_id
           |WHERE e.vec_id % 5 = 0""".stripMargin
      }),

    // K17: INDEX-ROT AUDIT — the operational check for the warehouse's
    // build-once/query-many ANN lifecycle (ann_ivf_index is rebuilt on
    // index cadence, the corpus grows daily): rebuild the k2c kmeans index
    // as of the LAST BUILD (vec_id % 10 == 9 models post-build arrivals),
    // then run the NEW ARRIVALS as probes against the stale index — the
    // exact production case: today's documents querying yesterday's index
    // from OUTSIDE it (their cells are assigned against the stored
    // centroids, never re-learned). Recall is judged against the exact
    // top-k on the CURRENT corpus, and the audit reports rot's structural
    // floor per probe: exact neighbors that arrived after the build cannot
    // be returned by the stale index at any nprobe — n_unindexed_in_exact
    // counts them, and the oracle RECOMPUTES that count independently
    // (exact top-k is SQL-expressible), so the hash gate cross-checks real
    // data, not just verdict booleans (the k2b/k2c learned-path
    // discipline, plus one verifiable fact per probe).
    // Scale: probes and centroids are broadcast-tiny; BOTH top-k sides run
    // the two-level shard discipline (per-(probe, shard-of-64) window over
    // bounded partitions, then a final window over <= 64*5 shard winners
    // per probe) — no corpus-sized window partition anywhere.
    Q("k17_index_rot_audit",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val emb = Tables.embeddings(s, d)
        val indexed = emb.filter(col("vec_id") % 10 =!= 9)
        val (cells, cents) = SimilaritySearch.kmeansModel(indexed, "vec_id",
          "embedding", k = 8, iters = 3)
        val probes = emb.filter(col("vec_id") % 10 === 9 && col("vec_id") <= 49)
          .select(col("vec_id").as("probe_id"), col("embedding").as("q_vec"))
        // nearest nprobe=4 STALE cells per probe, against the stored
        // centroids: argmin ||c||^2 - 2 q.c (the Euclidean order; q's own
        // norm is probe-constant). 5 x 8 rows — driver-free, broadcast.
        // nprobe is 4 (k2c queries its own fresh index at 2): an arrival
        // the index never saw lands BETWEEN stale cells more often, so the
        // operational guidance the audit encodes is "probe wider while the
        // index is stale" — at nprobe=2 a probe measured 0/5 at sf0.1.
        val pc = probes.crossJoin(broadcast(cents))
          .withColumn("__d2",
            expr("float_dot(__c, __c) - 2 * float_dot(q_vec, __c)"))
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("probe_id"))
              .orderBy(col("__d2"), col("cell"))))
          .filter(col("__rn") <= 4).select(col("probe_id"), col("cell"))
        def top5(scored: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val shard = pmod(col("vec_id"), lit(64))
          val w1 = Window.partitionBy(col("probe_id"), shard)
            .orderBy(col("cos").desc, col("vec_id"))
          val w2 = Window.partitionBy(col("probe_id"))
            .orderBy(col("cos").desc, col("vec_id"))
          scored.withColumn("__r1", row_number().over(w1))
            .filter(col("__r1") <= 5)
            .withColumn("__r2", row_number().over(w2))
            .filter(col("__r2") <= 5)
            .select(col("probe_id"), col("vec_id"))
        }
        def score(df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame =
          df.withColumn("cos", round(
            expr("float_dot(embedding, q_vec)").cast("double") /
              (sqrt(expr(SimilaritySearch.normSqExpr("embedding"))
                .cast("double")) *
               sqrt(expr(SimilaritySearch.normSqExpr("q_vec"))
                .cast("double"))), 6))
        val stale5 = top5(score(
          indexed.join(cells, "vec_id").join(pc, "cell")
            .join(broadcast(probes), "probe_id")))
        val exact5 = top5(score(
          emb.crossJoin(broadcast(probes))
            .filter(col("vec_id") =!= col("probe_id"))))
          .localCheckpoint(true) // two consumers: hit join + unindexed agg
        val hits = exact5
          .join(stale5.withColumnRenamed("vec_id", "__sv"),
            exact5("probe_id") === stale5("probe_id") &&
              col("vec_id") === col("__sv"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hit"))
        val unidx = exact5.groupBy(col("probe_id"))
          .agg(sum(when(col("vec_id") % 10 === 9, 1L).otherwise(0L))
            .as("n_unindexed_in_exact"))
        val nres = stale5.groupBy(col("probe_id"))
          .agg(count(lit(1)).as("n_results"))
        unidx.join(hits, Seq("probe_id"), "left")
          .join(nres, Seq("probe_id"), "left")
          .select(col("probe_id"), lit(5L).as("k"),
            coalesce(col("n_results"), lit(0L)).as("n_results"),
            col("n_unindexed_in_exact"), lit(1L).as("min_hit"),
            (coalesce(col("n_hit"), lit(0L)) >= 1 &&
              coalesce(col("n_results"), lit(0L)) === 5).as("recall_ok"))
      },
      // ORACLE CONTRACT (r9 advice): the SQL below hardcodes n_results=5
      // and recall_ok=true — i.e. it asserts the stale index RETURNS a
      // full page and keeps >=1 exact hit per probe, rather than replaying
      // the learned stale-index side (kmeans is iteration-ordered and not
      // SQL-expressible; the k2c discipline). That contract is VERIFIED at
      // the gated scales sf0.001/sf0.01/sf0.1 with nprobe=4 (at nprobe=2 a
      // probe measured 0/5 at sf0.1 — the margin the widened probe buys).
      // At an untested scale a legitimate stale-index recall miss (a probe
      // whose entire exact top-5 arrived post-build AND whose stale page
      // misses) would surface HERE as a hash mismatch on recall_ok — read
      // such a mismatch as the audit's contract being outgrown (re-gate
      // with a wider nprobe or relax to the data columns), not as a
      // translation bug: n_unindexed_in_exact is the independently
      // recomputed cross-check column and stays valid regardless.
      Some(s"""WITH p AS (
           |  SELECT vec_id AS probe_id, embedding AS q_vec FROM embeddings
           |  WHERE vec_id % 10 = 9 AND vec_id <= 49),
           |ex AS (
           |  SELECT probe_id, vec_id FROM (
           |    SELECT p.probe_id, e.vec_id,
           |      ${cosSql("e.embedding", "p.q_vec")} AS cs
           |    FROM embeddings e, p WHERE e.vec_id <> p.probe_id)
           |  QUALIFY row_number() OVER (PARTITION BY probe_id
           |    ORDER BY cs DESC, vec_id) <= 5)
           |SELECT probe_id, CAST(5 AS BIGINT) AS k,
           |  CAST(5 AS BIGINT) AS n_results,
           |  CAST(SUM(CASE WHEN vec_id % 10 = 9 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_unindexed_in_exact,
           |  CAST(1 AS BIGINT) AS min_hit, true AS recall_ok
           |FROM ex GROUP BY 1""".stripMargin)),

    // GR7: LINK PREDICTION (Graph.linkPrediction, Liben-Nowell & Kleinberg
    // '03 common-neighbor/Jaccard) over the SRP-verified cosine graph (the
    // d7 candidate machinery at threshold 0.3, 8 bands x 4 bits) — the
    // FORWARD-looking readout of the embedding-dedup family: cosine
    // similarity is NOT transitive, so the graph is full of open wedges
    // near the threshold, and a pair of vectors that are each near-dups of
    // the same neighbors but whose direct similarity was missed (by the
    // bands or by the threshold) is the prime re-examination candidate —
    // the near-dup pass's own false-negative queue, pointed at by the
    // graph's structure instead of a second quadratic scan. (Two WRONG
    // bases, both measured: the d5 simhash graph — hamming
    // near-transitivity leaves it 13 disjoint edges, zero wedges at
    // sf0.01; the k3 label-blocked exact graph — its all-pairs edge build
    // densifies quadratically within fixed labels, probed 118 s / 25.4M
    // rows at sf10 before the rebase.)
    // Scored by common-neighbor count + exact integer neighborhood Jaccard.
    // Scale: the edge build inherits d7's measured-linear candidate story
    // (banded equi-joins, occupancy-adaptive ring above the window);
    // exact common-neighbor counting must then enumerate EVERY wedge
    // (Σ deg² — no orientation trick saves it, unlike gr6's triangles), so
    // the op declares the hub-filtered subgraph (degree <= 64): wedge
    // volume is bounded by 64·2|E| — linear in edges — and the filter is
    // the LP literature's own practice (a hub is a common neighbor of
    // everything in its cluster; its signal is noise, and d7/gr4 already
    // report the dense clusters). Degrees, candidates, and Jaccard
    // denominators are all computed ON the declared subgraph, so the
    // result is exact on it and the oracle replays it verbatim at the
    // gated scales (below the ring window the candidate set is provably
    // exhaustive — the d7 discipline).
    Q("gr7_link_prediction",
      (s, d) => {
        import graft.ops.Graph
        val emb = Tables.embeddings(s, d)
        // adaptiveWindow = false: the queue's edge basis keeps BUDGET
        // semantics — the recall-derived width was measured at sf10 and
        // REJECTED for this op (614 s and an output collapsed to 0 rows:
        // the denser basis pushed nearly every node past the deg<=64 hub
        // filter; see srpNearPairs' scaladoc + BENCH_NOTES round-10)
        val edges = SimilaritySearch.srpNearPairs(
            emb, "vec_id", "embedding", dim,
            bands = 8, bits = 4, threshold = 0.3, adaptiveWindow = false)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        val predicted = Graph.linkPrediction(edges, maxDegree = 64, minCommon = 1)
        // enrich the queue with the pair's ACTUAL cosine (float_dot is
        // registered by srpNearPairs above): the readout that makes it
        // actionable — a predicted pair at cos 0.29 is a threshold near-miss
        // to re-admit, one at 0.05 is a true structural hole. Output-sized
        // work: two id joins + one codegen dot per predicted pair.
        val withVec = emb.select(col("vec_id"), col("embedding"),
          sqrt(expr(SimilaritySearch.normSqExpr("embedding")).cast("double"))
            .as("__n"))
        predicted
          .join(withVec.toDF("id_a", "va", "na"), "id_a")
          .join(withVec.toDF("id_b", "vb", "nb"), "id_b")
          .select(col("id_a"), col("id_b"), col("n_common"),
            col("jaccard_milli"),
            // + 0.0 canonicalizes IEEE signed zero: a tiny negative dot
            // rounds to -0.0, which DuckDB prints as a DISTINCT value
            (round(expr(SimilaritySearch.dotExpr("va", "vb")) /
              (col("na") * col("nb")), 6) + lit(0.0)).as("actual_cos"))
      },
      Some(
        s"""WITH ${srpCandCtes(8, 4)},
           |ue AS MATERIALIZED (
           |  SELECT LEAST(id_a, id_b) AS a, GREATEST(id_a, id_b) AS b
           |  FROM cand JOIN embeddings ea ON ea.vec_id = id_a
           |    JOIN embeddings eb ON eb.vec_id = id_b
           |  WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.3
           |  GROUP BY 1, 2),
           |deg AS (
           |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
           |  FROM (SELECT a AS id FROM ue UNION ALL SELECT b FROM ue)
           |  GROUP BY 1),
           |kept AS (SELECT id FROM deg WHERE deg <= 64),
           |sub AS MATERIALIZED (
           |  SELECT a, b FROM ue
           |  WHERE a IN (SELECT id FROM kept) AND b IN (SELECT id FROM kept)),
           |deg2 AS (
           |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
           |  FROM (SELECT a AS id FROM sub UNION ALL SELECT b FROM sub)
           |  GROUP BY 1),
           |adj AS (SELECT a AS v, b AS n FROM sub
           |        UNION ALL SELECT b, a FROM sub),
           |cn AS (
           |  SELECT a1.n AS id_a, a2.n AS id_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_common
           |  FROM adj a1 JOIN adj a2 ON a1.v = a2.v AND a1.n < a2.n
           |  GROUP BY 1, 2)
           |SELECT c.id_a, c.id_b, c.n_common,
           |  (1000 * c.n_common) // (da.deg + db.deg - c.n_common)
           |    AS jaccard_milli,
           |  (${cosSql("va.embedding", "vb.embedding")} + 0.0) AS actual_cos
           |FROM cn c
           |JOIN deg2 da ON da.id = c.id_a
           |JOIN deg2 db ON db.id = c.id_b
           |JOIN embeddings va ON va.vec_id = c.id_a
           |JOIN embeddings vb ON vb.vec_id = c.id_b
           |WHERE NOT EXISTS (
           |  SELECT 1 FROM sub e WHERE e.a = c.id_a AND e.b = c.id_b)""".stripMargin),
      bench = true)
  )
}
