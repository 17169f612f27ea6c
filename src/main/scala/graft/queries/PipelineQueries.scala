package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import graft.ops.{Multimodal, SimHash, VectorSearch}

/** LLM-training-data pipeline operators beyond SURVEY §2's inventory —
  * dedup, similarity search, text analysis, and multimodal plumbing as
  * first-class graded queries. Oracle-backed wherever the computation is
  * engine-portable; hash-based ops (simhash, hyperplane LSH) are rows-only
  * here and property-pinned in PipelineSpec / VectorSearchSpec.
  */
object PipelineQueries {

  // ---- 48. SimHash near-dup candidates (no oracle: engine hash) -----------
  // Radius 3 with 4×16-bit bands: ≤3 flipped bits dirty at most 3 bands, so
  // one band must collide — recall is EXACTLY 1.0 by pigeonhole (the Manku
  // et al. WWW'07 production setting). Rounds 1–5 declared radius 16 through
  // the same 4 bands, which silently returned a ~16% subset of its declared
  // answer (measured; r5 verdict); wider radii remain available via
  // hammingPairs(maxHamming, nBands) with recall pinned in PipelineSpec.
  val q48 = Q(
    "q48_simhash_pairs",
    (s, d) => SimHash.hammingPairs(
      Tables.documents(s, d), "doc_id", "text", Seq("lang", "source"), 3),
    None)

  // ---- 49. embedding-cosine near-dup pairs --------------------------------
  // Pair form of embedding dedup: pairs with cos >= 0.4 (random unit
  // vectors cap near 0.51, so this is the "near-duplicate" tail).
  // Size-dispatched (r5 verdict task 5): a bounded row-count probe routes
  // inputs beyond VectorSearch.MaxExactPairRows to the LSH-banded plan
  // (q54's candidate generation + exact re-rank) instead of the quadratic
  // exact product — the guard is pinned in VectorSearchSpec. At the graded
  // SFs (500–2000 vectors) the probe picks the exact path, so the oracle
  // comparison below grades the exact form.
  val q49 = Q(
    "q49_embedding_neardup",
    (s, d) => VectorSearch.cosinePairs(
      Tables.embeddings(s, d), "vec_id", "embedding", 0.4),
    Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                   ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
            ORDER BY a_id, b_id"""))

  // ---- 50. language-ID heuristic ------------------------------------------
  // Function-word scorer: the corpus vocabulary is shared across langs
  // (measured — every token appears in all 5), so an honest language-ID here
  // is the score, not a trained classifier: ratio of English function-word
  // occurrences among tokens, with a rule-based guess.
  val q50 = Q(
    "q50_lang_id",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("n_func",
        size(filter(col("toks"), t => t === "a" || t === "the")))
      .select(
        col("doc_id"), col("lang"),
        size(col("toks")).as("n_tokens"),
        col("n_func"),
        round(col("n_func").cast("double") / size(col("toks")), 6).as("func_ratio"),
        when(col("n_func").cast("double") / size(col("toks")) >= 0.08, "en-like")
          .otherwise("other").as("guess"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, lang,
                   len(regexp_split_to_array(text, ' +')) AS n_tokens,
                   len(list_filter(regexp_split_to_array(text, ' +'),
                                   t -> t = 'a' OR t = 'the')) AS n_func,
                   round(len(list_filter(regexp_split_to_array(text, ' +'),
                                         t -> t = 'a' OR t = 'the'))::DOUBLE
                         / len(regexp_split_to_array(text, ' +')), 6) AS func_ratio,
                   CASE WHEN len(list_filter(regexp_split_to_array(text, ' +'),
                                             t -> t = 'a' OR t = 'the'))::DOUBLE
                             / len(regexp_split_to_array(text, ' +')) >= 0.08
                        THEN 'en-like' ELSE 'other' END AS guess
            FROM documents ORDER BY doc_id"""))

  // ---- 51. document quality scoring ---------------------------------------
  // Length / diversity / token-shape features folded into one score — the
  // standard cheap pre-filter before expensive dedup in a data pipeline.
  val q51 = Q(
    "q51_quality_score",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("n_dist", size(array_distinct(col("toks"))))
      .withColumn("alpha_chars", length(regexp_replace(col("text"), "[^a-z]", "")))
      .withColumn("div_ratio", col("n_dist").cast("double") / col("n_toks"))
      .withColumn("alpha_ratio", col("alpha_chars").cast("double") / col("n_chars"))
      .withColumn("len_score",
        least(lit(1.0), col("n_toks").cast("double") / lit(100.0)))
      .select(
        col("doc_id"), col("n_toks"), col("n_dist"),
        Det.round6(col("div_ratio")).as("div_ratio"),
        Det.round6(col("alpha_ratio")).as("alpha_ratio"),
        Det.round6(lit(0.4) * col("div_ratio") + lit(0.3) * col("alpha_ratio")
          + lit(0.3) * col("len_score")).as("quality"))
      .orderBy("doc_id"),
    Some("""WITH f AS (
              SELECT doc_id,
                     len(regexp_split_to_array(text, ' +')) AS n_toks,
                     len(list_distinct(regexp_split_to_array(text, ' +'))) AS n_dist,
                     length(regexp_replace(text, '[^a-z]', '', 'g')) AS alpha_chars,
                     n_chars
              FROM documents)
            SELECT doc_id, n_toks, n_dist,
                   round(n_dist::DOUBLE / n_toks, 6) AS div_ratio,
                   round(alpha_chars::DOUBLE / n_chars, 6) AS alpha_ratio,
                   round(0.4 * (n_dist::DOUBLE / n_toks)
                         + 0.3 * (alpha_chars::DOUBLE / n_chars)
                         + 0.3 * least(1.0, n_toks::DOUBLE / 100.0), 6) AS quality
            FROM f ORDER BY doc_id"""))

  // ---- 52. token counting (whitespace + BPE-ish regex segmentation) --------
  val q52 = Q(
    "q52_token_count",
    (s, d) => Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " +")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("seg_tokens"),
        col("n_chars"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   len(regexp_split_to_array(text, ' +')) AS ws_tokens,
                   len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS seg_tokens,
                   n_chars
            FROM documents ORDER BY doc_id"""))

  // ---- 53. document fingerprint (position-weighted rolling hash) -----------
  // Deterministic engine-portable fingerprint: Σ_i ord(text[i])·((i−1) mod 31
  // + 1), mod 1e9+7. The weighted sum stays < 2^32, so no intermediate
  // overflow on either engine; identical integer math end to end.
  val q53 = Q(
    "q53_doc_fingerprint",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        // empty-text guard: Spark's sequence(1, 0) runs DESCENDING ([1, 0])
        // while DuckDB's generate_series(1, 0) is empty — pin both to 0L
        when(length(col("text")) >= 1,
          pmod(aggregate(
            transform(sequence(lit(1), length(col("text"))),
              i => ascii(col("text").substr(i, lit(1))).cast("long")
                * (pmod(i - 1, lit(31)) + lit(1)).cast("long")),
            lit(0L), (acc, x) => acc + x), lit(1000000007L)))
          .otherwise(lit(0L)).as("fp"))
      .orderBy("doc_id"),
    // ::BIGINT on the whole expression: DuckDB's list_sum yields HUGEINT,
    // which COPYs to parquet as DOUBLE — the driver would hash int64 vs
    // float64 even though every value is identical
    Some("""SELECT doc_id,
                   COALESCE(
                     (list_sum(list_transform(generate_series(1, length(text)),
                               i -> ord(text[i:i])::BIGINT * (((i - 1) % 31) + 1)))
                      % 1000000007)::BIGINT, 0) AS fp
            FROM documents ORDER BY doc_id"""))

  // ---- 54. ANN: banded hyperplane LSH (scale path of q40) ------------------
  // Approximate by construction (recall < 1) → rows-only here; recall@3 and
  // exact re-rank precision are pinned in VectorSearchSpec.
  val q54 = Q(
    "q54_ann_lsh",
    (s, d) => VectorSearch.lshCosineKnn(
      Tables.embeddings(s, d), "vec_id", "embedding", col("id") < 100, 3,
      nPlanes = 32, nBands = 8),
    None)

  // ---- 56. ANN: IVF coarse quantization (the bucketed scale path) ----------
  // Approximate (probing misses cells) → rows-only; recall pinned in
  // VectorSearchSpec against q40's exact ground truth.
  val q56 = Q(
    "q56_ann_ivf",
    (s, d) => VectorSearch.ivfCosineKnn(
      Tables.embeddings(s, d), "vec_id", "embedding", col("id") < 100, 3,
      nCells = 16, nProbe = 8),
    None)

  // ---- 55. multimodal ingestion + batched decode stub ----------------------
  // Binary payloads with typed per-partition decoding (see ops.Multimodal).
  // The decode is a deterministic stub, so the whole pipeline — binary cast,
  // Dataset encoder boundary, mapPartitions batching, metadata schema — is
  // graded against a SQL oracle computing the same bytes.
  /** q55 (upgraded r11: stub → REAL codec) — multimodal ingestion with an
    * actual image decode: per doc, a VALID 24-bit BMP is synthesized
    * (dims and solid color are pure doc_id arithmetic), travels as a
    * binary column, and is decoded by [[Multimodal.decodeBmp24]] — a real
    * dependency-free parser whose header offsets, little-endian fields,
    * BGR order, and 4-byte row padding are all graded: the oracle predicts
    * n_bytes (file-header size + padded rows), dims, channel means, and
    * the packed-pixel XOR canary INDEPENDENTLY from doc_id, so an
    * encoder or parser slip anywhere hash-mismatches. Width spans 1–31,
    * so most rows carry nonzero padding (the classic BMP bug surface).
    */
  val q55 = Q(
    "q55_multimodal_meta",
    (s, d) => {
      val sess = s
      import sess.implicits._
      val imgs = Tables.documents(s, d).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val w = (1 + id % 31).toInt
            val h = (1 + id % 17).toInt
            (id, Multimodal.encodeBmp24(w, h, (id % 256).toInt,
              ((id * 7) % 256).toInt, ((id * 13) % 256).toInt))
          }
        }.toDF("doc_id", "payload")
      Multimodal.decodeBmp(imgs, "doc_id", "payload").orderBy("doc_id")
    },
    Some("""WITH g AS (
              SELECT doc_id,
                     1 + (doc_id % 31) AS w, 1 + (doc_id % 17) AS h,
                     doc_id % 256 AS r, (doc_id * 7) % 256 AS grn,
                     (doc_id * 13) % 256 AS b
              FROM documents)
            SELECT doc_id,
                   (54 + (3*w + (4 - (3*w) % 4) % 4) * h)::INT AS n_bytes,
                   w::INT AS width, h::INT AS height, 24 AS bpp,
                   round(r::DOUBLE, 6) AS mean_r,
                   round(grn::DOUBLE, 6) AS mean_g,
                   round(b::DOUBLE, 6) AS mean_b,
                   CASE WHEN (w * h) % 2 = 1
                        THEN r * 65536 + grn * 256 + b ELSE 0 END AS xor_pixels
            FROM g ORDER BY doc_id"""))

  // ---- 57. pivot (Hive's classic report shape) ----------------------------
  val q57 = Q(
    "q57_pivot",
    (s, d) => Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---- 58. approximate distinct count (HLL sketch) -------------------------
  // Approximate by design → no cross-engine oracle (HLL implementations
  // differ); deterministic within Spark, and PipelineSpec pins the relative
  // error against the exact count. The sketch is THE 100 TB cardinality
  // tool: mergeable fixed-size state instead of a distinct shuffle.
  val q58 = Q(
    "q58_approx_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    None)

  /** q72 (added r7) — deterministic stratified sampling
    * ([[graft.ops.Sampling.stratifiedByHash]]): per-lang target fractions
    * applied as a pure content-hash predicate — the mixture-control
    * primitive (resample a 100 TB corpus to a target language distribution
    * with ONE codegen'd filter: no shuffle, no state, reproducible under
    * any partitioning). Output: kept count per lang. No SQL oracle —
    * membership is decided by Spark's xxhash64, which DuckDB lacks;
    * determinism, fraction concentration, and repartition invariance are
    * pinned in SamplingSpec.
    */
  val q72 = Q(
    "q72_sample_stratified",
    (s, d) => graft.ops.Sampling.stratifiedByHash(
        Tables.documents(s, d), "lang",
        Map("en" -> 0.5, "de" -> 1.0, "zh" -> 0.25), defaultFraction = 0.1,
        idCols = Seq("doc_id"), salt = 7L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"))
      .orderBy("lang"),
    None)

  /** q73 (added r7) — corpus-slice overlap matrix
    * ([[graft.ops.MinHash.groupSimilarity]]): MinHash-estimated Jaccard
    * between per-lang token UNIONS — the dataset-overlap /
    * cross-source-contamination dashboard view. Slice signatures are
    * element-wise mins of the per-doc signatures (distributed), the pair
    * join runs on the tiny slices×hashes relation. Estimates are
    * deterministic (fixed seeds) but engine-hash-based → no SQL oracle;
    * MinHashSpec pins the estimator, PipelineSpec pins this query's shape.
    * On THIS corpus's shared 31-word vocabulary every slice pair overlaps
    * near-totally — the honest output, and exactly what the operator is
    * for: detecting that slices are NOT distinct.
    */
  val q73 = Q(
    "q73_source_overlap",
    (s, d) => graft.ops.MinHash.groupSimilarity(
      Tables.documents(s, d), Seq("lang"), "text"),
    None)

  /** q78 (added r7) — mergeable QUANTILE sketch: `percentile_approx`
    * (Greenwald-Khanna summaries) per returnflag at accuracy 10⁴ — the
    * sketch sibling of q58's HLL and the 100 TB answer when q62's exact
    * sort-based percentile is too expensive: fixed-size per-partition
    * state, one merge, no full sort. Sketch internals are engine-specific
    * → no SQL oracle; PipelineSpec pins the relative error against q62's
    * exact values.
    */
  val q78 = Q(
    "q78_approx_quantiles",
    (s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .cast("double").as("ap50"),
        percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
          .cast("double").as("ap90"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
          .cast("double").as("ap99"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag"),
    None)

  /** q80 (added r7) — document CHUNKING: overlapping token windows (size 8,
    * stride 6) per document — the standard long-document preprocessing step
    * before embedding/training. One generator expression per row
    * (`posexplode` over the chunk count), no shuffle until the output sort;
    * chunk boundaries are pure arithmetic on token positions, so the DuckDB
    * oracle reproduces them exactly.
    */
  val q80 = Q(
    "q80_chunk_documents",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n") <= 8, lit(1L))
          .otherwise(ceil((col("n") - 8).cast("double") / 6.0).cast("long") + 1L))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .withColumn("chunk",
        slice(col("toks"), (col("chunk_id") * 6 + 1).cast("int"), lit(8)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_tok"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH t AS (
              SELECT doc_id, regexp_split_to_array(text, ' +') AS toks,
                     len(regexp_split_to_array(text, ' +')) AS n
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     unnest(generate_series(0,
                       CASE WHEN n <= 8 THEN 0
                            ELSE ceil((n - 8) / 6.0)::BIGINT END)) AS chunk_id
              FROM t)
            SELECT doc_id, chunk_id,
                   len(toks[(chunk_id * 6 + 1):(chunk_id * 6 + 8)]) AS n_tok,
                   array_to_string(toks[(chunk_id * 6 + 1):(chunk_id * 6 + 8)], ' ') AS chunk_text
            FROM c ORDER BY doc_id, chunk_id"""))

  /** q81 (added r7) — SEQUENCE PACKING: group documents into fixed
    * token-budget packs (64 tokens) per lang — the training-batch
    * construction step. Deterministic start-offset bucketing: a doc joins
    * the pack where its cumulative-token START falls
    * (`floor((cumsum − n_tok) / budget)`) — the standard streaming
    * approximation (packs can overflow by at most one doc's tokens, never
    * undershoot); one window + one aggregation, both partitioned by lang.
    *
    * Scale note (honest limit): packing requires a TOTAL ORDER per stream,
    * so the cumsum window serializes within each lang partition — 5 langs
    * = 5-way parallelism no matter the cluster. The 100 TB deployment
    * sub-shards the stream (partition by (lang, doc_id range shard) and
    * pack within shards): pack boundaries then differ only at shard seams,
    * which is acceptable for batch construction and restores full
    * parallelism. The graded form keeps the single-stream semantics the
    * oracle can express.
    */
  val q81 = Q(
    "q81_sequence_packing",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .withColumn("n_tok", size(split(col("text"), " +")).cast("long"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id", floor((col("cum") - col("n_tok")).cast("double") / 64.0).cast("long"))
        .groupBy("lang", "pack_id")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
        .orderBy("lang", "pack_id")
    },
    Some("""WITH t AS (
              SELECT lang, doc_id,
                     len(regexp_split_to_array(text, ' +'))::BIGINT AS n_tok
              FROM documents),
            c AS (
              SELECT lang, n_tok,
                     sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
            SELECT lang, floor((cum - n_tok) / 64.0)::BIGINT AS pack_id,
                   count(*) AS n_docs, sum(n_tok)::BIGINT AS sum_tokens
            FROM c GROUP BY 1, 2 ORDER BY lang, pack_id"""))

  /** q82 (added r8) — QUALITY-FILTER rule chain (the Gopher/C4-style
    * pre-dedup gate): each document is graded against independent
    * rule booleans — token-count bounds, mean-token-length bounds,
    * distinct-token (repetition) ratio, and stopword presence — plus the
    * conjunction `passed`. Emitting the per-rule booleans (not just the
    * verdict) is the point: a pipeline tunes thresholds from the rule-level
    * rejection profile. Every rule is per-row codegen'd scalar arithmetic —
    * no explode, no HOF lambda (mean token length via
    * `length(replace(text,' ','')) / n_toks`, not a per-token transform),
    * no shuffle until the output sort — so the filter runs at scan speed
    * at any corpus size.
    */
  val q82 = Q(
    "q82_quality_filter",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("n_toks", size(col("toks")))
      .withColumn("mean_len",
        length(regexp_replace(col("text"), " ", "")).cast("double") / col("n_toks"))
      .withColumn("dist_ratio",
        size(array_distinct(col("toks"))).cast("double") / col("n_toks"))
      .select(
        col("doc_id"),
        col("n_toks"),
        Det.round6(col("mean_len")).as("mean_tok_len"),
        Det.round6(col("dist_ratio")).as("dist_ratio"),
        (col("n_toks") >= 10 && col("n_toks") <= 1000).as("r_len"),
        (col("mean_len") >= 3.0 && col("mean_len") <= 10.0).as("r_word_len"),
        (col("dist_ratio") >= 0.3).as("r_repetition"),
        arrays_overlap(col("toks"), array(lit("the"), lit("a"))).as("r_stopword"))
      .withColumn("passed",
        col("r_len") && col("r_word_len") && col("r_repetition") && col("r_stopword"))
      .orderBy("doc_id"),
    Some("""WITH f AS (
              SELECT doc_id,
                     len(regexp_split_to_array(text, ' +')) AS n_toks,
                     length(replace(text, ' ', ''))::DOUBLE
                       / len(regexp_split_to_array(text, ' +')) AS mean_len,
                     len(list_distinct(regexp_split_to_array(text, ' +')))::DOUBLE
                       / len(regexp_split_to_array(text, ' +')) AS dist_ratio,
                     len(list_intersect(regexp_split_to_array(text, ' +'),
                                        ['the', 'a'])) > 0 AS r_stopword
              FROM documents)
            SELECT doc_id, n_toks,
                   round(mean_len, 6) AS mean_tok_len,
                   round(dist_ratio, 6) AS dist_ratio,
                   n_toks BETWEEN 10 AND 1000 AS r_len,
                   mean_len >= 3.0 AND mean_len <= 10.0 AS r_word_len,
                   dist_ratio >= 0.3 AS r_repetition,
                   r_stopword,
                   (n_toks BETWEEN 10 AND 1000) AND mean_len >= 3.0
                     AND mean_len <= 10.0 AND dist_ratio >= 0.3
                     AND r_stopword AS passed
            FROM f ORDER BY doc_id"""))

  /** q91 (added r8) — deterministic K-PER-STRATUM sampling: exactly 20
    * docs per lang, chosen by ranking a Knuth multiplicative hash of the
    * id — the exact-count complement of q72's fraction-based sampler, and
    * unlike q72's xxhash64 membership the permutation is plain int64
    * arithmetic (`(id · 2654435761) mod (2³¹−1)`), so DuckDB reproduces it
    * and the sample is ORACLE-GRADED, reproducible across engines and
    * partitionings. The rank-≤-k filter compiles to WindowGroupLimit
    * (Spark's windowed top-k pushdown, same as q25): each partition keeps
    * a 20-row heap per lang — no full per-stratum sort materializes.
    */
  val q91 = Q(
    "q91_sample_k_per_stratum",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("h", pmod(col("doc_id") * lit(2654435761L), lit(2147483647L)))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("lang"), col("rnk"), col("doc_id"), col("h"))
        .orderBy("lang", "rnk")
    },
    Some("""WITH h AS (
              SELECT lang, doc_id,
                     (doc_id * 2654435761) % 2147483647 AS h
              FROM documents)
            SELECT lang,
                   row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk,
                   doc_id, h
            FROM h QUALIFY rnk <= 20 ORDER BY lang, rnk"""))

  /** q92 (added r8) — LENGTH-QUARTILE bucketing: `ntile(4)` over n_chars
    * per lang, reduced to per-bucket stats — the length-stratified
    * sharding step (curriculum buckets, padding-efficient batching) and
    * the inventory's NTILE coverage. The window partitions by lang with a
    * total (n_chars, doc_id) order; the bucket aggregation reuses the
    * window's lang hash partitioning.
    */
  val q92 = Q(
    "q92_length_quartiles",
    (s, d) => {
      val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .groupBy("lang", "quartile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("lang", "quartile")
    },
    Some("""WITH b AS (
              SELECT lang, n_chars,
                     ntile(4) OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS quartile
              FROM documents)
            SELECT lang, quartile, count(*) AS n_docs,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM b GROUP BY lang, quartile ORDER BY lang, quartile"""))

  /** q87 (added r8) — CHUNK-level exact dedup: q80's overlapping token
    * windows grouped by chunk text, keeping spans that occur more than
    * once — the C4-style "remove any span that repeats across the corpus"
    * primitive, the granularity BETWEEN whole-doc exact dedup (q42) and
    * within-doc repetition (q88). One generator + one aggregation; the
    * group key is the chunk text itself here (the output needs it) — the
    * 100 TB form groups on `xxhash64(chunk_text)` first and re-attaches
    * text for the survivors only, so the shuffle moves 8-byte keys, not
    * spans.
    */
  val q87 = Q(
    "q87_chunk_dedup",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        when(col("n") <= 8, lit(1L))
          .otherwise(ceil((col("n") - 8).cast("double") / 6.0).cast("long") + 1L))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("toks"), (col("chunk_id") * 6 + 1).cast("int"), lit(8)))
          .as("chunk_text"))
      .groupBy("chunk_text")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_occ") > 1)
      .orderBy("chunk_text"),
    Some("""WITH t AS (
              SELECT doc_id, regexp_split_to_array(text, ' +') AS toks,
                     len(regexp_split_to_array(text, ' +')) AS n
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     unnest(generate_series(0,
                       CASE WHEN n <= 8 THEN 0
                            ELSE ceil((n - 8) / 6.0)::BIGINT END)) AS chunk_id
              FROM t),
            ch AS (
              SELECT doc_id,
                     array_to_string(toks[(chunk_id * 6 + 1):(chunk_id * 6 + 8)], ' ') AS chunk_text
              FROM c)
            SELECT chunk_text, count(*) AS n_occ,
                   count(DISTINCT doc_id) AS n_docs, min(doc_id) AS first_doc
            FROM ch GROUP BY chunk_text HAVING count(*) > 1
            ORDER BY chunk_text"""))

  /** q88 (added r8) — WITHIN-doc repetition ratio: share of a document's
    * word 3-grams that are duplicates of an earlier 3-gram in the same
    * document — the Gopher "repetition" quality signal (its doc-level
    * complement is q87's cross-corpus span dedup). Distinct-shingle
    * counting rides the same codegen'd `graft_shingles` kernel as the
    * q60 containment join; everything is per-row scalar arithmetic, no
    * shuffle before the output sort.
    */
  val q88 = Q(
    "q88_repetition_ratio",
    (s, d) => {
      graft.functions.SetExprs.register(s)
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " +"))
        .withColumn("n_grams", greatest(size(col("toks")) - 2, lit(0)))
        .withColumn("n_distinct",
          size(graft.functions.SetExprs.shinglesCol(col("toks"), lit(3))))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          when(col("n_grams") > 0,
            Det.round6(lit(1.0) - col("n_distinct").cast("double") / col("n_grams")))
            .otherwise(lit(0.0)).as("dup_ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH f AS (
              SELECT doc_id,
                     greatest(len(regexp_split_to_array(text, ' +')) - 2, 0) AS n_grams,
                     CASE WHEN len(regexp_split_to_array(text, ' +')) >= 3 THEN
                       len(list_distinct(list_transform(
                         generate_series(1, len(regexp_split_to_array(text, ' +')) - 2),
                         i -> array_to_string(regexp_split_to_array(text, ' +')[i:i+2], ' '))))
                     ELSE 0 END AS n_distinct
              FROM documents)
            SELECT doc_id, n_grams, n_distinct,
                   CASE WHEN n_grams > 0
                        THEN round(1.0 - n_distinct::DOUBLE / n_grams, 6)
                        ELSE 0.0 END AS dup_ratio
            FROM f ORDER BY doc_id"""))

  /** q85 (added r7) — corpus MIXTURE report: per (lang, source) document
    * and token counts plus each slice's share of the total token budget —
    * the data-mixture planning table every pretraining run starts from
    * (and the denominator q72's stratified fractions are chosen against).
    * Token counts come from `size(split(…))` — a per-row codegen'd scalar,
    * no explode — so the whole query is one partial+final aggregation on
    * (lang, source). The corpus total rides in as a 1-row broadcast
    * crossJoin (the q68 pattern), NOT an unpartitioned window: an empty
    * `Window.partitionBy()` funnels every group through ONE task, which is
    * exactly the serialization a 100 TB mixture report cannot afford.
    * Share is ROUND(,6) per the determinism protocol.
    */
  val q85 = Q(
    "q85_mixture_report",
    (s, d) => {
      val t = Tables.documents(s, d)
        .select(col("lang"), col("source"),
          size(split(col("text"), " +")).cast("long").as("n"))
      // ONE corpus pass: the grouped relation is group-count-sized, so the
      // corpus total folds over IT, not over a second scan of the data;
      // the group agg's exchange is materialized once for both consumers
      // (ReuseExchange, ExplainSpec-pinned)
      val g = t.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      // totals over BOTH measures: the mixture is planned by doc share AND
      // token share — and aggregating both keeps this branch's partial agg
      // identical to g's, which is what lets ReuseExchange share the one
      // materialization (a single-measure total gets column-pruned into a
      // DIFFERENT exchange and silently re-scans the corpus)
      val tot = g.agg(sum(col("n_docs")).cast("double").as("totd"),
        sum(col("n_tokens")).cast("double").as("tott"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_docs") / col("totd"), 6).as("doc_share"),
          round(col("n_tokens") / col("tott"), 6).as("tok_share"))
        .orderBy("lang", "source")
    },
    Some("""WITH t AS (
              SELECT lang, source,
                     len(regexp_split_to_array(text, ' +'))::BIGINT AS n
              FROM documents),
            tot AS (SELECT count(*)::DOUBLE AS totd, sum(n)::DOUBLE AS tott FROM t)
            SELECT lang, source, count(*) AS n_docs, sum(n)::BIGINT AS n_tokens,
                   ROUND(count(*) / any_value(totd), 6) AS doc_share,
                   ROUND(sum(n) / any_value(tott), 6) AS tok_share
            FROM t CROSS JOIN tot GROUP BY lang, source
            ORDER BY lang, source"""))

  /** q105 (added r8) — deterministic NEGATIVE SAMPLING for contrastive
    * training: for each anchor doc (doc_id < 20), the 3 out-of-block
    * negatives (different (lang, source) — in-block docs risk being
    * near-dups, i.e. false negatives) ranked by the q91 engine-portable
    * Knuth hash of the (anchor, candidate) pair, so the sample is
    * reproducible across engines, partitionings, and reruns — the property
    * that makes a training set auditable. Plan: the bounded anchor side
    * broadcasts onto the corpus stream (q40's matrix shape) and the
    * per-anchor rank-≤-k compiles to WindowGroupLimit — O(k) per-partition
    * heaps, never a full per-anchor sort (ExplainSpec-pinned).
    */
  val q105 = Q(
    "q105_negative_sampling",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val anchors = docs.filter(col("doc_id") < 20)
        .select(col("doc_id").as("q_id"), col("lang").as("q_lang"),
          col("source").as("q_source"))
      val cand = docs.select(col("doc_id").as("neg_id"), col("lang"), col("source"))
      val h = pmod(col("neg_id") * lit(2654435761L) + col("q_id") * lit(40503L),
        lit(2147483647L))
      val w = Window.partitionBy("q_id").orderBy(col("h"), col("neg_id"))
      cand.join(broadcast(anchors),
          !(col("lang") === col("q_lang") && col("source") === col("q_source")))
        .withColumn("h", h)
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("rnk"), col("neg_id"), col("h"))
        .orderBy("q_id", "rnk")
    },
    Some("""SELECT q.doc_id AS q_id,
                   row_number() OVER (
                     PARTITION BY q.doc_id
                     ORDER BY (c.doc_id * 2654435761 + q.doc_id * 40503) % 2147483647,
                              c.doc_id) AS rnk,
                   c.doc_id AS neg_id,
                   (c.doc_id * 2654435761 + q.doc_id * 40503) % 2147483647 AS h
            FROM documents q JOIN documents c
              ON q.doc_id < 20
             AND NOT (c.lang = q.lang AND c.source = q.source)
            QUALIFY rnk <= 3
            ORDER BY q_id, rnk"""))

  /** q107 (added r8) — CORPUS DRIFT between snapshots: the q85 mixture
    * report computed for a base snapshot (doc_id < 250) and a new one
    * (doc_id ≥ 250) in ONE scan, emitting per-(lang, source) doc/token
    * counts for both plus the token-share DELTA — the monitoring table a
    * recurring ingestion watches to catch a crawl suddenly skewing toward
    * one source/language before it trains on it. Plan: one partial+final
    * agg over the scan (both snapshots' measures as conditional sums — no
    * second pass, no union), per-snapshot totals ride one 1-row broadcast
    * (q85's pattern); shares and drift are fixed IEEE expressions over
    * exactly-agreed integer sums, ROUND(,6).
    */
  val q107 = Q(
    "q107_corpus_drift",
    (s, d) => {
      val t = Tables.documents(s, d).select(
        col("lang"), col("source"),
        size(split(col("text"), " +")).cast("long").as("n"),
        (col("doc_id") >= 250).as("is_new"))
      // ONE corpus pass (the q85 pattern): per-snapshot totals fold over
      // the group-count-sized relation, whose exchange both consumers
      // share (ReuseExchange, ExplainSpec-pinned)
      val g = t.groupBy("lang", "source")
        .agg(
          sum(when(!col("is_new"), 1L).otherwise(0L)).as("docs_base"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("docs_new"),
          sum(when(!col("is_new"), col("n")).otherwise(0L)).as("tok_base"),
          sum(when(col("is_new"), col("n")).otherwise(0L)).as("tok_new"))
      // totals over all four grouped measures — identical partials to g's,
      // so ReuseExchange shares one materialization (see q85), and doc
      // drift comes free alongside token drift
      val tot = g.agg(
        sum(col("docs_base")).cast("double").as("totd_base"),
        sum(col("docs_new")).cast("double").as("totd_new"),
        sum(col("tok_base")).cast("double").as("tot_base"),
        sum(col("tok_new")).cast("double").as("tot_new"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("source"),
          col("docs_base"), col("docs_new"), col("tok_base"), col("tok_new"),
          round(col("docs_new").cast("double") / col("totd_new")
            - col("docs_base").cast("double") / col("totd_base"), 6).as("doc_drift"),
          round(col("tok_new").cast("double") / col("tot_new")
            - col("tok_base").cast("double") / col("tot_base"), 6).as("share_drift"))
        .orderBy("lang", "source")
    },
    Some("""WITH t AS (
              SELECT lang, source,
                     len(regexp_split_to_array(text, ' +'))::BIGINT AS n,
                     doc_id >= 250 AS is_new
              FROM documents),
            tot AS (
              SELECT sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END)::DOUBLE AS totd_base,
                     sum(CASE WHEN is_new THEN 1 ELSE 0 END)::DOUBLE AS totd_new,
                     sum(CASE WHEN NOT is_new THEN n ELSE 0 END)::DOUBLE AS tot_base,
                     sum(CASE WHEN is_new THEN n ELSE 0 END)::DOUBLE AS tot_new
              FROM t)
            SELECT lang, source,
                   sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END)::BIGINT AS docs_base,
                   sum(CASE WHEN is_new THEN 1 ELSE 0 END)::BIGINT AS docs_new,
                   sum(CASE WHEN NOT is_new THEN n ELSE 0 END)::BIGINT AS tok_base,
                   sum(CASE WHEN is_new THEN n ELSE 0 END)::BIGINT AS tok_new,
                   ROUND(sum(CASE WHEN is_new THEN 1 ELSE 0 END)::DOUBLE / any_value(totd_new)
                         - sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END)::DOUBLE / any_value(totd_base),
                         6) AS doc_drift,
                   ROUND(sum(CASE WHEN is_new THEN n ELSE 0 END)::DOUBLE / any_value(tot_new)
                         - sum(CASE WHEN NOT is_new THEN n ELSE 0 END)::DOUBLE / any_value(tot_base),
                         6) AS share_drift
            FROM t CROSS JOIN tot
            GROUP BY lang, source ORDER BY lang, source"""))

  /** q113 (added r8) — COMPRESSION-RATIO quality signal: deflate-level-6
    * ratio per document ([[graft.functions.ZlibOps]] codegen expression)
    * + a repetition flag, the model-free redundancy gate Gopher-style
    * quality pipelines run alongside q51's heuristics and q88's token
    * repetition ratio (this one sees CHARACTER-level boilerplate those
    * miss). Engine-hash grade (no zlib in DuckDB — cross-library
    * byte-identical deflate is not a writable contract); determinism,
    * bounds, and repetitive-vs-prose separation are pinned in
    * PipelineSpec. Scale: pure per-row scalar inside whole-stage codegen
    * — scan-bound at any corpus size, no shuffle before the output sort.
    */
  val q113 = Q(
    "q113_compression_ratio",
    (s, d) => {
      graft.functions.ZlibExprs.register(s)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("n_chars"),
          round(graft.functions.ZlibExprs.compressionRatio(col("text")), 6)
            .as("ratio"))
        .withColumn("is_repetitive", col("ratio") < 0.35)
        .orderBy("doc_id")
    },
    None)

  /** q114 (added r8) — HEAVY-HITTERS token frequency via the MERGEABLE
    * Misra–Gries sketch ([[graft.functions.FreqItemsSketch]]): top-20
    * tokens by estimated count. At capacity 256 ≥ the corpus vocabulary
    * no counter is ever evicted, so every estimate is EXACT and the row
    * is DuckDB-oracle-graded against a plain GROUP BY count; the
    * small-capacity eviction path and its `N/(capacity+1)` undercount
    * bound are pinned in PipelineSpec. Scale: per-partition state is
    * O(capacity) — not O(vocabulary) — and partial buffers merge
    * associatively through ObjectHashAggregate, which is the difference
    * between profiling token/URL/domain frequencies over 100 TB with a
    * fixed memory budget and shuffling billions of group keys.
    */
  val q114 = Q(
    "q114_frequent_items",
    (s, d) => {
      graft.functions.SketchExprs.register(s)
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " +")).as("token"))
        .filter(length(col("token")) > 0)
        .agg(graft.functions.SketchExprs.freqItems(col("token"), lit(256))
          .as("sketch"))
        .select(explode(col("sketch")).as("e"))
        .select(col("e.item").as("token"), col("e.est").as("est"))
        .orderBy(desc("est"), col("token"))
        .limit(20)
    },
    Some("""WITH t AS (SELECT unnest(regexp_split_to_array(lower(text), ' +')) AS token
                       FROM documents)
            SELECT token, count(*)::BIGINT AS est
            FROM t WHERE len(token) > 0
            GROUP BY token ORDER BY est DESC, token LIMIT 20"""))

  /** q127 (added r8) — MIXTURE REBALANCING plan: per-language
    * downsample-only rates that move the corpus toward a uniform language
    * mixture — `rate = min(1, target_share / actual_share)` and the doc
    * count that survives — the planning table between q85's mixture
    * REPORT and q72/q91's sampling EXECUTION (rate feeds the hash
    * predicate directly). Downsample-only is the declared semantics:
    * upsampling is a training-loop decision, not a data-prep one. One
    * partial+final agg + a 1-row broadcast total (q85's shape); all
    * arithmetic is fixed-order IEEE over exactly-agreed integer counts.
    */
  val q127 = Q(
    "q127_mixture_rebalance",
    (s, d) => {
      val g = Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"))
      val tot = g.agg(sum(col("n_docs")).cast("double").as("n_total"),
        count(lit(1)).cast("double").as("n_langs"))
      g.crossJoin(broadcast(tot))
        .withColumn("share", col("n_docs").cast("double") / col("n_total"))
        .withColumn("target_share", lit(1.0) / col("n_langs"))
        .withColumn("rate",
          least(lit(1.0), col("target_share") / col("share")))
        .select(col("lang"), col("n_docs"),
          round(col("share"), 6).as("share"),
          round(col("target_share"), 6).as("target_share"),
          round(col("rate"), 6).as("rate"),
          floor(col("n_docs") * col("rate")).cast("bigint").as("n_keep"))
        .orderBy("lang")
    },
    Some("""WITH g AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
                 tot AS (SELECT sum(n_docs)::DOUBLE AS n_total,
                                count(*)::DOUBLE AS n_langs FROM g)
            SELECT lang, n_docs,
                   round(n_docs::DOUBLE / n_total, 6) AS share,
                   round(1.0 / n_langs, 6) AS target_share,
                   round(least(1.0, (1.0 / n_langs) / (n_docs::DOUBLE / n_total)), 6) AS rate,
                   floor(n_docs * least(1.0, (1.0 / n_langs) / (n_docs::DOUBLE / n_total)))::BIGINT AS n_keep
            FROM g CROSS JOIN tot ORDER BY lang"""))

  /** q130 (added r8) — CHI-SQUARE contingency audit: observed vs
    * independence-expected counts for the lang × source cross-tab, with
    * each cell's χ² contribution — the statistical dependence screen a
    * mixture pipeline runs before treating lang and source as independent
    * sampling axes (q72/q91/q127 all implicitly assume it). All three
    * marginal relations are GROUP-sized and broadcast back onto the cell
    * relation; expected counts and contributions are fixed-order IEEE
    * over exactly-agreed integer counts, ROUND(,6) in the output.
    */
  val q130 = Q(
    "q130_chi_square",
    (s, d) => {
      val g = Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val lt = g.groupBy("lang").agg(sum(col("n")).as("lang_tot"))
      val st = g.groupBy("source").agg(sum(col("n")).as("src_tot"))
      val tot = g.agg(sum(col("n")).cast("double").as("n_total"))
      g.join(broadcast(lt), "lang")
        .join(broadcast(st), "source")
        .crossJoin(broadcast(tot))
        .withColumn("expected",
          col("lang_tot").cast("double") * col("src_tot").cast("double")
            / col("n_total"))
        .select(col("lang"), col("source"), col("n"),
          round(col("expected"), 6).as("expected"),
          round((col("n").cast("double") - col("expected"))
            * (col("n").cast("double") - col("expected")) / col("expected"), 6)
            .as("chi2_contrib"))
        .orderBy("lang", "source")
    },
    Some("""WITH g AS (SELECT lang, source, count(*) AS n
                       FROM documents GROUP BY 1, 2),
                 lt AS (SELECT lang, sum(n) AS lang_tot FROM g GROUP BY 1),
                 st AS (SELECT source, sum(n) AS src_tot FROM g GROUP BY 1),
                 tot AS (SELECT sum(n)::DOUBLE AS n_total FROM g)
            SELECT g.lang, g.source, n,
                   round(lang_tot::DOUBLE * src_tot::DOUBLE / n_total, 6) AS expected,
                   round((n::DOUBLE - lang_tot::DOUBLE * src_tot::DOUBLE / n_total)
                         * (n::DOUBLE - lang_tot::DOUBLE * src_tot::DOUBLE / n_total)
                         / (lang_tot::DOUBLE * src_tot::DOUBLE / n_total), 6)
                     AS chi2_contrib
            FROM g JOIN lt USING (lang) JOIN st USING (source)
            CROSS JOIN tot
            ORDER BY g.lang, g.source"""))

  /** q132 (added r8) — ROC-AUC of a score against a binary label, the
    * classifier-eval primitive every filter model in a data pipeline is
    * judged by (here: does a length-derived score predict `lang = 'en'`?).
    * Computed as the tie-corrected Mann–Whitney statistic
    * `AUC = Σ_s n_pos(s)·(2·cum_neg(<s) + n_neg(s)) / (2·N⁺·N⁻)` — the
    * numerator stays in EXACT INTEGERS until the single final division,
    * so the hash is engine- and order-proof (a per-row global rank window
    * would both funnel 100 TB through one task and sum doubles in
    * arbitrary order). The cumulative window runs over the GROUP-SIZED
    * distinct-score relation, never the corpus.
    */
  val q132 = Q(
    "q132_auc_eval",
    (s, d) => {
      val scored = Tables.documents(s, d).select(
        expr("n_chars div 50").as("score"),
        when(col("lang") === "en", 1L).otherwise(0L).as("label"))
      val byScore = scored.groupBy("score")
        .agg(sum(col("label")).as("n_pos"),
          sum(lit(1L) - col("label")).as("n_neg"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byScore.withColumn("cum_neg",
        coalesce(sum(col("n_neg")).over(w), lit(0L)))
      ranked.agg(
        sum(col("n_pos")).as("total_pos"),
        sum(col("n_neg")).as("total_neg"),
        sum(col("n_pos") * (col("cum_neg") * 2 + col("n_neg"))).as("num"))
        .select(col("total_pos").as("n_pos"), col("total_neg").as("n_neg"),
          round(col("num").cast("double")
            / (col("total_pos").cast("double") * col("total_neg") * 2), 6)
            .as("auc"))
    },
    Some("""WITH scored AS (
              SELECT CAST(n_chars // 50 AS BIGINT) AS score,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
              FROM documents),
            g AS (SELECT score, sum(label)::BIGINT AS n_pos,
                         sum(1 - label)::BIGINT AS n_neg
                  FROM scored GROUP BY 1),
            r AS (SELECT score, n_pos, n_neg,
                         coalesce(sum(n_neg) OVER (ORDER BY score
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0)::BIGINT AS cum_neg
                  FROM g)
            SELECT sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg,
                   round(sum(n_pos * (cum_neg * 2 + n_neg))::DOUBLE
                         / (sum(n_pos)::DOUBLE * sum(n_neg) * 2), 6) AS auc
            FROM r"""))

  /** q136 (added r8) — COHEN'S KAPPA: chance-corrected agreement between
    * q50's "en-like" heuristic rater and the truth label (`lang = 'en'`)
    * — the annotation-pipeline primitive (rater-vs-rater, model-vs-gold)
    * that raw accuracy overstates whenever classes are imbalanced. With
    * a 2×2 confusion (n = total, n11/n00 = agreements, a1/b1 = each
    * rater's positives) the statistic reduces to
    * `κ = (n·(n11+n00) − (a1·b1 + a0·b0)) / (n² − (a1·b1 + a0·b0))` —
    * EXACT INTEGERS until the one final division, so the hash is engine-
    * and order-proof. One partial+final aggregation over the corpus.
    */
  val q136 = Q(
    "q136_cohens_kappa",
    (s, d) => {
      val rated = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " +"))
        .withColumn("n_func",
          size(filter(col("toks"), t => t === "a" || t === "the")))
        .select(
          when(col("n_func").cast("double") / size(col("toks")) >= 0.08, 1L)
            .otherwise(0L).as("a"),
          when(col("lang") === "en", 1L).otherwise(0L).as("b"))
      rated.agg(
        count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"),
        sum(col("a")).as("a1"),
        sum(col("b")).as("b1"))
        .select(col("n"), col("n11"), col("n00"), col("a1"), col("b1"),
          round((col("n11") + col("n00")).cast("double") / col("n"), 6)
            .as("p_observed"),
          round((col("n") * (col("n11") + col("n00"))
            - (col("a1") * col("b1") + (col("n") - col("a1")) * (col("n") - col("b1"))))
            .cast("double")
            / (col("n") * col("n")
              - (col("a1") * col("b1") + (col("n") - col("a1")) * (col("n") - col("b1")))),
            6).as("kappa"))
    },
    Some("""WITH r AS (
              SELECT CASE WHEN len(list_filter(regexp_split_to_array(text, ' +'),
                                               t -> t = 'a' OR t = 'the'))::DOUBLE
                               / len(regexp_split_to_array(text, ' +')) >= 0.08
                          THEN 1 ELSE 0 END AS a,
                     CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS b
              FROM documents),
            c AS (SELECT count(*)::BIGINT AS n,
                         sum(a * b)::BIGINT AS n11,
                         sum((1 - a) * (1 - b))::BIGINT AS n00,
                         sum(a)::BIGINT AS a1, sum(b)::BIGINT AS b1
                  FROM r)
            SELECT n, n11, n00, a1, b1,
                   round((n11 + n00)::DOUBLE / n, 6) AS p_observed,
                   round((n * (n11 + n00)
                          - (a1 * b1 + (n - a1) * (n - b1)))::DOUBLE
                         / (n * n - (a1 * b1 + (n - a1) * (n - b1))), 6)
                     AS kappa
            FROM c"""))

  /** q138 (added r8) — TEMPERATURE-SCALED mixture weights: the α-scaled
    * multilingual sampling distribution `w_i ∝ p_i^α` (Lample & Conneau
    * 2019's XLM recipe; the knob every multilingual pretraining mixture
    * uses to lift low-resource languages without drowning high-resource
    * ones). α is pinned to 0.5 so the power is `sqrt` — IEEE-754 requires
    * sqrt to be CORRECTLY rounded, so each term agrees bit-for-bit across
    * engines where a general `pow(x, 0.3)` would not; terms are ROUND(,6)
    * then summed as exact DECIMAL (the round-terms-then-sums protocol), so
    * engine summation order cannot move the normalizer. Completes the
    * mixture family: q85 reports, q138 reweights, q127 plans the
    * downsample, q72/q91 execute. Scale: two group-sized aggregations and
    * two 1-row broadcasts — the corpus is touched once.
    */
  val q138 = Q(
    "q138_mixture_temperature",
    (s, d) => {
      val g = Tables.documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("lang_chars"))
      val tot = g.agg(sum(col("lang_chars")).cast("double").as("total_chars"))
      val p = g.crossJoin(broadcast(tot))
        .withColumn("nat_share",
          col("lang_chars").cast("double") / col("total_chars"))
        .withColumn("sq",
          round(sqrt(col("nat_share")), 6).cast("decimal(18,6)"))
      val dn = p.agg(sum(col("sq")).as("denom")) // exact decimal sum
      p.crossJoin(broadcast(dn))
        .select(col("lang"), col("n_docs"), col("lang_chars"),
          round(col("nat_share"), 6).as("nat_share"),
          round(col("sq").cast("double") / col("denom").cast("double"), 6)
            .as("temp_weight"),
          // fixed-order IEEE: (sq / denom) / nat_share, then round
          round(col("sq").cast("double") / col("denom").cast("double")
            / col("nat_share"), 6).as("boost"))
        .orderBy("lang")
    },
    Some("""WITH g AS (SELECT lang, count(*) AS n_docs,
                              sum(n_chars)::BIGINT AS lang_chars
                       FROM documents GROUP BY 1),
                 tot AS (SELECT sum(lang_chars)::DOUBLE AS total_chars FROM g),
                 p AS (SELECT lang, n_docs, lang_chars,
                              lang_chars::DOUBLE / total_chars AS nat_share,
                              round(sqrt(lang_chars::DOUBLE / total_chars), 6)::DECIMAL(18,6) AS sq
                       FROM g CROSS JOIN tot),
                 dn AS (SELECT sum(sq) AS denom FROM p)
            SELECT lang, n_docs, lang_chars,
                   round(nat_share, 6) AS nat_share,
                   round(sq::DOUBLE / denom::DOUBLE, 6) AS temp_weight,
                   round(sq::DOUBLE / denom::DOUBLE / nat_share, 6) AS boost
            FROM p CROSS JOIN dn ORDER BY lang"""))

  /** q139 (added r8) — TOKEN-BUDGET curation: per language, keep the
    * highest-quality documents best-first until half the language's
    * whitespace tokens are spent — the budget-constrained selection step
    * between scoring (q51/q82) and mixture execution (q72/q91). Quality
    * is an EXACT-INTEGER rank (alphabetic chars per million of n_chars,
    * integer division) and the budget predicate is exact-integer
    * (`2·cum ≤ lang_total`), so no float compare can reorder or
    * tie-flip the greedy frontier across engines; doc_id breaks score
    * ties. Scale: the cumulative window is PARTITIONED BY lang (per-key,
    * distributes like q25 — never a global ORDER BY window); for a single
    * pathologically large key, [[graft.ops.Curation.tokenBudgetSelect]]
    * ships the SAME selection with bucket-bounded windows (spec-proven
    * equal in CurationSpec, frontier ties included).
    */
  val q139 = Q(
    "q139_token_budget_select",
    (s, d) => {
      val t = Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " +")).as("n_tok"),
          expr("CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS BIGINT)" +
            " * 1000000 DIV n_chars").as("score_ppm"))
      val wCum = Window.partitionBy("lang")
        .orderBy(col("score_ppm").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.partitionBy("lang")
      t.withColumn("cum_tok", sum(col("n_tok")).over(wCum))
        .withColumn("lang_tok", sum(col("n_tok")).over(wTot))
        .filter(col("cum_tok") * 2 <= col("lang_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs_sel"),
          sum(col("n_tok")).cast("bigint").as("n_tok_sel"),
          max(col("lang_tok")).cast("bigint").as("lang_tok"))
        .select(col("lang"), col("n_docs_sel"), col("n_tok_sel"), col("lang_tok"),
          round(col("n_tok_sel").cast("double") / col("lang_tok").cast("double"), 6)
            .as("tok_share"))
        .orderBy("lang")
    },
    Some("""WITH t AS (
              SELECT doc_id, lang,
                     len(regexp_split_to_array(text, ' +')) AS n_tok,
                     length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))::BIGINT
                       * 1000000 // n_chars AS score_ppm
              FROM documents WHERE length(text) > 0),
            c AS (
              SELECT lang, n_tok,
                     sum(n_tok) OVER (PARTITION BY lang
                                      ORDER BY score_ppm DESC, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS cum_tok,
                     sum(n_tok) OVER (PARTITION BY lang) AS lang_tok
              FROM t)
            SELECT lang, count(*) AS n_docs_sel,
                   sum(n_tok)::BIGINT AS n_tok_sel,
                   max(lang_tok)::BIGINT AS lang_tok,
                   round(sum(n_tok)::DOUBLE / max(lang_tok)::DOUBLE, 6) AS tok_share
            FROM c WHERE cum_tok * 2 <= lang_tok
            GROUP BY lang ORDER BY lang"""))

  /** q146 (added r9) — CHUNK SCRUB + RECONSTRUCTION: the sub-document
    * dedup step the C4/RefinedWeb lineage applies BEFORE doc-level dedup —
    * where q87 REPORTS duplicated chunks, this REMOVES them and rebuilds
    * the documents: every repeated 10-word chunk survives only at its
    * first occurrence (min doc_id, then min position — two nested min
    * aggregations, both skew-safe partial+final aggs, never a window over
    * the hot chunk text), surviving chunks reassemble per doc in position
    * order (`sort_array` over the group-bounded chunk list — q98's rule),
    * and the audit row reports per-doc retention + rebuilt length. A doc
    * whose every chunk is elsewhere-first keeps 0 (the LEFT join from the
    * totals side makes that row explicit, not absent). Non-overlapping
    * windows (vs q87's stride-6 detection windows) so the reconstruction
    * is a partition of the original token stream.
    */
  val q146 = Q(
    "q146_chunk_scrub",
    (s, d) => {
      val ch = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " +").as("toks"))
        .withColumn("n", size(col("toks")))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(0L),
            ceil(col("n").cast("double") / 10.0).cast("long") - 1L)).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          concat_ws(" ", slice(col("toks"),
            (col("chunk_id") * 10 + 1).cast("int"), lit(10))).as("chunk_text"))
      val firstDoc = ch.groupBy(col("chunk_text").as("ft"))
        .agg(min(col("doc_id")).as("fdoc"))
      val firstPos = ch
        .join(firstDoc, col("chunk_text") === col("ft") && col("doc_id") === col("fdoc"))
        .groupBy(col("ft").as("kt"), col("fdoc").as("kdoc"))
        .agg(min(col("chunk_id")).as("kpos"))
      val kept = ch.join(firstPos,
        col("chunk_text") === col("kt") && col("doc_id") === col("kdoc") &&
          col("chunk_id") === col("kpos"))
      val tot = ch.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      val ka = kept.groupBy(col("doc_id").as("adoc"))
        .agg(count(lit(1)).as("n_kept"),
          length(array_join(
            transform(sort_array(collect_list(struct(col("chunk_id"), col("chunk_text")))),
              x => x.getField("chunk_text")), " ")).cast("long").as("n_chars_kept"))
      tot.join(ka, col("doc_id") === col("adoc"), "left")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          round(coalesce(col("n_kept"), lit(0L)).cast("double") / col("n_chunks"), 6)
            .as("retention"),
          coalesce(col("n_chars_kept"), lit(0L)).as("n_chars_kept"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, regexp_split_to_array(text, ' +') AS toks,
                     len(regexp_split_to_array(text, ' +')) AS n
              FROM documents),
            c AS (
              SELECT doc_id, toks,
                     unnest(generate_series(0, ceil(n / 10.0)::BIGINT - 1)) AS chunk_id
              FROM t),
            ch AS (
              SELECT doc_id, chunk_id,
                     array_to_string(toks[chunk_id*10 + 1 : chunk_id*10 + 10], ' ')
                       AS chunk_text
              FROM c),
            fd AS (SELECT chunk_text AS ft, min(doc_id) AS fdoc
                   FROM ch GROUP BY 1),
            fp AS (SELECT ft, fdoc, min(chunk_id) AS fpos
                   FROM ch JOIN fd ON ch.chunk_text = fd.ft AND ch.doc_id = fd.fdoc
                   GROUP BY 1, 2),
            k AS (SELECT ch.doc_id, ch.chunk_id, ch.chunk_text
                  FROM ch JOIN fp ON ch.chunk_text = fp.ft
                    AND ch.doc_id = fp.fdoc AND ch.chunk_id = fp.fpos),
            tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1),
            ka AS (SELECT doc_id, count(*) AS n_kept,
                          len(string_agg(chunk_text, ' ' ORDER BY chunk_id)) AS n_chars_kept
                   FROM k GROUP BY 1)
            SELECT tot.doc_id, n_chunks,
                   coalesce(n_kept, 0) AS n_kept,
                   round(coalesce(n_kept, 0)::DOUBLE / n_chunks, 6) AS retention,
                   coalesce(n_chars_kept, 0)::BIGINT AS n_chars_kept
            FROM tot LEFT JOIN ka ON tot.doc_id = ka.doc_id
            ORDER BY tot.doc_id"""))

  def all: Seq[Q] = Seq(q48, q49, q50, q51, q52, q53, q54, q55, q56, q57, q58,
    q72, q73, q78, q80, q81, q82, q85, q87, q88, q91, q92, q105, q107, q113,
    q114, q127, q130, q132, q136, q138, q139, q146)
}
