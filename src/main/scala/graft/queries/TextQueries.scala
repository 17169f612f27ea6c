package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Det, Tables}
import graft.ops.SimilarityJoin

/** SURVEY.md §2 rows 30–35, 38, 42: text / array / JSON / struct operators
  * plus the edit-distance join and exact dedup.
  *
  * All array work uses codegen'd built-ins and higher-order functions —
  * no UDFs. The explode-based queries are Catalyst `Generator`s (Hive UDTF
  * equivalent); JSON stays a string column probed with `get_json_object`
  * (no pre-parse — predicate/projection pushdown keeps the scan narrow).
  */
object TextQueries {

  // ---- 30. array functions ------------------------------------------------
  val q30 = Q(
    "q30_array_ops",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("dist", array_distinct(col("toks")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_toks"),
        size(col("dist")).as("n_dist"),
        array_contains(col("toks"), "spark").as("has_spark"),
        element_at(sort_array(col("dist")), 1).as("first_tok"),
        element_at(sort_array(col("dist")), -1).as("last_tok"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   len(regexp_split_to_array(text, ' +')) AS n_toks,
                   len(list_distinct(regexp_split_to_array(text, ' +'))) AS n_dist,
                   list_contains(regexp_split_to_array(text, ' +'), 'spark') AS has_spark,
                   list_sort(list_distinct(regexp_split_to_array(text, ' +')))[1] AS first_tok,
                   list_sort(list_distinct(regexp_split_to_array(text, ' +')))[-1] AS last_tok
            FROM documents ORDER BY doc_id"""))

  // ---- 31. explode / unnest (inverted index, Vernica stage 1) --------------
  val q31 = Q(
    "q31_explode_unnest",
    (s, d) => Tables.documents(s, d)
      .select(explode(array_distinct(split(col("text"), " +"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("doc_count"))
      .orderBy("token"),
    Some("""SELECT token, count(*) AS doc_count FROM (
              SELECT unnest(list_distinct(regexp_split_to_array(text, ' +'))) AS token
              FROM documents)
            GROUP BY token ORDER BY token"""))

  // ---- 32. JSON extraction --------------------------------------------------
  val q32 = Q(
    "q32_json_extract",
    (s, d) => Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") / count(lit(1)), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
                   CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
                   round(CAST(sum(json_extract(props, '$.k')::BIGINT) AS DOUBLE) / count(*), 4) AS avg_k,
                   min(json_extract(props, '$.k')::BIGINT) AS min_k,
                   max(json_extract(props, '$.k')::BIGINT) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""))

  // ---- 33. struct / map operations (scalar-extracted output) ----------------
  val q33 = Q(
    "q33_struct_ops",
    (s, d) => Tables.events(s, d)
      .withColumn("st", struct(col("event_type").as("t"), col("value").as("v")))
      .withColumn("m", map_from_arrays(
        array(lit("a"), lit("b")), array(col("value"), col("value") * 2)))
      .select(
        col("event_id"),
        col("st").getField("t").as("t"),
        col("st").getField("v").as("v"),
        element_at(col("m"), "b").as("v2"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   struct_extract(struct_pack(t := event_type, v := value), 't') AS t,
                   struct_extract(struct_pack(t := event_type, v := value), 'v') AS v,
                   value * 2 AS v2
            FROM events ORDER BY event_id"""))

  // ---- 34. token statistics ---------------------------------------------------
  val q34 = Q(
    "q34_tok_stats",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .withColumn("dist", array_distinct(col("toks")))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("dist")).as("n_distinct"),
        array_min(col("dist")).as("min_tok"),
        array_max(col("dist")).as("max_tok"),
        (col("n_chars") === length(col("text"))).as("chars_ok"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   len(regexp_split_to_array(text, ' +')) AS n_tokens,
                   len(list_distinct(regexp_split_to_array(text, ' +'))) AS n_distinct,
                   list_sort(list_distinct(regexp_split_to_array(text, ' +')))[1] AS min_tok,
                   list_sort(list_distinct(regexp_split_to_array(text, ' +')))[-1] AS max_tok,
                   n_chars = length(text) AS chars_ok
            FROM documents ORDER BY doc_id"""))

  // ---- 35. global token-frequency ordering (Vernica stage 1) -------------------
  val q35 = Q(
    "q35_token_freq_rank",
    (s, d) => SimilarityJoin.tokenFrequencyRanked(Tables.documents(s, d), "text")
      .orderBy("rnk"),
    Some("""SELECT token, df, rank() OVER (ORDER BY df, token) AS rnk FROM (
              SELECT token, count(*) AS df FROM (
                SELECT unnest(list_distinct(regexp_split_to_array(text, ' +'))) AS token
                FROM documents)
              GROUP BY token)
            ORDER BY rnk"""))

  // ---- 38. edit-distance similarity join -----------------------------------------
  // Distinct-first: p_name repeats heavily (64 distinct values at every
  // SF), so edit distance is verified once per distinct-name pair and
  // expanded back to id pairs by equi-join — the quadratic term is
  // O(|name domain|²), independent of row count. Open-domain fallback is
  // the Ed-Join gram-prefix path inside ops.EditDistanceJoin; equivalence
  // with brute force is property-pinned in EditDistanceJoinSpec.
  val q38 = Q(
    "q38_edit_distance_join",
    (s, d) => graft.ops.EditDistanceJoin.selfJoinDistinct(
        Tables.part(s, d), "p_partkey", "p_name", Seq("p_brand"), k = 2)
      .select(col("a_id").as("a_key"), col("b_id").as("b_key"),
        col("p_brand"), col("dist"))
      .orderBy("a_key", "b_key"),
    Some("""SELECT a.p_partkey AS a_key, b.p_partkey AS b_key, a.p_brand,
                   levenshtein(a.p_name, b.p_name) AS dist
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
            WHERE levenshtein(a.p_name, b.p_name) <= 2
            ORDER BY a_key, b_key"""))

  // ---- 42. exact deduplication -----------------------------------------------------
  // Keep-first by doc_id on normalized text; one shuffle on the hash of the
  // normalized key — the canonical exact-dedup plan at any scale.
  val q42 = Q(
    "q42_dedup_exact",
    (s, d) => {
      val w = Window.partitionBy(lower(trim(col("text")))).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("source")
        .agg(count(lit(1)).as("n_survivors"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_survivors FROM (
              SELECT source, row_number() OVER (PARTITION BY lower(trim(text))
                                                ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1 GROUP BY source ORDER BY source"""))

  /** q68 (added r6) — BM25 retrieval scoring (Robertson/Spärck Jones): top
    * 50 documents for a fixed 3-term query. The classic search-ranking
    * operator: tf per (doc, term), df per term, Robertson idf, length
    * normalization by dl/avgdl (k1 = 1.2, b = 0.75). All corpus statistics
    * stay distributed (the 1-row stats relation is crossJoin-broadcast, NOT
    * collected); the top-k is TakeOrderedAndProject, not a global window.
    * Per-term contributions are ROUND(,6) before the final sum so
    * summation order (engine-dependent) cannot move the rounded total.
    */
  val q68 = Q(
    "q68_bm25_rank",
    (s, d) => {
      val qTerms = Seq("join", "hash", "spark")
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
        .filter(col("tok").isin(qTerms: _*))
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " +")).cast("double").as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
      // r20: df from tf's per-token row count — see q115/Bm25/TfIdf
      val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      tf.join(broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("contrib", Det.round6(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * col("tf") * 2.2
            / (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))))
        .groupBy("doc_id")
        .agg(Det.round6(sum(col("contrib"))).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50)
    },
    Some("""WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok
              FROM documents),
            dl AS (
              SELECT doc_id, len(regexp_split_to_array(text, ' +'))::DOUBLE AS dl
              FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
            tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM tok
                   WHERE tok IN ('join', 'hash', 'spark') GROUP BY 1, 2),
            df AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                   WHERE tok IN ('join', 'hash', 'spark') GROUP BY 1),
            c AS (
              SELECT tf.doc_id,
                     ROUND(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS contrib
              FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
            SELECT doc_id, ROUND(sum(contrib), 6) AS score
            FROM c GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 50"""))

  /** q69 (added r7) — BM25 R-S retrieval: the query set is a RELATION (the
    * first 8 tokens of docs 0–4, id-offset by 10⁶), scored against the full
    * corpus through [[graft.ops.Bm25.scoreRS]] — every (query, doc) pair
    * flows through one distributed tf/df/dl/stats plan; top-10 per query.
    * Generalizes q68's fixed literal query to the form a real retrieval
    * pipeline runs (VERDICT r6 task 3).
    */
  val q69 = Q(
    "q69_bm25_rs",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val queries = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat_ws(" ", slice(split(col("text"), " +"), 1, 8)).as("text"))
      graft.ops.Bm25.scoreRS(queries, "doc_id", "text", docs, "doc_id", "text", k = 10)
        .withColumnRenamed("doc_id", "d_id")
    },
    Some("""WITH q AS (
              SELECT doc_id + 1000000 AS q_id,
                     unnest(list_distinct(regexp_split_to_array(text, ' +')[1:8])) AS tok
              FROM documents WHERE doc_id < 5),
            tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok
              FROM documents),
            dl AS (
              SELECT doc_id, len(regexp_split_to_array(text, ' +'))::DOUBLE AS dl
              FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
            tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM tok
                   WHERE tok IN (SELECT tok FROM q) GROUP BY 1, 2),
            df AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                   WHERE tok IN (SELECT tok FROM q) GROUP BY 1),
            c AS (
              SELECT q.q_id, tf.doc_id,
                     ROUND(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                           * tf.tf * 2.2
                           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS contrib
              FROM tf JOIN q USING (tok) JOIN df USING (tok)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
            SELECT q_id,
                   row_number() OVER (PARTITION BY q_id
                                      ORDER BY ROUND(sum(contrib), 6) DESC, doc_id) AS rnk,
                   doc_id AS d_id, ROUND(sum(contrib), 6) AS score
            FROM c GROUP BY q_id, doc_id
            QUALIFY rnk <= 10
            ORDER BY q_id, rnk"""))

  /** q76 (added r7) — corpus phrase statistics: top-50 word BIGRAMS by
    * occurrence count (with multiplicity — phrase mining wants frequencies,
    * not the per-doc sets the shingle joins use). One explode → one
    * count aggregation → TakeOrderedAndProject; ties at the cut are
    * impossible to mis-order because the sort key is (cnt DESC, bigram).
    *
    * Bigrams are built with codegen-NATIVE `arrays_zip` over the token
    * array and its 1-shifted slice — the `transform(sequence…)` HOF form
    * ran an interpreted lambda per bigram and measured 10.6 s at sf0.1
    * (the repo's standing lesson: HOF lambdas don't codegen); this form is
    * sub-second. The string concat happens AFTER the count aggregation, on
    * the few-hundred-row distinct-bigram relation, so the shuffle carries
    * a 2-field struct either way. A <2-token doc yields an empty zip and
    * contributes nothing.
    */
  val q76 = Q(
    "q76_bigram_counts",
    (s, d) => Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " +"))
      .select(explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1))).as("pr"))
      .groupBy("pr")
      .agg(count(lit(1)).as("cnt"))
      .select(concat_ws(" ", col("pr").getField("0"), col("pr").getField("1")).as("bigram"),
        col("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(50),
    Some("""WITH t AS (
              SELECT regexp_split_to_array(text, ' +') AS toks FROM documents),
            b AS (
              SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                           i -> toks[i] || ' ' || toks[i + 1])) AS bigram
              FROM t)
            SELECT bigram, count(*) AS cnt FROM b
            GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50"""))

  /** q77 (added r7) — PII-style masking: identifier digits in `c_name`
    * ("Customer#000000042") replaced with '#', plus the redaction count —
    * the cleanup transform every training-data pipeline runs before
    * publication. Pure per-row codegen'd regex (both engines replace
    * globally; DuckDB needs the explicit 'g' flag).
    */
  val q77 = Q(
    "q77_redact_pii",
    (s, d) => Tables.customer(s, d)
      .select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
        (length(col("c_name")) -
          length(regexp_replace(col("c_name"), "[0-9]", ""))).as("n_redacted"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
                   regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
                   length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS n_redacted
            FROM customer ORDER BY c_custkey"""))

  /** q79 (added r7) — source/sink fidelity, graded: the documents table
    * chained through THREE interchange round-trips (parquet → CSV → ORC →
    * JSONL, each schema-on-read per [[graft.sources.Formats]]'s
    * conventions), then aggregated per lang with a content checksum
    * (`sum(length(text))`). The oracle reads the ORIGINAL parquet — any
    * quoting, encoding, type-widening, or row-loss anywhere in the chain
    * breaks the hash match. Aggregation is row-order-independent, so the
    * file-per-partition layout stays deterministic.
    */
  val q79 = Q(
    "q79_format_roundtrip",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // per-JVM scratch, overwritten in place on re-execution and removed
      // at exit — Bench's 3–5 runs previously leaked a corpus copy each
      val tmp = graft.Scratch.perJvm("graft_q79")
      graft.sources.Formats.writeCsv(docs, s"$tmp/csv")
      val viaCsv = graft.sources.Formats.readCsv(s, s"$tmp/csv", docs.schema)
      graft.sources.Formats.writeOrc(viaCsv, s"$tmp/orc")
      val viaOrc = graft.sources.Formats.readOrc(s, s"$tmp/orc")
      graft.sources.Formats.writeJsonLines(viaOrc, s"$tmp/jsonl")
      graft.sources.Formats.readJsonLines(s, s"$tmp/jsonl", docs.schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars,
                   sum(length(text))::BIGINT AS sum_text_len,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** q137 (added r8) — XML ROUND-TRIP: documents written through the
    * Spark-4-native XML datasource (`sources.Formats.writeXml/readXml` —
    * the spark-xml donation, in core since 4.0) and read back
    * schema-on-read, graded against the ORIGINAL table with q79's
    * checksum aggregation — so entity escaping (`&`, `<`), whitespace
    * preservation in element text, and numeric fidelity are all verified
    * end-to-end, not assumed. Completes the interchange-format family
    * (CSV/JSONL/ORC in q79, Hive-partitioned in q95, bucketed in q94).
    */
  val q137 = Q(
    "q137_xml_roundtrip",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tmp = graft.Scratch.perJvm("graft_q137")
      graft.sources.Formats.writeXml(docs, s"$tmp/xml")
      graft.sources.Formats.readXml(s, s"$tmp/xml", docs.schema)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text"))).as("sum_text_len"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars,
                   sum(length(text))::BIGINT AS sum_text_len,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** q95 (added r8) — PARTITIONED sink + partition-PRUNED read: documents
    * written `partitionBy(lang, source)`, then a lang-filtered aggregation
    * over the re-read — the layout complement of q94's bucketing: at
    * 100 TB, partitioning by coarse slice keys means a mixture/filter
    * query opens ONLY the matching directories (here 1 lang of 5; the
    * scan's PartitionFilters carry the predicate, ExplainSpec-pinned)
    * instead of scanning the corpus. Oracle grades the round-trip +
    * pruned aggregation against the original table.
    */
  val q95 = Q(
    "q95_partitioned_sink",
    (s, d) => {
      val dir = graft.Scratch.perJvm("graft_q95_part")
      // one task per output directory: without this, every shuffle
      // partition writes a sliver into every (lang, source) dir — 8×25
      // small files here, and a small-file explosion at scale. (A heavily
      // skewed slice would add a salt column to this repartition and
      // accept a few files per dir; these slices are near-uniform.)
      Tables.documents(s, d)
        .repartition(col("lang"), col("source"))
        .write.mode("overwrite")
        .partitionBy("lang", "source").parquet(dir)
      s.read.parquet(dir)
        .filter(col("lang") === "de")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
            FROM documents WHERE lang = 'de'
            GROUP BY source ORDER BY source"""))

  /** q140 (added r9; rerouted through the manifest commit r12) —
    * PARTITION-PRUNED INCREMENTAL UPSERT: q96's MERGE semantics composed
    * with q95's partition layout, refreshed the way a daily pipeline
    * actually refreshes a 100 TB snapshot. The change batch (updates to
    * de/fr rows + inserted de rows) touches only its own `lang=`
    * partitions, so [[graft.sources.IncrementalUpsert.mergeIntoAtomicSnapshot]]
    * resolves the base through the [[graft.sources.AtomicCommit]] manifest —
    * untouched partitions are never even LISTED (manifest-level pruning,
    * one step past a scan's PartitionFilters) — and commits the merged
    * partitions as one immutable generation published by the hard-link
    * CAS: the refresh costs O(changed partitions), not O(snapshot), and
    * there is no mid-commit crash state (whole old snapshot or whole new
    * one — AtomicCommitSpec pins it; q96 by contrast rewrites everything,
    * and the plain dynamic-overwrite variant this row graded before r12
    * remains in the library as the Hive-layout form). The oracle
    * reconstructs the end snapshot relationally (unchanged partitions ∪
    * merged touched partitions) and grades the per-lang rollup of the
    * final state — q129's end-state grading pattern.
    */
  val q140 = Q(
    "q140_incremental_upsert",
    (s, d) => {
      val dir = graft.Scratch.perJvm("graft_q140_snap")
      val docs = Tables.documents(s, d)
      // rebuild the base snapshot each run (standalone-query contract):
      // the base commit carries EVERY lang partition, so it replaces any
      // previous Bench rerun's merged state wholesale
      graft.sources.AtomicCommit.commitReplacePartitions(s, dir, docs, "lang")
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val updates = docs
        .filter(col("lang").isin("de", "fr") && col("doc_id") % 5 === 0)
        .withColumn("n_chars", col("n_chars") + 1000L)
        .select(cols.map(col): _*)
      val inserts = docs
        .filter(col("lang") === "de" && col("doc_id") % 11 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          lit("synthetic ingest").as("text"), col("lang"),
          lit("ingest").as("source"), lit(42L).as("n_chars"))
      graft.sources.IncrementalUpsert.mergeIntoAtomicSnapshot(
        s, dir, updates.union(inserts), "lang", "doc_id")
      // reclaim superseded generations (no reader holds a snapshot in the
      // standalone-query contract); the graded read below must survive on
      // the current manifest alone
      graft.sources.AtomicCommit.vacuum(dir)
      graft.sources.AtomicCommit.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },
    Some("""WITH changes AS (
              SELECT doc_id, lang, n_chars + 1000 AS n_chars
              FROM documents WHERE lang IN ('de','fr') AND doc_id % 5 = 0
              UNION ALL
              SELECT doc_id + 1000000, lang, 42
              FROM documents WHERE lang = 'de' AND doc_id % 11 = 0),
            merged AS (
              SELECT CASE WHEN c.doc_id IS NOT NULL THEN c.lang ELSE b.lang END AS lang,
                     CASE WHEN c.doc_id IS NOT NULL THEN c.n_chars ELSE b.n_chars END AS n_chars
              FROM (SELECT doc_id, lang, n_chars FROM documents
                    WHERE lang IN ('de','fr')) b
              FULL OUTER JOIN changes c ON b.doc_id = c.doc_id),
            final AS (
              SELECT lang, n_chars FROM documents WHERE lang NOT IN ('de','fr')
              UNION ALL
              SELECT lang, n_chars FROM merged)
            SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
            FROM final GROUP BY lang ORDER BY lang"""))

  /** q150 (added r11) — ATOMIC MULTI-PARTITION COMMIT: the manifest-based
    * two-phase publish [[graft.sources.AtomicCommit]] that closes the
    * crash window q140's dynamic-partition-overwrite commit documents (a
    * crash mid-commit there can expose a half-refreshed snapshot; here
    * the snapshot flips in ONE manifest rename — staged-but-unpublished
    * data is invisible, pinned in AtomicCommitSpec). Commit 1 publishes a
    * base snapshot partitioned by lang; commit 2 REPLACES the `de`
    * partition wholesale (the replace-partitions semantic); vacuum drops
    * the superseded generation; the graded rollup reads the final
    * snapshot through the manifest. The oracle reconstructs the same
    * replace relationally: de ← changes only, every other lang ← base.
    */
  val q150 = Q(
    "q150_atomic_commit",
    (s, d) => {
      val dir = graft.Scratch.perJvm("graft_q150_table")
      val docs = Tables.documents(s, d)
      graft.sources.AtomicCommit.commitReplacePartitions(
        s, dir, docs.filter(col("doc_id") % 3 =!= 0), "lang")
      graft.sources.AtomicCommit.commitReplacePartitions(
        s, dir, docs.filter(col("lang") === "de" && col("doc_id") % 3 === 0), "lang")
      // superseded generations (and prior Bench-rerun snapshots) drop here;
      // the read below must survive on the current manifest alone
      graft.sources.AtomicCommit.vacuum(dir)
      graft.sources.AtomicCommit.read(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    },
    Some("""WITH final AS (
              SELECT lang, n_chars FROM documents
              WHERE lang = 'de' AND doc_id % 3 = 0
              UNION ALL
              SELECT lang, n_chars FROM documents
              WHERE lang <> 'de' AND doc_id % 3 <> 0)
            SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars
            FROM final GROUP BY lang ORDER BY lang"""))

  /** q86 (added r8) — UNIGRAM LM surprisal scoring: train a unigram
    * language model on the corpus (token → −log₂ p, p = corpus-frequency /
    * total) and score every document by its mean per-token surprisal in
    * bits — the perplexity-style quality signal (a KenLM stand-in) that
    * flags machine-generated repetition (low bits) and noise (high bits).
    * Two honest corpus passes: one aggregation builds the vocabulary-sized
    * model (total rides in as a 1-row broadcast, the q85 pattern), which
    * then BROADCASTS onto the token stream — per-doc scoring is a map-side
    * join plus one partial+final agg, nothing all-pairs. Determinism:
    * per-token surprisal is ROUND(,6) then summed as exact DECIMAL (the
    * round-terms-then-sums protocol), so engine summation order cannot
    * move the mean.
    */
  val q86 = Q(
    "q86_unigram_surprisal",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
      // corpus size folds over the vocab-sized count relation, not a third
      // scan of the token stream; the count agg's exchange is shared by
      // both consumers (ReuseExchange, ExplainSpec-pinned)
      val cnts = tok.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val tot = cnts.agg(sum(col("cnt")).cast("double").as("tot"))
      val model = cnts
        .crossJoin(broadcast(tot))
        .select(col("tok"),
          round(-log2(col("cnt").cast("double") / col("tot")), 6).as("surprisal"))
      // the per-doc mean is sum_micro/n with BOTH operands exactly agreed
      // integers — and such rationals land on TRUE 6-dp ties whenever
      // sum_micro ≡ n/2 (mod n), where rounding the closest double is an
      // engine coin-flip (Spark rounds its exact binary value, DuckDB its
      // shortest repr; observed flipping 1 doc of 5,000 at sf0.1). So the
      // HALF-UP division happens in exact INTEGER arithmetic —
      // (2a+n) div 2n — identical on any engine, then one exact ≤2^26
      // integer → double conversion and one division by 10^6
      tok.join(broadcast(model), "tok")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_tokens"),
          (sum(col("surprisal").cast("decimal(28,6)")) * 1000000)
            .cast("bigint").as("micro_sum"))
        .select(col("doc_id"), col("n_tokens"),
          (expr("(2 * micro_sum + n_tokens) div (2 * n_tokens)")
            .cast("double") / lit(1000000.0)).as("bits_per_token"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok
              FROM documents),
            tot AS (SELECT count(*)::DOUBLE AS tot FROM tok),
            model AS (
              SELECT tok,
                     round(-log2(count(*)::DOUBLE / (SELECT tot FROM tot)), 6) AS surprisal
              FROM tok GROUP BY tok)
            SELECT doc_id, count(*) AS n_tokens,
                   ((2 * (sum(surprisal::DECIMAL(28,6)) * 1000000)::BIGINT + count(*))
                    // (2 * count(*)))::DOUBLE / 1000000.0 AS bits_per_token
            FROM tok JOIN model USING (tok)
            GROUP BY doc_id ORDER BY doc_id"""))

  /** q89 (added r8) — ZIPF slope per language: least-squares slope of
    * log-frequency vs log-rank over each language's token frequency table —
    * the vocabulary-health diagnostic (natural text tracks slope ≈ −1;
    * boilerplate and generated spam bend it). The regression runs on the
    * VOCABULARY relation (per-lang distinct tokens — tiny however large the
    * corpus), so the only full-data pass is the frequency aggregation; the
    * rank window partitions by lang over that vocab-sized relation.
    * Determinism: ln(rank)/ln(cnt) are ROUND(,6), their products are exact
    * DECIMAL sums cast to double (unscaled values ≪ 2⁵³), and the final
    * slope is a fixed IEEE expression over those exactly-agreed doubles —
    * no order-sensitive float summation anywhere (the same
    * round-terms-then-sums protocol as q75/q86).
    */
  val q89 = Q(
    "q89_zipf_slope",
    (s, d) => {
      val cnt = Tables.documents(s, d)
        .select(col("lang"), explode(split(col("text"), " +")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
      val xy = cnt.withColumn("rnk", row_number().over(w))
        .select(col("lang"),
          round(log(col("rnk").cast("double")), 6).as("x"),
          round(log(col("cnt").cast("double")), 6).as("y"))
      def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,6)")
      xy.groupBy("lang")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(dec(col("x"))).cast("double").as("sx"),
          sum(dec(col("y"))).cast("double").as("sy"),
          sum(dec(col("x")) * dec(col("y"))).cast("double").as("sxy"),
          sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"))
        .select(col("lang"), col("n").cast("long").as("n_vocab"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("zipf_slope"))
        .orderBy("lang")
    },
    Some("""WITH cnt AS (
              SELECT lang, tok, count(*) AS cnt
              FROM (SELECT lang, unnest(regexp_split_to_array(text, ' +')) AS tok
                    FROM documents)
              GROUP BY lang, tok),
            xy AS (
              SELECT lang,
                     round(ln(row_number() OVER (PARTITION BY lang
                                                 ORDER BY cnt DESC, tok)::DOUBLE), 6) AS x,
                     round(ln(cnt::DOUBLE), 6) AS y
              FROM cnt),
            agg AS (
              SELECT lang, count(*)::DOUBLE AS n,
                     sum(x::DECIMAL(18,6))::DOUBLE AS sx,
                     sum(y::DECIMAL(18,6))::DOUBLE AS sy,
                     sum(x::DECIMAL(18,6) * y::DECIMAL(18,6))::DOUBLE AS sxy,
                     sum(x::DECIMAL(18,6) * x::DECIMAL(18,6))::DOUBLE AS sxx
              FROM xy GROUP BY lang)
            SELECT lang, n::BIGINT AS n_vocab,
                   round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
            FROM agg ORDER BY lang"""))

  /** q99 (added r8) — bigram PMI collocations: pointwise mutual information
    * of adjacent word pairs, `log₂( p(ab) / (p(a)·p(b)) )` with p(ab) over
    * the bigram stream and p(a) over the token stream — the phrase-mining
    * signal that separates genuine collocations ("machine learning") from
    * chance adjacency, with a min-count floor (≥3) so rare pairs can't win
    * on noise. Completes q76 (raw counts) with the normalized form.
    *
    * Plan: two corpus passes (token agg, bigram agg — q76's codegen
    * `arrays_zip` form, no HOF lambda) and NOT four: both stream totals
    * are derived as `sum(cnt)` over the already-aggregated vocab-sized
    * relations instead of re-counting the corpus, and each aggregation's
    * shuffle is consumed twice (total + attachment) through ONE
    * materialization — Spark's ReuseExchange collapses the identical
    * subtrees, pinned in ExplainSpec. Totals ride in as 1-row broadcasts
    * (q85 pattern); the two unigram attachments join the DISTINCT-bigram
    * relation to the vocab relation — both vocabulary-sized however large
    * the corpus. Determinism: PMI is computed by the identical IEEE
    * expression in both engines from exactly-agreed integer counts, then
    * ROUND(,6); ordering ties break on the bigram text.
    */
  val q99 = Q(
    "q99_bigram_pmi",
    (s, d) => {
      val toks = Tables.documents(s, d).withColumn("toks", split(col("text"), " +"))
      val uni = toks.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val biCnt = toks.select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1))).as("pr"))
        .groupBy("pr").agg(count(lit(1)).as("cnt_ab"))
      val totals = uni.agg(sum(col("cnt")).cast("double").as("nu"))
        .crossJoin(biCnt.agg(sum(col("cnt_ab")).cast("double").as("nb")))
      val bi = biCnt
        .filter(col("cnt_ab") >= 3)
        .select(col("pr").getField("0").as("a"), col("pr").getField("1").as("b"),
          col("cnt_ab"))
      bi.join(uni.withColumnRenamed("tok", "a").withColumnRenamed("cnt", "cnt_a"), "a")
        .join(uni.withColumnRenamed("tok", "b").withColumnRenamed("cnt", "cnt_b"), "b")
        .crossJoin(broadcast(totals))
        .select(
          concat_ws(" ", col("a"), col("b")).as("bigram"),
          col("cnt_ab").as("cnt"),
          round(log2((col("cnt_ab").cast("double") / col("nb"))
            / ((col("cnt_a").cast("double") / col("nu"))
              * (col("cnt_b").cast("double") / col("nu")))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(50)
    },
    Some("""WITH t AS (
              SELECT regexp_split_to_array(text, ' +') AS toks FROM documents),
            uni AS (SELECT unnest(toks) AS tok FROM t),
            ucnt AS (SELECT tok, count(*) AS cnt FROM uni GROUP BY tok),
            bis AS (
              SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                           i -> {'a': toks[i], 'b': toks[i + 1]})) AS pr
              FROM t),
            totals AS (
              SELECT (SELECT count(*)::DOUBLE FROM uni) AS nu,
                     (SELECT count(*)::DOUBLE FROM bis) AS nb),
            bcnt AS (
              SELECT pr.a AS a, pr.b AS b, count(*) AS cnt_ab
              FROM bis GROUP BY pr.a, pr.b HAVING count(*) >= 3)
            SELECT bcnt.a || ' ' || bcnt.b AS bigram, cnt_ab AS cnt,
                   ROUND(log2((cnt_ab::DOUBLE / nb)
                         / ((ua.cnt::DOUBLE / nu) * (ub.cnt::DOUBLE / nu))), 6) AS pmi
            FROM bcnt
            JOIN ucnt ua ON ua.tok = bcnt.a
            JOIN ucnt ub ON ub.tok = bcnt.b
            CROSS JOIN totals
            ORDER BY pmi DESC, bigram LIMIT 50"""))

  /** q104 (added r8) — SCHEMA EVOLUTION across corpus generations: an early
    * crawl written WITHOUT `source`/`n_chars`, a later one with them, read
    * back as ONE relation via `mergeSchema` (columns absent from older
    * files surface as NULLs — no rewrite of the old generation), then
    * aggregated per lang with per-generation observability. This is the
    * long-lived-corpus reality check: schemas drift across ingestion eras
    * and the engine must read the union without migrating petabytes.
    * The oracle reconstructs the same answer from the original table (even
    * doc_ids = generation 1, odd = generation 2), so any row loss, column
    * misalignment, or wrong NULL semantics in the merged read breaks the
    * hash. At 100 TB `mergeSchema` reads footers of (a sample of) files —
    * the per-file cost the trade is priced for; writes land under the
    * per-JVM scratch root (overwritten in place across Bench re-runs).
    */
  val q104 = Q(
    "q104_schema_evolution",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val tmp = graft.Scratch.perJvm("graft_q104")
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$tmp/v1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/v2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/v1", s"$tmp/v2")
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          count(col("source")).as("n_v2"),
          sum(coalesce(col("n_chars"), lit(0L))).as("chars_v2"))
        .orderBy("lang")
    },
    Some("""SELECT lang, count(*) AS n_docs,
                   sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_v2,
                   sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)::BIGINT AS chars_v2
            FROM documents GROUP BY lang ORDER BY lang"""))

  /** q106 (added r8) — text NORMALIZATION: the canonical cleaning transform
    * every corpus runs before dedup/tokenization — lowercase, strip
    * non-alphanumerics (ASCII class per the §2 locale rule), collapse
    * whitespace runs, trim — emitted with before/after lengths and a
    * `changed` flag so the pipeline can quantify how much cleaning each
    * source needs. Distinct from q77 (targeted masking): this is the
    * canonical-form rewrite whose output becomes the dedup key space.
    * Pure per-row codegen regex chain — no exchange before the output
    * sort; runs at scan speed at any corpus size.
    */
  val q106 = Q(
    "q106_normalize_text",
    (s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          norm.as("norm_text"),
          length(col("text")).as("n_before"),
          length(norm).as("n_after"),
          (norm =!= col("text")).as("changed"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                       ' +', ' ', 'g')) AS norm_text,
                   length(text) AS n_before,
                   length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                              ' +', ' ', 'g'))) AS n_after,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                                       ' +', ' ', 'g')) <> text AS changed
            FROM documents ORDER BY doc_id"""))

  /** q110 (added r8) — ORDERED STRING AGGREGATION (LISTAGG): per
    * (lang, source) the first 20 doc_ids as a comma-joined string. Raw
    * `collect_list` order is partition-arrival nondeterministic, so the
    * library contract is sort-then-slice-then-join ON TOP of the
    * collection (q98's rule, string-typed form) — the only reproducible
    * LISTAGG. The slice caps the output cell at O(20) regardless of group
    * size; the full-list collect is group-bounded (≤ docs per
    * (lang,source)) — at 100 TB a top-N window would replace the collect
    * to keep per-group state O(N), which is why the cap is part of the
    * declared semantics.
    */
  val q110 = Q(
    "q110_listagg",
    (s, d) => Tables.documents(s, d)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        array_join(
          transform(slice(sort_array(collect_list(col("doc_id"))), 1, 20),
            x => x.cast("string")), ",").as("first_docs"))
      .orderBy("lang", "source"),
    Some("""SELECT lang, source, count(*) AS n_docs,
                   array_to_string(list_sort(list(doc_id))[1:20], ',') AS first_docs
            FROM documents GROUP BY 1, 2 ORDER BY lang, source"""))

  /** q115 (added r8) — RECIPROCAL-RANK FUSION of two retrieval rankings
    * (Cormack/Clarke/Büttcher 2009): BM25 (q68's formula) fused with
    * query-likelihood (length-normalized term frequency) for the same
    * fixed query, `rrf = Σ 1/(60 + rank)` over the two top-50 lists —
    * the standard hybrid-retrieval combiner (lexical × semantic in a
    * real RAG stack; two lexical scorers here keep the oracle exact).
    * Both scorers share ONE tf/df/dl computation (the joined relation is
    * built once and reused); each top-50 is a TakeOrderedAndProject (never
    * a global window over the corpus), and ranks are assigned by
    * row_number on the 50-row relations — rank state is O(k) however
    * large the corpus. Contributions ROUND(,6) before sums (q68's
    * order-proofing); the fused list full-outer-joins the two top lists
    * so a doc ranked by only one scorer still fuses.
    */
  val q115 = Q(
    "q115_rrf_fusion",
    (s, d) => {
      val qTerms = Seq("join", "hash", "spark")
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
        .filter(col("tok").isin(qTerms: _*))
      val dl = docs.select(col("doc_id"),
        size(split(col("text"), " +")).cast("double").as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).cast("double").as("tf"))
      // r20: df from tf's per-token row count (one row per distinct
      // (doc, tok) by construction) — drops a distinct() re-shuffle of
      // every matching token occurrence; same Bm25/TfIdf move
      val df = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      val joined = tf.join(broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
      val bm25 = joined
        .withColumn("contrib", Det.round6(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * col("tf") * 2.2
            / (col("tf") + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * col("dl") / col("avgdl")))))
        .groupBy("doc_id")
        .agg(Det.round6(sum(col("contrib"))).as("s_bm25"))
        .orderBy(col("s_bm25").desc, col("doc_id")).limit(50)
        .withColumn("r_bm25",
          row_number().over(Window.orderBy(col("s_bm25").desc, col("doc_id"))))
      val ql = joined
        .withColumn("c_ql", Det.round6(col("tf") / col("dl")))
        .groupBy("doc_id")
        .agg(Det.round6(sum(col("c_ql"))).as("s_ql"))
        .orderBy(col("s_ql").desc, col("doc_id")).limit(50)
        .withColumn("r_ql",
          row_number().over(Window.orderBy(col("s_ql").desc, col("doc_id"))))
      bm25.select("doc_id", "r_bm25")
        .join(ql.select("doc_id", "r_ql"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_bm25"), lit(-1)).as("r_bm25"),
          coalesce(col("r_ql"), lit(-1)).as("r_ql"),
          Det.round6(
            coalesce(lit(1.0) / (lit(60.0) + col("r_bm25")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("r_ql")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    },
    Some("""WITH tok AS (
              SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok
              FROM documents),
            dl AS (
              SELECT doc_id, len(regexp_split_to_array(text, ' +'))::DOUBLE AS dl
              FROM documents),
            stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
            tf AS (SELECT doc_id, tok, count(*)::DOUBLE AS tf FROM tok
                   WHERE tok IN ('join', 'hash', 'spark') GROUP BY 1, 2),
            df AS (SELECT tok, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                   WHERE tok IN ('join', 'hash', 'spark') GROUP BY 1),
            j AS (
              SELECT tf.doc_id, tf.tok, tf.tf, df.df, dl.dl, stats.n_docs, stats.avgdl
              FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats),
            bm25 AS (
              SELECT doc_id, ROUND(sum(ROUND(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                           * tf * 2.2
                           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6)), 6) AS s_bm25
              FROM j GROUP BY doc_id ORDER BY s_bm25 DESC, doc_id LIMIT 50),
            rb AS (SELECT doc_id,
                          row_number() OVER (ORDER BY s_bm25 DESC, doc_id) AS r_bm25
                   FROM bm25),
            ql AS (
              SELECT doc_id, ROUND(sum(ROUND(tf / dl, 6)), 6) AS s_ql
              FROM j GROUP BY doc_id ORDER BY s_ql DESC, doc_id LIMIT 50),
            rq AS (SELECT doc_id,
                          row_number() OVER (ORDER BY s_ql DESC, doc_id) AS r_ql
                   FROM ql)
            SELECT coalesce(rb.doc_id, rq.doc_id) AS doc_id,
                   coalesce(rb.r_bm25, -1) AS r_bm25,
                   coalesce(rq.r_ql, -1) AS r_ql,
                   ROUND(coalesce(1.0 / (60.0 + rb.r_bm25), 0.0)
                         + coalesce(1.0 / (60.0 + rq.r_ql), 0.0), 6) AS rrf
            FROM rb FULL OUTER JOIN rq ON rb.doc_id = rq.doc_id
            ORDER BY rrf DESC, doc_id LIMIT 20"""))

  /** DuckDB oracle for q118, unrolled one CTE level per merge step —
    * generated rather than hand-written because every level repeats the
    * same (pairs → top-1 → boundary-safe replace) shape with only the
    * step index changing. Mirrors [[graft.ops.Bpe.learnMerges]] exactly:
    * same tie-break, same `\b`-guarded whole-symbol merge (RE2 and Java
    * regex agree on `\b` over `[a-z ]` text), `'g'` flag because DuckDB's
    * regexp_replace is first-match-only by default where Spark's is
    * global.
    */
  /** Shared CTE prefix (w0 + per-step learn levels) for the q118/q119
    * oracles. */
  private def bpeLearnCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= """WITH w0 AS (
              SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seq,
                     count(*)::BIGINT AS n
              FROM (SELECT unnest(regexp_split_to_array(text, ' +')) AS w
                    FROM documents)
              WHERE len(w) > 0 GROUP BY 1)"""
    for (i <- 1 to nMerges) {
      sb ++= s""",
            t$i AS (SELECT string_split(seq, ' ') AS s, n FROM w${i - 1}),
            b$i AS (SELECT unnest(list_transform(generate_series(1, len(s) - 1),
                                                 k -> {'a': s[k], 'b': s[k + 1]})) AS pr,
                           n
                    FROM t$i),
            p$i AS (SELECT pr.a || ' ' || pr.b AS pair, sum(n)::BIGINT AS cnt
                    FROM b$i GROUP BY 1),
            top$i AS (SELECT pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1),
            w$i AS (SELECT regexp_replace(seq,
                             '\\b' || (SELECT pair FROM top$i) || '\\b',
                             (SELECT replace(pair, ' ', '') FROM top$i),
                             'g') AS seq, n
                    FROM w${i - 1})"""
    }
    sb.toString
  }

  private def bpeOracleSql(nMerges: Int): String =
    bpeLearnCtes(nMerges) + (1 to nMerges).map(i =>
      s"""SELECT $i AS step, pair, replace(pair, ' ', '') AS merged, cnt
          FROM top$i""").mkString("\n", "\nUNION ALL\n", "\nORDER BY step")

  /** q119 oracle: learn CTEs + per-word merge application (same `\b`
    * guard, words carried with doc_id so no cross-word separator is ever
    * needed), then per-doc symbol totals.
    */
  private def bpeApplyOracleSql(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= bpeLearnCtes(nMerges)
    sb ++= """,
            dw AS (SELECT doc_id,
                          trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seq
                   FROM (SELECT doc_id,
                                unnest(regexp_split_to_array(text, ' +')) AS w
                         FROM documents)
                   WHERE len(w) > 0)"""
    for (i <- 1 to nMerges) {
      val prev = if (i == 1) "dw" else s"a${i - 1}"
      sb ++= s""",
            a$i AS (SELECT doc_id,
                           regexp_replace(seq,
                             '\\b' || (SELECT pair FROM top$i) || '\\b',
                             (SELECT replace(pair, ' ', '') FROM top$i),
                             'g') AS seq
                    FROM $prev)"""
    }
    sb ++= s"""
            SELECT doc_id,
                   count(*)::BIGINT AS n_ws,
                   sum(len(string_split(seq, ' ')))::BIGINT AS n_bpe,
                   ROUND(sum(len(string_split(seq, ' ')))::DOUBLE / count(*), 6)
                     AS symbols_per_word
            FROM a$nMerges GROUP BY doc_id ORDER BY doc_id"""
    sb.toString
  }

  /** q118 (added r8) — BPE MERGE LEARNING ([[graft.ops.Bpe]]): the first 5
    * byte-pair merges over the corpus, `(step, pair, merged, cnt)` — the
    * tokenizer-training core of a pretraining pipeline. One corpus pass
    * builds the word-frequency dictionary; every merge step then runs on
    * the VOCAB-sized relation (Sennrich's dictionary formulation — the
    * corpus is never re-scanned), and driver state is only the O(merges)
    * model, the k-means pattern. Deterministic tie-break (cnt DESC, pair
    * ASC); merges are `\b`-guarded so only whole symbols fuse.
    */
  val q118 = Q(
    "q118_bpe_merges",
    (s, d) => graft.ops.Bpe.learnMerges(Tables.documents(s, d), "text", 5),
    Some(bpeOracleSql(5)))

  /** q119 (added r8) — BPE TOKENIZATION (apply side of q118): the 5
    * learned merges folded into a chain of `\b`-guarded codegen
    * `regexp_replace`s and applied per document → `(doc_id, n_ws, n_bpe,
    * symbols_per_word)`, the train→apply tokenizer loop end-to-end. The
    * merge model is re-derived standalone (the q83/q102 contract — no
    * cross-query caching); application itself is ONE corpus pass: a
    * per-row projection plus a doc-keyed partial+final agg, which is the
    * whole point — tokenizing 100 TB costs the scan, not nMerges scans.
    */
  val q119 = Q(
    "q119_bpe_tokenize",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.ops.Bpe.learnMerges(docs, "text", 5)
        .select("pair", "merged").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      graft.ops.Bpe.tokenStats(docs, "doc_id", "text", merges)
    },
    Some(bpeApplyOracleSql(5)))

  /** q121 (added r8) — MAP-typed column surface: per-doc token-count MAP
    * built with `map_from_entries` over a SORTED entry list (map
    * construction order is the only reproducible part of a map — the
    * sort is the declared contract, q98's rule for the map type),
    * filtered with the `map_filter` higher-order function (count ≥ 2),
    * exploded back to rows. Completes the complex-type family: arrays
    * (q30/q98), structs (q33), JSON (q32), and now maps end-to-end
    * through Catalyst. Output is row-shaped, so the DuckDB oracle needs
    * no map support at all — exactly how a map-typed intermediate should
    * grade.
    */
  val q121 = Q(
    "q121_map_ops",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " +")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("tok"), col("c"))))).as("m"))
      .select(col("doc_id"),
        explode(map_filter(col("m"), (_, v) => v >= 2)))
      .select(col("doc_id"), col("key").as("token"), col("value").as("cnt"))
      .orderBy("doc_id", "token"),
    Some("""SELECT doc_id, tok AS token, count(*) AS cnt
            FROM (SELECT doc_id, unnest(regexp_split_to_array(text, ' +')) AS tok
                  FROM documents)
            WHERE len(tok) > 0
            GROUP BY doc_id, tok HAVING count(*) >= 2
            ORDER BY doc_id, token"""))

  /** q143 (added r9) — N-GRAM CONTAMINATION RATE: per eval document, the
    * fraction of its distinct word 3-gram shingles that appear anywhere in
    * the training split — the standard train/eval overlap metric a team
    * reads before trusting a benchmark number (the GPT-3 appendix-C
    * methodology, shrunk from 13-grams to 3-grams so the graded corpus
    * has signal). q60 DROPS contaminated eval docs; this REPORTS the
    * per-doc rate so the threshold is a reviewable decision, not a
    * hard-coded one. Split: doc_id % 10 (eval) — q72's hash-split rule.
    * Plan: one explode to distinct (doc, shingle) pairs → the train side
    * collapses to a distinct shingle set → one LEFT equi-join on the
    * shingle + per-doc partial+final agg. At 100 TB the join key is
    * xxhash64(shingle) (q60's documented swap) and the stop-gram skew the
    * common shingles create is AQE's problem per the SaltingSpec decision;
    * the graded form joins the strings so the oracle is portable.
    */
  val q143 = Q(
    "q143_contamination_rate",
    (s, d) => {
      // r20: the (doc_id, shingle) dedup is PER-DOC, so it is computed
      // map-side with array_distinct before the explode instead of a
      // global distinct() — drops a full shuffle of every shingle
      // occurrence (the per-row dedup is exactly the same row set)
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " +").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(expr(
          "array_distinct(transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2])))"))
          .as("sh"))
      val train = sh.filter(col("doc_id") % 10 =!= 0)
        .select(col("sh").as("tr_sh")).distinct()
      sh.filter(col("doc_id") % 10 === 0)
        .join(train, col("sh") === col("tr_sh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          count(col("tr_sh")).as("n_matched"),
          round(count(col("tr_sh")).cast("double") / count(lit(1)), 6)
            .as("contamination"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, regexp_split_to_array(text, ' +') AS t
              FROM documents),
            sh AS (
              SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id,
                       unnest(list_transform(range(len(t) - 2),
                         i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) AS sh
                FROM t WHERE len(t) >= 3)),
            train AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 <> 0),
            ev AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 = 0)
            SELECT ev.doc_id, count(*) AS n_shingles,
                   count(train.sh) AS n_matched,
                   round(count(train.sh)::DOUBLE / count(*), 6) AS contamination
            FROM ev LEFT JOIN train ON ev.sh = train.sh
            GROUP BY ev.doc_id ORDER BY ev.doc_id"""))

  def all: Seq[Q] = Seq(q30, q31, q32, q33, q34, q35, q38, q42, q68, q69,
    q76, q77, q79, q86, q89, q95, q99, q104, q106, q110, q115, q118, q119,
    q121, q137, q140, q143, q150)
}
