package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry; the
  * exact-valued ones also have a DuckDB `oracleSql` twin (column names and
  * row order aligned — see FIXTURES.md §3 for why sketch queries can have
  * exact oracles at all).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SketchQueries.bloomProbeExact(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Bloom build + probe (insert/lookup, §2.1 rows 2-3) — exact by
    // no-false-negatives
    "q_bloom_probe_exact" -> (SketchQueries.bloomProbeExact _),
    // the same probe-exactness through the NATIVE fused aggregate (the
    // Bench flagship build path) — byte-identical sketches, same oracle
    "q_fused_native_probe_exact" -> (SketchQueries.fusedNativeProbeExact _),
    // the 128-bit hash path (6k+log2l > 64) end to end, same exactness
    "q_bloom128_probe_exact" -> (SketchQueries.bloom128ProbeExact _),
    // Bloom as semi-join runtime filter (§2.2 joins) — exact by design
    "q_bloom_prefilter_semijoin" -> (SketchQueries.bloomPrefilterSemijoin _),
    "q_bloom_join_lineitem" -> (SketchQueries.bloomJoinLineitem _),
    // unionInto as second-level aggregation (§2.1 row 7)
    "q_bloom_union_global" -> (SketchQueries.bloomUnionGlobal _),
    // salt-based skew mitigation: salted two-level build == direct build
    "q_salted_build_equiv" -> (SketchQueries.saltedBuildEquiv _),
    // fpr() analytic bound vs measured (§2.1 row 12)
    "q_bloom_fpr_bound" -> (SketchQueries.bloomFprBound _),
    // sketch family (north rule): estimates within published bounds
    "q_hll_distinct_tokens_bound" -> (SketchQueries.hllDistinctTokensBound _),
    "q_hll_distinct_docs_bound" -> (SketchQueries.hllDistinctDocsBound _),
    "q_hll_event_users_bound" -> (SketchQueries.hllEventUsersBound _),
    // hierarchical rollup: daily partial sketches merged per type, byte-
    // identical to the direct build (the materialized-sketch-table algebra)
    "q_sketch_rollup" -> (SketchQueries.sketchRollup _),
    "q_cms_heavyhitter_bound" -> (SketchQueries.cmsHeavyHitterBound _),
    "q_cms_topk" -> ((s: SparkSession, d: String) => SketchQueries.cmsTopK(s, d)),
    // Misra-Gries heavy hitters for vocab >> width (guarantee invariants)
    "q_heavyhitter_mg_bound" -> (SketchQueries.heavyHitterMgBound _),
    // weighted MG over pre-aggregated (key, weight) rows, N = total weight
    "q_heavyhitter_weighted_bound" -> (SketchQueries.heavyHitterWeightedBound _),
    // train/eval n-gram decontamination: Bloom prefilter + exact confirm
    "q_ngram_contamination" -> (SketchQueries.ngramContamination _),
    // bigram statistics: exact totals + the MG summary guarantee gate
    "q_bigram_heavyhitters" -> (SketchQueries.bigramHeavyHitters _),
    // KMV bottom-k: distinct-intersection / Jaccard / merged-union bounds
    "q_kmv_intersect_bound" -> (SketchQueries.kmvIntersectBound _),
    "q_bloom_intersect_exact" -> (SketchQueries.bloomIntersectExact _),
    "q_kll_ntok_quantile_bound" -> (SketchQueries.kllNtokQuantileBound _),
    "q_tdigest_ntok_quantile_bound" -> (SketchQueries.tdigestNtokQuantileBound _),
    // two-level serialized quantile merge (checkpoint-merge shape)
    "q_quantile_merge_bound" -> (SketchQueries.quantileMergeBound _),
    // training-pipeline text ops (exact)
    "q_token_count_exact" -> (SketchQueries.tokenCountExact _),
    "q_dedup_exact" -> (SketchQueries.dedupExact _),
    "q_sample_bottomk" -> (SketchQueries.sampleBottomK _),
    // Efraimidis–Spirakis weighted sample: k docs per source, P ∝ n_tok
    "q_sample_weighted" -> (SketchQueries.sampleWeighted _),
    // dedup family
    "q_fingerprint_dedup" -> (PipelineQueries.fingerprintDedup _),
    "q_exact_dup_pairs" -> (PipelineQueries.exactDupPairs _),
    "q_minhash_lsh_dups" -> (PipelineQueries.minhashLshDups _),
    // pairs -> connected components -> deterministic winner -> keep-set
    "q_dedup_clusters" -> (PipelineQueries.dedupClusters _),
    // mixture accounting: token mass + quality + dedup survival + the
    // weighted sample of the resulting frame, one pass per source
    "q_sampling_frame" -> (PipelineQueries.samplingFrame _),
    // docs -> fixed-token-budget training sequences (next-fit per shard)
    "q_seq_packing" -> (PipelineQueries.seqPacking _),
    // the packed sequences' CONTENT: concatenated token ids + doc offsets,
    // gated by exact polynomial hashes DuckDB rebuilds independently
    "q_seq_pack_content" -> (PipelineQueries.seqPackContent _),
    // Gopher-class repetition quality signals (map-side kernel)
    "q_repetition_metrics" -> (PipelineQueries.repetitionMetrics _),
    // budgeted mixture selection: integer prefix scan to a token budget
    "q_mixture_select" -> (PipelineQueries.mixtureSelect _),
    // probability-proportional (ES-weighted-order) mixture selection
    "q_mixture_select_weighted" -> (PipelineQueries.mixtureSelectWeighted _),
    // BPE merge application: greedy lowest-rank encoding of regex
    // pre-tokens under the committed merges fixture
    "q_bpe_tokenize" -> (PipelineQueries.bpeTokenize _),
    // end-to-end curation funnel: quality ∧ dedup ∧ decontamination ∧
    // repetition survivors per source, one report
    "q_curation_funnel" -> ((s: SparkSession, d: String) =>
      PipelineQueries.curationFunnel(s, d)),
    // the complete text-to-trainer path: regex pre-tokens -> BPE merges ->
    // vocab ids -> packed sequences, replayed end-to-end by DuckDB
    "q_text_to_sequences" -> (PipelineQueries.textToSequences _),
    // PII scrubbing: URL/email/long-number detection + sentinel rewrite
    // (planted deterministic PII; shared-dialect regexes)
    "q_pii_redact" -> (PipelineQueries.piiRedact _),
    // exact corpus vocabulary (count + document frequency, >= 1% of mass)
    "q_vocab_build" -> ((s: SparkSession, d: String) =>
      PipelineQueries.vocabBuild(s, d)),
    // cross-source gram-overlap matrix: exact intersection/union per pair
    // + KMV Jaccard estimate gated by the published error model
    "q_source_overlap" -> (PipelineQueries.sourceOverlapMatrix _),
    "q_simhash_dups" -> (PipelineQueries.simhashDups _),
    // text analysis
    "q_quality_metrics" -> (PipelineQueries.qualityMetrics _),
    "q_lang_id" -> (PipelineQueries.langIdCounts _),
    "q_token_count_regex" -> (PipelineQueries.tokenCountRegex _),
    // winnowing rolling-hash fingerprints (MOSS): partial-overlap
    // detection; DuckDB recomputes the whole pipeline in exact BIGINT
    "q_winnow_fingerprints" -> (PipelineQueries.winnowFingerprints _),
    // similarity search
    "q_embedding_topk" -> (PipelineQueries.embeddingTopK _),
    "q_srp_ann_recall" -> (PipelineQueries.srpAnnRecall _),
    // embedding-cosine near-dup dedup (planted perturbed twins; DuckDB
    // recomputes the exact all-pairs counts independently)
    "q_embedding_neardups" -> (PipelineQueries.embeddingNearDups _),
    "q_ivf_topk_matches" -> (PipelineQueries.ivfTopkMatches _),
    // multimodal pipeline (real PNG/WAV/frame decode, batched)
    "q_multimodal_features" -> (PipelineQueries.multimodalFeatures _),
    // ops hardening: crash -> resume -> finalize -> probe, exact counts
    "q_sketchjob_resume_probe_exact" -> (SketchQueries.sketchJobResumeProbeExact _),
    // Structured Streaming surface: windowed sketch build + probe
    "q_streaming_bloom_windows" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingSketch.replayBloomWindows(
        s, dir, SketchQueries.bloomCfg, SketchQueries.hllP)),
    // append-mode watermark semantics: deterministic late-data drop
    "q_streaming_append_latedrop" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingSketch.replayBloomWindowsAppend(
        s, dir, SketchQueries.bloomCfg, SketchQueries.hllP)),
    // streaming decontamination twin: static eval Bloom + gram set score
    // the doc stream map-side; windowed counts exact under the oracle
    "q_streaming_decon" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingSketch.replayDecontamination(
        s, dir, SketchQueries.bloomCfg)),
    // windowed Misra-Gries trending tokens: exact MG guarantees per
    // (event-time window, source) under the oracle
    "q_streaming_trending_tokens" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingSketch.replayTrendingTokens(s, dir)),
    // dynamic-gap session windows: state-store-merged session KMV
    // byte-identical to batch, bounds + estimate exact per session
    "q_streaming_session_kmv" -> ((s: SparkSession, dir: String) =>
      graft.streaming.StreamingSketch.replaySessionKmv(
        s, dir, SketchQueries.K0, SketchQueries.K1, SketchQueries.kmvK))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val words =
      "SELECT source, unnest(string_split(text, ' ')) AS w FROM documents"
    val boundOracle =
      "SELECT source, true AS within_bound FROM documents GROUP BY source ORDER BY source"
    // BPE sequential replay: each merge rank is a literal replace() over
    // the 0x01-bounded symbol string, applied TWICE (value-equal to the
    // greedy encoder for left != right merges — see the adjacency analysis
    // in operators.Bpe's scaladoc: two adjacent occurrences share a
    // boundary byte that the first replacement consumes, so one pass
    // merges the odd-indexed occurrences of a run and leaves each survivor
    // isolated and fully re-bounded; the second pass finishes them; a
    // third can never match because merging creates no new occurrence).
    // The nesting is generated from the SAME FixtureMerges list the Spark
    // kernel uses, so the two cannot drift.
    val bpeEnc = graft.operators.Bpe.FixtureMerges.foldLeft(
      "chr(1) || array_to_string([w[i] for i in range(1, len(w)+1)], chr(1)) || chr(1)") {
      case (acc, (a, b)) =>
        val once = s"replace($acc, chr(1)||'$a'||chr(1)||'$b'||chr(1), chr(1)||'$a$b'||chr(1))"
        s"replace($once, chr(1)||'$a'||chr(1)||'$b'||chr(1), chr(1)||'$a$b'||chr(1))"
    }
    Map(
      "q_bloom_probe_exact" ->
        s"SELECT source, count(*) AS n_present FROM ($words) t WHERE w <> '' GROUP BY source ORDER BY source",
      "q_fused_native_probe_exact" ->
        s"SELECT source, count(*) AS n_present FROM ($words) t WHERE w <> '' GROUP BY source ORDER BY source",
      "q_sketchjob_resume_probe_exact" ->
        s"SELECT source, count(*) AS n_present FROM ($words) t WHERE w <> '' GROUP BY source ORDER BY source",
      "q_bloom128_probe_exact" ->
        s"SELECT source, count(*) AS n_present FROM ($words) t WHERE w <> '' GROUP BY source ORDER BY source",
      "q_bloom_prefilter_semijoin" ->
        (s"SELECT source, count(DISTINCT w) AS n_shared FROM ($words) t WHERE w <> '' AND w IN " +
          "(SELECT unnest(string_split(text, ' ')) AS w2 FROM documents WHERE lang = 'en') " +
          "GROUP BY source ORDER BY source"),
      "q_bloom_union_global" ->
        s"SELECT count(DISTINCT w) AS n_present FROM ($words) t WHERE w <> ''",
      "q_salted_build_equiv" ->
        (s"SELECT source, true AS salted_equals_direct, count(*) AS n_present " +
          s"FROM ($words) t WHERE w <> '' GROUP BY source ORDER BY source"),
      "q_bloom_join_lineitem" ->
        ("SELECT count(*) AS n_lines, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty " +
          "FROM lineitem WHERE l_orderkey IN " +
          "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')"),
      "q_hll_event_users_bound" ->
        "SELECT event_type, true AS within_bound FROM events GROUP BY event_type ORDER BY event_type",
      // rollup: DuckDB recomputes n_days and the exact distinct-user count
      // from the raw table; the byte-identity and bound booleans are
      // computed in-Spark over the actual sketch bytes (merge-of-partials
      // vs direct build) and must come back constant-true
      "q_sketch_rollup" ->
        ("SELECT event_type, CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days, " +
          "CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact_users, " +
          "true AS hll_merge_eq_direct, true AS kmv_merge_eq_direct, " +
          "true AS est_within_bound, true AS partials_sparse_encoded " +
          "FROM events GROUP BY event_type ORDER BY event_type"),
      "q_bloom_fpr_bound" -> boundOracle,
      "q_cms_topk" ->
        ("SELECT source, CAST(rn AS BIGINT) AS rank, CAST(c AS BIGINT) AS est FROM (" +
          s"SELECT source, w, count(*) AS c, row_number() OVER " +
          "(PARTITION BY source ORDER BY count(*) DESC, w ASC) AS rn " +
          s"FROM ($words) t WHERE w <> '' GROUP BY source, w) x " +
          "WHERE rn <= 3 ORDER BY source, rn"),
      "q_bloom_intersect_exact" ->
        ("SELECT count(DISTINCT w) AS n_common_present FROM " +
          s"($words) t WHERE w <> '' AND source = (SELECT min(source) FROM documents) AND w IN (" +
          s"SELECT w2 FROM (SELECT source, unnest(string_split(text, ' ')) AS w2 FROM documents) u " +
          "WHERE w2 <> '' AND source = (SELECT min(source) FROM (SELECT DISTINCT source FROM documents) s " +
          "WHERE source > (SELECT min(source) FROM documents)))"),
      "q_hll_distinct_tokens_bound" -> boundOracle,
      "q_heavyhitter_mg_bound" -> boundOracle,
      "q_heavyhitter_weighted_bound" -> boundOracle,
      // decontamination: DuckDB recomputes the report from raw text with
      // word 4-grams — the word→id map is injective, so word-gram equality
      // is token-gram equality and every count matches exactly
      "q_ngram_contamination" ->
        ("WITH toks AS (SELECT doc_id, source, " +
          "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "g AS (SELECT doc_id, source, unnest(list_distinct(" +
          "CASE WHEN len(ws) >= 4 THEN [array_to_string(ws[i:i+3], '|') " +
          "for i in range(1, len(ws)-2)] ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM toks), " +
          "ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'), " +
          "hit AS (SELECT g.source, g.doc_id FROM g JOIN ev USING (gram) " +
          "WHERE g.source <> 'src0'), " +
          "base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs " +
          "FROM documents WHERE source <> 'src0' GROUP BY source), " +
          "hs AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contam_docs, " +
          "CAST(count(*) AS BIGINT) AS n_hits FROM hit GROUP BY source) " +
          "SELECT base.source, base.n_docs, " +
          "coalesce(hs.n_contam_docs, CAST(0 AS BIGINT)) AS n_contam_docs, " +
          "coalesce(hs.n_hits, CAST(0 AS BIGINT)) AS n_hits " +
          "FROM base LEFT JOIN hs ON base.source = hs.source ORDER BY base.source"),
      // streaming decontamination: window = (doc_id % 600) / 60 by the
      // replay's event-time assignment; counts recomputed exactly from raw
      // text (word 4-grams, injective word→id map), zero cells included
      // for every (window, source) that has at least one train doc
      "q_streaming_decon" ->
        ("WITH toks AS (SELECT doc_id, (doc_id % 600) // 60 AS win, source, " +
          "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "g AS (SELECT doc_id, win, source, unnest(list_distinct(" +
          "CASE WHEN len(ws) >= 4 THEN [array_to_string(ws[i:i+3], '|') " +
          "for i in range(1, len(ws)-2)] ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM toks), " +
          "ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'), " +
          "perdoc AS (SELECT win, source, doc_id, count(*) AS hits FROM g " +
          "JOIN ev USING (gram) WHERE source <> 'src0' GROUP BY win, source, doc_id), " +
          "base AS (SELECT (doc_id % 600) // 60 AS win, source, doc_id " +
          "FROM documents WHERE source <> 'src0') " +
          "SELECT CAST(base.win AS BIGINT) AS win, base.source, " +
          "CAST(count(CASE WHEN perdoc.hits > 0 THEN 1 END) AS BIGINT) AS n_contam_docs, " +
          "CAST(coalesce(sum(perdoc.hits), 0) AS BIGINT) AS n_hits " +
          "FROM base LEFT JOIN perdoc ON base.win = perdoc.win " +
          "AND base.source = perdoc.source AND base.doc_id = perdoc.doc_id " +
          "GROUP BY base.win, base.source ORDER BY base.win, base.source"),
      // bigram stats: exact totals are invariant under the injective
      // word→id map; the MG gate boolean is exact, hence constant-true
      "q_bigram_heavyhitters" ->
        ("WITH toks AS (SELECT source, " +
          "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "b AS (SELECT source, unnest(CASE WHEN len(ws) >= 2 THEN " +
          "[ws[i] || '|' || ws[i+1] for i in range(1, len(ws))] " +
          "ELSE CAST([] AS VARCHAR[]) END) AS key FROM toks), " +
          "e AS (SELECT source, key, count(*) AS cnt FROM b GROUP BY source, key) " +
          "SELECT source, CAST(sum(cnt) AS BIGINT) AS n_bigrams, " +
          "CAST(count(*) AS BIGINT) AS distinct_bigrams, " +
          "CAST(max(cnt) AS BIGINT) AS top_bigram_count, true AS within_bound " +
          "FROM e GROUP BY source ORDER BY source"),
      // session enumeration is a pure function of doc_id (sess =
      // (doc_id // 20) % 5, five per source; every session's booleans are
      // exact — see replaySessionKmv)
      "q_streaming_session_kmv" ->
        ("SELECT source, CAST((doc_id // 20) % 5 AS BIGINT) AS sess, true AS bytes_match, " +
          "true AS bounds_ok, true AS est_within_bound " +
          "FROM documents GROUP BY source, sess ORDER BY source, sess"),
      "q_kmv_intersect_bound" ->
        ("SELECT a.s AS status_a, b.s AS status_b, true AS distinct_within_bound, " +
          "true AS inter_within_bound, true AS jaccard_within_bound, " +
          "true AS merged_union_within_bound, true AS pairwise_union_within_bound, " +
          "true AS crosscap_union_within_bound, true AS diff_within_bound " +
          "FROM (SELECT DISTINCT o_orderstatus AS s FROM orders) a " +
          "JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) b ON a.s < b.s " +
          "ORDER BY 1, 2"),
      "q_hll_distinct_docs_bound" -> boundOracle,
      "q_cms_heavyhitter_bound" -> boundOracle,
      "q_kll_ntok_quantile_bound" -> boundOracle,
      "q_tdigest_ntok_quantile_bound" -> boundOracle,
      "q_quantile_merge_bound" ->
        "SELECT true AS kll_within_bound, true AS td_within_bound",
      "q_token_count_exact" ->
        ("SELECT CAST(doc_id AS VARCHAR) AS doc_id, " +
          "CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tok " +
          "FROM documents ORDER BY doc_id"),
      "q_dedup_exact" ->
        "SELECT source, count(DISTINCT text) AS n_uniq FROM documents GROUP BY source ORDER BY source",
      // bottom-k sample gate: every emitted boolean is an exact property
      // (size, membership, partition-invariance, serialized-merge identity)
      "q_sample_bottomk" ->
        ("SELECT source, true AS size_ok, true AS members_ok, " +
          "true AS partition_invariant, true AS merge_matches_direct, " +
          "true AS str_size_ok, true AS str_members_ok, true AS str_merge_matches_direct " +
          "FROM documents GROUP BY source ORDER BY source"),
      // weighted (Efraimidis–Spirakis) sample gate: same exact-boolean
      // shape; gate 5 additionally pins the sample to an independent SQL
      // recomputation of the k smallest -ln(u)/w keys (see sampleWeighted)
      "q_sample_weighted" ->
        ("SELECT source, true AS size_ok, true AS members_ok, " +
          "true AS partition_invariant, true AS merge_matches_direct, " +
          "true AS matches_exact_topk, true AS str_merge_matches_direct, " +
          "true AS str_matches_exact_topk " +
          "FROM documents WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) > 0 " +
          "GROUP BY source ORDER BY source"),
      // near-dup cluster resolution: DuckDB recomputes the components
      // EXACTLY — recursive-CTE transitive closure over the exact
      // all-pairs Jaccard graph (same pair CTE as q_minhash_lsh_dups),
      // label = min reachable id, winner = label, keep-set = unclustered
      // plus winners. Clusters may span sources; a cluster counts toward
      // the source its WINNER lives in.
      "q_dedup_clusters" ->
        ("WITH RECURSIVE " +
          "w AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "g AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[]) " +
          "WHEN len(ws) < 3 THEN [array_to_string(ws, chr(1))] " +
          "ELSE list_distinct([array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws)-1)]) END AS sh FROM w), " +
          "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM g a JOIN g b " +
          "ON a.doc_id < b.doc_id AND len(a.sh) > 0 AND len(b.sh) > 0 " +
          "AND least(len(a.sh), len(b.sh)) * 5 >= greatest(len(a.sh), len(b.sh)) * 4 " +
          "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= 0.8), " +
          "e AS (SELECT a, b FROM p UNION SELECT b, a FROM p), " +
          "reach AS (SELECT a AS node, b AS r FROM e UNION SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a), " +
          "lab AS (SELECT node, least(node, min(r)) AS cluster FROM reach GROUP BY node), " +
          "j AS (SELECT w.doc_id, w.source, lab.cluster FROM w LEFT JOIN lab ON w.doc_id = lab.node) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(cluster) AS BIGINT) AS n_dup_docs, " +
          "CAST(count(CASE WHEN cluster = doc_id THEN 1 END) AS BIGINT) AS n_clusters, " +
          "CAST(count(CASE WHEN cluster IS NULL OR cluster = doc_id THEN 1 END) AS BIGINT) AS n_kept, " +
          "true AS deterministic " +
          "FROM j GROUP BY source ORDER BY source"),
      // cross-source overlap matrix: exact set arithmetic recomputed from
      // raw text (injective word->id map makes the gram-set counts equal);
      // the KMV-vs-exact bound is deterministic for the fixed key, so the
      // oracle asserts it true — a bound failure turns the row red
      "q_source_overlap" ->
        ("WITH toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "g AS (SELECT DISTINCT source, unnest(CASE WHEN len(ws) >= 4 THEN " +
          "[array_to_string(ws[i:i+3], '|') for i in range(1, len(ws)-2)] " +
          "ELSE CAST([] AS VARCHAR[]) END) AS gram FROM toks), " +
          "sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY source), " +
          "it AS (SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS i FROM g a " +
          "JOIN g b ON a.gram = b.gram AND a.source < b.source GROUP BY 1, 2) " +
          "SELECT p.sa AS src_a, p.sb AS src_b, coalesce(it.i, CAST(0 AS BIGINT)) AS inter_exact, " +
          "p.na + p.nb - coalesce(it.i, CAST(0 AS BIGINT)) AS union_exact, " +
          "true AS jaccard_within_bound " +
          "FROM (SELECT a.source AS sa, b.source AS sb, a.n AS na, b.n AS nb " +
          "FROM sz a JOIN sz b ON a.source < b.source) p " +
          "LEFT JOIN it ON p.sa = it.sa AND p.sb = it.sb ORDER BY src_a, src_b"),
      // budgeted mixture selection: DuckDB replays the identical integer
      // prefix scan (cross-multiplication, no division/float anywhere);
      // prefix_tight is data-dependent (mixed true/false), so the hash
      // compare proves the full per-source selection, not a tautology
      "q_mixture_select" ->
        ("WITH d AS (SELECT doc_id, source, " +
          "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok FROM documents), " +
          "t AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tok_total FROM d GROUP BY source), " +
          "c AS (SELECT d.doc_id, d.source, d.n_tok, t.tok_total, " +
          "CAST(sum(d.n_tok) OVER (PARTITION BY d.source ORDER BY d.doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum " +
          "FROM d JOIN t USING (source)), " +
          "s AS (SELECT *, cum * 2 <= tok_total * 1 AS selected FROM c) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(CASE WHEN selected THEN 1 END) AS BIGINT) AS n_selected, " +
          "CAST(coalesce(sum(CASE WHEN selected THEN n_tok END), 0) AS BIGINT) AS tok_selected, " +
          "max(tok_total) AS tok_total, " +
          "CAST(coalesce(sum(CASE WHEN selected THEN n_tok END), 0) AS BIGINT) * 2 <= max(tok_total) * 1 AS within_budget, " +
          "coalesce((CAST(coalesce(sum(CASE WHEN selected THEN n_tok END), 0) AS BIGINT) " +
          "+ min(CASE WHEN NOT selected THEN n_tok END)) * 2 > max(tok_total) * 1, true) AS prefix_tight " +
          "FROM s GROUP BY source ORDER BY source"),
      // weighted (ES-order) mixture selection: the scan order needs keyed
      // SipHash, so DuckDB pins the order-independent cells exactly and
      // the order-dependent ones run as in-Spark gates (two-level scan ==
      // naive single window; budget respected) — constant true
      "q_mixture_select_weighted" ->
        ("SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT) AS tok_total, " +
          "true AS within_budget, true AS cum_matches_single_window, " +
          "true AS selected_matches_single_window " +
          "FROM documents WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0 " +
          "GROUP BY source ORDER BY source"),
      // BPE merge application: nested sequential replaces (bpeEnc above)
      // recompute every pre-token's encoding from raw text; each merge
      // shortens the symbol string by one boundary, so n_bpe_tok (and
      // n_merges = n_chars - n_bpe_tok) pin the full merge history
      "q_bpe_tokenize" ->
        ("WITH p AS (SELECT doc_id, source, unnest(regexp_extract_all(coalesce(text, ''), " +
          "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w FROM documents), " +
          s"e AS (SELECT source, CAST(len(w) AS BIGINT) AS chars, " +
          s"CAST(len(string_split($bpeEnc, chr(1))) - 2 AS BIGINT) AS ntok FROM p), " +
          "agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pretok, " +
          "CAST(sum(chars) AS BIGINT) AS n_chars, CAST(sum(ntok) AS BIGINT) AS n_bpe_tok " +
          "FROM e GROUP BY source), " +
          "base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source) " +
          "SELECT base.source, base.n_docs, " +
          "coalesce(agg.n_pretok, CAST(0 AS BIGINT)) AS n_pretok, " +
          "coalesce(agg.n_chars, CAST(0 AS BIGINT)) AS n_chars, " +
          "coalesce(agg.n_bpe_tok, CAST(0 AS BIGINT)) AS n_bpe_tok, " +
          "coalesce(agg.n_chars, CAST(0 AS BIGINT)) - coalesce(agg.n_bpe_tok, CAST(0 AS BIGINT)) AS n_merges " +
          "FROM base LEFT JOIN agg ON base.source = agg.source ORDER BY base.source"),
      // curation funnel: all six stages recomputed from raw text — quality
      // (lambda SQL), dedup winners (text-partition window), contamination
      // (word 4-grams vs src0, injective word→id map), repetition
      // (unnest+group + list-comprehension bigrams), and the conjunction
      "q_curation_funnel" ->
        // coalesce(text, '') in every computed field (the q_bpe_tokenize
        // convention): Spark's kernels treat a NULL text as empty (zeros,
        // repetitive=false), while uncoalesced SQL yields NULL and a
        // NULL `NOT repetitive` silently drops the doc from n_nonrep.
        // The dedup window stays on RAW text: NULLs group together there,
        // mirroring the fingerprint convention (null -> 0L), and must not
        // collapse into the ''-text group.
        ("WITH t AS (SELECT doc_id, source, text, " +
          "len(list_filter(string_split(coalesce(text, ''), ' '), w -> w <> '')) AS wc, " +
          "len(list_filter(string_split(coalesce(text, ''), ' '), w -> w IN " +
          "('the','a','an','and','or','of','to','in','is','it'))) AS sw, " +
          "list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS ws FROM documents), " +
          "f AS (SELECT doc_id, source, wc, " +
          "(wc BETWEEN 5 AND 10000 AND 2 * sw <= wc) AS qok, " +
          "(row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1) AS kept FROM t), " +
          "g AS (SELECT doc_id, source, unnest(list_distinct(" +
          "CASE WHEN len(ws) >= 4 THEN [array_to_string(ws[i:i+3], '|') " +
          "for i in range(1, len(ws)-2)] ELSE CAST([] AS VARCHAR[]) END)) AS gram FROM t), " +
          "ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'), " +
          "contam AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram) WHERE g.source <> 'src0'), " +
          "tops AS (SELECT doc_id, max(c) AS top FROM (SELECT doc_id, word, count(*) AS c " +
          "FROM (SELECT doc_id, unnest(ws) AS word FROM t) GROUP BY doc_id, word) GROUP BY doc_id), " +
          "rep AS (SELECT t.doc_id, (coalesce(tops.top, 0) * 5 > len(ws) OR " +
          "(CASE WHEN len(ws) >= 2 THEN (len(ws) - 1) - " +
          "len(list_distinct([ws[i] || chr(1) || ws[i+1] for i in range(1, len(ws))])) ELSE 0 END) * 5 > " +
          "(CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END)) AS repetitive " +
          "FROM t LEFT JOIN tops ON t.doc_id = tops.doc_id), " +
          "j AS (SELECT f.doc_id, f.source, f.wc, f.qok, f.kept, " +
          "(contam.doc_id IS NULL) AS clean, rep.repetitive " +
          "FROM f LEFT JOIN contam ON f.doc_id = contam.doc_id " +
          "JOIN rep ON f.doc_id = rep.doc_id) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(CASE WHEN qok THEN 1 END) AS BIGINT) AS n_quality, " +
          "CAST(count(CASE WHEN kept THEN 1 END) AS BIGINT) AS n_unique, " +
          "CAST(count(CASE WHEN clean THEN 1 END) AS BIGINT) AS n_clean, " +
          "CAST(count(CASE WHEN NOT repetitive THEN 1 END) AS BIGINT) AS n_nonrep, " +
          "CAST(count(CASE WHEN kept AND qok AND clean AND NOT repetitive THEN 1 END) AS BIGINT) AS n_final, " +
          "CAST(coalesce(sum(CASE WHEN kept AND qok AND clean AND NOT repetitive THEN wc END), 0) AS BIGINT) AS tok_final " +
          "FROM j GROUP BY source ORDER BY source"),
      // the complete text-to-trainer replay: per-doc BPE token lists via
      // the same nested replaces (bpeEnc, inside a list comprehension over
      // the pre-tokens), lexicographic vocab ranks, the packing recurrence,
      // then per-sequence concatenation + offsets hashed exactly
      "q_text_to_sequences" ->
        ("WITH RECURSIVE p AS (SELECT doc_id, source, " +
          s"flatten([list_filter(string_split($bpeEnc, chr(1)), s -> s <> '') " +
          "for w in regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')]) AS toks " +
          "FROM documents), " +
          "vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY token) AS BIGINT) AS tid " +
          "FROM (SELECT DISTINCT unnest(toks) AS token FROM p)), " +
          "idl AS (SELECT doc_id, list(tid ORDER BY pos) AS ids FROM " +
          "(SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS tok FROM p) u " +
          "JOIN vocab ON u.tok = vocab.token GROUP BY doc_id), " +
          "ia AS (SELECT p.doc_id, p.source, coalesce(idl.ids, CAST([] AS BIGINT[])) AS toks " +
          "FROM p LEFT JOIN idl ON p.doc_id = idl.doc_id), " +
          "d AS (SELECT source, doc_id // 128 AS shard, doc_id, toks, " +
          "CAST(len(toks) AS BIGINT) AS n_tok, " +
          "row_number() OVER (PARTITION BY source, doc_id // 128 ORDER BY doc_id) AS rn FROM ia), " +
          "pack AS (SELECT source, shard, rn, n_tok, CAST(0 AS BIGINT) AS seq_id, n_tok AS fill " +
          "FROM d WHERE rn = 1 " +
          "UNION ALL SELECT nd.source, nd.shard, nd.rn, nd.n_tok, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN p.seq_id + 1 ELSE p.seq_id END, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN nd.n_tok ELSE p.fill + nd.n_tok END " +
          "FROM pack p JOIN d nd ON nd.source = p.source AND nd.shard = p.shard AND nd.rn = p.rn + 1), " +
          "seqs AS (SELECT p.source, p.shard, p.seq_id, d.doc_id, d.toks, d.n_tok, " +
          "CAST(sum(d.n_tok) OVER (PARTITION BY p.source, p.shard, p.seq_id ORDER BY d.doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - d.n_tok AS BIGINT) AS off " +
          "FROM pack p JOIN d ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn) " +
          "SELECT source, CAST(shard AS BIGINT) AS shard, seq_id, " +
          "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS seq_tok, " +
          "list_reduce([CAST(0 AS BIGINT)] || flatten(list(toks ORDER BY doc_id)), " +
          "(a,b) -> (a*1000003+b) % 2147483647) AS tokens_hash, " +
          "list_reduce([CAST(0 AS BIGINT)] || list(off ORDER BY doc_id), " +
          "(a,b) -> (a*1000003+b) % 2147483647) AS offsets_hash, " +
          "CAST((SELECT count(*) FROM vocab) AS BIGINT) AS vocab_size " +
          "FROM seqs GROUP BY source, shard, seq_id ORDER BY source, shard, seq_id"),
      // PII redaction: DuckDB rebuilds the identical planted augmentation,
      // then runs the SAME three regexes in the SAME URL -> EMAIL -> NUM
      // order (counts taken before each class's own replacement); the
      // total redacted length pins the rewritten text itself
      "q_pii_redact" ->
        ("WITH a AS (SELECT doc_id, source, CASE WHEN doc_id % 10 = 0 THEN " +
          "coalesce(text, '') || ' user' || CAST(doc_id AS VARCHAR) || '@example.com http://ex.com/' || " +
          "CAST(doc_id AS VARCHAR) || ' 90000000' || CAST(doc_id AS VARCHAR) " +
          "ELSE coalesce(text, '') END AS t FROM documents), " +
          "r1 AS (SELECT source, CAST(len(regexp_extract_all(t, 'https?://[^ ]+')) AS BIGINT) AS n_urls, " +
          "regexp_replace(t, 'https?://[^ ]+', '<URL>', 'g') AS t1 FROM a), " +
          "r2 AS (SELECT source, n_urls, " +
          "CAST(len(regexp_extract_all(t1, '[A-Za-z0-9.]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails, " +
          "regexp_replace(t1, '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g') AS t2 FROM r1), " +
          "r3 AS (SELECT source, n_urls, n_emails, " +
          "CAST(len(regexp_extract_all(t2, '[0-9]{9,}')) AS BIGINT) AS n_longnums, " +
          "regexp_replace(t2, '[0-9]{9,}', '<NUM>', 'g') AS t3 FROM r2) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(count(CASE WHEN n_urls + n_emails + n_longnums > 0 THEN 1 END) AS BIGINT) AS n_pii_docs, " +
          "CAST(sum(n_urls) AS BIGINT) AS n_urls, CAST(sum(n_emails) AS BIGINT) AS n_emails, " +
          "CAST(sum(n_longnums) AS BIGINT) AS n_longnums, " +
          "CAST(sum(len(t3)) AS BIGINT) AS redacted_len " +
          "FROM r3 GROUP BY source ORDER BY source"),
      // vocabulary build: exact counts + document frequencies from raw
      // text, relative floor cnt/total >= 1/100 by cross-multiplication
      "q_vocab_build" ->
        ("WITH c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt, " +
          "CAST(count(DISTINCT doc_id) AS BIGINT) AS df " +
          "FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS token " +
          "FROM documents) GROUP BY token), " +
          "t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c) " +
          "SELECT token, cnt, df FROM c, t WHERE cnt * 100 >= tot * 1 ORDER BY token"),
      // repetition quality signals: every cell integer-exact, recomputed
      // from raw text (word multiplicities via unnest+group, bigram
      // distincts via the list comprehension; chr(1) joiner matches the
      // kernel's U+0001 separator)
      "q_repetition_metrics" ->
        ("WITH w AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "tops AS (SELECT doc_id, max(c) AS top_word_count FROM (" +
          "SELECT doc_id, word, count(*) AS c FROM (SELECT doc_id, unnest(ws) AS word FROM w) GROUP BY doc_id, word) GROUP BY doc_id), " +
          "per AS (SELECT w.doc_id, w.source, " +
          "CAST(len(ws) AS BIGINT) AS n_words, " +
          "CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words, " +
          "CAST(coalesce(tops.top_word_count, 0) AS BIGINT) AS top_word_count, " +
          "CAST(CASE WHEN len(ws) >= 2 THEN len(ws) - 1 ELSE 0 END AS BIGINT) AS n_bigrams, " +
          "CAST(CASE WHEN len(ws) >= 2 THEN len(list_distinct([ws[i] || chr(1) || ws[i+1] for i in range(1, len(ws))])) ELSE 0 END AS BIGINT) AS n_distinct_bigrams " +
          "FROM w LEFT JOIN tops ON w.doc_id = tops.doc_id) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(n_words) AS BIGINT) AS words, " +
          "CAST(sum(n_distinct_words) AS BIGINT) AS distinct_words, " +
          "CAST(sum(top_word_count) AS BIGINT) AS top_word_mass, " +
          "CAST(sum(n_bigrams) AS BIGINT) AS bigrams, " +
          "CAST(sum(n_distinct_bigrams) AS BIGINT) AS distinct_bigrams, " +
          "CAST(count(CASE WHEN top_word_count * 5 > n_words " +
          "OR (n_bigrams - n_distinct_bigrams) * 5 > n_bigrams THEN 1 END) AS BIGINT) AS n_repetitive " +
          "FROM per GROUP BY source ORDER BY source"),
      // sequence packing: DuckDB replays the next-fit recurrence exactly
      // (one recursion step per document rank within its (source, shard)
      // group — depth bounded by shardDocs)
      "q_seq_packing" ->
        ("WITH RECURSIVE d AS (SELECT source, doc_id // 128 AS shard, doc_id, " +
          "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok, " +
          "row_number() OVER (PARTITION BY source, doc_id // 128 ORDER BY doc_id) AS rn FROM documents), " +
          "pack AS (SELECT source, shard, rn, n_tok, CAST(0 AS BIGINT) AS seq_id, n_tok AS fill " +
          "FROM d WHERE rn = 1 " +
          "UNION ALL SELECT nd.source, nd.shard, nd.rn, nd.n_tok, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN p.seq_id + 1 ELSE p.seq_id END, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN nd.n_tok ELSE p.fill + nd.n_tok END " +
          "FROM pack p JOIN d nd ON nd.source = p.source AND nd.shard = p.shard AND nd.rn = p.rn + 1) " +
          "SELECT source, CAST(shard AS BIGINT) AS shard, seq_id, " +
          "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS seq_tok " +
          "FROM pack GROUP BY source, shard, seq_id ORDER BY source, shard, seq_id"),
      // packed sequence CONTENT: same recurrence, then DuckDB rebuilds each
      // sequence's token concatenation (list aggregation in doc_id order)
      // and document offsets INDEPENDENTLY and hashes them with the same
      // exact BIGINT polynomial fold the Spark side applies — token ids are
      // the winnowing word-symbol char fold, reproduced from raw text
      "q_seq_pack_content" ->
        ("WITH RECURSIVE w0 AS (SELECT doc_id, source, " +
          "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "syms AS (SELECT doc_id, source, [list_reduce(" +
          "[CAST(0 AS BIGINT)] || [CAST(unicode(w[j]) AS BIGINT) for j in range(1, len(w)+1)], " +
          "(a,b) -> (a*31+b) % 2147483647) for w in ws] AS toks FROM w0), " +
          "d AS (SELECT source, doc_id // 128 AS shard, doc_id, toks, " +
          "CAST(len(toks) AS BIGINT) AS n_tok, " +
          "row_number() OVER (PARTITION BY source, doc_id // 128 ORDER BY doc_id) AS rn FROM syms), " +
          "pack AS (SELECT source, shard, rn, n_tok, CAST(0 AS BIGINT) AS seq_id, n_tok AS fill " +
          "FROM d WHERE rn = 1 " +
          "UNION ALL SELECT nd.source, nd.shard, nd.rn, nd.n_tok, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN p.seq_id + 1 ELSE p.seq_id END, " +
          "CASE WHEN p.fill + nd.n_tok > 256 THEN nd.n_tok ELSE p.fill + nd.n_tok END " +
          "FROM pack p JOIN d nd ON nd.source = p.source AND nd.shard = p.shard AND nd.rn = p.rn + 1), " +
          "seqs AS (SELECT p.source, p.shard, p.seq_id, d.doc_id, d.toks, d.n_tok, " +
          "CAST(sum(d.n_tok) OVER (PARTITION BY p.source, p.shard, p.seq_id ORDER BY d.doc_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - d.n_tok AS BIGINT) AS off " +
          "FROM pack p JOIN d ON d.source = p.source AND d.shard = p.shard AND d.rn = p.rn) " +
          "SELECT source, CAST(shard AS BIGINT) AS shard, seq_id, " +
          "CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS seq_tok, " +
          "list_reduce([CAST(0 AS BIGINT)] || flatten(list(toks ORDER BY doc_id)), " +
          "(a,b) -> (a*1000003+b) % 2147483647) AS tokens_hash, " +
          "list_reduce([CAST(0 AS BIGINT)] || list(off ORDER BY doc_id), " +
          "(a,b) -> (a*1000003+b) % 2147483647) AS offsets_hash " +
          "FROM seqs GROUP BY source, shard, seq_id ORDER BY source, shard, seq_id"),
      // mixture accounting: every count/mass column exact (integer
      // arithmetic, deterministic winners); sample booleans are exact
      // properties of the deterministic ES sample (constant true)
      "q_sampling_frame" ->
        ("WITH t AS (SELECT doc_id, source, text, " +
          "len(list_filter(string_split(text, ' '), w -> w <> '')) AS wc, " +
          "len(list_filter(string_split(text, ' '), w -> w IN " +
          "('the','a','an','and','or','of','to','in','is','it'))) AS sw FROM documents), " +
          "f AS (SELECT *, (wc BETWEEN 5 AND 10000 AND 2 * sw <= wc) AS qok, " +
          "(row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1) AS kept FROM t) " +
          "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(wc) AS BIGINT) AS tok_mass, " +
          "CAST(sum(CASE WHEN qok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality, " +
          "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, " +
          "CAST(sum(CASE WHEN kept AND qok AND wc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS frame_docs, " +
          "CAST(sum(CASE WHEN kept AND qok AND wc > 0 THEN wc ELSE 0 END) AS BIGINT) AS frame_tok_mass, " +
          "true AS sample_size_ok, true AS sample_members_ok " +
          "FROM f GROUP BY source ORDER BY source"),
      // the SAME regex evaluates in both engines (pattern restricted to the
      // Java-regex ∩ RE2 dialect; see TextPipeline.BpeIshPattern)
      "q_token_count_regex" ->
        ("SELECT CAST(doc_id AS VARCHAR) AS doc_id, " +
          "CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok_regex " +
          "FROM documents ORDER BY doc_id"),
      // winnowing: DuckDB recomputes the WHOLE pipeline independently —
      // charwise (acc*31 + codepoint) % P word symbols, polynomial k=4
      // gram hashes with a mod after every product (P = 2^31-1 keeps all
      // intermediates in BIGINT), w=5 window minima with rightmost
      // tie-break, then the same inverted-index overlap join. Exact
      // integer arithmetic end to end; no float tolerance anywhere.
      "q_winnow_fingerprints" ->
        ("WITH w0 AS (SELECT doc_id, source, " +
          "list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "syms AS (SELECT doc_id, source, [list_reduce(" +
          "[CAST(0 AS BIGINT)] || [CAST(unicode(w[j]) AS BIGINT) for j in range(1, len(w)+1)], " +
          "(a,b) -> (a*31+b) % 2147483647) for w in ws] AS sy FROM w0), " +
          "grams AS (SELECT doc_id, source, CASE WHEN len(sy) < 4 THEN CAST([] AS BIGINT[]) " +
          "ELSE [((sy[i]*1049561761)%2147483647 + (sy[i+1]*1426104154)%2147483647 + " +
          "(sy[i+2]*1000003)%2147483647 + sy[i+3]) % 2147483647 " +
          "for i in range(1, len(sy)-2)] END AS g FROM syms), " +
          "winnow AS (SELECT doc_id, source, CASE WHEN len(g) = 0 THEN CAST([] AS BIGINT[]) " +
          "ELSE list_distinct([g[p] for p in list_distinct(" +
          "[s + len(g[s:s+4]) - list_position(list_reverse(g[s:s+4]), list_min(g[s:s+4])) " +
          "for s in range(1, greatest(1, len(g)-4) + 1)])]) END AS fps FROM grams), " +
          "ex AS (SELECT doc_id, source, unnest(fps) AS fp FROM winnow), " +
          "docstats AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, " +
          "CAST(sum(len(fps)) AS BIGINT) AS total_fps FROM winnow GROUP BY source), " +
          "dfp AS (SELECT source, CAST(count(DISTINCT fp) AS BIGINT) AS distinct_fps " +
          "FROM ex GROUP BY source), " +
          // the SAME document-frequency cap the operator applies (maxDf
          // 1000, hot-boilerplate suppression) — fixture max df is 6, but
          // the oracle must carry the cap so the two can never diverge on
          // a hotter corpus
          "dfc AS (SELECT fp FROM ex GROUP BY fp HAVING count(*) <= 1000), " +
          "exc AS (SELECT ex.doc_id, ex.source, ex.fp FROM ex JOIN dfc USING (fp)), " +
          "prs AS (SELECT a.source AS source, a.doc_id AS da, b.doc_id AS db " +
          "FROM exc a JOIN exc b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
          "GROUP BY 1, 2, 3 HAVING count(*) >= 2), " +
          "ps AS (SELECT source, CAST(count(*) AS BIGINT) AS n_overlap_pairs FROM prs GROUP BY source) " +
          "SELECT d.source, d.n_docs, d.total_fps, " +
          "coalesce(dfp.distinct_fps, CAST(0 AS BIGINT)) AS distinct_fps, " +
          "coalesce(ps.n_overlap_pairs, CAST(0 AS BIGINT)) AS n_overlap_pairs " +
          "FROM docstats d LEFT JOIN dfp ON d.source = dfp.source " +
          "LEFT JOIN ps ON d.source = ps.source ORDER BY d.source"),
      "q_fingerprint_dedup" ->
        "SELECT source, count(DISTINCT text) AS n_uniq_fp FROM documents GROUP BY source ORDER BY source",
      "q_exact_dup_pairs" ->
        ("SELECT source, CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_dup_pairs FROM " +
          "(SELECT source, text, count(*) AS c FROM documents GROUP BY source, text) t " +
          "GROUP BY source ORDER BY source"),
      "q_quality_metrics" ->
        ("SELECT source, " +
          "CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS words, " +
          "CAST(sum(len(list_filter(string_split(text, ' '), w -> w IN " +
          "('the','a','an','and','or','of','to','in','is','it')))) AS BIGINT) AS stopwords, " +
          "CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '), w -> w <> '')) BETWEEN 5 AND 10000 " +
          "AND 2 * len(list_filter(string_split(text, ' '), w -> w IN " +
          "('the','a','an','and','or','of','to','in','is','it'))) <= " +
          "len(list_filter(string_split(text, ' '), w -> w <> '')) THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok " +
          "FROM documents GROUP BY source ORDER BY source"),
      "q_srp_ann_recall" ->
        "SELECT true AS sound, true AS recall_ok",
      "q_ivf_topk_matches" ->
        ("SELECT true AS full_probe_exact, true AS pruned_returns_k, " +
          "true AS stored_matches_memory, true AS partition_pruned"),
      // exact all-pairs word-3-gram-shingle Jaccard (the verify stage's own
      // semantics): LSH recall is 1 on this corpus with huge margin (least
      // similar true pair J=0.889 -> miss prob ~3e-14), so the verified
      // pair count equals the exact count. The least/greatest length guard
      // is a pure optimization: J >= 0.8 forces 5*min(|A|,|B|) >= 4*max.
      "q_minhash_lsh_dups" ->
        ("WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents), " +
          "g AS (SELECT doc_id, CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[]) " +
          "WHEN len(ws) < 3 THEN [array_to_string(ws, chr(1))] " +
          "ELSE list_distinct([array_to_string(ws[i:i+2], chr(1)) for i in range(1, len(ws)-1)]) END AS sh FROM w) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM g a JOIN g b " +
          "ON a.doc_id < b.doc_id AND len(a.sh) > 0 AND len(b.sh) > 0 " +
          "AND least(len(a.sh), len(b.sh)) * 5 >= greatest(len(a.sh), len(b.sh)) * 4 " +
          "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= 0.8"),
      // guaranteed invariants of the SimHash operator (hamming over keyed
      // hashes is not SQL-expressible; the booleans are computed exactly
      // in-Spark): identical-text pairs are always reported, at hamming 0.
      "q_simhash_dups" ->
        "SELECT true AS contains_all_exact_dup_pairs, true AS exact_dups_hamming_zero",
      // exact top-10 by cosine: DuckDB mirrors the double formula the
      // native graft_cosine_sim expression evaluates (sequential double
      // accumulation over the same element order); the rank-10/11
      // boundary gap is >= 9e-4 on every sf fixture, so cross-engine
      // float noise (~1e-15, incl. sqrt(na*nb) vs sqrt(na)*sqrt(nb))
      // cannot flip membership or order.
      "q_embedding_topk" ->
        ("WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), " +
          "c AS (SELECT vec_id, embedding AS e FROM embeddings WHERE vec_id <> 0) " +
          "SELECT vec_id FROM (SELECT c.vec_id, " +
          "list_sum([CAST(e[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE) for i in range(1, len(e)+1)]) / " +
          "(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in e])) * " +
          "sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in qe]))) AS cos " +
          "FROM c, q ORDER BY cos DESC, vec_id ASC LIMIT 10) t"),
      // embedding-cosine near-dup: DuckDB rebuilds the SAME augmented
      // table (perturbed twin of every fifth vector) and counts exact
      // all-pairs cosine >= 0.9 from unnest + generate_subscripts dot
      // products in double. Planted pairs sit at ~0.99837, the densest
      // background pair at <= 0.601 (measured at sf0.01/sf0.1) — the
      // ~0.4 margin means cross-engine float noise (~1e-7, incl.
      // libm-vs-Math.sin on the perturbation) cannot flip any pair.
      "q_embedding_neardups" ->
        ("WITH ex0 AS (SELECT CAST(vec_id AS BIGINT) AS vid, " +
          "CAST(unnest(embedding) AS DOUBLE) AS x, " +
          "generate_subscripts(embedding, 1) AS i FROM embeddings), " +
          "plx AS (SELECT vid + 10000000 AS pvid, " +
          "CAST(CAST(x + 0.01 * sin(vid + i) AS FLOAT) AS DOUBLE) AS px, i " +
          "FROM ex0 WHERE vid % 5 = 0), " +
          "allx AS (SELECT vid, x, i FROM ex0 " +
          "UNION ALL SELECT pvid AS vid, px AS x, i FROM plx), " +
          "norms AS (SELECT vid, sqrt(sum(x * x)) AS nrm FROM allx GROUP BY vid), " +
          "dots AS (SELECT a.vid AS va, b.vid AS vb, sum(a.x * b.x) AS d " +
          "FROM allx a JOIN allx b ON a.i = b.i AND a.vid < b.vid GROUP BY 1, 2), " +
          "pairs AS (SELECT va, vb FROM dots, norms na, norms nb " +
          "WHERE dots.va = na.vid AND dots.vb = nb.vid " +
          "AND na.nrm > 0 AND nb.nrm > 0 AND d / (na.nrm * nb.nrm) >= 0.9) " +
          "SELECT CAST(count(*) AS BIGINT) AS n_pairs, " +
          "CAST(count(*) FILTER (vb - va = 10000000) AS BIGINT) AS n_planted, " +
          "true AS lsh_equals_exact FROM pairs"),
      // the multimodal pipeline decodes REAL PNG/WAV/frame-container
      // payloads whose decoded features are closed-form in media_id
      // (Multimodal.{width,height,gray,frames}Of); the oracle re-derives
      // the closed form over the same id range — any encode or decode
      // defect breaks the match. total_bytes (codec-dependent) is
      // intentionally not part of the checked projection.
      "q_multimodal_features" ->
        ("WITH m AS (SELECT range AS id FROM range(0, 2000)), " +
          "f AS (SELECT id, " +
          "CASE CAST(id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, " +
          "'src' || CAST(id % 4 AS VARCHAR) AS source, " +
          "CASE WHEN id % 3 = 1 THEN 0 ELSE 16 + id % 13 END AS width, " +
          "CASE WHEN id % 3 = 1 THEN 0 ELSE 16 + id % 7 END AS height, " +
          "CASE WHEN id % 3 = 2 THEN 1 + id % 5 ELSE 1 END AS frames, " +
          "id % 256 AS intensity FROM m) " +
          "SELECT source, media_type, CAST(count(*) AS BIGINT) AS n, " +
          "CAST(sum(width) AS BIGINT) AS total_width, CAST(sum(height) AS BIGINT) AS total_height, " +
          "CAST(sum(frames) AS BIGINT) AS total_frames, CAST(sum(intensity) AS BIGINT) AS sum_intensity " +
          "FROM f GROUP BY source, media_type ORDER BY source, media_type"),
      // streaming windows are deterministic functions of doc_id (epoch0 +
      // doc_id mod 600 s, 60 s windows); probing each window's Bloom with
      // its own token stream counts exactly (no false negatives), so the
      // oracle recomputes per-(window, source) token counts directly.
      // HAVING > 0: zero-token groups produce no probe rows in Spark.
      "q_streaming_bloom_windows" ->
        ("SELECT CAST((doc_id % 600) // 60 AS BIGINT) AS win, source, " +
          "CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS n_present " +
          "FROM documents GROUP BY win, source HAVING n_present > 0 ORDER BY win, source"),
      // append mode: rows with (doc_id % 600) < 300 replay AFTER the
      // watermark has passed their windows' end, so Spark must drop every
      // one of them — the oracle recomputes per-window counts over the
      // SURVIVING half only (see StreamingSketch.replayBloomWindowsAppend).
      "q_streaming_append_latedrop" ->
        ("SELECT CAST((doc_id % 600) // 60 AS BIGINT) AS win, source, " +
          "CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS n_present " +
          "FROM documents WHERE (doc_id % 600) >= 300 " +
          "GROUP BY win, source HAVING n_present > 0 ORDER BY win, source"),
      // windowed MG guarantees are exact and arrival-order-invariant, so
      // the oracle enumerates the (window, source) domain as constant-true
      "q_streaming_trending_tokens" ->
        ("SELECT CAST((doc_id % 600) // 60 AS BIGINT) AS win, source, true AS within_bound " +
          "FROM documents GROUP BY win, source " +
          // a (window, source) group exists only if it streamed >= 1 token
          "HAVING sum(len(list_filter(string_split(text, ' '), w -> w <> ''))) > 0 " +
          "ORDER BY win, source"),
      // the language-ID heuristic re-expressed in SQL: marker-word votes
      // over the distinct lowercased word set, ties to the lexically
      // largest language (maxBy on (score, lang)), CJK/Cyrillic ranges
      // checked first, empty/no-marker texts -> 'und'.
      "q_lang_id" ->
        ("WITH t AS (SELECT coalesce(text, '') AS txt, " +
          "list_distinct(list_filter(string_split(lower(coalesce(text, '')), ' '), w -> w <> '')) AS ws FROM documents), " +
          "s AS (SELECT txt, " +
          "len(list_intersect(ws, ['the','and','of','is'])) AS s_en, " +
          "len(list_intersect(ws, ['el','la','de','que'])) AS s_es, " +
          "len(list_intersect(ws, ['der','die','und','ist'])) AS s_de, " +
          "len(list_intersect(ws, ['le','la','et','est'])) AS s_fr FROM t), " +
          "p AS (SELECT CASE WHEN txt = '' THEN 'und' " +
          "WHEN regexp_matches(lower(txt), '[\\x{4e00}-\\x{9fff}]') THEN 'zh' " +
          "WHEN regexp_matches(lower(txt), '[\\x{0400}-\\x{04ff}]') THEN 'ru' " +
          "WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und' " +
          "WHEN s_fr = greatest(s_en, s_es, s_de, s_fr) THEN 'fr' " +
          "WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es' " +
          "WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en' " +
          "ELSE 'de' END AS lang_pred FROM s) " +
          "SELECT lang_pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY lang_pred ORDER BY lang_pred")
    )
  }
}
