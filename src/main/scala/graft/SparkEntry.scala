package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry over the
  * driver test tables and (where SQL-expressible) a DuckDB `oracleSql` twin
  * with IDENTICAL output column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinRevenue(spark, "/root/testdata/sf0.001")

  /** q107's oracle — shared verbatim by d113 (the incremental form must
    * equal the one-shot, so the oracle IS the one-shot's SQL).
    */
  private val retentionSql =
    """WITH act AS (
         SELECT DISTINCT user_id,
           CAST(floor((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0)
             AS BIGINT) AS wk
         FROM events),
       coh AS (
         SELECT user_id, min(wk) AS cohort_week FROM act GROUP BY 1)
     SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(a.wk - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
     FROM act a JOIN coh c USING (user_id)
     GROUP BY 1, 2 ORDER BY 1, 2"""

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (Relational.q01FilterProject _),
    "q02_agg_pricing" -> (Relational.q02AggPricing _),
    "q03_join_revenue" -> (Relational.q03JoinRevenue _),
    "q04_anti_join" -> (Relational.q04AntiJoin _),
    "q05_semi_join" -> (Relational.q05SemiJoin _),
    "q06_window_topn" -> (Relational.q06WindowTopN _),
    "q07_last_event" -> (Relational.q07LastEvent _),
    "q08_json_extract" -> (Relational.q08JsonExtract _),
    "q09_distinct" -> (Relational.q09Distinct _),
    "q10_rollup" -> (Relational.q10Rollup _),
    "q11_case_classify" -> (Relational.q11CaseClassify _),
    "q12_strftime" -> (Relational.q12Strftime _),
    "q13_time_filter" -> (Relational.q13TimeFilter _),
    "q14_topk" -> (Relational.q14TopK _),
    "q15_asof_join" -> (Relational.q15AsOfJoin _),
    "q16_merge_upsert" -> (Relational.q16MergeUpsert _),
    "q17_local_time" -> (Relational.q17LocalTime _),
    "q18_regex_extract" -> (Relational.q18RegexExtract _),
    "q19_counters" -> (Relational.q19Counters _),
    "t20_token_count" -> (TextOps.t20TokenCount _),
    "t21_quality" -> (TextOps.t21Quality _),
    "t22_lang_id" -> (TextOps.t22LangId _),
    "t23_fingerprint" -> (TextOps.t23Fingerprint _),
    "d24_exact_dedup" -> (TextOps.d24ExactDedup _),
    "d25_ngram_jaccard" -> (TextOps.d25NgramJaccard _),
    "d26_minhash_lsh" -> (TextOps.d26MinhashLsh _),
    "d84_incremental_dedup" -> (TextOps.d84IncrementalDedup _),
    "d27_simhash" -> (TextOps.d27Simhash _),
    "q32_percentile" -> (Relational.q32Percentile _),
    "q33_grouping_sets" -> (Relational.q33GroupingSets _),
    "q34_pivot" -> (Relational.q34Pivot _),
    "q35_stats" -> (Relational.q35Stats _),
    "q36_setops" -> (Relational.q36SetOps _),
    "q37_approx_distinct" -> (Relational.q37ApproxDistinct _),
    "q38_range_join" -> (Relational.q38RangeJoin _),
    "v39_centroids" -> (VectorOps.v39Centroids _),
    "v28_cosine_topk" -> (VectorOps.v28CosineTopK _),
    "v29_lsh_buckets" -> (VectorOps.v29LshBuckets _),
    "v30_ann_lsh" -> (VectorOps.v30AnnLsh _),
    "m31_binary_meta" -> (VectorOps.m31BinaryMeta _),
    "d40_embed_neardup" -> (VectorOps.d40EmbedNearDup _),
    "v41_ivf_ann" -> (VectorOps.v41IvfAnn _),
    "v120_incremental_ivf" -> (VectorOps.v120IncrementalIvf _),
    "v122_filtered_ann" -> (VectorOps.v122FilteredAnn _),
    "v127_tombstone_ann" -> (VectorOps.v127TombstoneAnn _),
    "q42_quantile_sketch" -> (Relational.q42QuantileSketch _),
    "q43_cube" -> (Relational.q43Cube _),
    "q44_intersect" -> (Relational.q44Intersect _),
    "q45_sessionize" -> (Relational.q45Sessionize _),
    "d46_dedup_clusters" -> (TextOps.d46DedupClusters _),
    "t47_repetition" -> (TextOps.t47Repetition _),
    "t48_pii_scan" -> (TextOps.t48PiiScan _),
    "q49_heavy_hitters" -> (Relational.q49HeavyHitters _),
    "q50_moving_avg" -> (Relational.q50MovingAvg _),
    "q51_scalar_subquery" -> (Relational.q51ScalarSubquery _),
    "q52_filtered_agg" -> (Relational.q52FilteredAgg _),
    "q53_string_agg" -> (Relational.q53StringAgg _),
    "q54_lag_lead" -> (Relational.q54LagLead _),
    "q55_unpivot" -> (Relational.q55Unpivot _),
    "q56_correlated_sub" -> (Relational.q56CorrelatedSub _),
    "d57_passage_dedup" -> (TextOps.d57PassageDedup _),
    "t58_source_stats" -> (TextOps.t58SourceStats _),
    "t59_gopher_filter" -> (TextOps.t59GopherFilter _),
    "v60_kmeans" -> (VectorOps.v60Kmeans _),
    "v61_array_hof" -> (VectorOps.v61ArrayHof _),
    "q62_rank_family" -> (Relational.q62RankFamily _),
    "q63_date_trunc" -> (Relational.q63DateTrunc _),
    "v64_pq_ann" -> (VectorOps.v64PqAnn _),
    "v121_incremental_pq" -> (VectorOps.v121IncrementalPq _),
    "t65_clean_pipeline" -> (TextOps.t65CleanPipeline _),
    "t66_hash_split" -> (TextOps.t66HashSplit _),
    "t67_decontaminate" -> (TextOps.t67Decontaminate _),
    "t68_nfc_normalize" -> (TextOps.t68NfcNormalize _),
    "t69_pack_sequences" -> (TextOps.t69PackSequences _),
    "t70_stratified_sample" -> (TextOps.t70StratifiedSample _),
    "t71_tfidf_topterms" -> (TextOps.t71TfidfTopTerms _),
    "t72_temp_mixing" -> (TextOps.t72TempMixing _),
    "q73_topk_agg" -> (Relational.q73TopKAgg _),
    "v74_scalar_quant" -> (VectorOps.v74ScalarQuant _),
    "t75_collocations" -> (TextOps.t75Collocations _),
    "v76_matryoshka_recall" -> (VectorOps.v76MatryoshkaRecall _),
    "q77_salted_join" -> (Relational.q77SaltedJoin _),
    "q78_sketch_merge" -> (Relational.q78SketchMerge _),
    "t79_ngram_repetition" -> (TextOps.t79NgramRepetition _),
    "v80_ann_recall" -> (VectorOps.v80AnnRecall _),
    "t81_line_rules" -> (TextOps.t81LineRules _),
    "d85_line_dedup" -> (TextOps.d85LineDedup _),
    "t86_c4_rules" -> (TextOps.t86C4Rules _),
    "v82_ann_frontier" -> (VectorOps.v82AnnFrontier _),
    "v83_semantic_dedup" -> (VectorOps.v83SemanticDedup _),
    "t87_exact_substring" -> (TextOps.t87ExactSubstring _),
    "t88_shuffle_shard" -> (TextOps.t88ShuffleShard _),
    "d89_substring_removal" -> (TextOps.d89SubstringRemoval _),
    "d91_incremental_cc" -> (TextOps.d91IncrementalCc _),
    "d92_incremental_semdedup" -> (VectorOps.d92IncrementalSemDedup _),
    "d93_url_dedup" -> (TextOps.d93UrlDedup _),
    "t94_perplexity_buckets" -> (TextOps.t94PerplexityBuckets _),
    "d95_lsh_recall" -> (TextOps.d95LshRecall _),
    "d96_incremental_pipeline" -> (TextOps.d96IncrementalPipeline _),
    "d97_containment" -> (TextOps.d97Containment _),
    "t99_blocklist_filter" -> (TextOps.t99BlocklistFilter _),
    "t100_source_cap" -> (TextOps.t100SourceCap _),
    "d101_incremental_url" -> (TextOps.d101IncrementalUrlDedup _),
    "d123_tombstone_dedup" -> (TextOps.d123TombstoneDedup _),
    "d98_image_neardup" -> (graft.multimodal.Multimodal.d98ImageNearDup _),
    "d102_audio_neardup" -> (graft.multimodal.Multimodal.d102AudioNearDup _),
    "d103_video_overlap" -> (graft.multimodal.Multimodal.d103VideoOverlap _),
    "d104_incremental_image" ->
      (graft.multimodal.Multimodal.d104IncrementalImageDedup _),
    "d105_image_clusters" ->
      (graft.multimodal.Multimodal.d105ImageClusters _),
    "d106_multimodal_dedup" ->
      (graft.multimodal.Multimodal.d106MultimodalDedup _),
    "q107_retention_cohorts" -> (Relational.q107RetentionCohorts _),
    "q108_funnel" -> (Relational.q108Funnel _),
    "t109_bloom_decontaminate" -> (TextOps.t109BloomDecontaminate _),
    "q110_zorder_layout" -> (Layout.q110ZorderLayout _),
    "d111_incremental_audio" ->
      (graft.multimodal.Multimodal.d111IncrementalAudioDedup _),
    "t112_quality_classifier" -> (TextOps.t112QualityClassifier _),
    "d113_incremental_retention" -> (Relational.d113IncrementalRetention _),
    "q114_countmin" -> (Relational.q114CountMin _),
    "q115_windowed_funnel" -> ((s, dir) =>
      Relational.q115WindowedFunnel(s, dir)),
    "q116_group_percentile" -> (Relational.q116GroupPercentile _),
    "d117_incremental_video" ->
      (graft.multimodal.Multimodal.d117IncrementalVideoDedup _),
    "d124_mjpeg_video_dedup" ->
      (graft.multimodal.Multimodal.d124MjpegVideoDedup _),
    "d126_tombstone_image" ->
      (graft.multimodal.Multimodal.d126TombstoneImageClusters _),
    "d118_full_multimodal_gate" ->
      (graft.multimodal.Multimodal.d118FullMultimodalGate _),
    "d119_incremental_multimodal" ->
      (graft.multimodal.Multimodal.d119IncrementalMultimodalGate _),
    "t125_training_manifest" -> (TextOps.t125TrainingManifest _),
    "d128_tombstone_cc" -> (TextOps.d128TombstoneCc _),
    "v129_filtered_pq" -> (VectorOps.v129FilteredPq _),
    "v130_tombstone_pq" -> (VectorOps.v130TombstonePq _),
    "d131_update_reingest" -> (TextOps.d131UpdateReingest _),
    "v132_ivfpq_ann" -> (VectorOps.v132IvfPq _),
    "v133_ivfpq_residual" -> (VectorOps.v133IvfPqResidual _),
    "v134_ivfpq_rerank" -> (VectorOps.v134IvfPqRerank _),
    "t135_link_pagerank" -> (TextOps.t135LinkPagerank _),
    "t136_priority_sample" -> (TextOps.t136PrioritySample _),
    "d137_quality_keeper" -> (TextOps.d137QualityKeeper _),
    "t138_leakage_split" -> (TextOps.t138LeakageSplit _),
    "t139_bpe_learn" -> (BpeOps.t139BpeLearn _),
    "t140_bpe_tokenize" -> (BpeOps.t140BpeTokenize _),
    "t141_bpe_pack" -> (BpeOps.t141BpePack _),
    "v142_filtered_ivfpq" -> (VectorOps.v142FilteredIvfPq _),
    "v143_filtered_rerank" -> (VectorOps.v143FilteredRerank _),
    "v144_vec_update" -> (VectorOps.v144VecUpdateReencode _),
    "t145_pagerank_delta" -> (TextOps.t145PagerankDelta _),
    "t146_bpe_heldout" -> (BpeOps.t146BpeHeldout _),
    "t147_bpe_chunk" -> (BpeOps.t147BpeChunk _),
    "t148_bpe_efficiency" -> (BpeOps.t148BpeEfficiency _),
    "t149_bm25" -> (TextOps.t149Bm25 _),
    "d151_incremental_postings" -> (TextOps.d151IncrementalPostings _),
    "t150_hybrid_fusion" -> (FusionOps.t150HybridFusion _),
    "t152_dsir_select" -> (TextOps.t152DsirSelect _),
    "t153_hits" -> (TextOps.t153Hits _),
    "v154_density_prune" -> (VectorOps.v154DensityPrune _),
    "d155_incremental_dsir" -> (TextOps.d155IncrementalDsir _),
    "v156_incremental_prune" -> (VectorOps.v156IncrementalPrune _),
    "t157_bigram_lm" -> (TextOps.t157BigramLm _),
    "d158_incremental_lm" -> (TextOps.d158IncrementalLm _),
    "t159_curated_manifest" -> (TextOps.t159CuratedManifest _),
    "t160_filtered_fusion" -> (FusionOps.t160FilteredFusion _),
    "t161_lm_leakage_fold" -> (TextOps.t161LmLeakageFold _),
    "t162_fusion_recall" -> (FusionOps.t162FusionRecall _),
    "t163_decontamination" -> (TextOps.t163Decontamination _),
    "t164_mixture_sample" -> (TextOps.t164MixtureSample _),
    "d165_incremental_decontam" -> (TextOps.d165IncrementalDecontam _),
    "t166_sequence_pack" -> (TextOps.t166SequencePack _),
    "t167_pack_selected" -> (TextOps.t167PackSelected _),
    "t168_clean_select" -> (TextOps.t168CleanSelect _),
    "d169_incremental_clean_select" -> (TextOps.d169IncrementalCleanSelect _),
    "t170_training_plane" -> (TextOps.t170TrainingPlane _),
    "t171_epoch_pack" -> (TextOps.t171EpochPack _),
    "t172_fixed_eval_decontam" -> (TextOps.t172FixedEvalDecontam _),
    "d173_fresh_recall" -> (FusionOps.d173FreshRecall _),
    "t174_multisuite_decontam" -> (TextOps.t174MultiSuiteDecontam _),
    "d175_suite_onboard" -> (TextOps.d175SuiteOnboard _),
    "t176_suite_attribution" -> (TextOps.t176SuiteAttribution _),
    "v177_semdedup_recall" -> (VectorOps.v177SemdedupRecall _),
    "t178_epoch_plane" -> (TextOps.t178EpochPlane _),
    "d179_postings_revision" -> (TextOps.d179PostingsRevision _),
    "v180_multiprobe_dedup" -> (VectorOps.v180MultiProbeDedup _),
    "v181_multiprobe_recall" -> (VectorOps.v181MultiProbeRecall _),
    "d182_batch_attribution" -> (TextOps.d182BatchSuiteAttribution _),
  )

  /** DuckDB oracle SQL per query (same parquet tables, same column names). */
  def oracleSql: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "q02_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q03_join_revenue" ->
      """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q05_semi_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity > 49)
         ORDER BY p_partkey""",
    "q06_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q07_last_event" ->
      """SELECT user_id, event_id AS last_event_id,
           event_type AS last_event_type
         FROM (SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
               FROM events) t
         WHERE rn = 1 ORDER BY user_id""",
    "q08_json_extract" ->
      """SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q09_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
         ORDER BY o_orderstatus, o_orderpriority""",
    "q10_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
           round(sum(c_acctbal), 2) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q11_case_classify" ->
      """SELECT event_type,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid' ELSE 'high' END AS band,
           count(*) AS cnt, round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type, band ORDER BY event_type, band""",
    "q12_strftime" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS sum_price
         FROM orders GROUP BY ym ORDER BY ym""",
    "q13_time_filter" ->
      """SELECT event_type, count(*) AS cnt FROM events
         WHERE strftime(ts, '%H:%M:%S') < '12:00:00'
         GROUP BY event_type ORDER BY event_type""",
    "q14_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q15_asof_join" ->
      """SELECT purchase_event_id, user_id, prior_event_id FROM (
           SELECT p.event_id AS purchase_event_id, p.user_id,
             e.event_id AS prior_event_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
           FROM events p
           LEFT JOIN events e ON p.user_id = e.user_id AND e.ts < p.ts
             AND e.event_type <> 'purchase'
           WHERE p.event_type = 'purchase') t
         WHERE rn = 1 ORDER BY purchase_event_id""",
    "q16_merge_upsert" ->
      """SELECT o_orderkey, price, src FROM (
           SELECT o_orderkey, price, src,
             row_number() OVER (PARTITION BY o_orderkey
               ORDER BY CASE WHEN src = 'new' THEN 0 ELSE 1 END) AS rn
           FROM (
             SELECT o_orderkey, o_totalprice AS price, 'old' AS src
             FROM orders WHERE o_orderkey % 3 <> 0
             UNION ALL
             SELECT o_orderkey, o_totalprice + 100.0 AS price, 'new' AS src
             FROM orders WHERE o_orderkey % 2 = 0) u) t
         WHERE rn = 1 ORDER BY o_orderkey""",
    "q17_local_time" ->
      """SELECT event_id,
           CASE WHEN user_id % 4 = 0 THEN 'Australia/Sydney'
                WHEN user_id % 4 = 1 THEN 'Europe/London'
                WHEN user_id % 4 = 2 THEN 'America/New_York'
                ELSE 'Asia/Tokyo' END AS tz,
           strftime(timezone(CASE WHEN user_id % 4 = 0 THEN 'Australia/Sydney'
                WHEN user_id % 4 = 1 THEN 'Europe/London'
                WHEN user_id % 4 = 2 THEN 'America/New_York'
                ELSE 'Asia/Tokyo' END,
              timezone('UTC', CAST(ts AS TIMESTAMP))),
             '%Y-%m-%d %H:%M:%S') AS local_ts,
           strftime(timezone(CASE WHEN user_id % 4 = 0 THEN 'Australia/Sydney'
                WHEN user_id % 4 = 1 THEN 'Europe/London'
                WHEN user_id % 4 = 2 THEN 'America/New_York'
                ELSE 'Asia/Tokyo' END,
              timezone('UTC', CAST(ts AS TIMESTAMP))),
             '%A') AS local_dow
         FROM events ORDER BY event_id""",
    "q18_regex_extract" ->
      """SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_head,
           count(*) AS cnt,
           count(DISTINCT regexp_extract(p_name, '^(\w+)', 1)) AS n_first
         FROM part GROUP BY type_head ORDER BY type_head""",
    "q19_counters" ->
      """SELECT event_type AS status, count(*) AS n,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type ORDER BY status""",
    "t20_token_count" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]'))
             AS BIGINT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",
    "t21_quality" ->
      """SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
             AS n_words,
           floor((length(regexp_replace(text, '\s', '', 'g')) * 1.0
             / len(string_split_regex(trim(lower(text)), '\s+'))) * 10000)
             / 10000 AS avg_word_len,
           floor((len(regexp_extract_all(lower(text),
               '\b(the|a|of|and|to|in|is)\b')) * 1.0
             / len(string_split_regex(trim(lower(text)), '\s+'))) * 10000)
             / 10000 AS stop_ratio,
           floor((0.4 * least(len(string_split_regex(trim(lower(text)), '\s+'))
                 / 100.0, 1.0)
             + 0.3 * (len(regexp_extract_all(lower(text),
                 '\b(the|a|of|and|to|in|is)\b')) * 1.0
               / len(string_split_regex(trim(lower(text)), '\s+')))
             + 0.3 * least((length(regexp_replace(text, '\s', '', 'g')) * 1.0
               / len(string_split_regex(trim(lower(text)), '\s+'))) / 8.0,
               1.0)) * 10000) / 10000 AS quality
         FROM documents ORDER BY doc_id""",
    "t22_lang_id" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|is|to)\b'))
             AS BIGINT) AS s_en,
           CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b'))
             AS BIGINT) AS s_de,
           CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est)\b'))
             AS BIGINT) AS s_fr,
           CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|y|es)\b'))
             AS BIGINT) AS s_es,
           CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS BIGINT)
             AS s_zh,
           lang AS labeled_lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
               AND s_en >= s_zh THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
             WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_zh THEN 'es'
             ELSE 'zh' END AS predicted
         FROM documents ORDER BY doc_id""",
    "t23_fingerprint" ->
      """SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
           count(*) OVER (PARTITION BY
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
             AS dup_cnt,
           doc_id = min(doc_id) OVER (PARTITION BY
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
             AS is_keeper
         FROM documents ORDER BY doc_id""",
    "d24_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fp,
           count(*) AS n_docs, min(doc_id) AS keeper
         FROM documents GROUP BY fp ORDER BY fp""",
    "q32_percentile" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q33_grouping_sets" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
           round(sum(o_totalprice), 2) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority))
         ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q34_pivot" ->
      """SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q35_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(avg(l_discount), 6) AS avg_disc,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qe
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q36_setops" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
         ORDER BY c_custkey""",
    "q37_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
           count(*) AS n, TRUE AS sketch_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q42_quantile_sketch" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_exact,
           count(*) AS n, TRUE AS sketch_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q43_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q44_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000
         ORDER BY c_custkey""",
    "q45_sessionize" ->
      """WITH o AS (
           SELECT user_id, event_id, ts,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
           FROM events),
         s AS (
           SELECT user_id, event_id, ts,
             CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
                           THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS sess
           FROM o)
         SELECT user_id, sess, count(*) AS n_events,
           min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms
         FROM s GROUP BY user_id, sess ORDER BY user_id, sess""",
    "t47_repetition" ->
      """WITH w AS (SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
           FROM documents),
         c AS (SELECT doc_id, word, count(*) AS cnt
               FROM w GROUP BY doc_id, word)
         SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(cnt) AS BIGINT) AS top_cnt,
           floor(max(cnt) * 1.0 / sum(cnt) * 10000) / 10000 AS top_word_frac,
           floor((sum(cnt) - count(*)) * 1.0 / sum(cnt) * 10000) / 10000
             AS dup_word_frac
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "t48_pii_scan" ->
      """WITH p AS (SELECT doc_id,
             text || ' contact uid.' || doc_id || '@example.org tel 555-'
               || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
               || lpad(CAST(doc_id * 7 % 10000 AS VARCHAR), 4, '0')
               || ' host 10.' || (doc_id % 256) || '.0.' || (doc_id % 100)
               AS pii
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(pii,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(pii, '\b\d{3}-\d{3}-\d{4}\b'))
             AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(pii,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(pii,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))
             AS red_fp
         FROM p ORDER BY doc_id""",
    "q49_heavy_hitters" ->
      """SELECT event_type, count(*) AS cnt, TRUE AS sketch_ok
         FROM events GROUP BY event_type
         HAVING count(*) * 1.0 / (SELECT count(*) FROM events) > 0.05
         ORDER BY event_type""",
    "q50_moving_avg" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS d, sum(o_totalprice) AS rev_raw,
             count(*) AS n
           FROM orders GROUP BY d),
         wd AS (
           SELECT d, rev_raw, n,
             date_diff('day', DATE '1970-01-01', d) AS dn
           FROM daily)
         SELECT d, round(rev_raw, 2) AS rev, n,
           round(sum(rev_raw) OVER (ORDER BY dn
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rev7,
           CAST(sum(n) OVER (ORDER BY dn
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n7
         FROM wd ORDER BY d""",
    "q51_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_above,
           round(min(o_totalprice), 2) AS min_above
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q52_filtered_agg" ->
      """SELECT l_returnflag,
           count(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2)
             AS disc_rev,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q53_string_agg" ->
      """SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
             ORDER BY o_orderkey) AS order_keys,
           count(*) AS n_orders
         FROM orders WHERE o_custkey % 100 = 0
         GROUP BY o_custkey ORDER BY o_custkey""",
    "d46_dedup_clusters" -> OracleGen.dedupClusters,
    "d25_ngram_jaccard" -> OracleGen.ngramJaccard,
    "d26_minhash_lsh" -> OracleGen.minhashLsh,
    // the incremental path must reproduce the FULL recompute's pair set:
    // same oracle SQL as d26 by construction
    "d84_incremental_dedup" -> OracleGen.minhashLsh,
    "d27_simhash" -> OracleGen.simhash,
    "v28_cosine_topk" -> OracleGen.cosineTopK,
    "v29_lsh_buckets" -> OracleGen.lshBuckets,
    "v30_ann_lsh" -> OracleGen.annLsh,
    "d40_embed_neardup" -> OracleGen.embedNearDup,
    "v41_ivf_ann" -> OracleGen.ivfAnn,
    "v120_incremental_ivf" -> OracleGen.incrementalIvf,
    "v122_filtered_ann" -> OracleGen.filteredIvfAnn,
    "v127_tombstone_ann" -> OracleGen.tombstoneAnn,
    "m31_binary_meta" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5, source
         FROM documents ORDER BY doc_id""",
    "q38_range_join" ->
      """SELECT d, count(*) AS cnt FROM
           (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
            WHERE o_orderpriority = '1-URGENT') u
         JOIN (SELECT CAST(l_shipdate AS DATE) AS sd FROM lineitem) l
           ON sd >= d AND sd < d + 7
         GROUP BY d ORDER BY d""",
    "q54_lag_lead" ->
      """SELECT event_id, user_id,
           round(lag(value) OVER w, 2) AS prev_value,
           round(lead(value) OVER w, 2) AS next_value,
           round(value - coalesce(lag(value) OVER w, value), 2) AS delta
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "q55_unpivot" ->
      """WITH base AS (
           SELECT l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_price,
             round(sum(l_discount), 2) AS sum_disc
           FROM lineitem GROUP BY l_linestatus)
         SELECT l_linestatus, measure, val FROM (
           SELECT l_linestatus, 'sum_qty' AS measure, sum_qty AS val FROM base
           UNION ALL
           SELECT l_linestatus, 'sum_price', sum_price FROM base
           UNION ALL
           SELECT l_linestatus, 'sum_disc', sum_disc FROM base) u
         ORDER BY l_linestatus, measure""",
    "q56_correlated_sub" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
         FROM orders o
         WHERE o_totalprice > (SELECT 1.5 * avg(o2.o_totalprice)
                               FROM orders o2
                               WHERE o2.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",
    "d57_passage_dedup" ->
      """WITH w AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents
           WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 10),
         ch AS (
           SELECT doc_id, array_to_string(ws[i*10+1:i*10+10], ' ') AS chunk
           FROM w, unnest(generate_series(0, len(ws)//10 - 1)) AS t(i))
         SELECT md5(chunk) AS fp, count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_occ, min(doc_id) AS keeper
         FROM ch GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
         ORDER BY fp""",
    "t58_source_stats" ->
      """SELECT source, count(*) AS n_docs,
           CAST(sum(len(string_split_regex(trim(lower(text)), '\s+')))
             AS BIGINT) AS total_words,
           floor(avg(n_chars) * 100) / 100 AS avg_chars,
           count(DISTINCT lang) AS n_langs,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
         FROM documents GROUP BY source ORDER BY source""",
    "t59_gopher_filter" -> OracleGen.gopherFilter,
    "v60_kmeans" -> OracleGen.kmeans,
    "q62_rank_family" ->
      """SELECT event_id, user_id,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           floor(percent_rank() OVER w * 10000) / 10000 AS prnk,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           floor(cume_dist() OVER w * 10000) / 10000 AS cdist
         FROM events WHERE user_id % 20 = 0
         WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
         ORDER BY event_id""",
    "q63_date_trunc" ->
      """SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           CAST(isodow(ts) - 1 AS BIGINT) AS iso_dow,
           count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY week_start, iso_dow
         ORDER BY week_start, iso_dow""",
    "v64_pq_ann" -> OracleGen.pqAnn,
    "v121_incremental_pq" -> OracleGen.incrementalPq,
    "v129_filtered_pq" -> OracleGen.filteredPq,
    // the SURVIVOR-ONLY one-shot encode at the same frozen codebooks:
    // the anti-join-healed code table must serve identical answers
    "v130_tombstone_pq" -> OracleGen.tombstonePq,
    // coarse pruning × code compression: only (query, probed-list) pairs
    // are ADC-scored — the FAISS IVFADC layout's exact SQL twin
    "v132_ivfpq_ann" -> OracleGen.ivfPq,
    // true IVFADC: PQ on residuals v − centroid(list), per-(query, probed
    // list) LUTs — same serving layout, better codeword spend
    "v133_ivfpq_residual" -> OracleGen.ivfPqResidual,
    // two-stage serving: ADC shortlist (top-R approximate) re-scored with
    // the exact cosine over only R raw vectors per query
    "v134_ivfpq_rerank" -> OracleGen.ivfPqRerank,
    // graph-centrality source signal: 3 unrolled power iterations over the
    // deterministic doc link graph, 6dp-floor-truncated trajectory
    "t135_link_pagerank" -> OracleGen.linkPagerank,
    // Sequential Poisson weighted sampling: dyadic-exact u/w priority
    // keys, k smallest — length-proportional inclusion, no transcendentals
    "t136_priority_sample" -> OracleGen.prioritySample,
    // near-dup resolution by BEST-quality representative (argmax of the
    // shared t21 score per d46 component), not arbitrary min doc_id
    "d137_quality_keeper" -> OracleGen.qualityKeeper,
    // dedup-aware splitting: the split key is the near-dup GROUP, so a
    // whole duplicate cluster lands in one split (no train/eval leakage)
    "t138_leakage_split" -> OracleGen.leakageSplit,
    // distributed BPE: K merge rules learned by iterated integer
    // pair-count argmax over the word-frequency vocabulary (rounds
    // unrolled as CTE triples — the kmeans/pagerank convention)
    "t139_bpe_learn" -> OracleGen.bpeLearn,
    // corpus tokenization under the FROZEN merge table: per-doc subword
    // counts + an md5 of the document-order token stream
    "t140_bpe_tokenize" -> OracleGen.bpeTokenize,
    // t69's packing consumer re-expressed over learned-subword budgets
    "t141_bpe_pack" -> OracleGen.bpePack,
    // v129's serve-time metadata predicate on the production residual
    // IVFADC index: label rides the encode carry onto the code rows, the
    // filter runs below the ADC score (post-top-k would under-fill k)
    "v142_filtered_ivfpq" -> OracleGen.filteredIvfPq,
    // v134's two-stage serving with the predicate in STAGE 1, so the
    // shortlist is already attribute-pure before the exact re-rank
    "v143_filtered_rerank" -> OracleGen.filteredIvfPqRerank,
    // vector CDC: tombstone heal + O(batch) re-encode at frozen
    // artifacts ≡ a one-shot index over the updated corpus
    "v144_vec_update" -> OracleGen.vecUpdateReencode,
    // incremental PageRank: touched-node re-iteration over the bounded
    // influence cone of an edge-delta batch; oracle = full recompute
    // over the union graph (the incremental-matrix convention)
    "t145_pagerank_delta" -> OracleGen.pagerankDelta,
    // tokenizer generalization: rules learned on the train split,
    // applied to held-out docs via the K-deep map-side rule fold —
    // the serving form of the frozen merge artifact
    "t146_bpe_heldout" -> OracleGen.bpeHeldout,
    // token-budget chunking: per-doc cumulative BPE offsets, the
    // no-mid-word-split 64-token retrieval chunk boundary
    "t147_bpe_chunk" -> OracleGen.bpeChunk,
    // tokenizer efficiency by source: permille-quantized chars-per-token
    // compression and tokens-per-word fertility per domain
    "t148_bpe_efficiency" -> OracleGen.bpeEfficiency,
    // BM25 lexical retrieval: rarest-df query terms, quantized-idf Okapi
    // scoring, per-term top-5 — the dense-ANN stack's lexical twin
    "t149_bm25" -> OracleGen.bm25,
    // the incremental index must be indistinguishable from a one-shot
    // build: the oracle IS t149's SQL (the d84/d101 proof standard)
    "d151_incremental_postings" -> OracleGen.bm25,
    // RRF over v134's dense top-3 and query-by-document BM25 top-5, each
    // 1/(60+rank) term quantized as 1000000 div (60+rank)
    "t150_hybrid_fusion" -> OracleGen.hybridFusion,
    // DSIR distribution-matching selection: hashed-bigram bag models,
    // integer probability-ratio feature scores, top-k by BIGINT weight
    "t152_dsir_select" -> OracleGen.dsirSelect,
    // HITS mutual recursion over the t135 link graph: integer-mass
    // half-steps, exact L1-style renormalization in place of the L2 sqrt
    "t153_hits" -> OracleGen.hits,
    // prototype pruning: per-cluster cosine-to-centroid ranks over the
    // v60 assignment, drop the most-prototypical quarter (integer cut)
    "v154_density_prune" -> OracleGen.densityPrune,
    // the incremental postings state's served selection must be
    // indistinguishable from a one-shot score: the oracle IS t152's SQL
    // (the d84/d101 proof standard)
    "d155_incremental_dsir" -> OracleGen.dsirSelect,
    // frozen even-half codebook, O(batch) assignment ingest with replay
    // anti-join; oracle = the fixed-centroid one-shot (the d92 standard)
    "v156_incremental_prune" -> OracleGen.incrementalPrune,
    // held-out bigram LM: model trained on the even half scores ALL docs,
    // unseen bigrams pay the quantized Katz-style backoff
    "t157_bigram_lm" -> OracleGen.bigramLm,
    // the LM's unigram/bigram counts are additive mergeable state — the
    // incremental member's served scores must be indistinguishable from
    // the one-shot, so the oracle IS t157's SQL (the d84/d101 standard)
    "d158_incremental_lm" -> OracleGen.bigramLm,
    // the curated-manifest capstone: t125's pipeline with the DSIR keep
    // set composed ahead of the cap — sub-oracles composed verbatim
    "t159_curated_manifest" -> OracleGen.curatedManifest,
    // attribute-filtered hybrid fusion: v143's filtered dense stage +
    // allowed-id-restricted lexical candidates, filter below each score
    // and above each rank (the v142 convention on the fused ranking)
    "t160_filtered_fusion" -> OracleGen.filteredFusion,
    // the LM trained on the designated fold instead of parity: t157's
    // SQL with t138's leakage-aware train fold composed verbatim as the
    // membership subquery (the t159 composition convention)
    "t161_lm_leakage_fold" -> OracleGen.lmLeakageFold,
    // fused-ranking quality: t150's fused top-3 vs the ground-truth
    // fusion whose dense side is the exact brute-force cosine top-3 —
    // one shared lexical list, recall attributable to the dense index
    "t162_fusion_recall" -> OracleGen.fusedRecall,
    // benchmark decontamination: train docs sharing 5-gram windows with
    // the eval fold — eval grams broadcast, top-50 most contaminated
    "t163_decontamination" -> OracleGen.decontamination,
    // mixture sampling: per-language quota of lowest-md5-key docs —
    // k-bounded aggregator on the Spark side, window in the oracle
    "t164_mixture_sample" -> OracleGen.mixtureSample,
    // incremental decontamination: frozen eval grams, per-wave O(batch)
    // checks — the counts are final on arrival, so the oracle IS the
    // one-shot t163 SQL (the d155/d158 convention)
    "d165_incremental_decontam" -> OracleGen.decontamination,
    // sequence packing: concat-then-chunk boundary map — per-shard
    // running-sum offsets pin the whole prefix sum in the hash
    "t166_sequence_pack" -> OracleGen.sequencePack,
    // pack the DSIR selection: the t152 oracle composed verbatim as the
    // doc source of the sequence-pack SQL
    "t167_pack_selected" -> OracleGen.packSelected,
    // decontaminated selection: eval fold held out, full contaminated
    // set anti-joined BELOW the bag models — the t152 SQL over the
    // clean-pool derived table
    "t168_clean_select" -> OracleGen.cleanSelect,
    // incremental decontaminated selection: per-wave gate + novelty-
    // gated postings partials — counts final on arrival, so the oracle
    // IS the one-shot t168 SQL (the d165/d155 convention)
    "d169_incremental_clean_select" -> OracleGen.cleanSelect,
    // the full pre-training plane: pack SQL over mixture SQL over the
    // clean-selection SQL, each stage's oracle composed verbatim — the
    // hash pins every stage interface against the next
    "t170_training_plane" -> OracleGen.trainingPlane,
    // epoch-2 packing: the epoch seed folded into the md5 shuffle key —
    // per-epoch reshuffling as an oracle-checked computation
    "t171_epoch_pack" -> OracleGen.epochPack,
    // fixed-benchmark decontamination: the eval-gram artifact frozen at
    // the K lowest-id fold docs — bounded regardless of corpus size
    "t172_fixed_eval_decontam" -> OracleGen.fixedEvalDecontam,
    // fresh-path recall floor: the t162 report with the dense side
    // served from the latest-batch-wins LIVE code state (a replayed
    // delivery collapsed away) — state-serve ≡ one-shot, so the oracle
    // IS the t162 SQL verbatim (the d165/d169 convention)
    "d173_fresh_recall" -> OracleGen.fusedRecall,
    // multi-suite decontamination: Bloom pre-filter (results-invisible)
    // in front of the exact check over the union of three frozen suite
    // folds — the oracle is the plain exact union-fold SQL
    "t174_multisuite_decontam" -> OracleGen.multiSuiteDecontam,
    // suite onboarding from state: the per-doc gram postings accumulated
    // at ingest serve a NEVER-SEEN suite's check as a state probe — the
    // probe ≡ the stateless one-shot, so the oracle IS t172's SQL at the
    // unseen fold (the d165/d169 convention)
    "d175_suite_onboard" -> OracleGen.suiteOnboard,
    // per-suite attribution: gram rows carry their suite id; the Bloom
    // stage stays results-invisible, so the oracle is the plain exact
    // per-suite SQL
    "t176_suite_attribution" -> OracleGen.suiteAttribution,
    // semantic-dedup recall audit: exact all-pairs cosine truth over the
    // frozen sample vs cluster-scoped candidates, per cosine floor
    "v177_semdedup_recall" -> OracleGen.semdedupRecall,
    // epoch-2 full plane: the t170 composition with the epoch seed folded
    // into both stochastic stage hashes (mixture draw + pack shuffle)
    "t178_epoch_plane" -> OracleGen.epochPlane,
    // postings-state revision: a re-crawl supersedes the updated docs'
    // gram sets in state, then a new suite onboards from the revised
    // state — oracle = the one-shot SQL over the revised corpus (d131's
    // "indistinguishable from a corpus that always had the revisions")
    "d179_postings_revision" -> OracleGen.postingsRevision,
    // multi-probe semantic dedup: candidates widened to each vector's
    // top-2 probed clusters (acting on the v177 audit); keeper rule and
    // output shape = v83's
    "v180_multiprobe_dedup" -> OracleGen.multiProbeDedup,
    // multi-probe recall audit: v177's exact-pair truth, candidate flag
    // = "shares a probed cluster"
    "v181_multiprobe_recall" -> OracleGen.multiProbeRecall,
    // batch suite onboarding with per-suite attribution: the state
    // probe ≡ the stateless per-suite check at the never-seen folds
    "d182_batch_attribution" -> OracleGen.batchSuiteAttribution,
    "t65_clean_pipeline" -> OracleGen.cleanPipeline,
    "t66_hash_split" ->
      """SELECT doc_id,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
             AS bucket,
           CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 < 80
                  THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100 < 90
                  THEN 'valid'
                ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "t67_decontaminate" -> OracleGen.decontaminate,
    "v61_array_hof" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         SELECT vec_id,
           round(sqrt(list_dot_product(v, v)), 4) AS l2_norm,
           round(list_max(v), 4) AS v_max,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(v) / len(v), 4) AS v_mean
         FROM e ORDER BY vec_id""",
    "v39_centroids" ->
      """SELECT label, dim, round(avg(v), 4) AS centroid, count(*) AS n_vecs
         FROM (SELECT label,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings) t
         GROUP BY label, dim ORDER BY label, dim""",
    "t68_nfc_normalize" ->
      """WITH r AS (
           SELECT doc_id, text ||
             CASE WHEN doc_id % 2 = 0
               THEN ' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233)
               ELSE ' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)
             END AS raw
           FROM documents)
         SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_norm,
           nfc_normalize(raw) <> raw AS changed,
           md5(nfc_normalize(raw)) AS fp_norm
         FROM r ORDER BY doc_id""",
    "t69_pack_sequences" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 16 AS shard,
             CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
               AS n_tokens
           FROM documents),
         c AS (
           SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS start_tok
           FROM t)
         SELECT doc_id, shard, n_tokens,
           CAST(floor(start_tok / 512.0) AS BIGINT) AS pack_id,
           CAST(start_tok % 512 AS BIGINT) AS pack_offset
         FROM c ORDER BY doc_id""",
    "t70_stratified_sample" ->
      """SELECT doc_id, lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 12))::BIGINT
             % 100 AS bucket,
           CAST(CASE WHEN lang = 'en' THEN 40
                WHEN lang = 'zh' THEN 70
                ELSE 100 END AS BIGINT) AS rate
         FROM documents
         WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':strat'), 1, 12))::BIGINT
             % 100
           < CASE WHEN lang = 'en' THEN 40
                  WHEN lang = 'zh' THEN 70
                  ELSE 100 END
         ORDER BY doc_id""",
    "t71_tfidf_topterms" ->
      """WITH t AS (
           SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT tf.doc_id, tf.term, tf.tf,
             (n.n_docs * 100) // df.df AS idf_q,
             tf.tf * ((n.n_docs * 100) // df.df) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n),
         r AS (
           SELECT *, CAST(row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rn
           FROM scored)
         SELECT doc_id, term, tf, idf_q, score, rn
         FROM r WHERE rn <= 3 ORDER BY doc_id, rn""",
    "t72_temp_mixing" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
         m AS (SELECT min(n_docs) AS n_min FROM c),
         r AS (SELECT lang, n_docs,
             CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) * 1000) AS BIGINT)
               AS keep_permille
           FROM c CROSS JOIN m),
         k AS (SELECT d.lang, count(*) AS n_kept
           FROM documents d JOIN r USING (lang)
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 12))::BIGINT
               % 1000
             < keep_permille
           GROUP BY 1)
         SELECT lang, n_docs, keep_permille, n_kept
         FROM r JOIN k USING (lang) ORDER BY lang""",
    "q73_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
               FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "v74_scalar_quant" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi,
                 len(v) AS n_dims
               FROM e),
         c AS (SELECT vec_id, lo, hi, n_dims,
             list_transform(v, x -> CAST(least(floor((x - lo) * 255 / (hi - lo)), 255)
               AS INTEGER)) AS codes,
             list_transform(v, x -> abs(x - (lo +
               (CAST(least(floor((x - lo) * 255 / (hi - lo)), 255) AS INTEGER) + 0.5)
                 * ((hi - lo) / 255)))) AS errs
           FROM b)
         SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims,
           floor(lo * 10000) / 10000 AS lo4,
           floor(hi * 10000) / 10000 AS hi4,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max,
           floor(list_max(errs) * 10000) / 10000 AS max_err4,
           floor(list_sum(errs) / n_dims * 10000) / 10000 AS mean_err4
         FROM c ORDER BY vec_id""",
    "t75_collocations" ->
      """WITH arr AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS v
           FROM documents),
         u AS (SELECT doc_id, unnest(v) AS w,
                 generate_subscripts(v, 1) AS i
               FROM arr),
         bg AS (SELECT a.w AS w1, b.w AS w2, count(*) AS cnt_xy
                FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
                GROUP BY 1, 2 HAVING count(*) >= 3),
         uni AS (SELECT w, count(*) AS cnt FROM u GROUP BY 1),
         n AS (SELECT count(*) AS n_tok FROM u)
         SELECT w1, w2, cnt_xy, x.cnt AS cnt_x, y.cnt AS cnt_y,
           (cnt_xy * 100 * n.n_tok) // (x.cnt * y.cnt) AS pmi_q
         FROM bg
           JOIN uni x ON bg.w1 = x.w
           JOIN uni y ON bg.w2 = y.w
           CROSS JOIN n
         ORDER BY pmi_q DESC, w1, w2 LIMIT 20""",
    "v76_matryoshka_recall" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
         s AS (SELECT query_id, vec_id,
             CASE WHEN sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv)) = 0 THEN 0.0
               ELSE list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv))) END AS cf,
             CASE WHEN sqrt(list_dot_product(qv[1:16], qv[1:16]))
                    * sqrt(list_dot_product(cv[1:16], cv[1:16])) = 0 THEN 0.0
               ELSE list_dot_product(qv[1:16], cv[1:16])
                 / (sqrt(list_dot_product(qv[1:16], qv[1:16]))
                    * sqrt(list_dot_product(cv[1:16], cv[1:16]))) END AS ct
           FROM q, c WHERE vec_id <> query_id),
         rf AS (SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY cf DESC, vec_id) AS r
                FROM s),
         rt AS (SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id ORDER BY ct DESC, vec_id) AS r
                FROM s),
         o AS (SELECT rf.query_id, count(*) AS recall10
               FROM rf JOIN rt ON rf.query_id = rt.query_id
                              AND rf.vec_id = rt.vec_id
               WHERE rf.r <= 10 AND rt.r <= 10
               GROUP BY 1)
         SELECT q.query_id, CAST(COALESCE(o.recall10, 0) AS BIGINT) AS recall10
         FROM q LEFT JOIN o USING (query_id) ORDER BY query_id""",
    "q77_salted_join" ->
      """SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q78_sketch_merge" ->
      """SELECT count(DISTINCT user_id) AS exact_users, TRUE AS sketch_ok
         FROM events""",
    "t79_ngram_repetition" -> OracleGen.ngramRepetition,
    "v80_ann_recall" -> OracleGen.annRecall,
    "t81_line_rules" -> OracleGen.lineRules,
    "d85_line_dedup" -> OracleGen.lineDedup,
    "t86_c4_rules" -> OracleGen.c4Rules,
    "v82_ann_frontier" -> OracleGen.annFrontier,
    "v83_semantic_dedup" -> OracleGen.semanticDedup,
    "t87_exact_substring" -> OracleGen.exactSubstring,
    "t88_shuffle_shard" -> OracleGen.shuffleShard,
    "d89_substring_removal" -> OracleGen.substringRemoval,
    // deliberately the FULL-RECOMPUTE d46 oracle: the incremental labeling
    // must equal one-shot connected components over all pairs (d84 pattern)
    "d91_incremental_cc" -> OracleGen.dedupClusters,
    // the FIXED-CENTROID one-shot twin: train on evens, assign everything
    // to the frozen centroids, one v83-style in-cluster pair search
    "d92_incremental_semdedup" -> OracleGen.incrementalSemDedup,
    "d93_url_dedup" -> OracleGen.urlDedup,
    // deliberately the ONE-SHOT d93 oracle: the batch-by-batch merged
    // state must reproduce the full recompute's verdicts (d84/d91/d92
    // convention)
    "d101_incremental_url" -> OracleGen.urlDedup,
    "d123_tombstone_dedup" -> OracleGen.tombstoneDedup,
    // the SURVIVOR-ONLY full recompute: reachability over minhash pairs
    // with both ends surviving — the healed incremental labeling must be
    // indistinguishable from never having ingested the deleted edges
    "d128_tombstone_cc" -> OracleGen.tombstoneCc,
    // the ONE-SHOT twin over the UPDATED corpus: healed + re-ingested
    // keeper/pair states ≡ a corpus that always had the revisions
    "d131_update_reingest" -> OracleGen.updateReingest,
    "d98_image_neardup" -> OracleGen.imageNearDup,
    "d102_audio_neardup" -> OracleGen.audioNearDup,
    "d103_video_overlap" -> OracleGen.videoOverlap,
    // deliberately the ONE-SHOT d98 oracle: the batch-by-batch hash state
    // must reproduce the full recompute's pair set (d84/d101 convention)
    "d104_incremental_image" -> OracleGen.imageNearDup,
    "d105_image_clusters" -> OracleGen.imageClusters,
    "d106_multimodal_dedup" -> OracleGen.multimodalDedup,
    "t94_perplexity_buckets" -> OracleGen.perplexityBuckets,
    "d95_lsh_recall" -> OracleGen.lshRecall,
    // deliberately the FULL-RECOMPUTE t65 oracle: the batch-by-batch
    // pipeline must equal the one-shot composed verdicts (d84/d91 pattern)
    "d96_incremental_pipeline" -> OracleGen.cleanPipeline,
    "d97_containment" -> OracleGen.containment,
    "t99_blocklist_filter" -> OracleGen.blocklistFilter,
    "t100_source_cap" ->
      """WITH h AS (
           SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cap'), 1, 12))::BIGINT
               AS h
           FROM documents),
         p0 AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             ('0x' || substr(md5(source || ':policy'), 1, 12))::BIGINT % 10
               AS pdraw
           FROM documents GROUP BY source),
         p AS (
           SELECT source, n_docs,
             CASE WHEN pdraw < 2 THEN 'drop'
                  WHEN pdraw < 6 THEN 'cap'
                  ELSE 'keep' END AS policy,
             CASE WHEN pdraw >= 2 AND pdraw < 6
                  THEN (n_docs * 7) // 10 END AS cap
           FROM p0),
         r AS (
           SELECT doc_id, source,
             CAST(row_number() OVER (PARTITION BY source
               ORDER BY h % 100, h, doc_id) AS BIGINT) AS rk
           FROM h)
       SELECT r.doc_id, r.source, p.policy, p.cap,
         CASE p.policy WHEN 'drop' THEN FALSE
              WHEN 'keep' THEN TRUE
              ELSE r.rk <= p.cap END AS kept
       FROM r JOIN p USING (source) ORDER BY r.doc_id""",
    "q107_retention_cohorts" -> retentionSql,
    // deliberately the ONE-SHOT q107 oracle: the batch-merged activity
    // state must reproduce the full recompute (d84/d101 convention)
    "d113_incremental_retention" -> retentionSql,
    "q114_countmin" ->
      """WITH e AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
           FROM events GROUP BY 1)
       SELECT user_id, exact_cnt, TRUE AS sketch_ok
       FROM e ORDER BY exact_cnt DESC, user_id LIMIT 10""",
    "q115_windowed_funnel" ->
      """WITH pu AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
           FROM events GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN pu USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > pu.t_view
             AND e.ts <= pu.t_view + INTERVAL 7 DAY
           GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             AND e.ts <= c.t_click + INTERVAL 7 DAY
           GROUP BY 1)
       SELECT
         CAST((SELECT count(*) FROM pu WHERE t_view IS NOT NULL) AS BIGINT)
           AS n_view,
         CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
         CAST((SELECT count(*) FROM p) AS BIGINT)
           AS n_view_click_purchase""",
    "q116_group_percentile" ->
      """WITH h AS (
           SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY 1, 2),
         c AS (
           SELECT l_returnflag, l_quantity,
             CAST(sum(cnt) OVER (PARTITION BY l_returnflag
               ORDER BY l_quantity) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
           FROM h)
       SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
         min(CASE WHEN cum >= (n + 1) // 2 THEN l_quantity END) AS p50,
         min(CASE WHEN cum >= (9 * n + 9) // 10 THEN l_quantity END) AS p90
       FROM c GROUP BY l_returnflag, n ORDER BY l_returnflag""",
    // deliberately the ONE-SHOT d103 oracle: the batch-by-batch frame
    // state must reproduce the full recompute's pair set (d104/d111
    // convention, third modality)
    "d117_incremental_video" -> OracleGen.videoOverlap,
    "d124_mjpeg_video_dedup" -> OracleGen.mjpegVideoDedup,
    "d126_tombstone_image" -> OracleGen.tombstoneImageClusters,
    "d118_full_multimodal_gate" -> OracleGen.fullMultimodalGate,
    // deliberately the ONE-SHOT d118 oracle: the per-batch merged state
    // must reproduce the full five-modality recompute (d96 convention
    // extended across modalities)
    "d119_incremental_multimodal" -> OracleGen.fullMultimodalGate,
    "t125_training_manifest" -> OracleGen.trainingManifest,
    "q108_funnel" ->
      """WITH pu AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
           FROM events GROUP BY 1),
         c AS (
           SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN pu USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > pu.t_view
           GROUP BY 1),
         p AS (
           SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t_click
           GROUP BY 1)
       SELECT
         CAST((SELECT count(*) FROM pu WHERE t_view IS NOT NULL) AS BIGINT)
           AS n_view,
         CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
         CAST((SELECT count(*) FROM p) AS BIGINT)
           AS n_view_click_purchase""",
    // deliberately t67's oracle: the Bloom pre-filter + exact confirm must
    // reproduce the single-join decontamination bit for bit (false
    // positives die in the confirm join; no false negatives exist)
    "t109_bloom_decontaminate" -> OracleGen.decontaminate,
    "q110_zorder_layout" ->
      """WITH b AS (
           SELECT o_orderkey, o_custkey & 65535 AS x,
             (CAST(o_orderdate AS DATE) - DATE '1995-01-01') & 65535 AS y
           FROM orders),
         s1 AS (SELECT o_orderkey, (x | (x << 8)) & 16711935 AS x1,
                  (y | (y << 8)) & 16711935 AS y1 FROM b),
         s2 AS (SELECT o_orderkey, (x1 | (x1 << 4)) & 252645135 AS x2,
                  (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
         s3 AS (SELECT o_orderkey, (x2 | (x2 << 2)) & 858993459 AS x3,
                  (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
         s4 AS (SELECT o_orderkey, (x3 | (x3 << 1)) & 1431655765 AS sx,
                  (y3 | (y3 << 1)) & 1431655765 AS sy FROM s3),
         z AS (SELECT o_orderkey, sx | (sy << 1) AS zval FROM s4)
       SELECT CAST(zval >> 16 AS BIGINT) AS zregion,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(min(zval) AS BIGINT) AS z_min,
         CAST(max(zval) AS BIGINT) AS z_max
       FROM z GROUP BY 1 ORDER BY 1""",
    // deliberately the ONE-SHOT d102 oracle: the batch-by-batch hash state
    // must reproduce the full recompute's pair set (d104 convention)
    "d111_incremental_audio" -> OracleGen.audioNearDup,
    "t112_quality_classifier" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
           FROM documents WHERE text IS NOT NULL),
         f AS (
           SELECT doc_id, unnest(list_concat(ws,
             list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i + 1]))) AS feat
           FROM t),
         m AS (
           SELECT i AS bucket,
             (('0x' || substr(md5('w:' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
               % 2001) - 1000 AS w
           FROM range(0, 1024) r(i)),
         b AS (
           SELECT doc_id,
             ('0x' || substr(md5(feat), 1, 8))::BIGINT % 1024 AS bucket
           FROM f)
       SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(m.w) AS BIGINT) AS score,
         CASE WHEN CAST(sum(m.w) AS BIGINT) > 0 THEN 'keep' ELSE 'drop' END
           AS label
       FROM b JOIN m USING (bucket)
       GROUP BY 1 ORDER BY 1""",
  )
}
