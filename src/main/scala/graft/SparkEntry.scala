package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Generator
import graft.llm.{Corpus, Dedup, GraphAnn, GraphLifecycle, Multimodal, Similarity, TextAnalysis}
import graft.operators.{Relational, TpchSuite}
import graft.streaming.EventWindows

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers a named query here plus (when
  * SQL-expressible) a DuckDB oracle. Column names are aliased identically on
  * both sides — the driver sorts columns by name before hashing.
  */
object SparkEntry {
  import Tables._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the reference's ONLY query: count() (reference App.scala:239)
    "q00_count" -> ((s, d) => {
      import org.apache.spark.sql.functions.count
      lineitem(s, d).agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
    }),
    "q01_pricing_summary" -> ((s, d) => Relational.pricingSummary(lineitem(s, d))),
    "q02_filter_predicates" -> ((s, d) => Relational.filterPredicates(orders(s, d))),
    "q03_star_join_broadcast" -> ((s, d) =>
      Relational.starJoinBroadcast(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "q04_fact_join" -> ((s, d) => Relational.factJoin(lineitem(s, d), orders(s, d))),
    "q05_anti_join" -> ((s, d) => Relational.antiJoin(customer(s, d), orders(s, d))),
    "q06_semi_join" -> ((s, d) => Relational.semiJoin(customer(s, d), orders(s, d))),
    "q07_outer_join_agg" -> ((s, d) => Relational.outerJoinAgg(customer(s, d), orders(s, d))),
    "q08_rollup" -> ((s, d) =>
      Relational.rollupRevenue(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "q09_cube" -> ((s, d) => Relational.cubeFlags(lineitem(s, d))),
    "q10_count_distinct" -> ((s, d) => Relational.countDistinct2(lineitem(s, d))),
    "q11_approx_distinct" -> ((s, d) => Relational.approxDistinct(lineitem(s, d))),
    "q12_window_rank" -> ((s, d) => Relational.windowRank(orders(s, d))),
    "q13_window_running" -> ((s, d) => Relational.windowRunning(orders(s, d))),
    "q14_window_range" -> ((s, d) => Relational.windowRange(orders(s, d))),
    "q15_topk" -> ((s, d) => Relational.topK(orders(s, d))),
    "q16_set_ops" -> ((s, d) => Relational.setOps(customer(s, d), orders(s, d))),
    "q17_scalar_string" -> ((s, d) => Relational.scalarString(part(s, d))),
    "q18_scalar_date" -> ((s, d) => Relational.scalarDate(orders(s, d))),
    "q19_json_extract" -> ((s, d) => Relational.jsonExtract(events(s, d))),
    "q20_array_ops" -> ((s, d) => Relational.arrayOps(embeddings(s, d))),
    "q21_range_join" -> ((s, d) => Relational.rangeJoin(events(s, d))),
    "q22_asof_join" -> ((s, d) => Relational.asofJoin(events(s, d))),
    "q23_tumbling_window" -> ((s, d) => EventWindows.tumbling(events(s, d))),
    "q24_sliding_window" -> ((s, d) => EventWindows.sliding(events(s, d))),
    "q25_session_window" -> ((s, d) => EventWindows.sessions(events(s, d))),
    "q27_interval_join" -> ((s, d) =>
      graft.streaming.StatefulOps.intervalJoinBatch(events(s, d))),
    "q28_stateful_dedup" -> ((s, d) =>
      graft.streaming.StatefulOps.statefulDedupBatch(events(s, d))),
    "q29_user_totals" -> ((s, d) =>
      graft.streaming.StatefulOps.userTotalsBatch(events(s, d))),
    // binary course is projected as hex so the driver's pandas comparator
    // can sort it (bytearray is unhashable there) — see Generator.oracleSql.
    "q26_generator" -> ((s, _) => {
      import org.apache.spark.sql.functions.{col, hex}
      Generator.generate(s, 10000, 8)
        .select(col("id"), hex(col("course")).as("course_hex"), col("marks"))
        .orderBy("id")
    }),
    "q30_dedup_exact" -> ((s, d) => Dedup.exact(documents(s, d))),
    "q31_dedup_normalized" -> ((s, d) => Dedup.normalized(documents(s, d))),
    "q32_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(documents(s, d))),
    "q33_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(documents(s, d))),
    "q34_simhash" -> ((s, d) => Dedup.simhash(documents(s, d))),
    "q35_cosine_topk" -> ((s, d) => Similarity.cosineTopK(embeddings(s, d))),
    "q36_embedding_neardup" -> ((s, d) => Similarity.embeddingNearDup(embeddings(s, d))),
    "q37_ivf_topk" -> ((s, d) => Similarity.ivfTopK(embeddings(s, d))),
    "q38_lsh_topk" -> ((s, d) => Similarity.lshTopK(embeddings(s, d))),
    "q39_ann_recall" -> ((s, d) => Similarity.annRecall(embeddings(s, d))),
    "q40_token_stats" -> ((s, d) => TextAnalysis.tokenStats(documents(s, d))),
    "q41_term_freq" -> ((s, d) => TextAnalysis.termFreq(documents(s, d))),
    "q42_tfidf_top" -> ((s, d) => TextAnalysis.tfidfTop(documents(s, d))),
    "q43_langid" -> ((s, d) => TextAnalysis.langId(documents(s, d))),
    "q44_quality_score" -> ((s, d) => TextAnalysis.qualityScore(documents(s, d))),
    "q45_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(documents(s, d))),
    "q46_bpe_tokens" -> ((s, d) => TextAnalysis.bpeTokens(documents(s, d))),
    "q47_rolling_hash" -> ((s, d) => TextAnalysis.rollingHash(documents(s, d))),
    "q48_substring_dedup" -> ((s, d) => TextAnalysis.substringDedup(documents(s, d))),
    "q49_quality_rules" -> ((s, d) => TextAnalysis.qualityRules(documents(s, d))),
    "q50_binary_meta" -> ((s, d) => Multimodal.binaryMeta(documents(s, d))),
    "q51_media_features" -> ((s, d) => Multimodal.mediaFeatures(documents(s, d))),
    "q55_frame_sample" -> ((s, d) => Multimodal.frameSample(documents(s, d))),
    "q56_media_resize" -> ((s, d) => Multimodal.resizeMedia(documents(s, d))),
    "q52_map_ops" -> ((s, d) => Relational.mapOps(part(s, d))),
    "q53_grouping_sets" -> ((s, d) => Relational.groupingSets(lineitem(s, d))),
    "q54_date_arith" -> ((s, d) => Relational.dateArith(orders(s, d))),
    "q57_scalar_math" -> ((s, d) => Relational.scalarMath(lineitem(s, d))),
    "q58_tpch_q5" -> ((s, d) => Relational.tpchQ5(s, d)),
    "q59_summary_stats" -> ((s, d) => Relational.summaryStats(lineitem(s, d))),
    "q60_pivot" -> ((s, d) => Relational.pivotFlags(lineitem(s, d))),
    "q61_topk_agg" -> ((s, d) => Relational.topKPerGroupAgg(orders(s, d))),
    "q62_percentiles" -> ((s, d) => Relational.percentiles(orders(s, d))),
    "q63_hash_split" -> ((s, d) => Corpus.hashSplit(documents(s, d))),
    "q64_stratified_sample" -> ((s, d) => Corpus.stratifiedSample(documents(s, d))),
    "q65_pii_redact" -> ((s, d) => Corpus.piiRedact(documents(s, d))),
    "q66_contamination" -> ((s, d) => Corpus.contamination(documents(s, d))),
    "q67_ngram_counts" -> ((s, d) => Corpus.ngramCounts(documents(s, d))),
    "q68_neardup_components" -> ((s, d) => Corpus.nearDupComponents(documents(s, d))),
    "q69_incremental_dedup" -> ((s, d) => Corpus.incrementalDedup(documents(s, d))),
    "q70_length_band" -> ((s, d) => Corpus.lengthBand(documents(s, d))),
    "q71_repetition_score" -> ((s, d) => Corpus.repetitionScore(documents(s, d))),
    // nShards pinned to 8 so the oracle SQL literal stays valid; the
    // operator default tracks defaultParallelism (scale-safe out of the box)
    "q72_sequence_pack" -> ((s, d) => Corpus.sequencePack(documents(s, d), nShards = 8)),
    "q73_mixture_weights" -> ((s, d) => Corpus.mixtureWeights(documents(s, d))),
    "q74_embedding_quantize" -> ((s, d) => Similarity.quantizeInt8(embeddings(s, d))),
    "q75_source_stats" -> ((s, d) => Corpus.sourceStats(documents(s, d))),
    "q76_length_histogram" -> ((s, d) => Corpus.lengthHistogram(documents(s, d))),
    "q77_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(embeddings(s, d))),
    "q78_stopword_filter" -> ((s, d) => TextAnalysis.stopwordFilter(documents(s, d))),
    "q79_skew_join" -> ((s, d) =>
      graft.operators.Skew.skewJoinAgg(orders(s, d), customer(s, d))),
    "q80_struct_ops" -> ((s, d) => Relational.structOps(customer(s, d))),
    "q81_decimal_agg" -> ((s, d) => Relational.decimalAgg(lineitem(s, d))),
    "q82_pq_adc" -> ((s, d) => Similarity.pqTopK(embeddings(s, d))),
    "q83_curation_pipeline" -> ((s, d) => Corpus.curationPipeline(documents(s, d))),
    "q84_bucketed_join" -> ((s, d) => Relational.bucketedJoinAgg(s, d)),
    "q85_heavy_hitters" -> ((s, d) => Corpus.heavyHitters(documents(s, d))),
    "q86_importance_weights" -> ((s, d) =>
      TextAnalysis.importanceWeights(documents(s, d))),
    "q87_bloom_prune" -> ((s, d) => graft.operators.RuntimeFilter.bloomPruneAgg(s, d)),
    "q88_kmeans_lloyd" -> ((s, d) => Similarity.kmeansLloyd(embeddings(s, d))),
    "q89_histogram_quantiles" -> ((s, d) => Relational.histogramQuantiles(orders(s, d))),
    "q90_user_spend" -> ((s, d) =>
      graft.streaming.StatefulOps.userSpendBatch(events(s, d))),
    "q91_doc_chunks" -> ((s, d) => TextAnalysis.docChunks(documents(s, d))),
    "q92_containment_dedup" -> ((s, d) => Dedup.containment(documents(s, d))),
    "q93_cluster_keep_best" -> ((s, d) => Corpus.clusterKeepBest(documents(s, d))),
    "q94_pagerank" -> ((s, d) =>
      graft.operators.Graph.pageRank(orders(s, d), lineitem(s, d))),
    "q95_temperature_sample" -> ((s, d) => Corpus.temperatureSample(documents(s, d))),
    "q96_json_roundtrip" -> ((s, d) => graft.sources.TableIO.jsonRoundTripAgg(s, d)),
    "q97_ohlc_bars" -> ((s, d) => EventWindows.ohlcBars(events(s, d))),
    "q98_scd2_intervals" -> ((s, d) => Relational.scd2Intervals(events(s, d))),
    "q99_group_sample" -> ((s, d) => Corpus.groupSample(documents(s, d))),
    "q100_partition_prune" -> ((s, d) =>
      graft.sources.TableIO.partitionPruneAgg(s, d)),
    "q101_dim_stats" -> ((s, d) => Similarity.dimStats(embeddings(s, d))),
    "q102_schema_evolution" -> ((s, d) =>
      graft.sources.TableIO.schemaEvolutionAgg(s, d)),
    "q103_countmin_freq" -> ((s, d) => Corpus.countMinFreq(documents(s, d))),
    "q104_dynamic_prune" -> ((s, d) => graft.sources.TableIO.dynamicPruneAgg(s, d)),
    "q105_forward_fill" -> ((s, d) => Relational.forwardFill(events(s, d))),
    "q106_session_funnel" -> ((s, d) => EventWindows.sessionFunnel(events(s, d))),
    "q107_retention_cohorts" -> ((s, d) => Relational.retentionCohorts(events(s, d))),
    "q108_vocab_coverage" -> ((s, d) => TextAnalysis.vocabCoverage(documents(s, d))),
    "q109_zorder_layout" -> ((s, d) => Relational.zorderLayout(orders(s, d))),
    "q110_value_anomalies" -> ((s, d) => Relational.valueAnomalies(events(s, d))),
    "q111_tpch_q3" -> ((s, d) => Relational.tpchQ3(s, d)),
    "q112_tpch_q10" -> ((s, d) =>
      Relational.tpchQ10(customer(s, d), orders(s, d), lineitem(s, d), nation(s, d))),
    "q113_event_transitions" -> ((s, d) => Relational.eventTransitions(events(s, d))),
    "q114_token_entropy" -> ((s, d) => TextAnalysis.tokenEntropy(documents(s, d))),
    "q115_weighted_sample" -> ((s, d) => Corpus.weightedSample(documents(s, d))),
    "q116_basket_pairs" -> ((s, d) => Relational.basketPairs(lineitem(s, d))),
    "q117_activity_streaks" -> ((s, d) => Relational.activityStreaks(events(s, d))),
    "q118_ewma_smooth" -> ((s, d) => Relational.ewmaSmooth(events(s, d))),
    "q119_abc_classification" -> ((s, d) => Relational.abcClassification(lineitem(s, d))),
    "q120_tpch_q7" -> ((s, d) => Relational.tpchQ7(lineitem(s, d), orders(s, d),
      customer(s, d), supplier(s, d), nation(s, d))),
    "q121_degree_distribution" -> ((s, d) =>
      graft.operators.Graph.degreeDistribution(orders(s, d), lineitem(s, d))),
    "q122_bigram_perplexity" -> ((s, d) => TextAnalysis.bigramPerplexity(documents(s, d))),
    "q123_stream_enrich" -> ((s, d) =>
      EventWindows.enrichedSegments(events(s, d), customer(s, d))),
    "q124_source_overlap" -> ((s, d) => Corpus.sourceOverlap(documents(s, d))),
    "q125_latest_compaction" -> ((s, d) => Relational.latestCompaction(events(s, d))),
    "q126_pmi_phrases" -> ((s, d) => TextAnalysis.pmiPhrases(documents(s, d))),
    "q127_out_of_order_rate" -> ((s, d) => Relational.outOfOrderRate(events(s, d))),
    "q128_tpch_q18" -> ((s, d) =>
      Relational.tpchQ18(customer(s, d), orders(s, d), lineitem(s, d))),
    "q129_cumulative_users" -> ((s, d) => Relational.cumulativeUsers(events(s, d))),
    "q130_benford_digits" -> ((s, d) => Relational.benfordDigits(orders(s, d))),
    "q131_weekday_profile" -> ((s, d) => Relational.weekdayProfile(events(s, d))),
    "q132_contrastive_pairs" -> ((s, d) => Corpus.contrastivePairs(documents(s, d))),
    "q133_rep_ngram_stats" -> ((s, d) => TextAnalysis.repNgramStats(documents(s, d))),
    "q134_lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(documents(s, d))),
    "q135_tpch_q4" -> ((s, d) => Relational.tpchQ4(orders(s, d), lineitem(s, d))),
    "q136_order_count_dist" -> ((s, d) =>
      Relational.orderCountDistribution(customer(s, d), orders(s, d))),
    "q137_tpch_q19" -> ((s, d) => Relational.tpchQ19(lineitem(s, d), part(s, d))),
    "q138_inactive_high_balance" -> ((s, d) =>
      Relational.inactiveHighBalance(customer(s, d), orders(s, d))),
    "q139_correlated_premium" -> ((s, d) => Relational.correlatedPremium(s, d)),
    "q140_ordered_string_agg" -> ((s, d) =>
      Relational.orderedStringAgg(customer(s, d))),
    "q141_embedding_coverage" -> ((s, d) =>
      Corpus.embeddingCoverage(documents(s, d), embeddings(s, d))),
    "q142_interval_join_outer" -> ((s, d) =>
      graft.streaming.StatefulOps.intervalJoinOuterBatch(events(s, d))),
    "q143_etl_lineage" -> ((s, d) => graft.etl.App.e2eLineage(s, d)),
    "q144_containment_exact" -> ((s, d) =>
      Dedup.containmentExact(documents(s, d))),
    "q145_rolling_7day" -> ((s, d) => Relational.rolling7Day(orders(s, d))),
    "q146_quantile_contract" -> ((s, d) =>
      Relational.quantileContract(orders(s, d))),
    "q147_knn_join" -> ((s, d) => Similarity.knnJoin(embeddings(s, d))),
    "q148_cdc_merge" -> ((s, d) => Relational.cdcMerge(orders(s, d))),
    "q149_replica_fingerprint" -> ((s, d) =>
      Relational.replicaFingerprint(orders(s, d))),
    "q150_tpch_q6" -> ((s, d) => TpchSuite.tpchQ6(lineitem(s, d))),
    "q151_tpch_q2" -> ((s, d) =>
      TpchSuite.minCostSupplier(lineitem(s, d), part(s, d), supplier(s, d))),
    "q152_tpch_q8" -> ((s, d) =>
      TpchSuite.marketShare(lineitem(s, d), orders(s, d), customer(s, d),
        supplier(s, d), nation(s, d), region(s, d), part(s, d))),
    "q153_tpch_q9" -> ((s, d) =>
      TpchSuite.productProfit(lineitem(s, d), orders(s, d), supplier(s, d),
        nation(s, d), part(s, d))),
    "q154_tpch_q11" -> ((s, d) => TpchSuite.valueConcentration(lineitem(s, d))),
    "q155_tpch_q12" -> ((s, d) =>
      TpchSuite.latePriority(lineitem(s, d), orders(s, d))),
    "q156_tpch_q14" -> ((s, d) =>
      TpchSuite.promoShare(lineitem(s, d), part(s, d))),
    "q157_tpch_q15" -> ((s, d) =>
      TpchSuite.topSupplier(lineitem(s, d), supplier(s, d))),
    "q158_tpch_q16" -> ((s, d) =>
      TpchSuite.supplierCountByPart(lineitem(s, d), part(s, d), supplier(s, d))),
    "q159_tpch_q17" -> ((s, d) =>
      TpchSuite.smallQuantityRevenue(lineitem(s, d), part(s, d))),
    "q160_tpch_q20" -> ((s, d) =>
      TpchSuite.dominantSuppliers(lineitem(s, d), part(s, d), supplier(s, d),
        nation(s, d))),
    "q161_tpch_q21" -> ((s, d) =>
      TpchSuite.waitingOrders(lineitem(s, d), orders(s, d), supplier(s, d))),
    "q162_bm25_topk" -> ((s, d) => graft.llm.Retrieval.bm25TopK(documents(s, d))),
    "q163_hash_classifier" -> ((s, d) =>
      graft.llm.Retrieval.hashClassifier(documents(s, d))),
    "q164_domain_cap" -> ((s, d) => graft.llm.Retrieval.domainCap(documents(s, d))),
    "q165_bpe_merge_round" -> ((s, d) =>
      graft.llm.TokenizerOps.bpeMergeRound(documents(s, d))),
    "q166_length_buckets" -> ((s, d) =>
      graft.llm.TokenizerOps.lengthBucketBatching(documents(s, d))),
    "q167_batch_embed" -> ((s, d) =>
      graft.llm.TokenizerOps.batchEmbed(documents(s, d))),
    "q168_leakage_safe_split" -> ((s, d) =>
      Corpus.leakageSafeSplit(documents(s, d))),
    "q169_rrf_fusion" -> ((s, d) =>
      graft.llm.Retrieval.rrfFusion(documents(s, d), embeddings(s, d))),
    "q170_rerank_fused" -> ((s, d) =>
      graft.llm.Retrieval.rerankFused(documents(s, d), embeddings(s, d))),
    "q171_curation_index" -> ((s, d) => Corpus.buildCurationIndex(documents(s, d))),
    "q172_keep_best_indexed" -> ((s, d) =>
      Corpus.clusterKeepBestIndexed(documents(s, d))),
    "q173_incremental_ingest" -> ((s, d) =>
      Corpus.incrementalIngest(documents(s, d))),
    "q174_vector_index" -> ((s, d) => Similarity.buildVectorIndex(embeddings(s, d))),
    "q175_ivf_indexed" -> ((s, d) => Similarity.ivfTopKIndexed(embeddings(s, d))),
    "q176_fp_index_update" -> ((s, d) =>
      Corpus.updateFingerprintIndex(documents(s, d))),
    "q177_hard_negatives" -> ((s, d) => Similarity.hardNegatives(embeddings(s, d))),
    "q178_pq_refine" -> ((s, d) => Similarity.pqRefine(embeddings(s, d))),
    // serve-only legs of the stored indexes (build cached per JVM+corpus;
    // bench medians time serving, the q175/q172 twins time build+serve)
    "q179_ivf_served" -> ((s, d) => Similarity.ivfTopKServed(embeddings(s, d), d)),
    "q180_keep_best_served" -> ((s, d) =>
      Corpus.clusterKeepBestServed(documents(s, d), d)),
    "q181_index_lifecycle" -> ((s, d) => Corpus.indexLifecycle(documents(s, d))),
    "q182_daily_pipeline" -> ((s, d) =>
      Corpus.dailyPipeline(documents(s, d), embeddings(s, d))),
    "q183_pq_refine_served" -> ((s, d) =>
      Similarity.pqRefineServed(embeddings(s, d), d)),
    "q184_vector_lifecycle" -> ((s, d) =>
      Similarity.vectorIndexLifecycle(embeddings(s, d))),
    "q185_pq_refine_fixed" -> ((s, d) =>
      Similarity.pqRefineFixed(embeddings(s, d))),
    "q186_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(embeddings(s, d))),
    "q187_ivfpq_served" -> ((s, d) =>
      Similarity.ivfPqServed(embeddings(s, d), d)),
    "q188_lifecycle_retrain" -> ((s, d) =>
      Similarity.vectorIndexRetrain(embeddings(s, d))),
    "q189_pq_lifecycle" -> ((s, d) =>
      Similarity.pqIndexLifecycle(embeddings(s, d))),
    "q190_ivfpq_lifecycle" -> ((s, d) =>
      Similarity.ivfPqIndexLifecycle(embeddings(s, d))),
    "q191_pq_retrain" -> ((s, d) =>
      Similarity.pqIndexRetrain(embeddings(s, d))),
    "q192_bucketed_merge" -> ((s, d) =>
      Corpus.bucketedIndexMerge(documents(s, d))),
    "q193_lsm_vector_index" -> ((s, d) =>
      Similarity.lsmVectorIndex(embeddings(s, d))),
    "q194_lsm_served" -> ((s, d) =>
      Similarity.lsmServedTopK(embeddings(s, d))),
    "q195_lsm_serve_split" -> ((s, d) =>
      Similarity.lsmServed(embeddings(s, d), d)),
    "q196_lsm_composed" -> ((s, d) =>
      Similarity.lsmComposedIndex(embeddings(s, d))),
    "q197_lsm_composed_served" -> ((s, d) =>
      Similarity.lsmComposedServed(embeddings(s, d))),
    "q198_lsm_composed_split" -> ((s, d) =>
      Similarity.lsmComposedServeSplit(embeddings(s, d), d)),
    "q199_fuzzy_join" -> ((s, d) => Dedup.fuzzyJoin(documents(s, d))),
    "q200_fuzzy_served" -> ((s, d) =>
      Dedup.fuzzyJoinServed(documents(s, d), d)),
    "q201_knn_graph" -> ((s, d) => GraphAnn.knnGraph(embeddings(s, d))),
    "q202_graph_beam_topk" -> ((s, d) =>
      GraphAnn.beamTopK(embeddings(s, d))),
    "q203_graph_beam_served" -> ((s, d) =>
      GraphAnn.beamTopKServed(embeddings(s, d), d)),
    "q204_filtered_ann" -> ((s, d) =>
      Similarity.ivfTopKFiltered(embeddings(s, d))),
    "q205_maxsim_topk" -> ((s, d) => Similarity.maxSimTopK(embeddings(s, d))),
    // r15: the audit reads the shared ServedRoots store — ONE lifecycle
    // build per corpus feeds q206 + q211 + q212 (the scratch-root replay
    // stays as GraphLifecycleSpec's hermetic mode)
    "q206_graph_lifecycle" -> ((s, d) =>
      GraphLifecycle.graphLifecycleAudited(embeddings(s, d), d)),
    "q207_filtered_served" -> ((s, d) =>
      Similarity.ivfTopKFilteredServed(embeddings(s, d), d)),
    "q208_maxsim_rerank" -> ((s, d) =>
      Similarity.maxSimRerank(embeddings(s, d))),
    "q209_maxsim_served" -> ((s, d) =>
      Similarity.maxSimRerankServed(embeddings(s, d), d)),
    "q210_graph_recall" -> ((s, d) => GraphAnn.graphRecall(embeddings(s, d), d)),
    "q211_graph_lifecycle_served" -> ((s, d) =>
      GraphLifecycle.graphLifecycleServed(embeddings(s, d), d)),
    "q212_lifecycle_recall" -> ((s, d) =>
      GraphLifecycle.graphLifecycleRecall(embeddings(s, d), d)),
    "q213_sq8_topk" -> ((s, d) => Similarity.sq8TopK(embeddings(s, d))),
    "q214_sq8_recall" -> ((s, d) => Similarity.sq8Recall(embeddings(s, d))),
    "q215_sq8_served" -> ((s, d) =>
      Similarity.sq8TopKServed(embeddings(s, d), d)),
    "q216_ivf_sq8" -> ((s, d) => Similarity.ivfSq8TopK(embeddings(s, d))),
    "q217_ivf_sq8_served" -> ((s, d) =>
      Similarity.ivfSq8Served(embeddings(s, d), d)),
    "q218_ivf_sq8_recall" -> ((s, d) =>
      Similarity.ivfSq8Recall(embeddings(s, d), d)),
    "q219_filtered_graph" -> ((s, d) =>
      GraphAnn.beamTopKFiltered(embeddings(s, d))),
    "q220_filtered_graph_served" -> ((s, d) =>
      GraphAnn.beamTopKFilteredServed(embeddings(s, d), d)),
    "q221_filtered_graph_recall" -> ((s, d) =>
      GraphAnn.filteredGraphRecall(embeddings(s, d), d)),
    "q222_filtered_ivf_sq8" -> ((s, d) =>
      Similarity.ivfSq8TopKFiltered(embeddings(s, d))),
    "q223_filtered_ivf_sq8_served" -> ((s, d) =>
      Similarity.ivfSq8FilteredServed(embeddings(s, d), d)),
    "q224_filtered_ivf_sq8_recall" -> ((s, d) =>
      Similarity.ivfSq8FilteredRecall(embeddings(s, d), d)),
    "q225_sq8_lifecycle" -> ((s, d) =>
      Similarity.sq8IndexLifecycle(embeddings(s, d))),
    "q226_sq8_lifecycle_served" -> ((s, d) =>
      Similarity.sq8LifecycleServed(embeddings(s, d), d)),
    "q227_maxsim_graph_rerank" -> ((s, d) =>
      GraphAnn.maxSimGraphRerank(embeddings(s, d), d)),
    "q228_filtered_lsm_served" -> ((s, d) =>
      Similarity.lsmFilteredServed(embeddings(s, d), d)),
    "q229_filtered_lsm_composed" -> ((s, d) =>
      Similarity.lsmComposedFilteredServed(embeddings(s, d), d)),
    "q230_filtered_lsm_recall" -> ((s, d) =>
      Similarity.lsmFilteredRecall(embeddings(s, d), d)),
    "q231_sq8_retrain" -> ((s, d) =>
      Similarity.sq8IndexRetrain(embeddings(s, d))),
    "q232_sq8_lsm" -> ((s, d) =>
      Similarity.sq8LsmIndex(embeddings(s, d))),
    "q233_sq8_lsm_served" -> ((s, d) =>
      Similarity.sq8LsmServed(embeddings(s, d), d)),
    "q234_filtered_sq8_lsm" -> ((s, d) =>
      Similarity.sq8LsmFilteredServed(embeddings(s, d), d)),
    "q235_filtered_sq8_lsm_recall" -> ((s, d) =>
      Similarity.sq8LsmFilteredRecall(embeddings(s, d), d)),
    "q236_bq_refine" -> ((s, d) =>
      Similarity.bqRefineTopK(embeddings(s, d))),
    "q237_bq_recall" -> ((s, d) =>
      Similarity.bqRecall(embeddings(s, d))),
    "q238_bq_served" -> ((s, d) =>
      Similarity.bqServed(embeddings(s, d), d)),
    "q239_filtered_bq" -> ((s, d) =>
      Similarity.bqFilteredServed(embeddings(s, d), d)),
    "q240_filtered_bq_recall" -> ((s, d) =>
      Similarity.bqFilteredRecall(embeddings(s, d), d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q00_count" -> "SELECT count(*) AS n FROM lineitem",
    "q01_pricing_summary" -> Relational.pricingSummarySql,
    "q02_filter_predicates" -> Relational.filterPredicatesSql,
    "q03_star_join_broadcast" -> Relational.starJoinBroadcastSql,
    "q04_fact_join" -> Relational.factJoinSql,
    "q05_anti_join" -> Relational.antiJoinSql,
    "q06_semi_join" -> Relational.semiJoinSql,
    "q07_outer_join_agg" -> Relational.outerJoinAggSql,
    "q08_rollup" -> Relational.rollupRevenueSql,
    "q09_cube" -> Relational.cubeFlagsSql,
    "q10_count_distinct" -> Relational.countDistinct2Sql,
    "q11_approx_distinct" -> Relational.approxDistinctSql,
    "q12_window_rank" -> Relational.windowRankSql,
    "q13_window_running" -> Relational.windowRunningSql,
    "q14_window_range" -> Relational.windowRangeSql,
    "q15_topk" -> Relational.topKSql,
    "q16_set_ops" -> Relational.setOpsSql,
    "q17_scalar_string" -> Relational.scalarStringSql,
    "q18_scalar_date" -> Relational.scalarDateSql,
    "q19_json_extract" -> Relational.jsonExtractSql,
    "q20_array_ops" -> Relational.arrayOpsSql,
    "q21_range_join" -> Relational.rangeJoinSql,
    "q22_asof_join" -> Relational.asofJoinSql,
    "q23_tumbling_window" -> EventWindows.tumblingSql,
    "q24_sliding_window" -> EventWindows.slidingSql,
    "q25_session_window" -> EventWindows.sessionsSql,
    "q27_interval_join" -> graft.streaming.StatefulOps.intervalJoinBatchSql,
    "q28_stateful_dedup" -> graft.streaming.StatefulOps.statefulDedupBatchSql,
    "q29_user_totals" -> graft.streaming.StatefulOps.userTotalsBatchSql,
    "q26_generator" -> Generator.oracleSql(10000),
    "q30_dedup_exact" -> Dedup.exactSql,
    "q31_dedup_normalized" -> Dedup.normalizedSql,
    "q32_minhash_lsh" -> Dedup.minhashLshSql,
    "q33_ngram_jaccard" -> Dedup.ngramJaccardSql,
    "q34_simhash" -> Dedup.simhashSql,
    "q35_cosine_topk" -> Similarity.cosineTopKSql,
    "q36_embedding_neardup" -> Similarity.embeddingNearDupSql,
    "q37_ivf_topk" -> Similarity.ivfTopKSql,
    "q38_lsh_topk" -> Similarity.lshTopKSql,
    "q39_ann_recall" -> Similarity.annRecallSql,
    "q40_token_stats" -> TextAnalysis.tokenStatsSql,
    "q41_term_freq" -> TextAnalysis.termFreqSql,
    "q42_tfidf_top" -> TextAnalysis.tfidfTopSql,
    "q43_langid" -> TextAnalysis.langIdSql,
    "q44_quality_score" -> TextAnalysis.qualityScoreSql,
    "q45_fingerprint" -> TextAnalysis.fingerprintSql,
    "q46_bpe_tokens" -> TextAnalysis.bpeTokensSql,
    "q47_rolling_hash" -> TextAnalysis.rollingHashSql,
    "q48_substring_dedup" -> TextAnalysis.substringDedupSql,
    "q49_quality_rules" -> TextAnalysis.qualityRulesSql,
    "q50_binary_meta" -> Multimodal.binaryMetaSql,
    "q51_media_features" -> Multimodal.mediaFeaturesSql,
    "q55_frame_sample" -> Multimodal.frameSampleSql,
    "q56_media_resize" -> Multimodal.resizeMediaSql,
    "q52_map_ops" -> Relational.mapOpsSql,
    "q53_grouping_sets" -> Relational.groupingSetsSql,
    "q54_date_arith" -> Relational.dateArithSql,
    "q57_scalar_math" -> Relational.scalarMathSql,
    "q58_tpch_q5" -> Relational.tpchQ5Sql,
    "q59_summary_stats" -> Relational.summaryStatsSql,
    "q60_pivot" -> Relational.pivotFlagsSql,
    "q61_topk_agg" -> Relational.topKPerGroupAggSql,
    "q62_percentiles" -> Relational.percentilesSql,
    "q63_hash_split" -> Corpus.hashSplitSql,
    "q64_stratified_sample" -> Corpus.stratifiedSampleSql,
    "q65_pii_redact" -> Corpus.piiRedactSql,
    "q66_contamination" -> Corpus.contaminationSql,
    "q67_ngram_counts" -> Corpus.ngramCountsSql,
    "q68_neardup_components" -> Corpus.nearDupComponentsSql,
    "q69_incremental_dedup" -> Corpus.incrementalDedupSql,
    "q70_length_band" -> Corpus.lengthBandSql,
    "q71_repetition_score" -> Corpus.repetitionScoreSql,
    "q72_sequence_pack" -> Corpus.sequencePackSql,
    "q73_mixture_weights" -> Corpus.mixtureWeightsSql,
    "q74_embedding_quantize" -> Similarity.quantizeInt8Sql,
    "q75_source_stats" -> Corpus.sourceStatsSql,
    "q76_length_histogram" -> Corpus.lengthHistogramSql,
    "q77_semantic_dedup" -> Similarity.semanticDedupSql,
    "q78_stopword_filter" -> TextAnalysis.stopwordFilterSql,
    "q79_skew_join" -> graft.operators.Skew.skewJoinAggSql,
    "q80_struct_ops" -> Relational.structOpsSql,
    "q81_decimal_agg" -> Relational.decimalAggSql,
    "q82_pq_adc" -> Similarity.pqTopKSql,
    "q83_curation_pipeline" -> Corpus.curationPipelineSql,
    "q84_bucketed_join" -> Relational.bucketedJoinAggSql,
    "q85_heavy_hitters" -> Corpus.heavyHittersSql,
    "q86_importance_weights" -> TextAnalysis.importanceWeightsSql,
    "q87_bloom_prune" -> graft.operators.RuntimeFilter.bloomPruneAggSql,
    "q88_kmeans_lloyd" -> Similarity.kmeansLloydSql,
    "q89_histogram_quantiles" -> Relational.histogramQuantilesSql,
    "q90_user_spend" -> graft.streaming.StatefulOps.userSpendBatchSql,
    "q91_doc_chunks" -> TextAnalysis.docChunksSql,
    "q92_containment_dedup" -> Dedup.containmentSql,
    "q93_cluster_keep_best" -> Corpus.clusterKeepBestSql,
    "q94_pagerank" -> graft.operators.Graph.pageRankSql,
    "q95_temperature_sample" -> Corpus.temperatureSampleSql,
    "q96_json_roundtrip" -> graft.sources.TableIO.jsonRoundTripAggSql,
    "q97_ohlc_bars" -> EventWindows.ohlcBarsSql,
    "q98_scd2_intervals" -> Relational.scd2IntervalsSql,
    "q99_group_sample" -> Corpus.groupSampleSql,
    "q100_partition_prune" -> graft.sources.TableIO.partitionPruneAggSql,
    "q101_dim_stats" -> Similarity.dimStatsSql,
    "q102_schema_evolution" -> graft.sources.TableIO.schemaEvolutionAggSql,
    "q103_countmin_freq" -> Corpus.countMinFreqSql,
    "q104_dynamic_prune" -> graft.sources.TableIO.dynamicPruneAggSql,
    "q105_forward_fill" -> Relational.forwardFillSql,
    "q106_session_funnel" -> EventWindows.sessionFunnelSql,
    "q107_retention_cohorts" -> Relational.retentionCohortsSql,
    "q108_vocab_coverage" -> TextAnalysis.vocabCoverageSql,
    "q109_zorder_layout" -> Relational.zorderLayoutSql,
    "q110_value_anomalies" -> Relational.valueAnomaliesSql,
    "q111_tpch_q3" -> Relational.tpchQ3Sql,
    "q112_tpch_q10" -> Relational.tpchQ10Sql,
    "q113_event_transitions" -> Relational.eventTransitionsSql,
    "q114_token_entropy" -> TextAnalysis.tokenEntropySql,
    "q115_weighted_sample" -> Corpus.weightedSampleSql,
    "q116_basket_pairs" -> Relational.basketPairsSql,
    "q117_activity_streaks" -> Relational.activityStreaksSql,
    "q118_ewma_smooth" -> Relational.ewmaSmoothSql,
    "q119_abc_classification" -> Relational.abcClassificationSql,
    "q120_tpch_q7" -> Relational.tpchQ7Sql,
    "q121_degree_distribution" -> graft.operators.Graph.degreeDistributionSql,
    "q122_bigram_perplexity" -> TextAnalysis.bigramPerplexitySql,
    "q123_stream_enrich" -> EventWindows.enrichedSegmentsSql,
    "q124_source_overlap" -> Corpus.sourceOverlapSql,
    "q125_latest_compaction" -> Relational.latestCompactionSql,
    "q126_pmi_phrases" -> TextAnalysis.pmiPhrasesSql,
    "q127_out_of_order_rate" -> Relational.outOfOrderRateSql,
    "q128_tpch_q18" -> Relational.tpchQ18Sql,
    "q129_cumulative_users" -> Relational.cumulativeUsersSql,
    "q130_benford_digits" -> Relational.benfordDigitsSql,
    "q131_weekday_profile" -> Relational.weekdayProfileSql,
    "q132_contrastive_pairs" -> Corpus.contrastivePairsSql,
    "q133_rep_ngram_stats" -> TextAnalysis.repNgramStatsSql,
    "q134_lang_confusion" -> TextAnalysis.langConfusionSql,
    "q135_tpch_q4" -> Relational.tpchQ4Sql,
    "q136_order_count_dist" -> Relational.orderCountDistributionSql,
    "q137_tpch_q19" -> Relational.tpchQ19Sql,
    "q138_inactive_high_balance" -> Relational.inactiveHighBalanceSql,
    "q139_correlated_premium" -> Relational.correlatedPremiumSql,
    "q140_ordered_string_agg" -> Relational.orderedStringAggSql,
    "q141_embedding_coverage" -> Corpus.embeddingCoverageSql,
    "q142_interval_join_outer" ->
      graft.streaming.StatefulOps.intervalJoinOuterBatchSql,
    "q143_etl_lineage" -> graft.etl.App.e2eLineageSql,
    // same exact-containment semantics as q92's oracle: the harness and
    // the banded production path share one truth definition
    "q144_containment_exact" -> Dedup.containmentSql,
    "q145_rolling_7day" -> Relational.rolling7DaySql,
    "q146_quantile_contract" -> Relational.quantileContractSql,
    "q147_knn_join" -> Similarity.knnJoinSql,
    "q148_cdc_merge" -> Relational.cdcMergeSql,
    "q149_replica_fingerprint" -> Relational.replicaFingerprintSql,
    "q150_tpch_q6" -> TpchSuite.tpchQ6Sql,
    "q151_tpch_q2" -> TpchSuite.minCostSupplierSql,
    "q152_tpch_q8" -> TpchSuite.marketShareSql,
    "q153_tpch_q9" -> TpchSuite.productProfitSql,
    "q154_tpch_q11" -> TpchSuite.valueConcentrationSql,
    "q155_tpch_q12" -> TpchSuite.latePrioritySql,
    "q156_tpch_q14" -> TpchSuite.promoShareSql,
    "q157_tpch_q15" -> TpchSuite.topSupplierSql,
    "q158_tpch_q16" -> TpchSuite.supplierCountByPartSql,
    "q159_tpch_q17" -> TpchSuite.smallQuantityRevenueSql,
    "q160_tpch_q20" -> TpchSuite.dominantSuppliersSql,
    "q161_tpch_q21" -> TpchSuite.waitingOrdersSql,
    "q162_bm25_topk" -> graft.llm.Retrieval.bm25TopKSql,
    "q163_hash_classifier" -> graft.llm.Retrieval.hashClassifierSql,
    "q164_domain_cap" -> graft.llm.Retrieval.domainCapSql(
      TextAnalysis.qualityScoreSql),
    "q165_bpe_merge_round" -> graft.llm.TokenizerOps.bpeMergeRoundSql,
    "q166_length_buckets" -> graft.llm.TokenizerOps.lengthBucketBatchingSql,
    "q167_batch_embed" -> graft.llm.TokenizerOps.batchEmbedSql,
    "q168_leakage_safe_split" -> Corpus.leakageSafeSplitSql,
    "q169_rrf_fusion" -> graft.llm.Retrieval.rrfFusionSql,
    "q170_rerank_fused" -> graft.llm.Retrieval.rerankFusedSql,
    "q171_curation_index" -> Corpus.buildCurationIndexSql,
    // q93's oracle verbatim: the indexed consumer must match the
    // recompute path bit-exactly — that equality IS the index's proof
    "q172_keep_best_indexed" -> Corpus.clusterKeepBestSql,
    "q173_incremental_ingest" -> Corpus.incrementalIngestSql,
    "q174_vector_index" -> Similarity.buildVectorIndexSql,
    // q37's oracle verbatim: search served from the stored index must
    // match the retrain path bit-exactly (the q172 pattern for ANN)
    "q175_ivf_indexed" -> Similarity.ivfTopKSql,
    "q176_fp_index_update" -> Corpus.updateFingerprintIndexSql,
    "q177_hard_negatives" -> Similarity.hardNegativesSql,
    "q178_pq_refine" -> Similarity.pqRefineSql,
    // serve-only legs: q37's / q93's oracles verbatim — served results
    // must equal the retrain/recompute paths bit-exactly
    "q179_ivf_served" -> Similarity.ivfTopKSql,
    "q180_keep_best_served" -> Corpus.clusterKeepBestSql,
    "q181_index_lifecycle" -> Corpus.indexLifecycleSql,
    "q182_daily_pipeline" -> Corpus.dailyPipelineSql,
    // q178's oracle verbatim: the serve leg from the stored PQ index
    // must match the self-contained train+encode path bit-exactly
    "q183_pq_refine_served" -> Similarity.pqRefineSql,
    "q184_vector_lifecycle" -> Similarity.vectorIndexLifecycleSql,
    "q185_pq_refine_fixed" -> Similarity.pqRefineFixedSql,
    "q186_ivfpq_topk" -> Similarity.ivfPqTopKSql,
    // q186's oracle VERBATIM: store ≡ recompute for the composed index
    "q187_ivfpq_served" -> Similarity.ivfPqTopKSql,
    "q188_lifecycle_retrain" -> Similarity.vectorIndexRetrainSql,
    "q189_pq_lifecycle" -> Similarity.pqIndexLifecycleSql,
    "q190_ivfpq_lifecycle" -> Similarity.ivfPqIndexLifecycleSql,
    "q191_pq_retrain" -> Similarity.pqIndexRetrainSql,
    "q192_bucketed_merge" -> Corpus.bucketedIndexMergeSql,
    "q193_lsm_vector_index" -> Similarity.lsmVectorIndexSql,
    "q194_lsm_served" -> Similarity.lsmServedTopKSql,
    // q194's oracle VERBATIM: the ServedRoots store ≡ the recompute
    "q195_lsm_serve_split" -> Similarity.lsmServedTopKSql,
    "q196_lsm_composed" -> Similarity.lsmComposedIndexSql,
    "q197_lsm_composed_served" -> Similarity.lsmComposedServedSql,
    // q197's oracle VERBATIM: the ServedRoots store ≡ the recompute
    "q198_lsm_composed_split" -> Similarity.lsmComposedServedSql,
    "q199_fuzzy_join" -> Dedup.fuzzyJoinSql,
    // q199's oracle VERBATIM: the stored variant index ≡ the recompute
    "q200_fuzzy_served" -> Dedup.fuzzyJoinSql,
    "q201_knn_graph" -> GraphAnn.knnGraphSql,
    "q202_graph_beam_topk" -> GraphAnn.beamTopKSql,
    // q202's oracle VERBATIM: the stored graph ≡ the recompute
    "q203_graph_beam_served" -> GraphAnn.beamTopKSql,
    "q204_filtered_ann" -> Similarity.ivfTopKFilteredSql,
    "q205_maxsim_topk" -> Similarity.maxSimTopKSql,
    "q206_graph_lifecycle" -> GraphLifecycle.graphLifecycleSql,
    // q207: q204's oracle VERBATIM — the store ≡ recompute proof
    "q207_filtered_served" -> Similarity.ivfTopKFilteredSql,
    "q208_maxsim_rerank" -> Similarity.maxSimRerankSql,
    // q209: q208's oracle VERBATIM — the store ≡ recompute proof
    "q209_maxsim_served" -> Similarity.maxSimRerankSql,
    "q210_graph_recall" -> GraphAnn.graphRecallSql,
    "q211_graph_lifecycle_served" -> GraphLifecycle.graphLifecycleServedSql,
    "q212_lifecycle_recall" -> GraphLifecycle.graphLifecycleRecallSql,
    "q213_sq8_topk" -> Similarity.sq8TopKSql,
    "q214_sq8_recall" -> Similarity.sq8RecallSql,
    // q215: q213's oracle VERBATIM — the store ≡ recompute proof
    "q215_sq8_served" -> Similarity.sq8TopKSql,
    "q216_ivf_sq8" -> Similarity.ivfSq8TopKSql,
    // q217: q216's oracle VERBATIM — the store ≡ recompute proof
    "q217_ivf_sq8_served" -> Similarity.ivfSq8TopKSql,
    "q218_ivf_sq8_recall" -> Similarity.ivfSq8RecallSql,
    "q219_filtered_graph" -> GraphAnn.beamTopKFilteredSql,
    // q220: q219's oracle VERBATIM — the store ≡ recompute proof
    "q220_filtered_graph_served" -> GraphAnn.beamTopKFilteredSql,
    "q221_filtered_graph_recall" -> GraphAnn.filteredGraphRecallSql,
    "q222_filtered_ivf_sq8" -> Similarity.ivfSq8FilteredTopKSql,
    // q223: q222's oracle VERBATIM — the store ≡ recompute proof
    "q223_filtered_ivf_sq8_served" -> Similarity.ivfSq8FilteredTopKSql,
    "q224_filtered_ivf_sq8_recall" -> Similarity.ivfSq8FilteredRecallSql,
    "q225_sq8_lifecycle" -> Similarity.sq8IndexLifecycleSql,
    "q226_sq8_lifecycle_served" -> Similarity.sq8LifecycleServedSql,
    "q227_maxsim_graph_rerank" -> GraphAnn.maxSimGraphRerankSql,
    "q228_filtered_lsm_served" -> Similarity.lsmFilteredServedSql,
    "q229_filtered_lsm_composed" -> Similarity.lsmComposedFilteredServedSql,
    "q230_filtered_lsm_recall" -> Similarity.lsmFilteredRecallSql,
    "q231_sq8_retrain" -> Similarity.sq8IndexRetrainSql,
    "q232_sq8_lsm" -> Similarity.sq8LsmIndexSql,
    "q233_sq8_lsm_served" -> Similarity.sq8LsmServedSql,
    "q234_filtered_sq8_lsm" -> Similarity.sq8LsmFilteredServedSql,
    "q235_filtered_sq8_lsm_recall" -> Similarity.sq8LsmFilteredRecallSql,
    "q236_bq_refine" -> Similarity.bqRefineTopKSql,
    "q237_bq_recall" -> Similarity.bqRecallSql,
    "q238_bq_served" -> Similarity.bqRefineTopKSql,
    "q239_filtered_bq" -> Similarity.bqFilteredServedSql,
    "q240_filtered_bq_recall" -> Similarity.bqFilteredRecallSql
  )
}
