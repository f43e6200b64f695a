package graft

import graft.extract.Synth
import graft.pipeline.Pipeline
import graft.queries.{Oracles, Queries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * `queries` exposes every implemented operator from SURVEY.md §2 plus the
  * training-data operators; `oracleSql` carries the DuckDB equivalent for each
  * SQL-expressible one (same column names — the driver compares by sorted
  * column name + value hash). KG-pipeline queries (OpenIE extraction,
  * broadcast-trie inference over synthesized pages) are not SQL-expressible in
  * DuckDB and get the rows-only check.
  */
object SparkEntry {

  /** Flagship: full KG-construction + namespace-summarization pipeline over a
    * synthesized Common-Crawl-style page corpus (BASELINE.json input_hint
    * shape), returning the condensed namespace summary.
    */
  def entry(spark: SparkSession): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val pages = Synth.pages(spark, 300)
    val cfg = Pipeline.Config(outDir = out, minOccurs = 5,
      minNsSize = 100, minDomainOccurs = 10, resume = false)
    Pipeline.run(spark, pages, cfg).summary
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // chilon core (real engine path; oracle re-derives from first principles)
    "q_p4_resolve_ns" -> (Queries.p4ResolveNs _),
    "q_a1_summary" -> (Queries.a1Summary _),
    "q_incr_summary" -> (Queries.incrSummary _),
    "q_o1_stmt_ids" -> (Queries.o1StmtIds _),
    "q_a5_vis_nodes" -> (Queries.a5VisNodes _),
    "q_a6_vis_edges" -> (Queries.a6VisEdges _),
    "q_a2_prefix_counts" -> (Queries.a2PrefixCounts _),
    "q_a2_prefix_stats" -> (Queries.a2PrefixStats _),
    "q_n3_infer_ns" -> (Queries.n3InferNs _),
    "q_p3_canonicalize" -> (Queries.p3Canonicalize _),
    "q_p5_literal_class" -> (Queries.p5LiteralClass _),
    "q_p6_ignore_unknown" -> (Queries.p6IgnoreUnknown _),
    "q_p12_metrics" -> (Queries.p12Metrics _),
    "q_s5_registry" -> (Queries.s5Registry _),
    "q_p8_alias_gen" -> (Queries.p8AliasGen _),
    "q_rdf_parse" -> (Queries.rdfParse _),
    // KG pipeline over sf-scaled synthesized pages (full value oracles: the
    // splitmix page derivation is replicated in DuckDB SQL, queries/KgSql.scala)
    "q_html_extract" -> (Queries.htmlExtract _),
    "q_kg_summary" -> (Queries.kgSummary _),
    "q_kg_triples" -> (Queries.kgTriples _),
    "q_kg_domain_range" -> (Queries.kgDomainRange _),
    "q_kg_degrees" -> (Queries.kgDegrees _),
    "q_kg_pagerank" -> (Queries.kgPageRank _),
    "q_kg_ppr" -> (Queries.kgPprDbr _),
    "q_kg_triangles" -> (Queries.kgTriangles _),
    "q_kg_cooccur" -> (Queries.kgCooccur _),
    "q_kg_jaccard" -> (Queries.kgNeighborJaccard _),
    "q_kg_resource_alloc" -> (Queries.kgResourceAlloc _),
    "q_kg_signatures" -> (Queries.kgSignatures _),
    "q_kg_pred_stats" -> (Queries.kgPredStats _),
    "q_kg_subclass" -> (Queries.kgSubClassClosure _),
    "q_kg_rdfs_types" -> (Queries.kgRdfsTypes _),
    "q_kg_constraints" -> (Queries.kgConstraints _),
    "q_kg_dangling" -> (Queries.kgDangling _),
    "q_kg_type_counts" -> (Queries.kgTypeCounts _),
    "q_kg_domain_check" -> (Queries.kgDomainCheck _),
    "q_kg_fuse" -> (Queries.kgFuse _),
    "q_kg_temporal" -> (Queries.kgTemporal _),
    "q_kg_entity_resolve" -> (Queries.kgEntityResolve _),
    "q_kg_canon_triples" -> (Queries.kgCanonTriples _),
    "q_kg_labels" -> (Queries.kgLabels _),
    "q_kg_diff" -> (Queries.kgSnapshotDiff _),
    "q_kg_neighbors" -> (Queries.kgNeighborhood _),
    "q_kg_encode" -> (Queries.kgEncode _),
    "q_kg_negatives" -> (Queries.kgNegatives _),
    "q_kg_kcore" -> (Queries.kgKCore _),
    "q_kg_communities" -> (Queries.kgCommunities _),
    "q_kg_pred_lift" -> (Queries.kgPredLift _),
    "q_kg_hits" -> (Queries.kgHits _),
    "q_kg_path_pairs" -> (Queries.kgPathPairs _),
    "q_kg_anf" -> (Queries.kgAnf _),
    "q_kg_anf_curve" -> (Queries.kgAnfCurve _),
    "q_kg_export_nt" -> (Queries.kgExportNt _),
    "q_stream_join" -> (Queries.streamJoin _),
    "q_bucketed_join" -> (Queries.bucketedJoin _),
    "q_text_sentences" -> (Queries.textSentences _),
    "q_bitext_pairs" -> (Queries.bitextPairs _),
    "q_warc_export" -> (Queries.warcExport _),
    "q_http_body" -> (Queries.httpBody _),
    "q_kg_skolem" -> (Queries.kgSkolem _),
    "q_kg_export_nq" -> (Queries.kgExportNq _),
    "q_kg_void" -> (Queries.kgVoid _),
    "q_crawl_latest" -> (Queries.crawlLatest _),
    "q_stream_summary" -> (Queries.streamSummary _),
    "q_stream_dedup" -> (Queries.streamDedup _),
    // training-data operators
    "q_dedup_exact" -> (Queries.dedupExact _),
    "q_decontam_exact" -> (Queries.decontamExact _),
    "q_decontam_ngram" -> (Queries.decontamNgram _),
    "q_dedup_lines" -> (Queries.dedupLines _),
    "q_domain_cap" -> (Queries.domainCap _),
    "q_dedup_token_jaccard" -> (Queries.dedupTokenJaccard _),
    "q_dedup_ngram" -> (Queries.dedupNgram _),
    "q_dedup_minhash" -> (Queries.dedupMinhash _),
    "q_dedup_clusters" -> (Queries.dedupClusters _),
    "q_dedup_embedding" -> (Queries.dedupEmbedding _),
    "q_dedup_simhash" -> (Queries.dedupSimhash _),
    "q_sim_topk" -> (Queries.simTopK _),
    "q_sim_lsh" -> (Queries.simLsh _),
    "q_sim_ivf" -> (Queries.simIvf _),
    "q_sem_dedup" -> (Queries.semanticDedup _),
    "q_embed_quant" -> (Queries.embedQuant _),
    "q_embed_pq" -> (Queries.embedPq _),
    "q_embed_outliers" -> (Queries.embedOutliers _),
    "q_kmeans" -> (Queries.kmeansAssign _),
    "q_kg_mentions" -> (Queries.kgMentions _),
    "q_el_priors" -> (Queries.elPriors _),
    "q_text_langid" -> (Queries.textLangId _),
    "q_text_filter" -> (Queries.textFilter _),
    "q_split_train_val" -> (Queries.splitTrainVal _),
    "q_stratified_sample" -> (Queries.stratifiedSample _),
    "q_temperature_mix" -> (Queries.temperatureMix _),
    "q_shard_manifest" -> (Queries.shardManifest _),
    "q_mix_corpora" -> (Queries.mixCorpora _),
    "q_dedup_substr" -> (Queries.dedupSubstr _),
    "q_dedup_rep" -> (Queries.dedupKeepBest _),
    "q_contam_report" -> (Queries.contamReport _),
    "q_vocab_topk" -> (Queries.vocabTop _),
    "q_fuzzy_vocab" -> (Queries.fuzzyVocab _),
    "q_bpe_pairs" -> (Queries.bpePairs _),
    "q_tokenize_ids" -> (Queries.tokenizeIds _),
    "q_vocab_coverage" -> (Queries.vocabCoverage _),
    "q_select_budget" -> (Queries.selectBudget _),
    "q_pack_sequences" -> (Queries.packSequences _),
    "q_chunk_blocks" -> (Queries.chunkBlocks _),
    "q_text_normalize" -> (Queries.textNormalize _),
    "q_script_profile" -> (Queries.scriptProfileQ _),
    "q_web_links" -> (Queries.webLinks _),
    "q_anchor_text" -> (Queries.anchorText _),
    "q_host_graph" -> (Queries.hostGraph _),
    "q_text_unigram_lm" -> (Queries.textUnigramLm _),
    "q_text_bigram_lm" -> (Queries.textBigramLm _),
    "q_bm25_topk" -> (Queries.bm25TopK _),
    "q_keywords_tfidf" -> (Queries.keywordsTfidf _),
    "q_index_postings" -> (Queries.indexPostings _),
    "q_phrase_search" -> (Queries.phraseSearch _),
    "q_ppl_buckets" -> (Queries.pplBuckets _),
    "q_text_quality" -> (Queries.textQuality _),
    "q_quality_classify" -> (Queries.qualityClassify _),
    "q_dsir_weights" -> (Queries.dsirWeights _),
    "q_url_normalize" -> (Queries.urlCanonicalize _),
    "q_url_redirects" -> (Queries.urlRedirects _),
    "q_domain_stats" -> (Queries.domainStatsQ _),
    "q_text_tokens" -> (Queries.textTokens _),
    "q_text_fingerprint" -> (Queries.textFingerprint _),
    "q_text_repetition" -> (Queries.textRepetition _),
    "q_text_overlap" -> (Queries.textOverlap _),
    "q_text_pii" -> (Queries.textPii _),
    "q_corpus_stats" -> (Queries.corpusStats _),
    "q_exact_quantiles" -> (Queries.exactQuantiles _),
    "q_dedup_winnow" -> (Queries.dedupWinnow _),
    "q_winnow_pairs" -> (Queries.winnowPairs _),
    "q_host_boilerplate" -> (Queries.hostBoilerplate _),
    "q_media_meta" -> (Queries.mediaMeta _),
    "q_media_frames" -> (Queries.mediaFrames _),
    "q_media_resize" -> (Queries.mediaResize _),
    "q_media_audio" -> (Queries.mediaAudio _),
    // relational fundamentals (perf anchors)
    "q_agg_lineitem" -> (Queries.aggLineitem _),
    "q_join_broadcast" -> (Queries.joinBroadcast _),
    "q_join_semi" -> (Queries.joinSemi _),
    "q_join_anti" -> (Queries.joinAnti _),
    "q_window_events" -> (Queries.windowEvents _),
    "q_topk_events" -> (Queries.topkEvents _),
    "q_set_ops" -> (Queries.setOpsEvents _),
    "q_sessionize" -> (Queries.sessionizeEvents _),
    "q_session_window" -> (Queries.sessionWindowEvents _),
    "q_dedup_paras" -> (Queries.dedupParas _),
    "q_asof_join" -> (Queries.asofEvents _),
    "q_range_join" -> (Queries.rangeJoinQ _),
    "q_kg_jsonld" -> (Queries.kgJsonLd _),
    "q_heavy_hitters" -> (Queries.heavyHitters _),
    "q_kg_bgp" -> (Queries.kgBgp _),
    "q_html_tables" -> (Queries.htmlTablesQ _),
    "q_table_triples" -> (Queries.tableTriples _),
    "q_hll_distinct" -> (Queries.hllDistinct _),
    "q_bloom_decontam" -> (Queries.bloomDecontamQ _),
    "q_warc_records" -> (Queries.warcRecords _),
    "q_cdx_index" -> (Queries.cdxIndex _),
    "q_compaction_plan" -> (Queries.compactionPlanQ _),
    "q_zorder_keys" -> (Queries.zorderKeys _),
    "q_http_parse" -> (Queries.httpParse _),
    "q_robots" -> (Queries.robotsVerdicts _),
    "q_html_meta" -> (Queries.htmlMeta _),
    "q_sitemap" -> (Queries.sitemapParse _),
    "q_ingest_e2e" -> (Queries.ingestE2e _),
    "q_robots_frontier" -> (Queries.robotsFrontier _),
    "q_mix_cube" -> (Queries.mixCube _),
    "q_lang_source_pivot" -> (Queries.langSourcePivot _),
    "q_stream_ingest" -> (Queries.streamIngest _)
  )

  /** DuckDB oracle SQL per query (omitted => rows-only check). */
  def oracleSql: Map[String, String] = Oracles.sqls
}
