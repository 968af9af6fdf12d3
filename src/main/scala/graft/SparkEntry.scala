package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Raster

/** Driver contract — see /root/repo/SURVEY.md §2.1/§7 + the builder prompt.
  *
  * `queries` is the engine's declared query surface: every reference
  * operator (species_range_etl.py, via QueriesCore) plus the LLM-pipeline
  * extensions (QueriesExt). `oracleSql` carries the DuckDB-equivalent SQL
  * for each hash-checked entry; rows-only entries (geometry WKB, LSH ANN)
  * are deliberately absent from it and covered by ScalaTest instead.
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end product (species_range_etl.py
    * EP-2+EP-3) — cells -> threshold ×3 -> dissolve (geometric union) ->
    * area — on sf0.001. One scan, one broadcast cross join, one shuffle
    * (the partial+final union aggregate).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cells = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_returnflag").as("species"),
      (col("l_orderkey") % 32).cast("int").as("r"),
      (col("l_partkey") % 32).cast("int").as("c"),
      (col("l_quantity") / 50).as("prob"))
    val thresholded = Raster.thresholdExplode(cells, "prob", Seq(0.25, 0.5, 0.75))
      .dropDuplicates("species", "threshold", "r", "c")
    Raster.dissolveGeo(thresholded, keys = Seq("species", "threshold"),
      rowCol = "r", colCol = "c", xll = 0.0, yll = 0.0, cellsize = 0.25, nrows = 32)
      .select(col("species"), col("threshold"), col("area"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference operators (QueriesCore)
    "q_catalog_project"      -> (QueriesCore.qCatalogProject _),
    "q_threshold_filter"     -> (QueriesCore.qThresholdFilter _),
    "q_meta_extract"         -> (QueriesCore.qMetaExtract _),
    "q_html_links"           -> (QueriesCore.qHtmlLinks _),
    "q_zip_route"            -> (QueriesCore.qZipRoute _),
    "q_enrich_literals"      -> (QueriesCore.qEnrichLiterals _),
    "q_dissolve_area"        -> (QueriesCore.qDissolveArea _),
    "q_union_all"            -> (QueriesCore.qUnionAll _),
    "q_incremental_antijoin" -> (QueriesCore.qIncrementalAntijoin _),
    "q_threshold_crossjoin"  -> (QueriesCore.qThresholdCrossjoin _),
    "q_year_cast"            -> (QueriesCore.qYearCast _),
    "q_join_enrich"          -> (QueriesCore.qJoinEnrich _),
    "q_window_rank"          -> (QueriesCore.qWindowRank _),
    "q_rollup"               -> (QueriesCore.qRollup _),
    "q_topk"                 -> (QueriesCore.qTopk _),
    "q_cube"                 -> (QueriesCore.qCube _),
    "q_pivot"                -> (QueriesCore.qPivot _),
    "q_bucketed_join"        -> (QueriesCore.qBucketedJoin _),
    "q_distinct_agg"         -> (QueriesCore.qDistinctAgg _),
    "q_collect_list"         -> (QueriesCore.qCollectList _),
    "q_sql_text"             -> (QueriesCore.qSqlText _),
    "q_window_lag"           -> (QueriesCore.qWindowLag _),
    "q_salted_agg"           -> (QueriesCore.qSaltedAgg _),
    "q_semijoin"             -> (QueriesCore.qSemijoin _),
    "q_set_ops"              -> (QueriesCore.qSetOps _),
    "q_string_funcs"         -> (QueriesCore.qStringFuncs _),
    "q_conditional"          -> (QueriesCore.qConditional _),
    "q_geo_dissolve"         -> (QueriesCore.qGeoDissolve _),
    "q_geo_cell_area"        -> (QueriesCore.qGeoCellArea _),
    "q_geo_union_wkb"        -> (QueriesCore.qGeoUnionWkb _),
    "q_raster_cells"         -> (QueriesCore.qRasterCells _),
    "q_zip_grid_cells"       -> (QueriesCore.qZipGridCells _),
    "q_shapefile_scan"       -> (QueriesCore.qShapefileScan _),
    "q_shapefile_attrs"      -> (QueriesCore.qShapefileAttrs _),
    "q_connected_components" -> (QueriesCore.qConnectedComponents _),
    "q_speciesdata"          -> (QueriesCore.qSpeciesdata _),
    "q_speciesdata_exact"    -> (QueriesCore.qSpeciesdataExact _),
    // LLM-pipeline extensions (QueriesExt)
    "q_dedup_exact"          -> (QueriesExt.qDedupExact _),
    "q_dedup_minhash"        -> (QueriesExt.qDedupMinhash _),
    "q_dedup_simhash"        -> (QueriesExt.qDedupSimhash _),
    "q_ngram_jaccard"        -> (QueriesExt.qNgramJaccard _),
    "q_text_stats"           -> (QueriesExt.qTextStats _),
    "q_quality_score"        -> (QueriesExt.qQualityScore _),
    "q_lang_id"              -> (QueriesExt.qLangId _),
    "q_token_fingerprint"    -> (QueriesExt.qTokenFingerprint _),
    "q_tfidf"                -> (QueriesExt.qTfidf _),
    "q_similar_topk"         -> (QueriesExt.qSimilarTopk _),
    "q_embed_near_dup"       -> (QueriesExt.qEmbedNearDup _),
    "q_ann_lsh"              -> (QueriesExt.qAnnLsh _),
    "q_ann_ivf"              -> (QueriesExt.qAnnIvf _),
    "q_sessionize"           -> (QueriesExt.qSessionize _),
    "q_asof_join"            -> (QueriesExt.qAsofJoin _),
    "q_range_join"           -> (QueriesExt.qRangeJoin _),
    "q_events_daily"         -> (QueriesExt.qEventsDaily _),
    "q_json_extract"         -> (QueriesExt.qJsonExtract _),
    "q_multimodal_meta"      -> (QueriesExt.qMultimodalMeta _),
    "q_multimodal_frames"    -> (QueriesExt.qMultimodalFrames _),
    "q_image_decode"         -> (QueriesExt.qImageDecode _),
    "q_image_resize"         -> (QueriesExt.qImageResize _),
    "q_audio_meta"           -> (QueriesExt.qAudioMeta _),
    "q_decontaminate"        -> (QueriesExt.qDecontaminate _),
    "q_decontaminate_bloom"  -> (QueriesExt.qDecontaminateBloom _),
    "q_embed_quantize"       -> (QueriesExt.qEmbedQuantize _),
    "q_domain_mix"           -> (QueriesExt.qDomainMix _),
    "q_substring_dedup"      -> (QueriesExt.qSubstringDedup _),
    "q_inverted_index"       -> (QueriesExt.qInvertedIndex _),
    "q_collocations"         -> (QueriesExt.qCollocations _),
    "q_corpus_diff"          -> (QueriesExt.qCorpusDiff _),
    "q_tokenize_ids"         -> (QueriesExt.qTokenizeIds _),
    "q_kmeans"               -> (QueriesExt.qKmeans _),
    "q_pii_scrub"            -> (QueriesExt.qPiiScrub _),
    "q_near_dup_clusters"    -> (QueriesExt.qNearDupClusters _),
    "q_corpus_full"          -> (QueriesExt.qCorpusFull _),
    "q_repetition_filter"    -> (QueriesExt.qRepetitionFilter _),
    "q_train_split"          -> (QueriesExt.qTrainSplit _),
    "q_seq_pack"             -> (QueriesExt.qSeqPack _),
    "q_corpus_pipeline"      -> (QueriesExt.qCorpusPipeline _),
    "q_stratified_sample"    -> (QueriesExt.qStratifiedSample _),
    "q_vocab"                -> (QueriesExt.qVocab _),
    "q_semdedup"             -> (QueriesExt.qSemdedup _),
    "q_bm25"                 -> (QueriesExt.qBm25 _),
    "q_quality_gate"         -> (QueriesExt.qQualityGate _),
    "q_cdc_chunks"           -> (QueriesExt.qCdcChunks _),
    "q_length_buckets"       -> (QueriesExt.qLengthBuckets _),
    "q_pagerank"             -> (QueriesExt.qPagerank _),
  )

  /** DuckDB-equivalent SQL per hash-checked query (column names aligned). */
  def oracleSql: Map[String, String] = Map(
    "q_catalog_project"      -> QueriesCore.oCatalogProject,
    "q_threshold_filter"     -> QueriesCore.oThresholdFilter,
    "q_meta_extract"         -> QueriesCore.oMetaExtract,
    "q_html_links"           -> QueriesCore.oHtmlLinks,
    "q_zip_route"            -> QueriesCore.oZipRoute,
    "q_enrich_literals"      -> QueriesCore.oEnrichLiterals,
    "q_dissolve_area"        -> QueriesCore.oDissolveArea,
    "q_union_all"            -> QueriesCore.oUnionAll,
    "q_incremental_antijoin" -> QueriesCore.oIncrementalAntijoin,
    "q_threshold_crossjoin"  -> QueriesCore.oThresholdCrossjoin,
    "q_year_cast"            -> QueriesCore.oYearCast,
    "q_join_enrich"          -> QueriesCore.oJoinEnrich,
    "q_window_rank"          -> QueriesCore.oWindowRank,
    "q_rollup"               -> QueriesCore.oRollup,
    "q_topk"                 -> QueriesCore.oTopk,
    "q_cube"                 -> QueriesCore.oCube,
    "q_pivot"                -> QueriesCore.oPivot,
    "q_bucketed_join"        -> QueriesCore.oBucketedJoin,
    "q_distinct_agg"         -> QueriesCore.oDistinctAgg,
    "q_collect_list"         -> QueriesCore.oCollectList,
    "q_sql_text"             -> QueriesCore.oSqlText,
    "q_window_lag"           -> QueriesCore.oWindowLag,
    "q_salted_agg"           -> QueriesCore.oSaltedAgg,
    "q_semijoin"             -> QueriesCore.oSemijoin,
    "q_set_ops"              -> QueriesCore.oSetOps,
    "q_string_funcs"         -> QueriesCore.oStringFuncs,
    "q_conditional"          -> QueriesCore.oConditional,
    "q_geo_dissolve"         -> QueriesCore.oGeoDissolve,
    "q_geo_union_wkb"        -> QueriesCore.oGeoUnionWkb,
    "q_geo_cell_area"        -> QueriesCore.oGeoCellArea,
    "q_raster_cells"         -> QueriesCore.oRasterCells,
    "q_zip_grid_cells"       -> QueriesCore.oZipGridCells,
    "q_shapefile_scan"       -> QueriesCore.oShapefileScan,
    "q_shapefile_attrs"      -> QueriesCore.oShapefileAttrs,
    "q_connected_components" -> QueriesCore.oConnectedComponents,
    "q_speciesdata"          -> QueriesCore.oSpeciesdata,
    "q_speciesdata_exact"    -> QueriesCore.oSpeciesdataExact,
    "q_dedup_exact"          -> QueriesExt.oDedupExact,
    "q_dedup_minhash"        -> QueriesExt.oDedupMinhash,
    "q_dedup_simhash"        -> QueriesExt.oDedupSimhash,
    "q_ngram_jaccard"        -> QueriesExt.oNgramJaccard,
    "q_text_stats"           -> QueriesExt.oTextStats,
    "q_quality_score"        -> QueriesExt.oQualityScore,
    "q_lang_id"              -> QueriesExt.oLangId,
    "q_token_fingerprint"    -> QueriesExt.oTokenFingerprint,
    "q_tfidf"                -> QueriesExt.oTfidf,
    "q_similar_topk"         -> QueriesExt.oSimilarTopk,
    "q_embed_near_dup"       -> QueriesExt.oEmbedNearDup,
    "q_ann_lsh"              -> QueriesExt.oAnnLsh,
    "q_ann_ivf"              -> QueriesExt.oAnnIvf,
    "q_sessionize"           -> QueriesExt.oSessionize,
    "q_asof_join"            -> QueriesExt.oAsofJoin,
    "q_range_join"           -> QueriesExt.oRangeJoin,
    "q_events_daily"         -> QueriesExt.oEventsDaily,
    "q_json_extract"         -> QueriesExt.oJsonExtract,
    "q_multimodal_meta"      -> QueriesExt.oMultimodalMeta,
    "q_multimodal_frames"    -> QueriesExt.oMultimodalFrames,
    "q_image_decode"         -> QueriesExt.oImageDecode,
    "q_image_resize"         -> QueriesExt.oImageResize,
    "q_audio_meta"           -> QueriesExt.oAudioMeta,
    "q_decontaminate"        -> QueriesExt.oDecontaminate,
    // the bloom path must produce bit-identical output to the exact path —
    // sharing the oracle makes any divergence a graded failure
    "q_decontaminate_bloom"  -> QueriesExt.oDecontaminate,
    "q_embed_quantize"       -> QueriesExt.oEmbedQuantize,
    "q_domain_mix"           -> QueriesExt.oDomainMix,
    "q_substring_dedup"      -> QueriesExt.oSubstringDedup,
    "q_inverted_index"       -> QueriesExt.oInvertedIndex,
    "q_collocations"         -> QueriesExt.oCollocations,
    "q_corpus_diff"          -> QueriesExt.oCorpusDiff,
    "q_tokenize_ids"         -> QueriesExt.oTokenizeIds,
    "q_kmeans"               -> QueriesExt.oKmeans,
    "q_pii_scrub"            -> QueriesExt.oPiiScrub,
    "q_near_dup_clusters"    -> QueriesExt.oNearDupClusters,
    "q_corpus_full"          -> QueriesExt.oCorpusFull,
    "q_repetition_filter"    -> QueriesExt.oRepetitionFilter,
    "q_train_split"          -> QueriesExt.oTrainSplit,
    "q_seq_pack"             -> QueriesExt.oSeqPack,
    "q_corpus_pipeline"      -> QueriesExt.oCorpusPipeline,
    "q_stratified_sample"    -> QueriesExt.oStratifiedSample,
    "q_vocab"                -> QueriesExt.oVocab,
    "q_semdedup"             -> QueriesExt.oSemdedup,
    "q_bm25"                 -> QueriesExt.oBm25,
    "q_quality_gate"         -> QueriesExt.oQualityGate,
    "q_cdc_chunks"           -> QueriesExt.oCdcChunks,
    "q_length_buckets"       -> QueriesExt.oLengthBuckets,
    "q_pagerank"             -> QueriesExt.oPagerank,
  )
}
