package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, CdcQueries, DataOps}

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Each entry is one operator/stage from SURVEY.md §2 (CDC engine) or the
  * training-data-pipeline set, expressed over the shared parquet tables so
  * the driver can cross-check against DuckDB. Names map to SURVEY §2 ids in
  * the Scaladoc of the implementing method.
  */
object SparkEntry {

  /** Flagship: the real engine end-to-end (binlog-shaped stream derived from
    * `events` → LakeTable COW MERGE over 4 micro-batches → live table).
    */
  def entry(spark: SparkSession): DataFrame =
    CdcQueries.pipelineE2e(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- CDC engine stages (SURVEY §2) ---
    "cdc_envelope_convert" -> (CdcQueries.envelopeConvert(_, _)), // S4/P6
    "cdc_transport_dedup" -> (CdcQueries.transportDedup(_, _)),   // T3
    "cdc_lww_reduce" -> (CdcQueries.lwwReduce(_, _)),             // A1/2.5
    "cdc_final_state" -> (CdcQueries.finalState(_, _)),           // J1 fold
    "cdc_pipeline_e2e" -> (CdcQueries.pipelineE2e(_, _)),         // whole engine
    "cdc_schema_reconcile" -> (CdcQueries.schemaReconcile(_, _)), // E1/E2
    "cdc_lineage_stats" -> (CdcQueries.lineageStats(_, _)),       // A4/A7
    "cdc_snapshot_chunks" -> (CdcQueries.snapshotChunks(_, _)),   // S8/A2
    "cdc_commit_boundaries" -> (CdcQueries.commitBoundaries(_, _)), // T4
    "cdc_concurrent_backfill" -> (CdcQueries.concurrentBackfill(_, _)), // T7/J3
    "cdc_multi_table" -> (CdcQueries.multiTable(_, _)), // P1 + TableRef routing
    "cdc_decimal_ledger" -> (CdcQueries.decimalLedger(_, _)), // F3 + E2 decimal widen
    "cdc_json_bridge" -> (CdcQueries.jsonBridge(_, _)), // F6/F7 payload_json
    "transcript_assemble" -> (CdcQueries.transcriptAssemble(_, _)), // training-example fold
    // --- training-data pipeline ops ---
    "dedup_exact" -> (DataOps.dedupExact(_, _)),
    "dedup_minhash_sig" -> (DataOps.minhashSignatures(_, _)),
    "dedup_minhash_lsh_pairs" -> (DataOps.minhashLshPairs(_, _)),
    "dedup_ngram_jaccard" -> (DataOps.ngramJaccard(_, _)),
    "dedup_cluster" -> (DataOps.dedupCluster(_, _)),
    "dedup_keep_best" -> (DataOps.dedupKeepBest(_, _)),
    "dedup_simhash" -> (DataOps.simhash(_, _)),
    "dedup_embedding_neardup" -> (DataOps.embeddingNearDup(_, _)),
    "sim_dot_topk" -> (DataOps.dotTopK(_, _)),
    "sim_ann_ivf" -> (DataOps.annIvf(_, _)),
    "sim_knn_lsh" -> (DataOps.knnLsh(_, _)),
    "text_langid" -> (DataOps.langId(_, _)),
    "text_tokens" -> (DataOps.textTokens(_, _)),
    "text_quality" -> (DataOps.textQuality(_, _)),
    "text_fingerprint" -> (DataOps.textFingerprint(_, _)),
    "multimodal_meta" -> (DataOps.multimodalMeta(_, _)),
    "text_contamination" -> (DataOps.textContamination(_, _)),
    "text_pii_scrub" -> (DataOps.piiScrub(_, _)),
    "corpus_stats" -> (DataOps.corpusStats(_, _)),
    "data_split" -> (DataOps.dataSplit(_, _)),
    "corpus_curate" -> (DataOps.corpusCurate(_, _)),
    // --- general analytics (joins/aggs/windows on Catalyst built-ins) ---
    "q1_agg" -> (Analytics.q1Agg(_, _)),
    "q3_join" -> (Analytics.q3Join(_, _)),
    "q_window" -> (Analytics.userWindow(_, _)))

  /** DuckDB-equivalent SQL for EVERY query above — all constructions are
    * integer/md5-exact cross-engine (bit algebra, quantized dot products,
    * and the sign-LSH hyperplane matrix regenerate identically in DuckDB).
    */
  def oracleSql: Map[String, String] = Map(
    "cdc_envelope_convert" -> CdcQueries.envelopeConvertSql,
    "cdc_transport_dedup" -> CdcQueries.transportDedupSql,
    "cdc_lww_reduce" -> CdcQueries.lwwReduceSql,
    "cdc_final_state" -> CdcQueries.finalStateSql,
    "cdc_pipeline_e2e" -> CdcQueries.pipelineE2eSql,
    "cdc_schema_reconcile" -> CdcQueries.schemaReconcileSql,
    "cdc_lineage_stats" -> CdcQueries.lineageStatsSql,
    "cdc_snapshot_chunks" -> CdcQueries.snapshotChunksSql,
    "cdc_commit_boundaries" -> CdcQueries.commitBoundariesSql,
    "cdc_concurrent_backfill" -> CdcQueries.concurrentBackfillSql,
    "cdc_multi_table" -> CdcQueries.multiTableSql,
    "cdc_decimal_ledger" -> CdcQueries.decimalLedgerSql,
    "cdc_json_bridge" -> CdcQueries.jsonBridgeSql,
    "transcript_assemble" -> CdcQueries.transcriptAssembleSql,
    "dedup_exact" -> DataOps.dedupExactSql,
    "dedup_minhash_sig" -> DataOps.minhashSignaturesSql,
    "dedup_minhash_lsh_pairs" -> DataOps.minhashLshPairsSql,
    "dedup_ngram_jaccard" -> DataOps.ngramJaccardSql,
    "dedup_cluster" -> DataOps.dedupClusterSql,
    "dedup_keep_best" -> DataOps.dedupKeepBestSql,
    "dedup_simhash" -> DataOps.simhashSql,
    "dedup_embedding_neardup" -> DataOps.embeddingNearDupSql,
    "sim_dot_topk" -> DataOps.dotTopKSql,
    "sim_ann_ivf" -> DataOps.annIvfSql,
    "sim_knn_lsh" -> DataOps.knnLshSql,
    "text_langid" -> DataOps.langIdSql,
    "text_tokens" -> DataOps.textTokensSql,
    "text_quality" -> DataOps.textQualitySql,
    "text_fingerprint" -> DataOps.textFingerprintSql,
    "multimodal_meta" -> DataOps.multimodalMetaSql,
    "text_contamination" -> DataOps.textContaminationSql,
    "text_pii_scrub" -> DataOps.piiScrubSql,
    "corpus_stats" -> DataOps.corpusStatsSql,
    "data_split" -> DataOps.dataSplitSql,
    "corpus_curate" -> DataOps.corpusCurateSql,
    "q1_agg" -> Analytics.q1AggSql,
    "q3_join" -> Analytics.q3JoinSql,
    "q_window" -> Analytics.userWindowSql)
}
