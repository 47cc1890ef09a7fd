package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.logs.LogSuite
import graft.operators._

/** Driver contract — one named query per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline operator set), each paired with an
  * ANSI/DuckDB oracle twin in `oracleSql`.
  *
  * Oracle-parity rules applied throughout (SURVEY.md §5):
  *   - every aggregate/computed column aliased identically both sides;
  *   - DuckDB SUM(int) casts to BIGINT (HUGEINT otherwise);
  *   - fractional double sums go through exact DECIMAL(18,2) casts and
  *     back to DOUBLE (deterministic under any partitioning — see
  *     CorpusQueries scaladoc);
  *   - total-order ORDER BY on both sides;
  *   - hour kept a zero-padded string; session timezone UTC both sides.
  */
object SparkEntry {

  /** Flagship: the star-schema join, on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    CorpusQueries.q7StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- log engine (fixture-driven; sfDir unused) ----
    "log_stg" -> ((s, _) => LogSuite.stg(s)),
    "log_dim_client" -> ((s, _) => LogSuite.dimClient(s)),
    "log_dim_endpoint" -> ((s, _) => LogSuite.dimEndpoint(s)),
    "log_fct_hourly" -> ((s, _) => LogSuite.fctHourly(s)),
    "log_fct_hourly_approx" -> ((s, _) => LogSuite.fctHourlyApprox(s)),
    "log_errors_by_endpoint" -> ((s, _) => LogSuite.errorsByEndpoint(s)),
    "log_top_endpoints" -> ((s, _) => LogSuite.topEndpoints(s)),
    "log_available_dates" -> ((s, _) => LogSuite.availableDates(s)),
    "log_hourly_breakdown" -> ((s, _) => LogSuite.hourlyBreakdown(s)),
    "log_kpi_totals" -> ((s, _) => LogSuite.kpiTotals(s)),
    "log_per_hour_pivot" -> ((s, _) => LogSuite.perHourPivot(s)),
    "log_bench_errors" -> ((s, _) => LogSuite.benchErrors(s)),
    "log_graft_lake" -> ((s, _) => LogSuite.graftLake(s)),
    // ---- relational corpus ----
    "q1_lineitem_agg" -> (CorpusQueries.q1LineitemAgg _),
    "q2_filter_project" -> (CorpusQueries.q2FilterProject _),
    "q3_join_inner" -> (CorpusQueries.q3JoinInner _),
    "q4_join_left" -> (CorpusQueries.q4JoinLeft _),
    "q5_join_semi" -> (CorpusQueries.q5JoinSemi _),
    "q6_join_anti" -> (CorpusQueries.q6JoinAnti _),
    "q7_star_join" -> (CorpusQueries.q7StarJoin _),
    "q8_topk" -> (CorpusQueries.q8TopK _),
    "q9_window_rownum" -> (CorpusQueries.q9WindowRowNumber _),
    "q10_window_lag" -> (CorpusQueries.q10WindowLag _),
    "q11_window_running" -> (CorpusQueries.q11WindowRunning _),
    "q12_union" -> (CorpusQueries.q12Union _),
    "q13_intersect" -> (CorpusQueries.q13Intersect _),
    "q14_except" -> (CorpusQueries.q14Except _),
    "q15_rollup" -> (CorpusQueries.q15Rollup _),
    "q16_distinct_agg" -> (CorpusQueries.q16DistinctAgg _),
    "q17_events_json" -> (CorpusQueries.q17EventsJson _),
    "q18_events_hourly" -> (CorpusQueries.q18EventsHourly _),
    "q19_sessions" -> (CorpusQueries.q19Sessions _),
    "q20_grouping_sets" -> (CorpusQueries.q20GroupingSets _),
    "q21_cube" -> (CorpusQueries.q21Cube _),
    "q22_pivot" -> (CorpusQueries.q22Pivot _),
    "q24_topk_agg" -> (CorpusQueries.q24TopKAgg _),
    "q25_salted_join" -> (CorpusQueries.q25SaltedJoin _),
    "q26_scalar_subquery" -> (CorpusQueries.q26ScalarSubquery _),
    "q27_window_range" -> (CorpusQueries.q27WindowRange _),
    "q28_ntile" -> (CorpusQueries.q28Ntile _),
    "q29_correlated_subquery" -> (CorpusQueries.q29CorrelatedSubquery _),
    "q30_join_full" -> (CorpusQueries.q30JoinFull _),
    "q31_rank_family" -> (CorpusQueries.q31RankFamily _),
    "q41_window_family2" -> (CorpusQueries.q41WindowFamily2 _),
    "q42_string_agg" -> (CorpusQueries.q42StringAgg _),
    "q43_date_rollup" -> (CorpusQueries.q43DateRollup _),
    "q44_nullsafe_join" -> (CorpusQueries.q44NullsafeJoin _),
    "q32_bloom_join" -> (CorpusQueries.q32BloomJoin _),
    "q33_session_window" -> (CorpusQueries.q33SessionWindow _),
    "q34_anomaly" -> (CorpusQueries.q34Anomaly _),
    "q35_sql" -> (CorpusQueries.q35Sql _),
    "q45_lateral" -> (CorpusQueries.q45Lateral _),
    "q46_recursive_cte" -> (CorpusQueries.q46RecursiveCte _),
    "q36_sliding_window" -> (CorpusQueries.q36SlidingWindow _),
    "k1_skew_profile" -> (CorpusQueries.k1SkewProfile _),
    "dq1_ref_integrity" -> (CorpusQueries.dq1RefIntegrity _),
    "dq2_profile" -> (CorpusQueries.dq2Profile _),
    "q37_except_all" -> (CorpusQueries.q37ExceptAll _),
    "q38_string_ops" -> (CorpusQueries.q38StringOps _),
    "q39_null_semantics" -> (CorpusQueries.q39NullSemantics _),
    "q40_aqe_skew" -> (CorpusQueries.q40AqeSkew _),
    "u2_merge_upsert" -> (Merge.u2MergeUpsert _),
    "u3_time_travel" -> (graft.sources.Snapshots.u3TimeTravel _),
    "u4_file_skip" -> (graft.sources.Snapshots.u4FileSkip _),
    "u5_incremental" -> (graft.sources.Snapshots.u5Incremental _),
    "u6_zorder_skip" -> (graft.sources.Snapshots.u6ZorderSkip _),
    "u7_merge_snapshot" -> (graft.sources.Snapshots.u7MergeSnapshot _),
    "u8_shallow_clone" -> (graft.sources.Snapshots.u8ShallowClone _),
    "u9_delete_vectors" -> (graft.sources.Snapshots.u9DeleteVectors _),
    "u10_change_feed" -> (graft.sources.Snapshots.u10ChangeFeed _),
    "u11_merge_on_read" -> (graft.sources.Snapshots.u11MergeOnRead _),
    "u12_restore" -> (graft.sources.Snapshots.u12Restore _),
    "u13_cdc_apply" -> (graft.sources.Snapshots.u13CdcApply _),
    "u14_schema_evolution" -> (graft.sources.Snapshots.u14SchemaEvolution _),
    "u15_check_constraints" -> (graft.sources.Snapshots.u15CheckConstraints _),
    "u16_exactly_once" -> (graft.sources.Snapshots.u16ExactlyOnce _),
    "u17_compact_vacuum" -> (graft.sources.Snapshots.u17CompactVacuum _),
    "u18_concurrent_writers" -> (graft.sources.Snapshots.u18ConcurrentWriters _),
    "u19_incremental_deletes" -> (graft.sources.Snapshots.u19IncrementalDeletes _),
    "u20_update_where" -> (graft.sources.Snapshots.u20UpdateWhere _),
    "u21_bucketed_lookup" -> (graft.sources.Snapshots.u21BucketedLookup _),
    "u22_multi_table_txn" -> (graft.sources.Snapshots.u22MultiTableTxn _),
    "u23_fast_count" -> (graft.sources.Snapshots.u23FastCount _),
    "u24_bloom_lookup" -> (graft.sources.Snapshots.u24BloomLookup _),
    "u25_compact_small" -> (graft.sources.Snapshots.u25CompactSmall _),
    "u26_unique_append" -> (graft.sources.Snapshots.u26UniqueAppend _),
    "u27_materialized_view" -> (graft.sources.IncrementalViews.u27MaterializedView _),
    "u28_sql_datasource" -> (graft.sources.GraftSource.u28SqlDatasource _),
    "u29_metadata_count" -> (graft.sources.GraftSource.u29MetadataCount _),
    "u30_sql_insert" -> (graft.sources.GraftSource.u30SqlInsert _),
    "u31_sql_dml" -> (graft.plans.GraftSqlDml.u31SqlDml _),
    "u32_partitioned_table" -> (graft.sources.DemoFixtures.u32PartitionedTable _),
    "u33_partition_count" -> (graft.sources.DemoFixtures.u33PartitionCount _),
    "u34_catalog_table" -> (graft.sources.DemoFixtures.u34CatalogTable _),
    "u35_merge_full" -> (graft.plans.GraftSqlDml.u35MergeFull _),
    "u36_part_bucket" -> (graft.sources.DemoFixtures.u36PartBucket _),
    "u37_partition_evolution" ->
      (graft.sources.DemoFixtures.u37PartitionEvolution _),
    "u38_sql_maintenance" -> (graft.sources.DemoFixtures.u38SqlMaintenance _),
    "u39_broadcast_stats" -> (graft.sources.DemoFixtures.u39BroadcastStats _),
    "u40_sql_bucket_ddl" -> (graft.sources.DemoFixtures.u40SqlBucketDdl _),
    "u41_column_mapping" -> (graft.sources.DemoFixtures.u41ColumnMapping _),
    "u42_null_stats" -> (graft.sources.DemoFixtures.u42NullStats _),
    "u43_hidden_partitioning" ->
      (graft.sources.DemoFixtures.u43HiddenPartitioning _),
    "u44_hourly_layout" -> (graft.sources.DemoFixtures.u44HourlyLayout _),
    "u45_cbo_reorder" -> (graft.sources.DemoFixtures.u45CboReorder _),
    "u46_metadata_checkpoint" ->
      (graft.sources.DemoFixtures.u46MetadataCheckpoint _),
    "u47_ckpt_point_lookup" ->
      (graft.sources.DemoFixtures.u47CkptPointLookup _),
    "u48_histogram_skew" ->
      (graft.sources.DemoFixtures.u48HistogramSkew _),
    "u49_ckpt_composite_lookup" ->
      (graft.sources.DemoFixtures.u49CkptCompositeLookup _),
    "u50_ckpt_mixed_probe" ->
      (graft.sources.DemoFixtures.u50CkptMixedProbe _),
    "u51_bucket_join" ->
      (graft.sources.DemoFixtures.u51BucketJoin _),
    "u52_stat_repairs" ->
      (graft.sources.DemoFixtures.u52StatRepairs _),
    "u53_bucket_join_family" ->
      (graft.sources.DemoFixtures.u53BucketJoinFamily _),
    "u54_join_pruning" ->
      (graft.sources.DemoFixtures.u54JoinPruning _),
    "u55_bucket_agg" ->
      (graft.sources.DemoFixtures.u55BucketAgg _),
    "u56_cluster_tail" ->
      (graft.sources.DemoFixtures.u56ClusterTail _),
    "u57_sorted_layout" ->
      (graft.sources.DemoFixtures.u57SortedLayout _),
    "u58_join_agg" ->
      (graft.sources.DemoFixtures.u58JoinAgg _),
    "u59_latest_by_key" ->
      (graft.sources.DemoFixtures.u59LatestByKey _),
    "u60_aligned_asof" ->
      (graft.sources.DemoFixtures.u60AlignedAsof _),
    "u61_running_window" ->
      (graft.sources.DemoFixtures.u61RunningWindow _),
    "u62_forward_asof" ->
      (graft.sources.DemoFixtures.u62ForwardAsof _),
    "u63_windowed_asof" ->
      (graft.sources.DemoFixtures.u63WindowedAsof _),
    "u64_sql_aligned_join" ->
      (graft.sources.DemoFixtures.u64SqlAlignedJoin _),
    "u65_sql_aligned_agg" ->
      (graft.sources.DemoFixtures.u65SqlAlignedAgg _),
    "u66_sql_join_family" ->
      (graft.sources.DemoFixtures.u66SqlJoinFamily _),
    "u67_sql_join_agg" ->
      (graft.sources.DemoFixtures.u67SqlJoinAgg _),
    "u68_sql_join_residual" ->
      (graft.sources.DemoFixtures.u68SqlJoinResidual _),
    "u69_composite_agg" ->
      (graft.sources.DemoFixtures.u69CompositeAgg _),
    "u70_sql_full_outer" ->
      (graft.sources.DemoFixtures.u70SqlFullOuter _),
    "u71_sql_running" ->
      (graft.sources.DemoFixtures.u71SqlRunning _),
    "f1_funnel" -> (CorpusQueries.f1Funnel _),
    "f2_retention" -> (CorpusQueries.f2Retention _),
    "pipe1_manifest" -> (Pipeline.trainingManifest _),
    "pipe2_multimodal" -> (Pipeline.multimodalManifest _),
    "h1_histogram" -> (CorpusQueries.h1Histogram _),
    "u1_scd2" -> ((s, d) => History.scd2History(s, d)),
    "g1_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "z1_zvalue" -> (Layout.zValueQuery _),
    "e1_props_struct" -> (CorpusQueries.e1PropsStruct _),
    // ---- temporal joins ----
    "a1_asof_join" -> (TemporalJoins.asofPurchaseClick _),
    "a2_range_join" -> (TemporalJoins.rangeJoinFollowups _),
    // ---- deterministic sampling / splits ----
    "p1_split_assign" -> (Sampling.splitAssign _),
    "p2_stratified_sample" -> ((s, d) => Sampling.stratifiedSample(s, d)),
    "p3_reservoir" -> ((s, d) => Sampling.reservoirSample(s, d)),
    "p4_packing" -> ((s, d) => Sampling.packSequences(s, d)),
    "p5_mixture" -> (Sampling.mixtureSample _),
    // ---- LLM-pipeline: dedup ----
    "d1_dedup_exact" -> (Dedup.exactDedup _),
    "d9_incremental_dedup" -> ((s, d) => Dedup.d9IncrementalDedup(s, d)),
    "d10_incremental_lsh" -> ((s, d) => Dedup.d10IncrementalLsh(s, d)),
    "d2_dedup_hash" -> (Dedup.hashDedup _),
    "d3_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(s, d)),
    "d4_simhash" -> (Dedup.simhash _),
    "d5_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(s, d)),
    "d6_dedup_clusters" -> ((s, d) => Dedup.dedupClusters(s, d)),
    "d11_canonical_docs" -> ((s, d) => Dedup.d11CanonicalDocs(s, d)),
    "c1_contamination" -> ((s, d) => Dedup.crossSplitContamination(s, d)),
    "d7_simhash_neardup" -> ((s, d) => Dedup.simhashNearDup(s, d)),
    "c2_benchmark_decontam" -> ((s, d) => Dedup.benchmarkDecontam(s, d)),
    "d8_dup_passages" -> ((s, d) => Dedup.dupPassages(s, d)),
    // ---- LLM-pipeline: text analysis ----
    "t1_token_counts" -> (TextAnalysis.tokenCounts _),
    "t2_quality_score" -> (TextAnalysis.qualityScore _),
    "t16_quality_model" -> (TextAnalysis.qualityModel _),
    "t3_lang_id" -> (TextAnalysis.langId _),
    "t4_fingerprint" -> (TextAnalysis.fingerprint _),
    "t5_repetition" -> (TextAnalysis.repetition _),
    "t6_vocab" -> ((s, d) => TextAnalysis.vocab(s, d)),
    "t7_chunking" -> ((s, d) => TextAnalysis.chunk(s, d)),
    "t8_length_stats" -> (TextAnalysis.lengthStats _),
    "t9_tfidf" -> ((s, d) => TextAnalysis.tfidf(s, d)),
    "t15_bm25" -> ((s, d) => TextAnalysis.t15Bm25(s, d)),
    "t10_pii_redact" -> (TextAnalysis.piiRedact _),
    "t11_quality_filter" -> (TextAnalysis.qualityFilter _),
    "t12_bigrams" -> ((s, d) => TextAnalysis.bigrams(s, d)),
    "t13_bigram_hitrate" -> ((s, d) => TextAnalysis.bigramHitRate(s, d)),
    "t14_token_freq" -> ((s, d) => TextAnalysis.tokenFreqScore(s, d)),
    // ---- LLM-pipeline: similarity search ----
    "s1_knn_brute" -> ((s, d) => Similarity.knnBrute(s, d)),
    "s2_knn_bucketed" -> ((s, d) => Similarity.knnBucketed(s, d)),
    "s3_label_centroids" -> (Similarity.labelCentroids _),
    "s4_embed_neardup" -> ((s, d) => Similarity.embedNearDup(s, d)),
    "sd1_semantic_dedup" -> ((s, d) => Similarity.semanticDedup(s, d)),
    "sd2_incremental_semantic" -> ((s, d) => Similarity.sd2IncrementalSemanticDedup(s, d)),
    "s5_knn_ivf" -> ((s, d) => Similarity.knnIvf(s, d)),
    "s9_incremental_ivf" -> ((s, d) => Similarity.s9IncrementalIvf(s, d)),
    "s6_quantize" -> (Similarity.quantizeEmbeddings _),
    "s7_knn_pq" -> ((s, d) => Similarity.knnPq(s, d)),
    "s8_knn_hybrid" -> ((s, d) => Similarity.knnHybrid(s, d)),
    "s10_ann_recall" -> ((s, d) => Similarity.annRecall(s, d)),
    // ---- multimodal plumbing ----
    "m1_media_features" -> (Multimodal.mediaFeaturesSql _),
    "m2_frame_sample" -> ((s, d) => Multimodal.sampleFrames(s, d)),
    "m3_resize" -> ((s, d) => Multimodal.resizeSpecSql(s, d)),
    "m4_batch_pack" -> ((s, d) => Multimodal.m4BatchPack(s, d)),
    // ---- sketches ----
    // x1: the raw HLL estimate is engine-specific, so the compared
    // output carries a bounded-error witness (estimate within 5·rsd of
    // the exact count, emitted as a deterministic int the oracle CAN
    // verify) next to the exact count. x1a is the exact-only companion.
    "x1_approx_distinct" -> (CorpusQueries.qxApproxDistinct _),
    "x1a_distinct_exact" -> (CorpusQueries.qx1aDistinctExact _),
    "x2_sketch_rollup" -> (CorpusQueries.x2SketchRollup _),
    "x3_quantile_sketch" -> (CorpusQueries.x3QuantileSketch _),
    "x4_heavy_hitters" -> (CorpusQueries.x4HeavyHitters _)
  )

  // ---------------------------------------------------------------- oracles

  /** Shared oracle CTE: the 7-line fixture as parsed records, with the
    * stg/fct derivations recomputed in DuckDB SQL exactly as the
    * reference's stg_logs.sql / fct_requests_hourly.sql do — a true
    * semantic cross-check of the Spark lineage (values are NOT
    * hand-derived; only the parse output is inlined).
    */
  private val logCte: String =
    """WITH raw(client_ip, ts, request_path, status, bytes_sent, user_agent) AS (VALUES
      | ('127.0.0.1',   TIMESTAMP '2025-11-10 10:21:34', '/api/v1/items?id=42', 200, CAST(1234 AS BIGINT), 'Mozilla/5.0'),
      | ('127.0.0.1',   TIMESTAMP '2025-11-10 10:22:01', '/api/v1/items?id=42', 304, CAST(0 AS BIGINT),    'Mozilla/5.0'),
      | ('127.0.0.1',   TIMESTAMP '2025-11-10 11:01:12', '/auth/login',         401, CAST(512 AS BIGINT),  'Mozilla/5.0'),
      | ('192.168.1.9', TIMESTAMP '2025-11-10 11:17:45', '/health',             200, CAST(8 AS BIGINT),    'curl/8.1.2'),
      | ('192.168.1.9', TIMESTAMP '2025-11-10 12:05:55', '/api/v1/items?id=77', 500, CAST(256 AS BIGINT),  'curl/8.1.2'),
      | ('127.0.0.1',   TIMESTAMP '2025-11-11 10:01:01', '/api/v1/items?id=88', 200, CAST(777 AS BIGINT),  'Mozilla/5.0'),
      | ('127.0.0.1',   TIMESTAMP '2025-11-11 12:59:59', '/health',             503, CAST(16 AS BIGINT),   'curl/8.1.2')
      |), stg AS (
      | SELECT ts, status, bytes_sent,
      |        split_part(request_path, '?', 1) AS endpoint,
      |        client_ip, user_agent,
      |        CAST(ts AS DATE) AS date,
      |        strftime(ts, '%H') AS hour,
      |        CASE WHEN status >= 400 THEN 1 ELSE 0 END AS is_error
      | FROM raw
      |), fct AS (
      | SELECT date, hour, endpoint,
      |        COUNT(*) AS requests,
      |        CAST(SUM(is_error) AS BIGINT) AS errors,
      |        percentile_cont(0.95) WITHIN GROUP (ORDER BY bytes_sent) AS p95_bytes
      | FROM stg GROUP BY date, hour, endpoint
      |)""".stripMargin

  /** Exact-decimal revenue term (see CorpusQueries.revenueTerm). */
  private val rev =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** d3 oracle CTE prefix: mirrors Dedup.hashedShingles/minhashSigs —
    * one md5 per bigram shingle, 60-bit halves as BIGINT, 12 affine
    * signatures — ending in a `pairs(d1, d2, jaccard)` CTE of verified
    * near-dup pairs. Shared by d3 and the d6 clustering oracle.
    */
  private val d3PairsCte: String = {
    val sigs = (0 until 12)
      .map(i => s"MIN((sh % 1000000007 + $i * hb) % 1000000007) AS s$i")
      .mkString(",\n    ")
    val bands = (0 until 4)
      .map { b =>
        val key = (0 until 3).map(r => s"CAST(s${b * 3 + r} AS VARCHAR)")
          .mkString(" || '|' || ")
        if (b == 0) s"SELECT doc_id, 0 AS band, md5($key) AS key FROM sig"
        else s"UNION ALL SELECT doc_id, $b, md5($key) FROM sig"
      }
      .mkString("\n  ")
    s"""WITH RECURSIVE tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh0 AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))) AS shs
  FROM tok),
sh AS (
  SELECT doc_id,
         ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sh,
         ('0x' || substr(md5(shs), 16, 15))::BIGINT % 1000000007 + 1 AS hb
  FROM sh0),
sig AS (
  SELECT doc_id,
    $sigs
  FROM sh GROUP BY doc_id),
bands AS (
  $bands),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT d1, d2, COUNT(*) AS c
  FROM cand
  JOIN sh p1 ON p1.doc_id = d1
  JOIN sh p2 ON p2.doc_id = d2 AND p1.sh = p2.sh
  GROUP BY d1, d2),
pairs AS (
  SELECT d1, d2, c / (z1.n_sh + z2.n_sh - c) AS jaccard
  FROM common JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
  WHERE c / (z1.n_sh + z2.n_sh - c) >= 0.8)"""
  }

  private val d3Sql: String =
    s"$d3PairsCte SELECT d1, d2, jaccard FROM pairs ORDER BY d1, d2"

  /** d6 oracle: connected components of the verified near-dup pair
    * graph via recursive label propagation (transitive closure is fine
    * at oracle scale; the Spark operator iterates min-label frontier
    * joins instead).
    */
  /** Shared d6/d11 prefix: near-dup pairs → connected components as a
    * `comp(id, cluster)` relation (recursive label walk).
    */
  private val d6CompCte: String =
    s"""$d3PairsCte,
edges AS (
  SELECT d1 AS a, d2 AS b FROM pairs
  UNION SELECT d2, d1 FROM pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
walk(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.a, w.label FROM edges e JOIN walk w ON e.b = w.id),
comp AS (SELECT id, MIN(label) AS cluster FROM walk GROUP BY id)"""

  private val d6Sql: String =
    s"""$d6CompCte
SELECT cluster, COUNT(*) AS n_members, CAST(SUM(id) AS BIGINT) AS member_id_sum
FROM comp GROUP BY cluster ORDER BY cluster"""

  /** d11 oracle: d6's components + t2's quality formula → one keeper
    * per cluster (max rounded quality, doc_id tie-break); docs outside
    * the near-dup graph are their own singleton cluster.
    */
  private val d11Sql: String =
    s"""$d6CompCte,
qual AS (
  SELECT doc_id,
    0.5 * (len(list_distinct(w)) / len(w))
      + 0.3 * (1.0 - len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is'], t))) / len(w))
      + 0.2 * least((length(text) - (len(w) - 1)) / len(w) / 8.0, 1.0) AS quality
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) t),
j AS (
  SELECT q.doc_id, COALESCE(comp.cluster, q.doc_id) AS cluster, q.quality
  FROM qual q LEFT JOIN comp ON q.doc_id = comp.id)
SELECT doc_id, cluster, quality,
  CAST(CASE WHEN ROW_NUMBER() OVER (
    PARTITION BY cluster ORDER BY quality DESC, doc_id) = 1
    THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM j ORDER BY doc_id"""

  /** Split-bucket expression shared by the p1 and c1 oracles — the
    * DuckDB twin of Sampling.bucketCol, defined ONCE so the split rule
    * cannot diverge between split assignment and contamination
    * detection (mirrors the Scala side, where crossSplitContamination
    * reuses Sampling.splitCol).
    */
  private val splitBucketSql: String =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT % 100"

  private def splitCaseSql(bucket: String): String =
    s"CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END"

  /** c1 oracle: near-dup pairs that CROSS train/val/test boundaries —
    * the contamination a hash-split pipeline must surface before
    * training (same split derivation as p1_split_assign).
    */
  private val c1Sql: String =
    s"""$d3PairsCte,
spl AS (
  SELECT doc_id, ${splitCaseSql(splitBucketSql)} AS split
  FROM documents)
SELECT d1, d2, s1.split AS split1, s2.split AS split2, jaccard
FROM pairs JOIN spl s1 ON d1 = s1.doc_id JOIN spl s2 ON d2 = s2.doc_id
WHERE s1.split <> s2.split
ORDER BY d1, d2"""

  /** c2 oracle: exact 5-gram shingle overlap between the train split
    * and the held-out test split — same split derivation as p1/c1,
    * same shingle tokenization+hash as d5, eval-side hot-shingle cap
    * (df > 100) mirrored from the Spark operator.
    */
  private val c2Sql: String =
    s"""WITH docs AS (
  SELECT doc_id, text, ${splitCaseSql(splitBucketSql)} AS split FROM documents),
tok AS (
  SELECT doc_id, split, string_split(text, ' ') AS w
  FROM docs WHERE split IN ('train', 'test')),
sh0 AS (
  SELECT doc_id, split,
    unnest(list_distinct(list_transform(range(1, len(w) - 3), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS shs
  FROM tok),
sh AS (
  SELECT doc_id, split, ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sh FROM sh0),
tr AS (SELECT doc_id, sh FROM sh WHERE split = 'train'),
ev AS (SELECT doc_id AS eval_id, sh FROM sh WHERE split = 'test'),
hot AS (SELECT sh FROM ev GROUP BY sh HAVING COUNT(*) > 100),
evk AS (SELECT e.eval_id, e.sh FROM ev e ANTI JOIN hot h ON e.sh = h.sh),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tr GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, COUNT(DISTINCT t.sh) AS n_overlap,
    COUNT(DISTINCT e.eval_id) AS n_eval_docs
  FROM tr t JOIN evk e ON t.sh = e.sh GROUP BY t.doc_id)
SELECT h.doc_id, s.n_sh, h.n_overlap, h.n_eval_docs,
  h.n_overlap / CAST(s.n_sh AS DOUBLE) AS overlap_ratio
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
WHERE h.n_overlap >= 1
ORDER BY h.doc_id"""

  /** Simhash-signature CTE generator: mirrors Dedup.simhashSigs —
    * width (= 4·hexChars) conditional-sum vote columns in one grouped
    * aggregation, then the bit recombination. Ends with a
    * `sig(doc_id, simhash)` relation so d4 (32-bit projection) and d7
    * (60-bit Hamming-LSH near-dup) derive from one generator.
    */
  private def simhashSigCte(hexChars: Int): String = {
    val width = hexChars * 4
    val votes = (0 until width)
      .map(b => s"SUM(CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS s_$b")
      .mkString(",\n    ")
    val bits = (0 until width)
      .map(b => s"(CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" +\n    ")
    s"""WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents),
h AS (
  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, $hexChars)) AS BIGINT) AS h FROM tok),
v AS (
  SELECT doc_id,
    $votes
  FROM h GROUP BY doc_id),
sig AS (
  SELECT doc_id,
    CAST($bits AS BIGINT) AS simhash
  FROM v)"""
  }

  private val d4Sql: String =
    s"${simhashSigCte(8)} SELECT doc_id, simhash FROM sig ORDER BY doc_id"

  /** d7 oracle: four 15-bit bands per 60-bit signature, hot band
    * buckets (>2048 docs) dropped, candidate pairs share a surviving
    * band value, popcount(xor) ≤ 3 verify, per-document neighbor
    * profile — mirrors Dedup.simhashNearDup (including the
    * integer-encoded argmin for the nearest neighbor).
    */
  private val d7Sql: String =
    s"""${simhashSigCte(15)},
allbands AS (
  SELECT doc_id, simhash, band, (simhash >> (15 * band)) % 32768 AS v
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
hot AS (
  SELECT band, v FROM allbands GROUP BY band, v HAVING COUNT(*) > 2048),
bands AS (
  SELECT b.doc_id, b.simhash, b.band, b.v
  FROM allbands b ANTI JOIN hot h ON b.band = h.band AND b.v = h.v),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
    a.simhash AS h1, b.simhash AS h2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
pairs AS (
  SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS BIGINT) AS hamming
  FROM cand WHERE bit_count(xor(h1, h2)) <= 3),
sym AS (
  SELECT d1 AS doc_id, d2 AS nbr, hamming FROM pairs
  UNION ALL
  SELECT d2 AS doc_id, d1 AS nbr, hamming FROM pairs)
SELECT doc_id, COUNT(*) AS n_near,
  CAST(MIN(hamming * 1000000000000 + nbr) % 1000000000000 AS BIGINT) AS nn_id,
  CAST(MIN(hamming * 1000000000000 + nbr) // 1000000000000 AS INTEGER) AS nn_hamming
FROM sym GROUP BY doc_id ORDER BY doc_id"""

  /** p5 oracle weights VALUES list — generated from Sampling.MixtureRates
    * so the Spark operator and the oracle can never disagree on the mix.
    */
  private val mixtureValuesSql: String =
    graft.operators.Sampling.MixtureRates
      .map { case (src, r) => s"('$src', $r)" }
      .mkString(", ")

  /** s1/s2/s5 oracle SQL as named vals: each is its own entry AND a
    * component of the s10 recall oracle — one definition, so the
    * ground truth and the probes the recall metric grades can never
    * drift from the queries they grade.
    */
  private val s1Sql: String =
    """WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS c FROM embeddings WHERE vec_id >= 8),
      |p AS (
      |  SELECT q_id, c_id,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q)+1), i -> q[i] * c[i])), (a, b) -> a + b) AS dqc,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q)+1), i -> q[i] * q[i])), (a, b) -> a + b) AS dqq,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(c)+1), i -> c[i] * c[i])), (a, b) -> a + b) AS dcc
      |  FROM q, c),
      |r AS (SELECT q_id, c_id, ROUND(dqc / (sqrt(dqq) * sqrt(dcc)), 6) AS cos6 FROM p),
      |rk AS (SELECT q_id, c_id, cos6,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos6 DESC, c_id) AS INTEGER) AS rank FROM r)
      |SELECT q_id, rank, c_id, cos6 FROM rk WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  private val s2Sql: String =
    """WITH b AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
      |    (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
      |    (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
      |    (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, v AS q, bucket FROM b WHERE vec_id < 8),
      |c AS (SELECT vec_id AS c_id, v AS c, bucket FROM b WHERE vec_id >= 8),
      |p AS (
      |  SELECT q_id, c_id, q.bucket,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * c.c[i])), (a, x) -> a + x) AS dqc,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * q.q[i])), (a, x) -> a + x) AS dqq,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(c.c)+1), i -> c.c[i] * c.c[i])), (a, x) -> a + x) AS dcc
      |  FROM q JOIN c ON q.bucket = c.bucket),
      |r AS (SELECT q_id, c_id, bucket, ROUND(dqc / (sqrt(dqq) * sqrt(dcc)), 6) AS cos6 FROM p),
      |rk AS (SELECT q_id, c_id, bucket, cos6,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos6 DESC, c_id) AS INTEGER) AS rank FROM r)
      |SELECT q_id, rank, c_id, cos6, bucket FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  private val s5Sql: String =
    """WITH tall AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |lab AS (SELECT vec_id, label FROM embeddings),
      |cent AS (
      |  SELECT label AS c_label, pos,
      |         CAST(CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_mean
      |  FROM tall JOIN lab USING (vec_id)
      |  GROUP BY label, pos),
      |scores AS (
      |  SELECT vec_id, c_label,
      |         CAST(SUM(CAST(ROUND(x * c_mean * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score
      |  FROM tall JOIN cent USING (pos)
      |  GROUP BY vec_id, c_label),
      |cells AS (
      |  SELECT vec_id, c_label AS cell
      |  FROM scores
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) = 1),
      |vecs AS (
      |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, cells.cell
      |  FROM embeddings e JOIN cells ON e.vec_id = cells.vec_id),
      |q AS (SELECT vec_id AS q_id, v AS q, cell FROM vecs WHERE vec_id < 8),
      |c AS (SELECT vec_id AS c_id, v AS c, cell FROM vecs WHERE vec_id >= 8),
      |p AS (
      |  SELECT q_id, c_id, q.cell,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * c.c[i])), (s, x) -> s + x) AS dqc,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * q.q[i])), (s, x) -> s + x) AS dqq,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(c.c)+1), i -> c.c[i] * c.c[i])), (s, x) -> s + x) AS dcc
      |  FROM q JOIN c ON q.cell = c.cell),
      |r AS (SELECT q_id, c_id, cell, ROUND(dqc / (sqrt(dqq) * sqrt(dcc)), 6) AS cos6 FROM p),
      |rk AS (SELECT q_id, c_id, cell, cos6,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos6 DESC, c_id) AS INTEGER) AS rank FROM r)
      |SELECT q_id, rank, c_id, cos6, cell FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  private val s8Sql: String =
    """WITH b AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
      |    (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
      |    (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
      |    (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
      |  FROM embeddings),
      |tall AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |lab AS (SELECT vec_id, label FROM embeddings),
      |cent AS (
      |  SELECT label AS c_label, pos,
      |         CAST(CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_mean
      |  FROM tall JOIN lab USING (vec_id)
      |  GROUP BY label, pos),
      |scores AS (
      |  SELECT vec_id, c_label,
      |         CAST(SUM(CAST(ROUND(x * c_mean * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score
      |  FROM tall JOIN cent USING (pos)
      |  GROUP BY vec_id, c_label),
      |cells AS (
      |  SELECT vec_id, c_label AS cell
      |  FROM scores
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) = 1),
      |ids AS (SELECT b.vec_id, b.v, b.bucket, cells.cell
      |        FROM b JOIN cells ON b.vec_id = cells.vec_id),
      |q AS (SELECT vec_id AS q_id, v AS q, bucket AS q_bucket, cell AS q_cell
      |      FROM ids WHERE vec_id < 8),
      |c AS (SELECT vec_id AS c_id, v AS c, bucket, cell FROM ids WHERE vec_id >= 8),
      |cand AS (
      |  SELECT q_id, c_id FROM q JOIN c ON q.q_bucket = c.bucket
      |  UNION
      |  SELECT q_id, c_id FROM q JOIN c ON q.q_cell = c.cell),
      |p AS (
      |  SELECT cand.q_id, cand.c_id,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * c.c[i])), (s, x) -> s + x) AS dqc,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * q.q[i])), (s, x) -> s + x) AS dqq,
      |    list_reduce(list_prepend(0.0, list_transform(range(1, len(c.c)+1), i -> c.c[i] * c.c[i])), (s, x) -> s + x) AS dcc
      |  FROM cand JOIN q USING (q_id) JOIN c USING (c_id)),
      |r AS (SELECT q_id, c_id, ROUND(dqc / (sqrt(dqq) * sqrt(dcc)), 6) AS cos6 FROM p),
      |rk AS (SELECT q_id, c_id, cos6,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos6 DESC, c_id) AS INTEGER) AS rank FROM r)
      |SELECT q_id, rank, c_id, cos6 FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  private val s7Sql: String =
    """WITH tall AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |cw AS (
      |  SELECT CAST(vec_id AS INTEGER) AS c_code, pos, x AS c_val
      |  FROM tall WHERE vec_id >= 8 AND vec_id < 72),
      |dist AS (
      |  SELECT t.vec_id AS c_id, CAST(c.pos // 4 AS INTEGER) AS sub, c.c_code,
      |    CAST(SUM(CAST(ROUND((x - c_val) * 1000000.0) AS BIGINT)
      |           * CAST(ROUND((x - c_val) * 1000000.0) AS BIGINT)) AS BIGINT) AS dist
      |  FROM tall t JOIN cw c USING (pos)
      |  WHERE t.vec_id >= 8
      |  GROUP BY 1, 2, 3),
      |codes AS (
      |  SELECT c_id, sub,
      |    CAST(MIN(dist * 1024 + c_code) % 1024 AS INTEGER) AS code
      |  FROM dist GROUP BY c_id, sub),
      |nsq AS (
      |  SELECT CAST(pos // 4 AS INTEGER) AS sub, c_code AS n_code,
      |    CAST(SUM(CAST(ROUND(c_val * 1000000.0) AS BIGINT)
      |           * CAST(ROUND(c_val * 1000000.0) AS BIGINT)) AS BIGINT) AS cw_nsq
      |  FROM cw GROUP BY 1, 2),
      |recon AS (
      |  SELECT c_id, CAST(SUM(cw_nsq) AS BIGINT) AS recon_nsq
      |  FROM codes k JOIN nsq n ON k.sub = n.sub AND k.code = n.n_code
      |  GROUP BY c_id),
      |lut AS (
      |  SELECT t.vec_id AS q_id, CAST(c.pos // 4 AS INTEGER) AS q_sub, c.c_code,
      |    CAST(SUM(CAST(ROUND(x * c_val * 1000000000000.0) AS BIGINT)) AS BIGINT) AS pdot
      |  FROM tall t JOIN cw c USING (pos)
      |  WHERE t.vec_id < 8
      |  GROUP BY 1, 2, 3),
      |sc AS (
      |  SELECT l.q_id, k.c_id, CAST(SUM(l.pdot) AS BIGINT) AS adc
      |  FROM codes k JOIN lut l ON k.sub = l.q_sub AND k.code = l.c_code
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT q_id, s.c_id,
      |    ROUND(adc / (1000000.0 * sqrt(CAST(GREATEST(recon_nsq, 1) AS DOUBLE))), 6) AS score6
      |  FROM sc s JOIN recon r ON s.c_id = r.c_id),
      |rk AS (
      |  SELECT q_id, c_id, score6,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score6 DESC, c_id) AS INTEGER) AS rank
      |  FROM scored)
      |SELECT q_id, rank, c_id, score6 FROM rk WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin

  /** s10 oracle: recall@3 of the s2/s5/s7/s8 probes against s1's exact
    * top-3, composed from the component oracles VERBATIM (each runs as
    * a derived table) — the metric's ground truth is by construction
    * the same SQL the component queries are graded against.
    */
  private val s10Sql: String =
    s"""WITH truth AS (SELECT q_id, c_id FROM ($s1Sql) t1 WHERE rank <= 3),
       |methods AS (SELECT UNNEST(['bucketed', 'hybrid', 'ivf', 'pq']) AS method),
       |ab AS (SELECT 'bucketed' AS method, q_id, c_id FROM ($s2Sql) t2),
       |av AS (SELECT 'ivf' AS method, q_id, c_id FROM ($s5Sql) t5),
       |ah AS (SELECT 'hybrid' AS method, q_id, c_id FROM ($s8Sql) t8),
       |ap AS (SELECT 'pq' AS method, q_id, c_id FROM ($s7Sql) t7),
       |hits AS (
       |  SELECT method, q_id, COUNT(*) AS hits
       |  FROM (SELECT * FROM ab UNION ALL SELECT * FROM av UNION ALL SELECT * FROM ah UNION ALL SELECT * FROM ap) a
       |  JOIN truth USING (q_id, c_id)
       |  GROUP BY method, q_id),
       |scaffold AS (
       |  SELECT method, q_id
       |  FROM methods CROSS JOIN (SELECT DISTINCT q_id FROM truth) qs)
       |SELECT method, q_id,
       |  COALESCE(hits, 0) AS hits,
       |  ROUND(COALESCE(hits, 0) / 3.0, 6) AS recall
       |FROM scaffold LEFT JOIN hits USING (method, q_id)
       |ORDER BY method, q_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "log_stg" ->
      s"""$logCte SELECT ts, status, bytes_sent, endpoint, client_ip, user_agent, date, hour, is_error
         |FROM stg ORDER BY ts, endpoint""".stripMargin,
    "log_dim_client" ->
      s"""$logCte SELECT DISTINCT client_ip AS client_id, user_agent FROM stg
         |ORDER BY client_id, user_agent""".stripMargin,
    "log_dim_endpoint" ->
      s"$logCte SELECT DISTINCT endpoint FROM stg ORDER BY endpoint",
    "log_fct_hourly" ->
      s"""$logCte SELECT date, hour, endpoint, requests, errors, ROUND(p95_bytes, 4) AS p95_bytes
         |FROM fct ORDER BY date, hour, endpoint""".stripMargin,
    // the approx fact's oracle pins the error-bound verdict to 1 (the
    // sketch's answer is engine-specific; its exact twin p95_bytes and
    // the in-[p90, max] verdict are not)
    "log_fct_hourly_approx" ->
      s"""$logCte SELECT date, hour, endpoint, requests, errors, ROUND(p95_bytes, 4) AS p95_bytes,
         |  1 AS p95_approx_ok
         |FROM fct ORDER BY date, hour, endpoint""".stripMargin,
    "log_errors_by_endpoint" ->
      s"""$logCte SELECT endpoint, CAST(SUM(errors) AS BIGINT) AS errors, CAST(SUM(requests) AS BIGINT) AS requests
         |FROM fct WHERE date = DATE '2025-11-10' GROUP BY endpoint
         |ORDER BY errors DESC, requests DESC, endpoint""".stripMargin,
    "log_top_endpoints" ->
      s"""$logCte SELECT endpoint, CAST(SUM(requests) AS BIGINT) AS requests, CAST(SUM(errors) AS BIGINT) AS errors
         |FROM fct WHERE date = DATE '2025-11-10' GROUP BY endpoint
         |ORDER BY requests DESC, errors DESC, endpoint LIMIT 3""".stripMargin,
    "log_available_dates" ->
      s"$logCte SELECT DISTINCT date FROM fct ORDER BY date",
    "log_hourly_breakdown" ->
      s"""$logCte SELECT date, hour, endpoint, requests, errors, ROUND(p95_bytes, 4) AS p95_bytes
         |FROM fct WHERE date = DATE '2025-11-10' ORDER BY hour, endpoint""".stripMargin,
    "log_kpi_totals" ->
      s"""$logCte SELECT total_requests, total_errors,
         |  CASE WHEN total_requests > 0 THEN total_errors / total_requests * 100.0 ELSE 0.0 END AS error_rate_pct
         |FROM (SELECT CAST(SUM(requests) AS BIGINT) AS total_requests, CAST(SUM(errors) AS BIGINT) AS total_errors
         |      FROM fct WHERE date = DATE '2025-11-10')""".stripMargin,
    "log_per_hour_pivot" ->
      s"""$logCte SELECT hour, CAST(SUM(errors) AS BIGINT) AS errors, CAST(SUM(requests) AS BIGINT) AS requests
         |FROM fct WHERE date = DATE '2025-11-10' GROUP BY hour ORDER BY hour""".stripMargin,
    // log_graft_lake oracle: the one-day error rollup replayed
    // relationally from the same literal log; only_matching_dirs = 1
    // pins that the partition-pruned scan touched only the day's dir
    "log_graft_lake" ->
      s"""$logCte SELECT endpoint, COUNT(*) AS errors,
         |  CAST(SUM(bytes_sent) AS BIGINT) AS error_bytes,
         |  1 AS only_matching_dirs
         |FROM stg WHERE date = DATE '2025-11-10' AND is_error = 1
         |GROUP BY endpoint ORDER BY endpoint""".stripMargin,
    "log_bench_errors" ->
      s"""$logCte SELECT endpoint, CAST(SUM(errors) AS BIGINT) AS errors
         |FROM fct WHERE date = DATE '2025-11-10' GROUP BY endpoint
         |ORDER BY errors DESC, endpoint""".stripMargin,

    "q1_lineitem_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
         |  CAST(SUM($rev) AS DOUBLE) AS sum_disc,
         |  SUM(l_quantity) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // x2 oracle: the exact columns and the invariants' claimed value
    // (the estimates themselves never appear in the output — x1's
    // engine-specific caveat; the invariant COMPUTATION is in-engine)
    "x2_sketch_rollup" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |daily AS (SELECT day, COUNT(DISTINCT user_id) AS exact_users FROM ev GROUP BY day),
        |fs AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id),
        |nn AS (SELECT day, COUNT(*) AS n_new FROM fs GROUP BY day),
        |cum AS (
        |  SELECT d.day, d.exact_users,
        |    SUM(COALESCE(nn.n_new, 0)) OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS cum_exact_users
        |  FROM daily d LEFT JOIN nn ON d.day = nn.day)
        |SELECT 'day:' || CAST(day AS VARCHAR) AS scope, exact_users,
        |  CAST(cum_exact_users AS BIGINT) AS cum_exact_users, 1 AS sketch_consistent
        |FROM cum
        |UNION ALL
        |SELECT 'total', COUNT(DISTINCT user_id), COUNT(DISTINCT user_id), 1 FROM ev
        |ORDER BY scope""".stripMargin,
    // u28 oracle: both serving paths replayed — latest = initial +
    // rekeyed late batch minus the DV-deleted 'F' rows (served through
    // the SQL temp view over format("graft")), v0 = the initial load
    // (served through the versionAsOf reader option)
    "u28_sql_datasource" ->
      """WITH late AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 3),
        |allr AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM late)
        |SELECT 'latest' AS scope, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM allr WHERE o_orderstatus <> 'F' GROUP BY 2
        |UNION ALL
        |SELECT 'v0', o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders GROUP BY 2
        |ORDER BY scope, o_orderstatus""".stripMargin,
    // u29 oracle: the three counts recomputed from the raw table —
    // total and total_v0 are ledger-served in Spark (the optimizer
    // rule; zero file reads, plan shape pinned by the spec), filtered
    // takes the scan path; all three must equal the replay
    "u29_metadata_count" ->
      """WITH allr AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000, o_orderstatus
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |vis AS (SELECT * FROM allr WHERE o_orderkey % 11 <> 0)
        |SELECT 'filtered' AS scope, COUNT(*) AS n FROM vis
        |WHERE o_orderstatus = 'O'
        |UNION ALL SELECT 'total', COUNT(*) FROM vis
        |UNION ALL SELECT 'total_v0', COUNT(*) FROM orders
        |ORDER BY scope""".stripMargin,
    // u30 oracle: the SQL INSERT replayed relationally — the grown
    // table = orders + the rekeyed %10=3 slice at +5 price
    "u30_sql_insert" ->
      """WITH allr AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice + 5
        |  FROM orders WHERE o_orderkey % 10 = 3)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM allr GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u31 oracle: the pure-SQL DML lifecycle replayed relationally —
    // DELETE of the %10=4 tenth, UPDATE +100 on the %10=6 tenth, then
    // one CDC MERGE (U doubles %20=1 prices, D drops %20=2, I re-keys
    // %20=3 high with literal payload); 4 versions = seed + one
    // atomic commit per statement
    "u31_sql_dml" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice + 100
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 4),
        |v3 AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 20 = 1 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM v2 WHERE o_orderkey % 20 <> 2
        |  UNION ALL
        |  SELECT 'N', o_totalprice FROM v2 WHERE o_orderkey % 20 = 3)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  4 AS n_versions
        |FROM v3 GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u35 oracle: the one-statement snapshot sync replayed
    // relationally — matched %3=0 keys (status O takes the +50 source
    // price, others tagged SYNCED), the %10=7 rows re-keyed high and
    // inserted as NEW, absent-from-source P rows tagged STALE, every
    // other absent row deleted; 2 versions = clone seed + ONE atomic
    // MERGE commit
    "u35_merge_full" ->
      """WITH final AS (
        |  SELECT o_orderstatus, o_totalprice + 50 AS price, o_orderpriority
        |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice, 'SYNCED'
        |  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderstatus <> 'O'
        |  UNION ALL
        |  SELECT 'N', o_totalprice, 'NEW'
        |  FROM orders WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice, 'STALE'
        |  FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderstatus = 'P')
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('SYNCED', 'STALE', 'NEW')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_tagged,
        |  2 AS n_versions
        |FROM final GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u37 oracle: the evolved table's two grouped legs replayed
    // relationally (leg 0 = v0, leg 1 = v0 + the re-keyed late batch);
    // spec_evolved = 1 pins the manifest's new layout, pruned_both = 1
    // pins per-file-spec pruning in BOTH directions across the
    // evolution boundary
    "u37_partition_evolution" ->
      """WITH v1 AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 3)
        |SELECT CAST(0 AS INT) AS leg, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS spec_evolved, 1 AS pruned_both
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM v1 GROUP BY o_orderstatus
        |ORDER BY leg, o_orderstatus""".stripMargin,
    // u38 oracle: the SQL maintenance loop's surviving content — all
    // four INSERT quarters minus the %13 DELETE — replayed
    // relationally; compacted = 1 pins the OPTIMIZE (fewer files, dv
    // masks applied + consolidated away), vacuumed = 1 pins that only
    // the latest version survived the CALL vacuum
    "u38_sql_maintenance" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS compacted, 1 AS vacuumed
        |FROM orders WHERE o_orderkey % 13 <> 0
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u39 oracle: the graft→graft fact-to-dim join replayed over the
    // raw tables; broadcast_planned = 1 pins that the manifest byte
    // ledger fed plan-time stats accurate enough for Catalyst to pick
    // a BroadcastHashJoin with no hint (impossible at the V1 default
    // size)
    "u39_broadcast_stats" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_price,
        |  1 AS broadcast_planned
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    // u36 oracle: the composed-layout table's three legs replayed
    // relationally (leg 0 = the key lookup inside the O partition,
    // leg 1 = grouped v0, leg 2 = grouped after the P-scoped %11
    // delete + partial purge — the purge rewrite is O(the P
    // partition's buckets), not the table); both_dims = 1 pins
    // partition ∧ bucket pruning on one scan, layout_kept = 1 pins
    // that maintenance preserved both axes
    "u36_part_bucket" ->
      """SELECT CAST(0 AS INT) AS leg, 'O' AS o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS both_dims, 1 AS layout_kept
        |FROM orders WHERE o_orderstatus = 'O' AND o_orderkey BETWEEN 1 AND 7
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT CAST(2 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM orders WHERE NOT (o_orderstatus = 'P' AND o_orderkey % 11 = 0)
        |GROUP BY o_orderstatus
        |ORDER BY leg, o_orderstatus""".stripMargin,
    // u40 oracle: the SQL-declared part×bucket table's three legs
    // replayed relationally (leg 0 = composed pruned lookup, leg 1 =
    // grouped CTAS state, leg 2 = grouped after the re-keyed INSERT);
    // both_dims/layout_declared = 1 pin the layout witnesses
    "u40_sql_bucket_ddl" ->
      """WITH v2 AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 7)
        |SELECT CAST(0 AS INT) AS leg, 'O' AS o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS both_dims, 1 AS layout_declared
        |FROM orders WHERE o_orderstatus = 'O' AND o_orderkey BETWEEN 1 AND 7
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT CAST(2 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM v2 GROUP BY o_orderstatus
        |ORDER BY leg, o_orderstatus""".stripMargin,
    // u41 oracle: the column-mapping lifecycle replayed relationally —
    // rename+drop are pure metadata, so the surviving content is the
    // original orders (renamed price, +100 on the %10=6 tenth, minus
    // the dropped priority column) plus the re-keyed %10=2 insert;
    // mapped = 1 pins the manifest's colMap/retired/file-set witnesses
    "u41_column_mapping" ->
      """WITH v AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 6 THEN o_totalprice + 100
        |      ELSE o_totalprice END AS price
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 2)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS mapped
        |FROM v GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u42 oracle: the null-stat pruning legs replayed relationally
    // (note is NULL exactly on the F rows); pruned_both = 1 pins the
    // inputFiles witnesses
    "u42_null_stats" ->
      """SELECT 'is_null' AS leg, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS pruned_both
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'not_null', COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1
        |FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY leg""".stripMargin,
    // u43 oracle: the hidden-partitioning legs replayed relationally
    // (leg 0 = the pruned half-year range through the transform
    // layout, leg 1 = the same range after the %10=7 re-keyed INSERT;
    // dates ride unchanged so the appended rows land in the same
    // months); pruned/layout_hidden = 1 pin the inputFiles + schema
    // witnesses
    "u43_hidden_partitioning" ->
      """WITH v2 AS (
        |  SELECT o_orderdate, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderdate, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 7)
        |SELECT CAST(0 AS INT) AS leg, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS pruned, 1 AS layout_hidden
        |FROM orders
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
        |UNION ALL
        |SELECT CAST(1 AS INT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1, 1
        |FROM v2
        |WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-07-01'
        |ORDER BY leg""".stripMargin,
    // u44 oracle: the hourly hidden layout's legs replayed
    // relationally over one day of events (leg 0 = the pruned
    // business-hours range, leg 1 = per-hour counts);
    // pruned/layout_hidden = 1 pin the inputFiles + schema witnesses
    "u44_hourly_layout" ->
      """WITH day AS (
        |  SELECT ts, value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |    AND ts <  TIMESTAMP '2024-01-06 00:00:00')
        |SELECT CAST(0 AS INT) AS leg, '*' AS hr, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  1 AS pruned, 1 AS layout_hidden
        |FROM day
        |WHERE ts >= TIMESTAMP '2024-01-05 09:00:00'
        |  AND ts <  TIMESTAMP '2024-01-05 15:00:00'
        |UNION ALL
        |SELECT CAST(1 AS INT), strftime(ts, '%Y-%m-%d-%H'), COUNT(*),
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 1, 1
        |FROM day GROUP BY 2
        |ORDER BY leg, hr""".stripMargin,
    // u45 oracle: the CBO-reordered star join replayed relationally
    // (reorder must be result-invisible); reordered/ndv_served = 1
    // pin the plan witnesses (innermost join is dim ⋈ dim, NDV in
    // attributeStats)
    "u45_cbo_reorder" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS reordered, 1 AS ndv_served
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    // u46 oracle: the checkpoint-planned range scan replayed
    // relationally (planning must be result-invisible);
    // identical_decisions/pruned = 1 pin the Spark-job pruning ==
    // manifest pruning witness and the actual file skipping
    "u46_metadata_checkpoint" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS identical_decisions, 1 AS pruned
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u47 oracle: the checkpoint-planned POINT lookup replayed
    // relationally (planning must be result-invisible); the four
    // witnesses pin bucket- and bloom-probe checkpoint decisions ==
    // manifest decisions, and that each probe really skipped files
    "u47_ckpt_point_lookup" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS bucket_identical, 1 AS bucket_pruned,
        |  1 AS bloom_identical, 1 AS bloom_pruned
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 3)
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // u48 oracle: the skew-filtered aggregate replayed relationally
    // (stats feed changes the plan, never the rows); the witnesses pin
    // that the KLL histogram estimated the 1% tail within 5× while the
    // feed-off plan missed by >5×, and that the accurate estimate
    // flipped the join build side to broadcast
    "u48_histogram_skew" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(DISTINCT o_custkey) AS n_tail_custs,
        |  1 AS estimate_skew_aware, 1 AS broadcast_flipped
        |FROM orders
        |WHERE (CASE WHEN o_orderkey % 100 < 99 THEN 5
        |       ELSE 1000000 + o_orderkey END) >= 1000000""".stripMargin,
    // u49 oracle: the CONJUNCTIVE checkpoint-planned lookup replayed
    // relationally (planning must be result-invisible); the witnesses
    // pin the composite Spark-job decision == the manifest-path fold,
    // real file skipping, and that the conjunction pruned STRICTLY
    // tighter than the best single-column probe
    "u49_ckpt_composite_lookup" ->
      """WITH probe AS (
        |  SELECT o_orderdate AS pd, o_custkey AS pk
        |  FROM orders ORDER BY o_orderkey LIMIT 1)
        |SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS composite_identical, 1 AS composite_pruned,
        |  1 AS composite_tighter
        |FROM orders, probe
        |WHERE o_orderdate = pd AND o_custkey = pk""".stripMargin,
    // u50 oracle: the RANGE ∧ KEY checkpoint-planned probe replayed
    // relationally; witnesses pin decision parity with the manifest
    // path, real file skipping, and strictly-tighter-than-either-
    // conjunct-alone composition
    "u50_ckpt_mixed_probe" ->
      """WITH probe AS (
        |  SELECT o_custkey AS pk FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
        |    AND o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
        |  ORDER BY o_orderkey LIMIT 1)
        |SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS mixed_identical, 1 AS mixed_pruned, 1 AS mixed_tighter
        |FROM orders, probe
        |WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
        |  AND o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
        |  AND o_custkey = pk""".stripMargin,
    // u51 oracle: the storage-partitioned fact⋈fact join replayed
    // relationally (rows must equal a planner-shuffled join exactly);
    // shuffle_free_join = 1 pins that the executed join plan carried
    // zero Exchange nodes
    "u51_bucket_join" ->
      """SELECT o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  1 AS shuffle_free_join
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // u52 oracle: the ANALYZE/INVALIDATE repair protocol replayed
    // relationally — three identical range aggregates (leg 0 =
    // stat-less, leg 1 = after the analyzeStats backfill, leg 2 =
    // after invalidateStats), because metadata repairs must never
    // move a row; n_versions = 5 pins one metadata commit per repair,
    // repairs_ok = 1 pins the inputFiles / NDV / histogram witnesses
    "u52_stat_repairs" ->
      """SELECT CAST(0 AS INT) AS leg, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  5 AS n_versions, 1 AS repairs_ok
        |FROM orders WHERE (o_orderkey % 1000) BETWEEN 100 AND 200
        |UNION ALL
        |SELECT CAST(1 AS INT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 5, 1
        |FROM orders WHERE (o_orderkey % 1000) BETWEEN 100 AND 200
        |UNION ALL
        |SELECT CAST(2 AS INT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 5, 1
        |FROM orders WHERE (o_orderkey % 1000) BETWEEN 100 AND 200
        |ORDER BY leg""".stripMargin,
    // u53 oracle: the storage-partitioned join's outer/semi/anti
    // types replayed relationally — the LEFT JOIN rollup (unmatched
    // lineitems under ~none~), plus semi/anti counts as IN / NOT IN
    // scalars; shuffle_free_join = 1 pins zero Exchange in all three
    // executed join plans
    "u53_bucket_join_family" ->
      """WITH sub AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(o_orderstatus, '~none~') AS status,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey IN (SELECT o_orderkey FROM sub)) AS n_semi,
        |  (SELECT COUNT(*) FROM lineitem
        |   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM sub)) AS n_anti,
        |  1 AS shuffle_free_join, 1 AS merge_parity
        |FROM lineitem LEFT JOIN sub ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u54 oracle: the dynamic-file-pruning join replayed relationally
    // (rows must equal the planner's own join exactly — pruning is a
    // scan reducer, never the filter); files_pruned = 1 pins that the
    // pruned plan touched strictly fewer fact files than the table
    // holds, fallback_parity = 1 pins that the over-budget degrade
    // read the full table and produced identical rows
    "u54_join_pruning" ->
      """SELECT COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS files_pruned, 1 AS fallback_parity
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_custkey IN (1, 5, 9)""".stripMargin,
    // u55 oracle: the shuffle-free grouped aggregation replayed
    // relationally — every o_custkey group's count/sum/min/max
    // hash-compared (price pre-cast to DECIMAL(18,2) on both engines
    // so the sums are exact); shuffle_free_agg = 1 pins zero Exchange
    // in the executed aggregation plan
    "u55_bucket_agg" ->
      """SELECT o_custkey AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi,
        |  1 AS shuffle_free_agg
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // u56 oracle: the incremental tail re-cluster replayed
    // relationally — the surviving rows (both the by-reference bulk
    // and the re-clustered tail, masks applied) aggregated exactly;
    // repair_ok folds the witnesses (all files bucket-mapped, v0
    // bulk a subset of the post-repair file set, one repair commit,
    // zero-Exchange aligned aggregation on the repaired layout)
    "u56_cluster_tail" ->
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  1 AS repair_ok
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
    // u57 oracle: the SORTED-bucket layout replayed relationally —
    // every group's count/sum over BOTH sorted populations (v0 +
    // sorted append) hash-compared; sorted_ok = 1 pins complete
    // sorted markers AND a zero-Exchange, zero-Sort executed plan
    // (the skip-sort tree-merge path, not the in-task sorter)
    "u57_sorted_layout" ->
      """SELECT o_custkey AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  1 AS sorted_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // u58 oracle: the FUSED star query (join + GROUP BY key in one
    // zero-Exchange, zero-Sort streaming pass) replayed relationally;
    // fused_ok = 1 pins both witnesses
    "u58_join_agg" ->
      """SELECT l_orderkey AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS price,
        |  1 AS fused_ok
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u59 oracle: latest-row-per-entity as the relational
    // join-on-max(ord) — NULL orders never win, all-NULL entities
    // absent, exactly bucketAlignedLatest's contract; latest_ok = 1
    // pins the zero-Exchange, zero-Sort executed plan
    "u59_latest_by_key" ->
      """WITH t AS (SELECT o_custkey AS k,
        |    CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderkey END
        |      AS ord,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders)
        |SELECT t.k, t.ord, CAST(t.price AS DOUBLE) AS price,
        |  1 AS latest_ok
        |FROM t JOIN (SELECT k, MAX(ord) AS mo FROM t GROUP BY k) m
        |  ON t.k = m.k AND t.ord = m.mo
        |ORDER BY 1""".stripMargin,
    // u60 oracle: the point-in-time (backward as-of) join's exact
    // relational definition — per purchase, the click row at the
    // greatest click time ≤ purchase time (clicks pre-deduped to
    // unique (user, ts), so the answer is deterministic); unmatched
    // purchases survive NULL-extended. asof_ok = 1 pins the
    // zero-Exchange, zero-Sort streaming execution.
    "u60_aligned_asof" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS ruid, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |m AS (
        |  SELECT p.purchase_id, MAX(c.click_ts) AS mct
        |  FROM p JOIN c ON c.ruid = p.user_id
        |    AND c.click_ts <= p.purchase_ts
        |  GROUP BY 1)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |  c.click_ts, c.click_id, 1 AS asof_ok
        |FROM p
        |LEFT JOIN m ON m.purchase_id = p.purchase_id
        |LEFT JOIN c ON c.ruid = p.user_id AND c.click_ts = m.mct
        |ORDER BY 1""".stripMargin,
    // u61 oracle: SQL's DEFAULT window frame (RANGE UNBOUNDED
    // PRECEDING..CURRENT ROW — ties are peers and share the running
    // value) replayed row for row; running_ok = 1 pins the
    // zero-Exchange, zero-Sort streaming execution.
    "u61_running_window" ->
      """SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS oid,
        |  COUNT(*) OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS rs,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS rmax,
        |  1 AS running_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2, 3""".stripMargin,
    // u62 oracle: FORWARD as-of with a 48-hour tolerance — the
    // smallest click time ≥ purchase time, no further than the
    // window; beyond-window purchases NULL-extend. fwd_ok = 1 pins
    // the zero-Exchange, zero-Sort streaming execution.
    "u62_forward_asof" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS ruid, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |m AS (
        |  SELECT p.purchase_id, MIN(c.click_ts) AS mct
        |  FROM p JOIN c ON c.ruid = p.user_id
        |    AND c.click_ts >= p.purchase_ts
        |    AND c.click_ts <= p.purchase_ts + INTERVAL '48' HOUR
        |  GROUP BY 1)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |  c.click_ts, c.click_id, 1 AS fwd_ok
        |FROM p
        |LEFT JOIN m ON m.purchase_id = p.purchase_id
        |LEFT JOIN c ON c.ruid = p.user_id AND c.click_ts = m.mct
        |ORDER BY 1""".stripMargin,
    // u64 oracle: u51's storage-partitioned join replayed through
    // PURE SQL (the catalog tables + the AlignedJoin rewrite rule) —
    // relationally it is exactly the lineitem⋈orders rollup.
    // sql_aligned_ok = 1 pins that the rule fired (no join operator
    // in the executed plan), the per-bucket inner plans are
    // exchange-free, and a disabled-rule rerun returns identical rows.
    "u64_sql_aligned_join" ->
      """SELECT o.o_orderstatus, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  1 AS sql_aligned_ok
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u65 oracle: u55's shuffle-free grouped aggregation replayed
    // through PURE SQL (catalog table + the AlignedAggregate rewrite
    // rule) — relationally the same per-customer rollup, since r18
    // with an integral AVG item (the decomposed sum+count folds, the
    // division re-applied above; exact integer sums make it
    // bit-stable across engines). sql_agg_ok = 1 pins that the rule
    // fired (no aggregate/exchange in the plan), inner plans are
    // exchange-free, and a disabled-rule rerun matches rows AND
    // schema.
    "u65_sql_aligned_agg" ->
      """SELECT o_custkey AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi,
        |  AVG(o_orderkey) AS ap,
        |  1 AS sql_agg_ok
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // u66 oracle: the SQL-reached aligned join FAMILY — relationally
    // a LEFT JOIN retention rollup per market segment, a windowed
    // IN-subquery count (LeftSemi with the BETWEEN riding the aligned
    // right scan as its exact range window) and a NOT EXISTS count
    // (LeftAnti) attached as literal columns. sql_family_ok = 1
    // pins, for each of the three, that the rewrite fired (no join
    // operator in the executed plan) and a disabled-rule rerun
    // matched rows exactly.
    "u66_sql_join_family" ->
      """WITH seg AS (
        |  SELECT c.c_mktsegment, COUNT(o.o_orderkey) AS n_orders,
        |    COUNT(*) AS n_rows
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |w AS (
        |  SELECT COUNT(*) AS with_window FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders
        |    WHERE o_totalprice BETWEEN 1000.0 AND 150000.0)),
        |a AS (
        |  SELECT COUNT(*) AS no_orders FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey))
        |SELECT seg.c_mktsegment, seg.n_orders, seg.n_rows,
        |  w.with_window, a.no_orders, 1 AS sql_family_ok
        |FROM seg, w, a ORDER BY 1""".stripMargin,
    // u67 oracle: the FUSED SQL star query — relationally the
    // per-customer rollup over customer⋈orders. sql_fused_ok = 1
    // pins the strongest plan claim in the suite: no join operator,
    // no aggregate operator, no Exchange AT ALL in the executed
    // plan (join and fold in one task), exchange-free inner
    // per-bucket plans, and a both-rules-disabled planner rerun
    // matching rows and schema.
    "u67_sql_join_agg" ->
      """SELECT c.c_custkey AS k, COUNT(*) AS n,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  CAST(MAX(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS hi,
        |  1 AS sql_fused_ok
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u68 oracle: the multi-conjunct SQL aligned join — relationally
    // the clicks-before-purchase attribution rollup. residual_ok = 1
    // pins that the rewrite fired through the composite condition
    // (no join operator in the plan), the per-bucket inner plans are
    // exchange-free, and a disabled-rule rerun matched rows exactly.
    "u68_sql_join_residual" ->
      """WITH p AS (
        |  SELECT user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS cuid, ts AS cts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.user_id, COUNT(*) AS n_prior_clicks, 1 AS residual_ok
        |FROM p JOIN c ON p.user_id = c.cuid AND c.cts <= p.pts
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u69 oracle: the composite-key aligned aggregation —
    // relationally the per-customer-per-day rollup. comp_ok = 1 pins
    // that the widened fold rule fired (no aggregate/exchange in the
    // plan), the composite-sorted layout served it SORT-free (the
    // skip-sort tree merge), and a disabled-rule rerun matched rows
    // and schema.
    "u69_composite_agg" ->
      """SELECT o_custkey AS k, o_orderdate AS day, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total,
        |  1 AS comp_ok
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // u70 oracle: the FULL OUTER aligned join — relationally the
    // two-slice reconciliation rollup. full_ok = 1 pins that the
    // rule fired (no join operator in the plan), the inner
    // per-bucket plans are exchange-free, all three reconciliation
    // classes appear, and a disabled-rule rerun matched rows and
    // schema.
    "u70_sql_full_outer" ->
      """WITH a AS (
        |  SELECT o_orderkey AS okey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |b AS (
        |  SELECT o_orderkey AS bkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS bprice
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT CASE WHEN a.okey IS NULL THEN 'b_only'
        |       WHEN b.bkey IS NULL THEN 'a_only' ELSE 'both' END AS side,
        |  COUNT(*) AS n,
        |  CAST(SUM(COALESCE(a.price, 0) + COALESCE(b.bprice, 0))
        |    AS DOUBLE) AS total,
        |  1 AS full_ok
        |FROM a FULL JOIN b ON a.okey = b.bkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // u71 oracle: u61's running window reached from PURE SQL — the
    // same default-frame (RANGE, peers share the running value)
    // replay, row for row. run_ok = 1 pins that the rule fired (no
    // Window operator, no Exchange), the composite-sorted layout
    // served it SORT-free, and a disabled-rule rerun matched rows
    // and schema.
    "u71_sql_running" ->
      """SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS oid,
        |  COUNT(*) OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS rs,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
        |    AS DOUBLE) AS rmax,
        |  1 AS run_ok
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY 1, 2, 3""".stripMargin,
    // u63 oracle: the RANGE-WINDOWED backward as-of — both sides
    // restricted to [Jan 8, Jan 18] (the BETWEEN window the aligned
    // read applies as file pruning + row filters), then the u60
    // relational definition over the windowed inputs. win_ok = 1 pins
    // zero-Exchange ∧ zero-Sort ∧ strictly fewer per-file plans than
    // the layout's total files (files were actually skipped).
    "u63_windowed_asof" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'
        |    AND ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
        |            AND TIMESTAMP '2024-01-18 00:00:00'),
        |c AS (
        |  SELECT user_id AS ruid, ts AS click_ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |cw AS (
        |  SELECT * FROM c
        |  WHERE click_ts BETWEEN TIMESTAMP '2024-01-08 00:00:00'
        |                 AND TIMESTAMP '2024-01-18 00:00:00'),
        |m AS (
        |  SELECT p.purchase_id, MAX(cw.click_ts) AS mct
        |  FROM p JOIN cw ON cw.ruid = p.user_id
        |    AND cw.click_ts <= p.purchase_ts
        |  GROUP BY 1)
        |SELECT p.purchase_id, p.user_id, p.purchase_ts,
        |  cw.click_ts, cw.click_id, 1 AS win_ok
        |FROM p
        |LEFT JOIN m ON m.purchase_id = p.purchase_id
        |LEFT JOIN cw ON cw.ruid = p.user_id AND cw.click_ts = m.mct
        |ORDER BY 1""".stripMargin,
    // u32 oracle: the partitioned table's three legs replayed
    // relationally (leg 0 = the pruned O read, legs 1/2 = grouped
    // v0/latest); only_matching_dirs = 1 pins that the pruned scan
    // touched only o_orderstatus=O files
    "u32_partitioned_table" ->
      """WITH v1 AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 10 = 3)
        |SELECT CAST(0 AS INT) AS leg, 'O' AS o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS only_matching_dirs
        |FROM v1 WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT CAST(2 AS INT), o_orderstatus, COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 1
        |FROM v1 GROUP BY o_orderstatus
        |ORDER BY 1, 2""".stripMargin,
    // u33 oracle: the metadata-served counts replayed relationally;
    // metadata_only = 1 pins that BOTH statements optimized to a
    // LocalRelation (zero file reads), not just that the numbers agree
    "u33_partition_count" ->
      """WITH v1 AS (
        |  SELECT o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus FROM orders WHERE o_orderkey % 10 = 3)
        |SELECT 'filtered' AS scope, 'O' AS o_orderstatus,
        |  COUNT(*) AS n, 1 AS metadata_only
        |FROM v1 WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT 'grouped', o_orderstatus, COUNT(*), 1
        |FROM v1 GROUP BY o_orderstatus
        |ORDER BY scope, o_orderstatus""".stripMargin,
    // u34 oracle: the name-based catalog lifecycle replayed
    // relationally — fixture (orders + rekeyed %10=3 tail) + the
    // INSERT of the re-keyed 'N' %10=5 slice, minus the DELETEd F
    // tier; n_versions = 3 (clone + insert + delete), in_registry = 1
    // (SHOW TABLES found the forked table)
    "u34_catalog_table" ->
      """WITH fixture AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |grown AS (
        |  SELECT o_orderstatus, o_totalprice FROM fixture
        |  UNION ALL
        |  SELECT 'N', o_totalprice FROM fixture WHERE o_orderkey % 10 = 5)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  3 AS n_versions, 1 AS in_registry
        |FROM grown WHERE o_orderstatus <> 'F'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // x3 oracle: the ENTIRE sketch computation replayed relationally —
    // DuckDB builds the per-flag histogram DIRECTLY (one level) while
    // Spark goes through the flag×linestatus partial/merge rollup, so
    // the hash-equality of the interpolated quantiles proves the merge
    // lossless. All arithmetic is double (e0 literals keep DuckDB off
    // its DECIMAL path); bin width 512 = 2^9 makes the bin ids exact
    "x3_quantile_sketch" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    LEAST(CAST(FLOOR(l_extendedprice / 512e0) AS BIGINT), 255) AS bin,
        |    COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, bin, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY bin
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
        |  FROM h)
        |SELECT l_returnflag, MAX(n) AS n_rows,
        |  MAX(CASE WHEN cum - cnt < 0.5e0 * n AND cum >= 0.5e0 * n
        |    THEN (bin + (0.5e0 * n - (cum - cnt)) / cnt) * 512e0 END) AS est_p50,
        |  MAX(CASE WHEN cum - cnt < 0.95e0 * n AND cum >= 0.95e0 * n
        |    THEN (bin + (0.95e0 * n - (cum - cnt)) / cnt) * 512e0 END) AS est_p95
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // x4 oracle: the exact top-5 (deterministic tie-break) plus the
    // CMS one-sided witness as literal 1 — the estimate is hash-
    // dependent (x1's caveat) so only its guarantee is compared; the
    // witness computation itself runs in-engine against the real CMS
    "x4_heavy_hitters" ->
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id)
        |    AS INT) AS rank,
        |  user_id, COUNT(*) AS n_events, 1 AS cms_ge_exact
        |FROM events GROUP BY user_id
        |ORDER BY COUNT(*) DESC, user_id LIMIT 5""".stripMargin,
    // x1 oracle: the exact count plus the bounded-error witness — the
    // oracle asserts the witness is 1 (the Spark side computes it from
    // the actual HLL estimate; the estimate itself is not compared)
    "x1_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
        |  1 AS within_rsd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "x1a_distinct_exact" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01 00:00:00' AND TIMESTAMP '1998-12-31 23:59:59'
        |  AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_inner" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q4_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q5_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q6_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q7_star_join" ->
      s"""SELECT r_name, n_name, CAST(SUM($rev) AS DOUBLE) AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q8_topk" ->
      s"""SELECT o_custkey, CAST(SUM($rev) AS DOUBLE) AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_custkey ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin,
    "q9_window_rownum" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,
    "q10_window_lag" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1)
        |SELECT order_date,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(LAG(rev_dec) OVER (ORDER BY order_date) AS DOUBLE) AS prev_revenue,
        |  CAST(rev_dec - LAG(rev_dec) OVER (ORDER BY order_date) AS DOUBLE) AS delta
        |FROM daily ORDER BY order_date""".stripMargin,
    "q11_window_running" ->
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS order_date,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, order_date,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (PARTITION BY o_orderpriority ORDER BY order_date
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        |FROM daily ORDER BY o_orderpriority, order_date""".stripMargin,
    "q12_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "q13_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q14_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    "q15_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
        |  CAST(GROUPING(r_name) AS INTEGER) AS g_region,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q16_distinct_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q17_events_json" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(NULLIF(regexp_extract(props, '"k": *([0-9]+)', 1), '') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q20_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q19_sessions" ->
      """WITH x AS (
        |  SELECT user_id, event_id,
        |         epoch_us(ts) AS us,
        |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
        |         ts
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (
        |  SELECT user_id,
        |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM y),
        |g AS (
        |  SELECT user_id, session_id, COUNT(*) AS session_events
        |  FROM z GROUP BY user_id, session_id)
        |SELECT user_id, MAX(session_id) AS n_sessions,
        |       MAX(session_events) AS max_session_events,
        |       CAST(SUM(session_events) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q33_session_window" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM x),
        |z AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM y)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(event_id) AS BIGINT) AS event_id_sum
        |FROM z GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,
    "q34_anomaly" ->
      """WITH h AS (
        |  SELECT CAST(ts AS DATE) AS day, strftime(ts, '%H') AS hour,
        |    COUNT(*) AS n_events
        |  FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        |w AS (
        |  SELECT day, hour, n_events,
        |    CAST(COUNT(*) OVER (PARTITION BY day) AS BIGINT) AS day_hours,
        |    CAST(SUM(n_events) OVER (PARTITION BY day) AS BIGINT) AS day_sum,
        |    CAST(SUM(n_events * n_events) OVER (PARTITION BY day) AS BIGINT) AS day_sumsq
        |  FROM h)
        |SELECT day, hour, n_events,
        |  day_sum / day_hours AS day_mean,
        |  (day_sumsq - day_sum * day_sum / day_hours) / day_hours AS day_var,
        |  (n_events - day_sum / day_hours) * (n_events - day_sum / day_hours)
        |    > 4.0 * ((day_sumsq - day_sum * day_sum / day_hours) / day_hours)
        |    AS is_anomaly
        |FROM w ORDER BY day, hour""".stripMargin,
    // the SQL-surface query IS its own oracle: one string, two engines
    "q35_sql" -> CorpusQueries.q35SharedSql,
    "q45_lateral" -> CorpusQueries.q45SharedSql,
    "q46_recursive_cte" -> CorpusQueries.q46SharedSql,
    "q39_null_semantics" -> CorpusQueries.q39SharedSql,
    "q36_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, value, epoch_us(ts) AS us FROM events),
        |w AS (
        |  SELECT event_type, value,
        |    make_timestamp((us // 900000000) * 900000000 - k * 900000000) AS ws
        |  FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k) ks)
        |SELECT ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM w GROUP BY ws, event_type
        |ORDER BY ws, event_type""".stripMargin,
    // NULLIF keeps the no-match case engine-agreed: Spark's
    // regexp_extract→cast yields NULL on a brand without '#digits',
    // DuckDB's CAST('' AS INTEGER) would raise instead
    "q38_string_ops" ->
      """SELECT CAST(NULLIF(regexp_extract(p_brand, '#([0-9]+)', 1), '') AS INTEGER) AS brand_no,
        |  COUNT(*) AS n_parts,
        |  CAST(SUM(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END) AS BIGINT) AS n_widgets,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
        |  MIN(upper(p_name)) AS first_uname,
        |  CAST(SUM(p_size) AS BIGINT) AS size_sum,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_sum
        |FROM part GROUP BY 1 ORDER BY brand_no""".stripMargin,
    "q37_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,
    // q40's oracle is the PLAIN join (same as q25): AQE's skew split
    // only changes the physical partitioning, never the result
    "q40_aqe_skew" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // u2 oracle: an INDEPENDENT formulation of the same merge — the
    // change batch replayed as filter+union instead of a full-outer
    // apply join (valid because the demo ops are key-disjoint), so the
    // compare cross-checks semantics, not just arithmetic
    "u2_merge_upsert" ->
      """WITH del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 97 <> 0),
        |ins AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u3 oracle: each manifest version's state replayed relationally —
    // v0 = orders, v1 = v0 + the re-keyed late batch, v2 = v1 minus 'F'
    "u3_time_travel" ->
      """WITH late AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 3),
        |v1 AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM late)
        |SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM orders
        |UNION ALL SELECT CAST(1 AS BIGINT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM v1
        |UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM v1 WHERE o_orderstatus <> 'F'
        |ORDER BY version""".stripMargin,
    // u4 oracle: the same key-range aggregate over the raw table —
    // manifest-stat file skipping must be result-invisible
    "u4_file_skip" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 2000""".stripMargin,
    // u5 oracle: the full-table aggregate — incremental maintenance
    // over the change feed must equal the recompute exactly
    "u5_incremental" ->
      """SELECT o_orderstatus,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // u6 oracle: the raw-table 2-d box aggregate — z-order layout +
    // two-column file skipping must be result-invisible
    "u6_zorder_skip" ->
      """SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 500
        |  AND CAST(o_orderdate AS DATE)
        |      BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'""".stripMargin,
    // u10 oracle: inserts = the late batch minus its 'F' rows (masked
    // by the range's deletion vector before they were ever visible);
    // deletes = v0's 'F' rows read back full-row — net CDC semantics
    "u10_change_feed" ->
      """SELECT 'delete' AS _change_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 'insert', COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders WHERE o_orderkey % 10 = 3 AND o_orderstatus <> 'F'
        |ORDER BY _change_type""".stripMargin,
    // u9 oracle: v0 = all orders; v1 (dv-masked) and v2 (purged) both
    // equal the filtered table — the deletion-vector mask must be
    // exact and its physical purge result-identical
    "u9_delete_vectors" ->
      """SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM orders
        |UNION ALL SELECT CAST(1 AS BIGINT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL SELECT CAST(2 AS BIGINT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders WHERE o_orderstatus <> 'F'
        |ORDER BY version""".stripMargin,
    // u7 oracle: v0 = raw orders, v1 = the u2 merge semantics replayed
    // relationally — both versions must serve through the manifests
    // u8 oracle: clone v0 == all orders (zero-copy read through the
    // borrowed refs), clone v1 == all orders + the re-keyed URGENT
    // delta, source latest == all orders (write isolation)
    "u8_shallow_clone" ->
      """WITH base AS (
        |  SELECT COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS t FROM orders),
        |urg AS (
        |  SELECT COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS t
        |  FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT 'clone_v0' AS scope, base.n AS n_rows, CAST(base.t AS DOUBLE) AS total FROM base
        |UNION ALL
        |SELECT 'clone_v1', base.n + urg.n, CAST(base.t + urg.t AS DOUBLE) FROM base, urg
        |UNION ALL
        |SELECT 'source_latest', base.n, CAST(base.t AS DOUBLE) FROM base
        |ORDER BY scope""".stripMargin,
    // u11 oracle: u7's VERBATIM — merge-on-read (DV mask + append in
    // one commit) must be result-identical to the copy-on-write MERGE
    "u11_merge_on_read" ->
      """WITH del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 97 <> 0),
        |ins AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins),
        |v AS (
        |  SELECT CAST(0 AS BIGINT) AS version, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), o_orderstatus, o_totalprice FROM merged)
        |SELECT version, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM v GROUP BY version, o_orderstatus
        |ORDER BY version, o_orderstatus""".stripMargin,
    // u12 oracle: v0 = all orders; v1 (dv-masked), v2 (purged), and
    // v3 (RESTORED to the masked v1) all equal the filtered table —
    // the metadata-only rollback must read exactly as its target did
    "u12_restore" ->
      """SELECT CAST(0 AS BIGINT) AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total FROM orders
        |UNION ALL SELECT CAST(v.v AS BIGINT), COUNT(*),
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |FROM orders CROSS JOIN (VALUES (1), (2), (3)) AS v(v)
        |WHERE o_orderstatus <> 'F'
        |GROUP BY v.v
        |ORDER BY version""".stripMargin,
    // u14 oracle: the whole two-step evolution replayed relationally —
    // late rows carry o_channel (keyed mod 20, which the +3e9 rekey
    // preserves), updated rows carry channel 'cdc' + the merge-added
    // o_src, untouched rows read NULL for both
    "u14_schema_evolution" ->
      """WITH late AS (
        |  SELECT o_orderkey + 3000000000 AS o_orderkey, o_orderstatus,
        |    o_totalprice,
        |    CASE WHEN o_orderkey % 20 = 3 THEN 'web' ELSE 'store' END AS ch,
        |    CAST(NULL AS VARCHAR) AS src,
        |    o_orderkey % 100 AS u
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 5
        |         ELSE o_totalprice END AS o_totalprice,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'cdc' END AS ch,
        |    CASE WHEN o_orderkey % 11 = 0 THEN 'cdc_feed' END AS src,
        |    o_orderkey % 100 AS u
        |  FROM orders),
        |widen AS (
        |  SELECT o_orderkey + 6000000000 AS o_orderkey, o_orderstatus,
        |    o_totalprice, 'widen' AS ch, CAST(NULL AS VARCHAR) AS src,
        |    o_orderkey % 100 + 3000000000 AS u
        |  FROM orders WHERE o_orderkey % 10 = 7),
        |allr AS (SELECT * FROM base UNION ALL SELECT * FROM late
        |  UNION ALL SELECT * FROM widen)
        |SELECT COALESCE(ch, 'none') AS channel, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(SUM(CASE WHEN src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_src,
        |  CAST(SUM(u) AS BIGINT) AS units
        |FROM allr GROUP BY 1 ORDER BY channel""".stripMargin,
    // u15 oracle: base + the CLEAN re-keyed batch only — the refused
    // violating append left no rows and consumed no version
    "u15_check_constraints" ->
      """WITH clean AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 5 = 0),
        |allr AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM clean)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  3 AS n_versions
        |FROM allr GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u16 oracle: the three batch slices compose to the full table;
    // n_versions = 4 pins that both replays (one straddling a
    // compaction) committed nothing
    "u16_exactly_once" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  4 AS n_versions
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u17 oracle: rewrite + expiry lose nothing (full table survives);
    // one live version, floor 3
    "u17_compact_vacuum" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  1 AS n_live_versions, 3 AS floor
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u20 oracle: the UPDATE replayed relationally — masked-and-
    // reappended rows carry exactly the SET result, nothing else moved
    "u20_update_where" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
        |    THEN o_totalprice + 100 ELSE o_totalprice END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  2 AS n_versions
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u21 oracle: three point-lookup states replayed relationally —
    // bucket-pruned reads must be result-invisible across the DV
    // delete (key 5 gone from leg 1) and the merge-on-read UPDATE
    // (key 7 carries +100 in leg 2)
    "u21_bucketed_lookup" ->
      """WITH k AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total
        |  FROM orders WHERE o_orderkey IN (2, 5, 7, 11, 13))
        |SELECT CAST(0 AS INT) AS leg, o_orderkey, o_custkey, total FROM k
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderkey, o_custkey, total FROM k
        |WHERE o_orderkey <> 5
        |UNION ALL
        |SELECT CAST(2 AS INT), o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey = 7 THEN total + 100 ELSE total END FROM k
        |WHERE o_orderkey <> 5
        |ORDER BY 1, 2""".stripMargin,
    // u22 oracle: the three transactional states replayed relationally
    // — leg 0 must NOT contain the crashed txn's rows (atomicity), and
    // legs 1 and 2 must be identical rollups computed from the fact
    // table and stored in the rollup table (consistency)
    "u22_multi_table_txn" ->
      """WITH late AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 7),
        |fin AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM late),
        |seed AS (
        |  SELECT o_orderstatus, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1),
        |done AS (
        |  SELECT o_orderstatus, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM fin GROUP BY 1)
        |SELECT CAST(0 AS INT) AS leg, * FROM seed
        |UNION ALL SELECT CAST(1 AS INT), * FROM done
        |UNION ALL SELECT CAST(2 AS INT), * FROM done
        |ORDER BY 1, 2""".stripMargin,
    // u23 oracle: the ledger-served counts replayed relationally —
    // v0 = all orders, v1 = non-F orders (DV mask), v2 = v1 + the
    // late re-keyed tenth
    "u23_fast_count" ->
      """SELECT CAST(0 AS INT) AS version, COUNT(*) AS n_rows FROM orders
        |UNION ALL
        |SELECT CAST(1 AS INT), COUNT(*) FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT CAST(2 AS INT),
        |  (SELECT COUNT(*) FROM orders WHERE o_orderstatus <> 'F')
        |  + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 10 = 3)
        |ORDER BY 1""".stripMargin,
    // u24 oracle: two bloom-pruned point-lookup states replayed
    // relationally — pruning must be result-invisible, including
    // through the DV delete of key 17
    "u24_bloom_lookup" ->
      """WITH k AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS total
        |  FROM orders WHERE o_orderkey IN (3, 8, 17, 22))
        |SELECT CAST(0 AS INT) AS leg, o_orderkey, o_custkey, total FROM k
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderkey, o_custkey, total FROM k
        |WHERE o_orderkey <> 17
        |ORDER BY 1, 2""".stripMargin,
    // u25 oracle: both legs replay the post-delete state (a partial
    // rewrite is result-invisible); n_visible pins the consolidated
    // ledger against the relational count
    "u25_compact_small" ->
      """WITH slices AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 1
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 2
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 3),
        |v4 AS (
        |  SELECT * FROM (
        |    SELECT o_orderstatus, o_totalprice FROM orders
        |    UNION ALL SELECT * FROM slices)
        |  WHERE o_orderstatus <> 'F'),
        |agg AS (
        |  SELECT o_orderstatus, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM v4 GROUP BY 1)
        |SELECT CAST(0 AS INT) AS leg, o_orderstatus, n_orders, total,
        |  6 AS n_versions, (SELECT COUNT(*) FROM v4) AS n_visible FROM agg
        |UNION ALL
        |SELECT CAST(1 AS INT), o_orderstatus, n_orders, total,
        |  6, (SELECT COUNT(*) FROM v4) FROM agg
        |ORDER BY 1, 2""".stripMargin,
    // u26 oracle: base + the late batch exactly once; the replayed
    // and duplicate-key batches committed nothing (n_versions = 2)
    "u26_unique_append" ->
      """WITH late AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 7),
        |allr AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM late)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  2 AS n_versions
        |FROM allr GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u27 oracle: the materialized view's full maintenance history
    // replayed relationally — initial orders + the rekeyed late batch
    // (append), minus the %11 keys (DV delete), +10 on the %7 keys and
    // the %13 re-keyed inserts (merge-on-read) — the refreshed view
    // must equal the direct aggregate of that final state, and the
    // literal 4 pins the replayed refresh as a no-op (bootstrap + 3
    // real refreshes, nothing more)
    "u27_materialized_view" ->
      """WITH allr AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3),
        |vis AS (
        |  SELECT * FROM allr WHERE o_orderkey % 11 <> 0),
        |merged AS (
        |  SELECT o_orderstatus,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
        |         ELSE o_totalprice END AS p
        |  FROM vis
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice AS p
        |  FROM vis WHERE o_orderkey % 13 = 0)
        |SELECT o_orderstatus, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  4 AS n_view_versions
        |FROM merged GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u18 oracle: base + winner + retried loser — the lost update
    // lands exactly once on retry; the losing attempt consumed nothing
    "u18_concurrent_writers" ->
      """WITH w AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 = 0),
        |l AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 11 = 0),
        |allr AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  UNION ALL SELECT * FROM w
        |  UNION ALL SELECT * FROM l)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  3 AS n_versions
        |FROM allr GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u19 oracle: the direct aggregate of the FINAL state — signed
    // incremental partials over the change feed (inserts +, deletes −)
    // must merge to exactly the recompute, with fully-deleted groups
    // netting out of the view
    "u19_incremental_deletes" ->
      """WITH late AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 10 = 3),
        |v2 AS (
        |  SELECT * FROM (
        |    SELECT o_orderstatus, o_totalprice FROM orders
        |    UNION ALL SELECT * FROM late)
        |  WHERE o_orderstatus <> 'F')
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM v2 GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    // u13 oracle: u7/u11's merged state (the split CDC apply must
    // compose to the one-shot MERGE) with n_versions = 3 pinned — the
    // replayed batch must have committed nothing
    "u13_cdc_apply" ->
      """WITH del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 97 <> 0),
        |ins AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  3 AS n_versions
        |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "u7_merge_snapshot" ->
      """WITH del AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice + 10 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 97 <> 0),
        |ins AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM del)
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins),
        |v AS (
        |  SELECT CAST(0 AS BIGINT) AS version, o_orderstatus, o_totalprice FROM orders
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), o_orderstatus, o_totalprice FROM merged)
        |SELECT version, o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM v GROUP BY version, o_orderstatus
        |ORDER BY version, o_orderstatus""".stripMargin,
    "f1_funnel" ->
      """WITH v AS (
        |  SELECT user_id, MIN(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, MIN(ts) AS c_ts FROM events e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts > v_ts GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, MIN(ts) AS p_ts FROM events e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > c_ts GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
        |UNION ALL SELECT '2_click', COUNT(*) FROM c
        |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
        |ORDER BY stage""".stripMargin,
    "f2_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INTEGER) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    "pipe1_manifest" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |    len(list_filter(string_split(text, ' '),
         |      t -> list_contains(['the','a','of','and','to','in','is'], t))) AS n_stop,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) AS sum_len,
         |    len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
         |    len(text) AS n_chars
         |  FROM documents),
         |keep AS (
         |  SELECT doc_id FROM q
         |  WHERE (n_tokens BETWEEN 15 AND 90) AND (sum_len / n_tokens BETWEEN 3.0 AND 9.0)
         |    AND n_stop > 0 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
         |    AND CAST(n_digits AS DOUBLE) / n_chars <= 0.2),
         |k AS (
         |  SELECT d.doc_id, d.text, d.n_chars, sha256(d.text) AS h
         |  FROM documents d JOIN keep USING (doc_id)),
         |w AS (SELECT MIN(doc_id) AS doc_id FROM k GROUP BY h),
         |m AS (SELECT k.doc_id, k.text, k.n_chars FROM k JOIN w ON k.doc_id = w.doc_id)
         |SELECT ${splitCaseSql(splitBucketSql)} AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM m GROUP BY 1 ORDER BY split""".stripMargin,
    "pipe2_multimodal" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |    len(list_filter(string_split(text, ' '),
         |      t -> list_contains(['the','a','of','and','to','in','is'], t))) AS n_stop,
         |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
         |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) AS sum_len,
         |    len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
         |    len(text) AS n_chars
         |  FROM documents),
         |k AS (
         |  SELECT doc_id,
         |    (n_tokens BETWEEN 15 AND 90) AND (sum_len / n_tokens BETWEEN 3.0 AND 9.0)
         |      AND n_stop > 0 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
         |      AND CAST(n_digits AS DOUBLE) / n_chars <= 0.2 AS keep
         |  FROM q),
         |s AS (
         |  SELECT d.doc_id, ${splitCaseSql(splitBucketSql)} AS split, k.keep,
         |    len(string_split(text, ' ')) AS n_tokens
         |  FROM documents d JOIN k USING (doc_id)),
         |e AS (
         |  SELECT vec_id, label,
         |    list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(embedding,
         |          x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))),
         |      (a, m) -> a + m * m) AS norm_sq
         |  FROM embeddings)
         |SELECT split, label, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CAST(norm_sq AS DECIMAL(38,0))) AS VARCHAR) AS norm_sq_sum,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_sum
         |FROM s JOIN e ON s.doc_id = e.vec_id
         |GROUP BY split, label ORDER BY split, label""".stripMargin,
    "k1_skew_profile" ->
      """WITH g AS (SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
        |t AS (SELECT COUNT(*) AS total FROM orders)
        |SELECT key, cnt, CAST(cnt AS DOUBLE) / total AS share
        |FROM g CROSS JOIN t
        |ORDER BY cnt DESC, key LIMIT 10""".stripMargin,
    // dq2 oracle: per-column scans UNION'd — the oracle states the
    // CONTRACT (each column's stats over the table); the Spark side's
    // one-scan wide-agg + stack is the efficiency claim under test
    "dq2_profile" ->
      Seq("l_orderkey" -> "l_orderkey",
          "l_quantity" -> "CAST(l_quantity AS DECIMAL(18,2))",
          "l_extendedprice" -> "CAST(l_extendedprice AS DECIMAL(18,2))",
          "l_returnflag" -> "l_returnflag",
          "l_shipdate" -> "CAST(l_shipdate AS DATE)")
        .map { case (n, e) =>
          s"""SELECT '$n' AS column_name, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT($e) AS n_null,
             |  COUNT(DISTINCT $e) AS n_distinct,
             |  CAST(MIN($e) AS VARCHAR) AS min_val,
             |  CAST(MAX($e) AS VARCHAR) AS max_val
             |FROM lineitem""".stripMargin }
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    "dq1_ref_integrity" ->
      """WITH a AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS relationship,
        |    (SELECT COUNT(*) FROM lineitem) AS n_child,
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier',
        |    (SELECT COUNT(*) FROM lineitem),
        |    (SELECT COUNT(*) FROM lineitem
        |     WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders
        |     WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)))
        |SELECT relationship, n_child, n_orphans,
        |  CAST(n_orphans AS DOUBLE) / n_child AS orphan_ratio
        |FROM a ORDER BY relationship""".stripMargin,
    "h1_histogram" ->
      """WITH c AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |         l_quantity
        |  FROM lineitem),
        |b AS (
        |  SELECT CAST(cents // 500000 AS INTEGER) AS bin, cents, l_quantity FROM c)
        |SELECT bin, CAST(bin AS BIGINT) * 5000 AS bin_lo,
        |  COUNT(*) AS n_items,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_price,
        |  CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_price
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "u1_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 25),
        |m AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM e),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM m
        |  WHERE prev_attr IS NULL OR prev_attr <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS version,
        |  event_type,
        |  ts AS effective_from,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS effective_to,
        |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM c ORDER BY user_id, version""".stripMargin,
    "g1_pagerank" ->
      """WITH nodes AS (SELECT CAST(n_nationkey AS BIGINT) AS node, n_name FROM nation),
        |cnt AS (SELECT COUNT(*) AS n FROM nodes),
        |edges AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS src, CAST(s_nationkey AS BIGINT) AS dst,
        |         COUNT(*) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
        |e AS (SELECT edges.src, dst, CAST(w AS BIGINT) AS w, out_w
        |      FROM edges JOIN outw ON edges.src = outw.src),
        |r0 AS (SELECT node, CAST(1000000000000 // (SELECT n FROM cnt) AS BIGINT) AS r FROM nodes),
        |i1 AS (
        |  SELECT nd.node,
        |    CAST(150000000000 // (SELECT n FROM cnt) AS BIGINT)
        |      + (85 * COALESCE(t.s, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT dst, CAST(SUM((r * w) // out_w) AS BIGINT) AS s
        |    FROM e JOIN r0 ON e.src = r0.node GROUP BY dst) t ON nd.node = t.dst),
        |i2 AS (
        |  SELECT nd.node,
        |    CAST(150000000000 // (SELECT n FROM cnt) AS BIGINT)
        |      + (85 * COALESCE(t.s, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT dst, CAST(SUM((r * w) // out_w) AS BIGINT) AS s
        |    FROM e JOIN i1 ON e.src = i1.node GROUP BY dst) t ON nd.node = t.dst),
        |i3 AS (
        |  SELECT nd.node,
        |    CAST(150000000000 // (SELECT n FROM cnt) AS BIGINT)
        |      + (85 * COALESCE(t.s, 0)) // 100 AS r
        |  FROM nodes nd LEFT JOIN (
        |    SELECT dst, CAST(SUM((r * w) // out_w) AS BIGINT) AS s
        |    FROM e JOIN i2 ON e.src = i2.node GROUP BY dst) t ON nd.node = t.dst)
        |SELECT nodes.node AS node, n_name, r AS rank_micro,
        |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
        |FROM nodes JOIN i3 ON nodes.node = i3.node
        |ORDER BY rank_micro DESC, nodes.node""".stripMargin,
    "t14_token_freq" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
        |f AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok)
        |SELECT doc_id,
        |  COUNT(*) AS n_distinct,
        |  CAST(CAST(SUM(df) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_df,
        |  CAST(CAST(SUM(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS rare_ratio,
        |  CAST(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS hapax_ratio
        |FROM dt JOIN f ON dt.tok = f.tok
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "z1_zvalue" ->
      s"""WITH k AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_partkey % 65536 AS a, l_suppkey % 65536 AS b
         |  FROM lineitem WHERE l_orderkey < 100)
         |SELECT l_orderkey, l_linenumber, a, b,
         |  ${graft.operators.Layout.zValueSql("a", "b")} AS z
         |FROM k ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q21_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_priority,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q22_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  COUNT(*) FILTER (WHERE event_type='click') AS click,
        |  COUNT(*) FILTER (WHERE event_type='view') AS view,
        |  COUNT(*) FILTER (WHERE event_type='purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type='error') AS error
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q24_topk_agg" ->
      """WITH g AS (
        |  SELECT l_returnflag, l_suppkey, SUM(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, l_suppkey, qty,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qty DESC, l_suppkey) AS INTEGER) AS rank
        |  FROM g)
        |SELECT l_returnflag, rank, l_suppkey, qty FROM r
        |WHERE rank <= 3 ORDER BY l_returnflag, rank""".stripMargin,
    "q25_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q26_scalar_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS n_above,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS min_qty
        |FROM lineitem
        |WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q27_window_range" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_date,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
        |         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_no
        |  FROM orders GROUP BY 1)
        |SELECT order_date,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS ma7_revenue
        |FROM daily
        |WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY order_date""".stripMargin,
    "q28_ntile" ->
      """WITH q AS (
        |  SELECT c_custkey, c_acctbal,
        |         NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile
        |  FROM customer)
        |SELECT quartile, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
        |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin,
    // window-formulation as-of twin; cross-checked equal to DuckDB's
    // native ASOF JOIN on this data (the window form has a defined
    // tie-break where ASOF's same-timestamp pick is unspecified)
    "a1_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |c AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    LAST_VALUE(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    LAST_VALUE(CASE WHEN event_type='click' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  click_id, click_ts, epoch_us(ts) - epoch_us(click_ts) AS gap_us
        |FROM c WHERE event_type='purchase' ORDER BY purchase_id""".stripMargin,
    "a2_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
        |  COUNT(c.ts) AS n_clicks,
        |  CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        | AND c.ts > p.ts AND c.ts <= p.ts + INTERVAL 30 MINUTE
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin,
    "p1_split_assign" ->
      s"""WITH b AS (
         |  SELECT doc_id, $splitBucketSql AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket, ${splitCaseSql("bucket")} AS split
         |FROM b ORDER BY doc_id""".stripMargin,
    "p2_stratified_sample" ->
      """WITH k AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT % 100 < 30 AS kept
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS sampled_id_sum
        |FROM k GROUP BY source ORDER BY source""".stripMargin,
    "p3_reservoir" ->
      """WITH r AS (
        |  SELECT source, doc_id,
        |    ('0x' || substr(md5('res|' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT AS rk
        |  FROM documents),
        |w AS (
        |  SELECT source, doc_id, rk,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY rk, doc_id) AS INTEGER) AS rn
        |  FROM r)
        |SELECT source, rn, doc_id, rk FROM w WHERE rn <= 5
        |ORDER BY source, rn""".stripMargin,
    "p4_packing" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - n_tokens) // 256 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
        |FROM c GROUP BY source, bin
        |ORDER BY source, bin""".stripMargin,
    "p5_mixture" ->
      s"""WITH w AS (
         |  SELECT * FROM (VALUES $mixtureValuesSql) AS t(source, rate_pct)),
         |k AS (
         |  SELECT d.source, COALESCE(w.rate_pct, 50) AS rate_pct, doc_id,
         |    ('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT % 100
         |      < COALESCE(w.rate_pct, 50) AS kept
         |  FROM documents d LEFT JOIN w ON d.source = w.source)
         |SELECT source, rate_pct, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN kept THEN doc_id END) AS BIGINT) AS kept_id_sum
         |FROM k GROUP BY source, rate_pct ORDER BY source""".stripMargin,
    // q32's oracle is deliberately the PLAIN join: the bloom prunes
    // but never changes the result (false positives are cleared by the
    // exact join; false negatives are impossible)
    "q32_bloom_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q29_correlated_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM orders i
        |       WHERE i.o_orderstatus = o.o_orderstatus) >
        |      (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i
        |       WHERE i.o_orderstatus = o.o_orderstatus)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q30_join_full" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
        |pend AS (
        |  SELECT o_custkey, COUNT(*) AS n_pending
        |  FROM orders WHERE o_orderstatus = 'P' AND o_totalprice > 250000
        |  GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |  CAST(c_acctbal AS DOUBLE) AS acctbal, n_pending
        |FROM cust FULL OUTER JOIN pend ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q44_nullsafe_join" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(NULLIF(regexp_extract(props, '"k": *([0-9]+)', 1), '') AS BIGINT) % 5 AS k
        |  FROM events),
        |c AS (SELECT k, COUNT(*) AS n_clicks FROM e WHERE event_type = 'click' GROUP BY k),
        |v AS (SELECT k, COUNT(*) AS n_views FROM e WHERE event_type = 'view' GROUP BY k)
        |SELECT c.k AS k, n_clicks, n_views
        |FROM c JOIN v ON c.k IS NOT DISTINCT FROM v.k
        |ORDER BY c.k NULLS FIRST""".stripMargin,
    "q43_date_rollup" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(MIN(DATE '1998-12-31' - CAST(o_orderdate AS DATE)) AS INTEGER) AS min_age_days,
        |  CAST(MAX(DATE '1998-12-31' - CAST(o_orderdate AS DATE)) AS INTEGER) AS max_age_days
        |FROM orders
        |GROUP BY month_start, qtr ORDER BY month_start""".stripMargin,
    "q42_string_agg" ->
      """WITH ranked AS (
        |  SELECT c_nationkey, c_custkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer QUALIFY rn <= 3)
        |SELECT c_nationkey,
        |  string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY rn) AS top3_custkeys,
        |  COUNT(*) AS n
        |FROM ranked GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q41_window_family2" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(c_acctbal AS DOUBLE) AS acctbal,
        |  LEAD(c_custkey, 1) OVER w AS next_custkey,
        |  CUME_DIST() OVER w AS cdist,
        |  LAST_VALUE(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_custkey,
        |  NTH_VALUE(c_custkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_custkey
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "q31_rank_family" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_custkey,
        |    CAST(c_acctbal AS DOUBLE) AS acctbal,
        |    CAST(DENSE_RANK() OVER w AS INTEGER) AS pos,
        |    PERCENT_RANK() OVER w AS pct,
        |    FIRST_VALUE(c_custkey) OVER w AS top_custkey
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |SELECT c_nationkey, c_custkey, acctbal, pos, pct, top_custkey
        |FROM r WHERE pos <= 2 ORDER BY c_nationkey, pos, c_custkey""".stripMargin,
    "e1_props_struct" ->
      """WITH e AS (
        |  SELECT event_type,
        |         TRY_CAST(NULLIF(regexp_extract(props, '"k": *([0-9]+)', 1), '') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, k % 10 AS k_mod, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type, k % 10
        |ORDER BY event_type NULLS FIRST, k_mod NULLS FIRST""".stripMargin,
    "t7_chunking" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |st0 AS (SELECT doc_id, w, unnest(range(1, len(w) + 1, 48)) AS start FROM tok),
        |st AS (SELECT * FROM st0 WHERE start = 1 OR start <= len(w) - 16),
        |ch AS (
        |  SELECT doc_id,
        |    CAST((start - 1) // 48 AS INTEGER) AS chunk_idx,
        |    w[start : start + 63] AS chunk
        |  FROM st)
        |SELECT doc_id, chunk_idx,
        |  CAST(len(chunk) AS INTEGER) AS n_tokens,
        |  chunk[1] AS first_token, chunk[-1] AS last_token
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,
    "t8_length_stats" ->
      """WITH q AS (
        |  SELECT source, n_chars,
        |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_docs,
        |  MIN(n_tokens) AS min_tokens,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tokens) AS p50_tokens,
        |  percentile_cont(0.95) WITHIN GROUP (ORDER BY n_tokens) AS p95_tokens,
        |  MAX(n_tokens) AS max_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    // t15 oracle: every fractional literal CAST to DOUBLE — DuckDB
    // decimal literals would compute an exact product and round once,
    // diverging from IEEE double-literal arithmetic in the last ulp
    "t15_bm25" ->
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tot AS (SELECT COUNT(*) AS n_docs, CAST(SUM(len(w)) AS BIGINT) AS total_tokens FROM docs),
        |dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM docs),
        |tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS tok FROM docs) t
        |  WHERE tok IN ('query', 'window', 'merge') GROUP BY doc_id, tok),
        |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        |sc AS (
        |  SELECT tf.doc_id, tf.tok,
        |    (CAST(n_docs AS DOUBLE) / df) *
        |    (tf * CAST(2.2 AS DOUBLE)) /
        |    (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * CAST(dl.dl * n_docs AS DOUBLE) / total_tokens)) AS term_score
        |  FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot),
        |ag AS (
        |  SELECT doc_id,
        |    COALESCE(MAX(CASE WHEN tok = 'query' THEN term_score END), CAST(0 AS DOUBLE))
        |    + COALESCE(MAX(CASE WHEN tok = 'window' THEN term_score END), CAST(0 AS DOUBLE))
        |    + COALESCE(MAX(CASE WHEN tok = 'merge' THEN term_score END), CAST(0 AS DOUBLE)) AS score,
        |    COUNT(*) AS n_terms_hit
        |  FROM sc GROUP BY doc_id)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
        |  doc_id, n_terms_hit, score
        |FROM ag QUALIFY rank <= 10 ORDER BY rank""".stripMargin,
    "t9_tfidf" ->
      """WITH tf AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY doc_id, tok),
        |dfc AS (SELECT tok, COUNT(*) AS df FROM tfc GROUP BY tok),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |sc AS (
        |  SELECT doc_id, tok, tf, df,
        |         CAST(tf * n_docs AS DOUBLE) / df AS tfidf
        |  FROM tfc JOIN dfc USING (tok) CROSS JOIN n),
        |rk AS (
        |  SELECT doc_id, tok, tf, df, tfidf,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INTEGER) AS rank
        |  FROM sc)
        |SELECT doc_id, rank, tok, tf, df, tfidf
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "t10_pii_redact" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    text || ' reach user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS withpii
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(withpii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(withpii, '\+1-555-[0-9]{4}')) AS INTEGER) AS n_phones,
        |  md5(regexp_replace(
        |        regexp_replace(withpii, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |        '\+1-555-[0-9]{4}', '[PHONE]', 'g')) AS redacted_md5
        |FROM w ORDER BY doc_id""".stripMargin,
    "t11_quality_filter" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','to','in','is'], t))) AS n_stop,
        |    len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |    CAST(len(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE) AS sum_len,
        |    len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
        |    len(text) AS n_chars
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  n_tokens BETWEEN 15 AND 90 AS ok_len,
        |  sum_len / n_tokens BETWEEN 3.0 AND 9.0 AS ok_word_len,
        |  n_stop > 0 AS ok_stop,
        |  CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3 AS ok_distinct,
        |  CAST(n_digits AS DOUBLE) / n_chars <= 0.2 AS ok_digit,
        |  (n_tokens BETWEEN 15 AND 90) AND (sum_len / n_tokens BETWEEN 3.0 AND 9.0)
        |    AND n_stop > 0 AND CAST(n_distinct AS DOUBLE) / n_tokens >= 0.3
        |    AND CAST(n_digits AS DOUBLE) / n_chars <= 0.2 AS keep
        |FROM q ORDER BY doc_id""".stripMargin,
    "t12_bigrams" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        |  FROM t),
        |c AS (
        |  SELECT bigram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
        |  FROM b WHERE bigram IS NOT NULL GROUP BY bigram)
        |SELECT bigram, cnt, df FROM c
        |ORDER BY cnt DESC, df DESC, bigram LIMIT 40""".stripMargin,
    "t13_bigram_hitrate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS tok,
        |    unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        |  FROM t),
        |db AS (SELECT doc_id, bigram FROM b WHERE bigram IS NOT NULL),
        |c AS (
        |  SELECT bigram, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
        |  FROM db GROUP BY bigram),
        |top AS (SELECT bigram FROM c ORDER BY cnt DESC, df DESC, bigram LIMIT 40)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CASE WHEN top.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  CAST(SUM(CASE WHEN top.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    / CAST(COUNT(*) AS DOUBLE) AS hit_rate
        |FROM db LEFT JOIN top ON db.bigram = top.bigram
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t5_repetition" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
        |w AS (
        |  SELECT doc_id, tok, cnt,
        |    CAST(SUM(cnt) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, tok) AS rn
        |  FROM c)
        |SELECT doc_id, tok AS top_token, cnt AS top_count, n_tokens,
        |  cnt / CAST(n_tokens AS DOUBLE) AS top_ratio
        |FROM w WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY rep_doc_id""".stripMargin,
    "d2_dedup_hash" ->
      """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT sha256(text)) AS n_distinct
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // d9 oracle: the ONE-SHOT dedup of the full table — the
    // incremental change-feed run must converge to exactly this
    "d9_incremental_dedup" ->
      """SELECT MIN(doc_id) AS rep_doc_id
        |FROM documents GROUP BY sha256(text) ORDER BY rep_doc_id""".stripMargin,
    "d3_minhash_lsh" -> d3Sql,
    // d10 shares d3's oracle verbatim: the incremental change-feed run
    // must accumulate to exactly the one-shot LSH result
    "d10_incremental_lsh" -> d3Sql,
    "d4_simhash" -> d4Sql,
    "d7_simhash_neardup" -> d7Sql,
    "d6_dedup_clusters" -> d6Sql,
    "d11_canonical_docs" -> d11Sql,
    "c1_contamination" -> c1Sql,
    "c2_benchmark_decontam" -> c2Sql,
    "d8_dup_passages" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh0 AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(range(1, len(w) - 6),
        |           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7]))) AS shs
        |  FROM tok),
        |sh AS (SELECT doc_id, ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sh FROM sh0),
        |f AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
        |SELECT doc_id, COUNT(*) AS n_windows,
        |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
        |  CAST(CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE) / COUNT(*) AS dup_ratio,
        |  MAX(df) AS max_window_df
        |FROM sh JOIN f USING (sh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t6_vocab" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf
        |FROM t GROUP BY tok
        |ORDER BY df DESC, cf DESC, tok LIMIT 50""".stripMargin,
    "d5_ngram_jaccard" ->
      """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh0 AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_transform(range(1, len(w) - 3), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]))) AS shs
        |  FROM tok),
        |shall AS (
        |  SELECT doc_id, ('0x' || substr(md5(shs), 1, 15))::BIGINT AS sh FROM sh0),
        |hot AS (SELECT sh FROM shall GROUP BY sh HAVING COUNT(*) > 100),
        |sh AS (SELECT doc_id, sh FROM shall WHERE sh NOT IN (SELECT sh FROM hot)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |common AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT d1, d2, c / (z1.n_sh + z2.n_sh - c) AS jaccard
        |FROM common JOIN sizes z1 ON z1.doc_id = d1 JOIN sizes z2 ON z2.doc_id = d2
        |WHERE c / (z1.n_sh + z2.n_sh - c) >= 0.8
        |ORDER BY d1, d2""".stripMargin,

    "t1_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_re_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality_score" ->
      """WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        |  CAST(len(w) AS INTEGER) AS n_tokens,
        |  len(list_distinct(w)) / len(w) AS distinct_ratio,
        |  len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is'], t))) / len(w) AS stopword_ratio,
        |  (length(text) - (len(w) - 1)) / len(w) AS avg_token_len,
        |  0.5 * (len(list_distinct(w)) / len(w))
        |    + 0.3 * (1.0 - len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is'], t))) / len(w))
        |    + 0.2 * least((length(text) - (len(w) - 1)) / len(w) / 8.0, 1.0) AS quality
        |FROM q ORDER BY doc_id""".stripMargin,
    // t16 oracle: the identical integer-micro feature quantization,
    // exact BIGINT margin, and rational squash — weight-for-weight
    "t16_quality_model" ->
      """WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |f AS (SELECT doc_id,
        |  CAST(round(1000000.0 * len(list_distinct(w)) / len(w)) AS BIGINT) AS x_distinct,
        |  CAST(round(1000000.0 * len(list_filter(w, t -> list_contains(['the','a','of','and','to','in','is'], t))) / len(w)) AS BIGINT) AS x_stopword,
        |  CAST(round(1000000.0 * (length(text) - (len(w) - 1)) / len(w) / 8.0) AS BIGINT) AS x_len,
        |  CAST(len(w) AS BIGINT) AS n_tokens FROM q),
        |m AS (SELECT *,
        |  3 * x_distinct - 2 * x_stopword + x_len + 800 * n_tokens - 1900000 AS margin_micro
        |FROM f)
        |SELECT doc_id, x_distinct, x_stopword, x_len, n_tokens,
        |  CAST(margin_micro AS BIGINT) AS margin_micro,
        |  round(CAST(margin_micro AS DOUBLE) / (1000000.0 + CAST(abs(margin_micro) AS DOUBLE)), 6) AS score6,
        |  CAST(CASE WHEN margin_micro >= 0 THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "t3_lang_id" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['the','a','and','of'], t))) AS INTEGER) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['der','die','und','das'], t))) AS INTEGER) AS s_de,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['el','la','los','que'], t))) AS INTEGER) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['le','les','des','une'], t))) AS INTEGER) AS s_fr,
        |    CAST(len(list_filter(string_split(text,' '), t -> list_contains(['de5','shi4','le5','zai4'], t))) AS INTEGER) AS s_zh
        |  FROM documents)
        |SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
        |  CASE
        |    WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'en'
        |    WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'de'
        |    WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'es'
        |    WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'fr'
        |    WHEN s_zh = greatest(s_en, s_de, s_es, s_fr, s_zh) AND greatest(s_en, s_de, s_es, s_fr, s_zh) > 0 THEN 'zh'
        |    ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ' '),
        |        t -> CAST(('0x' || substring(md5(t), 1, 12)) AS BIGINT))),
        |    (acc, x) -> (acc * 131 + x) % 1000000007) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "s1_knn_brute" -> s1Sql,
    "s2_knn_bucketed" -> s2Sql,
    "s4_embed_neardup" ->
      """WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) +
        |    (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END) +
        |    (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END) +
        |    (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS bucket
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id1, b2.vec_id AS id2,
        |    ROUND(
        |      list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * b2.v[i])), (s, x) -> s + x)
        |      / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * a.v[i])), (s, x) -> s + x))
        |       * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(b2.v)+1), i -> b2.v[i] * b2.v[i])), (s, x) -> s + x))),
        |      6) AS cos6
        |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
        |SELECT id1, id2, cos6 FROM p WHERE cos6 >= 0.4 ORDER BY id1, id2""".stripMargin,
    "s5_knn_ivf" -> s5Sql,
    "s10_ann_recall" -> s10Sql,
    // sd1 oracle: the ε-dominance rule replayed relationally over the
    // SAME deterministic IVF cells (s5's integer-micro codebook CTEs)
    // — a vector is dropped iff a lower-id cell-mate is within cosine
    // 0.4 (rounded 6dp, both engines)
    "sd1_semantic_dedup" ->
      """WITH tall AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |cent AS (
        |  SELECT label AS c_label, pos,
        |         CAST(CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_mean
        |  FROM tall JOIN lab USING (vec_id)
        |  GROUP BY label, pos),
        |scores AS (
        |  SELECT vec_id, c_label,
        |         CAST(SUM(CAST(ROUND(x * c_mean * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score
        |  FROM tall JOIN cent USING (pos)
        |  GROUP BY vec_id, c_label),
        |cells AS (
        |  SELECT vec_id, c_label AS cell
        |  FROM scores
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) = 1),
        |vecs AS (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, cells.cell
        |  FROM embeddings e JOIN cells ON e.vec_id = cells.vec_id),
        |dup AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM vecs a JOIN vecs b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE ROUND(
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])), (s, x) -> s + x)
        |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * a.v[i])), (s, x) -> s + x))
        |     * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])), (s, x) -> s + x))),
        |    6) >= 0.4),
        |sel AS (
        |  SELECT v.cell, v.vec_id,
        |    CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
        |  FROM vecs v LEFT JOIN dup d ON v.vec_id = d.vec_id)
        |SELECT cell, COUNT(*) AS n_vectors,
        |  CAST(SUM(is_dup) AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN is_dup = 0 THEN vec_id ELSE 0 END) AS BIGINT) AS kept_id_sum
        |FROM sel GROUP BY cell ORDER BY cell""".stripMargin,
    // sd2 oracle: sd1's dominance rule under the codebook FROZEN on
    // the initial load (centroids from vec_id <= max/3, s9's cut) —
    // the incrementally-maintained index must aggregate to exactly
    // this one-shot replay
    "sd2_incremental_semantic" ->
      """WITH tall AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |cut AS (SELECT MAX(vec_id) // 3 AS c FROM embeddings),
        |cent AS (
        |  SELECT label AS c_label, pos,
        |         CAST(CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_mean
        |  FROM tall JOIN lab USING (vec_id)
        |  WHERE vec_id <= (SELECT c FROM cut)
        |  GROUP BY label, pos),
        |scores AS (
        |  SELECT vec_id, c_label,
        |         CAST(SUM(CAST(ROUND(x * c_mean * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score
        |  FROM tall JOIN cent USING (pos)
        |  GROUP BY vec_id, c_label),
        |cells AS (
        |  SELECT vec_id, c_label AS cell
        |  FROM scores
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) = 1),
        |vecs AS (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, cells.cell
        |  FROM embeddings e JOIN cells ON e.vec_id = cells.vec_id),
        |dup AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM vecs a JOIN vecs b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE ROUND(
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * b.v[i])), (s, x) -> s + x)
        |    / (sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i] * a.v[i])), (s, x) -> s + x))
        |     * sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(b.v)+1), i -> b.v[i] * b.v[i])), (s, x) -> s + x))),
        |    6) >= 0.4),
        |sel AS (
        |  SELECT v.cell, v.vec_id,
        |    CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
        |  FROM vecs v LEFT JOIN dup d ON v.vec_id = d.vec_id)
        |SELECT cell, COUNT(*) AS n_vectors,
        |  CAST(SUM(is_dup) AS BIGINT) AS n_dropped,
        |  CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN is_dup = 0 THEN vec_id ELSE 0 END) AS BIGINT) AS kept_id_sum
        |FROM sel GROUP BY cell ORDER BY cell""".stripMargin,
    // s9 oracle: s5's probe with the codebook FROZEN on the initial
    // load (centroids from vec_id <= max/3) — the incremental index
    // must serve exactly the one-shot assignment under that codebook
    "s9_incremental_ivf" ->
      """WITH tall AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |cut AS (SELECT MAX(vec_id) // 3 AS c FROM embeddings),
        |cent AS (
        |  SELECT label AS c_label, pos,
        |         CAST(CAST(SUM(CAST(ROUND(x * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS c_mean
        |  FROM tall JOIN lab USING (vec_id)
        |  WHERE vec_id <= (SELECT c FROM cut)
        |  GROUP BY label, pos),
        |scores AS (
        |  SELECT vec_id, c_label,
        |         CAST(SUM(CAST(ROUND(x * c_mean * 1000000000000.0) AS BIGINT)) AS BIGINT) AS score
        |  FROM tall JOIN cent USING (pos)
        |  GROUP BY vec_id, c_label),
        |cells AS (
        |  SELECT vec_id, c_label AS cell
        |  FROM scores
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) = 1),
        |vecs AS (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, cells.cell
        |  FROM embeddings e JOIN cells ON e.vec_id = cells.vec_id),
        |q AS (SELECT vec_id AS q_id, v AS q, cell FROM vecs WHERE vec_id < 8),
        |c AS (SELECT vec_id AS c_id, v AS c, cell FROM vecs WHERE vec_id >= 8),
        |p AS (
        |  SELECT q_id, c_id, q.cell,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * c.c[i])), (s, x) -> s + x) AS dqc,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(q.q)+1), i -> q.q[i] * q.q[i])), (s, x) -> s + x) AS dqq,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(c.c)+1), i -> c.c[i] * c.c[i])), (s, x) -> s + x) AS dcc
        |  FROM q JOIN c ON q.cell = c.cell),
        |r AS (SELECT q_id, c_id, cell, ROUND(dqc / (sqrt(dqq) * sqrt(dcc)), 6) AS cos6 FROM p),
        |rk AS (SELECT q_id, c_id, cell, cos6,
        |       CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos6 DESC, c_id) AS INTEGER) AS rank FROM r)
        |SELECT q_id, rank, c_id, cos6, cell FROM rk WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin,
    "s8_knn_hybrid" -> s8Sql,
    "s7_knn_pq" -> s7Sql,
    "s6_quantize" ->
      """WITH m AS (
        |  SELECT vec_id,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS micro
        |  FROM embeddings),
        |mm AS (
        |  SELECT vec_id, micro,
        |    list_max(list_transform(micro, x -> abs(x))) AS maxabs_micro
        |  FROM m),
        |t AS (
        |  SELECT vec_id, maxabs_micro,
        |    unnest(micro) AS mv,
        |    unnest(range(0, len(micro))) AS pos
        |  FROM mm),
        |q AS (
        |  SELECT vec_id, maxabs_micro, mv, pos,
        |    CAST(floor(CAST(mv * 127 AS DOUBLE) / greatest(maxabs_micro, 1)) AS BIGINT) AS qv
        |  FROM t)
        |SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS dim, maxabs_micro,
        |  CAST(SUM(mv * mv) AS BIGINT) AS norm_sq_micro,
        |  CAST(SUM(qv) AS BIGINT) AS q_sum,
        |  CAST(SUM(abs(qv)) AS BIGINT) AS q_abs_sum,
        |  CAST(SUM(qv * (pos + 1)) AS BIGINT) AS q_dot
        |FROM q GROUP BY vec_id, maxabs_micro ORDER BY vec_id""".stripMargin,
    "s3_label_centroids" ->
      """WITH tall AS (
        |  SELECT label, 0 AS pos, embedding[1] AS x FROM embeddings
        |  UNION ALL SELECT label, 1, embedding[2] FROM embeddings
        |  UNION ALL SELECT label, 2, embedding[3] FROM embeddings
        |  UNION ALL SELECT label, 3, embedding[4] FROM embeddings),
        |m AS (
        |  SELECT label, pos, CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS micro FROM tall)
        |SELECT label, pos,
        |  CAST(CAST(SUM(micro) AS BIGINT) AS DOUBLE) / 1000000.0 / COUNT(*) AS mean,
        |  COUNT(*) AS n
        |FROM m GROUP BY label, pos ORDER BY label, pos""".stripMargin,

    "m2_frame_sample" ->
      """SELECT doc_id AS media_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  CAST(unnest(range(0, CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER), 4)) AS INTEGER) AS frame_idx
        |FROM documents WHERE doc_id < 50
        |ORDER BY media_id, frame_idx""".stripMargin,
    "m1_media_features" ->
      """SELECT doc_id AS media_id,
        |  (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 64 + 1 AS INTEGER) AS width,
        |  CAST(CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 64 + 1 AS INTEGER) AS height,
        |  CAST(octet_length(encode(text)) % 16 + 1 AS INTEGER) AS n_frames
        |FROM documents ORDER BY media_id""".stripMargin,
    // m4 oracle: documents text is ASCII-safe here, so strlen(text)
    // (bytes) equals Spark's length(encode(text,'utf-8')) exactly
    "m4_batch_pack" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (['image','audio','video'])[(doc_id % 3 + 1)] AS kind,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents),
        |c AS (
        |  SELECT media_id, kind, n_bytes,
        |    SUM(n_bytes) OVER (PARTITION BY kind ORDER BY media_id ROWS UNBOUNDED PRECEDING) AS cum_bytes
        |  FROM m)
        |SELECT kind, CAST((cum_bytes - n_bytes) // 4096 AS BIGINT) AS batch_id, COUNT(*) AS n_items,
        |  CAST(SUM(n_bytes) AS BIGINT) AS batch_bytes,
        |  MIN(media_id) AS first_id, MAX(media_id) AS last_id
        |FROM c GROUP BY kind, batch_id ORDER BY kind, batch_id""".stripMargin,
    "m3_resize" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
        |    CAST(CAST(('0x' || substring(md5(text), 1, 4)) AS BIGINT) % 64 + 1 AS INTEGER) AS width,
        |    CAST(CAST(('0x' || substring(md5(text), 5, 4)) AS BIGINT) % 64 + 1 AS INTEGER) AS height,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |r AS (
        |  SELECT media_id, kind, width, height, n_bytes,
        |    CAST(greatest(1, width * 32 // greatest(width, height, 32)) AS INTEGER) AS new_width,
        |    CAST(greatest(1, height * 32 // greatest(width, height, 32)) AS INTEGER) AS new_height
        |  FROM f)
        |SELECT media_id, kind, width, height, new_width, new_height, n_bytes,
        |  CAST(greatest(1, n_bytes * (CAST(new_width AS BIGINT) * new_height) // (CAST(width AS BIGINT) * height)) AS BIGINT) AS new_n_bytes
        |FROM r ORDER BY media_id""".stripMargin
  )
}
