package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every query here has a matching DuckDB oracle in
  * [[oracleSql]] unless the operator is not ANSI-SQL-expressible
  * (approximate/LSH ops), which get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: the reference's whole ingest path (validate → DLQ-split →
    * keep-last dedup) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Ingest.pipeline(Tables.events(spark, "/root/testdata/sf0.001"))

  // Constants shared by the Spark queries and their oracles.
  private val RawUser = 42L
  private val RawStart = "2024-01-05 00:00:00"
  private val RawEnd = "2024-01-20 00:00:00"

  // One process-stable result-cache root for the cached-endpoint gate
  // (cleaned up by the JVM's temp reaper; never one dir per call).
  private lazy val gateCacheRoot: String =
    java.nio.file.Files.createTempDirectory("graft_rc_gate").toString

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A. ingestion pipeline (SURVEY §2A) ─────────────────────────────
    "ingest_validate" -> ((s, d) => Ingest.validate(Tables.events(s, d))),
    "ingest_dlq" -> ((s, d) => Ingest.dlq(Tables.events(s, d))),
    "ingest_dedup" -> ((s, d) => Ingest.dedupKeepLast(Tables.events(s, d))),
    "ingest_batch_stats" -> ((s, d) => Ingest.batchStats(Tables.events(s, d))),
    "ingest_pipeline" -> ((s, d) => Ingest.pipeline(Tables.events(s, d))),
    "ingest_props_extract" -> ((s, d) => Ingest.extractProps(Tables.events(s, d))),
    "ingest_dlq_replay" -> ((s, d) => Ingest.dlqReplay(Tables.events(s, d))),
    // ── B. query service (SURVEY §2B) ──────────────────────────────────
    "raw_station" -> ((s, d) =>
      StationQueries.rawStation(Tables.events(s, d), RawUser, RawStart, RawEnd)),
    "raw_station_all" -> ((s, d) =>
      StationQueries.rawStationAll(Tables.events(s, d), RawUser)),
    // the reference's cached endpoint (query/main.py:183-191): first
    // call populates the TTL'd result cache, second SERVES FROM IT —
    // the compute thunk of the second call throws if ever invoked, so
    // the oracle-gated rows provably came from the cache entry
    "raw_station_cached" -> ((s, d) => {
      // the sf dir is a cache-key param (the shared root serves every
      // SF this process touches), and the root is process-stable so
      // repeated gate runs reuse one temp dir instead of leaking one
      // populated cache per invocation
      val key = graft.sources.ResultCache.keyOf("raw_station",
        Seq(d, RawUser.toString, RawStart, RawEnd))
      graft.sources.ResultCache.getOrCompute(s, gateCacheRoot, key, ttlMs = 300000L)(
        StationQueries.rawStation(Tables.events(s, d), RawUser, RawStart, RawEnd))
      graft.sources.ResultCache.getOrCompute(s, gateCacheRoot, key, ttlMs = 300000L)(
        sys.error("cache hit must not recompute"))
    }),
    "agg_station" -> ((s, d) =>
      StationQueries.aggStation(Tables.events(s, d), RawUser, RawStart, RawEnd)),
    "timeseries_bucket" -> ((s, d) =>
      StationQueries.timeseriesBucket(Tables.events(s, d))),
    "timeseries_station" -> ((s, d) =>
      StationQueries.timeseriesStation(Tables.events(s, d), RawUser, RawStart,
        RawEnd, "30 minutes")),
    "latest_per_key" -> ((s, d) =>
      StationQueries.latestPerKey(Tables.events(s, d))),
    "timeseries_gapfill" -> ((s, d) =>
      StationQueries.gapfillLocf(Tables.events(s, d), RawUser, RawStart, RawEnd)),
    "timeseries_moving_avg" -> ((s, d) =>
      StationQueries.movingAvg(Tables.events(s, d))),
    "timeseries_sliding" -> ((s, d) =>
      StationQueries.slidingWindow(Tables.events(s, d))),
    "timeseries_gaps" -> ((s, d) =>
      StationQueries.gapDetect(Tables.events(s, d))),
    // ── C. analytics (SURVEY §2C) ──────────────────────────────────────
    "q1_agg" -> ((s, d) => Analytics.q1PricingSummary(Tables.lineitem(s, d))),
    "q3_shipping" -> ((s, d) => Analytics.q3Shipping(s,
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) => Analytics.q5LocalSupplier(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q4_priority" -> ((s, d) => Analytics.q4Priority(
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "q7_volume" -> ((s, d) => Analytics.q7Volume(
      Tables.nation(s, d), Tables.customer(s, d), Tables.orders(s, d),
      Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q10_returns" -> ((s, d) => Analytics.q10Returns(
      Tables.nation(s, d), Tables.customer(s, d), Tables.orders(s, d),
      Tables.lineitem(s, d))),
    "q14_promo" -> ((s, d) => Analytics.q14Promo(
      Tables.part(s, d), Tables.lineitem(s, d))),
    "q18_big_orders" -> ((s, d) => Analytics.q18BigOrders(
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q6_forecast_revenue" -> ((s, d) =>
      Analytics.q6ForecastRevenue(Tables.lineitem(s, d))),
    "q8_market_share" -> ((s, d) => Analytics.q8MarketShare(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d),
      Tables.part(s, d))),
    "q9_profit_proxy" -> ((s, d) => Analytics.q9ProfitProxy(
      Tables.nation(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.supplier(s, d), Tables.part(s, d))),
    "q13_order_distribution" -> ((s, d) => Analytics.q13OrderDistribution(
      Tables.customer(s, d), Tables.orders(s, d))),
    "q15_top_supplier" -> ((s, d) => Analytics.q15TopSupplier(
      Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q17_small_qty_revenue" -> ((s, d) => Analytics.q17SmallQtyRevenue(
      Tables.part(s, d), Tables.lineitem(s, d))),
    "q19_disjunctive_revenue" -> ((s, d) => Analytics.q19DisjunctiveRevenue(
      Tables.part(s, d), Tables.lineitem(s, d))),
    "q20_part_promotion" -> ((s, d) => Analytics.q20PartPromotion(
      Tables.nation(s, d), Tables.supplier(s, d), Tables.part(s, d),
      Tables.lineitem(s, d))),
    "q22_global_sales" -> ((s, d) => Analytics.q22GlobalSales(
      Tables.customer(s, d), Tables.orders(s, d))),
    "q2_min_cost_supplier" -> ((s, d) => Analytics.q2MinCostSupplier(
      Tables.region(s, d), Tables.nation(s, d), Tables.supplier(s, d),
      Tables.part(s, d), Tables.lineitem(s, d))),
    "q11_important_stock" -> ((s, d) => Analytics.q11ImportantStock(
      Tables.nation(s, d), Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q12_ship_lag" -> ((s, d) => Analytics.q12ShipLag(
      Tables.orders(s, d), Tables.lineitem(s, d))),
    "q16_supplier_cnt" -> ((s, d) => Analytics.q16SupplierCnt(
      Tables.supplier(s, d), Tables.part(s, d), Tables.lineitem(s, d))),
    "q21_waiting_orders" -> ((s, d) => Analytics.q21WaitingOrders(
      Tables.supplier(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "top_k_per_group" -> ((s, d) => Analytics.topKPerGroup(Tables.part(s, d))),
    "top_k_per_group_fast" -> ((s, d) => Analytics.topKPerGroupFast(Tables.part(s, d))),
    "events_sessionize" -> ((s, d) => Analytics.sessionize(Tables.events(s, d))),
    "events_sessionize_native" -> ((s, d) => Analytics.sessionizeNative(Tables.events(s, d))),
    "rollup_events" -> ((s, d) => Analytics.rollupEvents(Tables.events(s, d))),
    "asof_join" -> ((s, d) => AsofJoin.purchaseSignupAsof(Tables.events(s, d))),
    "asof_join_forward" -> ((s, d) => AsofJoin.purchaseSignupAsofForward(Tables.events(s, d))),
    "asof_join_tolerance" -> ((s, d) => AsofJoin.purchaseSignupAsofTolerance(Tables.events(s, d))),
    "pivot_events" -> ((s, d) => Analytics.pivotEvents(Tables.events(s, d))),
    "cube_events" -> ((s, d) => Analytics.cubeEvents(Tables.events(s, d))),
    "range_join" -> ((s, d) => Analytics.rangeJoinActivity(Tables.events(s, d))),
    "events_profile" -> ((s, d) => Analytics.eventsProfile(Tables.events(s, d))),
    "events_profile_approx" -> ((s, d) => Analytics.eventsProfileApprox(Tables.events(s, d))),
    "events_hll_rollup" -> ((s, d) => Analytics.hllRollup(Tables.events(s, d))),
    "events_anomaly" -> ((s, d) => Analytics.anomalyZScore(Tables.events(s, d))),
    "events_funnel" -> ((s, d) => Analytics.funnel(Tables.events(s, d))),
    "events_histogram" -> ((s, d) => Analytics.valueHistogram(Tables.events(s, d))),
    "events_dow_hour" -> ((s, d) => Analytics.dowHourProfile(Tables.events(s, d))),
    "retention_cohorts" -> ((s, d) => Analytics.retentionCohorts(Tables.events(s, d))),
    // ── D. LLM-training-data pipeline (SURVEY §2D) ─────────────────────
    "dedup_exact" -> ((s, d) => TextDedup.exact(Tables.documents(s, d))),
    "span_dedup" -> ((s, d) => TextDedup.spanDedup(Tables.documents(s, d))),
    "span_dedup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      val index = TextDedup.buildSpanIndex(docs.filter(col("doc_id") % 5 =!= 4))
      TextDedup.spanDedupIncremental(index, docs.filter(col("doc_id") % 5 === 4))
    }),
    "dedup_ngram_jaccard" -> ((s, d) => TextDedup.ngramJaccard(Tables.documents(s, d))),
    "dedup_minhash" -> ((s, d) => TextDedup.minhashLshAuto(Tables.documents(s, d))),
    "dedup_simhash" -> ((s, d) => TextDedup.simhashNearDups(Tables.documents(s, d))),
    "dedup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      // served from the persisted bucketed index (first call per sf-dir
      // builds it — the offline job; later calls pay batch cost only);
      // persisted ≡ in-memory is spec-proven, so the oracle is unchanged
      graft.ops.DedupServing.dedupIncremental(s, d)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    "dedup_embedding" -> ((s, d) => Similarity.embeddingNearDups(Tables.embeddings(s, d))),
    "dedup_embedding_lsh" -> ((s, d) => Similarity.embeddingNearDupsLshAuto(Tables.embeddings(s, d))),
    "knn_bruteforce" -> ((s, d) => Similarity.knnBruteForce(Tables.embeddings(s, d))),
    "knn_lsh" -> ((s, d) => Similarity.knnLsh(Tables.embeddings(s, d))),
    // IVF family served from a prebuilt PERSISTED index (build-once /
    // serve-many — the first call per sf-dir pays the KMeans build and
    // writes the serving layout; repeated calls run only the query
    // phase, which is what a deployment — and the bench — should time)
    "knn_ivf" -> ((s, d) => AnnServing.knnIvf(s, d)),
    "knn_ivf_sq8" -> ((s, d) => AnnServing.knnIvfSq8(s, d)),
    "knn_ivf_pq" -> ((s, d) => AnnServing.knnIvfPq(s, d)),
    "ann_recall_report" -> ((s, d) => AnnServing.recallReport(s, d)),
    "ivf_cell_stats" -> ((s, d) => AnnServing.ivfCellStats(s, d)),
    "corpus_curation" -> ((s, d) => Curation.curate(Tables.documents(s, d))),
    "corpus_curation_cc" -> ((s, d) => Curation.curateClustered(Tables.documents(s, d))),
    "corpus_curation_best" -> ((s, d) => Curation.curateKeepBest(Tables.documents(s, d))),
    "corpus_curation_rewrite" -> ((s, d) => Curation.curateRewrite(Tables.documents(s, d))),
    "curation_report" -> ((s, d) => Curation.curationReport(Tables.documents(s, d))),
    "corpus_datacard" -> ((s, d) => Corpus.datacard(Tables.documents(s, d))),
    // Plan-governance table over the flagship scale probes: audits each
    // named query's PHYSICAL plan (pushdown/pruning/shuffles/broadcasts/
    // codegen/degenerate joins) without executing any of their data
    // kernels — construction may run metadata-cheap corpus counts
    // (parquet count-stars, for auto geometry derivation) but never an
    // operator's compute. dedup_embedding_lsh is audited via its
    // PlanOnly form for exactly that reason: the production entry runs
    // real pre-measure jobs when the corpus outgrows the slice budget
    // (r14 verdict: that made this row 2.8× slower and its contract
    // false). `queries` is a def, so the lookup happens lazily per call
    // and never recurses.
    "plan_audit_report" -> ((s, d) => {
      val names = Seq("q1_agg", "q5_local_supplier", "q6_forecast_revenue",
        "q18_big_orders", "timeseries_station", "dedup_minhash",
        "dedup_embedding_lsh", "span_dedup", "contamination_check",
        "badword_filter", "seq_pack", "range_join", "top_k_per_group_fast",
        "epoch_shuffle", "length_percentiles", "span_dedup_incremental")
      graft.plans.PlanAudit.reportFor(names.map {
        case n @ "dedup_embedding_lsh" =>
          n -> Similarity.embeddingNearDupsLshPlanOnly(Tables.embeddings(s, d))
        case n => n -> queries(n)(s, d)
      })
    }),
    "text_stats" -> ((s, d) => TextAnalysis.textStats(Tables.documents(s, d))),
    "lang_id" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(Tables.documents(s, d))),
    "quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(Tables.documents(s, d))),
    "gopher_quality" -> ((s, d) => TextAnalysis.gopherQuality(Tables.documents(s, d))),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(Tables.documents(s, d))),
    "text_normalize" -> ((s, d) => Corpus.normalize(Tables.documents(s, d))),
    "split_assign" -> ((s, d) => Corpus.splitAssign(Tables.documents(s, d))),
    "sample_stratified" -> ((s, d) => Corpus.sampleStratified(Tables.documents(s, d))),
    "sample_weighted" -> ((s, d) => Corpus.sampleWeighted(Tables.documents(s, d))),
    "ngram_topk" -> ((s, d) => Corpus.ngramTopK(Tables.documents(s, d))),
    "tfidf_topterms" -> ((s, d) => Corpus.tfidfTopTerms(Tables.documents(s, d))),
    "source_quality" -> ((s, d) => Corpus.sourceQuality(Tables.documents(s, d))),
    "length_percentiles" -> ((s, d) => Corpus.lengthPercentiles(Tables.documents(s, d))),
    // V=16 on the 31-word synthetic vocabulary so OOV rates are nonzero
    "vocab_coverage" -> ((s, d) => Corpus.vocabCoverage(Tables.documents(s, d), 16)),
    "doc_lm_score" -> ((s, d) => Corpus.lmScore(Tables.documents(s, d))),
    // served from the persisted DSIR model (train-once per corpus dir,
    // AnnServing pattern) — persisted ≡ inline is spec-proven, so the
    // oracle below is the same estimator the inline form computes
    "dsir_weights" -> ((s, d) => DsirServing.dsirWeights(s, d)),
    "dsir_sample" -> ((s, d) => DsirServing.dsirSample(s, d)),
    // rows-only: seeded-KMeans clustering is deterministic but not
    // ANSI-expressible; SemDeDupSpec gates within-cell exactness
    "dedup_semantic" -> ((s, d) => Similarity.semDedup(Tables.embeddings(s, d))),
    "perplexity_buckets" -> ((s, d) => Corpus.perplexityBuckets(Tables.documents(s, d))),
    "doc_entropy" -> ((s, d) => TextAnalysis.entropy(Tables.documents(s, d))),
    "contamination_check" -> ((s, d) => Corpus.contamination(Tables.documents(s, d))),
    "split_leakage" -> ((s, d) => Corpus.splitLeakage(Tables.documents(s, d))),
    "split_leakage_bloom" -> ((s, d) => Corpus.splitLeakageBloom(Tables.documents(s, d))),
    "dedup_clusters" -> ((s, d) => Corpus.nearDupClusters(Tables.documents(s, d))),
    "doc_overlap" -> ((s, d) => Corpus.docOverlap(Tables.documents(s, d))),
    "doc_repetition" -> ((s, d) => TextAnalysis.repetition(Tables.documents(s, d))),
    "pii_redact" -> ((s, d) => TextAnalysis.piiRedact(Tables.documents(s, d))),
    "embed_quantize" -> ((s, d) => Similarity.quantizeInt8Stats(Tables.embeddings(s, d))),
    "seq_pack" -> ((s, d) => TrainingPrep.seqPack(Tables.documents(s, d))),
    "data_mix" -> ((s, d) => TrainingPrep.mixWeights(Tables.documents(s, d))),
    "mix_sample" -> ((s, d) => TrainingPrep.mixSample(Tables.documents(s, d))),
    "mix_pack" -> ((s, d) => TrainingPrep.mixPack(Tables.documents(s, d))),
    "shard_assign" -> ((s, d) => TrainingPrep.shardAssign(Tables.documents(s, d))),
    "epoch_shuffle" -> ((s, d) => TrainingPrep.epochShuffle(Tables.documents(s, d))),
    "badword_filter" -> ((s, d) => TrainingPrep.badwordFilter(Tables.documents(s, d))),
    "doc_chunk" -> ((s, d) => TrainingPrep.chunk(Tables.documents(s, d))),
    "multimodal_meta" -> ((s, d) => Multimodal.metadata(Tables.documents(s, d))),
    "multimodal_features" -> ((s, d) => Multimodal.features(s, Tables.documents(s, d))),
    "multimodal_frame_sample" -> ((s, d) => Multimodal.frameSample(s, Tables.documents(s, d))),
    "multimodal_resize_plan" -> ((s, d) => Multimodal.resizePlan(s, Tables.documents(s, d))),
    // ── E. structured streaming (SURVEY §2E; rows-only) ────────────────
    "stream_hourly_by_type" -> ((s, d) => graft.streaming.EventStream.stagedPipeline(s, d)),
    // ── generator service analog (rows-only; deterministic from seed) ──
    "generate_events" -> ((s, _) => Generator.events(s, 10000, stations = 5)),
    "generate_events_status" -> ((s, _) =>
      Generator.status(Generator.events(s, 10000, stations = 5)))
  )

  // Shared SQL fragments for the D-section oracles (DuckDB dialect).
  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val wsSql = "regexp_split_to_array(lower(trim(text)), '\\s+')"

  /** Shared DSIR estimator CTEs (see Corpus.dsirWeights): md5 3-hex-digit
    * bucket fold, add-one multinomials, 6-dp-quantized log-ratio model,
    * per-doc exact decimal sums. Both dsir_weights and dsir_sample
    * interpolate THIS string so the two oracles can never drift from
    * each other; only the Scala implementation is a separate copy.
    */
  private val dsirCtes =
    s"""t AS (SELECT doc_id, lang = 'en' AS tgt,
       |   unnest(list_filter($wsSql, x -> x != '')) AS tok FROM documents),
       | b AS (SELECT doc_id, tgt,
       |   ((instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 256
       |  + (instr('0123456789abcdef', substring(md5(tok), 2, 1)) - 1) * 16
       |  + (instr('0123456789abcdef', substring(md5(tok), 3, 1)) - 1)) % 1024 AS bkt
       |   FROM t),
       | cnt AS (SELECT bkt, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
       |         sum(CASE WHEN tgt THEN 0 ELSE 1 END) AS cr FROM b GROUP BY 1),
       | tot AS (SELECT sum(ct) AS tt, sum(cr) AS tr FROM cnt),
       | lr AS (SELECT bkt, CAST(round(ln((ct + 1.0) / (tt + 1024))
       |                            - ln((cr + 1.0) / (tr + 1024)), 6)
       |                   AS DECIMAL(18,6)) AS lr FROM cnt, tot),
       | dt AS (SELECT doc_id, bkt, count(*) AS n FROM b WHERE NOT tgt GROUP BY 1, 2),
       | w AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
       |       CAST(sum(n * lr) AS DOUBLE) AS dsir_weight
       |       FROM dt JOIN lr USING (bkt) GROUP BY doc_id)""".stripMargin
  private val stopSetSql = "('the','a','an','of','and','to','in','is','it','for','on','with')"
  private val statsSubSql =
    s"""SELECT doc_id, length(text) AS n_chars, len(ws) AS n_tokens,
       |  len(list_distinct(ws)) AS n_distinct_tokens,
       |  round(length(replace(norm, ' ', '')) * 1.0 / len(ws), 4) AS avg_token_len,
       |  round(len(list_filter(ws, t -> t IN $stopSetSql)) * 1.0 / len(ws), 4) AS stopword_ratio,
       |  round((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) * 1.0
       |    / length(text), 4) AS punct_ratio
       |FROM (SELECT doc_id, text, $normSql AS norm, $wsSql AS ws FROM documents) raw""".stripMargin
  private val shingleSubSql =
    s"""SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
       |  i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) AS s
       |FROM (SELECT doc_id, $wsSql AS ws FROM documents) w""".stripMargin

  // Shared by split_leakage and its bloom-prefiltered twin — the bloom
  // pre-filter provably cannot change the result (no false negatives;
  // false positives are re-verified by the exact join), so both gate
  // against the SAME exact SQL.
  private lazy val splitLeakageSql =
    s"""WITH sh AS ($shingleSubSql),
       | asg AS (SELECT doc_id,
       |   CASE WHEN bucket < 205 THEN 'train'
       |        WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |   CAST((strpos('0123456789abcdef',
       |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-v1'), 1, 1)) - 1) * 16
       |    + (strpos('0123456789abcdef',
       |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-v1'), 2, 1)) - 1)
       |    AS BIGINT) AS bucket FROM documents) b),
       | j AS (SELECT sh.doc_id, asg.split, sh.s FROM sh JOIN asg USING (doc_id)),
       | tr AS (SELECT DISTINCT s FROM j WHERE split = 'train'),
       | held AS (SELECT * FROM j WHERE split != 'train'),
       | tot AS (SELECT doc_id, split, count(*) AS n_shingles FROM held GROUP BY 1, 2),
       | hit AS (SELECT held.doc_id, count(*) AS n_leaked
       |   FROM held JOIN tr USING (s) GROUP BY 1)
       |SELECT t.doc_id, t.split, CAST(t.n_shingles AS BIGINT) AS n_shingles,
       | CAST(coalesce(h.n_leaked, 0) AS BIGINT) AS n_leaked,
       | round(coalesce(h.n_leaked, 0) * 1.0 / t.n_shingles, 4) AS leak_fraction,
       | coalesce(h.n_leaked, 0) * 1.0 / t.n_shingles >= 0.5 AS is_leaked
       |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // The curation stage CTE chain (quality gate q, near-dup set nd,
  // exact-dup set ed) — shared with corpus_curation_rewrite, which
  // composes the span rewrite on top of the surviving set.
  private lazy val curationCtesSql =
    s"""WITH st AS ($statsSubSql),
       | q AS (SELECT doc_id FROM (
       |  SELECT doc_id,
       |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
       |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
       |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
       |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS s
       |  FROM st) t WHERE s >= 0.75),
       | sh AS ($shingleSubSql),
       | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
       |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       | nd AS (SELECT DISTINCT b_id AS doc_id FROM pairs
       |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
       |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
       | ed AS (SELECT doc_id FROM (
       |   SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS cn
       |   FROM documents) x WHERE doc_id != cn)""".stripMargin

  // Validation predicate fragments reused across the A-section oracles —
  // MUST stay in sync with graft.ops.Ingest.
  private val validSql =
    "user_id IS NOT NULL AND ts IS NOT NULL AND value >= 0 AND value <= 300 " +
      "AND event_type IN ('click','view','purchase','signup')"
  private val eventCols = "event_id, ts, user_id, event_type, value, props"

  // Shared by the lag+cumsum and native session_window forms — both
  // split sessions on a >30min gap per user.
  private val SessionizeOracleSql =
    """SELECT user_id, cast(session_id AS BIGINT) AS session_id,
      | min(ts) AS session_start, max(ts) AS session_end,
      | count(*) AS n_events,
      | cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM (
      | SELECT user_id, ts, event_id, value,
      |  sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
      | FROM (
      |  SELECT user_id, ts, event_id, value,
      |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events) x) y
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ingest_validate" ->
      s"SELECT * FROM events WHERE $validSql",
    "ingest_dlq" ->
      s"""SELECT *,
         | CASE WHEN user_id IS NULL OR ts IS NULL THEN 'missing_key'
         |      WHEN value IS NULL OR event_type IS NULL THEN 'missing_field'
         |      WHEN value < 0 OR value > 300 THEN 'value_out_of_range'
         |      WHEN event_type NOT IN ('click','view','purchase','signup') THEN 'bad_event_type'
         |      ELSE 'unknown' END AS reason
         |FROM events WHERE NOT coalesce($validSql, FALSE)""".stripMargin,
    "ingest_dedup" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         | FROM events e) t WHERE rn = 1""".stripMargin,
    "ingest_batch_stats" ->
      s"""SELECT user_id, count(*) AS n_events,
         | cast(sum(CASE WHEN $validSql THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         | cast(sum(CASE WHEN $validSql THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
         | count(*) - count(DISTINCT ts) AS n_dup_keys
         |FROM events GROUP BY user_id""".stripMargin,
    "ingest_pipeline" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         | FROM (SELECT * FROM events WHERE $validSql) e) t WHERE rn = 1""".stripMargin,
    "ingest_props_extract" ->
      """SELECT event_id, user_id, event_type,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,
    "ingest_dlq_replay" ->
      s"""WITH d AS (SELECT *,
         |  CASE WHEN user_id IS NULL OR ts IS NULL THEN 'missing_key'
         |       WHEN value IS NULL OR event_type IS NULL THEN 'missing_field'
         |       WHEN value < 0 OR value > 300 THEN 'value_out_of_range'
         |       WHEN event_type NOT IN ('click','view','purchase','signup') THEN 'bad_event_type'
         |       ELSE 'unknown' END AS reason
         | FROM events WHERE NOT coalesce($validSql, FALSE)),
         | r AS (SELECT event_id, ts, user_id, event_type,
         |  CASE WHEN reason = 'value_out_of_range'
         |       THEN least(greatest(value, 0), 300) ELSE value END AS value,
         |  props, reason,
         |  reason = 'value_out_of_range' AS repaired
         | FROM d)
         |SELECT event_id, ts, user_id, event_type, value, props, reason, repaired,
         | coalesce($validSql, FALSE) AS recovered
         |FROM r ORDER BY event_id""".stripMargin,
    "raw_station" ->
      s"""SELECT * FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |ORDER BY ts DESC""".stripMargin,
    "raw_station_all" ->
      s"""SELECT * FROM events WHERE user_id = $RawUser
         |ORDER BY ts DESC""".stripMargin,
    // identical oracle to raw_station: the cache must be a correctness
    // no-op, and these rows were served from a cache HIT (see queries)
    "raw_station_cached" ->
      s"""SELECT * FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |ORDER BY ts DESC""".stripMargin,
    "agg_station" ->
      s"""SELECT user_id, round(avg(value), 4) AS avg_value, min(value) AS min_value,
         | max(value) AS max_value, count(*) AS n
         |FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |GROUP BY user_id""".stripMargin,
    "timeseries_bucket" ->
      """SELECT user_id, date_trunc('hour', ts) AS bucket,
        | round(avg(value), 4) AS avg_value, min(value) AS min_value,
        | max(value) AS max_value, count(*) AS reading_count
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "timeseries_station" ->
      s"""SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
         | round(avg(value), 4) AS avg_value, min(value) AS min_value,
         | max(value) AS max_value, count(*) AS reading_count
         |FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |GROUP BY 1, 2 ORDER BY 2""".stripMargin,
    "latest_per_key" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         | FROM events e) t WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "timeseries_gapfill" ->
      s"""WITH series AS (SELECT gs AS bucket FROM generate_series(
         |   TIMESTAMP '$RawStart', TIMESTAMP '$RawEnd', INTERVAL 1 HOUR) t(gs)),
         | agg AS (SELECT date_trunc('hour', ts) AS bucket,
         |   round(avg(value), 4) AS avg_value, count(*) AS reading_count
         |  FROM events WHERE user_id = $RawUser
         |   AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |  GROUP BY 1)
         |SELECT s.bucket, coalesce(a.reading_count, 0) AS reading_count,
         | a.avg_value,
         | last_value(a.avg_value IGNORE NULLS) OVER (ORDER BY s.bucket) AS filled_value,
         | coalesce(a.reading_count, 0) = 0 AS is_gap
         |FROM series s LEFT JOIN agg a ON s.bucket = a.bucket
         |ORDER BY s.bucket""".stripMargin,
    "timeseries_moving_avg" ->
      """SELECT event_id, user_id, ts, value,
        | round(avg(value) OVER w, 4) AS mov_avg,
        | count(*) OVER w AS n_in_window
        |FROM events
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "timeseries_sliding" ->
      """SELECT user_id,
        | time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes' AS w_start,
        | count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events CROSS JOIN (VALUES (0), (1)) o(k)
        |WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "timeseries_gaps" ->
      """SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
        | CAST(floor(epoch(ts)) - floor(epoch(prev_ts)) AS BIGINT) AS gap_sec
        |FROM (
        | SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL) t
        |WHERE floor(epoch(ts)) - floor(epoch(prev_ts)) > 21600
        |ORDER BY user_id, gap_start""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        | AND c_nationkey = s_nationkey AND c_nationkey = n_nationkey
        | AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // TPC-H Q7's standard OR-pair form, not `supp_nation != cust_nation`:
    // both CTEs are already restricted to the two nations so the forms are
    // equivalent, but the inequality gives the oracle's join-order
    // optimizer an sn-cn edge it joins FIRST (a ~0.5-selectivity product
    // of all supplier x customer pairs — ~409M rows at sf10, >180 GB of
    // build+spill) while the OR-pair keeps the linear plan (5.5 s at sf10).
    "q7_volume" ->
      """WITH sn AS (SELECT s_suppkey, n_name AS supp_nation FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_2')),
        | cn AS (SELECT c_custkey, n_name AS cust_nation FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_1','NATION_2'))
        |SELECT supp_nation, cust_nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN sn ON l_suppkey = s_suppkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN cn ON o_custkey = c_custkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        | AND ((supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
        |   OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        | AND l_returnflag = 'R'
        |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo" ->
      """SELECT round(promo_revenue * 100.0 / total_revenue, 4) AS promo_revenue_pct,
        | promo_revenue, total_revenue
        |FROM (SELECT
        |  cast(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
        |  cast(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_revenue
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00') t""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        | cast(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN big ON big.l_orderkey = o_orderkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT cast(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        | round(cast(sum(CASE WHEN nation = 'NATION_3' THEN vol
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |       / cast(sum(vol) AS DOUBLE), 4) AS mkt_share
        |FROM (
        | SELECT cast(year(o_orderdate) AS BIGINT) AS o_year,
        |   CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS vol,
        |   n2.n_name AS nation
        | FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
        | WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND p_type = 'ECONOMY') t
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_profit_proxy" ->
      """SELECT nation, o_year, cast(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        | SELECT n_name AS nation, cast(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |   - CAST(0.6 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
        | FROM part, supplier, lineitem, orders, nation
        | WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%gear%') t
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        | GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH revenue AS (
        | SELECT l_suppkey AS supplier_no,
        |  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, cast(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT round(cast(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
        |  AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND p_type = 'SMALL'
        |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT cast(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |  AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1.0 AND 11.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10.0 AND 20.0)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,
    "q20_part_promotion" ->
      """SELECT s_suppkey, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5' AND s_suppkey IN (
        | SELECT ps.l_suppkey FROM
        |  (SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |   FROM lineitem
        |   WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |   GROUP BY l_suppkey, l_partkey) ps
        | JOIN
        |  (SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS tq
        |   FROM lineitem
        |   WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |   GROUP BY l_partkey) tot
        | ON ps.l_partkey = tot.l_partkey
        | WHERE ps.sq * 2 > tot.tq)
        |ORDER BY s_suppkey""".stripMargin,
    "q22_global_sales" ->
      """WITH pos AS (
        | SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
        | FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (1,3,5,7,9,11,13))
        |SELECT cntrycode, count(*) AS numcust,
        | cast(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM (
        | SELECT cast(c_nationkey AS BIGINT) AS cntrycode, c_acctbal
        | FROM customer, pos
        | WHERE c_nationkey IN (1,3,5,7,9,11,13)
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |) t GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH offers AS (
        | SELECT l_partkey, l_suppkey,
        |        min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part
        |                     WHERE p_type = 'SMALL' AND p_size <= 15)
        |   AND l_suppkey IN (SELECT s_suppkey FROM supplier
        |                     JOIN nation ON s_nationkey = n_nationkey
        |                     JOIN region ON n_regionkey = r_regionkey
        |                     WHERE r_name = 'EUROPE')
        | GROUP BY l_partkey, l_suppkey)
        |SELECT p_partkey, p_name, p_brand, s_suppkey, s_name, n_name,
        |       s_acctbal, cast(cost AS DOUBLE) AS supply_cost
        |FROM offers
        |JOIN part ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE cost = (SELECT min(cost) FROM offers o2
        |              WHERE o2.l_partkey = offers.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin,
    "q11_important_stock" ->
      """WITH vals AS (
        | SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        | FROM lineitem
        | WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                     JOIN nation ON s_nationkey = n_nationkey
        |                     WHERE n_name = 'NATION_3')
        | GROUP BY l_partkey)
        |SELECT l_partkey, cast(value AS DOUBLE) AS part_value
        |FROM vals, (SELECT sum(value) AS total, count(*) AS n FROM vals) t
        |WHERE value * n > total * 2
        |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q12_ship_lag" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |            THEN 'DELAYED' ELSE 'PROMPT' END AS ship_class,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY ship_class""".stripMargin,
    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q21_waiting_orders" ->
      """WITH lo AS (
        | SELECT l_orderkey, l_suppkey,
        |        (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'),
        |po AS (
        | SELECT l_orderkey FROM lo
        | GROUP BY l_orderkey
        | HAVING count(DISTINCT l_suppkey) >= 2
        |    AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait FROM (
        | SELECT DISTINCT lo.l_orderkey, lo.l_suppkey FROM lo
        | WHERE late AND lo.l_orderkey IN (SELECT l_orderkey FROM po)) q
        |JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY s_suppkey, s_name ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin,
    "top_k_per_group" ->
      """SELECT p_brand, rnk, p_partkey, p_name, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        | FROM part) t WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "top_k_per_group_fast" ->
      """SELECT p_brand, rnk, p_partkey, p_name, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        | FROM part) t WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "events_sessionize" -> SessionizeOracleSql,
    // the native session_window form is oracle-equivalent by
    // construction (gap widened 1µs — see Analytics.sessionizeNative)
    "events_sessionize_native" -> SessionizeOracleSql,
    "rollup_events" ->
      """SELECT event_type, user_bucket, count(*) AS n,
        | cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type, user_id % 10 AS user_bucket, value FROM events) t
        |GROUP BY ROLLUP(event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "asof_join" ->
      """SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, l.props,
        | r.ts AS asof_ts, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (
        |  SELECT * FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |     ORDER BY event_id DESC) AS rn
        |   FROM events WHERE event_type = 'signup'
        |    AND user_id IS NOT NULL AND ts IS NOT NULL) t WHERE rn = 1) r
        | ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "asof_join_forward" ->
      """SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, l.props,
        | r.ts AS asof_ts, r.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (
        |  SELECT * FROM (
        |   SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |     ORDER BY event_id DESC) AS rn
        |   FROM events WHERE event_type = 'signup'
        |    AND user_id IS NOT NULL AND ts IS NOT NULL) t WHERE rn = 1) r
        | ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,
    "asof_join_tolerance" ->
      """SELECT event_id, ts, user_id, event_type, value, props,
        | CASE WHEN asof_ts >= ts - INTERVAL '2 days' THEN asof_ts END AS asof_ts,
        | CASE WHEN asof_ts >= ts - INTERVAL '2 days' THEN asof_value END AS asof_value
        |FROM (
        | SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, l.props,
        |  r.ts AS asof_ts, r.value AS asof_value
        | FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        | ASOF LEFT JOIN (
        |   SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'signup'
        |     AND user_id IS NOT NULL AND ts IS NOT NULL) t WHERE rn = 1) r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts) x
        |ORDER BY event_id""".stripMargin,
    "range_join" ->
      """WITH hours AS (
        |  SELECT date_trunc('hour', ts) AS h, count(*) AS n FROM events GROUP BY 1),
        | hot AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY n DESC, h) AS rn FROM hours) t
        |  WHERE rn <= 20),
        | win AS (SELECT h - INTERVAL 30 MINUTE AS w_start,
        |                h + INTERVAL 90 MINUTE AS w_end FROM hot)
        |SELECT w_start, w_end, count(*) AS n_events,
        | cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM win JOIN events e ON e.ts >= w_start AND e.ts < w_end
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "cube_events" ->
      """SELECT event_type, user_bucket, count(*) AS n,
        | cast(sum(cast(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type, user_id % 10 AS user_bucket, value FROM events) t
        |GROUP BY CUBE(event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin,
    "pivot_events" ->
      """SELECT user_id % 10 AS user_bucket,
        | count(*) FILTER (WHERE event_type = 'click') AS click,
        | count(*) FILTER (WHERE event_type = 'view') AS view,
        | count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        | count(*) FILTER (WHERE event_type = 'signup') AS signup,
        | count(*) FILTER (WHERE event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // threshold compares the ROUNDED z on both engines so the cut cannot
    // flip on sub-ulp mean/stddev differences
    "events_anomaly" ->
      """WITH s AS (SELECT event_type, avg(value) AS m, stddev_samp(value) AS sd
        |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1 HAVING stddev_samp(value) > 0)
        |SELECT event_id, user_id, event_type, value, z FROM (
        | SELECT e.event_id, e.user_id, e.event_type, e.value,
        |  round((e.value - s.m) / s.sd, 4) AS z
        | FROM events e JOIN s USING (event_type)
        | WHERE e.value IS NOT NULL) t
        |WHERE abs(z) >= 2.5 ORDER BY event_id""".stripMargin,
    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
        |   WHERE event_type = 'view' AND user_id IS NOT NULL AND ts IS NOT NULL
        |   GROUP BY 1),
        | s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |   WHERE e.event_type = 'click' GROUP BY 1),
        | s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |   WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "events_dow_hour" ->
      """SELECT CAST(isodow(ts) AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
        | count(*) AS n, round(avg(value), 4) AS avg_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_histogram" ->
      """WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
        | x AS (SELECT min(value) AS lo, max(value) AS hi FROM e),
        | b AS (SELECT CAST(CASE WHEN (hi - lo) / 20 = 0 THEN 0
        |    ELSE least(floor((value - lo) / ((hi - lo) / 20)), 19) END AS BIGINT) AS bin
        |  FROM e CROSS JOIN x)
        |SELECT bin,
        | round(lo + bin * (hi - lo) / 20, 4) AS bin_lo,
        | round(lo + (bin + 1) * (hi - lo) / 20, 4) AS bin_hi,
        | count(*) AS n
        |FROM b CROSS JOIN x GROUP BY bin, lo, hi ORDER BY bin""".stripMargin,
    "retention_cohorts" ->
      """WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |   FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
        | act AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |   CAST(floor(date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
        |  FROM events e JOIN f ON e.user_id = f.user_id
        |  WHERE e.ts IS NOT NULL)
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "events_profile" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.95), 4) AS p95,
        | round(avg(value), 4) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "dedup_exact" ->
      s"""SELECT doc_id, canonical_id, doc_id != canonical_id AS is_dup FROM (
         | SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS canonical_id
         | FROM documents) t ORDER BY doc_id""".stripMargin,
    "span_dedup" ->
      """WITH docs AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |segs AS (
        | SELECT d.doc_id, i.i AS seg_idx,
        |        array_to_string(list_slice(d.words, i.i*10+1, i.i*10+10), ' ') AS seg
        | FROM docs d, LATERAL (
        |  SELECT unnest(range(0, cast(ceil(len(d.words)/10.0) AS BIGINT)))) AS i(i)),
        |hashed AS (
        | SELECT doc_id, seg_idx, seg, md5(seg) AS h,
        |        doc_id*1000000 + seg_idx AS k FROM segs),
        |winners AS (SELECT h, min(k) AS wk FROM hashed GROUP BY h),
        |kept AS (
        | SELECT hashed.doc_id, hashed.seg_idx, hashed.seg
        | FROM hashed JOIN winners ON hashed.h = winners.h AND hashed.k = winners.wk),
        |reassembled AS (
        | SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
        |        count(*) AS segs_kept
        | FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       coalesce(r.text_dedup, '') AS text_dedup,
        |       cast(ceil(len(string_split(d.text, ' '))/10.0) AS BIGINT) AS segs_total,
        |       cast(ceil(len(string_split(d.text, ' '))/10.0) AS BIGINT)
        |         - coalesce(r.segs_kept, 0) AS segs_removed
        |FROM documents d LEFT JOIN reassembled r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Incremental form: corpus = doc_id % 5 != 4 (already accepted — its
    // spans' first occurrences stand), batch = doc_id % 5 = 4. A batch
    // span in the corpus digest set is removed outright; the rest
    // compete within the batch by the same first-occurrence rule.
    "span_dedup_incremental" ->
      """WITH docs AS (
        | SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |segs AS (
        | SELECT d.doc_id, i.i AS seg_idx,
        |        array_to_string(list_slice(d.words, i.i*10+1, i.i*10+10), ' ') AS seg
        | FROM docs d, LATERAL (
        |  SELECT unnest(range(0, cast(ceil(len(d.words)/10.0) AS BIGINT)))) AS i(i)),
        |hashed AS (
        | SELECT doc_id, seg_idx, seg, md5(seg) AS h,
        |        doc_id*1000000 + seg_idx AS k FROM segs),
        |idx AS (SELECT DISTINCT h FROM hashed WHERE doc_id % 5 != 4),
        |batch AS (SELECT * FROM hashed WHERE doc_id % 5 = 4),
        |fresh AS (
        | SELECT b.* FROM batch b
        | WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.h = b.h)),
        |winners AS (SELECT h, min(k) AS wk FROM fresh GROUP BY h),
        |kept AS (
        | SELECT f.doc_id, f.seg_idx, f.seg
        | FROM fresh f JOIN winners w ON f.h = w.h AND f.k = w.wk),
        |reassembled AS (
        | SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
        |        count(*) AS segs_kept
        | FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |       coalesce(r.text_dedup, '') AS text_dedup,
        |       cast(ceil(len(string_split(d.text, ' '))/10.0) AS BIGINT) AS segs_total,
        |       cast(ceil(len(string_split(d.text, ' '))/10.0) AS BIGINT)
        |         - coalesce(r.segs_kept, 0) AS segs_removed
        |FROM documents d LEFT JOIN reassembled r ON r.doc_id = d.doc_id
        |WHERE d.doc_id % 5 = 4
        |ORDER BY d.doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, round(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) AS jaccard
         |FROM pairs
         | JOIN sz sa ON sa.doc_id = a_id
         | JOIN sz sb ON sb.doc_id = b_id
         |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    // The banded-LSH variant verifies every candidate with EXACT Jaccard,
    // so its output is a subset of the exact pair set, and the bands are
    // generous enough at threshold 0.5 that TextDedupSpec/CurationSpec
    // prove set EQUALITY on this corpus — the exact n-gram Jaccard SQL is
    // therefore a sound oracle for it at the (deterministic) gate SF.
    "dedup_minhash" ->
      s"""WITH sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, round(c * 1.0 / (sa.n_sh + sb.n_sh - c), 4) AS jaccard
         |FROM pairs
         | JOIN sz sa ON sa.doc_id = a_id
         | JOIN sz sb ON sb.doc_id = b_id
         |WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,
    // SimHash oracle — exact recomputation of the 64-bit simhash in
    // DuckDB: the kernel's token hash is the LOW 8 BYTES of MD5 (chosen
    // for exactly this portability), recomputed here from the hex of
    // md5(tok) via per-nibble strpos arithmetic; ±1 votes per bit, sign
    // → bit, assembled as HUGEINT then converted to the signed BIGINT
    // the Spark kernel emits. Pairs are exact all-pairs hamming ≤ 3 —
    // equal to the banded Spark output by pigeonhole (3 differing bits
    // cannot touch all 4 16-bit chunks, so every qualifying pair shares
    // a chunk and is found).
    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split($normSql, ' ')) AS tok FROM documents),
         | h AS (SELECT doc_id, substr(md5(tok), 17, 16) AS hx FROM t),
         | nib AS (SELECT doc_id, p, strpos('0123456789abcdef', substr(hx, 17 - p, 1)) - 1 AS v
         |   FROM h CROSS JOIN (SELECT unnest(range(1, 17)) AS p) ps),
         | bits AS (SELECT doc_id, (p - 1) * 4 + b AS bit,
         |   CASE WHEN (v // (1 << b)) % 2 = 1 THEN 1 ELSE -1 END AS vote
         |   FROM nib CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bs),
         | votes AS (SELECT doc_id, bit, sum(vote) AS vt FROM bits GROUP BY 1, 2),
         | sh AS (SELECT doc_id,
         |   (CASE WHEN s >= 9223372036854775808::HUGEINT
         |         THEN s - 18446744073709551616::HUGEINT ELSE s END)::BIGINT AS sim
         |   FROM (SELECT doc_id,
         |           sum(CASE WHEN vt > 0 THEN 1::HUGEINT << bit ELSE 0::HUGEINT END) AS s
         |         FROM votes GROUP BY 1) z)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY 1, 2""".stripMargin,
    // Incremental gate oracle: batch docs (doc_id%5=4) survive unless a
    // CORPUS doc (doc_id%5≠4) shares their normalized text or clears
    // exact Jaccard ≥ 0.5 cross-set. Banding soundness argument is the
    // same as dedup_minhash (candidates exact-verified ⊆ exact pairs).
    "dedup_incremental" ->
      s"""WITH sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | cross_pairs AS (
         |  SELECT b.doc_id AS new_id, a.doc_id AS old_id, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s
         |   AND a.doc_id % 5 != 4 AND b.doc_id % 5 = 4
         |  GROUP BY 1, 2),
         | neard AS (SELECT DISTINCT new_id AS doc_id FROM cross_pairs
         |   JOIN sz sa ON sa.doc_id = old_id JOIN sz sb ON sb.doc_id = new_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | norms AS (SELECT doc_id, $normSql AS norm FROM documents),
         | exactd AS (SELECT DISTINCT b.doc_id FROM norms b JOIN norms a
         |   ON b.norm = a.norm AND b.doc_id % 5 = 4 AND a.doc_id % 5 != 4)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id % 5 = 4
         | AND d.doc_id NOT IN (SELECT doc_id FROM exactd)
         | AND d.doc_id NOT IN (SELECT doc_id FROM neard)
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    // LSH-bucketed near-dup verifies candidates exactly (output ⊆ exact)
    // and the 32×4 band geometry makes per-pair recall ≈99.9% at this
    // corpus's threshold; SimilaritySpec asserts set equality, so the
    // exact all-pairs SQL is a sound oracle at the deterministic gate SF.
    "dedup_embedding_lsh" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])) >= 0.45
        |ORDER BY a_id, b_id""".stripMargin,
    // cos_sim is computed ONCE in the innermost subquery so the window
    // input carries only scalars: the previous shape recomputed the
    // similarity inside the window's ORDER BY, and DuckDB then dragged
    // both 256-double arrays through the window materialization —
    // 80 GB at sf100 (2 M × 10 pairs × 4 KB), a checker OOM. Same rows
    // (the order key equals cos_sim DESC, neighbor_id); the scalar-only
    // window input is ~0.5 GB at sf100 and the compare is strict again.
    "knn_bruteforce" ->
      """SELECT query_id, neighbor_id, cos_sim, rnk FROM (
        | SELECT query_id, neighbor_id, cos_sim,
        |  row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos_sim DESC, neighbor_id) AS rnk
        | FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |   round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |     CAST(c.embedding AS DOUBLE[])), 4) AS cos_sim
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 10 AND c.vec_id != q.vec_id) s) t
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,
    "text_stats" ->
      s"""SELECT * FROM ($statsSubSql) st ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      s"""SELECT doc_id, lang AS lang_label,
         | CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         |      WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |      WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |      WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_guess,
         | s_en, s_es, s_de, s_fr
         |FROM (
         | SELECT doc_id, lang,
         |  len(list_filter(ws, t -> t IN ('the','and','of','is','to'))) AS s_en,
         |  len(list_filter(ws, t -> t IN ('el','la','los','de','que'))) AS s_es,
         |  len(list_filter(ws, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter(ws, t -> t IN ('le','les','et','est','une'))) AS s_fr
         | FROM (SELECT doc_id, lang, $wsSql AS ws FROM documents) w) sc
         |ORDER BY doc_id""".stripMargin,
    "lang_confusion" ->
      s"""WITH sc AS (
         | SELECT doc_id, lang,
         |  len(list_filter(ws, t -> t IN ('the','and','of','is','to'))) AS s_en,
         |  len(list_filter(ws, t -> t IN ('el','la','los','de','que'))) AS s_es,
         |  len(list_filter(ws, t -> t IN ('der','die','das','und','ist'))) AS s_de,
         |  len(list_filter(ws, t -> t IN ('le','les','et','est','une'))) AS s_fr
         | FROM (SELECT doc_id, lang, $wsSql AS ws FROM documents) w),
         | g AS (SELECT lang AS lang_label,
         |  CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
         |       WHEN s_en >= greatest(s_es, s_de, s_fr) THEN 'en'
         |       WHEN s_es >= greatest(s_de, s_fr) THEN 'es'
         |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS lang_guess FROM sc),
         | m AS (SELECT lang_label, lang_guess, count(*) AS n_docs FROM g GROUP BY 1, 2)
         |SELECT lang_label, lang_guess, n_docs,
         | CAST(sum(n_docs) OVER (PARTITION BY lang_label) AS BIGINT) AS label_total,
         | round(n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang_label), 4) AS share
         |FROM m ORDER BY lang_label, lang_guess""".stripMargin,
    "doc_fingerprint" ->
      s"""SELECT doc_id, md5(norm) AS fp_md5, length(norm) AS fp_len,
         | substr(norm, 1, 16) AS fp_head
         |FROM (SELECT doc_id, $normSql AS norm FROM documents) t ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      s"""SELECT doc_id, n_tokens, stopword_ratio, avg_token_len, quality_score FROM (
         | SELECT doc_id, n_tokens, stopword_ratio, avg_token_len,
         |  cast(CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |   CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |   CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |   CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END
         |   AS DOUBLE) AS quality_score
         | FROM ($statsSubSql) st) q
         |WHERE quality_score >= 0.75 ORDER BY doc_id""".stripMargin,
    // required-word list rendered from TextAnalysis.RequiredWords so the
    // engines can never drift on the Gopher stopword rule
    "gopher_quality" -> {
      val req = graft.ops.TextAnalysis.RequiredWords.map(w => s"'$w'").mkString("(", ",", ")")
      s"""SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio, n_required_hits,
         | n_words BETWEEN 50 AND 100000 AS flag_word_count,
         | mean_word_len BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
         | symbol_ratio <= 0.1 AS flag_symbol_ratio,
         | alpha_ratio >= 0.8 AS flag_alpha_ratio,
         | n_required_hits >= 2 AS flag_stopwords,
         | (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
         |  AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8 AND n_required_hits >= 2)
         |  AS gopher_pass
         |FROM (SELECT doc_id,
         |  CAST(len(ws) AS BIGINT) AS n_words,
         |  round(length(replace(norm, ' ', '')) * 1.0 / len(ws), 4) AS mean_word_len,
         |  round(len(list_filter(ws, x -> regexp_matches(x, '#|\\.\\.\\.'))) * 1.0 / len(ws), 4)
         |    AS symbol_ratio,
         |  round(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) * 1.0 / len(ws), 4)
         |    AS alpha_ratio,
         |  CAST(len(list_filter(ws, x -> x IN $req)) AS BIGINT) AS n_required_hits
         | FROM (SELECT doc_id, $normSql AS norm, $wsSql AS ws FROM documents) raw) t
         |ORDER BY doc_id""".stripMargin
    },
    "source_quality" ->
      s"""WITH st AS ($statsSubSql),
         | q AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END)
         |    AS score FROM st) x WHERE score >= 0.75),
         | d AS (SELECT doc_id FROM (
         |  SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS canonical_id
         |  FROM documents) t WHERE doc_id != canonical_id)
         |SELECT doc.source, count(*) AS n_docs,
         | CAST(sum(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         | CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
         | round(sum(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS quality_rate,
         | round(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS dup_rate,
         | round(avg(doc.n_chars), 4) AS avg_chars
         |FROM documents doc
         | LEFT JOIN q ON doc.doc_id = q.doc_id
         | LEFT JOIN d ON doc.doc_id = d.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Dataset card: every metric reuses a gate-proven fragment; the
    // median is the same all-integer histogram rank selection as
    // length_percentiles, computed globally.
    "corpus_datacard" ->
      s"""WITH st AS ($statsSubSql),
        |q AS (SELECT doc_id FROM (
        |  SELECT doc_id,
        |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
        |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
        |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
        |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS s
        |  FROM st) t WHERE s >= 0.75),
        |ed AS (SELECT doc_id FROM (
        |  SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS cn
        |  FROM documents) x WHERE doc_id != cn),
        |hist AS (SELECT n_chars, count(*) AS cnt FROM documents GROUP BY 1),
        |tot AS (SELECT sum(cnt) AS n FROM hist),
        |cum AS (SELECT h.n_chars, sum(h.cnt) OVER (ORDER BY h.n_chars) AS cc, t.n
        |  FROM hist h CROSS JOIN tot t)
        |SELECT 'n_docs' AS metric, CAST((SELECT count(*) FROM documents) AS DOUBLE) AS value
        |UNION ALL SELECT 'n_sources', CAST((SELECT count(DISTINCT source) FROM documents) AS DOUBLE)
        |UNION ALL SELECT 'n_langs', CAST((SELECT count(DISTINCT lang) FROM documents) AS DOUBLE)
        |UNION ALL SELECT 'exact_dup_rate',
        |  round((SELECT count(*) FROM ed) * 1.0 / (SELECT count(*) FROM documents), 4)
        |UNION ALL SELECT 'quality_pass_rate',
        |  round((SELECT count(*) FROM q) * 1.0 / (SELECT count(*) FROM documents), 4)
        |UNION ALL SELECT 'avg_chars', (SELECT round(avg(n_chars), 4) FROM documents)
        |UNION ALL SELECT 'p50_chars',
        |  CAST((SELECT min(CASE WHEN cc >= (n*50 + 99) // 100 THEN n_chars END) FROM cum) AS DOUBLE)
        |ORDER BY metric""".stripMargin,
    "vocab_coverage" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_filter($wsSql, x -> x != '')) AS w
        |  FROM documents),
        |cnt AS (SELECT w, count(*) AS c FROM t GROUP BY w),
        |vocab AS (SELECT w FROM (
        |  SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM cnt) WHERE r <= 16),
        |perdoc AS (
        | SELECT t.doc_id, count(*) AS n_tokens,
        |  sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS n_in_vocab
        | FROM t LEFT JOIN vocab v ON t.w = v.w GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(n_in_vocab AS BIGINT) AS n_in_vocab,
        | round((n_tokens - n_in_vocab) * 1.0 / n_tokens, 4) AS oov_rate
        |FROM perdoc ORDER BY doc_id""".stripMargin,
    // Exact rank-selection percentiles: percentile k = smallest length
    // whose cumulative count reaches ceil(n*k/100), all-integer.
    "length_percentiles" ->
      """WITH c AS (SELECT source, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, sum(cnt) AS n FROM c GROUP BY 1),
        |cum AS (SELECT c.source, c.n_chars, c.cnt,
        |        sum(c.cnt) OVER (PARTITION BY c.source ORDER BY c.n_chars) AS cc, t.n
        |        FROM c JOIN t USING (source))
        |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        | CAST(min(CASE WHEN cc >= (n*50 + 99) // 100 THEN n_chars END) AS BIGINT) AS p50_chars,
        | CAST(min(CASE WHEN cc >= (n*90 + 99) // 100 THEN n_chars END) AS BIGINT) AS p90_chars,
        | CAST(min(CASE WHEN cc >= (n*99 + 99) // 100 THEN n_chars END) AS BIGINT) AS p99_chars
        |FROM cum GROUP BY source ORDER BY source""".stripMargin,
    // DSIR oracle: identical md5 3-hex-digit bucket fold, add-one
    // multinomials, 6-dp-quantized log-ratio model (decimal-exact doc
    // sums — only the two ln() calls are IEEE).
    "dsir_weights" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, n_tokens, dsir_weight FROM w ORDER BY doc_id""".stripMargin,
    // The resampling draw on top of the shared dsir CTEs: keep iff the
    // doc's md5 u16 < 65536 · round(exp(w − max w), 6).
    "dsir_sample" ->
      s"""WITH $dsirCtes,
         | mx AS (SELECT max(dsir_weight) AS max_w FROM w),
         | u AS (SELECT doc_id, n_tokens, dsir_weight,
         |   round(exp(dsir_weight - max_w), 6) AS keep_p,
         |   CAST(((instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '|graft-dsir-v1'), 1, 1)) - 1) * 4096
         |       + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '|graft-dsir-v1'), 2, 1)) - 1) * 256
         |       + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '|graft-dsir-v1'), 3, 1)) - 1) * 16
         |       + (instr('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR) || '|graft-dsir-v1'), 4, 1)) - 1)) AS BIGINT) AS u16
         |   FROM w, mx)
         |SELECT doc_id, n_tokens, dsir_weight, keep_p, u16 FROM u
         |WHERE u16 < keep_p * 65536.0 ORDER BY doc_id""".stripMargin,
    "doc_lm_score" ->
      s"""WITH t AS (SELECT doc_id, list_filter($wsSql, x -> x != '') AS ws FROM documents),
         | b AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos FROM t),
         | br AS (SELECT a.doc_id, a.w AS w1, a.w || ' ' || bb.w AS bigram
         |   FROM b a JOIN b bb ON bb.doc_id = a.doc_id AND bb.pos = a.pos + 1),
         | c2 AS (SELECT bigram, count(*) AS c2 FROM br GROUP BY 1),
         | c1 AS (SELECT w1, count(*) AS c1 FROM
         |   (SELECT unnest(ws) AS w1 FROM t) u GROUP BY 1),
         | v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(ws) AS w FROM t) w)
         |SELECT br.doc_id, count(*) AS n_bigrams,
         | round(avg(ln((c2.c2 + 1) * 1.0 / (c1.c1 + v.v))), 4) AS lm_score
         |FROM br JOIN c2 USING (bigram) JOIN c1 USING (w1) CROSS JOIN v
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_curation" ->
      s"""WITH st AS ($statsSubSql),
         | q AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS s
         |  FROM st) t WHERE s >= 0.75),
         | sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | nd AS (SELECT DISTINCT b_id AS doc_id FROM pairs
         |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | ed AS (SELECT doc_id FROM (
         |   SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS cn
         |   FROM documents) x WHERE doc_id != cn)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM nd)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM ed)
         |ORDER BY d.doc_id""".stripMargin,
    // The full rewrite pipeline: curation survivors + the span rewrite
    // applied over the surviving set only.
    "corpus_curation_rewrite" ->
      s"""$curationCtesSql,
         |surv AS (SELECT d.doc_id, d.text, d.lang, d.source FROM documents d
         | JOIN q ON q.doc_id = d.doc_id
         | WHERE d.doc_id NOT IN (SELECT doc_id FROM nd)
         |   AND d.doc_id NOT IN (SELECT doc_id FROM ed)),
         |sdocs AS (SELECT doc_id, string_split(text, ' ') AS words FROM surv),
         |segs2 AS (SELECT d.doc_id, i.i AS seg_idx,
         |   array_to_string(list_slice(d.words, i.i*10+1, i.i*10+10), ' ') AS seg
         | FROM sdocs d, LATERAL (
         |  SELECT unnest(range(0, cast(ceil(len(d.words)/10.0) AS BIGINT)))) AS i(i)),
         |hashed AS (SELECT doc_id, seg_idx, seg, md5(seg) AS h,
         |   doc_id*1000000 + seg_idx AS k FROM segs2),
         |winners AS (SELECT h, min(k) AS wk FROM hashed GROUP BY h),
         |kept AS (SELECT f.doc_id, f.seg_idx, f.seg
         |  FROM hashed f JOIN winners w ON f.h = w.h AND f.k = w.wk),
         |reasm AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup,
         |   count(*) AS segs_kept FROM kept GROUP BY doc_id)
         |SELECT s.doc_id, s.lang, s.source,
         | coalesce(r.text_dedup, '') AS text_dedup,
         | cast(ceil(len(string_split(s.text, ' '))/10.0) AS BIGINT) AS segs_total,
         | cast(ceil(len(string_split(s.text, ' '))/10.0) AS BIGINT)
         |   - coalesce(r.segs_kept, 0) AS segs_removed
         |FROM surv s LEFT JOIN reasm r ON r.doc_id = s.doc_id
         |ORDER BY s.doc_id""".stripMargin,
    // same stage CTEs as corpus_curation, counted per source with
    // sequential attribution (quality fail ⊻ exact dup ⊻ near dup ⊻
    // survive) — the five counts sum to n_docs
    "curation_report" ->
      s"""WITH st AS ($statsSubSql),
         | q AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS s
         |  FROM st) t WHERE s >= 0.75),
         | sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | nd AS (SELECT DISTINCT b_id AS doc_id FROM pairs
         |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | ed AS (SELECT doc_id FROM (
         |   SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS cn
         |   FROM documents) x WHERE doc_id != cn)
         |SELECT d.source, count(*) AS n_docs,
         | count(CASE WHEN q.doc_id IS NULL THEN 1 END) AS n_quality_fail,
         | count(CASE WHEN q.doc_id IS NOT NULL AND ed.doc_id IS NOT NULL THEN 1 END)
         |   AS n_exact_dup,
         | count(CASE WHEN q.doc_id IS NOT NULL AND ed.doc_id IS NULL
         |            AND nd.doc_id IS NOT NULL THEN 1 END) AS n_near_dup,
         | count(CASE WHEN q.doc_id IS NOT NULL AND ed.doc_id IS NULL
         |            AND nd.doc_id IS NULL THEN 1 END) AS n_surviving
         |FROM documents d
         |LEFT JOIN q ON q.doc_id = d.doc_id
         |LEFT JOIN ed ON ed.doc_id = d.doc_id
         |LEFT JOIN nd ON nd.doc_id = d.doc_id
         |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // CCNet bucket oracle: recompute the bigram-LM score (the
    // doc_lm_score CTE), then per-lang NTILE(3) on the ROUNDED score
    // with a doc_id tie-break — a total order, so both engines tile
    // identically.
    "perplexity_buckets" ->
      s"""WITH t AS (SELECT doc_id, list_filter($wsSql, x -> x != '') AS ws FROM documents),
         | b AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws)+1)) AS pos FROM t),
         | br AS (SELECT a.doc_id, a.w AS w1, a.w || ' ' || bb.w AS bigram
         |   FROM b a JOIN b bb ON bb.doc_id = a.doc_id AND bb.pos = a.pos + 1),
         | c2 AS (SELECT bigram, count(*) AS c2 FROM br GROUP BY 1),
         | c1 AS (SELECT w1, count(*) AS c1 FROM
         |   (SELECT unnest(ws) AS w1 FROM t) u GROUP BY 1),
         | v AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(ws) AS w FROM t) w),
         | s AS (SELECT br.doc_id, round(avg(ln((c2.c2 + 1) * 1.0 / (c1.c1 + v.v))), 4) AS lm_score
         |   FROM br JOIN c2 USING (bigram) JOIN c1 USING (w1) CROSS JOIN v GROUP BY 1),
         | j AS (SELECT d.doc_id, d.lang, s.lm_score FROM documents d JOIN s ON s.doc_id = d.doc_id)
         |SELECT doc_id, lang, lm_score,
         | CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket
         |FROM (SELECT doc_id, lang, lm_score,
         |   ntile(3) OVER (PARTITION BY lang ORDER BY lm_score DESC, doc_id) AS nt FROM j) x
         |ORDER BY doc_id""".stripMargin,
    // Entropy oracle: H = log2(N) − (Σ c·log2(c))/N over per-(doc,tok)
    // counts; + 0.0 folds IEEE -0.0 to +0.0 the same way the Spark side
    // does.
    "doc_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_filter($wsSql, x -> x != '')) AS tok FROM documents),
         | c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         | e AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct,
         |        sum(c * log2(c)) AS clog FROM c GROUP BY 1)
         |SELECT doc_id, n_tokens, n_distinct,
         | round(log2(n_tokens) - clog / n_tokens, 4) + 0.0 AS entropy_bits,
         | round(CASE WHEN n_distinct > 1
         |   THEN (log2(n_tokens) - clog / n_tokens) / log2(n_distinct)
         |   ELSE 0.0 END, 4) + 0.0 AS entropy_norm
         |FROM e ORDER BY doc_id""".stripMargin,
    // Keep-best curation oracle: connected components via the recursive
    // CTE (as corpus_curation_cc), survivor = highest quality score
    // (tie → lowest doc_id) per component, then the quality gate.
    "corpus_curation_best" ->
      s"""WITH RECURSIVE st AS ($statsSubSql),
         | sc AS (SELECT doc_id,
         |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS score
         |  FROM st),
         | q AS (SELECT doc_id FROM sc WHERE score >= 0.75),
         | sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | cnt AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | jp AS (SELECT a_id, b_id FROM cnt
         |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | edges AS (SELECT a_id AS src, b_id AS dst FROM jp
         |   UNION SELECT b_id, a_id FROM jp),
         | reach(doc_id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst),
         | comp AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
         | best AS (SELECT doc_id FROM (
         |   SELECT c.doc_id, row_number() OVER (PARTITION BY c.cluster_id
         |     ORDER BY sc.score DESC, c.doc_id) AS rn
         |   FROM comp c JOIN sc ON sc.doc_id = c.doc_id) x WHERE rn = 1)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         | JOIN q ON q.doc_id = d.doc_id
         | JOIN best ON best.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_chars,
        | CAST(length(norm_text) AS BIGINT) AS norm_chars, norm_text
        |FROM (SELECT doc_id, text,
        |  lower(trim(regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://\S+', ' <url> ', 'g'),
        |    '[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+', ' <email> ', 'g'),
        |    '\s+', ' ', 'g'))) AS norm_text
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "split_assign" ->
      """SELECT doc_id, bucket,
        | CASE WHEN bucket < 205 THEN 'train'
        |      WHEN bucket < 230 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST((strpos('0123456789abcdef',
        |     substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-v1'), 1, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef',
        |     substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-v1'), 2, 1)) - 1)
        |   AS BIGINT) AS bucket
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, rnk FROM (
        | SELECT doc_id, lang,
        |  CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY md5(CAST(doc_id AS VARCHAR) || '|graft-sample-v1'), doc_id) AS BIGINT) AS rnk,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents) t
        |WHERE rnk <= ceil(0.2 * n) ORDER BY doc_id""".stripMargin,
    "sample_weighted" ->
      """WITH m AS (SELECT max(n_chars) AS max_w FROM documents),
        | u AS (SELECT doc_id, n_chars,
        |  CAST(((strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-wsample-v1'), 1, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-wsample-v1'), 2, 1)) - 1)) * 16
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-wsample-v1'), 3, 1)) - 1)
        |   AS BIGINT) * 16
        |    + (strpos('0123456789abcdef',
        |      substr(md5(CAST(doc_id AS VARCHAR) || '|graft-wsample-v1'), 4, 1)) - 1) AS u16
        |  FROM documents)
        |SELECT doc_id, n_chars, u16,
        | round(n_chars * 1.0 / max_w, 4) AS keep_p
        |FROM u CROSS JOIN m
        |WHERE u16 * max_w < n_chars * 65536
        |ORDER BY doc_id""".stripMargin,
    "ngram_topk" ->
      s"""WITH w AS (SELECT list_filter($wsSql, x -> x != '') AS ws FROM documents),
         | b AS (SELECT unnest(list_transform(range(1, len(ws)),
         |   i -> ws[i] || ' ' || ws[i+1])) AS bigram FROM w)
         |SELECT bigram, count(*) AS n FROM b
         |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "tfidf_topterms" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter($wsSql, x -> x != '')) AS term
         |  FROM documents),
         | tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         | df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         | n AS (SELECT count(*) AS n_docs FROM documents),
         | scored AS (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |   round(tf.tf * (ln((n.n_docs + 1) * 1.0 / (df.df + 1)) + 1.0), 4) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tf, df, tfidf, rnk FROM (
         | SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |   ORDER BY tfidf DESC, term) AS BIGINT) AS rnk
         | FROM scored) t
         |WHERE rnk <= 5 ORDER BY doc_id, rnk""".stripMargin,
    "contamination_check" ->
      s"""WITH sh AS ($shingleSubSql),
         | bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
         | corp AS (SELECT * FROM sh WHERE doc_id % 20 != 0),
         | tot AS (SELECT doc_id, count(*) AS n_shingles FROM corp GROUP BY 1),
         | hit AS (SELECT c.doc_id, count(*) AS n_contaminated
         |   FROM corp c JOIN bench b ON c.s = b.s GROUP BY 1)
         |SELECT t.doc_id, t.n_shingles,
         | coalesce(h.n_contaminated, 0) AS n_contaminated,
         | round(coalesce(h.n_contaminated, 0) * 1.0 / t.n_shingles, 4) AS contamination_rate,
         | coalesce(h.n_contaminated, 0) * 1.0 / t.n_shingles >= 0.5 AS is_contaminated
         |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
         |ORDER BY t.doc_id""".stripMargin,
    // split buckets reuse the split_assign md5 arithmetic verbatim; the
    // shingle join runs on strings here vs 8-byte hashes in Spark (same
    // accepted equivalence as contamination_check / doc_overlap)
    "split_leakage" -> splitLeakageSql,
    "split_leakage_bloom" -> splitLeakageSql,
    // Cluster assignment inherits the minhash oracle soundness argument
    // (banded candidates exact-verified ⊆ exact pairs; set equality
    // spec-proven and re-asserted at every gate SF by the tri-SF local
    // gate): identical pair sets ⇒ identical connected components.
    "dedup_clusters" ->
      s"""WITH RECURSIVE
         | sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | cnt AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | jp AS (SELECT a_id, b_id FROM cnt
         |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | edges AS (SELECT a_id AS src, b_id AS dst FROM jp
         |   UNION SELECT b_id, a_id FROM jp),
         | reach(doc_id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst)
         |SELECT doc_id, min(r) AS cluster_id, doc_id = min(r) AS is_canonical
         |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "doc_overlap" ->
      s"""WITH sh AS ($shingleSubSql),
         | c AS (SELECT s, count(*) AS nd FROM sh GROUP BY s),
         | per AS (SELECT doc_id, count(*) AS n_shingles,
         |   sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_shared
         |  FROM sh JOIN c USING (s) GROUP BY doc_id)
         |SELECT doc_id, n_shingles, CAST(n_shared AS BIGINT) AS n_shared,
         | round(n_shared * 1.0 / n_shingles, 4) AS overlap_fraction,
         | n_shared * 1.0 / n_shingles >= 0.5 AS is_mostly_dup
         |FROM per ORDER BY doc_id""".stripMargin,
    "doc_repetition" ->
      s"""SELECT doc_id, n_shingles_total, n_shingles_distinct,
         | CASE WHEN n_shingles_total = 0 THEN NULL
         |      ELSE round(1.0 - n_shingles_distinct * 1.0 / n_shingles_total, 4)
         | END AS repetition_ratio
         |FROM (SELECT doc_id,
         |  CAST(greatest(len(ws) - 2, 0) AS BIGINT) AS n_shingles_total,
         |  CAST(len(list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
         |    i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))) AS BIGINT) AS n_shingles_distinct
         | FROM (SELECT doc_id, $wsSql AS ws FROM documents) w) t
         |ORDER BY doc_id""".stripMargin,
    // oracle generated from TextAnalysis.PiiPatterns so the two engines
    // can never drift on pattern text or application order (the shared
    // patterns avoid constructs where Java and RE2 regexes diverge)
    "pii_redact" -> {
      val pats = graft.ops.TextAnalysis.PiiPatterns
      val counts = pats.map { case (name, pat, _) =>
        s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
      }.mkString(",\n ")
      val redacted = pats.foldLeft("text") { case (c, (_, pat, tok)) =>
        s"regexp_replace($c, '$pat', '$tok', 'g')"
      }
      s"SELECT doc_id,\n $counts,\n $redacted AS redacted_text\nFROM documents ORDER BY doc_id"
    },
    "embed_quantize" ->
      """SELECT vec_id, round(absmax / 127.0, 6) AS scale,
        | CAST(list_min(codes) AS BIGINT) AS code_min,
        | CAST(list_max(codes) AS BIGINT) AS code_max,
        | round(list_sum(codes) * 1.0 / len(codes), 4) AS code_mean
        |FROM (SELECT vec_id, absmax,
        |  list_transform(v, x -> CAST(round(
        |    CASE WHEN absmax = 0 THEN 0 ELSE x * 127.0 / absmax END) AS BIGINT)) AS codes
        | FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |   list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS absmax
        |  FROM embeddings) a) b ORDER BY vec_id""".stripMargin,
    // Same quality+exact-dedup gates as corpus_curation, but near-dup
    // removal keeps one doc per CONNECTED COMPONENT (recursive CTE over
    // the exact-Jaccard pair graph) — the cluster-consistent semantics.
    "corpus_curation_cc" ->
      s"""WITH RECURSIVE st AS ($statsSubSql),
         | q AS (SELECT doc_id FROM (
         |  SELECT doc_id,
         |   (CASE WHEN n_tokens BETWEEN 10 AND 2000 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN stopword_ratio BETWEEN 0.01 AND 0.6 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
         |    CASE WHEN n_distinct_tokens * 1.0 / n_tokens >= 0.3 THEN 0.25 ELSE 0.0 END) AS s
         |  FROM st) t WHERE s >= 0.75),
         | sh AS ($shingleSubSql),
         | sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         | cnt AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
         |   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | jp AS (SELECT a_id, b_id FROM cnt
         |   JOIN sz sa ON sa.doc_id = a_id JOIN sz sb ON sb.doc_id = b_id
         |   WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5),
         | edges AS (SELECT a_id AS src, b_id AS dst FROM jp
         |   UNION SELECT b_id, a_id FROM jp),
         | reach(doc_id, r) AS (
         |   SELECT doc_id, doc_id FROM documents
         |   UNION
         |   SELECT e.src, reach.r FROM edges e JOIN reach ON reach.doc_id = e.dst),
         | ndcc AS (SELECT doc_id FROM (
         |   SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id) x
         |   WHERE doc_id != cluster_id),
         | ed AS (SELECT doc_id FROM (
         |   SELECT doc_id, min(doc_id) OVER (PARTITION BY $normSql) AS cn
         |   FROM documents) x WHERE doc_id != cn)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
         |JOIN q ON q.doc_id = d.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM ndcc)
         |  AND d.doc_id NOT IN (SELECT doc_id FROM ed)
         |ORDER BY d.doc_id""".stripMargin,
    // the oracle computes the packing prefix sum as ONE global window —
    // sound at gate SF; the engine's two-level scan must agree exactly
    "seq_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(list_filter($wsSql, x -> x != '')) AS BIGINT) AS n_tokens
         | FROM documents),
         | c AS (SELECT doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS stream_offset
         | FROM t)
         |SELECT doc_id, n_tokens, stream_offset,
         | stream_offset // 256 AS pack_id,
         | stream_offset % 256 AS pack_offset,
         | (stream_offset % 256) + n_tokens > 256 AS spans_boundary
         |FROM c ORDER BY doc_id""".stripMargin,
    "data_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        | t AS (SELECT sum(n_docs) AS tot,
        |   sum(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6))) AS ptot FROM c),
        | w AS (SELECT source, n_docs, tot,
        |   round(CAST(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6)) AS DOUBLE)
        |     / CAST(ptot AS DOUBLE), 6) AS weight
        |  FROM c CROSS JOIN t)
        |SELECT source, n_docs,
        | round(n_docs * 1.0 / tot, 6) AS raw_share, weight,
        | CAST(round(weight * 1000) AS BIGINT) AS target_n,
        | round(CAST(round(weight * 1000) AS BIGINT) * 1.0 / n_docs, 4) AS epochs
        |FROM w ORDER BY source""".stripMargin,
    // data_mix budgets realized as exact per-doc copy counts: base =
    // target_n div n_docs everywhere, +1 for the hash-rank-first
    // (target_n mod n_docs) docs — copy sums hit target_n exactly.
    "mix_sample" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        | t AS (SELECT sum(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6))) AS ptot FROM c),
        | w AS (SELECT source, n_docs,
        |   CAST(round(round(CAST(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6)) AS DOUBLE)
        |     / CAST(ptot AS DOUBLE), 6) * 1000) AS BIGINT) AS target_n
        |  FROM c CROSS JOIN t),
        | r AS (SELECT doc_id, source,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY md5(doc_id || '|graft-mix-v1'), doc_id) AS sample_rank
        |  FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.sample_rank AS BIGINT) AS sample_rank,
        | CAST((w.target_n // w.n_docs)
        |   + CASE WHEN r.sample_rank <= w.target_n % w.n_docs THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        |FROM r JOIN w USING (source)
        |WHERE (w.target_n // w.n_docs)
        |   + CASE WHEN r.sample_rank <= w.target_n % w.n_docs THEN 1 ELSE 0 END > 0
        |ORDER BY r.doc_id""".stripMargin,
    // mix_sample expanded to per-epoch units, epoch-major hash order,
    // then the seq_pack offset/pack arithmetic over that order.
    "mix_pack" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        | t AS (SELECT sum(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6))) AS ptot FROM c),
        | w AS (SELECT source, n_docs,
        |   CAST(round(round(CAST(CAST(round(pow(n_docs, 0.5), 6) AS DECIMAL(28,6)) AS DOUBLE)
        |     / CAST(ptot AS DOUBLE), 6) * 1000) AS BIGINT) AS target_n
        |  FROM c CROSS JOIN t),
        | r AS (SELECT doc_id, source,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY md5(doc_id || '|graft-mix-v1'), doc_id) AS sample_rank
        |  FROM documents),
        | m AS (SELECT r.doc_id,
        |   (w.target_n // w.n_docs)
        |     + CASE WHEN r.sample_rank <= w.target_n % w.n_docs THEN 1 ELSE 0 END AS n_copies
        |  FROM r JOIN w USING (source)
        |  WHERE (w.target_n // w.n_docs)
        |     + CASE WHEN r.sample_rank <= w.target_n % w.n_docs THEN 1 ELSE 0 END > 0),
        | u AS (SELECT m.doc_id, gs.copy_idx FROM m, LATERAL (
        |   SELECT unnest(range(1, n_copies + 1))) AS gs(copy_idx)),
        | tk AS (SELECT doc_id, len(list_filter($wsSql, x -> x != '')) AS n_tokens
        |  FROM documents),
        | o AS (SELECT u.doc_id, u.copy_idx, tk.n_tokens,
        |   md5(u.copy_idx || '|' || u.doc_id || '|graft-mixpack-v1') AS h
        |  FROM u JOIN tk USING (doc_id)),
        | cum AS (SELECT doc_id, copy_idx, n_tokens,
        |   sum(n_tokens) OVER (ORDER BY copy_idx, h, doc_id) - n_tokens AS stream_offset
        |  FROM o)
        |SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx,
        | CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(stream_offset AS BIGINT) AS stream_offset,
        | CAST(stream_offset // 256 AS BIGINT) AS pack_id,
        | CAST(stream_offset % 256 AS BIGINT) AS pack_offset,
        | (stream_offset % 256) + n_tokens > 256 AS spans_boundary
        |FROM cum ORDER BY stream_offset""".stripMargin,
    "shard_assign" ->
      """SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM (SELECT doc_id,
        |  CAST((strpos('0123456789abcdef',
        |     substr(md5(CAST(doc_id AS VARCHAR) || '|graft-shard-v1'), 1, 1)) - 1) * 16
        |   + (strpos('0123456789abcdef',
        |     substr(md5(CAST(doc_id AS VARCHAR) || '|graft-shard-v1'), 2, 1)) - 1)
        |   AS BIGINT) % 8 AS shard,
        |  md5(CAST(doc_id AS VARCHAR) || '|graft-shard-v1') AS h
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    "badword_filter" ->
      s"""SELECT doc_id, n_tokens, n_bad,
         | CASE WHEN n_tokens = 0 THEN NULL
         |      ELSE round(n_bad * 1.0 / n_tokens, 4) END AS bad_ratio,
         | coalesce(round(n_bad * 1.0 / n_tokens, 4) > 0.05, FALSE) AS is_flagged
         |FROM (SELECT doc_id,
         |  CAST(len(list_filter($wsSql, x -> x != '')) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter($wsSql, x -> x IN ('slow','dup','error','bad'))) AS BIGINT) AS n_bad
         | FROM documents) t ORDER BY doc_id""".stripMargin,
    // chunk geometry (size 32 / stride 24) mirrored as integer literals;
    // DuckDB list slicing is 1-based inclusive, matching Spark's slice()
    "doc_chunk" ->
      s"""WITH w AS (SELECT doc_id, list_filter($wsSql, x -> x != '') AS ws FROM documents),
         | nz AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
         | c AS (SELECT doc_id, ws, n,
         |   unnest(range(0, (n - 1) // 24 + 1)) AS chunk_id FROM nz)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         | CAST(len(ws[chunk_id * 24 + 1 : least(chunk_id * 24 + 32, n)]) AS BIGINT)
         |   AS n_chunk_tokens,
         | array_to_string(ws[chunk_id * 24 + 1 : least(chunk_id * 24 + 32, n)], ' ')
         |   AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id, n_ws_tokens, n_bpe_tokens,
        | CASE WHEN n_ws_tokens = 0 THEN NULL
        |      ELSE round(n_bpe_tokens * 1.0 / n_ws_tokens, 4) END AS tokens_per_word
        |FROM (SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        | FROM documents) t ORDER BY doc_id""".stripMargin,
    // The decode stub is deterministic from the blob bytes (documents are
    // ASCII), so its derived plans ARE SQL-expressible: n_frames =
    // bytes//1024+1, width/height from the first two byte values.
    "multimodal_frame_sample" ->
      """WITH f AS (SELECT doc_id,
        |   octet_length(CAST(text AS BLOB)) // 1024 + 1 AS n_frames
        |  FROM documents),
        | s AS (SELECT doc_id, n_frames,
        |   greatest(1, n_frames // 8) AS stride FROM f)
        |SELECT doc_id, unnest(range(0, n_frames, stride)) AS frame_idx
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,
    "multimodal_resize_plan" ->
      """WITH d AS (SELECT doc_id,
        |   64 + (ascii(substr(text, 1, 1)) % 64) AS width,
        |   64 + (ascii(substr(text, 2, 1)) % 64) AS height
        |  FROM documents)
        |SELECT doc_id, CAST(width AS BIGINT) AS width,
        | CAST(height AS BIGINT) AS height,
        | width * 224 // greatest(width, height) AS out_w,
        | height * 224 // greatest(width, height) AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS size_bytes,
        | substr(hex(CAST(text AS BLOB)), 1, 8) AS magic_hex,
        | md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The decode STUB is deterministic (features are pure byte
    // arithmetic over the blob), so the oracle recomputes it exactly —
    // the corpus is ASCII (gate-asserted: octet_length == len for every
    // doc), so per-char ascii() IS the byte value and the byte-mean
    // matches bit-for-bit. A real codec replaces both sides together.
    "multimodal_features" ->
      """WITH f AS (
        | SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS size_bytes,
        |  64 + (ascii(substr(text, 1, 1)) % 64) AS width,
        |  64 + (ascii(substr(text, 2, 1)) % 64) AS height,
        |  3 AS channels,
        |  octet_length(CAST(text AS BLOB)) // 1024 + 1 AS n_frames,
        |  round(list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
        |    / CAST(octet_length(CAST(text AS BLOB)) AS DOUBLE), 4) AS mean_byte
        | FROM documents)
        |SELECT doc_id, size_bytes, width, height, channels, n_frames, mean_byte,
        | round(CAST(width AS DOUBLE) / height, 4) AS aspect_ratio,
        | greatest(1, n_frames // 8) AS sample_stride
        |FROM f ORDER BY doc_id""".stripMargin,
    // Position = dense rank of a seeded md5 over doc_id — pure hash
    // arithmetic, so the permutation is engine-identical.
    "epoch_shuffle" ->
      """SELECT doc_id,
        | row_number() OVER (ORDER BY md5('epoch0:' || doc_id), doc_id) AS position
        |FROM documents ORDER BY position""".stripMargin
  )
}
