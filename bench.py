"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full execution with a count-style noop write
(``df.write.format('noop')``) so no result ferries to the driver.

The 10 slowest entries are re-run twice more and reported as the MEDIAN of
3 runs (raw samples in ``rerun_runs``), so slow-tail trends are judgeable
against the run-to-run spread instead of a single draw.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from phoebe_spark.queries import QUERIES
from phoebe_spark.session import get_spark

# Headline set: one per operator family — relational agg, fact-fact join,
# dedup, text, timeseries window/interpolate, similarity, minhash LSH.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q05_revenue_by_nation",
    "q08_dedup_exact",
    "q13_ngram_jaccard",
    "q14_ts_minutely_sum",
    "q16_ts_summary",
    "q17_ts_slope",
    "q19_ts_rolling",
    "q20_ts_interpolate",
    "q22_emb_cosine",
    "q23_emb_knn",
    "q24_minhash_pairs",
    "q40_merge_overwrite",
    "q41_emb_neardup_pairs",
    "q44_ivf_ann",
    # round-2 additions: curation / join / rollup coverage
    "q46_sessionize",
    "q49_rollup_revenue",
    "q51_winnow_fingerprints",
    "q53_dedup_components",
    "q54_asof_join",
    "q58_decontamination",
    "q60_quality_rules",
    "q62_pack_sequences",
    "q64_range_join",
    "q65_stratified_sample",
    "q66_label_centroids",
    "q67_boilerplate",
    "q68_semantic_prune",
    "q69_quantize_embeddings",
    "q70_token_fertility",
    "q71_event_funnel",
    # round-3 additions
    "q72_unigram_logprob",
    "q73_bloom_decontaminate",
    "q74_random_projection",
    "q75_cusum_drift",
    "q77_mad_anomaly",
    "q78_chunk_dedup",
    "q80_best_supplier",
    "q81_cube_revenue",
    "q84_column_profile",
    "q86_theil_sen",
    "q88_keep_best",
    "q89_bm25",
    "q90_rrf_fusion",
    "q92_edit_verify",
    "q93_token_entropy",
    "q94_source_kl",
    "q95_retention_cohorts",
    "q96_event_gaps",
    "q97_weighted_sample",
    "q98_pivot_daily",
    "q99_trailing_actives",
    "q100_calendar_heatmap",
    "q101_curation_pipeline",
    "q102_incremental_dedup",
    "q103_attribution",
    "q104_value_quantiles",
    "q105_wow_growth",
    "q106_ship_delay",
    "q107_session_conversion",
    "q108_source_dup_ratio",
    "q109_embedding_health",
    "q110_token_topk",
    "q111_rfm_segments",
    "q112_acf",
    "q113_seasonality",
    "q114_discount_bands",
    "q115_bigram_pmi",
    "q116_cardinality_gate",
    "q117_quantile_gate",
    "q118_dup_pagerank",
    "q119_multires_rollup",
    "q120_cluster_purity",
    "q121_minhash_calibration",
    "q122_source_overlap",
    "q123_dedup_yield_curve",
    "q124_sole_late_supplier",
    "q125_supplier_share",
    "q126_set_ops",
    "q127_value_rank_profile",
    "q128_keyed_ntile",
    "q129_scd2_islands",
    "q130_transition_matrix",
    "q131_zipf_slope",
    "q132_zorder_locality",
    "q133_top_unshipped",
    "q134_promo_share",
    "q135_disjunctive_pred",
    "q136_ngram_diversity",
    "q137_importance_weights",
    "q138_prefix_ssjoin",
    "q139_jsonl_roundtrip",
    "q140_bpe_pair_stats",
    "q141_cms_gate",
    "q142_partition_pruning",
    "q143_orc_roundtrip",
    "q144_skyline_users",
    "q145_bpe_train",
    "q146_max_coverage",
    "q147_shard_layout",
    "q148_length_buckets",
    "q149_pq_ann",
    # round-4 additions
    "q150_dup_substring_ratio",
    "q151_cheapest_supplier",
    "q152_big_orders",
    "q153_idle_rich_customers",
    "q154_kmv_distinct",
    "q155_mixture_resample",
    "q156_ivf_recall_curve",
    "q157_referential_integrity",
    "q158_compaction_plan",
    "q159_token_budget_curve",
    "q160_bpe_encode",
    "q161_source_data_card",
    "q162_bilateral_trade",
    "q163_market_share",
    "q164_returned_items",
    "q165_order_count_distribution",
    "q166_top_supplier",
    "q167_small_qty_revenue",
    "q168_product_profit",
    "q169_supplier_relationship",
    "q170_lsh_neardup_pairs",
    "q171_measure_profile_unpivot",
    "q172_grouping_id_rollup",
    "q173_lang_embedding_coherence",
    "q174_dup_pair_embedding_audit",
    "q175_trailing_range_window",
    "q176_forecast_revenue_change",
    "q177_local_supplier_volume",
    "q178_quality_dup_curve",
    "q179_streaming_dedup_drain",
    "q180_streaming_window_drain",
    "q181_calendar_gap_audit",
    # round-5 additions
    "q182_leakage_safe_split",
    "q183_source_length_ks",
    "q184_streaming_profile_drain",
    "q185_audio_dominant_freq",
    "q186_chunk_scrub_rebuild",
    "q187_kmeans_embeddings",
    "q188_streaming_quota_drain",
    "q189_stitch_audit",
    "q190_source_quality_cap",
    "q191_seasonal_decompose",
    "q192_matryoshka_audit",
    # round-5 additions: lifecycle / stream-join / drift / overlap coverage
    "q193_snapshot_diff",
    "q194_cdc_apply",
    "q195_normalization_lift",
    "q197_stream_join_drain",
    "q198_source_centroid_drift",
    "q200_source_vocab_overlap",
    "q201_tpch_q4_semi",
    "q202_kmv_set_ops",
    "q203_session_window_drain",
    "q204_image_ahash_gate",
    "q205_watermark_drop_audit",
    "q206_naive_bayes_source",
    "q207_blocking_er_join",
    "q208_image_phash_gate",
    "q209_streaming_cusum_drain",
    "q210_streaming_topk_drain",
    "q211_dominant_supplier",
    "q212_benford_audit",
    "q213_ushaped_attribution",
    "q214_unigram_lm_tokenizer",
    "q215_wordpiece_encode",
    "q216_quality_signal_agreement",
    "q217_neardup_decontamination",
    "q218_stream_outer_join_drain",
    "q219_pca_power_iteration",
    "q220_dedup_within_watermark_drain",
    "q221_contamination_closure_bfs",
    "q222_csv_roundtrip",
    "q223_schema_evolution_read",
    "q224_quantile_normalize",
    "q225_market_basket",
    "q226_delta_encoding_audit",
    "q227_token_waterfill",
    "q228_interleaved_epoch_order",
    "q229_event_timer_sessions_drain",
    "q230_weighted_median",
    "q231_eval_apportionment",
    "q232_part_pagerank",
    "q233_triangle_census",
    "q234_semdedup_prune",
    "q235_rag_chunks",
    "q236_length_bucket_batches",
    "q237_hourly_acf",
    "q238_changepoint",
    "q239_k_anonymity",
    "q240_time_weighted_avg",
    "q241_band_join",
    "q242_ndcg_eval",
    "q243_label_propagation",
    "q244_minhash_merge_cert",
    "q245_key_skew_gini",
    "q246_stream_first_match_drain",
    "q247_partition_overwrite",
    "q248_bucketed_join",
    "q249_streaming_cdc_upsert_drain",
    "q250_scd2_pit_join",
    "q251_rank_biased_overlap",
    "q252_asof_tolerance",
    "q253_session_paths",
    "q254_fano_burstiness",
    "q255_hopping_window",
    "q256_token_lorenz",
    "q257_date_dim_rollup",
    "q258_containment_pairs",
    "q259_variant_shred",
    "q260_expectations_suite",
    "q261_incremental_agg_maintenance",
    "q262_snake_sharding",
    "q263_golden_record",
    "q264_determinism_cert",
    "q265_order_integrity",
    "q266_reconciliation",
    "q267_ts_similarity_search",
    "q268_paa_prune_audit",
    "q269_sax_words",
    "q270_seasonal_backtest",
    "q271_dtw_topk",
    "q272_matrix_profile",
    "q273_holt_linear",
    "q274_holt_by_key",
    "q275_streaming_holt_drain",
    # round-7 additions: QoS/operations analytics
    "q276_slo_burn_rate",
    "q277_littles_law_audit",
    "q278_rescale_replay",
    "q279_roc_auc",
    "q280_calibration_bins",
    "q281_ab_welch_ttest",
    "q282_kaplan_meier",
    "q283_hll_distinct",
    "q284_holt_winters",
    "q285_bigram_lm_score",
    "q286_l_diversity",
    "q287_column_dependence",
    "q288_fs_em_weights",
    "q289_streaming_burn_drain",
    # round-7 additions
    "q290_conformal_interval",
    "q291_kcore",
    "q292_quantile_hist_sketch",
    "q293_eigencentrality",
    "q294_clustering_coeff",
    "q296_t_closeness",
    "q297_mann_whitney",
    "q298_pca_power_iter",
    "q299_blocking_quality",
    "q300_streaming_hist_drain",
    "q301_link_prediction",
    "q302_isotonic_calibration",
    "q303_sprt_monitor",
    "q304_ams_f2_sketch",
    "q305_corpus_merkle",
    "q306_streaming_sprt_drain",
    "q307_grouped_conformal",
    "q308_landmark_bfs",
    "q309_heaps_law",
    "q310_ks_two_sample",
    "q311_mann_kendall",
    "q312_jsd_sources",
    "q313_page_hinkley",
    "q314_cramers_v",
    "q315_streaming_page_hinkley_drain",
    "q316_embedding_isotropy",
    "q317_markov_stationary",
    "q318_psi_drift",
    "q319_cramer_von_mises",
    "q320_hybrid_retrieval",
    "q321_mmr_rerank",
    "q322_mahalanobis_outliers",
    "q323_robust_zscore_mad",
    "q324_streaming_psi_drain",
    "q325_rake_keyphrases",
    "q326_croston_intermittent",
    "q327_dbscan_lite",
    "q328_hard_negatives",
    "q329_kneser_ney_lm",
    "q330_mde_power",
    "q331_srm_check",
    "q332_seasonal_strength",
    "q333_hill_tail_index",
    "q334_odds_ratio",
    "q335_term_burstiness",
    "q336_gini_simpson",
    "q337_lift_gain_curve",
    "q338_chao1_richness",
    "q339_median_ci",
    "q340_simpsons_paradox",
    "q341_burrows_delta",
    # round-9 additions: multiple-testing / drift / agreement /
    # experimentation / graph-text / classical-test ladders
    "q342_bh_fdr",
    "q343_wasserstein_drift",
    "q344_kendall_tau",
    "q345_cmh_test",
    "q346_cohens_kappa",
    "q347_brier_decomposition",
    "q348_textrank",
    "q349_association_rules",
    "q350_hits",
    "q351_ljung_box",
    "q352_ecod_outliers",
    "q353_streaming_cms_drain",
    "q354_spectral_moments",
    "q355_cuped",
    "q356_bootstrap_ci",
    "q357_gumbel_return_level",
    "q358_absorbing_markov",
    "q359_mutual_information",
    "q360_neyman_allocation",
    "q361_gesd_outliers",
    "q362_group_sequential",
    "q363_kruskal_wallis",
    "q364_brown_forsythe",
    "q365_anova_eta",
    "q366_mcnemar",
    "q367_runs_test",
    "q368_durbin_watson",
    "q369_quantile_treatment_effect",
    "q370_shard_balance_audit",
    "q371_friedman",
    "q372_cochran_q",
    "q373_jonckheere",
    "q374_welch_anova",
    "q375_energy_distance",
    "q376_mmd_rff",
    "q377_hellinger_tv",
    "q378_cliffs_delta",
    "q379_hhi_concentration",
    "q380_theil_decomposition",
    "q381_atkinson_index",
    "q382_hurst_rs",
    "q383_variance_ratio",
    "q384_theta_forecast",
    "q385_sample_entropy",
    "q386_average_precision",
    "q387_mcc_sweep",
    "q388_good_turing",
    "q389_hosmer_lemeshow",
    "q390_dp_laplace_audit",
    "q391_streaming_bottomk_drain",
    "q392_excess_supplier",
    "q393_assortativity",
    "q394_forecast_scoreboard",
    "q395_tukey_hsd",
    "q396_dunning_g2",
    "q397_cluster_validity",
    "q398_nearest_centroid_eval",
    "q399_degree_powerlaw",
    "q400_retention_decay",
    "q401_bradley_terry",
    "q402_fleiss_kappa",
    "q403_logrank_test",
    "q404_condorcet_copeland",
    "q405_overdispersion",
    "q406_stratified_ipw_ate",
    "q407_graph_modularity",
    "q408_vif_collinearity",
    "q409_oof_target_encoding",
    "q410_gini_binned",
    "q411_cronbach_alpha",
    "q412_diff_in_diff",
    "q413_source_vocab_overlap",
    "q414_ipw_diagnostics",
    "q415_streaming_moments_drain",
    "q416_log_odds_dirichlet",
    "q417_competing_risks",
    "q418_price_elasticity",
    "q419_gehan_wilcoxon",
    "q420_rmst",
    "q421_weighted_kappa",
    "q422_stuart_maxwell",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("phoebe-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the session (JVM JIT, codegen, shuffle machinery, parquet
    # footers) so per-query timings measure the queries, not session boot.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    # Pre-spawn the Python UDF workers + Arrow serde path so the first
    # pandas-backed query times its work, not worker boot.
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(64).repartition(8).groupBy(F.col("id") % 8).applyInPandas(
        lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long"
    ).collect()
    # first broadcast-exchange init costs ~2 s once per JVM — warm it so
    # it doesn't land on whichever query first broadcasts
    spark.range(1000).join(
        F.broadcast(spark.createDataFrame([(1, "x")], "id long, s string")), "id"
    ).count()

    def release_session_state() -> None:
        """Unpersist lingering blocks and nudge the JVM GC. Measured
        round-8 drift attribution: after ~80 entries the streaming drains
        ran 12-36% slower in-session (q246 8.8->9.87 s, q229 9.45->12.84 s
        medians); with this release they return to first-in-session speed
        (10.44->10.71 s / 9.91->9.82 s). The accumulation is localCheckpoint
        blocks (eagerly persisted, released only when the driver GC +
        ContextCleaner catch up) plus JVM heap aging — not machine noise.

        INVARIANT (ADVICE r8): this unpersists EVERY persistent RDD in
        the session, including eagerly localCheckpointed RDDs whose
        lineage is already truncated — any such DataFrame becomes
        unrecoverable afterwards. Safe only because each bench entry is
        fully drained (noop write) before the every-50 release; no live
        DataFrame reference may be held across a release boundary."""
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    for i, name in enumerate(BENCH_QUERIES):
        if i and i % 50 == 0:
            release_session_state()
        t0 = time.time()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # The slow tail dominates round-over-round comparisons, and single-shot
    # timings at these magnitudes carry a 120-145 s run-to-run spread — so
    # re-run the 10 slowest entries twice more and report each one's MEDIAN
    # of 3 runs. `rerun_runs` keeps the raw samples so a regression can be
    # judged against the observed spread, not a single draw.
    import statistics

    release_session_state()
    rerun_runs: dict[str, list[float]] = {}
    for name in sorted(timings, key=lambda n: -timings[n])[:10]:
        runs = [timings[name]]
        for _ in range(2):
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        rerun_runs[name] = runs
        timings[name] = round(statistics.median(runs), 3)

    # Model-pipeline throughput vs the reference (BASELINE.md: the
    # analytics engine processes 6 h of 1 Hz samples, 21,600 points, with a
    # 20-model ensemble): fit + 600 s forecast on the same-sized series.
    import numpy as np

    from phoebe_spark.models.workload import WorkloadForecaster

    rng = np.random.default_rng(42)
    t = np.arange(21_600)
    vals = np.abs(
        (100_000 * np.sin(2 * np.pi * t / 7_200) + 100_000) * (1 + rng.normal(0, 0.01, len(t)))
    )
    t0 = time.time()
    forecaster = WorkloadForecaster()
    forecaster.fit(spark, t, vals)
    timings["m1_fit_20_models_6h_series"] = round(time.time() - t0, 3)
    t0 = time.time()
    forecaster.predict(t, vals, horizon_s=600)
    timings["m2_forecast_600s"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full line first (compact separators keep it as small as possible),
    # with the scalar fields BEFORE the big `queries` map so a truncated
    # capture still shows the total; then a short summary-only line last so
    # any tail-capture window always contains one fully parseable JSON line.
    full = {
        "metric": "bench_total_runtime",
        "value": total,
        "unit": "sec",
        "sf": sf_val,
        "queries": timings,
        "rerun_runs": rerun_runs,
    }
    print(json.dumps(full, separators=(",", ":")))
    # The driver's BENCH artifact keeps only a 2000-char tail, so also
    # persist the complete per-query map to a file the repo can commit —
    # cross-round regression tracking needs all ~290 entries, not 5
    # (VERDICT r8 ask #4). Default beside the repo root; override with
    # $SPARK_GRAFT_BENCH_OUT, disable with an empty value.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_results_latest.json"),
    )
    if out_path:
        try:
            with open(out_path, "w") as fh:
                json.dump(full, fh, indent=1, sort_keys=True)
        except OSError:
            pass  # benching must never fail on an unwritable results path
    top5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    print(
        json.dumps(
            {
                "metric": "bench_total_runtime",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "entries": len(timings),
                "queries": top5,
                "slow_tail_medians3": {n: timings[n] for n in rerun_runs},
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
