"""Fused driver-window probe entries + the canonical registry order.

The driver's correctness gate checks the FIRST 50 registry entries only
(CORRECTNESS_r02/r03 key sets were exactly ``REGISTRY[:50]`` of 101), so
granular single-operator entries past slot 50 never get a driver row.
This module fixes that in two moves:

1. **Fused probes** (``fx_*``): several granular entries packed into one
   driver row via a union of ``(part, k, v)`` probe rows. Each component's
   registered Spark fn and oracle SQL are reused VERBATIM — the Spark side
   maps the component's output DataFrame, the oracle side wraps the
   component's SQL as a subquery — so a fused probe checks exactly the
   same rows, values included, as the granular entries it covers:

   - every non-double output column (keys, strings, ints) is serialized
     into ``k`` (``'|'``-joined, NULL → '∅') — integer↔VARCHAR casts are
     digit-identical across Spark and DuckDB, and string-encoding count
     columns sidesteps DuckDB's HUGEINT-renders-as-float hash trap;
   - each double column rides through ``v`` (CAST AS DOUBLE both sides —
     never stringified, so float exactness is preserved bit-for-bit);
     one probe row per (source row × double column), tagged
     ``<component>.<column>`` in ``part``.

   The granular entries stay registered (after the window) so the local
   oracle harness still checks every operator one by one.

2. **DRIVER_WINDOW**: the curated first-50 ordering, covering every
   SURVEY §2 family plus the LLM-pipeline flagships (d1/d2/d5b/t2/t8/
   pipe1/sp1) and the streaming interval join (st6). ``ordered_registry``
   re-keys the registry so this window is what the driver sees.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import mrf_etl_spark.plans.parity_llm  # noqa: F401  (fx_llm_pipelines components must be registered first)
import mrf_etl_spark.plans.parity_streaming  # noqa: F401  (fx_streaming_batch components)
from mrf_etl_spark.plans.parity import REGISTRY, ParityQuery, register

# fused name -> [(component entry name, [double-typed output columns])]
# Non-double output columns are discovered from the component DataFrame at
# run time on the Spark side; the oracle side lists them explicitly below
# (generated from the component schemas, asserted in tests).
FUSE_SPECS: dict[str, list[tuple[str, list[str]]]] = {
    "fx_geo_lookups": [
        ("s9_geocode_cached_lookup", ["lat", "lon"]),
        ("s10_hud_zip_cbsa", []),
        # round-10: the exact-substring pair (all-int surfaces, ~0.2 s
        # oracles) — cost-driven rides on the window's lightest probe
        # (every dedup/text-family probe is at the 7-cap; precedent:
        # sp23 on fx_projection_filters)
        ("d16_repeat_ladder", []),
        ("d17_longest_repeat", []),
        # round-10: tokenizer-aware packing (t24 ∘ sp6) — all-int
        # manifest surface, same cost-driven slot
        ("sp24_bpe_sequence_pack", []),
        # round-10: perplexity-bucketed curriculum (t25 ∘ sp14) —
        # all-int surface, same cost-driven slot
        ("sp26_perplexity_curriculum", []),
        # round-10: per-doc exact max repeat length — the substring
        # triple's third member (probe now at the 7-cap)
        ("d18_exact_repeat_lengths", []),
    ],
    "fx_writer_roundtrips": [
        ("s12_append_unique_roundtrip", []),
        ("s13_upsert_idempotent", ["total"]),
        ("s23_scd2_history", ["value"]),
        ("s24_point_in_time", ["value_asof"]),
        # round-8: balanced-shard export round-trip (sp22's oracle
        # verbatim — disk must equal plan)
        ("s28_shard_export_roundtrip", []),
        # round-9: stats-MV sketch state round-trip (lake family: append
        # batch state, serve merged; all-int + boolean surface)
        ("a29_persisted_category_stats", []),
        # round-9: streaming IVF-PQ appends ARE writer round-trips —
        # n7's oracle verbatim (~0.85 s; fx_ann is at cap and already
        # the heaviest probe)
        ("st19_stream_ivfpq_ingest", ["cosine"]),
    ],
    "fx_latest_partitioned": [
        ("s14_latest_merge", ["sum_value"]),
        ("s15_partitioned_write", []),
        # round-9 session 3: the streaming fertility monitor appends
        # additive count state to a partition lake and serves the
        # merged rollup — the family's lake-state member (every
        # streaming-family probe is at the 7-cap); all-int surface
        ("st22_stream_fertility", []),
        # round-9 session 3: q10's streaming twin — additive (cid,
        # label) count lake served as the corpus map (oracle = q10's)
        ("st23_stream_cluster_map", []),
        # round-9 session 3: pipe7's disk half — the partitioned-write
        # family IS this probe's subject; row-for-row manifest surface
        ("s30_training_order_export", []),
        # round-10: the decontaminated training order (q11's dual gate
        # feeding pipe7's manifest) — all-int surface; cost-driven ride
        # beside its sibling s30 (fx_projection_filters and fx_anti_semi
        # hold the parents and sit at 6-7)
        ("pipe8_decontam_training_order", []),
        # round-11 (cont.): the data-constrained manifest (sp27's
        # capped schedule feeding pipe7's tail) — all-int surface;
        # same manifest-family slot rationale as pipe8 (probe now at
        # the 7-cap)
        ("pipe10_capped_training_order", []),
    ],
    "fx_projection_filters": [
        ("p123_projection", ["rate", "ga_prof_mar"]),
        ("p567_predicates", ["avg_price"]),
        ("p8_substring_whitelist", []),
        ("p10_multi_filter", []),
        # round-9 session 3: the mixture-rate solver — 20 all-int rows;
        # cost-driven ride (every sampling-family probe is at the
        # 7-cap; precedent: e5 on fx_explode, e6/e7 on fx_topk_page)
        ("sp23_mixture_solver", []),
        # round-9 session 3: pipe7 composes sp23+sp7+sp8 into the
        # dataloader manifest — all-int surface, same cost-driven slot
        ("pipe7_training_order", []),
        # round-11: pipe0 IS the composition of this probe's projection/
        # filter family (P1-P8, P10 all live in enrich_pipeline.py) —
        # its direct window slot freed for the fx_media split
        ("pipe0_enrich", ["rate_sum"]),
    ],
    "fx_anti_semi": [
        ("j10_anti_join", []),
        ("j11_semi_join", []),
        # round-9: the semantic decontamination gate is the family's
        # embedding member (exclude-matching-the-other-side semantics);
        # cosine rides the v column, ~0.15 s oracle
        ("d14_semantic_decontam", ["cosine"]),
        # round-9: the gate applied AT INGEST — lake after the streamed
        # drain == d14's clean subset, oracle derived from d14's
        ("st21_stream_decontam_gate", ["cosine"]),
        # round-9 session 3: DSIR importance selection — the family's
        # CHOOSE gate beside the drop gates; all-int surface, tiny
        # 50-row budget output (~0.1 s oracle)
        ("d15_dsir_select", []),
        # round-9 session 3: the dual-gate release audit — d12 + d14
        # joined on id; max_eval_cos rides the v column
        ("q11_dual_gate_decontam", ["max_eval_cos"]),
        # round-10: dedup-aware mixture solver (d11's weights feeding
        # sp23's arithmetic) — all-int surface; family-adjacent ride
        # (d14/d15/q11 live here), probe now at the 7-cap
        ("sp25_dedup_aware_mixture", []),
    ],
    "fx_means": [
        ("a1_group_mean", ["avg_bal"]),
        ("a2_multi_mean", ["avg_qty", "avg_price", "avg_disc"]),
        ("a3_global_mean", ["avg_qty", "avg_tax"]),
        # round-7 session 3: exact grouped least squares (decimal-exact
        # moments -> bit-identical doubles; oracle 0.03 s) and count-min
        # heavy hitters (fully replayed counters; oracle 0.04 s)
        ("a24_grouped_regression", ["slope", "intercept", "r2"]),
        ("a25_countmin_heavy_hitters", []),
        # round-8: a25's persisted lake twin (oracle reused verbatim,
        # 0.04 s) and a21's persisted-HLL twin (0.01 s)
        ("a26_persisted_cms", []),
        ("a27_persisted_hll", []),
    ],
    "fx_stats": [
        ("a4_summary_stats", ["avg_rate", "min_rate", "max_rate", "median_rate"]),
        ("a5_topk_group_stats", ["avg_rate"]),
        ("a6_percentile_profile", ["p10", "p25", "p50", "p75", "p90"]),
        ("a16_weighted_median", ["weighted_median"]),
        ("a19_robust_spread", ["median_v", "mad"]),
        # round-8: moved from fx_agg_shapes (was 8 components — above the
        # now-binding ≤7 blast-radius cap); the histogram is stats-family
        ("a23_histogram", ["bin_lo"]),
        # round-8: a20's persisted-grid twin (oracle reused verbatim)
        ("a28_persisted_quantile_grid", ["p50", "p90"]),
    ],
    "fx_distinct_dedup": [
        ("a9_multi_distinct", []),
        ("a10_drilldown", ["avg_price"]),
        ("a11_dedup_distinct", []),
        ("a15_pivot_matrix", []),
        ("a17_deterministic_mode", []),
        ("a18_cube", ["price_sum"]),
        ("a22_frequent_items", ["support"]),
    ],
    # round-7 rebalance (VERDICT r6 #4): fx_latest_best carried 13
    # components — one environmental failure there would blank 13
    # verifications (the r5 lesson). Split by family into two ~equal-cost
    # probes; slots freed by fusing the cheap direct rows s4+s8
    # (fx_tolerant_lookups) and w4-w7 (fx_event_windows) below.
    "fx_latest_best": [
        ("w1_latest_per_key", ["value"]),
        ("w2_best_per_key", ["best_value"]),
        ("w8_event_funnel", ["conversion"]),
        ("w9_gapfill_locf", ["v_filled"]),
        ("w10_ohlc_downsample", ["v_low", "v_high", "v_open", "v_close", "v_sum"]),
        ("w11_user_reach", []),
    ],
    "fx_window_analytics": [
        ("w12_retention_cohorts", []),
        ("w16_interarrival", []),
        ("w13_asof_forward", ["view_value", "click_value"]),
        ("w14_trailing_window", ["sum_24h"]),
        ("w17_time_weighted_avg", ["twap"]),
        ("w18_sliding_reach", []),
        ("w19_streaks", []),
    ],
    "fx_tolerant_lookups": [
        ("s4_tolerant_scan", []),
        ("s8_nppes_cached_lookup", []),
        # round-11: d20 trim_repeats (the repeated-span REMOVAL rewrite)
        # — all-int + string surface; cost-driven ride on the window's
        # emptiest probe (the substring family's fx_geo_lookups is at
        # the 7-cap; precedent: sp23 on fx_projection_filters)
        ("d20_trim_repeats", []),
        # round-11 (cont.): the corpus-statistics pair — t26's only
        # double column (zipf_slope) rides v bit-exact (correctly-
        # rounded IEEE from identical int64 sums on both engines);
        # t27 is all-int. Same cost-driven slot rationale as d20.
        ("t26_zipf_fit", ["zipf_slope"]),
        ("t27_vocab_growth", []),
        # round-11 (cont.): data-constrained repetition schedule —
        # solver-family all-int + boolean surface, O(domains) output
        ("sp27_repetition_schedule", []),
        # round-11 (cont.): streaming Zipf monitor — t26's twin (same
        # output shape; ~0.3 s oracle = t26's verbatim); cost-driven
        # ride, probe now at the 7-cap
        ("st24_stream_zipf_monitor", ["zipf_slope"]),
    ],
    "fx_event_windows": [
        ("w4_asof_join", ["click_value", "view_value"]),
        ("w5_sessionize_batch", ["val_sum"]),
        ("w6_range_join", []),
        ("w7_rolling_metrics", ["cum_sum", "roll_sum", "roll_avg"]),
        ("w20_approx_sliding_reach", []),
        # round-7 session 3: burst detection (all-integer/boolean
        # surface, 0.01 s oracle)
        ("w21_burst_detection", []),
        # round-8: integer-exact EWMA momentum (0.01 s oracle)
        ("w22_ewma_momentum", []),
    ],
    "fx_topk_page": [
        ("k1_topk", ["price"]),
        ("k2_pagination", []),
        ("k6_diversified_topk", ["price"]),
        # round-9: filtered ANN is the family's vector member — a
        # metadata-predicated TOP-K (n2-band oracle, ~0.4 s; fx_ann is
        # at the 7-cap and already the heaviest probe)
        ("n9_ann_filtered", ["cosine"]),
        # round-9: the k-means codebook trainer — k·dim all-integer rows
        # (trained coarse-quantizer bytes + member counts); rides the
        # family probe that already holds the ANN member (n9). ~0.1 s
        # oracle: the corpus is 500 int8 vectors × 6 centroids.
        ("e6_kmeans_codebook", []),
        # round-9: PQ sub-codebook trainer — e6's sibling, same probe
        # family, all-integer (b, cid, n_members, i, cs) surface, ~0.2 s
        ("e7_pq_codebook_train", []),
        # round-9 session 3: the cluster corpus map — k all-int rows
        # composing e6's trainer (probe now at the 7-cap)
        ("q10_cluster_map", []),
    ],
    "fx_serving": [
        ("k3_autocomplete", []),
        ("k4_detail_page", ["rate"]),
        ("u1_union_tolerant", ["total"]),
        ("u2_intersect_except", []),
        ("k5_keyset_pagination", ["price"]),
        ("u3_union_distinct", []),
        ("w15_rank_family", ["pr", "cd"]),
    ],
    # round-8 rebalance (VERDICT r7 #1): fx_scalars carried 12 components
    # and fx_quality_json 3 — one environmental failure on fx_scalars
    # would have blanked 12 scalar-family verifications, above the repo's
    # post-r5 ≤~7 blast-radius discipline. The 15 components re-pack into
    # three family probes (string scalars / numeric+json scalars / the
    # explode family); the extra slot comes from fusing the sp20 direct
    # row into fx_eval_suites (its 0.16 s closure oracle fits that
    # probe's headroom).
    "fx_scalars_str": [
        ("f_slugify", []),
        ("f_hash_uid", []),
        ("f_year_month", []),
        ("f_zip5_lpad", []),
        ("f_categorizer", []),
        # round-9 session 3: the power-iteration direction — 128 all-int
        # rows (cost-driven ride: fx_scalars_num and the embedding
        # probes are all at the 7-cap; ~0.1 s oracle)
        ("e12_power_iteration", []),
    ],
    "fx_scalars_num": [
        ("f_math_formula", ["calc_rate"]),
        ("f_json_extract", ["avg_k"]),
        ("f_array_normalize", []),
        ("q1_quality_report", ["bad_rate"]),
        # round-9: the linear-probe trainer — all-int64 weight/count
        # surface (~0.1 s oracle); the embedding probes are at the 7-cap
        ("e9_linear_probe", []),
        # round-9: the train/eval loop — 2 all-int confusion rows
        ("e10_probe_eval", []),
        # round-9 session 3: the deploy step — full-corpus scoring with
        # the trained weights, 500 all-int/boolean rows (probe now at
        # the 7-cap, completing the e9→e10→e11 lifecycle in one family)
        ("e11_probe_inference", []),
    ],
    "fx_explode": [
        # round-9: the embedding-QA gate — all-integer/boolean surface,
        # e1's quantization + one centroid agg; rides the array-HOF
        # family probe (fx_text_stats, e1's home, is at the 7-cap)
        ("e5_embedding_outliers", []),
        ("x1_explode", []),
        ("x2_json_explode", []),
        ("x3_unpivot", []),
        ("x4_map_explode", []),
        ("x5_explode_outer", []),
        ("x6_posexplode", []),
    ],
    "fx_lake_ops": [
        ("s18_compaction", ["val_sum"]),
        ("mv1_materialized_rollup", ["bucket_tax", "revenue"]),
        ("s19_csv_roundtrip", ["price_sum"]),
        ("s20_jsonl_roundtrip", ["price_sum"]),
        ("s21_orc_roundtrip", ["price_sum"]),
        ("s22_range_layout_write", ["price_sum"]),
        ("s25_zorder_layout_write", ["price_sum"]),
    ],
    # round-6 rebalance: the r5 fx_llm_pipelines / fx_corpus_release /
    # fx_dedup_variants probes OOM'd in the driver's verify process (the
    # Spark JVM holds ~56k of the 65530 vm.max_map_count budget; one
    # overweight DuckDB statement at default 32 threads tipped it over).
    # Their 34 components are re-packed into eight lighter probes, grouped
    # by MEASURED oracle cost at default threads (scripts/measure_oracle.py)
    # so no single statement is heavy; d8 (the worst, 3.3 s / 525 MB even
    # with the unrolled closure) gets its own direct window row. Slots were
    # freed by fusing the cheap direct rows (fx_small_sources,
    # fx_llm_flagships below).
    "fx_small_sources": [
        ("s1_pruned_scan", ["sum_price"]),
        ("s2_corrupt_salvage", []),
        ("s5_excel_sheets", ["rate_sum"]),
        ("s6_sqlite_source", ["wi_sum"]),
        ("s7_code_list_filter", []),
        ("s11_atomic_publish", []),
    ],
    "fx_llm_flagships": [
        ("d1_exact_dup", []),
        ("t2_quality_score", ["punct_ratio", "stopword_ratio", "quality"]),
        ("t8_contamination", ["overlap_frac"]),
        ("t18_sentence_scrub", ["kept_frac"]),
        ("t19_quality_classifier", ["logit"]),
        # round-7 session 3: the Bloom gate beside its exact twin t8 —
        # all-integer/boolean compare surface, 0.06 s oracle — and
        # pipe1's direct slot freed for st14 (streaming ANN ingest):
        # pipe1's phase-replay oracle is 0.06 s and belongs with the
        # flagship prep family
        ("d12_bloom_decontam", []),
        ("pipe1_llm_prep", []),
    ],
    # round-11 (cont.): fx_dedup_pairs split for probe headroom (the
    # window-policy split mechanism): the n-gram/simhash PAIR family
    # stays here; the cluster/state members move to fx_dedup_state,
    # whose window slot comes from d6's direct row (d6 rides it —
    # d13's canonical pick is literally d6's closure + argmax, so the
    # new probe is the coherent cluster-state family)
    "fx_dedup_pairs": [
        ("d3_ngram_jaccard", ["jaccard"]),
        ("d10_ngram_containment", ["containment"]),
        ("d4b_simhash_hamming", []),
        ("d7_repeated_passages", []),
    ],
    "fx_dedup_state": [
        # policy-based canonical pick (d6's closure + argmax)
        ("d13_canonical_pick", []),
        # codebook drift monitor — all-int/bool surface (~0.1 s)
        ("e8_codebook_drift", []),
        # e8's streaming twin — served result == e8's oracle verbatim
        ("st20_stream_codebook_drift", []),
        # the displaced direct row: star-contraction dup clusters
        # (0.20 s oracle — below the direct-row cost floor)
        ("d6_dup_clusters", []),
        # round-11 (cont.): d21's at-ingest streaming twin — per-batch
        # excision against the frozen eval universe; decontam-state
        # family
        ("st25_stream_excision", []),
        # round-11 (cont.): corpus-stats trio's third member — all-int
        # domain rollup (~0.2 s oracle); cost-driven ride
        ("t28_vocab_burstiness", []),
    ],
    # round-7: fx_dedup_quality (1.37 s, the heaviest probe oracle after
    # the r6 fix) and fx_release_flow (1.78 s) are dissolved — their
    # components take direct window rows, halving the heaviest single
    # DuckDB statements the driver runs.
    "fx_dedup_pipelines": [
        ("pipe2_fuzzy_dedup", []),
        ("d9_incremental_dedup", []),
        # round-8: the incremental-maintenance family's streaming member
        # — per-micro-batch HLL state appends (a27's ingest twin);
        # all-integer/boolean compare surface, trivial oracle
        ("st16_stream_hll_distinct", []),
        # round-8: streaming packing offsets (sp21's ingest twin) —
        # all-integer surface, oracle reused verbatim from sp21
        ("st17_stream_pack_offsets", []),
        # round-8: incremental release flow — all-integer manifest,
        # delta-only gates (oracle ~0.15 s)
        ("pipe6_incremental_release", []),
        # round-9: release lineage — pipe6's audit sibling (chain of q8
        # diffs; all-integer rollup, oracle ~0.05 s)
        ("q9_release_lineage", []),
        # round-9: streaming category-stats MV (a29's ingest twin;
        # all-int + boolean surface, trivial oracle)
        ("st18_stream_category_stats", []),
    ],
    "fx_splits_a": [
        ("sp1_hash_split", []),
        ("sp2_stratified_sample", []),
        ("sp3_temporal_split", []),
        ("sp4_domain_cap", []),
        ("sp10_length_buckets", []),
        # d11 feeds sampling (its weights are the temperature-mix input),
        # and this probe has the headroom (0.04 s) its closure oracle
        # (~0.16 s) needs
        ("d11_soft_dedup_weights", ["weight"]),
        # round-8: concat-and-chunk span map — all-integer surface,
        # window-decomposition parity (oracle ~0.02 s)
        ("sp21_token_stream_chunks", []),
    ],
    "fx_splits_b": [
        ("sp5_pack_shards", []),
        ("sp6_sequence_pack", []),
        ("sp7_source_mix", []),
        ("sp13_temperature_mix", []),
        ("e2_embedding_dim_stats", ["v_min", "v_max", "v_mean"]),
        ("e3_truncation_quality", ["cos_retained"]),
        ("e4_product_quantization", ["recon_cos"]),
    ],
    "fx_eval_suites": [
        ("pipe4_eval_suite", []),
        ("sp9_quota_sample", []),
        # round-8: balanced shard manifest — all-integer, 0.02 s oracle
        ("sp22_balanced_shards", []),
        ("q3_prep_funnel", []),
        ("sp14_curriculum_order", []),
        ("sp19_budget_sample", []),
        # round-8: sp20's direct slot freed for fx_scalars_num — its
        # 0.16 s closure oracle rides here (probe total ~0.31 s, inside
        # the ≤0.35 s discipline; same d6-closure family as d11 in
        # fx_splits_a)
        ("sp20_leakage_safe_split", []),
    ],
    # round-8 rebalance (VERDICT r7 #1): fx_text_quality carried 8
    # components — split by family into signal-scoring vs structure
    # probes of 4; the extra slot comes from fusing the st6 direct row
    # (0.01 s oracle) into fx_streaming_lake.
    "fx_text_quality_a": [
        ("t1_lang_id", ["score_en", "score_es", "score_fr", "score_de", "score_zh"]),
        ("t4_fingerprint", []),
        ("t10_boilerplate_flags", ["boiler_frac"]),
        ("t11_rare_token_ratio", ["rare_ratio"]),
        # round-9: bigram LM surprise — all-integer/boolean surface
        # (floor-log2 bits), rides the quality-filter family probe
        ("t22_ngram_lm_bits", []),
        # round-9: BPE merge training — 3-row merge table, int/string
        # surface, 0.04 s oracle (vocab-sized after the word count)
        ("t23_bpe_merges", []),
        # round-9: the encode side — all-int64 fertility rollup (probe
        # now at the 7-cap)
        ("t24_bpe_encode_fertility", []),
    ],
    "fx_text_quality_b": [
        ("t12_type_token_ratio", ["ttr"]),
        ("t15_source_similarity", ["cosine"]),
        ("t16_chunk_passages", []),
        ("t17_vocab_stats", []),
        # round-8: moved from fx_text_stats (was 8 components — above the
        # now-binding ≤7 cap); sentence stats are a structure signal
        ("t13_sentence_stats", ["mean_sentence_words"]),
        # round-8: novelty audit — exact counts + one int/int division
        ("t21_shingle_novelty", ["novelty"]),
        # round-9 session 3: CCNet per-domain perplexity tertiles —
        # all-int/string surface riding t22's scores (probe now at cap)
        ("t25_perplexity_buckets", []),
    ],
    "fx_corpus_cards": [
        ("q2_corpus_card", ["words_p50", "words_p90", "chars_avg"]),
        ("q5_corpus_drift", ["mean_len_a", "mean_len_b", "count_ratio"]),
        ("sp8_global_shuffle", []),
        ("d4_simhash", []),
        ("q6_token_budget", []),
        ("q7_incremental_corpus_card", ["chars_avg"]),
        # round-8: release diff manifest — all-integer rollup, 0.02 s
        ("q8_dataset_diff", []),
    ],
    # round-4 session 2: three probes free the j5/j9/j12 slots (those
    # fuse into fx_key_joins) so the media family and the corpus-release
    # additions get driver rows too.
    "fx_key_joins": [
        ("j5_normalized_key_join", ["avg_rp"]),
        ("j9_computed_slug_join", []),
        ("j12_desc_coalesce", []),
        ("j16_fuzzy_name_match", []),
        ("j17_full_outer", []),
        ("j18_grid_spatial_join", ["dist2"]),
        # round-7 session 2: j13's direct slot freed for sp20 (the
        # leakage-safe split) — its oracle is the PLAIN join (salting is
        # result-invisible), ~0.02 s, so the probe stays light
        ("j13_salted_skew_join", ["total"]),
    ],
    # round-11: fx_media (m1–m7, at the 7-cap) split into the per-doc
    # feature/frame/hash surfaces vs the near-dup PAIR surfaces (VERDICT
    # r10 #4) — restores ride headroom in the media family before new
    # entries compete for slots; the window slot the second probe needs
    # comes from pipe0_enrich riding fx_projection_filters (its own
    # component family).
    "fx_media_features": [
        ("m1_multimodal_features", []),
        ("m2_frame_sample", []),
        ("m3_media_exact_dup", []),
        ("m5_perceptual_hash", []),
        # round-11: pipe9 (trim-first corpus prep) — all-int + string
        # manifest surface; cost-driven ride on a post-split probe with
        # headroom (the pipeline family's probes are at the 7-cap, and
        # its trim stage's relatives on fx_tolerant_lookups /
        # fx_media_pairs already carry the d20/d19 oracles)
        ("pipe9_trimmed_prep", []),
        # round-11 (cont.): shot-boundary detection — media-features
        # family (m2's slicing doctrine, all-int surface)
        ("m8_shot_boundaries", []),
    ],
    "fx_media_pairs": [
        ("m4_media_near_dup", ["jaccard"]),
        # round-9 session 3: the banded-Hamming image dedup m5's hashes
        # feed — all-int pair surface, ~0.1 s oracle
        ("m6_phash_near_dup", []),
        # round-10: the audio tier — energy-envelope fingerprints through
        # the same banded-Hamming kernel; all-int pair surface
        ("m7_audio_near_dup", []),
        # round-11: d19 (the d16-screen → d18-exact composition) —
        # all-int surface; cost-driven ride on the window's lightest
        # probe (its family probe fx_geo_lookups is at the 7-cap;
        # precedent: sp23 on fx_projection_filters)
        ("d19_screened_repeat_lengths", []),
        # round-11 (cont.): d21 eval-span excision — the decontam
        # family's REMOVAL member; same cost-driven slot rationale as
        # d19 (all decontam/dedup probes at the 7-cap); all-int +
        # string surface
        ("d21_eval_span_excision", []),
        # round-11 (cont.): pipe11 (excision-first prep) — d21's
        # pipeline composition, same slot rationale; all-int + string
        # manifest surface
        ("pipe11_excised_prep", []),
    ],
    # round-5 probes: close the driver-verification tail. fx_agg_shapes /
    # fx_ref_joins free five agg + three join direct slots; the freed
    # slots carry the formerly local-only families (text stats, dedup
    # variants, ANN, batch-checkable streaming drains) plus direct rows
    # for the two heavyweight dedup entries (d3b, d6).
    "fx_agg_shapes": [
        ("a7_faceted_counts", []),
        ("a8_availability_matrix", []),
        ("a12_cross_product", []),
        ("a13_conditional_sum", ["returned_value"]),
        ("a14_rollup", ["val_sum"]),
        ("a20_approx_quantile_bound", ["p50", "p90"]),
        ("a21_approx_distinct_bound", []),
    ],
    "fx_ref_joins": [
        ("j1_broadcast_left_join", ["total"]),
        ("j3_coalesce_merge", ["val"]),
        ("j6_agg_map_join", []),
        # round-7 session 2: j8's direct slot freed for pipe5 (the
        # composed release flow) — j8's oracle is a 0.03 s star join
        ("j8_star_join", ["price"]),
        # round-7 session 3: Bloom-pruned join (prune is result-
        # invisible; oracle is the plain join+agg, ~0.02 s), and j4's
        # direct slot freed for n6 (j4's oracle is a 0.02 s dim-chain
        # join; the flagship entry() still runs it directly)
        ("j19_bloom_pruned_join", []),
        # round-9 session 3: Matryoshka ANN — the cascade is two keyed
        # joins + a rerank (cost-driven ride: both ANN-family probes
        # are at the 7-cap); cosine rides the v column, ~0.5 s oracle
        ("n11_ann_matryoshka", ["cosine"]),
        ("j4_join_chain", ["revenue"]),
    ],
    "fx_text_stats": [
        ("t3_token_count", []),
        ("t5_tfidf_top_terms", ["score"]),
        ("t6_pii_scrub", []),
        ("t7_repetition_signals", ["distinct_ratio", "top_word_frac", "top_bigram_frac"]),
        ("t9_top_ngrams", []),
        ("e1_quantize_int8", ["scale"]),
        ("t14_encoding_sanity", ["non_ascii_ratio"]),
    ],
    # round-10: fx_ann split (VERDICT r9 #4) — the 7-cap probe carried
    # every ANN entry and was the window's heaviest oracle statement.
    # fx_ann keeps the CORE cascades (raw / coarse-only / incremental /
    # PQ-only); fx_ann_trained takes the trained-structure lifecycle
    # (composed IVF-PQ, its persisted and streamed twins, the label-
    # filtered miner), restoring headroom on both.
    # round-11 (cont.): fx_ann split again for probe headroom (the
    # round-10 fx_media mechanism): core search cascades stay here;
    # the PQ-variant family moves to fx_ann_variants, whose window slot
    # comes from n3's direct row (n3 rides it — same family)
    "fx_ann": [
        ("n1_ann_cosine_topk", ["cosine"]),
        ("n2_ann_ivf", ["cosine"]),
        ("n4_ann_index_incremental", ["cosine"]),
        ("n5_ann_pq_adc", ["cosine"]),
        # round-11 (cont.): JL sign-projection prefilter + exact rerank
        # — the zero-prep candidate tier; core-cascade family
        ("n16_ann_rp_topk", ["cosine"]),
    ],
    "fx_ann_variants": [
        # deflated top-k directions — embedding-family, all-int
        # (comp, i, v) surface (~0.3 s oracle)
        ("e13_deflated_directions", []),
        # residual IVF-PQ (Jégou IVFADC at identical code bytes)
        ("n14_ann_ivfpq_residual", ["cosine"]),
        # variance-balanced dimension permutation (OPQ free-form init)
        ("n15_ann_pq_dimperm", ["cosine"]),
        # the displaced direct row: banded-LSH ANN, same output shape
        ("n3_ann_lsh", ["cosine"]),
    ],
    "fx_ann_trained": [
        # round-8: the composed IVF-PQ cascade — deterministic like both
        # parents, so the oracle replays it exactly (ANN cost band)
        ("n7_ann_ivf_pq", ["cosine"]),
        # round-9: the persisted form — n7's oracle verbatim (persisted
        # == in-plan)
        ("n8_ann_ivf_pq_persisted", ["cosine"]),
        # round-9 session 3: hard-negative mining — n2's cascade with a
        # per-query label exclusion
        ("n10_hard_negatives", ["cosine"]),
        # round-10: formerly a direct window row (its slot now holds
        # this probe) — the streamed coarse-IVF ingest, n2's oracle
        ("st14_stream_ann_ingest", ["cosine"]),
        # round-10: st19's post-drain query isolated as the SERVE row
        # (VERDICT r9 #2) — n7's oracle verbatim
        ("st19b_stream_index_serve", ["cosine"]),
        # round-10: the delete/tombstone third of the lifecycle
        # (VERDICT r9 #3) — n7's oracle minus the tombstoned ids
        ("n12_ann_ivfpq_delete", ["cosine"]),
        # round-10: re-embed (delete→compact→append) — n7's oracle over
        # the corpus with the new vectors (probe now at the 7-cap)
        ("n13_ann_ivfpq_reembed", ["cosine"]),
    ],
    # Each streaming entry runs its real availableNow drain and returns a
    # batch DataFrame of the drained result, so they fuse like any other
    # component; st6 (the hardest — stream-stream interval join) keeps its
    # own direct window slot.
    # round-7: split 9 streaming drains into stateful-window vs lake-sink
    # families — a single environmental failure no longer blanks all nine.
    "fx_streaming_batch": [
        ("st1_windowed_counts", ["total_value"]),
        ("st2_sessionize", ["session_value"]),
        ("st3_stream_upsert", []),
        ("st4_stateful_totals", ["total_value"]),
        ("st5_stream_dedup", []),
        ("st12_stream_classifier_gate", ["logit"]),
        # round-7 session 3: streaming Bloom gate (d12's ingest twin) —
        # all-integer compare surface, oracle = d12's filtered to clean
        ("st13_stream_bloom_gate", []),
    ],
    "fx_streaming_lake": [
        ("st7_stream_dedup_ingest", []),
        ("st8_stream_static_enrich", ["total_value"]),
        ("st9_stream_incremental_mv", ["total_value"]),
        ("st10_stream_scd2", ["value"]),
        ("st11_stream_corpus_card", ["chars_avg"]),
        # round-7 session 3: streaming burst monitor (w21's 0.01 s
        # oracle reused verbatim)
        ("st15_stream_burst_monitor", []),
        # round-8: st6's direct slot freed for fx_text_quality_b — the
        # stream-stream interval join drains like any other streaming
        # component and its batch-truth oracle is 0.01 s
        ("st6_stream_interval_join", []),
    ],
}

# Oracle-side column lists per component: (all output columns in order,
# double columns). Must match the Spark output schema — tests assert it.
_COMPONENT_COLS: dict[str, list[str]] = {
    # round-6 fused direct rows (fx_small_sources / fx_llm_flagships)
    "s1_pruned_scan": ["sum_price", "n"],
    "s2_corrupt_salvage": ["n_regionkey", "n"],
    "s5_excel_sheets": ["sheet", "n_codes", "rate_sum"],
    "s6_sqlite_source": ["r_name", "n_localities", "wi_sum"],
    "s7_code_list_filter": ["l_returnflag", "n"],
    "s11_atomic_publish": ["n_nationkey", "n_name"],
    "d1_exact_dup": ["content_hash", "n", "min_id", "max_id"],
    "t2_quality_score": ["doc_id", "n_ws", "punct_ratio", "stopword_ratio", "quality"],
    "t8_contamination": ["doc_id", "n_shingles", "n_hit", "overlap_frac"],
    "d12_bloom_decontam": [
        "doc_id", "n_shingles", "n_hit", "n_bloom_hit", "clean", "no_false_neg",
    ],
    "st13_stream_bloom_gate": ["doc_id", "n_shingles"],
    "j19_bloom_pruned_join": ["p_type", "n", "qty"],
    "a24_grouped_regression": ["l_returnflag", "n", "slope", "intercept", "r2"],
    "j4_join_chain": ["n_name", "revenue"],
    "pipe1_llm_prep": ["doc_id", "split", "content_hash"],
    "w21_burst_detection": [
        "event_type", "day", "n", "base_sum", "base_sumsq", "burst",
    ],
    "a25_countmin_heavy_hitters": ["item", "true_n", "cms_est", "never_under"],
    "st15_stream_burst_monitor": [
        "event_type", "day", "n", "base_sum", "base_sumsq", "burst",
    ],
    "s23_scd2_history": [
        "user_id", "version", "valid_from_us", "valid_to_us", "is_current", "value",
    ],
    "a20_approx_quantile_bound": ["l_returnflag", "p50", "p90", "p50_ok", "p90_ok"],
    "st10_stream_scd2": [
        "user_id", "version", "valid_from_us", "valid_to_us", "is_current", "value",
    ],
    "a21_approx_distinct_bound": ["l_returnflag", "d_orders", "within_bound"],
    "sp14_curriculum_order": ["doc_id", "band", "curriculum_pos"],
    "t16_chunk_passages": ["doc_id", "chunk_idx", "start_word", "n_words", "chunk_md5"],
    "j18_grid_spatial_join": ["c_custkey", "s_suppkey", "dist2"],
    "s24_point_in_time": ["query_id", "user_id", "as_of", "version_asof", "value_asof"],
    "w18_sliding_reach": ["day", "reach_7d"],
    "w19_streaks": ["user_id", "streak_start", "streak_len"],
    "a22_frequent_items": ["l_returnflag", "item", "n", "support"],
    "e3_truncation_quality": ["vec_id", "k", "cos_retained"],
    "a23_histogram": ["l_returnflag", "bucket", "bin_lo", "n"],
    "q6_token_budget": ["source", "split", "n_docs", "tokens"],
    "q7_incremental_corpus_card": [
        "source", "lang", "n_docs", "words_total", "chars_avg",
        "p50_bucket", "p90_bucket", "p50_ok", "p90_ok",
    ],
    "st11_stream_corpus_card": [
        "source", "lang", "n_docs", "words_total", "chars_avg",
        "p50_bucket", "p90_bucket",
    ],
    "t17_vocab_stats": [
        "source", "n_tokens", "vocab_size", "hapax_count", "top_word", "top_count",
    ],
    "n4_ann_index_incremental": ["query_id", "neighbor_id", "cosine", "rank"],
    "sp19_budget_sample": ["doc_id", "source", "tok", "cum_tokens"],
    # round-7 fused direct rows (fx_tolerant_lookups / fx_event_windows)
    "s4_tolerant_scan": ["l_orderkey", "l_linenumber", "ghost_col"],
    "s8_nppes_cached_lookup": [
        "npi", "enumeration_type", "org_name", "status",
        "primary_taxonomy_code", "address_1", "city", "state",
        "postal_code", "last_updated",
    ],
    "w4_asof_join": ["user_id", "click_id", "click_value", "view_id", "view_value"],
    "w5_sessionize_batch": [
        "user_id", "session_seq", "n_events", "first_event", "last_event", "val_sum",
    ],
    "w6_range_join": ["user_id", "click_id", "view_id", "dt_us"],
    "w7_rolling_metrics": [
        "user_id", "event_id", "cum_sum", "cum_n", "roll_sum", "roll_avg",
    ],
    "s9_geocode_cached_lookup": ["geocode_key", "lat", "lon", "cbsa_geoid", "cbsa_name"],
    "s10_hud_zip_cbsa": ["zip", "cbsa", "cbsaname"],
    "s12_append_unique_roundtrip": ["c_mktsegment", "n"],
    "s13_upsert_idempotent": ["o_orderstatus", "n", "total"],
    "s14_latest_merge": ["event_type", "n", "sum_value"],
    "s15_partitioned_write": ["event_type", "n"],
    "p123_projection": ["o_orderkey", "rate", "ga_prof_mar"],
    "p567_predicates": ["l_linestatus", "n", "avg_price"],
    "p8_substring_whitelist": ["p_brand", "n"],
    "p10_multi_filter": ["o_orderpriority", "n"],
    "j10_anti_join": ["c_mktsegment", "n"],
    "j11_semi_join": ["p_brand", "n"],
    "a1_group_mean": ["s_nationkey", "avg_bal"],
    "a2_multi_mean": ["l_returnflag", "avg_qty", "avg_price", "avg_disc"],
    "a3_global_mean": ["avg_qty", "avg_tax"],
    "a4_summary_stats": [
        "o_orderpriority", "rate_count", "avg_rate", "min_rate",
        "max_rate", "median_rate", "n_customers",
    ],
    "a5_topk_group_stats": ["o_custkey", "rate_count", "avg_rate"],
    "a6_percentile_profile": [
        "l_returnflag", "p10", "p25", "p50", "p75", "p90",
        "n_orders", "n_suppliers",
    ],
    "a9_multi_distinct": ["total", "d_orders", "d_parts", "d_supps", "d_flags", "d_status"],
    "a10_drilldown": ["l_linestatus", "n", "avg_price"],
    "a11_dedup_distinct": ["user_id", "event_type"],
    "w1_latest_per_key": ["user_id", "event_type", "event_id", "value"],
    "w2_best_per_key": ["user_id", "event_id", "best_value"],
    "k1_topk": ["l_orderkey", "l_linenumber", "price"],
    "k2_pagination": ["o_orderkey", "o_orderpriority"],
    "k3_autocomplete": ["value", "n"],
    "k4_detail_page": ["o_orderkey", "l_linenumber", "code_desc", "rate", "l_returnflag"],
    "u1_union_tolerant": ["n", "n_priority", "total"],
    "f_slugify": ["c_custkey", "slug"],
    "f_hash_uid": ["o_orderkey", "uid"],
    "f_year_month": ["year_month", "n"],
    "f_zip5_lpad": ["s_suppkey", "zip5"],
    "f_array_normalize": ["p_partkey", "words", "n_words"],
    "x1_explode": ["word", "n"],
    "f_json_extract": ["event_type", "avg_k"],
    "f_math_formula": ["l_orderkey", "l_linenumber", "calc_rate"],
    "f_categorizer": ["procedure_set", "procedure_class", "procedure_group", "n"],
    "q1_quality_report": ["check", "n_bad", "n_total", "bad_rate"],
    "x2_json_explode": ["event_id", "k", "v"],
    "x4_map_explode": ["key", "n", "v_sum", "v_min", "v_max"],
    "s18_compaction": ["n_rows", "val_sum", "n_ids"],
    "mv1_materialized_rollup": ["l_returnflag", "l_linestatus", "bucket_tax", "n", "revenue"],
    "sp1_hash_split": ["doc_id", "bucket", "split"],
    "sp4_domain_cap": ["doc_id", "source"],
    "sp5_pack_shards": ["shard_id", "n_rows", "total_size", "id_checksum"],
    "sp6_sequence_pack": ["shard_id", "seq_id", "n_docs", "total_tokens"],
    "sp7_source_mix": ["doc_id", "source", "copy"],
    "pipe2_fuzzy_dedup": ["dropped_id", "keep_id"],
    "d9_incremental_dedup": ["doc_id", "survived", "match_id"],
    "j5_normalized_key_join": ["p_partkey", "avg_rp"],
    "j9_computed_slug_join": ["n_regionkey", "n"],
    "j12_desc_coalesce": ["o_orderkey", "display_name"],
    "m1_multimodal_features": ["doc_id", "n_bytes", "header_hex", "mime"],
    "m2_frame_sample": ["doc_id", "frame_idx", "offset", "frame_bytes", "frame_md5"],
    "m3_media_exact_dup": ["content_hash", "n", "min_id", "max_id"],
    "m4_media_near_dup": ["doc_a", "doc_b", "jaccard"],
    "m5_perceptual_hash": ["doc_id", "ahash_hi", "ahash_lo"],
    "q2_corpus_card": [
        "source", "lang", "n_docs", "words_total",
        "words_p50", "words_p90", "chars_avg",
    ],
    "sp8_global_shuffle": ["doc_id", "shuffle_pos"],
    "t10_boilerplate_flags": ["doc_id", "n_spans", "n_boiler", "boiler_frac"],
    "t11_rare_token_ratio": ["doc_id", "n_tokens", "n_rare", "rare_ratio"],
    "n3_ann_lsh": ["query_id", "neighbor_id", "cosine", "rank"],
    "pipe3_corpus_release": ["doc_id", "source", "shuffle_pos"],
    "w8_event_funnel": [
        "n_actors", "n_step_1", "n_step_2", "n_step_3", "conversion",
    ],
    "q3_prep_funnel": [
        "n_total", "n_quality", "n_dedup", "n_train", "n_val", "n_test",
    ],
    "sp9_quota_sample": ["doc_id", "lang", "sample_rank"],
    "a15_pivot_matrix": [
        "user_id", "n_view", "n_click", "n_purchase", "n_signup", "n_error",
    ],
    "x3_unpivot": ["user_id", "metric", "n"],
    "w9_gapfill_locf": ["user_id", "day", "n_events", "v_filled"],
    "w10_ohlc_downsample": [
        "user_id", "day", "n_events",
        "v_low", "v_high", "v_open", "v_close", "v_sum",
    ],
    "sp2_stratified_sample": ["event_id", "event_type"],
    "sp3_temporal_split": ["event_id", "split"],
    "t4_fingerprint": ["doc_id", "fingerprint"],
    "d4_simhash": ["doc_id", "simhash"],
    "t1_lang_id": [
        "doc_id", "lang", "lang_pred",
        "score_en", "score_es", "score_fr", "score_de", "score_zh",
    ],
    "u2_intersect_except": ["part", "user_id", "event_type"],
    "sp10_length_buckets": ["doc_id", "bucket", "batch_id", "batch_seq"],
    "q4_dedup_quality": ["n_exact", "n_lsh", "n_tp", "n_missed", "recall"],
    "pipe4_eval_suite": ["doc_id", "lang", "sample_rank"],
    "e2_embedding_dim_stats": ["dim", "n", "v_min", "v_max", "v_mean"],
    "q5_corpus_drift": [
        "source", "n_a", "n_b", "mean_len_a", "mean_len_b", "count_ratio",
    ],
    "w11_user_reach": ["event_type", "day", "new_users", "cum_users"],
    "w12_retention_cohorts": ["cohort_week", "week_offset", "n_active"],
    "w13_asof_forward": [
        "user_id", "view_id", "view_value", "click_id", "click_value",
    ],
    "w14_trailing_window": ["user_id", "event_id", "cnt_24h", "sum_24h"],
    "a16_weighted_median": ["l_returnflag", "total_weight", "weighted_median"],
    "k6_diversified_topk": ["l_suppkey", "l_orderkey", "l_linenumber", "price"],
    "t15_source_similarity": ["source_a", "source_b", "dot", "cosine"],
    "a17_deterministic_mode": ["o_orderpriority", "mode_status", "n"],
    "j16_fuzzy_name_match": ["p_brand", "p_size", "key_a", "key_b", "dist"],
    "s19_csv_roundtrip": ["l_returnflag", "n", "n_orders", "price_sum"],
    "s20_jsonl_roundtrip": ["l_returnflag", "n", "n_orders", "price_sum"],
    "u3_union_distinct": ["user_id", "event_type"],
    "s21_orc_roundtrip": ["l_returnflag", "n", "n_orders", "price_sum"],
    "a18_cube": ["rf", "ls", "g_rf", "g_ls", "n", "price_sum"],
    "j17_full_outer": ["user_id", "n_first", "n_last", "in_both"],
    "w16_interarrival": [
        "user_id", "n_gaps", "min_gap_us", "max_gap_us", "total_gap_us",
    ],
    "x5_explode_outer": ["doc_id", "word", "no_long_words"],
    "x6_posexplode": ["word", "n", "first_pos", "last_pos"],
    "w15_rank_family": [
        "l_returnflag", "l_orderkey", "l_linenumber", "qty",
        "rnk", "drnk", "pr", "cd", "quartile",
    ],
    "k5_keyset_pagination": ["l_orderkey", "l_linenumber", "price"],
    "t12_type_token_ratio": ["doc_id", "n_tokens", "n_types", "ttr"],
    # round-5 probe components
    "a7_faceted_counts": ["facet", "n"],
    "a8_availability_matrix": ["year_month", "o_orderstatus", "n", "n_cust"],
    "a12_cross_product": ["r_name", "p_brand", "combo"],
    "a13_conditional_sum": ["l_linestatus", "returned_value", "returned_n", "total_n"],
    "a14_rollup": ["event_type", "ym", "n", "val_sum", "g_type", "g_ym"],
    "j1_broadcast_left_join": ["p_brand", "n", "total"],
    "j3_coalesce_merge": ["p_partkey", "val"],
    "j6_agg_map_join": ["s_nationkey", "above_avg", "n"],
    "t3_token_count": ["doc_id", "ws_tokens", "bpe_tokens"],
    "t5_tfidf_top_terms": ["doc_id", "term", "tf_n", "doc_len", "df", "score", "rank"],
    "t6_pii_scrub": ["doc_id", "scrubbed", "n_email", "n_ssn", "n_phone"],
    "t7_repetition_signals": [
        "doc_id", "n_words", "n_distinct_words", "distinct_ratio",
        "top_word_frac", "n_bigrams", "top_bigram_frac",
    ],
    "t9_top_ngrams": ["gram", "cnt"],
    "e1_quantize_int8": ["vec_id", "scale", "qvec"],
    "d3_ngram_jaccard": ["doc_a", "doc_b", "n_common", "size_a", "size_b", "jaccard"],
    "d5_embedding_near_dup": ["doc_a", "doc_b", "cosine"],
    "d7_repeated_passages": ["passage_hash", "n_docs", "min_doc", "max_doc"],
    "d16_repeat_ladder": ["doc_id", "max_rep_len", "n_rep_spans"],
    "sp24_bpe_sequence_pack": ["shard_id", "seq_id", "n_docs", "total_tokens"],
    "sp25_dedup_aware_mixture": ["domain", "eff_tokens_bp", "target_bp", "rate_bp", "planned_tokens"],
    "d17_longest_repeat": ["rep_len", "hash", "n_docs", "min_doc", "max_doc"],
    "d8_semantic_dedup": ["keep_id", "n_members", "max_doc"],
    "d10_ngram_containment": [
        "doc_a", "doc_b", "n_common", "size_a", "size_b", "containment",
    ],
    "d4b_simhash_hamming": ["doc_a", "doc_b", "hamming"],
    "sp13_temperature_mix": ["doc_id", "source", "mix_rank", "quota"],
    "t13_sentence_stats": [
        "doc_id", "n_sentences", "n_sentence_words",
        "mean_sentence_words", "max_sentence_words",
    ],
    "a19_robust_spread": ["l_returnflag", "n", "median_v", "mad", "n_outliers"],
    "t14_encoding_sanity": [
        "doc_id", "n_chars", "n_replacement", "n_control",
        "n_non_ascii", "non_ascii_ratio",
    ],
    "n1_ann_cosine_topk": ["query_id", "neighbor_id", "cosine", "rank"],
    "n2_ann_ivf": ["query_id", "neighbor_id", "cosine", "rank"],
    "st1_windowed_counts": [
        "window_start_us", "window_end_us", "event_type", "n_events", "total_value",
    ],
    "st2_sessionize": [
        "user_id", "session_start_us", "session_end_us", "n_events", "session_value",
    ],
    "st3_stream_upsert": ["n"],
    "st4_stateful_totals": ["event_type", "n_events", "n_users", "total_value"],
    "st5_stream_dedup": ["event_type", "n"],
    "st7_stream_dedup_ingest": ["doc_id"],
    "st8_stream_static_enrich": ["segment", "n_events", "total_value"],
    "st9_stream_incremental_mv": ["event_type", "n_events", "total_value"],
    "w17_time_weighted_avg": ["user_id", "day", "n_gaps", "total_us", "twap"],
    "s22_range_layout_write": ["l_returnflag", "n", "price_sum"],
    "s25_zorder_layout_write": ["l_returnflag", "n", "price_sum"],
    # round-7 session 2 fused direct row + new components
    "j13_salted_skew_join": ["o_orderkey", "o_custkey", "total", "c_mktsegment"],
    "t18_sentence_scrub": [
        "doc_id", "n_sentences", "n_dropped", "kept_frac", "cleaned",
    ],
    "t19_quality_classifier": ["doc_id", "logit", "keep"],
    "w20_approx_sliding_reach": ["day", "reach_7d", "within_bound"],
    "d11_soft_dedup_weights": ["doc_id", "cluster_size", "weight"],
    "q8_dataset_diff": ["source", "status", "n_docs", "chars_a", "chars_b"],
    "q9_release_lineage": [
        "from_rel", "to_rel", "status", "n_docs", "w_from", "w_to",
    ],
    "a29_persisted_category_stats": [
        "l_returnflag", "total_records", "d_supp", "d_part",
        "supp_ok", "part_ok", "total_ok",
    ],
    "n9_ann_filtered": ["query_id", "neighbor_id", "cosine", "rank"],
    "e6_kmeans_codebook": ["cid", "n_members", "i", "cs"],
    "e7_pq_codebook_train": ["b", "cid", "n_members", "i", "cs"],
    "e8_codebook_drift": ["cid", "n_base", "n_cur", "drifted"],
    "st20_stream_codebook_drift": ["cid", "n_base", "n_cur", "drifted"],
    "d14_semantic_decontam": [
        "vec_id", "eval_id", "cosine", "contaminated",
    ],
    "st21_stream_decontam_gate": ["vec_id", "eval_id", "cosine"],
    "e9_linear_probe": ["iter", "i", "w", "n_mis"],
    "e10_probe_eval": ["iter", "tp", "fp", "tn", "fn", "n_mis_train"],
    "e11_probe_inference": ["vec_id", "score", "keep"],
    "d15_dsir_select": ["doc_id", "n_tokens", "score", "rank"],
    "t25_perplexity_buckets": ["doc_id", "domain", "score_e", "t1", "t2", "bucket"],
    "n10_hard_negatives": ["query_id", "neighbor_id", "cosine", "rank"],
    "q10_cluster_map": ["cid", "n_members", "top_label", "top_label_n"],
    "sp23_mixture_solver": ["domain", "tokens", "target_bp", "rate_bp", "planned_tokens"],
    "st22_stream_fertility": ["source", "n_docs", "n_words", "n_chars", "n_tokens"],
    "q11_dual_gate_decontam": [
        "doc_id", "n_shingles", "n_bloom_hit", "ngram_hit",
        "max_eval_cos", "semantic_hit", "released",
    ],
    "pipe7_training_order": ["doc_id", "domain", "copy", "order_pos"],
    "pipe8_decontam_training_order": ["doc_id", "domain", "copy", "order_pos"],
    "pipe0_enrich": [
        "state", "procedure_set", "procedure_class", "n", "rate_sum",
        "n_ga", "n_npi",
    ],
    "d19_screened_repeat_lengths": ["doc_id", "max_rep_len", "n_rep_spans"],
    "d20_trim_repeats": ["doc_id", "clean_text", "n_tokens", "n_removed"],
    "t26_zipf_fit": ["domain", "n_types", "n_tokens", "zipf_slope", "is_zipfian"],
    "t27_vocab_growth": ["j", "t_tokens", "vocab_size"],
    "n15_ann_pq_dimperm": ["query_id", "neighbor_id", "cosine", "rank"],
    "sp27_repetition_schedule": [
        "domain", "tokens", "target_bp", "alloc_tokens",
        "epochs_milli", "capped", "unalloc_tokens",
    ],
    "pipe10_capped_training_order": ["doc_id", "domain", "copy", "order_pos"],
    "st24_stream_zipf_monitor": [
        "domain", "n_types", "n_tokens", "zipf_slope", "is_zipfian",
    ],
    "n16_ann_rp_topk": ["query_id", "neighbor_id", "cosine", "rank"],
    "m8_shot_boundaries": ["doc_id", "n_frames", "n_shots", "max_delta"],
    "d21_eval_span_excision": [
        "doc_id", "clean_text", "n_tokens", "n_removed", "n_hits",
    ],
    "pipe11_excised_prep": [
        "doc_id", "split", "content_hash", "n_removed", "n_hits",
    ],
    "d6_dup_clusters": ["doc_id", "component_id"],
    "st25_stream_excision": [
        "doc_id", "clean_text", "n_tokens", "n_removed", "n_hits",
    ],
    "t28_vocab_burstiness": [
        "domain", "n_types", "n_bursty_types", "n_tokens",
        "bursty_token_milli",
    ],
    "pipe9_trimmed_prep": ["doc_id", "split", "content_hash", "n_removed"],
    "n14_ann_ivfpq_residual": ["query_id", "neighbor_id", "cosine", "rank"],
    "n11_ann_matryoshka": ["query_id", "neighbor_id", "cosine", "rank"],
    "m6_phash_near_dup": ["doc_a", "doc_b", "hamming"],
    "m7_audio_near_dup": ["doc_a", "doc_b", "hamming"],
    "st23_stream_cluster_map": ["cid", "n_members", "top_label", "top_label_n"],
    "e12_power_iteration": ["iter", "i", "v"],
    "s30_training_order_export": ["doc_id", "domain", "copy", "order_pos", "shard_id"],
    "t22_ngram_lm_bits": [
        "doc_id", "n_bigrams", "total_bits", "is_surprising",
    ],
    "t23_bpe_merges": ["step", "left", "right", "pair_n"],
    "t24_bpe_encode_fertility": [
        "doc_id", "n_words", "n_chars", "n_tokens",
    ],
    "e5_embedding_outliers": [
        "vec_id", "grp", "dot_c", "nx2", "ns2", "is_outlier",
    ],
    "st18_stream_category_stats": [
        "event_type", "total_records", "d_users", "d_props",
        "users_ok", "props_ok", "total_ok",
    ],
    "st19_stream_ivfpq_ingest": [
        "query_id", "neighbor_id", "cosine", "rank",
    ],
    "st19b_stream_index_serve": [
        "query_id", "neighbor_id", "cosine", "rank",
    ],
    "n12_ann_ivfpq_delete": [
        "query_id", "neighbor_id", "cosine", "rank",
    ],
    "n13_ann_ivfpq_reembed": [
        "query_id", "neighbor_id", "cosine", "rank",
    ],
    "e13_deflated_directions": ["comp", "i", "v"],
    "sp26_perplexity_curriculum": ["doc_id", "band", "curriculum_pos"],
    "d18_exact_repeat_lengths": ["doc_id", "max_rep_len", "n_rep_spans"],
    "st14_stream_ann_ingest": [
        "query_id", "neighbor_id", "cosine", "rank",
    ],
    "sp22_balanced_shards": ["shard_id", "n_docs", "total_tokens"],
    "t21_shingle_novelty": [
        "doc_id", "n_shingles", "n_novel", "n_heavy", "novelty",
    ],
    "pipe6_incremental_release": [
        "source", "final_status", "n_docs", "total_tokens",
    ],
    "w22_ewma_momentum": ["event_type", "day", "n", "ewma_s", "momentum"],
    "d13_canonical_pick": [
        "doc_id", "component_id", "canonical_id", "is_canonical",
    ],
    "s28_shard_export_roundtrip": ["shard_id", "n_docs", "total_tokens"],
    "sp21_token_stream_chunks": [
        "doc_id", "n_tok", "start_off", "first_chunk", "last_chunk",
        "n_chunks",
    ],
    "st17_stream_pack_offsets": [
        "doc_id", "n_tok", "start_off", "first_chunk", "last_chunk",
        "n_chunks",
    ],
    "j8_star_join": [
        "l_orderkey", "l_linenumber", "c_name", "n_name", "p_brand",
        "s_name", "price",
    ],
    "st12_stream_classifier_gate": ["doc_id", "logit"],
    "e4_product_quantization": ["vec_id", "codes", "recon_cos"],
    "n5_ann_pq_adc": ["query_id", "neighbor_id", "cosine", "rank"],
    "n7_ann_ivf_pq": ["query_id", "neighbor_id", "cosine", "rank"],
    "n8_ann_ivf_pq_persisted": ["query_id", "neighbor_id", "cosine", "rank"],
    # round-8 fused direct rows (fx_eval_suites / fx_streaming_lake)
    "sp20_leakage_safe_split": ["doc_id", "rep", "bucket", "split"],
    "st6_stream_interval_join": ["user_id", "click_id", "view_id", "dt_us"],
    # round-8 persisted-sketch twins
    "a26_persisted_cms": ["item", "true_n", "cms_est", "never_under"],
    "a27_persisted_hll": ["l_returnflag", "d_orders", "within_bound"],
    "st16_stream_hll_distinct": ["event_type", "d_users", "within_bound"],
    "a28_persisted_quantile_grid": [
        "l_returnflag", "p50", "p90", "p50_ok", "p90_ok",
    ],
}

# Components with array-typed output columns: serialized as ','-joined
# element strings on BOTH sides (Spark concat_ws over cast(array<string>),
# DuckDB array_to_string) — a raw VARCHAR cast of a list renders with
# brackets/spaces engine-specifically and would silently hash-diverge.
_ARRAY_COLS: dict[str, set[str]] = {
    "e1_quantize_int8": {"qvec"},
}

_NULL_TOKEN = "∅"


def _fused_spark_fn(components: list[tuple[str, list[str]]]):
    def fn(spark, sf_dir):
        from mrf_etl_spark.operators.dedup import carry_state

        slices = []
        stateful = []
        for comp, dbl in components:
            df = REGISTRY[comp].spark_fn(spark, sf_dir)
            stateful.append(df)
            arr = _ARRAY_COLS.get(comp, set())
            key_cols = [c for c in df.columns if c not in dbl]
            if key_cols:
                k = F.concat_ws(
                    "|",
                    *[
                        # concat_ws never returns NULL, matching the
                        # oracle's coalesce(array_to_string(..), '')
                        F.concat_ws(",", F.col(c).cast("array<string>"))
                        if c in arr
                        else F.coalesce(F.col(c).cast("string"), F.lit(_NULL_TOKEN))
                        for c in key_cols
                    ],
                )
            else:  # all-double output (e.g. a global mean row): constant key
                k = F.lit("")
            if dbl:
                for d in dbl:
                    slices.append(
                        df.select(
                            F.lit(f"{comp}.{d}").alias("part"),
                            k.alias("k"),
                            F.col(d).cast("double").alias("v"),
                        )
                    )
            else:
                slices.append(
                    df.select(
                        F.lit(comp).alias("part"),
                        k.alias("k"),
                        F.lit(None).cast("double").alias("v"),
                    )
                )
        out = slices[0]
        for s in slices[1:]:
            out = out.unionByName(s)
        # component frames may carry persisted-state handles (pipe2/d9);
        # the union dropped them — carry so release_state on the probe
        # result frees every component's cache
        return carry_state(out, *stateful)

    return fn


def _fused_oracle(components: list[tuple[str, list[str]]]) -> str:
    selects = []
    for comp, dbl in components:
        sub = REGISTRY[comp].oracle
        cols = _COMPONENT_COLS[comp]
        arr = _ARRAY_COLS.get(comp, set())
        key_cols = [c for c in cols if c not in dbl]
        if key_cols:
            k = "concat_ws('|', " + ", ".join(
                f"coalesce(array_to_string(\"{c}\", ','), '')"
                if c in arr
                else f"coalesce(CAST(\"{c}\" AS VARCHAR), '{_NULL_TOKEN}')"
                for c in key_cols
            ) + ")"
        else:  # all-double output: constant key, mirrors the Spark side
            k = "''"
        if dbl:
            for d in dbl:
                selects.append(
                    f"SELECT '{comp}.{d}' AS part, {k} AS k, "
                    f"CAST(\"{d}\" AS DOUBLE) AS v FROM ({sub})"
                )
        else:
            selects.append(
                f"SELECT '{comp}' AS part, {k} AS k, "
                f"CAST(NULL AS DOUBLE) AS v FROM ({sub})"
            )
    return "\nUNION ALL\n".join(selects)


for _name, _components in FUSE_SPECS.items():
    _covered = ", ".join(c for c, _ in _components)
    register(
        _name,
        _fused_oracle(_components),
        doc=f"driver-window probe fusing [{_covered}] — identical rows/values "
        "to the granular entries, packed as (part, k, v)",
    )(_fused_spark_fn(_components))


# The curated first-50 driver window: every SURVEY §2 family, the LLM
# flagships, the end-to-end pipeline entries, and the streaming interval
# join. Everything else keeps its granular local check after slot 50.
DRIVER_WINDOW: list[str] = [
    "fx_small_sources",
    "fx_tolerant_lookups",
    "fx_geo_lookups",
    "fx_writer_roundtrips",
    "fx_latest_partitioned",
    "fx_projection_filters",
    "fx_ref_joins",
    "fx_key_joins",
    "j7_class_split_join",
    "pipe5_release_v2",
    "fx_anti_semi",
    "fx_means",
    "fx_stats",
    "fx_agg_shapes",
    "fx_distinct_dedup",
    "fx_latest_best",
    "fx_window_analytics",
    "fx_event_windows",
    "fx_topk_page",
    "fx_serving",
    # round-8: the 12-component fx_scalars + 3-component fx_quality_json
    # re-packed as three ≤6-component probes (VERDICT r7 #1 blast-radius
    # discipline); slots freed by fusing the sp20/st6 direct rows into
    # fx_eval_suites / fx_streaming_lake
    "fx_scalars_str",
    "fx_scalars_num",
    "fx_explode",
    "fx_lake_ops",
    # round-11: pipe0_enrich's direct slot rides fx_projection_filters
    # (its own component family); the freed slot carries the second half
    # of the fx_media split
    "fx_llm_flagships",
    "d2_minhash_lsh",
    "d3b_ngram_jaccard_capped",
    # round-11 (cont.): d6's direct slot carries the cluster-state
    # probe (fx_dedup_pairs split for headroom); d6 rides it
    "fx_dedup_state",
    "fx_dedup_pairs",
    "d5_embedding_near_dup",
    "q4_dedup_quality",
    "d8_semantic_dedup",
    "fx_dedup_pipelines",
    "d5b_embedding_near_dup_ivf",
    "fx_ann",
    # round-7 session 3: n6's recall audit composes the n1+n2 cascades,
    # so its oracle (0.80 s) sits in the single-statement ANN band —
    # a direct row (slot freed by fusing j4 into fx_ref_joins)
    "n6_ann_recall",
    "fx_text_stats",
    "fx_splits_a",
    "fx_splits_b",
    "fx_eval_suites",
    "fx_media_features",
    "fx_media_pairs",
    "fx_text_quality_a",
    "fx_text_quality_b",
    "fx_corpus_cards",
    "pipe3_corpus_release",
    # round-11 (cont.): n3's direct slot carries the PQ-variant ANN
    # probe (fx_ann split for headroom); n3 rides it
    "fx_ann_variants",
    "fx_streaming_batch",
    "fx_streaming_lake",
    # round-10: st14's direct slot now carries the trained-structure ANN
    # probe (fx_ann split, VERDICT r9 #4); st14 rides it
    "fx_ann_trained",
]

# The RECORDED catalog size — bump this in the same commit that registers
# a new entry. VERDICT r8 #1: s28 landed in a snapshot commit while
# README/COVERAGE still said 251; this build-time canary makes the books
# and the live registry disagree LOUDLY instead of drifting silently.
CATALOG_COUNT = 316  # incl. the fx_ann_variants / fx_dedup_state probes


def ordered_registry() -> dict[str, ParityQuery]:
    """The registry re-keyed so DRIVER_WINDOW is the first 50 entries
    (the driver's check window), followed by every remaining granular
    entry in registration order.

    Self-checking (VERDICT r7 #8): raises at build time if the window is
    not exactly 50 resolvable names or if any catalog entry is neither in
    the window nor riding an in-window fused probe — so a new operator
    registered without a driver story fails EVERY consumer
    (``__spark_entry__``, bench, driver_sim), not just the pytest
    invariant."""
    if len(DRIVER_WINDOW) != 50 or len(set(DRIVER_WINDOW)) != 50:
        raise RuntimeError(
            f"DRIVER_WINDOW must be exactly 50 unique names, got "
            f"{len(DRIVER_WINDOW)} ({len(set(DRIVER_WINDOW))} unique)"
        )
    fused_components = {
        comp
        for fused, comps in FUSE_SPECS.items()
        if fused in DRIVER_WINDOW
        for comp, _ in comps
    }
    orphans = [
        n
        for n in REGISTRY
        if n not in DRIVER_WINDOW and n not in fused_components
    ]
    if orphans:
        raise RuntimeError(
            f"catalog entries with no driver story (not in DRIVER_WINDOW, "
            f"not riding an in-window probe): {orphans}"
        )
    if len(REGISTRY) != CATALOG_COUNT:
        raise RuntimeError(
            f"registry holds {len(REGISTRY)} entries but CATALOG_COUNT "
            f"records {CATALOG_COUNT} — bump the constant (and the "
            "README/COVERAGE counts) in the commit that adds the entry"
        )
    ordered: dict[str, ParityQuery] = {}
    for n in DRIVER_WINDOW:
        ordered[n] = REGISTRY[n]
    for n, q in REGISTRY.items():
        if n not in ordered:
            ordered[n] = q
    return ordered
