"""Query plan library: every operator the engine supports, declared as a
named (Spark builder, DuckDB oracle SQL) pair and collected in a registry.

Importing this package registers all queries.
"""

from finance_etl_spark.plans.registry import (  # noqa: F401
    QuerySpec,
    all_oracles,
    all_queries,
    front_queries,
    get,
    headline_queries,
    register,
)

# Import for registration side effects. Modules land incrementally;
# a missing module must never take down the whole registry.
#
# ORDER MATTERS for the round driver: its correctness gate checks the
# first ~50 registered queries. Rounds 2-6 rotated by reordering the
# module import list; since round 7 the window is an EXPLICIT
# front_queries() list after the imports (precise per-query control —
# unknown names fail at import, so the list can't go stale silently).
# Cumulative driver-verified after r6: 223/362. Round-7 window: the 3
# re-fixed r6 queries + all 5 ml + all 33 curation + 9 dq. ROUND 8:
# the dq tail (2), agg (17), vectors' unverified tail (14), finance
# tail (13), sql/sink/graph/stream leftovers — PLUS the 41 queries
# round 7 added after this window was frozen (ml feature/eval suite,
# perplexity batch+streaming, novelty/zipf, kcore, matryoshka,
# e2e prep, SPRT, RI/entropy audits, scene cut, farthest-point init,
# minhash recall eval, MAD anomaly, deterministic UUIDs, pattern
# reversal, and the round-7 continuation: bootstrap CI, randomization
# test, Yule-Walker AR(2), skew profiler, binomial-DP counts,
# temperature mixture, Markov matrix, banded DTW, ROUGE-L pairs,
# amortization, Spearman rho, degree assortativity, depth-2 tree,
# two-round GBDT, Haar energies, epoch sample, file-layout audit,
# Cramér's V, PACF).
# tools/check.py always sweeps all queries regardless of order.
import importlib

for _mod in (
    "ingest_parity",
    "jdbc_queries",
    "scalars",
    "tableformat",
    "tokenizer",
    "finance",
    "governance",
    "curation",
    "vectors",
    "relational",
    "text",
    "multimodal",
    "udf_queries",
    "tpch",
    "timeseries",
    "stats",
    "streaming_queries",
    # round-6 additions land at the end (rotate into later windows)
    "ml",
):
    try:
        importlib.import_module(f"finance_etl_spark.plans.{_mod}")
    except ModuleNotFoundError as e:  # only "not yet written" is tolerated
        if e.name != f"finance_etl_spark.plans.{_mod}":
            raise

# ROUND-7 WINDOW: front (a) the three queries re-fixed after round-6
# driver evidence (array_map_ops serialized arrays, ingest_fixed_width
# scale-shift decimals, vec_pca_project serialized components), (b) all
# 5 never-sampled ml queries, (c) the entire never-sampled curation
# family (33), (d) the head of never-sampled dq — exactly 50 slots.
front_queries(
    [
        "array_map_ops", "ingest_fixed_width", "vec_pca_project",
        "ml_logreg_gd", "ml_kmeans_lloyd", "ml_naive_bayes_train",
        "ml_naive_bayes_classify", "ml_ols_normal_equations",
        "cur_walk_forward_folds", "cur_hash_split", "cur_quality_filter",
        "cur_dedup_components", "cur_cdc_latest_per_key",
        "cur_unpivot_measures", "cur_stratified_sample", "cur_pii_redact",
        "cur_decontaminate", "cur_mixture_weights", "cur_scd2_intervals",
        "cur_snapshot_diff", "cur_sequence_pack",
        "cur_incremental_agg_merge", "cur_merge_upsert",
        "cur_winsorize_outliers", "cur_impute_group_mean",
        "cur_dedup_survivors", "cur_rfm_deciles", "cur_scd2_point_in_time",
        "cur_domain_cap", "cur_sample_exact_n", "cur_sample_tablesample",
        "cur_url_dedup", "cur_incremental_join_view",
        "cur_entity_resolution", "cur_weighted_sample",
        "cur_preference_pairs", "cur_bitemporal_asknown",
        "cur_mixture_waterfill", "cur_curriculum_order",
        "cur_span_corruption_masks", "cur_active_learning_batch",
        "dq_schema_drift", "dq_delete_propagation", "dq_rls_masked_views",
        "dq_expectations_quarantine", "dq_profile_columns",
        "dq_table_checksum", "dq_k_anonymity", "dq_freshness_sla",
        "dq_fk_inference",
    ]
)
