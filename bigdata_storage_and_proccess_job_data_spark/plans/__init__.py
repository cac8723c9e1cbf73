"""Driver-facing query plans: the registry mapping every implemented
operator (SURVEY.md §2) to a Spark callable + DuckDB oracle SQL."""

from bigdata_storage_and_proccess_job_data_spark.plans.registry import (  # noqa: F401
    QueryDef,
    all_queries,
    oracle_sql,
    queries,
    register,
    set_driver_order,
)

# Importing these modules populates the registry.
from bigdata_storage_and_proccess_job_data_spark.plans import (  # noqa: F401,E402
    analytics_queries,
    reference_queries,
    scale_queries,
    streaming_queries,
)

# Driver-facing registration order. The correctness driver writes rows for
# exactly the first 50 registry entries, so this list — not module import
# order — decides which queries get a driver CORRECTNESS row this round.
#
# Rotation policy (see README "Driver correctness window"): the window is
# curated per round so that over any two consecutive rounds every registered
# query receives a driver row. Round 3 window = the 23 queries never checked
# in r1/r2 (all of scale_queries + streaming_queries), the 9 LLM-suite
# queries that were green in r1 but fell outside the r2 window, and one
# representative per SURVEY.md §2 operator family (18). The remaining 32
# analytics variants all have green rows in CORRECTNESS_r02.json and rotate
# back in next round.
DRIVER_WINDOW_R3 = [
    # -- streaming operators (W2, W3, W4, W6, F12): zero driver rows in r1+r2
    "window_tumbling",
    "window_sliding",
    "session_windows",
    "stream_detail_enrich",
    # -- LLM-pipeline suite: never driver-checked (scale_queries)
    "simhash_near_dups",
    "knn_brute_force",
    "knn_arrow",
    "knn_lsh",
    "knn_ivf",
    "embedding_neardup_pairs",
    "embedding_norms",
    "word_frequencies",
    "neardup_clusters",
    "media_features_knn",
    "chunk_documents",
    "pii_scrub",
    "contamination_check",
    "sample_deterministic",
    "doc_length_histogram",
    "corpus_mixture",
    "token_repetition",
    "clean_corpus",
    "decontaminated_train",
    # -- LLM-suite queries green in r1 that lost their rows in r2
    "topk_per_group",
    "customers_without_orders",
    "dedup_exact_docs",
    "text_stats",
    "quality_scores",
    "lang_distribution",
    "fingerprint_docs",
    "ngram_jaccard_pairs",
    "minhash_near_dups",
    # -- one representative per SURVEY.md §2 family (keeps §2 rows fresh)
    "json_extract_props",  # S4/F13
    "global_reduce",  # S13/A8
    "company_stats_v1",  # P2/F7/A1
    "company_stats_v2",  # F6/A2
    "dedup_latest",  # P3
    "clean_numeric_cast",  # F1/F3
    "classify_text",  # F2
    "merge_fallback",  # F14
    "derive_salary_fields",  # F8/F9
    "currency_convert",  # F8
    "location_stats",  # A3
    "category_percentiles",  # A4
    "worktype_stats",  # A5
    "temporal_stats",  # A6
    "value_distribution",  # A7
    "freshness_buckets",  # F10/F11
    "union_normalize",  # X1
    "impute_mean",  # A9/X2
]

set_driver_order(DRIVER_WINDOW_R3)
