"""Operator surface (SURVEY.md §2)."""

from paqarin_spark.operators.keys import add_surrogate_key, entity_dim
from paqarin_spark.operators.resample import (
    calendar_fill,
    global_calendar,
    normalise_sequences,
    parse_timestamps,
    regular_index_filter,
    time_bucket_sum,
)
from paqarin_spark.operators.scaling import MinMaxScaler, MinMaxState
from paqarin_spark.operators.dedup import (
    contamination_check,
    containment_pairs,
    duplicate_clusters,
    duplicate_spans,
    exact_duplicates,
    keep_first,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from paqarin_spark.operators.windows import (
    attach_date_index,
    forecast_horizon,
    positional_split,
    sliding_windows,
    tail_trim,
    window_starts,
    xy_split,
)
from paqarin_spark.operators.corpus import (
    bm25_topk,
    chunk_tokens,
    mixture_sample,
    pack_sequences,
    tfidf_top_terms,
)
from paqarin_spark.operators.cdc import apply_cdc, scd2_intervals
from paqarin_spark.operators.graph import pagerank
from paqarin_spark.operators.joins import asof_join, range_point_join, salted_join
from paqarin_spark.operators.sessions import session_stats, sessionize
from paqarin_spark.operators.sketch import (
    count_min_counters,
    count_min_estimates,
    hll_estimate,
    hll_estimate_from_registers,
    hll_registers,
    weighted_sample,
)
from paqarin_spark.operators.similarity import (
    cosine_dedup_pairs,
    cosine_dedup_pairs_bucketed,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    random_projection_distortion,
    scalar_quantize_error,
)

__all__ = [
    "add_surrogate_key",
    "entity_dim",
    "calendar_fill",
    "global_calendar",
    "normalise_sequences",
    "parse_timestamps",
    "regular_index_filter",
    "time_bucket_sum",
    "MinMaxScaler",
    "MinMaxState",
    "contamination_check",
    "containment_pairs",
    "duplicate_clusters",
    "duplicate_spans",
    "exact_duplicates",
    "keep_first",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_pairs",
    "attach_date_index",
    "forecast_horizon",
    "positional_split",
    "sliding_windows",
    "tail_trim",
    "window_starts",
    "xy_split",
    "cosine_dedup_pairs",
    "cosine_dedup_pairs_bucketed",
    "asof_join",
    "range_point_join",
    "salted_join",
    "session_stats",
    "sessionize",
    "cosine_topk",
    "ivf_topk",
    "lsh_topk",
    "scalar_quantize_error",
    "random_projection_distortion",
    "pagerank",
    "count_min_counters",
    "count_min_estimates",
    "hll_estimate",
    "hll_estimate_from_registers",
    "hll_registers",
    "weighted_sample",
    "apply_cdc",
    "scd2_intervals",
    "bm25_topk",
    "chunk_tokens",
    "mixture_sample",
    "pack_sequences",
    "tfidf_top_terms",
]
