"""Data-pipeline operator stages for large-scale training-data work:
text analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding), similarity search, multimodal plumbing."""

from .text import (  # noqa: F401
    TextFeaturesStage, doc_fingerprints, text_features, token_counts,
    winnowing_fingerprints,
)
from .dedup import (  # noqa: F401
    connected_components, fuzzy_decontam, dedup_tumbling, distributed_components,
    exact_dedup, exact_dup_groups, jaccard_dup_pairs, minhash_dup_pairs,
    minhash_signatures, ngram_jaccard, simhash64, simhash_dup_pairs,
)
from .ann import (  # noqa: F401
    embedding_dup_pairs, kmeans_assign, kmeans_fit, knn_brute_force,
    knn_ivf, knn_ivf_pq,
)
from .multimodal import (  # noqa: F401
    AudioFeaturesStage, DecodeImageStage, FrameSampleStage,
    ResizeImageStage, decode_bmp, decode_images, decode_wav, encode_bmp,
    encode_wav, make_media_table, png_header_dims,
)
from .joins import (  # noqa: F401
    anti_join, asof_join, asof_join_partitioned, broadcast_join,
    bucketed_join, group_count_distinct, group_iqr_outliers,
    group_quantiles, group_quantiles_cont,
    hopping_window_count, range_join, semi_join, window_cumsum,
    window_fill_forward, window_rank, window_rolling, window_seq,
    window_shift,
)
from .skew import (  # noqa: F401
    max_concurrent_intervals, salted_groupby_count, session_intervals,
    sessionize,
)
from .sampling import (  # noqa: F401
    hash_sample, sample_threshold, split_train_holdout, stratified_sample,
    weighted_sample,
)
from .packing import chunk_documents, pack_sequences  # noqa: F401
from .text import (  # noqa: F401
    decontaminate_ngrams, gopher_rules, line_stats, ngram_top_k, pii_scrub,
    quality_buckets, regex_extract, tfidf_top_terms,
)
from .jsoncol import json_extract  # noqa: F401
from .substring import remove_dup_spans  # noqa: F401
from .setops import (  # noqa: F401
    except_distinct, intersect_distinct, unnest_list, unpivot,
)
from .statistics import group_entropy  # noqa: F401
from .topk import global_topk  # noqa: F401
from .agg import (  # noqa: F401
    bucketed_group_agg, cube_agg, group_approx_distinct, group_argmax,
    group_collect, group_mode, group_quantiles_sketch, grouping_sets_agg,
    histogram, pivot_counts, rollup_agg,
)
from .editdist import fuzzy_dup_pairs, levenshtein_bytes  # noqa: F401
from .upsert import apply_changeset, incremental_group_agg  # noqa: F401
from .graph import graph_connected_components, pagerank  # noqa: F401
from .joins import collapse_runs, longest_streak  # noqa: F401
from .rank import sorted_prefix_sum  # noqa: F401
from .text import type_token_ratio, vocab_growth  # noqa: F401
from .statistics import (  # noqa: F401
    autocorr_lag1, conversion_lag, cusum_changepoint, first_digit_counts,
    gini_coefficient, group_weighted_median, mann_kendall_s, spearman_rho,
    theil_sen_slope,
)
