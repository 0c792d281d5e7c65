"""LLM-data-pipeline operators — driver-mandated extensions with no
reference counterpart (SURVEY.md §7.2 step 6). Each operator is either
a composition of built-in DataFrame ops (JVM-side, whole-stage codegen)
or a MapIndex map-fn, so the reference's stored-map abstraction stays
the spine and every operator inherits its partitioned/sorted storage.
"""

from level_mapreduce_spark.operators.dedup import (
    chunk_dedup,
    contamination_check,
    exact_dedup,
    jaccard_pairs_exact,
    minhash_from_hashes,
    minhash_lsh_pairs,
    neardup_clusters,
    simhash,
    simhash_pairs,
)
from level_mapreduce_spark.operators.joins import (
    asof_join,
    range_join_buckets,
    salted_join,
    topk_per_key,
)
from level_mapreduce_spark.operators.sketches import (
    build_sketch_index,
    distinct_users_between,
    rollup_sketches,
    sketch_index_estimate,
    update_sketch_index,
    user_sketches,
)
from level_mapreduce_spark.operators.similarity import (
    brute_topk,
    cosine_neardup_pairs,
    cosine_neardup_pairs_blocked,
    cosine_neardup_pairs_lsh,
    cosine_sim,
    knn_join,
    lsh_topk,
)
from level_mapreduce_spark.operators.text import (
    bpe_token_count,
    c4_line_filter,
    doc_fingerprints,
    inverted_index_mapper,
    lang_id,
    pack_documents,
    quality_filter,
    scrub_pii,
    shingles_from_tokens,
    split_dataset,
    term_frequencies,
    text_repetition,
    text_stats,
    tfidf,
    tokens_expr,
    word_shingles,
)

__all__ = [
    "asof_join",
    "range_join_buckets",
    "salted_join",
    "topk_per_key",
    "chunk_dedup",
    "contamination_check",
    "exact_dedup",
    "jaccard_pairs_exact",
    "minhash_from_hashes",
    "minhash_lsh_pairs",
    "neardup_clusters",
    "simhash",
    "simhash_pairs",
    "build_sketch_index",
    "distinct_users_between",
    "rollup_sketches",
    "sketch_index_estimate",
    "update_sketch_index",
    "user_sketches",
    "brute_topk",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_blocked",
    "cosine_neardup_pairs_lsh",
    "cosine_sim",
    "knn_join",
    "lsh_topk",
    "bpe_token_count",
    "c4_line_filter",
    "doc_fingerprints",
    "inverted_index_mapper",
    "lang_id",
    "pack_documents",
    "quality_filter",
    "scrub_pii",
    "shingles_from_tokens",
    "split_dataset",
    "term_frequencies",
    "text_repetition",
    "text_stats",
    "tfidf",
    "tokens_expr",
    "word_shingles",
]
