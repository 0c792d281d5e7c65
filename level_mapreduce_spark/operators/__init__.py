"""LLM-data-pipeline operators — driver-mandated extensions with no
reference counterpart (SURVEY.md §7.2 step 6). Each operator is either
a composition of built-in DataFrame ops (JVM-side, whole-stage codegen)
or a MapIndex map-fn, so the reference's stored-map abstraction stays
the spine and every operator inherits its partitioned/sorted storage.
"""

from level_mapreduce_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs_exact,
    minhash_from_hashes,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from level_mapreduce_spark.operators.joins import asof_join
from level_mapreduce_spark.operators.similarity import (
    brute_topk,
    cosine_neardup_pairs,
    cosine_neardup_pairs_lsh,
    cosine_sim,
    lsh_topk,
)
from level_mapreduce_spark.operators.text import (
    doc_fingerprints,
    inverted_index_mapper,
    lang_id,
    shingles_from_tokens,
    term_frequencies,
    text_stats,
    tfidf,
    tokens_expr,
    word_shingles,
)

__all__ = [
    "asof_join",
    "exact_dedup",
    "jaccard_pairs_exact",
    "minhash_from_hashes",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "brute_topk",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_lsh",
    "cosine_sim",
    "lsh_topk",
    "doc_fingerprints",
    "inverted_index_mapper",
    "lang_id",
    "shingles_from_tokens",
    "term_frequencies",
    "text_stats",
    "tfidf",
    "tokens_expr",
    "word_shingles",
]
