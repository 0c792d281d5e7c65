"""Round-13 probe (follow-up to text_stats_ab_probe): WHICH columns
dominate text_stats cost at sf0.1? The length-arithmetic rewrite from
VERDICT r12 #1 measured SLOWER than the current array form (A 0.506s <
C 0.526s < B 0.565s min-of-5), so the fix has to target the actual hot
column. Times each column family in isolation, plus regex-engine
variants of the BPE pre-token alternation (possessive quantifiers kill
the backtracking budget Java allocates per alternative).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.text import (
    BPE_PRETOKEN_RE,
    tokens_expr,
    _count_in,
    STOPWORDS,
)

# same match set, possessive quantifiers (no backtracking state): each
# alternative has no trailing context, so giving back characters can
# never help — possessive == greedy here, minus the stack bookkeeping
BPE_POSSESSIVE_RE = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]++| ?[0-9]++| ?[^A-Za-z0-9 ']++"


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="text_stats_cost")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    text = F.col("text")
    cases = {
        "baseline_id_len": lambda d: d.select(
            "doc_id", F.length(text).alias("n")
        ),
        "tokens_size": lambda d: d.select(
            "doc_id", F.size(tokens_expr("text")).alias("n")
        ),
        "stop_cnt": lambda d: d.withColumn("_t", tokens_expr("text")).select(
            "doc_id", _count_in(F.col("_t"), STOPWORDS["en"]).alias("n")
        ),
        "n_words_extract": lambda d: d.select(
            "doc_id",
            F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0))).alias("n"),
        ),
        "n_nonalnum_extract": lambda d: d.select(
            "doc_id",
            F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), F.lit(0))).alias("n"),
        ),
        "bpe_extract": lambda d: d.select(
            "doc_id",
            F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))).alias("n"),
        ),
        "bpe_extract_possessive": lambda d: d.select(
            "doc_id",
            F.size(F.regexp_extract_all(text, F.lit(BPE_POSSESSIVE_RE), F.lit(0))).alias("n"),
        ),
    }

    # possessive regex must count identically
    a = docs.limit(3000).select(
        F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))).alias("n")
    ).collect()
    b = docs.limit(3000).select(
        F.size(F.regexp_extract_all(text, F.lit(BPE_POSSESSIVE_RE), F.lit(0))).alias("n")
    ).collect()
    assert a == b, "possessive regex changed match counts"
    print("possessive == greedy on 3000 docs")

    for name, fn in cases.items():
        mat(fn(docs))  # warm
        best = None
        for _ in range(5):
            t0 = time.time()
            mat(fn(docs))
            best = min(best or 9e9, time.time() - t0)
        print(f"{name}: min-of-5 = {best:.3f}s")


if __name__ == "__main__":
    main()
