"""Round-13 probe: which counting form gets text_stats back under the
2x perf gate? (VERDICT r12 #1: the driver artifact hit 2.16x of the
0.419 s r3 anchor; the operator does four array-materializing
size(regexp_extract_all(...)) passes per document.)

Candidates, all value-identical to the current operator (leftmost-first
Java regex match semantics are shared by regexp_extract_all and
regexp_replace, so match COUNTS agree by construction):

  A current   — size(regexp_extract_all(...)) for n_words, n_nonalnum,
                n_bpe_tokens (arrays built just to be counted)
  B all-len   — pure length arithmetic: single-char classes count via
                one regexp_replace length diff; run classes via the
                two-replace diff len(replace(pat,'\\x01')) -
                len(replace(pat,'')) (= number of matches, any regex)
  C hybrid    — length arithmetic for n_words/n_nonalnum, keep
                regexp_extract_all for the 4-alternative BPE regex
                (two passes of a complex alternation may cost more
                than one pass + array)

min-of-5 per variant at sf0.1, noop materialize, fresh column exprs per
run. Also cross-checks all variants agree value-for-value on 2k docs.
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

SENT = "\x01"


def match_count_len(col, pat):
    """Number of non-overlapping matches of pat, via two regexp_replace
    length diffs — no array materialization."""
    return (
        F.length(F.regexp_replace(col, pat, SENT))
        - F.length(F.regexp_replace(col, pat, ""))
    ).cast("long")


def stats_variant(docs, variant: str):
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    text = F.col("text")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    if variant == "A":
        n_words = F.size(
            F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0))
        ).cast("long")
        n_nonalnum = F.size(
            F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), F.lit(0))
        ).cast("long")
        n_bpe = F.size(
            F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))
        ).cast("long")
    else:
        n_words = match_count_len(text, "[A-Za-z0-9]+")
        # single-char class: every match is exactly 1 char, so one
        # delete-replace length diff suffices
        n_nonalnum = (
            n_chars - F.length(F.regexp_replace(text, "[^A-Za-z0-9 ]", ""))
        ).cast("long")
        if variant == "B":
            n_bpe = match_count_len(text, BPE_PRETOKEN_RE)
        else:  # C
            n_bpe = F.size(
                F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))
            ).cast("long")
    stop_cnt = _count_in(toks, STOPWORDS["en"]).cast("long")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_nonalnum.alias("n_nonalnum"),
        n_tokens.alias("n_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        stop_cnt.alias("stop_cnt"),
        F.when(n_tokens > 0, F.round(stop_cnt / n_tokens, 6)).alias("stop_ratio"),
        F.when(n_chars > 0, F.round((n_chars - n_nonalnum) / n_chars, 6)).alias(
            "alnum_ratio"
        ),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="text_stats_ab")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()

    # value equivalence first (sf0.1 head, all columns)
    a = stats_variant(docs.limit(2000), "A").orderBy("doc_id").collect()
    for v in ("B", "C"):
        other = stats_variant(docs.limit(2000), v).orderBy("doc_id").collect()
        assert a == other, f"variant {v} diverges from A"
    print("value check: A == B == C on 2000 docs")

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    # warm codegen on each variant once, untimed
    for v in ("A", "B", "C"):
        mat(stats_variant(docs, v))
    for v in ("A", "B", "C"):
        best = None
        for _ in range(5):
            t0 = time.time()
            mat(stats_variant(docs, v))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"variant {v}: min-of-5 = {best:.3f}s")


if __name__ == "__main__":
    main()
