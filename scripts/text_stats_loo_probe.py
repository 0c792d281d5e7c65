"""Round-13 probe #3 on text_stats: leave-one-out column costs of the
FULL operator at sf0.1 (the isolated-column probe showed every column
near the 0.08s scan floor, yet the full op is 0.506s — so cost appears
only in combination; find which column's removal buys the most)."""
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


def build(docs, drop=()):
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    text = F.col("text")
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(text).cast("long")
    n_words = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0))).cast("long")
    n_nonalnum = F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), F.lit(0))).cast("long")
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast("long")
    stop_cnt = _count_in(toks, STOPWORDS["en"]).cast("long")
    cols = {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_nonalnum": n_nonalnum,
        "n_tokens": n_tokens,
        "n_bpe_tokens": n_bpe,
        "stop_cnt": stop_cnt,
        "stop_ratio": F.when(n_tokens > 0, F.round(stop_cnt / n_tokens, 6)),
        "alnum_ratio": F.when(n_chars > 0, F.round((n_chars - n_nonalnum) / n_chars, 6)),
    }
    sel = [F.col("doc_id").cast("long").alias("doc_id")] + [
        v.alias(k) for k, v in cols.items() if k not in drop
    ]
    return docs.select(*sel)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="text_stats_loo")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print("docs:", docs.count())

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    runs = {
        "full": (),
        "-bpe": ("n_bpe_tokens",),
        "-stop": ("stop_cnt", "stop_ratio"),
        "-words": ("n_words",),
        "-nonalnum": ("n_nonalnum", "alnum_ratio"),
        "-ratios": ("stop_ratio", "alnum_ratio"),
        "-toks(keep rest)": ("n_tokens", "stop_cnt", "stop_ratio"),
    }
    for name, drop in runs.items():
        mat(build(docs, drop))  # warm
        best = 9e9
        for _ in range(5):
            t0 = time.time()
            mat(build(docs, drop))
            best = min(best, time.time() - t0)
        print(f"{name}: min-of-5 = {best:.3f}s")


if __name__ == "__main__":
    main()
