"""Round-13 probe #4 on text_stats: the leave-one-out probe showed the
RATIO columns carry ~0.25s of the 0.55s total — they inline a second
full copy of the stop_cnt/tokenize and n_nonalnum-regex expressions
(user-level duplication; HOF exprs are codegen-incompatible so no
subexpression elimination saves us). Candidate fix: two-stage
projection — counts once, ratios referencing the count COLUMNS.
CollapseProject's non-cheap-expression guard (Spark 3.3+) should keep
the barrier because each count is referenced twice downstream. Verify
with timings + the optimized plan."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.text import text_stats as current_text_stats
from level_mapreduce_spark.operators.text import (
    BPE_PRETOKEN_RE,
    tokens_expr,
    _count_in,
    STOPWORDS,
)


def two_stage(docs):
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    text = F.col("text")
    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length(text).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(text, F.lit("[A-Za-z0-9]+"), F.lit(0)))
        .cast("long").alias("n_words"),
        F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9 ]"), F.lit(0)))
        .cast("long").alias("n_nonalnum"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_RE), F.lit(0)))
        .cast("long").alias("n_bpe_tokens"),
        _count_in(toks, STOPWORDS["en"]).cast("long").alias("stop_cnt"),
    )
    n_tokens, n_chars = F.col("n_tokens"), F.col("n_chars")
    stop_cnt, n_nonalnum = F.col("stop_cnt"), F.col("n_nonalnum")
    return counted.select(
        "*",
        F.when(n_tokens > 0, F.round(stop_cnt / n_tokens, 6)).alias("stop_ratio"),
        F.when(n_chars > 0, F.round((n_chars - n_nonalnum) / n_chars, 6)).alias(
            "alnum_ratio"
        ),
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="text_stats_two")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.count()

    a = current_text_stats(docs).orderBy("doc_id").collect()
    b = two_stage(docs).orderBy("doc_id").collect()
    assert a == b, "two-stage diverges"
    print("values identical on full sf0.1")

    # how many regexp_extract_all / ArrayFilter nodes does the
    # optimized plan carry? (dup detector)
    plan = two_stage(docs)._jdf.queryExecution().optimizedPlan().toString()
    print("regex nodes:", plan.count("regexp_extract_all"),
          "filter-lambdas:", plan.count("lambdafunction"))
    planc = current_text_stats(docs)._jdf.queryExecution().optimizedPlan().toString()
    print("current regex nodes:", planc.count("regexp_extract_all"),
          "filter-lambdas:", planc.count("lambdafunction"))

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    for name, fn in (("current", current_text_stats), ("two_stage", two_stage)):
        mat(fn(docs))
        best = 9e9
        for _ in range(5):
            t0 = time.time()
            mat(fn(docs))
            best = min(best, time.time() - t0)
        print(f"{name}: min-of-5 = {best:.3f}s")


if __name__ == "__main__":
    main()
