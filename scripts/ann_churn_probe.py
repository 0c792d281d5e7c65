"""ANN-maintenance churn probe: is IVFPQ upkeep O(changed vectors)?

Builds the stored IVFPQ index once, then applies successive 1%-churn
batches (re-embedded vectors) through ``update()``, timing each fold
and a probe query after every batch. Flat per-batch times across the
run are the measured evidence that compressed-ANN maintenance never
rescans the corpus — the same claim the main-index churn curve makes
for the stored-map write path (BASELINE.md).

Usage: python scripts/ann_churn_probe.py [sf_dir] [n_batches]

HISTORICAL (r6): answered "is stored-IVFPQ incremental maintenance
flat in corpus size?" — findings recorded in BASELINE.md r6 appendix.
Still runnable; re-run only if the IVFPQ update path changes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.indexed import (
    build_ivfpq_index,
    ivfpq_topk_from_index,
)
from level_mapreduce_spark.operators.similarity import probe_vector
from level_mapreduce_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(app_name="ann-churn-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    store = tempfile.mkdtemp(prefix="ann_churn_")

    t0 = time.time()
    idx, cents, books = build_ivfpq_index(spark, emb, store)
    print(f"build: {n} vectors in {time.time() - t0:.2f}s")

    probe = probe_vector(emb, 1)
    for b in range(n_batches):
        churn = emb.where(F.col("vec_id") % 100 == b).withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x * 1.01),
        )
        t0 = time.time()
        idx.update(churn, assume_unique=True)
        dt_u = time.time() - t0
        t0 = time.time()
        got = ivfpq_topk_from_index(idx, cents, books, probe, k=10).collect()
        dt_q = time.time() - t0
        print(
            f"batch {b}: update {dt_u:.2f}s, probe {dt_q:.2f}s, "
            f"epochs {len(idx.stats()['epochs'])}, top1 {got[0]['vec_id']}"
        )


if __name__ == "__main__":
    main()
