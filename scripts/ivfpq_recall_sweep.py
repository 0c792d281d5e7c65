"""IVFPQ quality sweep: recall@10 vs nprobe x residual encoding.

The stored-ANN entry is gated rows-only (k-means bucketing is not
SQL-expressible), so its quality story is MEASURED here rather than
asserted: for nprobe in {1, 2, 4, 8} and residual on/off, mean
recall@10 against exact L2 over ``n_probes`` corpus-vector queries,
plus self-recovery rate. Results are recorded in BASELINE.md per
round; the pytest floor (tests/test_pq.py) asserts the monotone shape
and minimum recall so regressions fail loudly.

Usage: python scripts/ivfpq_recall_sweep.py [sf_dir] [n_probes]

HISTORICAL (r7): answered "recall@10 vs nprobe x residual flag" for
the stored IVFPQ defaults (residual=True, nprobe curve in BASELINE.md
r7 appendix). Re-run only if PQ training or cell assignment changes.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.indexed import (
    build_ivfpq_index,
    ivfpq_topk_from_index,
)
from level_mapreduce_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="ivfpq-recall-sweep")
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    print(f"{len(ids)} vectors ({sf_dir}); {n_probes} probe queries")

    exact = {}
    for i in range(n_probes):
        d = ((x - x[i]) ** 2).sum(axis=1)
        exact[i] = set(ids[np.argsort(d)[:10]])

    print(f"{'residual':>8} {'nprobe':>6} {'recall@10':>9} "
          f"{'self':>5} {'s/query':>8}")
    for residual in (False, True):
        store = tempfile.mkdtemp(prefix="ivfpq_sweep_")
        idx, cents, books = build_ivfpq_index(
            spark, emb, store, n_centroids=8, residual=residual
        )
        for nprobe in (1, 2, 4, 8):
            recalls, selfs, t0 = [], 0, time.time()
            for i in range(n_probes):
                got = {
                    r["vec_id"]
                    for r in ivfpq_topk_from_index(
                        idx, cents, books, list(x[i]), k=10, nprobe=nprobe
                    ).collect()
                }
                recalls.append(len(exact[i] & got) / 10)
                selfs += int(ids[i] in got)
            dt = (time.time() - t0) / n_probes
            print(
                f"{str(residual):>8} {nprobe:>6} "
                f"{sum(recalls) / len(recalls):>9.3f} "
                f"{selfs}/{n_probes:<3} {dt:>8.2f}"
            )


if __name__ == "__main__":
    main()
