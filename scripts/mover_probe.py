"""Per-key quiet-box probe for the r7 bench movers.

Round-7 verdict: `band_index_build`, `band_index_update_1pct`, and
`neardup_blocked` drifted 3.9-4.6x vs the r3 driver bench while 17 of
20 matched keys sat at ~1.06x — the diagnosis was box contention on
the compute-bound minhash stages, but BASELINE.md recorded only
quiet-box TOTALS so the claim was unadjudicable per key.  This probe
records min-of-N per-key quiet numbers for exactly those stages, run
the same way the bench runs them (same data, same store lifecycle).

Usage::

    python scripts/mover_probe.py [sf_dir] [repeats]

Defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 3 repeats.
Prints one JSON line: {"keys": {name: {"runs": [...], "min": s}}, ...}.

HISTORICAL (r7): quiet-box min-of-3 arbitration of the r7 bench
movers (band/ivfpq build regressions — verdict: first-run codegen,
fixed by min-of-2 in bench.py). Methodology superseded by bench.py's
warmup + sub-second min-of-3; do not re-run for new arbitrations.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.indexed import build_band_index
from level_mapreduce_spark.operators.similarity import (
    cosine_neardup_pairs_blocked,
)
from level_mapreduce_spark.sources.tables import load_table


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="lmr-mover-probe")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    docs.count()  # warm session + listing, like the bench

    out: dict[str, dict] = {}

    def record(name: str, runs: list[float]) -> None:
        out[name] = {"runs": [round(r, 3) for r in runs], "min": round(min(runs), 3)}

    # band build + update: each repeat gets a fresh store (the bench
    # builds once into a fresh temp store; repeat-with-overwrite would
    # measure a different code path)
    build_runs, update_runs = [], []
    for i in range(repeats):
        store = tempfile.mkdtemp(prefix="lmr_probe_")
        t0 = time.time()
        idx = build_band_index(spark, docs, store, name=f"probe_bands_{i}")
        build_runs.append(time.time() - t0)
        churn_docs = docs.where(F.col("doc_id") % 100 == 0).withColumn(
            "text", F.concat(F.lit("changed "), F.col("text"))
        )
        t0 = time.time()
        idx.update(churn_docs, assume_unique=True)
        update_runs.append(time.time() - t0)
        shutil.rmtree(store, ignore_errors=True)
    record("band_index_build", build_runs)
    record("band_index_update_1pct", update_runs)

    nb_runs = []
    for _ in range(repeats):
        t0 = time.time()
        materialize(cosine_neardup_pairs_blocked(emb, threshold=0.42))
        nb_runs.append(time.time() - t0)
    record("neardup_blocked", nb_runs)

    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "keys": out}))


if __name__ == "__main__":
    main()
