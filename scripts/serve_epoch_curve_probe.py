"""Serve-latency vs epoch-accumulation probe (VERDICT r14 #8).

Every stored serve pays an epoch merge + tombstone anti-join that
grows with un-compacted epochs — the measured sf0.1 serve overhead.
This probe drives sustained churn into the three r14 serving families
and times the serve after every batch:

- postings  -> bm25_topk_from_index (pruned T#/DF#/stats reads)
- span      -> repeated_spans_from_index (full W#/L# read + merge)
- semdedup  -> semdedup_from_index (full member read)

Two modes per family: ``auto_compact=False`` exposes the raw curve
(epochs strictly accumulate); the default tiered ``auto_compact``
shows the policy knob bounding it (epoch-count trigger at 24, bytes
-ratio trigger at 0.5 x base — engine/index.py constants). Churn
batches reuse the bench shapes (1-2%% of docs rewritten per batch).

Usage:
    python scripts/serve_epoch_curve_probe.py [sf_dir] [n_batches]

Prints one JSON line per (family, mode, batch): serve seconds
(min-of-2), live segment/tombstone epoch counts, then a summary line
per family/mode with the first->last serve ratio.
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
from level_mapreduce_spark.sources.tables import load_table


def _timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _epochs(idx) -> tuple[int, int]:
    from level_mapreduce_spark.engine.index import _list_epochs

    return (
        len(_list_epochs(idx.spark, idx.segments_path)),
        len(_list_epochs(idx.spark, idx.tombstones_path)),
    )


def run_family(spark, sf_dir, store, family, auto_compact, n_batches, out):
    docs = load_table(spark, sf_dir, "documents")
    name = f"curve_{family}_{int(auto_compact)}"
    if family == "postings":
        from level_mapreduce_spark.operators.text import (
            bm25_topk_from_index,
            build_postings_index,
        )

        idx = build_postings_index(spark, docs, store, name=name)
        idx.auto_compact = auto_compact
        idx.stats.auto_compact = auto_compact
        serve = lambda: bm25_topk_from_index(  # noqa: E731
            idx, "spark merge window", k=10
        ).collect()

        def churn(i):
            batch = docs.where(F.col("doc_id") % 97 == (i % 97)).withColumn(
                "text", F.concat(F.lit(f"wave{i} "), F.col("text"))
            )
            idx.update(batch, assume_unique=True)

    elif family == "span":
        from level_mapreduce_spark.operators.dedup import (
            build_span_index,
            repeated_spans_from_index,
        )

        idx = build_span_index(spark, docs, store, name=name)
        idx.auto_compact = auto_compact
        serve = lambda: repeated_spans_from_index(  # noqa: E731
            idx
        ).write.format("noop").mode("overwrite").save()

        def churn(i):
            batch = docs.where(F.col("doc_id") % 97 == (i % 97)).withColumn(
                "text", F.concat(F.lit(f"wave{i} "), F.col("text"))
            )
            idx.update(batch, assume_unique=True)

    else:  # semdedup
        import numpy as np

        from level_mapreduce_spark.operators.similarity import (
            build_semdedup_index,
            semdedup_from_index,
            semdedup_update,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        idx = build_semdedup_index(spark, emb, store, name=name)
        idx.auto_compact = auto_compact
        serve = lambda: semdedup_from_index(  # noqa: E731
            idx
        ).write.format("noop").mode("overwrite").save()
        rng = np.random.default_rng(11)
        dim = len(emb.select("embedding").head()[0])
        base_id = int(
            emb.agg(F.max(F.col("vec_id").cast("long"))).first()[0]
        )

        def churn(i):
            n = max(10, emb.count() // 100)
            vecs = rng.normal(size=(n, dim))
            batch = spark.createDataFrame(
                [
                    (int(base_id + 1 + i * n + j), [float(v) for v in vecs[j]])
                    for j in range(n)
                ],
                "vec_id long, embedding array<double>",
            )
            semdedup_update(idx, batch)

    first = last = None
    for i in range(n_batches + 1):
        if i:
            churn(i)
        s = _timed(serve)
        seg_e, tomb_e = _epochs(idx)
        rec = {
            "family": family,
            "auto_compact": auto_compact,
            "batch": i,
            "serve_sec": s,
            "seg_epochs": seg_e,
            "tomb_epochs": tomb_e,
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
        if i == 0:
            first = s
        last = s
    print(
        json.dumps(
            {
                "summary": family,
                "auto_compact": auto_compact,
                "serve_first": first,
                "serve_last": last,
                "growth": round(last / first, 2) if first else None,
            }
        ),
        flush=True,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    # optional 3rd arg: comma-separated family filter
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    spark = get_spark(app_name="serve-curve-probe")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="lmr_curve_")
    out: list[dict] = []
    try:
        for family in ("postings", "span", "semdedup"):
            if only and family not in only:
                continue
            for auto_compact in (False, True):
                run_family(
                    spark, sf_dir, store, family, auto_compact, n_batches, out
                )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
