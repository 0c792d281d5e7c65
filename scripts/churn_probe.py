"""Churn-curve probe — MEASURES the O(changed-docs) update claim.

Runs ``N`` successive 1%-churn ``update()`` batches against the orders
index in two modes and prints one JSON line per mode:

- ``no_compact``: ``auto_compact=False``, epochs accumulate.  The
  per-batch *update* time should stay flat (each batch touches only the
  changed docs), while the *read* time degrades as the tombstone
  anti-join and segment count grow — the measured cost of deferring
  compaction.
- ``compact_every_8``: an explicit ``compact()`` every 8 epochs (the
  off-hot-path schedule a large deployment would run).  Update time
  shows the periodic fold spikes; read time stays flat.
- ``partial8_every_8``: minor compaction — ``compact(max_epochs=8,
  tier="newest")`` folds only the young delta epochs, never the base
  segment.  The closing ``fold_cost`` record times one more minor
  fold against a FULL compact of the same index: the ratio is the
  measured "fold cost tracks folded epochs, not index size" claim.

Per batch we record: update seconds, read seconds (count_by_key
materialized through the noop sink), and the live epoch count — so
BASELINE.md's "O(changed-docs) IO shape" row cites a curve, not an
assertion.

Usage::

    python scripts/churn_probe.py [sf_dir] [n_batches]

Defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 24 batches.

HISTORICAL (r5, partial mode r9): answered "is update() O(changed
docs) and partial-fold IO bounded by the folded epochs' bytes?" —
findings in BASELINE.md. Re-run only if epoch write/fold paths change.
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
from level_mapreduce_spark import queries as q
from level_mapreduce_spark.engine.index import MapIndex, _list_epochs


def run_mode(spark, orders, store: str, name: str, n_batches: int,
             compact_every: int | None,
             partial_epochs: int | None = None) -> dict:
    idx = MapIndex(
        spark, name, q._orders_mapper(), store,
        doc_key="o_orderkey", auto_compact=False,
    )
    t0 = time.time()
    idx.build(orders, assume_unique=True)
    build_s = round(time.time() - t0, 3)

    curve = []
    for i in range(1, n_batches + 1):
        # 1% churn, a different slice each batch so tombstones accrete
        churn = orders.where(F.col("o_orderkey") % 100 == i).withColumn(
            "o_totalprice", F.col("o_totalprice") * (1.0 + i / 100.0)
        )
        t0 = time.time()
        idx.update(churn, assume_unique=True)
        update_s = time.time() - t0

        compact_s = 0.0
        if compact_every and i % compact_every == 0:
            t0 = time.time()
            if partial_epochs:
                # minor compaction: fold only the newest K epochs —
                # the base segment is never rewritten, so the fold
                # cost must track the folded deltas, not index size
                idx.compact(max_epochs=partial_epochs, tier="newest")
            else:
                idx.compact()
            compact_s = time.time() - t0

        t0 = time.time()
        idx.count_by_key().write.format("noop").mode("overwrite").save()
        read_s = time.time() - t0

        curve.append({
            "batch": i,
            "epochs": len(_list_epochs(spark, idx.segments_path)),
            "update_s": round(update_s, 3),
            "compact_s": round(compact_s, 3),
            "read_s": round(read_s, 3),
        })

    # bounded-fold evidence: at the end of the partial mode, time one
    # more minor fold (fresh epochs) against a FULL compact of the
    # same index — the partial fold touches only the young deltas
    fold_cost = None
    if partial_epochs:
        from level_mapreduce_spark.engine.index import _path_bytes

        for j in range(partial_epochs):
            idx.update(
                orders.where(F.col("o_orderkey") % 100 == 50 + j),
                assume_unique=True,
            )
        eps = _list_epochs(spark, idx.segments_path)
        by_epoch = {
            e: _path_bytes(spark, f"{idx.segments_path}/epoch={e}")
            for e in eps
        }
        total_bytes = sum(by_epoch.values())
        fold_bytes = sum(by_epoch[e] for e in eps[-partial_epochs:])
        t0 = time.time()
        idx.compact(max_epochs=partial_epochs, tier="newest")
        partial_s = time.time() - t0
        t0 = time.time()
        idx.compact()
        full_s = time.time() - t0
        fold_cost = {
            # bytes the fold READS: the structural bound — a minor
            # fold's input is the young deltas, a full fold's is the
            # whole index (time at toy scale is job-overhead-bound;
            # the byte ratio is what scales)
            "partial_input_bytes": int(fold_bytes),
            "full_input_bytes": int(total_bytes),
            "input_ratio": round(fold_bytes / total_bytes, 4)
            if total_bytes
            else None,
            "partial_newest_k_s": round(partial_s, 3),
            "full_fold_s": round(full_s, 3),
            "ratio": round(partial_s / full_s, 3) if full_s else None,
        }

    updates = [p["update_s"] for p in curve]
    reads = [p["read_s"] for p in curve]
    mode = "no_compact" if not compact_every else (
        f"partial{partial_epochs}_every_{compact_every}" if partial_epochs
        else f"compact_every_{compact_every}"
    )
    return {
        "mode": mode,
        "fold_cost": fold_cost,
        "build_s": build_s,
        "batches": n_batches,
        "update_s_first4_mean": round(sum(updates[:4]) / 4, 3),
        "update_s_last4_mean": round(sum(updates[-4:]) / 4, 3),
        "read_s_first4_mean": round(sum(reads[:4]) / 4, 3),
        "read_s_last4_mean": round(sum(reads[-4:]) / 4, 3),
        "compact_s_total": round(sum(p["compact_s"] for p in curve), 3),
        "final_epochs": curve[-1]["epochs"],
        "curve": curve,
    }


def run_skewed_auto(spark, orders, store: str, n_batches: int) -> dict:
    """Bytes-ratio trigger evidence (r10, VERDICT #7): drive a SKEWED
    epoch sequence — mostly 1% deltas with a 25% slab every 6th batch
    — through ``auto_compact=True`` with the size floor lowered to
    probe scale. Done-criterion: the post-maintenance delta/base byte
    ratio stays bounded (read amplification in BYTES, not just epoch
    count), and full folds fire only at ratio crossings — a handful
    over the run, never one per batch (the gratuitous-refold failure
    mode the >=2-delta guard exists for)."""
    from level_mapreduce_spark.engine import index as index_mod
    from level_mapreduce_spark.engine.index import _path_bytes

    orig_floor = index_mod.COMPACT_SIZE_MIN_DELTA_BYTES
    index_mod.COMPACT_SIZE_MIN_DELTA_BYTES = 1
    try:
        idx = MapIndex(
            spark, "skew_auto", q._orders_mapper(), store,
            doc_key="o_orderkey", auto_compact=True,
        )
        t0 = time.time()
        idx.build(orders, assume_unique=True)
        build_s = round(time.time() - t0, 3)
        curve = []
        full_folds = 0
        for i in range(1, n_batches + 1):
            if i % 6 == 0:
                # the skew: a base-sized slab (25% of the corpus)
                churn = orders.where(F.col("o_orderkey") % 4 == (i // 6) % 4)
            else:
                churn = orders.where(F.col("o_orderkey") % 100 == i)
            churn = churn.withColumn(
                "o_totalprice", F.col("o_totalprice") * (1.0 + i / 100.0)
            )
            t0 = time.time()
            idx.update(churn, assume_unique=True)
            update_s = time.time() - t0
            eps = _list_epochs(spark, idx.segments_path)
            base = _path_bytes(spark, f"{idx.segments_path}/epoch={eps[0]}")
            total = _path_bytes(spark, idx.segments_path)
            folded = len(eps) == 1 and i > 1
            full_folds += int(folded)
            curve.append({
                "batch": i,
                "slab": i % 6 == 0,
                "epochs": len(eps),
                "delta_over_base": round((total - base) / base, 3)
                if base else None,
                "full_fold": folded,
                "update_s": round(update_s, 3),
            })
        ratios = [p["delta_over_base"] for p in curve if p["delta_over_base"] is not None]
        return {
            "mode": "skewed_auto_ratio",
            "build_s": build_s,
            "batches": n_batches,
            "full_folds": full_folds,
            "max_delta_over_base": max(ratios) if ratios else None,
            "final_epochs": curve[-1]["epochs"],
            "curve": curve,
        }
    finally:
        index_mod.COMPACT_SIZE_MIN_DELTA_BYTES = orig_floor


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark(app_name="lmr-churn-probe")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.count()  # warm file listing

    for compact_every, partial in ((None, None), (8, None), (8, 8)):
        store = tempfile.mkdtemp(prefix="lmr_churn_")
        try:
            out = run_mode(spark, orders, store,
                           f"churn_{compact_every or 'no'}_{partial or 'full'}",
                           n_batches, compact_every,
                           partial_epochs=partial)
            out["sf_dir"] = sf_dir
            print(json.dumps(out))
        finally:
            shutil.rmtree(store, ignore_errors=True)

    store = tempfile.mkdtemp(prefix="lmr_churn_")
    try:
        out = run_skewed_auto(spark, orders, store, n_batches)
        out["sf_dir"] = sf_dir
        print(json.dumps(out))
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
