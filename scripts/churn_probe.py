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

Per batch we record: update seconds, read seconds (count_by_key
materialized through the noop sink), and the live epoch count — so
BASELINE.md's "O(changed-docs) IO shape" row cites a curve, not an
assertion.

Usage::

    python scripts/churn_probe.py [sf_dir] [n_batches]

Defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1, 24 batches.
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
             compact_every: int | None) -> dict:
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

    updates = [p["update_s"] for p in curve]
    reads = [p["read_s"] for p in curve]
    return {
        "mode": "no_compact" if not compact_every else f"compact_every_{compact_every}",
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark(app_name="lmr-churn-probe")
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    orders.count()  # warm file listing

    for compact_every in (None, 8):
        store = tempfile.mkdtemp(prefix="lmr_churn_")
        try:
            out = run_mode(spark, orders, store,
                           f"churn_{compact_every or 'no'}", n_batches,
                           compact_every)
            out["sf_dir"] = sf_dir
            print(json.dumps(out))
        finally:
            shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
