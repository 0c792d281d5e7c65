"""sf1.0 single-key endurance probe (VERDICT r10 ask #8).

The 10x replication probe (scale_probe.py) established scaling
EXPONENTS; this probe measures absolute RESOURCE head-room at a real
sf1.0-equivalent corpus (sf0.1 replicated 10x ~ 600k orders / 50k
docs / 20k embeddings -> matches what `dbgen -s 1` would feed the
three heaviest one-time builders). For each of
``ivfpq_index_build`` / ``band_index_build`` / ``chained_build`` it
runs the builder ONCE against the 10x corpus and records:

- wall clock,
- peak JVM heap across all memory pools (MemoryPoolMXBean peak usage,
  reset before each builder — local[32] puts driver+executor in one
  JVM, so this IS peak executor memory here),
- shuffle/aggregation spill (memory + disk bytes) summed over the
  /api/v1 stages REST surface (the probe session runs with
  SPARK_GRAFT_UI=true), delta'd per builder.

Replication models reuse scale_probe's semantics-preserving
transforms: id-shift for orders, alphabet-rotation (distinct
vocabulary) for documents so the band index sees sf-constant dup
density, sign-pattern for embeddings so within-replica geometry is
exact. Usage::

    python scripts/endurance_probe.py [sf_dir] [N]

Prints one JSON line; record the numbers in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import MapIndex, get_spark
from level_mapreduce_spark import queries as q
from level_mapreduce_spark.engine.mapper import ExprMapper
from level_mapreduce_spark.sources.tables import load_table

from scale_probe import rep_docs_distinct, rep_emb, rep_ids  # noqa: E402


def _heap_pools(spark):
    mf = spark._jvm.java.lang.management.ManagementFactory
    return [
        p
        for p in mf.getMemoryPoolMXBeans()
        if p.getType().name() == "HEAP"
    ]


def _reset_peaks(spark) -> None:
    for p in _heap_pools(spark):
        p.resetPeakUsage()


def _peak_heap_bytes(spark) -> int:
    """Sum of per-pool peak usage for HEAP pools since the last reset.

    Pool peaks are reset independently, so the sum is an upper bound on
    the true simultaneous footprint — the right direction for a
    head-room check."""
    return sum(p.getPeakUsage().getUsed() for p in _heap_pools(spark))


def _spill_totals(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over every stage
    the app has run so far, via the documented /api/v1 REST surface."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/applications") as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app_id}/stages"
    ) as r:
        stages = json.load(r)
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.environ["SPARK_GRAFT_UI"] = "true"
    # the spill sums read the stages REST surface, which only serves
    # UI-RETAINED stages (default 1000): raise the retention far past
    # anything one probe session can submit, or eviction silently
    # undercounts (even negative deltas) between the before/after reads
    spark = get_spark(
        app_name="lmr-endurance-probe",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )

    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    counts = {
        "orders": orders.count(),
        "docs": docs.count(),
        "emb": emb.count(),
    }

    work = tempfile.mkdtemp(prefix="lmr_endurance_")
    big_dir = os.path.join(work, "x10")
    os.makedirs(big_dir)
    rep_ids(orders, n, {"o_orderkey": counts["orders"] * 2}).write.parquet(
        os.path.join(big_dir, "orders.parquet")
    )
    rep_docs_distinct(docs, n, counts["docs"]).write.parquet(
        os.path.join(big_dir, "documents.parquet")
    )
    rep_emb(emb, n, counts["emb"] * 2).write.parquet(
        os.path.join(big_dir, "embeddings.parquet")
    )

    big_orders = load_table(spark, big_dir, "orders")
    big_docs = load_table(spark, big_dir, "documents")
    big_emb = load_table(spark, big_dir, "embeddings")
    store = os.path.join(work, "store")

    def chained_build():
        a = MapIndex(
            spark, "end_chain_a", q._orders_mapper(), store,
            doc_key="o_orderkey",
        )
        b_mapper = ExprMapper(
            F.transform(
                F.col("value"),
                lambda p: F.struct(
                    F.concat(F.lit("by_"), p["index_key"]).alias("index_key"),
                    p["value"].alias("value"),
                ),
            ),
            value_type=T.DoubleType(),
        )
        b = MapIndex(spark, "end_chain_b", b_mapper, store)
        a.pipe(b)
        a.build(big_orders, assume_unique=True)

    def ivfpq_build():
        from level_mapreduce_spark.operators.indexed import build_ivfpq_index

        build_ivfpq_index(
            spark, big_emb, store, name="end_ivfpq", n_centroids=8
        )

    def band_build():
        from level_mapreduce_spark.operators.indexed import build_band_index

        build_band_index(spark, big_docs, store, name="end_bands")

    out = {
        "sf_dir": sf_dir,
        "n": n,
        "base_counts": counts,
        "heap_max_bytes": int(
            spark._jvm.java.lang.Runtime.getRuntime().maxMemory()
        ),
        "builders": {},
    }
    try:
        for name, fn in (
            ("chained_build", chained_build),
            ("ivfpq_index_build", ivfpq_build),
            ("band_index_build", band_build),
        ):
            spark._jvm.java.lang.System.gc()
            _reset_peaks(spark)
            mem0, disk0 = _spill_totals(spark)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            mem1, disk1 = _spill_totals(spark)
            peak = _peak_heap_bytes(spark)
            out["builders"][name] = {
                "wall_s": round(dt, 2),
                "peak_heap_mb": round(peak / 1e6, 1),
                "spill_mem_mb": round((mem1 - mem0) / 1e6, 1),
                "spill_disk_mb": round((disk1 - disk0) / 1e6, 1),
            }
    except BaseException as e:  # noqa: BLE001 — print partial, exit 1
        out["aborted"] = f"{type(e).__name__}: {e}"[:300]
    finally:
        shutil.rmtree(work, ignore_errors=True)
        print(json.dumps(out))
    if "aborted" in out:
        sys.exit(1)


if __name__ == "__main__":
    main()
