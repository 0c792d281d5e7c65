"""Focused per-key bench probe for the optimization loop.

Runs bench._run against $SPARK_GRAFT_SF_DIR (default sf0.1) with only
the named keys timed, min-of-N (default 3), and prints one JSON line
with the per-key seconds plus before/after interference snapshots so
a shot taken inside a co-tenant wave is self-evident. Reuses the
bench body (scale_probe.run_bench_pass pattern) so the probe can
never drift from what the driver measures.

Usage::

    python scripts/key_probe.py key1,key2[,key3...] [N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as bench_mod
from level_mapreduce_spark import get_spark


def main() -> None:
    keys = set(sys.argv[1].split(","))
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lmr-key-probe")

    times: dict[str, float] = {}
    errors: dict[str, str] = {}

    def timed(name, fn, repeat: int = 2):
        if name not in keys:
            return
        spark.sparkContext.setJobDescription(f"key_probe:{name}")
        best = None
        try:
            for _ in range(max(repeat, n)):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            if best is None:
                return
        finally:
            spark.sparkContext.setJobDescription(None)
        times[name] = round(best, 3)

    before = bench_mod._interference_snapshot(spark)
    store = tempfile.mkdtemp(prefix="lmr_keyprobe_")
    try:
        bench_mod._run(spark, sf_dir, store, timed)
    except Exception as e:  # noqa: BLE001 — setup outside timed()
        errors["__setup__"] = f"{type(e).__name__}: {e}"[:300]
    finally:
        shutil.rmtree(store, ignore_errors=True)
    after = bench_mod._interference_snapshot(spark)
    out = {
        "queries": times,
        "n": n,
        "sf_dir": sf_dir,
        "interference": {"before": before, "after": after},
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
