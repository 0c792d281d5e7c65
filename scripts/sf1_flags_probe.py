"""Plan-flip explain-diff at sf0.1 vs sf1.0 (VERDICT r11 #1).

The sf1.0 bench + oracle sweep prove wall-time and correctness at 10x
the gate scale; this probe answers the remaining question — did any
load-bearing JOIN STRATEGY silently flip at 10x input? For each scale
it records:

- the tombstone anti-join strategy in ``read()`` after a 1% churn
  batch (must stay broadcast until TOMBSTONE_BROADCAST_BYTES, then
  AQE takes over — scale_probe.flag_check);
- join-operator counts (BroadcastHashJoin / SortMergeJoin /
  BroadcastNestedLoopJoin) in the executed plans of the two
  broadcast-sensitive registry entries: ``bm25_topk`` (query-stats /
  idf broadcast) and ``join_strategies`` (dim broadcast + salted
  variants).

Usage::

    python scripts/sf1_flags_probe.py [sf0.1_dir] [sf1.0_dir]

Prints one JSON line; record in BASELINE.md. A flip = a key whose
strategy set differs between scales where the design says it must not
(the dim/stats sides are size-bounded); AQE swapping a fact-fact join
is expected, not a flip.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from level_mapreduce_spark import get_spark
from level_mapreduce_spark import queries as q

from scale_probe import flag_check  # noqa: E402


def _join_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash": plan.count("BroadcastHashJoin"),
        "sort_merge": plan.count("SortMergeJoin"),
        "shuffled_hash": plan.count("ShuffledHashJoin"),
        "bnl": plan.count("BroadcastNestedLoopJoin"),
    }


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lmr_sf1.0"
    spark = get_spark(app_name="lmr-sf1-flags")
    queries = q.QUERIES
    out: dict[str, dict] = {}
    for tag, d in (("sf0.1", small), ("sf1.0", big)):
        store = tempfile.mkdtemp(prefix=f"lmr_flags_{tag}_")
        try:
            rec: dict[str, object] = {
                "tombstone": flag_check(spark, d, store, tag.replace(".", ""))
            }
            for key in ("bm25_topk", "join_strategies"):
                rec[key] = _join_counts(queries[key](spark, d))
            out[tag] = rec
        finally:
            shutil.rmtree(store, ignore_errors=True)
    flips = []
    for key in ("bm25_topk", "join_strategies"):
        if out["sf0.1"][key] != out["sf1.0"][key]:
            flips.append(key)
    if (
        out["sf0.1"]["tombstone"]["tombstone_antijoin_broadcast"]
        != out["sf1.0"]["tombstone"]["tombstone_antijoin_broadcast"]
    ):
        flips.append("tombstone_antijoin")
    out["flips"] = flips
    print(json.dumps(out))


if __name__ == "__main__":
    main()
