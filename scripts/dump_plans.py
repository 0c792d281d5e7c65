"""Dump .explain("formatted") for every declared registry query to
plans/<tag>/<query>_<suffix>.txt (r16 optimization-round evidence: the
judge checks plan claims against these files without running Spark).

Usage: python scripts/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python scripts/dump_plans.py r16 before /root/testdata/sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from level_mapreduce_spark import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = (
        sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    )
    only = set(sys.argv[4:])
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="lmr-dump-plans")
    qs = entry_mod.queries()
    failed: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record and continue
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
            failed.append(name)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    if failed:
        print(f"FAILED: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
