"""Local mimic of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, compare row count + column names + exact
values (columns sorted by name, rows sorted — order-insensitive, like
the driver's value hash).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry_mod
from level_mapreduce_spark import get_spark
from level_mapreduce_spark.sources.tables import TABLES


def norm_cell(v):
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return float(v) if False else v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def split_variants(cols, rows):
    """{variant: rows} for tagged-union entries (a `variant` column),
    else None — so a red union entry names its variant instead of
    forcing a manual bisect (VERDICT r13 #5)."""
    if "variant" not in cols:
        return None
    vi = cols.index("variant")
    out: dict = {}
    for r in rows:
        out.setdefault(r[vi], []).append(r)
    return out


def variant_report(spark_cols, sr, orr):
    """Per-variant lines: row counts + first differing value on each
    side. Only called when shapes already matched column-wise."""
    sv = split_variants(spark_cols, sr)
    if sv is None:
        return
    ov = split_variants(spark_cols, orr) or {}
    for v in sorted(set(sv) | set(ov)):
        a, b = sv.get(v, []), ov.get(v, [])
        if a == b:
            print(f"    variant {v}: OK ({len(a)} rows)")
        else:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:1]
            print(
                f"    variant {v}: MISMATCH spark={len(a)} "
                f"oracle={len(b)} rows"
                + (f", e.g. {diff[0]}" if diff else "")
            )


def list_variants(sf_dir: str) -> int:
    """Print the variant -> entry map by EXECUTING each registry
    entry at a small sf and reading its distinct ``variant`` values
    (VERDICT r15 #8: the driver caps the registry at 50, so operators
    land as tagged-union variants inside existing entries — this
    makes every operator traceable to its gate without reading
    queries.py). Ground truth by construction: whatever variants the
    gate actually emits is what prints."""
    from pyspark.sql import functions as F

    spark = get_spark(app_name="list_variants")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_variants = 0
    for name, fn in qs.items():
        gate = "oracle" if name in oracles else "rows-only"
        try:
            df = fn(spark, sf_dir)
            if "variant" in df.columns:
                vs = sorted(
                    r[0]
                    for r in df.select("variant").distinct().collect()
                )
                n_variants += len(vs)
                print(f"{name} [{gate}]: {', '.join(vs)}")
            else:
                n_variants += 1
                print(f"{name} [{gate}]: (single)")
        except Exception as e:  # noqa: BLE001 — keep listing
            print(f"{name} [{gate}]: ERROR {type(e).__name__}: {e}"[:160])
    print(
        f"{len(qs)} entries, {n_variants} gated variants "
        f"({len(oracles)} oracle-checked entries)"
    )
    return 0


def main():
    args = sys.argv[1:]
    if args and args[0] == "--list-variants":
        sf = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
        return list_variants(sf)
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark(app_name="check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"ROWS-ONLY {name}: {len(spark_rows)} rows"
                f" ({time.time() - t0:.1f}s)"
            )
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            oracle_cols = [d[0] for d in cur.description]
            oracle_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(spark_cols, spark_rows)
        oc, orr = norm_rows(oracle_cols, oracle_rows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orr)}")
            variant_report(sc, sr, orr)
            n_fail += 1
        elif sr != orr:
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            variant_report(sc, sr, orr)
            n_fail += 1
        else:
            sv = split_variants(sc, sr)
            per_variant = (
                " [" + ", ".join(
                    f"{v}:{len(rs)}" for v, rs in sorted(sv.items())
                ) + "]"
                if sv
                else ""
            )
            print(
                f"PASS {name}: {len(sr)} rows{per_variant}"
                f" ({time.time() - t0:.1f}s)"
            )
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
