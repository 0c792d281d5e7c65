"""Regenerate /tmp/fuzzy_sf1_oracle_rows.json — the sharded one-shot
brute-force oracle for fuzzy_pairs at sf1.0 (the r12 run was a
throwaway shell loop; /tmp does not survive sessions, so the dump
needs a committed generator).

Semantics are EXACTLY the fuzzy_pairs DuckDB oracle (queries.py):
levenshtein <= 3 over substr(lower(text), 1, 40), a.id < b.id,
byte-based levenshtein on the ASCII corpus. The naive single-process
inequality join is ~1.25B pairs at 50k docs and pins ONE core (~2.5 h
projected, r12 measurement); sharding the LEFT side by id % NSHARDS
into independent DuckDB processes uses the whole box (~743 s at 16
shards in r12).

Usage: python scripts/fuzzy_sf1_oracle_dump.py [sf1_dir] [out.json]
           [nshards]
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

NSHARDS_DEFAULT = 16


def shard_rows(args: tuple[str, int, int]) -> list[list[int]]:
    sf_dir, shard, nshards = args
    import duckdb

    con = duckdb.connect()
    return [
        [int(a), int(b), int(d)]
        for a, b, d in con.execute(
            f"""
            WITH t AS (
              SELECT CAST(doc_id AS BIGINT) AS id,
                     substr(lower(text), 1, 40) AS s
              FROM '{sf_dir}/documents.parquet'
            )
            SELECT a.id, b.id, CAST(levenshtein(a.s, b.s) AS BIGINT)
            FROM (SELECT * FROM t WHERE id % {nshards} = {shard}) a
            JOIN t b ON a.id < b.id
            WHERE levenshtein(a.s, b.s) <= 3
            """
        ).fetchall()
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmr_sf1.0"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/tmp/fuzzy_sf1_oracle_rows.json"
    )
    nshards = int(sys.argv[3]) if len(sys.argv) > 3 else NSHARDS_DEFAULT
    t0 = time.time()
    with mp.Pool(nshards) as pool:
        parts = pool.map(
            shard_rows, [(sf_dir, i, nshards) for i in range(nshards)]
        )
    rows = [r for part in parts for r in part]
    rows.sort()
    # bare list of [id_a, id_b, dist] triples — the exact shape
    # fuzzy_sf1_check.py json.load()s
    with open(out, "w") as f:
        json.dump(rows, f)
    print(
        json.dumps(
            {
                "oracle_rows": len(rows),
                "nshards": nshards,
                "wall_s": round(time.time() - t0, 1),
                "out": out,
            }
        )
    )


if __name__ == "__main__":
    main()
