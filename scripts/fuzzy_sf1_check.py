"""One-off round-12 closer: fuzzy_pairs correctness at sf1.0.

The 49 other registry entries run through check_correctness.py at
sf1.0 directly; fuzzy_pairs is split out because its DuckDB oracle is
the intentionally-quadratic brute-force levenshtein join (recall
equality with brute force IS the check, queries.py q_fuzzy_pairs),
which at 50k docs is ~1.25B pairs — hours on this box. The oracle
therefore runs ONCE, detached, dumping rows to
/tmp/fuzzy_sf1_oracle_rows.json; this script runs the Spark side and
compares exactly (same id_a/id_b/dist triples, order-insensitive).

Usage: python scripts/fuzzy_sf1_check.py [sf1_dir] [oracle_rows.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.queries import q_fuzzy_pairs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmr_sf1.0"
    oracle_path = (
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/fuzzy_sf1_oracle_rows.json"
    )
    spark = get_spark(app_name="lmr-fuzzy-sf1")
    t0 = time.time()
    rows = q_fuzzy_pairs(spark, sf_dir).collect()
    spark_secs = round(time.time() - t0, 1)
    got = sorted((int(r.id_a), int(r.id_b), int(r.dist)) for r in rows)
    with open(oracle_path) as f:
        want = sorted(tuple(int(x) for x in r) for r in json.load(f))
    ok = got == want
    print(
        json.dumps(
            {
                "query": "fuzzy_pairs",
                "sf_dir": sf_dir,
                "spark_rows": len(got),
                "oracle_rows": len(want),
                "exact_match": ok,
                "spark_secs": spark_secs,
            }
        )
    )
    if not ok:
        extra = [r for r in got if r not in set(want)][:5]
        missing = [r for r in want if r not in set(got)][:5]
        print("spark-extra sample:", extra)
        print("spark-missing sample:", missing)
        sys.exit(1)


if __name__ == "__main__":
    main()
