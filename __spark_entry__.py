"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry lives in :mod:`level_mapreduce_spark.queries` — one
(query, oracle) pair per SURVEY.md §2 operator plus the LLM-pipeline
extension operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from level_mapreduce_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2 step 1): materialize the orders
    index keyed by o_orderpriority with an ExprMapper (JVM-side map
    fn), then range-scan it in key order — the reference's core write
    path + sorted read (index.js:173-249, 124-138) end-to-end."""
    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF_DIR", "/root/testdata/sf0.001")
    idx = _q._orders_index(spark, sf_dir)
    return idx.scan(sort=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    LLM-pipeline extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame whose column names match its oracle."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. Exactly three entries are
    intentionally absent — ``dedup_simhash`` (64-bit hash bucketing),
    ``ann_lsh_ivf`` (k-means bucketing), ``multimodal_features``
    (byte-level codec decode) — none expressible in DuckDB SQL →
    driver records the rows-only check; their semantics vs the exact
    operators are asserted in pytest (exact-twin, recall-floor, and
    codec property tests). ``sketch_range_estimate`` and
    ``neardup_cosine_blocked`` graduated to hash-gated in r9 via
    output shaping (exact value + error-envelope bit; expression-twin
    agreement bit)."""
    return dict(_q.ORACLES)
