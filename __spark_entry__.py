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
    """DuckDB-runnable ANSI SQL per query — one oracle for EVERY
    registry entry (the rows-only set reached zero in r10).
    Graduation history: ``sketch_range_estimate`` and
    ``neardup_cosine_blocked`` in r9 via output shaping (exact value
    + error-envelope bit; expression-twin agreement bit);
    ``dedup_simhash`` in r10 via an MD5-prefix hash variant (MD5 is
    byte-identical across engines, so the oracle recomputes the
    fingerprints and pins the bucketed pair set against all-pairs
    hamming); ``ann_lsh_ivf`` in r10 (literal PCG64 hyperplanes →
    exact LSH twin; full-nprobe IVF ≡ brute force; ADC paths as
    recall-envelope bits); ``multimodal_features`` in r10 (fake-media
    payloads are utf8(text) re-derived via hex byte expansion;
    real-codec payloads closed-form in media_id)."""
    return dict(_q.ORACLES)
