"""Product quantization: code structure, planted-duplicate ranking,
recall against exact L2, and the distributed-top-k plan shape.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark.operators.pq import pq_encode, pq_topk, train_pq
from level_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def pq_setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=8, k=64)
    codes = pq_encode(emb, books).persist()
    codes.count()
    rows = emb.collect()
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    yield emb, books, codes, x, ids
    codes.unpersist()


def test_pq_codes_structure(pq_setup):
    """Every vector encodes to m in-range centroid ids, and identical
    vectors encode identically (determinism + 32x compression: 8
    int8-range codes stand in for 64 float32s)."""
    emb, books, codes, x, ids = pq_setup
    rows = codes.collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 64 for c in r["codes"])
    again = pq_encode(emb, books).collect()
    assert {r["vec_id"]: r["codes"] for r in rows} == {
        r["vec_id"]: r["codes"] for r in again
    }


def test_pq_recall_vs_exact(pq_setup):
    """ADC top-10 recovers a solid fraction of the exact-L2 top-10
    (random vectors are PQ's worst case; measured ~0.54 at 8
    bytes/vector — assert a margined floor), and a probe that IS a
    corpus vector always recovers itself."""
    emb, books, codes, x, ids = pq_setup
    recalls = []
    for i in range(5):
        p = x[i]
        exact = set(ids[np.argsort(((x - p) ** 2).sum(axis=1))[:10]])
        got = pq_topk(codes, books, list(p), k=10).collect()
        approx = {r["vec_id"] for r in got}
        assert ids[i] in approx  # self is found
        # ascending ADC order out of the sink
        dists = [r["adc_dist"] for r in got]
        assert dists == sorted(dists)
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.35, recalls


def test_pq_planted_duplicate_ranks_top(spark, pq_setup):
    """A planted exact duplicate shares its source's codes, so its
    ADC distance ties the source's and both rank at the top for a
    probe equal to that vector."""
    emb, books, codes, x, ids = pq_setup
    dup = emb.where(F.col("vec_id") == int(ids[3])).select(
        (F.col("vec_id") + 700000).alias("vec_id"), "embedding", "label"
    )
    codes_aug = pq_encode(emb.unionByName(dup), books)
    top = pq_topk(codes_aug, books, list(x[3]), k=3).collect()
    top_ids = {r["vec_id"] for r in top}
    assert {int(ids[3]), int(ids[3]) + 700000} <= top_ids
    by_id = {r["vec_id"]: r["adc_dist"] for r in top}
    assert by_id[int(ids[3])] == by_id[int(ids[3]) + 700000]


def test_pq_topk_plan_is_distributed_topk(pq_setup):
    """The global stage plans as TakeOrderedAndProject over per-batch
    top-k emissions — never a global sort."""
    emb, books, codes, x, ids = pq_setup
    plan = (
        pq_topk(codes, books, list(x[0]), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_composition(spark, pq_setup):
    """IVFPQ: ADC over only the probed inverted lists still recovers
    the probe vector itself and a healthy share of full-PQ's answer
    set (the composition can only lose what list-pruning drops)."""
    from level_mapreduce_spark.operators.ivf import train_centroids
    from level_mapreduce_spark.operators.pq import ivfpq_topk

    emb, books, codes, x, ids = pq_setup
    cents = train_centroids(emb, n_centroids=8)
    full = {r["vec_id"] for r in pq_topk(codes, books, list(x[1]), k=10).collect()}
    got = ivfpq_topk(
        emb, books, cents, list(x[1]), k=10, nprobe=4
    ).collect()
    got_ids = {r["vec_id"] for r in got}
    assert ids[1] in got_ids                  # self survives routing
    assert len(got_ids & full) >= 5, (got_ids, full)
