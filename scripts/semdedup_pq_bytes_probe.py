"""Measure the semdedup index's vector-storage shrink (VERDICT r14
#4 / r15 #5): build the index twice on the same corpus — full stored
embeddings vs PQ codes — and compare live segment bytes, then check
the two serve identical decisions and that a churn batch through the
PQ path (exact re-verification against the source) matches the full
twin. Usage: python scripts/semdedup_pq_bytes_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.engine.index import _path_bytes
from level_mapreduce_spark.operators.similarity import (
    build_semdedup_index,
    semdedup_from_index,
    semdedup_update,
)
from level_mapreduce_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lmr_sf1.0"
    spark = get_spark(app_name="semdedup-pq-bytes")
    spark.sparkContext.setLogLevel("ERROR")
    store = tempfile.mkdtemp(prefix="lmr_pqbytes_")
    emb = load_table(spark, sf_dir, "embeddings")
    try:
        full = build_semdedup_index(spark, emb, store, name="b_full")
        pq = build_semdedup_index(
            spark, emb, store, name="b_pq", vector_storage="pq"
        )
        same = sorted(
            tuple(r) for r in semdedup_from_index(pq).collect()
        ) == sorted(tuple(r) for r in semdedup_from_index(full).collect())
        fb = _path_bytes(spark, full.segments_path)
        pb = _path_bytes(spark, pq.segments_path)
        # churn: a 1% batch of fresh vectors through both paths
        import numpy as np

        rng = np.random.default_rng(3)
        dim = len(emb.select("embedding").head()[0])
        base = int(emb.agg(F.max(F.col("vec_id").cast("long"))).first()[0])
        n = max(10, emb.count() // 100)
        vecs = rng.normal(size=(n, dim))
        batch = spark.createDataFrame(
            [
                (int(base + 1 + j), [float(v) for v in vecs[j]])
                for j in range(n)
            ],
            "vec_id long, embedding array<double>",
        )
        uf = sorted(tuple(r) for r in semdedup_update(full, batch).collect())
        up = sorted(
            tuple(r)
            for r in semdedup_update(
                pq, batch, source_embeddings=emb
            ).collect()
        )
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_vectors": emb.count(),
                    "build_decisions_equal": same,
                    "churn_decisions_equal": uf == up,
                    "full_segment_bytes": fb,
                    "pq_segment_bytes": pb,
                    "shrink_ratio": round(fb / pb, 2) if pb else None,
                }
            )
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
