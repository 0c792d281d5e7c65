"""Round-13 probe: did the scale-aware shuffle width (AQE
initialPartitionNum, session.py) kill the tfidf sf1.0 exponent?
(VERDICT r12 #3: tfidf was the one key at ~13.2x wall for 10x data —
a fixed width=ncores hash-agg shuffle is a parallelism/partition-size
ceiling AQE cannot split.)

Usage: python scripts/tfidf_scale_probe.py [sf_dir]
Run once per scale in a FRESH process (static confs pin per JVM):
    python scripts/tfidf_scale_probe.py /root/testdata/sf0.1
    python scripts/tfidf_scale_probe.py /tmp/lmr_sf1.0
Prints min-of-3 for tfidf + inverted_index count_by_key.

ANSWER (r13, this box): the exponent was already sublinear at fixed
width — tfidf 0.82 s (sf0.1) -> 3.18 s (sf1.0) = 3.9x wall for 10x
data; inverted_index 1.38 -> 5.53 = 4.0x. Wide initial partitions
(SPARK_INITIAL_PARTITIONS=256) made sf1.0 SLOWER (tfidf 3.88 s) and
cost 1.5 s across the full sf0.1 bench (sketch-rollup folds 3x: 256
map-side buckets of overhead on KB-sized shuffles). The r12 13.2x
reading was driver-box band + the single-file corpus's 2-split input
ceiling (stage views show (1+1)/2 tasks on the scan), not reduce-side
width. Default stays initial=ncores; clusters override via the env.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.engine.index import MapIndex
from level_mapreduce_spark.operators.text import inverted_index_mapper, tfidf


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="tfidf_scale")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print("docs:", docs.count(), "at", sf_dir)

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    mat(tfidf(docs))  # warm
    best = 9e9
    for _ in range(3):
        t0 = time.time()
        mat(tfidf(docs))
        best = min(best, time.time() - t0)
    print(f"tfidf: min-of-3 = {best:.3f}s")

    store = tempfile.mkdtemp(prefix="lmr_tfidf_probe_")
    def inverted(n=[0]):
        n[0] += 1
        iidx = MapIndex(spark, f"probe_inv_{n[0]}", inverted_index_mapper(),
                        store, doc_key="doc_id")
        iidx.build(docs, assume_unique=True)
        mat(iidx.count_by_key())

    inverted()
    best = 9e9
    for _ in range(3):
        t0 = time.time()
        inverted()
        best = min(best, time.time() - t0)
    print(f"inverted_index: min-of-3 = {best:.3f}s")


if __name__ == "__main__":
    main()
