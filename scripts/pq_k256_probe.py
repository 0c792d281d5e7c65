"""Production-k PQ probe — plan-build cost and bit-equality at k=256.

FAISS-standard codebooks are k=256 per subspace; at m=8, dsub=8 that
is 16,384 doubles, and realizing them as a Column literal makes plan
construction + analysis grow with k (the r7 measurement: ~2.6 s per
plan build already at k=64 when the literal was NOT staged). The
column ADC scorer therefore forks above ``_PQ_LITERAL_MAX_DOUBLES``:
each subspace's codebook ships as a broadcast k-row table joined on
the code instead of a literal ``element_at`` gather.

This probe measures, for k in {64, 256} at sf0.1:

- ``plan_s`` — time to CONSTRUCT + ANALYZE the batched column-scorer
  plan (``df.schema`` forces analysis). NOTE this includes
  ivfpq_knn_join's internal eager localCheckpoint of the probe
  ROUTING (a small real job over the 20-probe table); that job is
  identical across k (routing depends on n_centroids, not the PQ
  codebook), so the k=64-vs-k=256 comparison isolates exactly the
  codebook-realization cost the probe exists to measure;
- ``exec_s`` — execution through the noop sink (the scoring join;
  routing is already materialized by the checkpoint above);
- bit-equality of the broadcast path against (a) the literal path
  forced at the same k and (b) the Arrow scorer.

Usage:: python scripts/pq_k256_probe.py [sf_dir]
Prints one JSON line.

HISTORICAL (r8): arbitrated literal-codebook vs broadcast-join ADC
scoring at k=256 (cutover _PQ_LITERAL_MAX_DOUBLES=8192 chosen).
Re-run only if the PQ serve/encode fork or the cutover constant moves.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators import indexed as ix
from level_mapreduce_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="lmr-pq-k256-probe")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()
    probes = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").cast("long").alias("probe_id"), "embedding"
    )
    store = tempfile.mkdtemp(prefix="lmr_pqk_")
    out: dict = {}

    for kk in (64, 256):
        # encode-path cost: time the full index build under both cell
        # encoders (training is shared cost; the delta is the encode)
        build_s = {}
        for enc in ("column", "arrow"):
            t0 = time.time()
            triple = ix.build_ivfpq_index(
                spark, emb, store, name=f"probe_ivfpq_k{kk}_{enc}",
                n_centroids=8, k=kk, encoder=enc,
            )
            build_s[enc] = round(time.time() - t0, 3)
        sidx, cents, books = triple  # serve off the arrow-encoded one

        def build_plan():
            return ix.ivfpq_knn_join(
                sidx, cents, books, probes, k=10, scorer="column"
            )

        t0 = time.time()
        plan = build_plan()
        _ = plan.schema
        plan_s = round(time.time() - t0, 3)
        t0 = time.time()
        plan.write.format("noop").mode("overwrite").save()
        exec_s = round(time.time() - t0, 3)

        rows = {
            (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
            for r in build_plan().collect()
        }
        arrow_rows = {
            (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
            for r in ix.ivfpq_knn_join(
                sidx, cents, books, probes, k=10, scorer="arrow"
            ).collect()
        }
        # force the OTHER column realization at the same k and compare
        saved = ix._PQ_LITERAL_MAX_DOUBLES
        try:
            ix._PQ_LITERAL_MAX_DOUBLES = 0 if kk == 64 else 10**9
            other_rows = {
                (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
                for r in ix.ivfpq_knn_join(
                    sidx, cents, books, probes, k=10, scorer="column"
                ).collect()
            }
        finally:
            ix._PQ_LITERAL_MAX_DOUBLES = saved
        out[f"k{kk}"] = {
            "build_s": build_s,
            "plan_s": plan_s,
            "exec_s": exec_s,
            "path": "literal" if kk == 64 else "broadcast",
            "eq_other_column_path": rows == other_rows,
            "eq_arrow": rows == arrow_rows,
            "n_rows": len(rows),
        }

    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
