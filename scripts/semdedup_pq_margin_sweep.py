"""SemDeDup PQ-mode candidate recall vs ``pq_margin`` (VERDICT r15 #5).

PQ-stored semdedup indexes filter update candidates at
``threshold - pq_margin`` on DECODED (approximate) similarities, then
re-verify survivors exactly — so scores and surviving decisions are
exact, but a true near-dup whose PQ reconstruction error pushes its
approximate similarity below the filter line is MISSED. That miss
probability was documented but never quantified; this sweep measures
it against planted near-dups whose true similarities hug the
threshold (the hardest case — sims far above the threshold survive
any reasonable margin).

Method: full-storage twin = ground truth (its update decisions are
the batch semantics, storage-exact). For each margin, build a PQ
index on the same corpus (same codebook seed), run the same planted
update batch, and report recall = dups-found / dups-true plus the
exact-agreement bit on the full decision frame. Planted batch: exact
copies (sim 1.0) + noisy copies at graded noise levels landing sims
in [threshold, threshold+0.1) — measured, not assumed.

Usage:
    python scripts/semdedup_pq_margin_sweep.py [sf_dir] [margins]
    # margins: comma list, default 0.1,0.2,0.3,0.4,0.5
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.sources.tables import load_table

THRESHOLD = 0.85


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    margins = (
        [float(m) for m in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [0.1, 0.2, 0.3, 0.4, 0.5]
    )
    spark = get_spark(app_name="semdedup-pq-margin-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from level_mapreduce_spark.operators.similarity import (
        build_semdedup_index,
        semdedup_update,
    )

    emb = load_table(spark, sf_dir, "embeddings").localCheckpoint(eager=True)
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=float)
    ids = np.array([r["vec_id"] for r in rows])
    base_id = int(ids.max())
    rng = np.random.default_rng(29)

    # planted batch: for sampled source vectors, exact copies plus
    # noisy copies tuned (per vector, by bisection on the noise
    # scale) to land true cosine sim in the target band just above
    # the threshold — the regime where a candidate filter miss is
    # actually possible
    n_plant = 120
    picks = rng.choice(len(X), size=n_plant, replace=False)
    batch_rows, true_sims = [], []
    for j, pi in enumerate(picks):
        v = X[pi]
        nv = np.linalg.norm(v)
        if nv == 0:
            continue
        if j % 3 == 0:
            w, s = v.copy(), 1.0
        else:
            target = THRESHOLD + 0.002 + 0.096 * rng.random()
            g = rng.normal(size=v.shape)
            lo, hi = 0.0, 4.0
            for _ in range(40):
                mid = (lo + hi) / 2
                w = v + mid * nv * g / np.linalg.norm(g)
                s = float(
                    w @ v / (np.linalg.norm(w) * nv)
                )
                if s > target:
                    lo = mid
                else:
                    hi = mid
            w = v + lo * nv * g / np.linalg.norm(g)
            s = float(w @ v / (np.linalg.norm(w) * nv))
        batch_rows.append(
            (int(base_id + 1 + j), [float(x) for x in w])
        )
        true_sims.append(round(s, 4))
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>"
    ).localCheckpoint(eager=True)
    print(
        json.dumps(
            {
                "planted": len(batch_rows),
                "sim_band": [min(true_sims), max(true_sims)],
                "threshold": THRESHOLD,
            }
        ),
        flush=True,
    )

    store = tempfile.mkdtemp(prefix="lmr_pq_margin_")
    try:
        full = build_semdedup_index(
            spark, emb, store, name="mg_full", threshold=THRESHOLD,
            n_clusters=16, seed=5,
        )
        truth = {
            r["vec_id"]: (r["keep"], r["leader_id"], r["leader_sim"])
            for r in semdedup_update(full, batch).collect()
        }
        n_true_dups = sum(1 for k, v in truth.items() if not v[0])
        print(json.dumps({"true_dups": n_true_dups}), flush=True)

        curve = {}
        for margin in margins:
            pq = build_semdedup_index(
                spark, emb, store, name=f"mg_pq_{int(margin * 100)}",
                threshold=THRESHOLD, n_clusters=16, seed=5,
                vector_storage="pq", pq_margin=margin,
            )
            got = {
                r["vec_id"]: (r["keep"], r["leader_id"], r["leader_sim"])
                for r in semdedup_update(
                    pq, batch, source_embeddings=emb
                ).collect()
            }
            found = sum(
                1
                for k, v in truth.items()
                if not v[0] and not got[k][0]
            )
            exact_agree = got == truth
            recall = round(found / n_true_dups, 4) if n_true_dups else None
            rec = {
                "pq_margin": margin,
                "recall": recall,
                "dups_found": found,
                "exact_decision_agreement": exact_agree,
            }
            curve[str(margin)] = recall
            print(json.dumps(rec), flush=True)
        print(
            json.dumps(
                {"summary": "semdedup_pq_margin", "threshold": THRESHOLD,
                 "recall_by_margin": curve}
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
