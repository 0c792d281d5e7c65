"""Sub-step timing for the composite bench keys (r16 measure-first):
splits each heavy key into its sequential driver jobs so the
optimization targets the step that actually costs, not the key total.

Usage: python scripts/opt_substep_probe.py [sf_dir] [probe ...]
Probes: ivfpq chained bm25 semdedup postings sketch
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import MapIndex, get_spark
from level_mapreduce_spark import queries as q
from level_mapreduce_spark.sources.tables import load_table


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {
        "ivfpq", "chained", "bm25", "semdedup", "postings", "sketch"
    }
    spark = get_spark(app_name="lmr-substep-probe")
    store = tempfile.mkdtemp(prefix="lmr_substep_")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    orders = load_table(spark, sf_dir, "orders")
    docs.count(), emb.count(), orders.count()  # warm listings

    out: dict[str, dict[str, float]] = {}

    def t(probe, step, fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.time()
            r = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out.setdefault(probe, {})[step] = round(best, 3)
        return r

    try:
        if "ivfpq" in which:
            from level_mapreduce_spark.operators.indexed import (
                _IVFPQ_FAMILY,
                _ivfpq_make_mapper,
            )
            from level_mapreduce_spark.operators.ivf import train_centroids
            from level_mapreduce_spark.operators.pq import train_pq

            cents = t(
                "ivfpq", "train_centroids",
                lambda: train_centroids(emb, n_centroids=8),
            )
            books = t("ivfpq", "train_pq", lambda: train_pq(emb))
            n = [0]

            def create():
                n[0] += 1
                return _IVFPQ_FAMILY.create(
                    spark, emb, store, f"probe_ivfpq_{n[0]}",
                    {
                        "residual": False,
                        "encoder": "column",
                        "centroids": cents,
                        "codebooks": [
                            [list(map(float, r)) for r in b] for b in books
                        ],
                    },
                )

            t("ivfpq", "family_create", create)

        if "chained" in which:
            from pyspark.sql import types as T

            from level_mapreduce_spark.engine.mapper import ExprMapper

            n = [0]

            def a_only():
                n[0] += 1
                a = MapIndex(
                    spark, f"pr_chain_a{n[0]}", q._orders_mapper(), store,
                    doc_key="o_orderkey",
                )
                a.build(orders, assume_unique=True)
                return a

            a = t("chained", "a_build_alone", a_only)

            def chain():
                n[0] += 1
                a = MapIndex(
                    spark, f"pr_chain_c{n[0]}", q._orders_mapper(), store,
                    doc_key="o_orderkey",
                )
                b_mapper = ExprMapper(
                    F.transform(
                        F.col("value"),
                        lambda p: F.struct(
                            F.concat(F.lit("by_"), p["index_key"]).alias(
                                "index_key"
                            ),
                            p["value"].alias("value"),
                        ),
                    ),
                    value_type=T.DoubleType(),
                )
                b = MapIndex(spark, f"pr_chain_d{n[0]}", b_mapper, store)
                a.pipe(b)
                a.build(orders, assume_unique=True)

            t("chained", "full_chain", chain)

        if "bm25" in which:
            from level_mapreduce_spark.operators.text import (
                bm25_batch_from_index,
                build_postings_index,
            )

            idx = build_postings_index(
                spark, docs, store, name="probe_postings_bm25"
            )
            probe_queries = (
                docs.where(F.col("text").isNotNull())
                .limit(100)
                .select(
                    F.col("doc_id").cast("long").alias("query_id"),
                    F.concat_ws(
                        " ",
                        F.slice(F.split(F.lower("text"), "\\s+"), 1, 8),
                    ).alias("text"),
                )
                .localCheckpoint(eager=True)
            )
            t(
                "bm25", "batch_total",
                lambda: materialize(
                    bm25_batch_from_index(idx, probe_queries, k=10)
                ),
            )
            # setup-only: the q_terms/terms_df/count/collect driver jobs
            from level_mapreduce_spark.operators.text import tokens_expr

            def setup_only():
                q_terms = (
                    probe_queries.select(
                        F.col("query_id").cast("long").alias("query_id"),
                        F.explode(tokens_expr("text")).alias("term"),
                    )
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                terms_df = q_terms.select("term").distinct().localCheckpoint(
                    eager=True
                )
                n_terms = terms_df.count()
                sorted(r["term"] for r in terms_df.collect())
                return n_terms

            t("bm25", "setup_jobs", setup_only)

        if "semdedup" in which:
            from level_mapreduce_spark.operators.ivf import train_centroids
            from level_mapreduce_spark.operators.similarity import (
                build_semdedup_index,
                semantic_dedup,
            )

            t(
                "semdedup", "train_centroids",
                lambda: train_centroids(emb, n_centroids=16),
            )
            t(
                "semdedup", "semantic_dedup_total",
                lambda: materialize(
                    semantic_dedup(emb, n_clusters=16, threshold=0.95)
                ),
            )
            n = [0]

            def build():
                n[0] += 1
                return build_semdedup_index(
                    spark, emb, store, name=f"probe_sd_{n[0]}",
                    n_clusters=16, threshold=0.95,
                )

            sd = t("semdedup", "index_build_total", build)

            from level_mapreduce_spark.operators.similarity import (
                semdedup_update,
            )

            def churn():
                new_vecs = emb.where(F.col("vec_id") % 100 == 0).withColumn(
                    "vec_id", F.col("vec_id") + F.lit(20_000_000)
                )
                materialize(semdedup_update(sd, new_vecs))

            t("semdedup", "update_1pct", churn)

        if "postings" in which:
            from level_mapreduce_spark.operators.text import (
                build_postings_index,
            )

            n = [0]

            def build():
                n[0] += 1
                return build_postings_index(
                    spark, docs, store, name=f"probe_post_{n[0]}"
                )

            pidx = t("postings", "build_total", build)

            def churn():
                churn_docs = docs.where(
                    F.col("doc_id") % 100 == 0
                ).withColumn(
                    "text", F.concat(F.lit("changed "), F.col("text"))
                )
                pidx.update(churn_docs, assume_unique=True)

            t("postings", "update_1pct", churn)

        if "sketch" in which:
            from level_mapreduce_spark.operators.sketches import (
                build_sketch_index,
                update_sketch_index,
            )

            events = load_table(spark, sf_dir, "events")
            events.count()
            n = [0]

            def build():
                n[0] += 1
                return build_sketch_index(
                    spark, events, store, name=f"probe_sk_{n[0]}"
                )

            sk = t("sketch", "build_total", build, n=1)
            tail = events.where(F.col("event_id") % 10 == 0)
            t(
                "sketch", "update_10pct",
                lambda: update_sketch_index(sk, tail), n=1,
            )
    finally:
        shutil.rmtree(store, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
