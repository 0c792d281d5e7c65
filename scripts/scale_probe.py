"""10x bench-scale probe — looks for plan flips and superlinear keys.

The sf0.1 oracle sweep proves correctness at 10x the gate scale; this
probe is the PERFORMANCE analog: replicate the bench corpus Nx
(default 10x, id-shifted; document text gets the replica-distinct
md5 prefix so dup density stays the base corpus's) and run the
headline operator shapes once at 1x and once at Nx, recording

- per-key wall clock at both scales and the scaling exponent
  ``log(t_N / t_1) / log(N)`` (1.0 = linear, <=0 = flat overhead,
  >1 superlinear — diagnose those);
- plan-flip indicators at both scales: whether read()'s tombstone
  anti-join still broadcasts after the churn batch (the
  TOMBSTONE_BROADCAST_BYTES cutover), and whether the as-of union
  window path changed join strategy.

Caveats: wall clock at these sizes is partly job-overhead; the
exponent matters more than the absolute numbers, and sub-second keys
round-trip noise (exponents below ~0.3 mean "overhead-bound", not
"sublinear magic"). Replication preserves each key's OUTPUT density:
embeddings get a per-replica sign pattern (within-replica cosines
exact, cross-replica ~0), near-dup text gets per-replica token
suffixes (within-replica Jaccard exact, cross-replica 0), while
bm25/dedup_exact keep the shared-vocabulary md5-prefix replicas so
their candidate sets grow with the corpus as they would in reality.

Usage::

    python scripts/scale_probe.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import math
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
from scripts.fuzzy_scale_probe import replicate as replicate_docs


def materialize(df):
    df.write.format("noop").mode("overwrite").save()


def rep_ids(df, n: int, cols: dict[str, int]):
    """n copies with each id column shifted by r * its base count."""
    reps = []
    for r in range(n):
        d = df
        for c, base in cols.items():
            d = d.withColumn(c, F.col(c) + F.lit(r * base))
        reps.append(d)
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    return out


def rep_emb(emb, n: int, base: int):
    """n replicas with a replica-specific +-1 SIGN PATTERN applied per
    coordinate: cos(S.a, S.b) = cos(a, b) exactly (s_i^2 = 1), so
    within-replica geometry — including the planted duplicates the
    neardup_lsh key adds — is preserved bit-for... value-for-value,
    while cross-replica sims decorrelate to ~0 (no replica cliques:
    corpus grows Nx, dup density stays the base corpus's)."""
    reps = []
    for r in range(n):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(r * base))
        if r:
            d = d.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: x
                    * F.when(
                        F.pmod(F.hash(F.lit(r) * 4096 + i), 2) == 0,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
            )
        reps.append(d)
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    return out


def rep_docs_distinct(docs, n: int, base: int):
    """n replicas with a replica token SUFFIXED TO EVERY WORD: the
    per-doc shingle/token set maps bijectively, so within-replica
    Jaccard (minhash, band index) is preserved exactly while
    cross-replica overlap drops to zero — corpus grows Nx with the
    base corpus's dup density. (The md5-PREFIX replication keeps the
    vocabulary shared instead — right for bm25/tfidf-style keys whose
    candidate sets should grow with the corpus.)"""
    reps = []
    for r in range(n):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * base))
        if r:
            d = d.withColumn(
                "text",
                F.regexp_replace(F.col("text"), r"(\S+)", rf"$1~r{r}"),
            )
        reps.append(d)
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    return out


def run_scale(spark, tables, store, tag) -> dict:
    # docs_shared: md5-prefix replicas (vocabulary stays corpus-wide —
    # bm25/dedup_exact candidate sets grow with the corpus);
    # docs_distinct: token-suffix replicas (dup density stays the base
    # corpus's — minhash/band outputs must not grow quadratically)
    orders, docs_shared, docs_distinct, emb, events = tables
    docs = docs_shared
    times = {}
    flags = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)

    idx = MapIndex(
        spark,
        f"scale_orders_{tag}",
        q._orders_mapper(),
        store,
        doc_key="o_orderkey",
    )
    timed("build_orders", lambda: idx.build(orders, assume_unique=True))
    churn = orders.where(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.5
    )
    timed("update_1pct", lambda: idx.update(churn, assume_unique=True))
    plan = idx.read()._jdf.queryExecution().executedPlan().toString()
    flags["tombstone_antijoin_broadcast"] = "BroadcastHashJoin" in plan
    flags["tombstone_bytes"] = idx._tomb_bytes()
    timed("count_by_key", lambda: materialize(idx.count_by_key()))
    timed("range_scan", lambda: materialize(idx.scan(start="2", end="4")))

    from level_mapreduce_spark.operators import (
        brute_topk,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from level_mapreduce_spark.operators.indexed import build_band_index
    from level_mapreduce_spark.operators.joins import asof_join
    from level_mapreduce_spark.operators.similarity import (
        cosine_neardup_pairs_lsh,
        probe_vector,
    )
    from level_mapreduce_spark.operators.text import bm25_topk
    from level_mapreduce_spark.operators.events import windowed_counts

    timed("dedup_exact", lambda: materialize(exact_dedup(docs)))

    def minhash_cold():
        spark.catalog.clearCache()
        materialize(minhash_lsh_pairs(docs_distinct, threshold=0.7))

    timed("dedup_minhash", minhash_cold)
    timed(
        "bm25_topk", lambda: materialize(bm25_topk(docs, q._BM25_QUERY, k=10))
    )
    probe = probe_vector(emb, 0)
    timed("ann_topk", lambda: materialize(brute_topk(emb, probe, k=10)))
    emb_aug = emb.unionByName(
        emb.where(F.col("vec_id") % 10 == 0).withColumn(
            "vec_id", F.col("vec_id") + F.lit(10_000_000)
        )
    )
    timed(
        "neardup_lsh",
        lambda: materialize(
            cosine_neardup_pairs_lsh(emb_aug, threshold=0.95)
        ),
    )
    timed(
        "band_index_build",
        lambda: build_band_index(
            spark, docs_distinct, store, name=f"scale_band_{tag}"
        ),
    )

    def asof():
        clicks = events.where(F.col("event_type") == "click")
        purchases = events.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        df = asof_join(clicks, purchases, on="user_id", ts="ts")
        materialize(df)

    timed("asof_join", asof)
    timed("events_window", lambda: materialize(windowed_counts(events)))

    from level_mapreduce_spark.operators.export import write_shuffled

    timed(
        "export_shuffled",
        lambda: write_shuffled(
            docs, os.path.join(store, f"exp_{tag}"), n_shards=32, seed=1
        ),
    )
    return {"times": times, "flags": flags}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="lmr-scale-probe")

    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    events = load_table(spark, sf_dir, "events")
    counts = {
        "orders": orders.count(),
        "docs": docs.count(),
        "emb": emb.count(),
        "events": events.count(),
        "users": events.agg(F.count_distinct("user_id")).first()[0],
    }

    big = (
        rep_ids(orders, n, {"o_orderkey": counts["orders"] * 2}),
        replicate_docs(docs, n, counts["docs"]),
        rep_docs_distinct(docs, n, counts["docs"]),
        rep_emb(emb, n, counts["emb"] * 2),
        rep_ids(
            events,
            n,
            {
                "event_id": counts["events"] * 2,
                "user_id": counts["users"] * 2,
            },
        ),
    )
    # materialize the Nx corpus as parquet so both runs read files
    # (unions of 10 scans would change the 1x-vs-Nx plan shapes)
    work = tempfile.mkdtemp(prefix="lmr_scale_corpus_")
    names = ("orders", "docs_shared", "docs_distinct", "emb", "events")
    big_tables = []
    for name, df in zip(names, big):
        p = os.path.join(work, name)
        df.write.mode("overwrite").parquet(p)
        big_tables.append(spark.read.parquet(p))

    out = {"sf_dir": sf_dir, "n": n, "base_counts": counts}
    # discarded warmup pass at 1x: otherwise the x1 measurement pays
    # all the codegen/JIT that xN then gets for free and every
    # exponent reads spuriously low
    base_tables = (orders, docs, docs, emb, events)
    warm_store = tempfile.mkdtemp(prefix="lmr_scale_warm_")
    try:
        run_scale(spark, base_tables, warm_store, "warm")
    finally:
        shutil.rmtree(warm_store, ignore_errors=True)
    for tag, tables in (("x1", base_tables),
                        ("xN", tuple(big_tables))):
        store = tempfile.mkdtemp(prefix=f"lmr_scale_{tag}_")
        try:
            out[tag] = run_scale(spark, tables, store, tag)
        finally:
            shutil.rmtree(store, ignore_errors=True)
    shutil.rmtree(work, ignore_errors=True)

    exps = {}
    for k, t1 in out["x1"]["times"].items():
        tn = out["xN"]["times"].get(k)
        if tn and t1 and t1 > 0:
            exps[k] = round(math.log(tn / t1) / math.log(n), 2)
    out["scaling_exponent"] = exps
    print(json.dumps(out))


if __name__ == "__main__":
    main()
