"""Scale probe: edit-distance blocking + hashed-features vectorizer.

Replicates the sf documents corpus Nx (each replica's text gets a
replica-distinct 12-char prefix, so replicas are NOT within edit
distance of their source — corpus grows, dup density doesn't), then
measures at each scale:

- ``edit_distance_pairs`` wall time and output pairs, with the
  DEFAULT hot-gram cap and with a corpus-proportional cap
  (1% of docs) — the knob that bounds candidate volume when the gram
  distribution is scale-invariant (replication is that worst case:
  every gram's frequency grows ~Nx, so the per-gram candidate bound
  sum C(f,2) grows ~N² until the cap prunes);
- the candidate bound itself, sum over RETAINED grams of C(f,2),
  computed independently of the operator (what the verify join must
  process before dedup);
- ``hashed_features`` wall time (expected ~linear: O(tokens) explode,
  <= dim rows per doc after the partial agg).

Usage: python scripts/fuzzy_scale_probe.py [sf_dir] [scales...]

HISTORICAL (r8): arbitrated PassJoin vs q-gram blocking for
edit_distance_pairs (PassJoin won, 18x). Superseded for exponents by
scale_probe.py; re-run only if the fuzzy blocking scheme changes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.operators.dedup import edit_distance_pairs
from level_mapreduce_spark.operators.text import hashed_features
from level_mapreduce_spark.sources.tables import load_table


def replicate(docs, n: int, n_docs: int):
    """n perturbed copies: doc_id shifted per replica, text prefixed
    with a replica-distinct md5-derived 12-char token — pairwise
    edit distance between any two replica prefixes far exceeds
    max_dist (sequential counters would differ by ONE digit and plant
    quadratic near-dup cliques), so corpus grows Nx while dup density
    stays the base corpus's."""
    import hashlib

    reps = [
        docs.select(
            (F.col("doc_id") + r * n_docs).alias("doc_id"),
            (
                F.concat(
                    F.lit(
                        hashlib.md5(f"rep{r}".encode()).hexdigest()[:12]
                        + " "
                    ),
                    F.col("text"),
                )
                if r
                else F.col("text")
            ).alias("text"),
        )
        for r in range(n)
    ]
    out = reps[0]
    for d in reps[1:]:
        out = out.unionByName(d)
    return out


def candidate_bound(titles, q: int = 2, cap: int = 100_000) -> int:
    """sum over retained grams of C(freq, 2) — the verify join's
    pre-dedup input volume."""
    s = F.lower(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (q - 1), F.lit(1))),
        lambda i: s.substr(i, F.lit(q)),
    )
    freqs = (
        titles.select(F.explode(F.array_distinct(grams)).alias("g"))
        .groupBy("g")
        .count()
        .where(F.col("count") <= cap)
    )
    row = freqs.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("b")
    ).first()
    return int(row["b"] or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scales = [int(a) for a in sys.argv[2:]] or [1, 5, 10, 20]
    spark = get_spark(app_name="fuzzy-scale-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()

    print(f"base corpus: {n_docs} docs ({sf_dir})")
    print(
        f"{'scale':>5} {'docs':>7} {'cap':>7} {'bound':>12} "
        f"{'pairs':>7} {'fuzzy_s':>8} {'hashed_s':>9}"
    )
    hashed_features(docs).foreach(lambda r: None)  # JIT/codegen warmup
    for n in scales:
        corpus = replicate(docs, n, n_docs).persist()
        total = corpus.count()
        titles = corpus.select(
            "doc_id", F.substring(F.lower("text"), 1, 40).alias("text")
        )
        t1 = time.time()
        hashed_features(corpus).foreach(lambda r: None)
        ht = time.time() - t1
        for cap in (100_000, max(50, total // 10)):
            bound = candidate_bound(titles, cap=cap)
            if bound > 200_000_000:
                print(
                    f"{n:>5} {total:>7} {cap:>7} {bound:>12} "
                    f"{'skip':>7} {'(bound)':>8} {ht:>9.2f}"
                )
                continue
            t0 = time.time()
            pairs = edit_distance_pairs(
                titles, max_dist=3, max_gram_freq=cap
            ).count()
            dt = time.time() - t0
            print(
                f"{n:>5} {total:>7} {cap:>7} {bound:>12} "
                f"{pairs:>7} {dt:>8.2f} {ht:>9.2f}"
            )
        corpus.unpersist()


if __name__ == "__main__":
    main()
