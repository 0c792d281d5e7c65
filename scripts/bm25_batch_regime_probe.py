"""bm25_batch_from_index regime crossover probe (VERDICT r15 #4).

The batch BM25 serve has two regimes around ``terms_in_max``
(operators/text.py): at or below, the union of the probe queries'
distinct terms becomes ONE pushed literal In over the T#/DF# keys;
above, the terms stay distributed and the T#/DF# slices are broadcast
semi-joined against them (full-slice columnar scan, no driver term
list, no O(terms) plan nodes). Results are identical either side —
this probe measures WHERE the cost curves cross so the default
threshold is a measured choice, not a guess.

Method: build a postings index on the sf documents, then for probe
sets of increasing distinct-term width, time the serve with each
regime FORCED (``terms_in_max`` huge -> literal In; 0 -> semi-join),
min-of-2 through the noop sink. Prints one JSON line per
(width, regime) and a summary with the crossover width.

Usage:
    python scripts/bm25_batch_regime_probe.py [sf_dir] [widths]
    # widths: comma list of distinct-term targets, default
    # 64,256,512,1024,2048,4096
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

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.sources.tables import load_table


def _timed(fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0) if best else time.time() - t0
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    widths = (
        [int(w) for w in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [64, 256, 512, 1024, 2048, 4096]
    )
    spark = get_spark(app_name="bm25-regime-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from level_mapreduce_spark.operators.text import (
        bm25_batch_from_index,
        build_postings_index,
        tokens_expr,
    )

    store = tempfile.mkdtemp(prefix="lmr_bm25_regime_")
    try:
        # the testdata documents have a ~31-token vocabulary (too
        # narrow to cross any regime threshold), so the probe corpus
        # is synthetic: same row count as the sf documents table, 30
        # Zipf-ish tokens per doc from a 50k-term vocabulary (xxhash
        # mixed, squared to skew toward low term ids so
        # frequency-ranked probe slices hit real posting lists)
        n_docs = load_table(spark, sf_dir, "documents").count()
        V = 50_000
        tok = lambda i: F.concat(  # noqa: E731
            F.lit("w"),
            (
                F.pow(
                    (F.xxhash64(F.col("doc_id"), F.lit(i)) % 100_000
                     + 100_000) % 100_000 / 100_000.0,
                    2.0,
                )
                * V
            ).cast("long").cast("string"),
        )
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[tok(i) for i in range(30)]).alias("text"),
        )
        idx = build_postings_index(spark, docs, store, name="regime_probe")

        # the corpus vocabulary, frequency-ranked: probe sets are term
        # SLICES so each width hits exactly that many distinct T# keys
        vocab = [
            r["term"]
            for r in docs.select(F.explode(tokens_expr("text")).alias("term"))
            .groupBy("term")
            .count()
            .orderBy(F.col("count").desc(), "term")
            .limit(max(widths))
            .collect()
        ]
        print(
            json.dumps({"vocab_terms": len(vocab), "sf_dir": sf_dir}),
            flush=True,
        )

        results = []
        for width in widths:
            if width > len(vocab):
                print(
                    json.dumps(
                        {"width": width, "skipped": "vocab smaller"}
                    ),
                    flush=True,
                )
                continue
            # 8 terms per query -> width/8 queries, all terms distinct
            terms = vocab[:width]
            rows = [
                (i, " ".join(terms[i * 8 : (i + 1) * 8]))
                for i in range(width // 8)
            ]
            queries = spark.createDataFrame(
                rows, "query_id long, text string"
            ).localCheckpoint(eager=True)
            for regime, cap in (("literal_in", 1 << 30), ("semi_join", 0)):
                sec = _timed(
                    lambda: bm25_batch_from_index(
                        idx, queries, k=10, terms_in_max=cap
                    )
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                rec = {"width": width, "regime": regime, "sec": sec}
                results.append(rec)
                print(json.dumps(rec), flush=True)

        # crossover: first width where semi_join beats literal_in
        by_w: dict[int, dict[str, float]] = {}
        for r in results:
            by_w.setdefault(r["width"], {})[r["regime"]] = r["sec"]
        crossover = next(
            (
                w
                for w in sorted(by_w)
                if by_w[w].get("semi_join", 9e9)
                < by_w[w].get("literal_in", 9e9)
            ),
            None,
        )
        print(
            json.dumps({"summary": "bm25_batch_regime", "crossover_width": crossover,
                        "curve": {str(w): by_w[w] for w in sorted(by_w)}}),
            flush=True,
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
