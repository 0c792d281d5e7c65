"""End-to-end training-data pipeline composition — the capstone check
that the governance operators CHAIN: every stage consumes the previous
stage's schema, the whole flow stays JVM-side except where documented,
and each stage only ever shrinks (or re-shards) the corpus.

clean (PII scrub -> C4 line filter -> intra-doc line dedup)
  -> exact dedup -> near-dup clusters -> quality filter
  -> decontaminate -> deterministic split -> stratified sample
  -> sequence packing

This is the pipeline a 100 TB pretraining corpus actually runs; at
scale every stage here is a narrow transform or a single bucketed
shuffle, so the composition inherits those bounds.
"""

import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark.operators.dedup import (
    decontaminate,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_clusters,
)
from level_mapreduce_spark.operators.text import (
    c4_line_filter,
    dedup_lines,
    mixture_rates,
    pack_documents,
    quality_filter,
    sample_by_key,
    scrub_pii,
    split_dataset,
)
from level_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_full_corpus_pipeline_composes(spark, docs):
    n0 = docs.count()

    # --- stage 1: in-place cleaning (all narrow, zero shuffle) -------
    cleaned = scrub_pii(docs).select(
        "doc_id", "lang", "source",
        F.col("scrubbed_text").alias("text"),
    )
    cleaned = (
        cleaned.drop("text")
        .join(
            dedup_lines(cleaned).select(
                "doc_id", F.col("deduped_text").alias("text")
            ),
            "doc_id",
        )
    )
    # C4 flags compose schema-wise; its keep-gate is calibrated for
    # web text (lines ending in punctuation) and correctly rejects
    # this punctuation-free synthetic corpus, so here it rides as
    # metadata and the quality gate below does the dropping
    c4 = c4_line_filter(cleaned)
    assert c4.where("keep").count() == 0
    cleaned = cleaned.join(
        c4.select("doc_id", F.col("keep").alias("c4_keep")), "doc_id"
    )
    n1 = cleaned.count()
    assert 0 < n1 <= n0

    # --- stage 2: dedup (exact survivors, then near-dup reps) --------
    survivors = exact_dedup(cleaned).select(
        F.col("result").alias("doc_id")
    )
    deduped = cleaned.join(survivors, "doc_id")
    pairs = minhash_lsh_pairs(deduped, threshold=0.7, rows_per_band=1)
    reps = neardup_clusters(deduped, pairs=pairs).where("keep").select(
        "doc_id"
    )
    deduped = deduped.join(reps, "doc_id")
    n2 = deduped.count()
    assert 0 < n2 <= n1

    # --- stage 3: quality + decontamination --------------------------
    good = quality_filter(deduped).where("keep").select("doc_id")
    quality = deduped.join(good, "doc_id")
    probes = docs.limit(3).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    clean = decontaminate(quality, probes, k=8)
    n3 = clean.count()
    assert 0 < n3 <= n2

    # --- stage 4: split + mixture sampling ---------------------------
    split = split_dataset(clean, {"train": 0.9, "val": 0.1})
    train = split.where("split = 'train'")
    rates = mixture_rates(train, {"en": 0.6, "fr": 0.4})
    sampled = sample_by_key(train, rates, default_rate=0.0).where(
        "sampled"
    )
    n4 = sampled.count()
    assert 0 < n4 <= n3
    assert set(
        r["lang"] for r in sampled.select("lang").distinct().collect()
    ) <= {"en", "fr"}

    # --- stage 5: packing for the trainer ----------------------------
    packed = pack_documents(sampled, budget=2048, n_shards=4)
    assert packed.count() == n4
    assert {"doc_id", "shard", "n_tokens", "pack_id"} <= set(
        packed.columns
    )
    # every pack is addressable and respects its shard
    assert (
        packed.groupBy("shard", "pack_id").count().where("count < 1").count()
        == 0
    )

    # the funnel narrowed monotonically and kept real data
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0


def test_text_to_stored_ann_pipeline(spark, docs, tmp_path):
    """Model-free semantic-dedup composition: documents vectorize via
    the hashing trick, the vectors build a stored IVFPQ index, and
    probing with a planted near-duplicate's vector surfaces its
    source — text in, compressed stored ANN out, no Python UDF in the
    vectorize path and 8-byte codes in the store."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )
    from level_mapreduce_spark.operators.text import hashed_features

    base = docs.limit(60)
    # planted near-duplicate: same text with a tiny suffix tweak
    dup = base.limit(1).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(dup)
    vecs = hashed_features(corpus, dim=64).persist()
    assert vecs.count() == 61

    idx, cents, books = build_ivfpq_index(
        spark, vecs, str(tmp_path / "text_ann"), n_centroids=4
    )
    src_id = base.limit(1).collect()[0]["doc_id"]
    probe = [
        float(v)
        for v in vecs.where(F.col("vec_id") == src_id + 500000)
        .collect()[0]["embedding"]
    ]
    top = ivfpq_topk_from_index(idx, cents, books, probe, k=3, nprobe=2)
    top_ids = {r["vec_id"] for r in top.collect()}
    assert {src_id, src_id + 500000} <= top_ids
    vecs.unpersist()


def test_text_to_batched_ann_pipeline(spark, docs, tmp_path):
    """The batch form of the semantic-dedup composition, through a
    RELOADED index handle: vectorize, store, reopen from the sidecar
    in a fresh handle (build job vs serve job), then resolve FIVE
    planted near-duplicates in ONE ivfpq_knn_join — each probe's
    top-k contains its own source. The whole serve side is a single
    distributed plan: no per-probe driver loop."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_knn_join,
        load_ivfpq_index,
    )
    from level_mapreduce_spark.operators.text import hashed_features

    base = docs.limit(60)
    dups = base.limit(5).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(dups)
    vecs = hashed_features(corpus, dim=64).persist()
    store = str(tmp_path / "batch_ann")
    build_ivfpq_index(spark, vecs, store, n_centroids=4, residual=True)

    idx, cents, books = load_ivfpq_index(spark, store)
    src_ids = [r["doc_id"] for r in base.limit(5).collect()]
    probes = vecs.where(
        F.col("vec_id").isin([i + 500000 for i in src_ids])
    ).select(F.col("vec_id").cast("long").alias("probe_id"), "embedding")
    got = {}
    for r in ivfpq_knn_join(
        idx, cents, books, probes, k=3, nprobe=2
    ).collect():
        got.setdefault(r["probe_id"], set()).add(r["vec_id"])
    assert len(got) == 5
    for sid in src_ids:
        assert {sid, sid + 500000} <= got[sid + 500000], (sid, got)
    vecs.unpersist()
