"""Training-data export: deterministic global shuffle + sharded write.

The last step of a training-data pipeline is materializing the curated
corpus in the order the trainer will consume it. Two requirements pull
against each other at 100 TB:

- the order must be a good GLOBAL shuffle (documents from one source
  file must not cluster — a model trained on source-ordered data sees
  non-stationary batches);
- nothing may depend on a physical global sort of the corpus, and the
  result must be REPRODUCIBLE (a re-run of the export for the same
  seed must feed the trainer identical shards in identical order).

Both fall out of hashing: ``shuffle_key = xxhash64(doc_id, seed)`` is
a deterministic pseudo-random permutation key, shard =
``pmod(shuffle_key, n_shards)`` balances shards to corpus_size /
n_shards (+-sqrt) with no skew by construction, and within-shard order
by the same key is the shuffled read order. The only data movement is
one hash repartition; writing is embarrassingly parallel per shard.
Changing the seed reshuffles everything — epoch-wise reshuffles are
per-seed exports (or per-seed reads of the shard column, no rewrite).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffled_shards(
    docs: DataFrame,
    n_shards: int | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document a shard and a within-shard shuffle rank:
    ``(*input columns, shard, shuffle_key)``.

    Deterministic for a given (corpus, seed): shard membership and the
    within-shard order are pure functions of ``(id, seed)``. Reading a
    shard ordered by ``shuffle_key`` yields a uniformly shuffled
    stream; the concatenation over shards 0..n-1 is the canonical
    epoch order.
    """
    if n_shards is None:
        n_shards = docs.sparkSession.sparkContext.defaultParallelism
    key = F.xxhash64(F.col(id_col).cast("long"), F.lit(seed))
    return docs.withColumn("shuffle_key", key).withColumn(
        "shard", F.pmod(F.col("shuffle_key"), F.lit(n_shards)).cast("int")
    )


def write_shuffled(
    docs: DataFrame,
    path: str,
    n_shards: int | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> dict:
    """Materialize the shuffled export: one Parquet partition directory
    per shard (``shard=N/``), rows within each file sorted by
    ``shuffle_key`` so a sequential reader of a shard consumes the
    shuffled order with zero read-time sorting.

    Plan shape: one hash repartition on ``shard`` (each output task
    owns whole shards — no cross-task file interleaving), a
    within-partition sort (no global sort), and a partitioned write.
    Re-running with the same seed reproduces byte-identical row order
    per shard. Returns (and writes as ``_MANIFEST.json``) a manifest
    of per-shard row counts + order-sensitive content hashes.
    """
    sharded = shuffled_shards(docs, n_shards=n_shards, seed=seed, id_col=id_col)
    n = n_shards or docs.sparkSession.sparkContext.defaultParallelism
    (
        sharded.repartition(n, "shard")
        .sortWithinPartitions("shard", "shuffle_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # Manifest: per-shard row counts + an order-sensitive content hash
    # (the trainer-side integrity check: a re-export, a partial copy,
    # or a shard served out of order is detectable without re-reading
    # the corpus). Reading back ALSO verifies the write is complete
    # and parseable. The hash must be computable with BOUNDED memory:
    # at 100 TB a shard's key stream is gigabytes, so it can never be
    # collected into one aggregation buffer. Instead each row is
    # ranked within its shard's canonical order (window row_number —
    # sort-based, spills) and the shard hash is a commutative XOR fold
    # of xxhash64(rank, shuffle_key, id): order-sensitivity lives in
    # the rank baked into every per-row hash, while the fold itself is
    # O(1) state per shard. Any reorder permutes the rank assignment
    # and flips the fold with overwhelming probability.
    from pyspark.sql import Window

    written = docs.sparkSession.read.parquet(path)
    w = Window.partitionBy("shard").orderBy("shuffle_key", id_col)
    mani_rows = (
        written.withColumn("_rank", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor(
                F.xxhash64("_rank", "shuffle_key", F.col(id_col))
            ).alias("content_hash"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "seed": seed,
        "n_shards": int(n),
        "total_rows": int(sum(r["rows"] for r in mani_rows)),
        "shards": {
            int(r["shard"]): {
                "rows": int(r["rows"]),
                "content_hash": int(r["content_hash"]),
            }
            for r in mani_rows
        },
    }
    fs_path = path.rstrip("/") + "/_MANIFEST.json"
    jvm = docs.sparkSession._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(fs_path)
    fs = hpath.getFileSystem(
        docs.sparkSession._jsc.hadoopConfiguration()
    )
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(manifest, sort_keys=True).encode()))
    finally:
        out.close()
    return manifest


def read_shuffled(spark, path: str) -> DataFrame:
    """Read a :func:`write_shuffled` export in its canonical epoch
    order (shard asc, shuffle_key asc) — what a sequential trainer
    consumes. The orderBy prunes to a per-shard merge (files are
    already internally sorted); for distributed consumption read the
    ``shard=N`` directories directly and skip the global order."""
    return spark.read.parquet(path).orderBy("shard", "shuffle_key")
