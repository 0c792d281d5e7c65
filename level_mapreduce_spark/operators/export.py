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
    # Manifest: per-shard row counts + a PHYSICALLY order-sensitive
    # content hash (the trainer-side integrity check: a re-export, a
    # partial copy, or a shard stored/served out of order is
    # detectable without re-reading the corpus). The per-row rank
    # comes from ``_metadata.row_index`` — the row's ACTUAL position
    # in its shard file — not from re-sorting (a recomputed canonical
    # rank would hash a reordered file identically; r9 review). The
    # fold is a commutative XOR of xxhash64(row_index, shuffle_key,
    # id): O(1) aggregation state per shard (at 100 TB a shard's key
    # stream can never be collected into one buffer), with
    # order-sensitivity baked into every per-row hash. Reading back
    # ALSO verifies the write is complete and parseable, and the
    # writer asserts the one-file-per-shard layout the row_index
    # ranking relies on (repartition(n, shard) gives each shard one
    # writing task).
    mani_rows = _shard_hashes(docs.sparkSession, path, id_col)
    bad = [r for r in mani_rows if r["n_files"] != 1]
    if bad:
        raise IOError(
            f"write_shuffled: shards {[int(r['shard']) for r in bad]} "
            "landed in more than one file — the physical-order hash "
            "is only defined for the one-file-per-shard layout"
        )
    manifest = {
        "seed": seed,
        "n_shards": int(n),
        "id_col": id_col,
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


def _shard_hashes(spark, path: str, id_col: str):
    """Per-shard (rows, content_hash, n_files) from the PHYSICAL file
    order: hash fold of xxhash64(_metadata.row_index, shuffle_key,
    id). Shared by the writer (manifest) and :func:`verify_shuffled`
    (recompute + compare)."""
    written = spark.read.parquet(path).select(
        "shard",
        F.col("_metadata.file_path").alias("_file"),
        F.xxhash64(
            F.col("_metadata.row_index"),
            F.col("shuffle_key"),
            F.col(id_col),
        ).alias("_h"),
    )
    return (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.bit_xor("_h").alias("content_hash"),
            F.count_distinct("_file").alias("n_files"),
        )
        .orderBy("shard")
        .collect()
    )


def read_manifest(spark, path: str) -> dict:
    """The ``_MANIFEST.json`` a :func:`write_shuffled` export wrote
    (Hadoop FS read — works on HDFS/object stores)."""
    fs_path = path.rstrip("/") + "/_MANIFEST.json"
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(fs_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(hpath)
    bos = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, bos, 4096, True)
    return json.loads(bytes(bos.toByteArray()).decode("utf-8"))


def verify_shuffled(spark, path: str) -> dict:
    """Trainer-side integrity verifier: recompute every shard's
    physical-order hash and row count and compare against the
    manifest. Returns ``{"ok": bool, "mismatches": [...]}`` where
    each mismatch names the shard and what diverged (missing shard,
    row count, content/order hash, or a multi-file shard whose
    physical order is undefined). One aggregation pass over the
    export — no sort, no collect beyond O(shards)."""
    mani = read_manifest(spark, path)
    got = {
        int(r["shard"]): r
        for r in _shard_hashes(spark, path, mani["id_col"])
    }
    mismatches = []
    for shard, want in mani["shards"].items():
        shard = int(shard)
        r = got.pop(shard, None)
        if r is None:
            mismatches.append({"shard": shard, "error": "missing"})
        elif r["n_files"] != 1:
            mismatches.append(
                {"shard": shard, "error": f"{r['n_files']} files"}
            )
        elif int(r["rows"]) != want["rows"]:
            mismatches.append(
                {
                    "shard": shard,
                    "error": f"rows {r['rows']} != {want['rows']}",
                }
            )
        elif int(r["content_hash"]) != want["content_hash"]:
            mismatches.append(
                {"shard": shard, "error": "content/order hash mismatch"}
            )
    for shard in got:
        mismatches.append({"shard": shard, "error": "unexpected shard"})
    return {"ok": not mismatches, "mismatches": mismatches}


def read_shuffled(spark, path: str) -> DataFrame:
    """Read a :func:`write_shuffled` export in its canonical epoch
    order (shard asc, shuffle_key asc) — what a sequential trainer
    consumes. The orderBy prunes to a per-shard merge (files are
    already internally sorted); for distributed consumption read the
    ``shard=N`` directories directly and skip the global order."""
    return spark.read.parquet(path).orderBy("shard", "shuffle_key")
