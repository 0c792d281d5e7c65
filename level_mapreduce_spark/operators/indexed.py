"""Index-backed dedup and ANN: the LSH bucket key IS a MapIndex key.

Routing the bucket inverted indexes through :class:`MapIndex` instead
of ad-hoc DataFrames buys, for free, everything the engine already
guarantees for stored maps:

- **incremental maintenance** — adding/overwriting/tombstoning a
  document updates only its own band rows (O(changed docs), reference
  meta-index semantics), so near-dup detection over a growing corpus
  never recomputes old signatures;
- **sorted, range-partitioned persistence** — probing a bucket is a
  pushed-down key lookup, not a scan;
- **chaining/streaming** — the band index can sit downstream of a
  `foreachBatch` change feed like any other index.

This is the 100 TB shape: signatures are computed once per document
*when it arrives*, and candidate generation is an equality join on the
stored bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark.engine.family import StoredIndexFamily
from level_mapreduce_spark.engine.index import MapIndex
from level_mapreduce_spark.engine.mapper import ExprMapper, Mapper, pairs_type
from level_mapreduce_spark.functions.litarr import (
    lit_doubles,
    lit_doubles_2d,
    lit_doubles_3d,
)
from level_mapreduce_spark.operators.dedup import (
    band_keys,
    minhash_from_hashes,
)
from level_mapreduce_spark.operators.similarity import (
    bucket_expr,
    cosine_sim,
    hyperplanes,
)
from level_mapreduce_spark.operators.text import (
    shingles_from_tokens,
    tokens_expr,
)

# Codebook size (total doubles, m*k*dsub) above which the column ADC
# scorer switches from a staged literal to broadcast codebook-table
# joins: the default m=8, k=64, dsub=8 geometry (4096) stays literal;
# FAISS-standard k=256 (16384) takes the broadcast path. See the fork
# comment in ivfpq_knn_join.
_PQ_LITERAL_MAX_DOUBLES = 8192


def minhash_band_mapper(k: int = 5, rows_per_band: int = 2) -> ExprMapper:
    """Map fn emitting one (band_key, doc_id) pair per LSH band — the
    inverted bucket index as a stored map.

    Tokens, shingle hashes, and the signature are ExprMapper ``stages``
    (materialized columns): band_keys slices the signature once per
    band and each minhash lambda iterates the shingle hashes — inlined,
    the whole tokenize+hash chain would re-run ~(bands × hashes) times
    per document."""
    return ExprMapper(
        # docs with NO shingles (shorter than k tokens) emit NOTHING:
        # signing them would give every such doc the identical
        # all-sentinel signature, colliding them into one mega-bucket
        # in every band — O(n_short²) candidates and 0/0 jaccard at
        # verify. No shingles = no content to near-dup on.
        F.when(
            F.size("_shh") > 0,
            F.transform(
                band_keys(F.col("_sig"), rows_per_band),
                lambda bk: F.struct(
                    bk.alias("index_key"),
                    F.col("doc_id").cast("long").alias("value"),
                ),
            ),
        ),
        value_type=T.LongType(),
        stages={
            "_toks": tokens_expr("text"),
            "_shh": F.transform(
                shingles_from_tokens(F.col("_toks"), k=k),
                lambda s: F.xxhash64(s),
            ),
            "_sig": minhash_from_hashes(F.col("_shh")),
        },
    )


def _band_attach(idx, meta) -> None:
    idx.band_k, idx.band_rows_per_band = meta["k"], meta["rows_per_band"]


#: the signature params persist beside the segments: an update() in a
#: fresh session must band with the SAME shingle width and band
#: geometry, or new docs' buckets silently never collide with stored
#: ones
_BAND_FAMILY = StoredIndexFamily(
    kind="band",
    sidecar="band.json",
    doc_key="doc_id",
    mapper_for=lambda meta: minhash_band_mapper(
        meta["k"], meta["rows_per_band"]
    ),
    builder_name="build_band_index",
    attach=_band_attach,
)


def build_band_index(
    spark: SparkSession,
    docs: DataFrame,
    store: str,
    name: str = "minhash_bands",
    k: int = 5,
    rows_per_band: int = 2,
) -> MapIndex:
    return _BAND_FAMILY.create(
        spark, docs, store, name, {"k": k, "rows_per_band": rows_per_band}
    )


def load_band_index(
    spark: SparkSession, store: str, name: str = "minhash_bands"
) -> MapIndex:
    """Reopen a stored band index with the persisted signature params
    (shingle k, rows per band) — incremental update() and
    lsh_pairs_from_index in a fresh session then use geometry that
    matches the stored buckets."""
    return _BAND_FAMILY.load(spark, store, name)


def lsh_pairs_from_index(
    band_index: MapIndex,
    docs: DataFrame,
    threshold: float = 0.7,
    k: int | None = None,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-dup pairs from a stored band index: candidates = self-join
    of the persisted buckets, verification = exact Jaccard on shingle
    sets recomputed from the candidate docs only (not the corpus).
    The verify shingle width ``k`` resolves from the handle/sidecar
    (the width the signatures were built with) unless passed."""
    if k is None:
        k = getattr(band_index, "band_k", None)
        if k is None:
            meta = band_index.get_sidecar(name="band.json")
            k = meta["k"] if meta else 5
    buckets = band_index.read().select(
        F.col("index_key").alias("bkey"), F.col("value").alias("doc_id")
    )
    sizes = buckets.groupBy("bkey").agg(F.count("*").alias("_n"))
    buckets = buckets.join(sizes.where(F.col("_n") <= max_bucket), "bkey")
    cands = (
        buckets.alias("x")
        .join(buckets.alias("y"), "bkey")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select("doc_b"))
        .distinct()
    )
    sh = (
        docs.join(
            cand_docs,
            docs["doc_id"].cast("long") == cand_docs["doc_id"],
            "left_semi",
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            tokens_expr("text").alias("_toks"),
        )
        .select(
            "doc_id",
            F.transform(
                shingles_from_tokens(F.col("_toks"), k=k),
                lambda s: F.xxhash64(s),
            ).alias("_shh"),
        )
        .withColumn("_n", F.size("_shh"))
    )
    verified = (
        cands.join(
            sh.select(
                F.col("doc_id").alias("doc_a"),
                F.col("_shh").alias("_sha"),
                F.col("_n").alias("_na"),
            ),
            "doc_a",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("doc_b"),
                F.col("_shh").alias("_shb"),
                F.col("_n").alias("_nb"),
            ),
            "doc_b",
        )
        .withColumn("_inter", F.size(F.array_intersect("_sha", "_shb")))
        .withColumn(
            "jaccard",
            # empty docs no longer reach the buckets (mapper guard),
            # but a stale docs frame could still verify one: 0/0 under
            # the session's default ANSI mode would crash — null it
            # (the threshold filter then drops the pair)
            F.when(
                (F.col("_na") + F.col("_nb") - F.col("_inter")) > 0,
                F.round(
                    F.col("_inter")
                    / (F.col("_na") + F.col("_nb") - F.col("_inter")),
                    6,
                ),
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def ivf_mapper(centroids: list[list[float]]) -> ExprMapper:
    """Map fn emitting one (list_id, vec_id) pair — the IVF inverted
    list as a stored map (one emit per vector; compare the multi-table
    LSH mapper's n_tables emits)."""
    from level_mapreduce_spark.operators.ivf import assign_expr

    return ExprMapper(
        F.array(
            F.struct(
                F.col("_list").cast("string").alias("index_key"),
                F.col("vec_id").cast("long").alias("value"),
            )
        ),
        value_type=T.LongType(),
        stages={
            "_list": assign_expr(
                F.col("embedding").cast("array<double>"), centroids
            )
        },
    )


def build_ivf_index(
    spark: SparkSession,
    embeddings: DataFrame,
    store: str,
    name: str = "ivf_lists",
    n_centroids: int = 16,
    seed: int = 42,
) -> tuple[MapIndex, list[list[float]]]:
    """Train the codebook on a sample, store assignments as a MapIndex.
    Incremental: new vectors assign against the frozen codebook via
    ``update()`` — standard IVF practice (codebooks are retrained
    rarely, off the write path)."""
    from level_mapreduce_spark.operators.ivf import train_centroids

    centroids = train_centroids(
        embeddings, n_centroids=n_centroids, seed=seed
    )
    idx = _IVF_FAMILY.create(
        spark, embeddings, store, name, {"centroids": centroids}
    )
    return idx, centroids


_IVF_FAMILY = StoredIndexFamily(
    kind="ivf",
    sidecar="ivf.json",
    doc_key="vec_id",
    mapper_for=lambda meta: ivf_mapper(meta["centroids"]),
    builder_name="build_ivf_index",
    label="IVF",
    attach=lambda idx, meta: setattr(
        idx, "ivf_centroids", meta["centroids"]
    ),
)


def load_ivf_index(
    spark: SparkSession, store: str, name: str = "ivf_lists"
) -> tuple[MapIndex, list[list[float]]]:
    """Reopen a stored IVF index with the persisted codebook: probes
    and incremental assignment in a fresh session use the SAME frozen
    centroids the stored lists were routed by."""
    idx = _IVF_FAMILY.load(spark, store, name)
    return idx, idx.ivf_centroids


def ivf_topk_from_index(
    ivf_index: MapIndex,
    centroids: list[list[float]],
    embeddings: DataFrame,
    probe: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the stored inverted lists: candidates = a pushed-down key
    lookup on the nprobe nearest list ids, then exact cosine rerank of
    candidates only."""

    def score(c):
        dot = sum(p * v for p, v in zip(probe, c))
        return dot - sum(v * v for v in c) / 2.0

    ranked = sorted(range(len(centroids)), key=lambda j: -score(centroids[j]))
    wanted = [str(j) for j in ranked[: max(1, nprobe)]]
    cand_ids = (
        ivf_index.read()
        .where(F.col("index_key").isin(wanted))
        .select(F.col("value").alias("vec_id"))
    )
    probe_lit = lit_doubles(probe)
    return (
        embeddings.join(
            F.broadcast(cand_ids),
            embeddings["vec_id"].cast("long") == cand_ids["vec_id"],
            "left_semi",
        )
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round(cosine_sim(F.col("embedding"), probe_lit), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ann_bucket_mapper(
    dim: int, n_bits: int = 6, n_tables: int = 8, seed: int = 42
) -> ExprMapper:
    """Map fn emitting one (table:bucket, vec_id) pair per hash table."""
    pairs = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_bits=n_bits, seed=seed + 1000 * t)
        bucket = bucket_expr(F.col("embedding"), planes)
        pairs.append(
            F.struct(
                F.concat_ws(":", F.lit(str(t)), bucket.cast("string")).alias(
                    "index_key"
                ),
                F.col("vec_id").cast("long").alias("value"),
            )
        )
    return ExprMapper(F.array(*pairs), value_type=T.LongType())


def build_ann_index(
    spark: SparkSession,
    embeddings: DataFrame,
    store: str,
    name: str = "ann_buckets",
    n_bits: int = 6,
    n_tables: int = 8,
    seed: int = 42,
) -> MapIndex:
    dim = len(embeddings.select("embedding").head()[0])
    # the hash geometry persists beside the segments: hyperplanes are
    # seed-deterministic, so (dim, n_bits, n_tables, seed) fully
    # reconstructs the tables — a probe or update with different
    # params addresses buckets the stored index never wrote
    return _ANN_FAMILY.create(
        spark,
        embeddings,
        store,
        name,
        {"dim": dim, "n_bits": n_bits, "n_tables": n_tables, "seed": seed},
        repartition_key=None,
    )


_ANN_FAMILY = StoredIndexFamily(
    kind="ann_lsh",
    sidecar="ann.json",
    doc_key="vec_id",
    mapper_for=lambda meta: ann_bucket_mapper(
        meta["dim"], meta["n_bits"], meta["n_tables"], meta["seed"]
    ),
    builder_name="build_ann_index",
    label="ANN",
    attach=lambda idx, meta: setattr(
        idx, "ann_params", (meta["n_bits"], meta["n_tables"], meta["seed"])
    ),
)


def load_ann_index(
    spark: SparkSession, store: str, name: str = "ann_buckets"
) -> MapIndex:
    """Reopen a stored sign-LSH bucket index with the persisted hash
    geometry, so probes and incremental update() in a fresh session
    address the same buckets."""
    return _ANN_FAMILY.load(spark, store, name)


def ann_topk_from_index(
    ann_index: MapIndex,
    embeddings: DataFrame,
    probe: list[float],
    k: int = 10,
    n_bits: int | None = None,
    n_tables: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Probe the stored bucket index: candidate vec_ids come from a
    pushed-down key lookup over (table:bucket) keys within hamming
    distance 1 of the probe's buckets; exact cosine rerank follows.

    Hash geometry resolves from the handle (set by build/load) or the
    persisted sidecar unless explicitly passed — probing with the
    wrong geometry addresses buckets the index never wrote and
    silently returns near-empty candidates."""
    if n_bits is None or n_tables is None or seed is None:
        params = getattr(ann_index, "ann_params", None)
        if params is None:
            meta = ann_index.get_sidecar(name="ann.json")
            if meta is None:
                raise ValueError(
                    f"cannot resolve hash geometry for {ann_index.name}: "
                    "pass n_bits/n_tables/seed or reopen with "
                    "load_ann_index()"
                )
            params = (meta["n_bits"], meta["n_tables"], meta["seed"])
        n_bits, n_tables, seed = params
    wanted = []
    for t in range(n_tables):
        planes = hyperplanes(len(probe), n_bits=n_bits, seed=seed + 1000 * t)
        pb = 0
        for j, plane in enumerate(planes):
            if sum(x * y for x, y in zip(probe, plane)) > 0:
                pb |= 1 << j
        for bucket in [pb] + [pb ^ (1 << j) for j in range(n_bits)]:
            wanted.append(f"{t}:{bucket}")
    cand_ids = (
        ann_index.read()
        .where(F.col("index_key").isin(wanted))
        .select(F.col("value").alias("vec_id"))
        .distinct()
    )
    probe_lit = lit_doubles(probe)
    return (
        embeddings.join(
            F.broadcast(cand_ids),
            embeddings["vec_id"].cast("long") == cand_ids["vec_id"],
            "left_semi",
        )
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.round(cosine_sim(F.col("embedding"), probe_lit), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def ivfpq_mapper(
    centroids: list[list[float]], codebooks: list, residual: bool = False
) -> ExprMapper:
    """Map fn emitting one (list_id, pq_codes) pair per vector: the
    stored IVFPQ cell — coarse list id as the sorted index key, the
    8-byte PQ code vector as the value. Both the routing assignment
    and the code quantization are pure Column HOFs (the engine's
    write-path rule), so incremental ``update()`` re-encodes ONLY
    changed vectors against the frozen codebooks.

    ``residual=True`` quantizes ``x - centroid(x)`` instead of ``x``
    (the standard FAISS IVFPQ encoding — pair with codebooks from
    ``pq.train_pq_residual`` and the per-list-LUT scorer)."""
    from level_mapreduce_spark.operators.ivf import assign_expr
    from level_mapreduce_spark.operators.pq import pq_assign_expr

    stages = {
        "_list": assign_expr(
            F.col("embedding").cast("array<double>"), centroids
        ),
    }
    if residual:
        cents_lit = lit_doubles_2d(centroids)
        stages["_res"] = F.zip_with(
            F.col("embedding").cast("array<double>"),
            F.element_at(cents_lit, F.col("_list") + 1),
            lambda x, c: x - c,
        )
        code_src = F.col("_res")
    else:
        code_src = F.col("embedding").cast("array<double>")
    stages["_codes"] = pq_assign_expr(code_src, codebooks)
    return ExprMapper(
        F.array(
            F.struct(
                F.col("_list").cast("string").alias("index_key"),
                F.col("_codes").alias("value"),
            )
        ),
        value_type=T.ArrayType(T.IntegerType()),
        stages=stages,
    )


class ArrowIvfpqMapper(Mapper):
    """Arrow-vectorized IVFPQ cell mapper — the production-k write
    path. The Column mapper (:func:`ivfpq_mapper`) realizes the
    codebooks as expression literals and the argmin as interpreted
    HOFs: at FAISS-standard k=256 that is a 16k-double literal in
    every build/update plan and O(m*k*dsub) interpreted ops per row.
    This mapper does the same math as ONE numpy batch kernel per Arrow
    batch (coarse argmax routing, optional residual subtraction,
    per-subspace argmin encode) — codebooks ride the closure, the
    plan stays flat in k, and incremental ``update()`` still touches
    only changed vectors. Same tie rule as the Column path (first
    occurrence = lowest id) and same scoring formula up to an exact
    factor-of-2 scaling, so both encoders produce identical cells on
    real data (tested on the benchmark corpus, plain + residual).
    CAVEAT: BLAS dot products round differently from the JVM's
    sequential fold, so a vector EXACTLY equidistant (to the last
    ulp) between two subspace centroids could in principle encode to
    a different code id across encoders — harmless for serving (both
    cells are equally near, and an update tombstones the old cell
    before re-emitting), but the reason mixed-encoder equality is a
    corpus-tested property, not an algebraic guarantee."""

    def __init__(
        self,
        centroids: list[list[float]],
        codebooks: list,
        residual: bool = False,
    ):
        self.centroids = [list(map(float, c)) for c in centroids]
        self.codebooks = [
            [list(map(float, r)) for r in b] for b in codebooks
        ]
        self.residual = residual
        self.value_type = T.ArrayType(T.IntegerType())

    def pairs(self, docs: DataFrame, doc_key: str = "doc_key") -> DataFrame:
        import numpy as np

        cents = np.array(self.centroids, dtype=np.float64)
        books = [np.array(b, dtype=np.float64) for b in self.codebooks]
        m = len(books)
        dsub = books[0].shape[1]
        residual = self.residual
        half_c2 = 0.5 * (cents**2).sum(axis=1)
        schema = T.StructType(
            [
                T.StructField("doc_key", T.StringType(), False),
                T.StructField("pairs", pairs_type(self.value_type), True),
            ]
        )

        def run(it):
            import pandas as pd

            for pdf in it:
                if pdf.empty:
                    continue
                x = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                lists = (x @ cents.T - half_c2[None, :]).argmax(axis=1)
                src = x - cents[lists] if residual else x
                codes = np.empty((len(x), m), dtype=np.int64)
                for j in range(m):
                    xs = src[:, j * dsub : (j + 1) * dsub]
                    codes[:, j] = (
                        (books[j] ** 2).sum(axis=1)[None, :]
                        - 2 * (xs @ books[j].T)
                    ).argmin(axis=1)
                yield pd.DataFrame(
                    {
                        "doc_key": pdf[doc_key].astype(str),
                        "pairs": [
                            [
                                {
                                    "index_key": str(int(l)),
                                    "value": [int(c) for c in row],
                                }
                            ]
                            for l, row in zip(lists, codes)
                        ],
                    }
                )

        return docs.mapInPandas(run, schema)


def _ivfpq_make_mapper(
    centroids: list, books: list, residual: bool, encoder: str
):
    """Resolve the encoder knob: 'column' (JVM literal+HOF, right for
    default k=64 geometry), 'arrow' (numpy batch kernel, right for
    production k=256), 'auto' (fork on the same codebook-size
    threshold as the ADC scorer)."""
    if encoder == "auto":
        n_doubles = len(books) * len(books[0]) * len(books[0][0])
        encoder = (
            "arrow" if n_doubles > _PQ_LITERAL_MAX_DOUBLES else "column"
        )
    if encoder == "arrow":
        return ArrowIvfpqMapper(centroids, books, residual=residual), "arrow"
    if encoder == "column":
        return ivfpq_mapper(centroids, books, residual=residual), "column"
    raise ValueError(f"unknown encoder {encoder!r}")


def build_ivfpq_index(
    spark: SparkSession,
    embeddings: DataFrame,
    store: str,
    name: str = "ivfpq_cells",
    n_centroids: int = 8,
    m: int = 8,
    k: int = 64,
    seed: int = 42,
    residual: bool = False,
    encoder: str = "auto",
):
    """Train both quantizer levels on a bounded sample, store every
    vector's (list_id -> codes) cell as a MapIndex: the on-disk IVFPQ
    structure. Probes become pushed-down key lookups over 8-byte
    codes; maintenance is O(changed vectors) through ``update()``.

    The trained centroids, codebooks, and the residual-encoding flag
    are persisted as a JSON sidecar under ``idx.root`` — at 100 TB
    build and serve are different jobs, so a fresh session must be
    able to probe (and incrementally update) the stored cells without
    retraining: see :func:`load_ivfpq_index`. Returns
    (index, centroids, codebooks)."""
    from level_mapreduce_spark.operators.ivf import (
        train_centroids,
        train_sample,
    )
    from level_mapreduce_spark.operators.pq import train_pq, train_pq_residual

    # both quantizer levels train on the SAME bounded deterministic
    # sample (identical fraction/seed/TakeOrdered by construction) —
    # collect it once and hand it to both trainers instead of paying
    # the count+collect job pair twice (r16; see ivf.train_sample)
    sample_x = train_sample(embeddings, max_train=4096, seed=seed)
    centroids = train_centroids(
        embeddings, n_centroids=n_centroids, seed=seed, sample_x=sample_x
    )
    if residual:
        books = train_pq_residual(
            embeddings, centroids, m=m, k=k, seed=seed, sample_x=sample_x
        )
    else:
        books = train_pq(embeddings, m=m, k=k, seed=seed, sample_x=sample_x)
    # resolve encoder="auto" BEFORE the sidecar write so load rebuilds
    # the exact same mapper from the persisted choice
    _, enc = _ivfpq_make_mapper(centroids, books, residual, encoder)
    idx = _IVFPQ_FAMILY.create(
        spark,
        embeddings,
        store,
        name,
        {
            "residual": residual,
            "encoder": enc,
            "centroids": centroids,
            "codebooks": [
                [list(map(float, row)) for row in b] for b in books
            ],
        },
    )
    return idx, centroids, books


_IVFPQ_SIDECAR = "ivfpq.json"

def _ivfpq_attach(idx, meta) -> None:
    idx.ivfpq_residual = bool(meta["residual"])
    idx.ivfpq_centroids = meta["centroids"]
    idx.ivfpq_codebooks = meta["codebooks"]


# the encoder default "column" covers sidecars that predate the knob
# (they were column-encoded)
_IVFPQ_FAMILY = StoredIndexFamily(
    kind="ivfpq",
    sidecar=_IVFPQ_SIDECAR,
    doc_key="vec_id",
    mapper_for=lambda meta: _ivfpq_make_mapper(
        meta["centroids"],
        meta["codebooks"],
        bool(meta["residual"]),
        meta.get("encoder", "column"),
    )[0],
    builder_name="build_ivfpq_index",
    label="IVFPQ",
    attach=_ivfpq_attach,
)


def load_ivfpq_index(spark: SparkSession, store: str, name: str = "ivfpq_cells"):
    """Reopen a stored IVFPQ index in a fresh session: reconstruct the
    mapper (so ``update()`` keeps encoding against the SAME frozen
    codebooks) and the probe metadata from the sidecar written by
    :func:`build_ivfpq_index` — no retraining, no data scan. Returns
    (index, centroids, codebooks), the same triple build returns."""
    idx = _IVFPQ_FAMILY.load(spark, store, name)
    return idx, idx.ivfpq_centroids, idx.ivfpq_codebooks


def _resolve_ivfpq_residual(idx: MapIndex) -> bool:
    """Residual flag from the handle (set by build/load) or the
    persisted sidecar — never a silent default: scoring residual codes
    with a raw-probe LUT returns silently wrong neighbors."""
    residual = getattr(idx, "ivfpq_residual", None)
    if residual is None:
        meta = idx.get_sidecar(name=_IVFPQ_SIDECAR)
        if meta is None or "residual" not in meta:
            raise ValueError(
                f"cannot tell whether {idx.name} stores residual or raw "
                "PQ codes: handle has no ivfpq_residual attribute and "
                f"no {_IVFPQ_SIDECAR} sidecar exists — reopen it with "
                "load_ivfpq_index()"
            )
        residual = bool(meta["residual"])
        idx.ivfpq_residual = residual
    return residual


def ivfpq_knn_join(
    idx: MapIndex,
    centroids: list[list[float]],
    codebooks: list,
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    probe_id: str = "probe_id",
    scorer: str = "arrow",
) -> DataFrame:
    """Batched ANN over the stored IVFPQ index: top-k approximate
    neighbors for EVERY probe row in one distributed plan —
    ``(probe_id, vec_id, adc_dist)``. The batch dual of
    :func:`ivfpq_topk_from_index` (which serves one probe per driver
    call): embedding a 10⁶-probe workload as a driver loop is 10⁶
    scheduler round-trips; here it is one join.

    Shared plan shape:

    1. route each probe to its ``nprobe`` best coarse lists with a
       HOF argsort over the centroid literal (same ranking as the
       single-probe path), residual probe staged per (probe, list);
    2. key-lookup ONLY the union of routed lists from the stored
       cells (an In filter on the sorted index key — pushed to the
       parquet scan; the driver collects at most n_centroids ids);
    3. score (probe, cell) pairs per the ``scorer`` below;
    4. global per-probe top-k through ``topk_per_key``
       (WindowGroupLimit: map-side truncation, never a global sort).

    ``scorer`` picks the step-3 realization — both produce identical
    answers (asserted in tests):

    - ``'arrow'`` (default) — cogroup probes and cells BY LIST ID and
      score each group vectorized in numpy: per-probe LUTs (p x m x k
      subspace distances) then ``m`` fancy-indexed gathers for the
      (p x n) distance block, local (adc, vec_id)-ordered top-k per
      probe, ≤ nprobe·k candidate rows per probe out. Dense gathers
      are the sanctioned Arrow hot path (same stance as the
      blocked-BLAS near-dup kernel) and run ~100x faster per pair
      than interpreted HOFs — the bulk-probe-table path.
    - ``'column'`` — pure JVM Column expressions end to end
      (broadcast join + codebook-literal ``element_at`` gathers). No
      Python anywhere; right for small interactive batches and as the
      plan-pure twin the Arrow kernel is verified against.
    """
    from level_mapreduce_spark.operators.joins import topk_per_key

    if scorer not in ("arrow", "column"):
        raise ValueError(f"unknown scorer {scorer!r}")

    residual = _resolve_ivfpq_residual(idx)
    n_cent = len(centroids)
    nprobe = max(1, min(nprobe, n_cent))
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cents_lit = lit_doubles_2d(centroids)
    emb = F.col("embedding").cast("array<double>")

    def coarse_score(c):
        dot = F.aggregate(
            F.zip_with(emb, c, lambda x, cv: x * cv),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        c2 = F.aggregate(
            F.transform(c, lambda cv: cv * cv), F.lit(0.0), lambda a, x: a + x
        )
        return dot - c2 / 2.0

    ranked = F.array_sort(
        F.transform(
            cents_lit,
            lambda c, i: F.struct(
                (-coarse_score(c)).alias("neg"), i.alias("lid")
            ),
        )
    )
    routed = probes.select(
        F.col(probe_id),
        emb.alias("_p"),
        F.explode(
            F.transform(F.slice(ranked, 1, nprobe), lambda s: s["lid"])
        ).alias("_list"),
    )
    if residual:
        routed = routed.withColumn(
            "_rp",
            F.zip_with(
                F.col("_p"),
                F.element_at(cents_lit, F.col("_list") + 1),
                lambda a, b: a - b,
            ),
        )
    else:
        routed = routed.withColumn("_rp", F.col("_p"))

    # Materialize the routing ONCE (eager local checkpoint): the key
    # collect below and the score join both read these blocks, so (a)
    # the HOF coarse scoring never runs twice over the probe table and
    # (b) a non-deterministic probes source (sampled/rand-derived)
    # cannot route to lists absent from the collected key set — the
    # collected ids and the joined rows come from the same evaluation.
    # Block lifetime tracks the returned plan (ContextCleaner frees
    # them when the result is dropped). Local checkpoints are not
    # executor-loss tolerant; a reliable checkpoint dir is the knob if
    # that matters for a long-lived probe workload.
    routed = routed.localCheckpoint(eager=True)
    # bounded driver collect: at most n_centroids distinct list ids —
    # keeps the In filter literal so it reaches PushedFilters
    wanted_keys = sorted(
        str(r["_list"]) for r in routed.select("_list").distinct().collect()
    )
    cells = idx.read().where(F.col("index_key").isin(wanted_keys)).select(
        F.col("doc_key").cast("long").alias("vec_id"),
        F.col("value").alias("_codes"),
        F.col("index_key").cast("int").alias("_list"),
    )

    if scorer == "arrow":
        import numpy as np

        books_np = np.array([np.array(b, dtype=np.float64) for b in codebooks])
        out_schema = T.StructType(
            [
                T.StructField("probe_id", T.LongType()),
                T.StructField("vec_id", T.LongType()),
                T.StructField("adc_dist", T.DoubleType()),
            ]
        )

        def score_list(key, probes_pdf, cells_pdf):
            import pandas as pd

            if probes_pdf.empty or cells_pdf.empty:
                return pd.DataFrame(
                    {"probe_id": [], "vec_id": [], "adc_dist": []}
                )
            # stable vec_id order so stable argsort ties break exactly
            # like the column path's (adc_dist, vec_id) ordering
            cells_pdf = cells_pdf.sort_values("vec_id")
            P = np.array(probes_pdf["_rp"].tolist(), dtype=np.float64)
            C = np.array(cells_pdf["_codes"].tolist(), dtype=np.int64)
            vec_ids = cells_pdf["vec_id"].to_numpy()
            dists = np.zeros((len(P), len(C)))
            for j in range(m):
                # per-probe subspace LUT (p x k), then a (p x n) gather
                lut_j = (
                    (
                        P[:, j * dsub : (j + 1) * dsub][:, None, :]
                        - books_np[j][None, :, :]
                    )
                    ** 2
                ).sum(-1)
                dists += lut_j[:, C[:, j]]
            kk = min(k, dists.shape[1])
            order = np.argsort(dists, axis=1, kind="stable")[:, :kk]
            p_ids = np.repeat(
                probes_pdf["probe_id"].to_numpy(), kk
            )
            return pd.DataFrame(
                {
                    "probe_id": p_ids,
                    "vec_id": vec_ids[order].ravel(),
                    "adc_dist": np.take_along_axis(
                        dists, order, axis=1
                    ).ravel(),
                }
            )

        local = (
            routed.select(F.col(probe_id).alias("probe_id"), "_rp", "_list")
            .groupBy("_list")
            .cogroup(cells.groupBy("_list"))
            .applyInPandas(score_list, schema=out_schema)
        )
        return topk_per_key(
            local,
            "probe_id",
            [F.col("adc_dist").asc(), F.col("vec_id")],
            k,
        ).select(
            F.col("probe_id").alias(probe_id), "vec_id", "adc_dist"
        )

    pairs = cells.join(F.broadcast(routed.drop("_p")), "_list")

    # STAGE the codebook literal as a column: referenced directly in
    # all m subspace terms, the ~4096-node literal tree would be
    # Codebook realization forks on SIZE (production PQ is k=256;
    # FAISS-standard codebooks are 16k doubles at m=8, dsub=8):
    #
    # - small (<= _PQ_LITERAL_MAX_DOUBLES): stage the 3-d literal as a
    #   column. Referenced directly in all m subspace terms the
    #   ~4096-node literal tree would be duplicated m times and the
    #   ANALYZER walks every copy (measured ~2.6 s per plan build at
    #   m=8, k=64); staged, it is analyzed once, constant-folded once,
    #   and the m references are pointer copies of the folded Literal.
    # - large: the literal itself is the scale problem (tree build +
    #   analyzer walk + per-task serialization all grow with k), so
    #   ship each subspace's codebook as a BROADCAST k-row table and
    #   resolve the centroid with m broadcast hash joins keyed on the
    #   code — no shuffle (broadcast), no giant literal, plan size
    #   linear in m and FLAT in k. Codes are argmin results in [0, k)
    #   so the inner equi-joins never drop a row.
    n_doubles = m * len(codebooks[0]) * dsub
    if n_doubles <= _PQ_LITERAL_MAX_DOUBLES:
        pairs = pairs.withColumn("_books", lit_doubles_3d(codebooks))

        def sub_cent(j: int):
            return F.element_at(
                F.element_at(F.col("_books"), j + 1),
                F.element_at(F.col("_codes"), j + 1) + 1,
            )

    else:
        spark = probes.sparkSession
        cent_schema = T.StructType(
            [
                T.StructField("_code_j", T.IntegerType(), False),
                T.StructField(
                    "_cent_j", T.ArrayType(T.DoubleType()), False
                ),
            ]
        )
        for j in range(m):
            bf = spark.createDataFrame(
                [(c, list(map(float, codebooks[j][c])))
                 for c in range(len(codebooks[j]))],
                cent_schema,
            )
            pairs = (
                pairs.join(
                    F.broadcast(bf),
                    F.element_at(F.col("_codes"), j + 1)
                    == F.col("_code_j"),
                )
                .drop("_code_j")
                .withColumnRenamed("_cent_j", f"_cent_{j}")
            )

        def sub_cent(j: int):
            return F.col(f"_cent_{j}")

    def sub_dist(j: int):
        diff = F.zip_with(
            F.slice(F.col("_rp"), j * dsub + 1, dsub),
            sub_cent(j),
            lambda a, b: (a - b) * (a - b),
        )
        return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)

    adc = sub_dist(0)
    for j in range(1, m):
        adc = adc + sub_dist(j)
    scored = pairs.withColumn("adc_dist", adc).drop(
        *(
            ["_books"]
            if n_doubles <= _PQ_LITERAL_MAX_DOUBLES
            else [f"_cent_{j}" for j in range(m)]
        )
    )
    return topk_per_key(
        scored,
        probe_id,
        [F.col("adc_dist").asc(), F.col("vec_id")],
        k,
    ).select(probe_id, "vec_id", "adc_dist")


def ivfpq_topk_from_index(
    idx: MapIndex,
    centroids: list[list[float]],
    codebooks: list,
    probe: list,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Serve an IVFPQ probe off the stored index: rank centroids
    driver-side, key-lookup the nprobe nearest lists (an In filter on
    the sorted index key — pushed to the parquet scan), ADC-score
    only those cells' codes.

    The residual-encoding flag is resolved from the handle if build/
    load set it, else from the persisted sidecar — scoring residual
    codes with the raw-probe LUT returns silently wrong neighbors, so
    an index with neither source of truth is refused rather than
    defaulted."""
    import numpy as np

    from level_mapreduce_spark.operators.pq import pq_topk, pq_topk_lists

    def score(c):
        dot = sum(p * v for p, v in zip(probe, c))
        return dot - sum(v * v for v in c) / 2.0

    residual = _resolve_ivfpq_residual(idx)
    ranked = sorted(range(len(centroids)), key=lambda j: -score(centroids[j]))
    wanted = ranked[: max(1, nprobe)]
    wanted_keys = [str(j) for j in wanted]
    if residual:
        # residual encoding: per-list LUTs from the residual probe
        books = [np.array(b) for b in codebooks]
        m = len(books)
        dsub = books[0].shape[1]
        p = np.array(probe, dtype=np.float64)
        luts = {}
        for lid in wanted:
            rp = p - np.array(centroids[lid])
            luts[lid] = np.stack(
                [
                    ((books[j] - rp[j * dsub : (j + 1) * dsub]) ** 2).sum(
                        axis=1
                    )
                    for j in range(m)
                ]
            )
        cells = idx.read().where(F.col("index_key").isin(wanted_keys)).select(
            F.col("doc_key").cast("long").alias("vec_id"),
            F.col("value").alias("codes"),
            F.col("index_key").cast("int").alias("_list"),
        )
        return pq_topk_lists(cells, codebooks, luts, k=k)
    cells = idx.read().where(F.col("index_key").isin(wanted_keys)).select(
        F.col("doc_key").cast("long").alias("vec_id"),
        F.col("value").alias("codes"),
    )
    return pq_topk(cells, codebooks, probe, k=k)
