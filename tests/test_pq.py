"""Product quantization: code structure, planted-duplicate ranking,
recall against exact L2, and the distributed-top-k plan shape.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark.operators.pq import pq_encode, pq_topk, train_pq
from level_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def pq_setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=8, k=64)
    codes = pq_encode(emb, books).persist()
    codes.count()
    rows = emb.collect()
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    yield emb, books, codes, x, ids
    codes.unpersist()


def test_pq_codes_structure(pq_setup):
    """Every vector encodes to m in-range centroid ids, and identical
    vectors encode identically (determinism + 32x compression: 8
    int8-range codes stand in for 64 float32s)."""
    emb, books, codes, x, ids = pq_setup
    rows = codes.collect()
    assert len(rows) == len(ids)
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 64 for c in r["codes"])
    again = pq_encode(emb, books).collect()
    assert {r["vec_id"]: r["codes"] for r in rows} == {
        r["vec_id"]: r["codes"] for r in again
    }


def test_pq_recall_vs_exact(pq_setup):
    """ADC top-10 recovers a solid fraction of the exact-L2 top-10
    (random vectors are PQ's worst case; measured ~0.54 at 8
    bytes/vector — assert a margined floor), and a probe that IS a
    corpus vector always recovers itself."""
    emb, books, codes, x, ids = pq_setup
    recalls = []
    for i in range(5):
        p = x[i]
        exact = set(ids[np.argsort(((x - p) ** 2).sum(axis=1))[:10]])
        got = pq_topk(codes, books, list(p), k=10).collect()
        approx = {r["vec_id"] for r in got}
        assert ids[i] in approx  # self is found
        # ascending ADC order out of the sink
        dists = [r["adc_dist"] for r in got]
        assert dists == sorted(dists)
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.35, recalls


def test_pq_planted_duplicate_ranks_top(spark, pq_setup):
    """A planted exact duplicate shares its source's codes, so its
    ADC distance ties the source's and both rank at the top for a
    probe equal to that vector."""
    emb, books, codes, x, ids = pq_setup
    dup = emb.where(F.col("vec_id") == int(ids[3])).select(
        (F.col("vec_id") + 700000).alias("vec_id"), "embedding", "label"
    )
    codes_aug = pq_encode(emb.unionByName(dup), books)
    top = pq_topk(codes_aug, books, list(x[3]), k=3).collect()
    top_ids = {r["vec_id"] for r in top}
    assert {int(ids[3]), int(ids[3]) + 700000} <= top_ids
    by_id = {r["vec_id"]: r["adc_dist"] for r in top}
    assert by_id[int(ids[3])] == by_id[int(ids[3]) + 700000]


def test_pq_topk_plan_is_distributed_topk(pq_setup):
    """The global stage plans as TakeOrderedAndProject over per-batch
    top-k emissions — never a global sort."""
    emb, books, codes, x, ids = pq_setup
    plan = (
        pq_topk(codes, books, list(x[0]), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_ivfpq_composition(spark, pq_setup):
    """IVFPQ: ADC over only the probed inverted lists still recovers
    the probe vector itself and a healthy share of full-PQ's answer
    set (the composition can only lose what list-pruning drops)."""
    from level_mapreduce_spark.operators.ivf import train_centroids
    from level_mapreduce_spark.operators.pq import ivfpq_topk

    emb, books, codes, x, ids = pq_setup
    cents = train_centroids(emb, n_centroids=8)
    full = {r["vec_id"] for r in pq_topk(codes, books, list(x[1]), k=10).collect()}
    got = ivfpq_topk(
        emb, books, cents, list(x[1]), k=10, nprobe=4
    ).collect()
    got_ids = {r["vec_id"] for r in got}
    assert ids[1] in got_ids                  # self survives routing
    assert len(got_ids & full) >= 5, (got_ids, full)


def test_column_encoder_matches_arrow_encoder(spark, pq_setup):
    """The pure-Column pq_assign_expr and the Arrow pq_encode produce
    identical codes for every vector."""
    from level_mapreduce_spark.operators.pq import pq_assign_expr

    emb, books, codes, x, ids = pq_setup
    col_codes = {
        r["vec_id"]: list(r["c"])
        for r in emb.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            pq_assign_expr(
                F.col("embedding").cast("array<double>"), books
            ).alias("c"),
        ).collect()
    }
    arrow_codes = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert col_codes == arrow_codes


def test_ivfpq_index_roundtrip_and_incremental(spark, sf_dir, tmp_path, pq_setup):
    """The stored IVFPQ index serves the same answers as the inline
    composition, the list lookup pushes to the parquet scan, and an
    incremental update of a planted duplicate makes it findable
    without any rebuild."""
    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )
    from level_mapreduce_spark.operators.pq import ivfpq_topk

    emb, _, _, x, ids = pq_setup
    idx, cents, books = build_ivfpq_index(
        spark, emb, str(tmp_path / "ivfpq"), n_centroids=8
    )
    stored = ivfpq_topk_from_index(
        idx, cents, books, list(x[2]), k=10, nprobe=4
    ).collect()
    inline = ivfpq_topk(
        emb, books, cents, list(x[2]), k=10, nprobe=4
    ).collect()
    assert {r["vec_id"] for r in stored} == {r["vec_id"] for r in inline}
    for s, i in zip(
        sorted(stored, key=lambda r: r["vec_id"]),
        sorted(inline, key=lambda r: r["vec_id"]),
    ):
        assert abs(s["adc_dist"] - i["adc_dist"]) < 1e-9

    # key lookup reaches the scan
    plan = (
        idx.read()
        .where(F.col("index_key").isin(["0", "1"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "In(index_key" in plan

    # incremental: a planted duplicate arrives via update(), becomes
    # the probe's nearest stored neighbor alongside its source
    dup = emb.where(F.col("vec_id") == int(ids[2])).select(
        (F.col("vec_id") + 900000).alias("vec_id"), "embedding", "label"
    )
    idx.update(dup, assume_unique=True)
    after = ivfpq_topk_from_index(
        idx, cents, books, list(x[2]), k=3, nprobe=4
    ).collect()
    top_ids = {r["vec_id"] for r in after}
    assert {int(ids[2]), int(ids[2]) + 900000} <= top_ids


def test_residual_ivfpq_index(spark, tmp_path, pq_setup):
    """Residual encoding (the standard FAISS IVFPQ): codes quantize
    x - centroid(x) and probes score against per-list residual LUTs.
    Self-recovery, a margined recall floor, and exact-duplicate code
    ties all hold; recall is comparable to the plain encoding on
    random data (residuals shine only with cluster structure)."""
    import numpy as np

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )

    emb, _, _, x, ids = pq_setup
    idx, cents, books = build_ivfpq_index(
        spark, emb, str(tmp_path / "resid"), n_centroids=8, residual=True
    )
    recalls = []
    for i in range(5):
        p = x[i]
        exact = set(ids[np.argsort(((x - p) ** 2).sum(axis=1))[:10]])
        got = {
            r["vec_id"]
            for r in ivfpq_topk_from_index(
                idx, cents, books, list(p), k=10, nprobe=4
            ).collect()
        }
        assert ids[i] in got  # self survives residual routing+coding
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.3, recalls

    # duplicate arriving via update() shares codes & list -> tied top
    from pyspark.sql import functions as F

    dup = emb.where(F.col("vec_id") == int(ids[4])).select(
        (F.col("vec_id") + 800000).alias("vec_id"), "embedding", "label"
    )
    idx.update(dup, assume_unique=True)
    top = ivfpq_topk_from_index(
        idx, cents, books, list(x[4]), k=3, nprobe=4
    ).collect()
    top_ids = {r["vec_id"] for r in top}
    assert {int(ids[4]), int(ids[4]) + 800000} <= top_ids


def test_ivfpq_knn_join_matches_single_probe_path(spark, tmp_path, pq_setup):
    """BOTH batched scorers (cogrouped-numpy arrow kernel and the
    pure-Column twin) return, for every probe row, exactly the
    single-probe serve path's answers (same routing, same ADC, same
    top-k) for BOTH encodings. The column plan stays JVM-side; both
    plans push the list lookup to the parquet scan."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_knn_join,
        ivfpq_topk_from_index,
    )

    emb, _, _, x, ids = pq_setup
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("long").alias("probe_id"), "embedding"
    )
    for residual in (False, True):
        idx, cents, books = build_ivfpq_index(
            spark,
            emb,
            str(tmp_path / f"knn_{residual}"),
            n_centroids=8,
            residual=residual,
        )
        want_by_pid = {}
        for r in probes.collect():
            want = [
                (s["vec_id"], round(s["adc_dist"], 9))
                for s in ivfpq_topk_from_index(
                    idx,
                    cents,
                    books,
                    [float(v) for v in r["embedding"]],
                    k=5,
                    nprobe=4,
                ).collect()
            ]
            want.sort(key=lambda t: (t[1], t[0]))
            want_by_pid[r["probe_id"]] = want

        for scorer in ("arrow", "column"):
            batch = ivfpq_knn_join(
                idx, cents, books, probes, k=5, nprobe=4, scorer=scorer
            )
            got = {}
            for r in batch.collect():
                got.setdefault(r["probe_id"], []).append(
                    (r["vec_id"], round(r["adc_dist"], 9))
                )
            for pid in got:
                got[pid].sort(key=lambda t: (t[1], t[0]))
            assert got == want_by_pid, (residual, scorer)

            plan = batch._jdf.queryExecution().executedPlan().toString()
            assert "PushedFilters" in plan and "In(index_key" in plan
            if scorer == "column":
                assert "EvalPython" not in plan
            else:
                assert "BatchEvalPython" not in plan  # Arrow, never row


def test_ivfpq_knn_join_broadcast_codebook_path(spark, tmp_path, pq_setup):
    """Production-k fork: forcing the broadcast codebook-table
    realization (the path k=256 codebooks take automatically) returns
    bit-identical rows to the staged-literal path and the arrow
    kernel, stays JVM-side, and plans the codebook resolution as
    broadcast hash joins — no shuffle added by the fork."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators import indexed as ix

    emb, _, _, x, ids = pq_setup
    probes = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").cast("long").alias("probe_id"), "embedding"
    )
    idx, cents, books = ix.build_ivfpq_index(
        spark, emb, str(tmp_path / "knn_bcast"), n_centroids=8
    )

    def rows(scorer):
        return {
            (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
            for r in ix.ivfpq_knn_join(
                idx, cents, books, probes, k=5, nprobe=4, scorer=scorer
            ).collect()
        }

    literal = rows("column")
    arrow = rows("arrow")
    saved = ix._PQ_LITERAL_MAX_DOUBLES
    try:
        ix._PQ_LITERAL_MAX_DOUBLES = 0  # force the broadcast fork
        bcast_df = ix.ivfpq_knn_join(
            idx, cents, books, probes, k=5, nprobe=4, scorer="column"
        )
        bcast = {
            (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
            for r in bcast_df.collect()
        }
        plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    finally:
        ix._PQ_LITERAL_MAX_DOUBLES = saved
    assert bcast == literal == arrow
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_recall_monotone_in_nprobe(spark, tmp_path, pq_setup):
    """The nprobe knob buys recall monotonically (more inverted lists
    scanned can only add candidates), self-recovery holds at every
    setting, and full-probe recall clears a margined floor for BOTH
    encodings — the pytest floor under the BASELINE.md sweep
    (scripts/ivfpq_recall_sweep.py)."""
    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
    )

    emb, _, _, x, ids = pq_setup
    n_queries = 5
    exact = {
        i: set(ids[np.argsort(((x - x[i]) ** 2).sum(axis=1))[:10]])
        for i in range(n_queries)
    }
    for residual in (False, True):
        idx, cents, books = build_ivfpq_index(
            spark,
            emb,
            str(tmp_path / f"sweep_{residual}"),
            n_centroids=8,
            residual=residual,
        )
        means = []
        for nprobe in (1, 4, 8):
            rec = []
            for i in range(n_queries):
                got = {
                    r["vec_id"]
                    for r in ivfpq_topk_from_index(
                        idx, cents, books, list(x[i]), k=10, nprobe=nprobe
                    ).collect()
                }
                assert ids[i] in got, (residual, nprobe, i)
                rec.append(len(exact[i] & got) / 10)
            means.append(sum(rec) / len(rec))
        # monotone within noise (a single probe-set can wobble one
        # notch; the sweep script's 20-query run is the clean curve)
        assert means[0] <= means[2] + 0.1, (residual, means)
        # full-probe (= whole-corpus ADC) floor, margined under the
        # ~0.4-0.55 measured band for random vectors at 8 bytes
        assert means[2] >= 0.3, (residual, means)


def test_ivfpq_index_reload_serves_without_retraining(
    spark, tmp_path, pq_setup
):
    """A FRESH handle opened with load_ivfpq_index serves probes
    bit-identically to the builder's handle using only the persisted
    sidecar (centroids + codebooks + residual flag) — build job and
    serve job are different processes at 100 TB. The residual flag
    round-trips (the silent-raw-LUT bug class), and incremental
    update() through the reloaded handle encodes against the SAME
    frozen codebooks so a planted duplicate ties its source."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_topk_from_index,
        load_ivfpq_index,
    )

    emb, _, _, x, ids = pq_setup
    store = str(tmp_path / "reload")
    idx, cents, books = build_ivfpq_index(
        spark, emb, store, n_centroids=8, residual=True
    )
    before = ivfpq_topk_from_index(
        idx, cents, books, list(x[0]), k=10, nprobe=4
    ).collect()

    idx2, cents2, books2 = load_ivfpq_index(spark, store)
    assert idx2.ivfpq_residual is True
    assert np.allclose(np.array(cents2), np.array(cents))
    assert np.allclose(
        np.array([np.array(b) for b in books2]),
        np.array([np.array(b) for b in books]),
    )
    after = ivfpq_topk_from_index(
        idx2, cents2, books2, list(x[0]), k=10, nprobe=4
    ).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in before] == [
        (r["vec_id"], r["adc_dist"]) for r in after
    ]

    # maintenance through the reloaded handle: same frozen codebooks
    dup = emb.where(F.col("vec_id") == int(ids[1])).select(
        (F.col("vec_id") + 850000).alias("vec_id"), "embedding", "label"
    )
    idx2.update(dup, assume_unique=True)
    top = ivfpq_topk_from_index(
        idx2, cents2, books2, list(x[1]), k=3, nprobe=4
    ).collect()
    assert {int(ids[1]), int(ids[1]) + 850000} <= {
        r["vec_id"] for r in top
    }


def test_ivfpq_residual_flag_never_silently_defaults(
    spark, tmp_path, pq_setup
):
    """Serving a handle whose residual flag is unknowable (no
    attribute, no sidecar) is refused — scoring residual codes with
    the raw-probe LUT would return silently wrong neighbors."""
    from level_mapreduce_spark.engine.index import MapIndex
    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_mapper,
        ivfpq_topk_from_index,
    )

    emb, _, _, x, ids = pq_setup
    store = str(tmp_path / "noflag")
    idx, cents, books = build_ivfpq_index(
        spark, emb, store, n_centroids=8, residual=True
    )
    # a bare handle on the same store: no attr, but the sidecar
    # resolves the flag -> same answers as the builder's handle
    bare = MapIndex(
        spark,
        "ivfpq_cells",
        ivfpq_mapper(cents, books, residual=True),
        store,
        doc_key="vec_id",
    )
    got = ivfpq_topk_from_index(
        bare, cents, books, list(x[3]), k=5, nprobe=4
    ).collect()
    want = ivfpq_topk_from_index(
        idx, cents, books, list(x[3]), k=5, nprobe=4
    ).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]

    # destroy the sidecar -> the serve path must refuse, not default
    import os

    os.remove(os.path.join(store, "ivfpq_cells", "ivfpq.json"))
    bare2 = MapIndex(
        spark,
        "ivfpq_cells",
        ivfpq_mapper(cents, books, residual=True),
        store,
        doc_key="vec_id",
    )
    with pytest.raises(ValueError, match="residual or raw"):
        ivfpq_topk_from_index(bare2, cents, books, list(x[3]), k=5)


def test_trainer_options_sample_pinned_mllib_valid(spark, pq_setup):
    """The default trainer stays the bit-pinned sample-Lloyd (same
    seed -> identical codebooks/centroids, the determinism the oracle
    gate and sidecars rely on); trainer='mllib' runs distributed
    kmeans|| over the full corpus and yields well-formed codebooks the
    encode path accepts (in-range codes, deterministic re-encode);
    unknown trainers are refused."""
    import numpy as np
    import pytest

    from level_mapreduce_spark.operators.ivf import train_centroids
    from level_mapreduce_spark.operators.pq import (
        pq_encode,
        train_pq,
    )

    emb, _, _, x, ids = pq_setup

    # seeded-equivalence pin on the DEFAULT trainer
    assert train_pq(emb, m=8, k=16) == train_pq(emb, m=8, k=16)
    assert train_centroids(emb, n_centroids=8) == train_centroids(
        emb, n_centroids=8
    )

    # mllib option: shape + encode validity
    books = train_pq(emb, m=8, k=8, trainer="mllib", iters=3)
    assert len(books) == 8
    dsub = x.shape[1] // 8
    for b in books:
        assert len(b) == 8 and all(len(c) == dsub for c in b)
        assert np.isfinite(np.array(b)).all()
    codes = pq_encode(emb, books)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert len(got) == len(ids)
    assert all(0 <= c < 8 for cs in got.values() for c in cs)
    # non-degenerate fit: a broken trainer (constant/zero centers)
    # would encode every vector identically — real kmeans|| spreads
    # codes across multiple centroids in every subspace
    assert len({tuple(cs) for cs in got.values()}) > 1
    for j in range(8):
        assert len({cs[j] for cs in got.values()}) > 1, j
    # re-encode against the same books is deterministic
    got2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert got == got2

    cents = train_centroids(emb, n_centroids=4, trainer="mllib", iters=3)
    assert len(cents) == 4 and all(len(c) == x.shape[1] for c in cents)

    with pytest.raises(ValueError, match="unknown trainer"):
        train_pq(emb, trainer="flann")
    with pytest.raises(ValueError, match="unknown trainer"):
        train_centroids(emb, trainer="faiss")


def test_ivfpq_arrow_encoder_matches_column(spark, tmp_path, pq_setup):
    """The production-k Arrow cell encoder produces IDENTICAL stored
    cells (list routing + PQ codes) to the Column mapper for both
    encodings, auto-selects only above the codebook-size threshold,
    keeps incremental update() working through an arrow-encoded
    handle, and round-trips its encoder choice through the sidecar."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_knn_join,
        load_ivfpq_index,
        ArrowIvfpqMapper,
    )

    emb, _, _, x, ids = pq_setup

    def cells(idx):
        return {
            (r["index_key"], r["doc_key"], tuple(r["value"]))
            for r in idx.read().collect()
        }

    for residual in (False, True):
        idx_c, cents_c, books_c = build_ivfpq_index(
            spark, emb, str(tmp_path / f"enc_c_{residual}"),
            n_centroids=8, residual=residual, encoder="column",
        )
        idx_a, cents_a, books_a = build_ivfpq_index(
            spark, emb, str(tmp_path / f"enc_a_{residual}"),
            n_centroids=8, residual=residual, encoder="arrow",
        )
        assert cents_c == cents_a and books_c == books_a  # seeded train
        assert cells(idx_c) == cells(idx_a), residual

    # default geometry (m=8,k=64 -> 4096 doubles) auto-selects column
    idx_auto, _, _ = build_ivfpq_index(
        spark, emb, str(tmp_path / "enc_auto"), n_centroids=8
    )
    assert idx_auto.get_sidecar(name="ivfpq.json")["encoder"] == "column"

    # arrow-encoded handle: incremental update + reload + serve
    store = str(tmp_path / "enc_a_False")
    dup = emb.where(F.col("vec_id") == int(ids[4])).select(
        (F.col("vec_id") + 800000).alias("vec_id"), "embedding", "label"
    )
    lidx, lcents, lbooks = load_ivfpq_index(spark, store)
    assert isinstance(lidx.mapper, ArrowIvfpqMapper)  # sidecar choice
    lidx.update(dup, assume_unique=True)
    probes = emb.where(F.col("vec_id") == int(ids[4])).select(
        F.col("vec_id").cast("long").alias("probe_id"), "embedding"
    )
    top = ivfpq_knn_join(lidx, lcents, lbooks, probes, k=3).collect()
    top_ids = {r["vec_id"] for r in top}
    assert {int(ids[4]), int(ids[4]) + 800000} <= top_ids


def test_pq_topk_deterministic_under_adc_ties(spark, pq_setup):
    """PQ quantization makes exact ADC ties common (identical codes =
    identical distance); the top-k truncation must break them on
    vec_id so repeated runs return the same set, lowest ids first."""
    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.pq import pq_encode, pq_topk

    emb, books, codes, x, ids = pq_setup
    # 15 exact clones of vector 0 -> 16 identical code rows, k=10
    clones = emb.where(F.col("vec_id") == int(ids[0])).select(
        F.explode(
            F.array(*[F.lit(int(ids[0]) + 1000 + i) for i in range(15)])
        ).alias("vec_id"),
        "embedding",
    )
    aug = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    ).unionByName(clones)
    aug_codes = pq_encode(aug, books)
    runs = [
        [r["vec_id"] for r in pq_topk(aug_codes, books, list(x[0]), k=10).collect()]
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    # ties broken low-id first: original id 0 leads its clone block
    assert runs[0][0] == int(ids[0])
    assert runs[0] == sorted(runs[0], )
