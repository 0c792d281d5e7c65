"""LLM-pipeline operator tests over the real testdata tables:
LSH recall vs exact Jaccard, ANN recall@k vs brute force, SimHash
structure, exact dedup, multimodal plumbing.
"""

import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark.operators import (
    brute_topk,
    exact_dedup,
    jaccard_pairs_exact,
    lsh_topk,
    minhash_lsh_pairs,
    simhash,
    simhash_pairs,
)
from level_mapreduce_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
)
from level_mapreduce_spark.operators.similarity import probe_vector
from level_mapreduce_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_lsh_recall_equals_exact(docs):
    """The registered LSH query must find exactly the exact-Jaccard
    pair set at the 0.7 threshold on this corpus (recall 1.0, and the
    verify step makes precision 1.0 by construction)."""
    exact = {
        (r["doc_a"], r["doc_b"]) for r in jaccard_pairs_exact(docs).collect()
    }
    lsh = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert lsh == exact
    assert exact  # the corpus plants near-dups; empty would be vacuous


def test_exact_dedup_keeps_min_doc(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    rows = {r["key"]: r["result"] for r in exact_dedup(df).collect()}
    assert sorted(rows.values()) == [1, 3]


def test_ann_lsh_recall(emb):
    """Multiprobe hyperplane LSH must recover most of the brute-force
    top-10 (recall@10 >= 0.5 on random embeddings with 6-bit buckets)."""
    probe = probe_vector(emb, 0)
    brute = [r["vec_id"] for r in brute_topk(emb, probe, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(emb, probe, k=10).collect()]
    assert brute[0] == 0  # the probe itself is its own nearest neighbor
    overlap = len(set(brute) & set(approx))
    assert overlap >= 5, (brute, approx)


def test_neardup_clusters_chain_topology(spark):
    """A chain 1-2-3-4 (each adjacent pair a near-dup edge) must
    collapse to one cluster labeled by the min id — requires multiple
    propagation rounds; 5 and 6 pair together; 7 is a singleton."""
    from level_mapreduce_spark.operators.dedup import neardup_clusters

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6)], "doc_a long, doc_b long"
    )
    rows = neardup_clusters(docs, pairs=pairs).collect()
    cluster = {r["doc_id"]: r["cluster"] for r in rows}
    keep = {r["doc_id"] for r in rows if r["keep"]}
    assert cluster == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}
    assert keep == {1, 5, 7}


def test_cosine_neardup_lsh_recall_on_planted_dups(spark, emb):
    """The LSH-bucketed embedding near-dup path must recover planted
    near-duplicates (clone + tiny perturbation, cos > 0.99) with full
    recall, and every emitted pair must also pass the exact operator
    (precision 1.0 via the verify step)."""
    from level_mapreduce_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_lsh,
    )

    base = emb.limit(20)
    clones = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x * 1.001 + 0.0001,
        ).alias("embedding"),
        F.col("label"),
    )
    corpus = base.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    ).unionByName(clones)
    exact = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_neardup_pairs(corpus, threshold=0.99).collect()
    }
    lsh = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_neardup_pairs_lsh(corpus, threshold=0.99).collect()
    }
    planted = {(i, i + 100000) for i in range(20)}
    assert planted <= exact
    assert planted <= lsh  # full recall on the planted clones
    assert lsh <= exact  # verify step: no false positives


def test_simhash_properties(docs):
    fps = simhash(docs.limit(50))
    rows = fps.collect()
    assert len(rows) == 50
    assert all(r["simhash"] is not None for r in rows)
    pairs = simhash_pairs(docs, max_hamming=3)
    sample = pairs.limit(20).collect()
    for r in sample:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 3


def test_multimodal_plumbing(docs):
    media = attach_fake_media(docs.limit(30))
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "media_type",
        "meta",
    ]
    feats = extract_features(media, n_features=8)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["features"]) == 8
        assert r["n_bytes"] > 0
    # deterministic: rerun hashes identically
    again = {r["media_id"]: r["checksum"] for r in extract_features(media).collect()}
    assert again == {r["media_id"]: r["checksum"] for r in rows}


def test_multimodal_real_decode_is_stubbed(docs):
    media = attach_fake_media(docs.limit(1))
    with pytest.raises(NotImplementedError):
        extract_features(media, decode_fn="real")


def test_multimodal_ppm_codec_real_pixels(spark):
    """The pure-numpy PNM codec is a REAL image path: features are
    exact per-channel statistics of the decoded raster, resize is
    true nearest-neighbor resampling (pixel-verified against a numpy
    reference), and malformed payloads quarantine to null instead of
    killing the batch."""
    import numpy as np

    from level_mapreduce_spark.operators.multimodal import (
        _encode_ppm,
        _parse_pnm,
        extract_features,
        resize_images,
    )

    # 8x8 rgb: red top half, blue bottom half
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4, :, 0] = 255
    img[4:, :, 2] = 255
    payload = _encode_ppm(img)
    # byte-level round trip through the parser
    assert np.array_equal(_parse_pnm(payload), img)
    # header comments are legal
    commented = payload.replace(b"\n8 8\n", b"\n# c\n8 8\n", 1)
    assert np.array_equal(_parse_pnm(commented), img)

    media = spark.createDataFrame(
        [
            (1, bytearray(payload), "image", (len(payload), "t")),
            (2, bytearray(b"not an image"), "image", (12, "t")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<n_bytes: long, source: string>",
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, n_features=8, decode_fn="ppm")
        .collect()
    }
    # mean per channel: r=127.5, g=0, b=127.5; then stds; then h, w
    got = feats[1]
    assert got[0] == pytest.approx(127.5) and got[1] == 0.0
    assert got[2] == pytest.approx(127.5)
    assert got[6] == 8.0 and got[7] == 8.0
    assert feats[2] is None  # malformed -> quarantined, not crashed

    resized = {
        r["media_id"]: r["payload"]
        for r in resize_images(
            media, width=4, height=4, decode_fn="ppm"
        ).collect()
    }
    back = _parse_pnm(bytes(resized[1]))
    rows = (np.arange(4) * 8 // 4)
    want = img[rows][:, rows]
    assert np.array_equal(back, want)  # true nearest-neighbor
    assert resized[2] is None


def test_multimodal_wav_codec_real_signal(spark):
    """The stdlib-wave + numpy audio codec decodes real PCM: a
    synthesized 440 Hz half-amplitude sine measures its true
    duration, rate, RMS (a/sqrt(2)), zero-crossing rate (2f/rate),
    and peak; non-audio bytes quarantine to null."""
    import numpy as np

    from level_mapreduce_spark.operators.multimodal import (
        _encode_wav,
        extract_features,
    )

    rate, f, amp = 8000, 440.0, 0.5
    t = np.arange(rate) / rate  # 1 second
    x = (amp * np.sin(2 * np.pi * f * t) * 32767).astype("<i2")
    payload = _encode_wav(x.reshape(-1, 1), rate)

    media = spark.createDataFrame(
        [
            (1, bytearray(payload), "audio", (len(payload), "t")),
            (2, bytearray(b"noise bytes"), "audio", (11, "t")),
        ],
        "media_id long, payload binary, media_type string, "
        "meta struct<n_bytes: long, source: string>",
    )
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(media, n_features=6, decode_fn="wav")
        .collect()
    }
    dur, srate, ch, rms, zcr, peak = feats[1]
    assert dur == pytest.approx(1.0)
    assert srate == rate and ch == 1.0
    assert rms == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert zcr == pytest.approx(2 * f / rate, rel=0.01)
    assert peak == pytest.approx(amp, rel=1e-3)
    assert feats[2] is None


def test_blocked_neardup_matches_expression(spark, emb):
    """The BLAS-blocked Arrow path must produce the same pair set as
    the Column-expression operator (sims equal to within float
    summation-order noise)."""
    from level_mapreduce_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blocked,
    )

    expr = {
        (r["vec_id_a"], r["vec_id_b"]): r["sim"]
        for r in cosine_neardup_pairs(emb, threshold=0.42).collect()
    }
    blocked = {
        (r["vec_id_a"], r["vec_id_b"]): r["sim"]
        for r in cosine_neardup_pairs_blocked(emb, threshold=0.42).collect()
    }
    assert set(expr) == set(blocked) and expr
    for k in expr:
        assert abs(expr[k] - blocked[k]) <= 1e-5, (k, expr[k], blocked[k])

    # small-batch fast path (default small_rows): this corpus is under
    # _DRIVER_ROWS, so pairs are computed driver-side and the plan is
    # a local-relation parallelize — no parquet staging dir AND no
    # mapInPandas stage
    fast_df = cosine_neardup_pairs_blocked(emb, threshold=0.42)
    fast_plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "lmr_blocked_" not in fast_plan
    assert "FlatMapGroups" not in fast_plan and "MapInPandas" not in fast_plan
    # ...while forcing small_rows=0 takes the staged path (the 100 TB
    # shape), scanning the staged matrix — and both paths agree
    # bit-for-bit
    staged_df = cosine_neardup_pairs_blocked(
        emb, threshold=0.42, small_rows=0
    )
    staged_plan = staged_df._jdf.queryExecution().executedPlan().toString()
    assert "lmr_blocked_" in staged_plan
    staged = {
        (r["vec_id_a"], r["vec_id_b"]): r["sim"] for r in staged_df.collect()
    }
    assert staged == blocked

    # mid tier: above _DRIVER_ROWS but under the cells budget, the
    # matrix broadcasts and pairs compute via mapInPandas — same
    # result, still no staging dir
    from level_mapreduce_spark.operators import similarity as _sm

    orig_driver_rows = _sm._DRIVER_ROWS
    try:
        _sm._DRIVER_ROWS = 0
        mid_df = cosine_neardup_pairs_blocked(emb, threshold=0.42)
        mid_plan = mid_df._jdf.queryExecution().executedPlan().toString()
        assert "lmr_blocked_" not in mid_plan
        assert "MapInPandas" in mid_plan
        mid = {
            (r["vec_id_a"], r["vec_id_b"]): r["sim"]
            for r in mid_df.collect()
        }
        assert mid == blocked
    finally:
        _sm._DRIVER_ROWS = orig_driver_rows

    # max_rows binds the fast path exactly like the staged one (r9
    # review: the first fast-path cut silently bypassed it)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_rows"):
        cosine_neardup_pairs_blocked(
            emb, threshold=0.42, max_rows=3
        ).collect()
    # fat-vector guard: for corpora past the phase-1 probe, the row
    # budget derives from the OBSERVED dimension against the cells
    # cap — an over-cap corpus falls through to the staged plan
    # instead of a huge driver collect
    from level_mapreduce_spark.operators import similarity as sim_mod

    big = spark.range(3000).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 + 1).cast("double"),
            (F.col("id") % 11 + 1).cast("double"),
        ).alias("embedding"),
    )
    orig = sim_mod._FAST_CELLS
    try:
        sim_mod._FAST_CELLS = 1  # any real dim exceeds the cap
        capped = cosine_neardup_pairs_blocked(big, threshold=1.01)
        assert "lmr_blocked_" in (
            capped._jdf.queryExecution().executedPlan().toString()
        )
        # the cap must bind for SMALL corpora too (r9 advice: a
        # <=2048-row corpus with fat vectors used to skip the cells
        # check entirely) — the dim probe budgets every collect now
        tiny = big.limit(10)
        capped_tiny = cosine_neardup_pairs_blocked(tiny, threshold=1.01)
        assert "lmr_blocked_" in (
            capped_tiny._jdf.queryExecution().executedPlan().toString()
        )
        sim_mod._FAST_CELLS = orig
        fast_big = cosine_neardup_pairs_blocked(big, threshold=1.01)
        assert "lmr_blocked_" not in (
            fast_big._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        sim_mod._FAST_CELLS = orig


def test_hll_sketch_error_bound(spark, sf_dir):
    """approx_count_distinct's HLL++ estimate must land within 5% of
    the exact distinct count per event_type (default rsd is 0.05)."""
    from level_mapreduce_spark.operators.events import (
        approx_distinct_users,
        distinct_users,
    )

    events = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(events).collect()
    }
    exact = {
        r["event_type"]: r["n_users"] for r in distinct_users(events).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.05, (et, approx[et], n)


def test_funnel_stages_subsequence_semantics(spark):
    """Greedy ordered-subsequence matching: stages must occur in
    (ts, event_id) order; out-of-order completions don't count; users
    with no funnel events report stage 0; a decoy first-stage event
    after the real one cannot block progression (greedy correctness)."""
    from level_mapreduce_spark.operators.events import funnel_stages

    rows = [
        # u1: view -> click -> purchase in order => 3
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:01:00", 1, "click"),
        (3, "2024-01-01 10:02:00", 1, "purchase"),
        # u2: purchase BEFORE view+click => only view->click counts => 2
        (4, "2024-01-01 09:00:00", 2, "purchase"),
        (5, "2024-01-01 10:00:00", 2, "view"),
        (6, "2024-01-01 10:01:00", 2, "click"),
        # u3: only unrelated events => 0
        (7, "2024-01-01 10:00:00", 3, "error"),
        # u4: view, view, click, purchase — greedy takes the FIRST
        # view and still completes => 3
        (8, "2024-01-01 10:00:00", 4, "view"),
        (9, "2024-01-01 10:00:30", 4, "view"),
        (10, "2024-01-01 10:01:00", 4, "click"),
        (11, "2024-01-01 10:02:00", 4, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: r["stage"] for r in funnel_stages(events).collect()
    }
    assert got == {1: 3, 2: 2, 3: 0, 4: 3}


def test_sessionize_gap_semantics(spark):
    import datetime as dt

    from level_mapreduce_spark.operators.events import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, base, "click", 1.0, "{}"),
        (2, 7, base + dt.timedelta(minutes=10), "click", 1.0, "{}"),
        (3, 7, base + dt.timedelta(minutes=50), "click", 1.0, "{}"),  # 40min gap
        (4, 8, base, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    got = {r["event_id"]: r["session_id"] for r in sessionize(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_chunk_dedup_planted_chunk(spark):
    """Doc 2 reuses doc 1's first 20-token chunk: exactly that one
    chunk is flagged; doc 1 (the first occurrence) keeps zero flags."""
    from level_mapreduce_spark.operators.dedup import chunk_dedup

    shared = " ".join(f"w{i}" for i in range(20))
    uniq1 = " ".join(f"x{i}" for i in range(20))
    uniq2 = " ".join(f"y{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, f"{shared} {uniq1}"), (2, f"{shared} {uniq2}"), (3, "short doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_frac"])
        for r in chunk_dedup(df, chunk_tokens=20).collect()
    }
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (1, 0, 0.0)


def test_repeated_spans_hand_checked(spark):
    """Hand-computed span merges: cross-doc shared passage, overlapping
    windows merged into one maximal span, an internal repeat whose
    touching coverage intervals fuse, and zero rows for unique/short
    docs."""
    from level_mapreduce_spark.operators.dedup import repeated_spans

    rows = [
        (0, "a b c d e"),           # shared with doc 1: 1 span, all 5
        (1, "a b c d e u1 u2"),     # same 5-token prefix, 2 unique
        (2, "x y z q w"),           # unique: no dup windows
        (3, "p q r s p q r s"),     # internal repeat: pqr/qrs twice,
                                    # coverage [1,4]+[5,8] touches -> 1 span
        (4, "k m"),                 # shorter than ngram: zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_spans"], r["dup_tokens"], r["dup_span_frac"]
        )
        for r in repeated_spans(df, ngram=3).collect()
    }
    assert got[0] == (5, 1, 5, 1.0)
    assert got[1] == (7, 1, 5, pytest.approx(5 / 7, abs=1e-6))
    assert got[2] == (5, 0, 0, 0.0)
    assert got[3] == (8, 1, 8, 1.0)
    assert got[4] == (2, 0, 0, 0.0)


def test_repeated_spans_disjoint_spans(spark):
    """Two separated duplicated passages in one doc stay two spans —
    the island break (pos > covered_end + 1) is exercised, and a
    duplicate WITHIN ngram-1 tokens of the previous span's end merges
    instead."""
    from level_mapreduce_spark.operators.dedup import repeated_spans

    shared_a = "a1 a2 a3"
    shared_b = "b1 b2 b3"
    rows = [
        # doc 0: both shared passages, separated by 3 unique tokens ->
        # coverage [1,3] and [7,9]: two spans, 6 dup tokens of 9
        (0, f"{shared_a} u1 u2 u3 {shared_b}"),
        (1, f"{shared_a} v1 v2 v3 v4"),
        (2, f"{shared_b} w1 w2 w3 w4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["dup_tokens"])
        for r in repeated_spans(df, ngram=3).collect()
    }
    assert got[0] == (2, 6)
    assert got[1] == (1, 3)
    assert got[2] == (1, 3)


def test_repeated_spans_differential_bruteforce(spark):
    """Randomized differential: repeated_spans vs a pure-Python
    brute-force over 60 docs drawn from a tiny vocabulary (dense
    duplicate structure), seeds pinned."""
    import random as _random

    from level_mapreduce_spark.operators.dedup import repeated_spans

    rng = _random.Random(1307)
    n, vocab = 5, [f"t{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(60)
    ]
    # brute force: every n-token window text -> occurrence count;
    # per doc union covered positions of windows with count > 1
    from collections import Counter

    toks = {i: [t for t in s.lower().split(" ") if t] for i, s in docs}
    cnt = Counter(
        tuple(tk[p : p + n])
        for tk in toks.values()
        for p in range(len(tk) - n + 1)
    )
    expect = {}
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - n + 1):
            if cnt[tuple(tk[p : p + n])] > 1:
                covered.update(range(p, p + n))
        spans = 0
        prev = None
        for p in sorted(covered):
            if prev is None or p > prev + 1:
                spans += 1
            prev = p
        expect[i] = (len(tk), spans, len(covered))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_spans"], r["dup_tokens"])
        for r in repeated_spans(df, ngram=n).collect()
    }
    assert got == expect


def test_text_repetition_signals(spark):
    """Hand-checked ratios, and sub-2-token docs get null bigram
    metrics rather than garbage."""
    from level_mapreduce_spark.operators.text import text_repetition

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "solo"), (3, "go go go go")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_repetition(df).collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 3
    assert r1["dup_token_frac"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert r1["dup_bigram_frac"] == 0.0  # a_a, a_b distinct
    assert r1["top_bigram_frac"] == 0.5
    r2 = rows[2]
    assert r2["dup_token_frac"] == 0.0
    assert r2["dup_bigram_frac"] is None
    assert r2["top_bigram_frac"] is None
    r3 = rows[3]  # go x4: bigrams all "go_go"
    assert r3["dup_token_frac"] == 0.75
    assert r3["dup_bigram_frac"] == pytest.approx(1 - 1 / 3, abs=1e-6)
    assert r3["top_bigram_frac"] == 1.0


def test_knn_join_matches_brute_topk(emb):
    """knn_join's probe-0 block equals brute_topk minus the self-match."""
    from level_mapreduce_spark.operators.similarity import knn_join

    probes = emb.where(F.col("vec_id") == 0)
    got = [
        (r["vec_id"], r["sim"])
        for r in knn_join(emb, probes, k=10)
        .orderBy("rnk")
        .collect()
    ]
    probe = probe_vector(emb, 0)
    want = [
        (r["vec_id"], r["sim"])
        for r in brute_topk(emb, probe, k=11).collect()
        if r["vec_id"] != 0
    ]
    assert got == want


def test_semantic_dedup_planted_copies(spark):
    """Exact copies must resolve leader=original at sim 1.0 (the copy
    ties its original on rounded centroid-sim and loses the vec_id
    tie-break); unique vectors and the zero vector are kept."""
    import numpy as np

    from level_mapreduce_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(11)
    X = rng.normal(size=(30, 8))
    X[20:25] = X[0:5]  # exact copies
    X[29] = 0.0
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    cents = [[float(v) for v in c] for c in rng.normal(size=(4, 8))]
    cents = [
        [v / sum(x * x for x in c) ** 0.5 for v in c] for c in cents
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, centroids=cents, threshold=0.95).collect()
    }
    assert len(out) == 30
    for i in range(20, 25):
        r = out[i]
        assert not r["keep"] and r["leader_id"] == i - 20, dict(r.asDict())
        assert r["leader_sim"] == 1.0
        assert r["cluster"] == out[i - 20]["cluster"]
    z = out[29]
    assert z["keep"] and z["cluster"] == -1 and z["centroid_sim"] == 0.0
    # originals keep (corpus is random gaussian — no natural 0.95 pair)
    assert all(out[i]["keep"] for i in range(5))


def test_semantic_dedup_differential_bruteforce(spark):
    """Randomized differential vs a numpy replica of the full SemDeDup
    decision (assignment argmax on rounded scores, centroid-sim rank,
    earliest-leader pick) with a TRAINED codebook and planted
    near-dups."""
    import numpy as np

    from level_mapreduce_spark.operators.ivf import train_centroids
    from level_mapreduce_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(7)
    n, d = 120, 16
    X = rng.normal(size=(n, d))
    X[80:100] = X[0:20] + rng.normal(scale=1e-4, size=(20, d))
    X[110] = 0.0
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = train_centroids(df, n_centroids=6, seed=42)
    got = {
        r["vec_id"]: r
        for r in semantic_dedup(df, centroids=cents, threshold=0.95).collect()
    }

    def rnd6(v):
        import decimal

        return float(
            decimal.Decimal(repr(float(v))).quantize(
                decimal.Decimal("1e-6"), rounding=decimal.ROUND_HALF_UP
            )
        )

    C = np.array(cents)
    hn = (C * C).sum(1) / 2
    clu, csim = {}, {}
    for i in range(n):
        x = X[i]
        if (x * x).sum() == 0:
            clu[i], csim[i] = -1, 0.0
            continue
        s = np.array([rnd6(v) for v in x @ C.T - hn])
        c = int(np.where(s == s.max())[0][0])
        clu[i] = c
        csim[i] = rnd6(
            x @ C[c] / (np.linalg.norm(x) * np.linalg.norm(C[c]))
        )
    order = {}
    for c in set(clu.values()):
        if c < 0:
            continue
        members = sorted(
            [i for i in range(n) if clu[i] == c],
            key=lambda i: (csim[i], i),
        )
        for rk, i in enumerate(members):
            order[i] = rk + 1
    for i in range(n):
        r = got[i]
        assert r["cluster"] == clu[i], (i, r["cluster"], clu[i])
        assert abs(r["centroid_sim"] - csim[i]) < 2e-6
        if clu[i] < 0:
            assert r["keep"]
            continue
        best = None
        for j in range(n):
            if clu[j] == clu[i] and order[j] < order[i]:
                nj, ni = np.linalg.norm(X[j]), np.linalg.norm(X[i])
                if nj * ni == 0:
                    continue
                cs = rnd6(X[i] @ X[j] / (ni * nj))
                if cs >= 0.95 and (best is None or order[j] < best[0]):
                    best = (order[j], j, cs)
        if best is None:
            assert r["keep"], i
        else:
            assert not r["keep"] and r["leader_id"] == best[1], (
                i,
                dict(r.asDict()),
                best,
            )
            assert abs(r["leader_sim"] - best[2]) < 2e-6


def test_pack_documents_shards_track_parallelism(spark):
    """pack_documents' only window partitions by shard, so shard count
    IS its parallelism ceiling — the default must track the cluster
    (defaultParallelism), not a fixed constant, and every doc's pack
    must stay within its shard's budget quantization."""
    from level_mapreduce_spark.operators.text import pack_documents

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 7 + 1)) for i in range(400)],
        "doc_id long, text string",
    )
    out = pack_documents(docs, budget=16)
    shards = out.select("shard").distinct().count()
    # 400 docs across defaultParallelism shards: every shard id occupied
    assert shards == spark.sparkContext.defaultParallelism
    # per-shard invariant: pack_id quantizes the running token total
    rows = sorted(
        out.collect(), key=lambda r: (r["shard"], r["doc_id"])
    )
    cum = {}
    for r in rows:
        start = cum.get(r["shard"], 0)
        assert r["pack_id"] == start // 16
        cum[r["shard"]] = start + r["n_tokens"]


def test_multimodal_resize_and_frames(docs):
    """Resize keeps 1:1 cardinality with size-exact payloads; frame
    sampling expands one video row into ordered frame rows (capped),
    and both real-codec paths are explicitly stubbed."""
    import pytest as _pytest

    from level_mapreduce_spark.operators import multimodal as mm

    media = mm.attach_fake_media(docs)
    rs = mm.resize_images(media, width=4, height=4)
    rows = rs.collect()
    assert len(rows) == media.count()
    assert all(len(r["payload"]) == 16 for r in rows)
    assert all(r["width"] == 4 and r["height"] == 4 for r in rows)

    vids = media.where("media_type = 'video'")
    fr = mm.sample_frames(media, every_n_bytes=16, max_frames=4)
    got = fr.collect()
    assert {r["media_id"] for r in got} == {
        r["media_id"] for r in vids.collect()
    }
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense, ordered
        assert len(idxs) <= 4
    with _pytest.raises(NotImplementedError):
        mm.resize_images(media, decode_fn="real")
    with _pytest.raises(NotImplementedError):
        mm.sample_frames(media, decode_fn="real")


def test_bpe_token_count_classes(spark):
    """BPE pre-token estimate splits on GPT-2 classes: contraction
    suffixes, space-prefixed letter/digit/punct runs."""
    from level_mapreduce_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [
            ("it's 2024, really!?", 6),  # [it]['s][ 2024][,][ really][!?]
            ("hello world", 2),
            ("a1b2", 4),
            ("", 0),
        ],
        "text string, want long",
    )
    rows = df.select("want", bpe_token_count("text").alias("got")).collect()
    assert all(r["got"] == r["want"] for r in rows), rows


def test_text_repetition_grouped_matches_expr(docs):
    """The shuffle-based book-length plan must equal the narrow
    expression plan row-for-row (including <2-token null semantics)."""
    from level_mapreduce_spark.operators.text import text_repetition

    expr_rows = {r["doc_id"]: r for r in text_repetition(docs).collect()}
    grp_rows = {
        r["doc_id"]: r
        for r in text_repetition(docs, mode="grouped").collect()
    }
    assert expr_rows.keys() == grp_rows.keys()
    for did, e in expr_rows.items():
        g = grp_rows[did]
        assert (
            e["n_tokens"],
            e["dup_token_frac"],
            e["dup_bigram_frac"],
            e["top_bigram_frac"],
        ) == (
            g["n_tokens"],
            g["dup_token_frac"],
            g["dup_bigram_frac"],
            g["top_bigram_frac"],
        ), did


def test_scrub_pii(spark):
    """PII spans are replaced by kind tags; counts come from the
    original text; clean docs pass through unchanged."""
    from level_mapreduce_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@site.org or call +1 (555) 123-4567 now"),
            (2, "server 10.0.255.7 rebooted"),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert rows[1]["n_email"] == 1 and rows[1]["n_phone"] == 1
    assert "<EMAIL>" in rows[1]["scrubbed_text"]
    assert "<PHONE>" in rows[1]["scrubbed_text"]
    assert "jo.doe" not in rows[1]["scrubbed_text"]
    assert "555" not in rows[1]["scrubbed_text"]
    assert rows[2]["n_ipv4"] == 1
    assert rows[2]["scrubbed_text"] == "server <IPV4> rebooted"
    assert rows[3]["scrubbed_text"] == "no pii here"
    assert (
        rows[3]["n_email"] == rows[3]["n_phone"] == rows[3]["n_ipv4"] == 0
    )


def test_c4_line_filter(spark):
    """Line rules: terminal punctuation + min words + no boilerplate
    markers; brace documents are dropped wholesale."""
    from level_mapreduce_spark.operators.text import c4_line_filter

    df = spark.createDataFrame(
        [
            (1, "This sentence is properly terminated.\nshort.\n"
                "Enable JavaScript to view this page.\n"
                "Another good line stays here!"),
            (2, "function f() { return 1; }\nReal prose would end well."),
            (3, "no terminal punctuation at all"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_line_filter(df).collect()}
    assert rows[1]["n_lines"] == 4 and rows[1]["n_kept_lines"] == 2
    assert rows[1]["clean_text"] == (
        "This sentence is properly terminated.\nAnother good line stays here!"
    )
    assert rows[1]["keep"]
    assert not rows[2]["keep"]          # brace document
    assert rows[2]["n_kept_lines"] == 1  # the prose line itself passes
    assert not rows[3]["keep"] and rows[3]["n_kept_lines"] == 0


def test_sketch_rollup_distinct_users(spark, sf_dir):
    """HLL sketch rollup: range estimates from unioned hour sketches
    stay within HLL error of the exact rescan answer, the day-level
    cascade built from hour sketches agrees with day sketches built
    from raw events, and no raw scan happens at query time."""
    from level_mapreduce_spark.operators.sketches import (
        distinct_users_between,
        rollup_sketches,
        user_sketches,
    )
    from level_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    hours = user_sketches(events).persist()
    lo = events.select(F.min("ts").cast("string")).first()[0]
    # whole-range estimate vs exact distinct (end bound exclusive on
    # bucket starts, so push it past max ts)
    est = distinct_users_between(hours, lo, "9999-01-01").first()["n_users_est"]
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # per-type estimates track the exact per-type counts
    per_type = {
        r["event_type"]: r["n_users_est"]
        for r in distinct_users_between(
            hours, lo, "9999-01-01", by_type=True
        ).collect()
    }
    for r in events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    ).collect():
        assert abs(per_type[r["event_type"]] - r["n"]) / r["n"] < 0.05
    # cascade: day sketches from hour sketches == day sketches from raw
    day_from_hours = rollup_sketches(hours, "1 day")
    day_from_raw = user_sketches(events, "1 day")
    a = {
        (r["ws"], r["event_type"]): r["n"]
        for r in day_from_hours.select(
            "ws", "event_type",
            F.hll_sketch_estimate("sketch").cast("long").alias("n"),
        ).collect()
    }
    b = {
        (r["ws"], r["event_type"]): r["n"]
        for r in day_from_raw.select(
            "ws", "event_type",
            F.hll_sketch_estimate("sketch").cast("long").alias("n"),
        ).collect()
    }
    assert a == b and a
    # empty range: global form reports 0 (not a NULL union estimate),
    # grouped form simply has no rows
    empty = distinct_users_between(hours, "1901-01-01", "1902-01-01")
    assert empty.collect() == [(0,)] or empty.first()["n_users_est"] == 0
    assert (
        distinct_users_between(
            hours, "1901-01-01", "1902-01-01", by_type=True
        ).count()
        == 0
    )
    hours.unpersist()


def test_kll_quantile_rollup(spark, sf_dir):
    """KLL quantile rollup: any-range quantile estimates off merged
    hour sketches track the exact percentiles, and the day-level
    cascade merged from hour sketches answers like sketches built
    from raw events (merge losslessness)."""
    from level_mapreduce_spark.operators.sketches import (
        quantiles_between,
        rollup_quantile_sketches,
        value_quantile_sketches,
    )
    from level_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").persist()
    total = events.count()

    def emp_rank(v: float) -> float:
        # empirical rank of a value in the exact distribution — KLL
        # guarantees RANK error (~1.65% at default k), not value
        # error, so assertions compare ranks, not values
        return events.where(F.col("value") <= v).count() / total

    hours = value_quantile_sketches(events).persist()
    est = quantiles_between(hours, "1900-01-01", "9999-01-01").first()
    for got, want_rank in zip(
        (est["q_5"], est["q_9"], est["q_99"]), (0.5, 0.9, 0.99)
    ):
        assert abs(emp_rank(got) - want_rank) < 0.04, (got, want_rank)
    # per-type grouped form returns one row per event_type
    n_types = events.select("event_type").distinct().count()
    assert (
        quantiles_between(
            hours, "1900-01-01", "9999-01-01", by_type=True
        ).count()
        == n_types
    )
    # cascade: day-from-hours ranks == day-from-raw ranks (merge
    # preserves the rank guarantee; the sketches themselves differ)
    day_a = rollup_quantile_sketches(hours, "1 day")
    day_b = value_quantile_sketches(events, "1 day")
    qa = quantiles_between(day_a, "1900-01-01", "9999-01-01").first()
    qb = quantiles_between(day_b, "1900-01-01", "9999-01-01").first()
    for a, b in zip(qa, qb):
        assert abs(emp_rank(a) - emp_rank(b)) < 0.05, (a, b)
    hours.unpersist()
    events.unpersist()


def test_theta_overlap_retention(spark, sf_dir):
    """Theta set algebra off stored sketches: |A∩B| (retention) and
    |A\\B| (churn) between the two halves of the time range track the
    exact distinct-set answers; identities |A| ≈ both + only_a hold
    within sketch error."""
    from level_mapreduce_spark.operators.sketches import (
        theta_user_sketches,
        user_overlap,
    )
    from level_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    b = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    # align the split to an hour-bucket boundary so bucket-granularity
    # range selection agrees exactly with the ts split below
    mid = (b["lo"] + (b["hi"] - b["lo"]) / 2).replace(
        minute=0, second=0, microsecond=0
    )
    hours = theta_user_sketches(events)
    got = user_overlap(hours, "1900-01-01", mid, mid, "9999-01-01").first()

    a_set = events.where(F.col("ts") < mid).select("user_id").distinct()
    b_set = events.where(F.col("ts") >= mid).select("user_id").distinct()
    exact_a = a_set.count()
    exact_b = b_set.count()
    exact_both = a_set.intersect(b_set).count()
    exact_only_a = exact_a - exact_both

    # theta union is near-exact at this cardinality; intersection
    # error compounds — allow a wider bound
    assert abs(got["a_users"] - exact_a) / exact_a < 0.05
    assert abs(got["b_users"] - exact_b) / exact_b < 0.05
    assert abs(got["both"] - exact_both) / max(exact_both, 1) < 0.15
    assert abs(got["only_a"] - exact_only_a) / max(exact_only_a, 1) < 0.15
    # empty A range: estimates coalesce to 0, intersection with B is 0
    empty = user_overlap(
        hours, "1900-01-01", "1900-01-02", mid, "9999-01-01"
    ).first()
    assert empty["a_users"] == 0 and empty["both"] == 0
    assert abs(empty["b_users"] - exact_b) / exact_b < 0.05


def test_contamination_check(spark, docs):
    """Planted benchmark text inside one training doc is detected with
    the right overlap count; clean docs produce no rows; the probe
    side broadcasts (corpus never shuffles on the join)."""
    from level_mapreduce_spark.operators.dedup import contamination_check

    bench_text = "the quick brown fox jumps over the lazy sleeping dog"
    train = spark.createDataFrame(
        [
            (1, "prefix words here " + bench_text + " suffix words here"),
            (2, "completely unrelated content about skies and oceans today"),
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame(
        [(100, bench_text)], "probe_id long, text string"
    )
    out = contamination_check(train, probes, k=8)
    rows = out.collect()
    assert len(rows) == 1
    (r,) = rows
    # bench text has 10 tokens -> 3 distinct 8-grams, all present in doc 1
    assert (r["doc_id"], r["probe_id"], r["n_overlap"]) == (1, 100, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # a clean corpus yields zero rows
    assert contamination_check(docs, probes, k=8).count() == 0


def test_decontaminate_removes_flagged_docs(spark, docs):
    """The removal step: contaminated docs (>= min_overlap shared
    k-grams with a probe) disappear; the rest pass through intact,
    and the corpus side never shuffles (broadcast anti-join)."""
    from level_mapreduce_spark.operators.dedup import (
        contamination_check,
        decontaminate,
    )

    probes = docs.where(F.col("doc_id") % 100 == 0).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    flagged = {
        r["doc_id"]
        for r in contamination_check(docs, probes, k=8).collect()
    }
    assert flagged  # probes at least match themselves
    clean = decontaminate(docs, probes, k=8)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert kept == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    } - flagged
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_mixture_rates_water_filling(spark, docs):
    """Downsample-only mixture solve: applying the solved rates with
    sample_by_key lands the kept corpus on the target proportions
    (within sampling noise), the binding stratum keeps rate 1.0, and
    strata missing from the target get rate 0."""
    from collections import Counter

    from level_mapreduce_spark.operators.text import (
        mixture_rates,
        sample_by_key,
    )

    target = {"en": 0.5, "fr": 0.5}
    rates = mixture_rates(docs, target)
    assert rates["fr"] == 1.0  # fr is scarcer relative to a 50% share
    assert 0 < rates["en"] < 1
    assert rates.get("de") == 0.0  # not in the target mixture
    kept = Counter(
        r["lang"]
        for r in sample_by_key(docs, rates, default_rate=0.0)
        .where("sampled")
        .collect()
    )
    assert set(kept) <= {"en", "fr"}
    frac_en = kept["en"] / sum(kept.values())
    assert abs(frac_en - 0.5) < 0.12, kept


def test_quality_filter_gopher_gates(spark):
    """Each Gopher gate rejects independently: too short, stopword-
    free, a giant junk 'word', and a symbol-dominated doc all drop;
    ordinary prose passes."""
    from level_mapreduce_spark.operators.text import quality_filter

    prose = ("the quick brown fox jumps over the lazy dog and runs on " * 5)
    docs = spark.createDataFrame(
        [
            (1, prose),
            (2, "short text only"),                      # < min_tokens
            (3, ("zebra quokka lorikeet wombat dingo " * 10)),  # no stopwords
            (4, prose + " " + "x" * 80),                 # junk mega-word
            (5, ("$$$ 123 %%% 456 ### 789 " * 10) + "the of"),  # low alpha
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert rows[1]["keep"]
    assert not rows[2]["keep"]
    assert not rows[3]["keep"] and rows[3]["stop_ratio"] == 0.0
    assert not rows[4]["keep"] and rows[4]["max_word"] == 80
    assert not rows[5]["keep"] and rows[5]["alpha_ratio"] < 0.6


def test_dedup_lines_first_occurrence(spark):
    """Repeated lines collapse to their first occurrence, order
    preserved; unique documents pass through untouched."""
    from level_mapreduce_spark.operators.text import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "nav bar\nreal content.\nnav bar\nmore content.\nnav bar"),
            (2, "a\nb\nc"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert rows[1]["deduped_text"] == "nav bar\nreal content.\nmore content."
    assert (rows[1]["n_lines"], rows[1]["n_unique_lines"]) == (5, 3)
    assert rows[2]["deduped_text"] == "a\nb\nc"
    assert rows[2]["n_unique_lines"] == 3


def test_split_dataset_deterministic(spark, docs):
    """Same doc -> same split across runs and repartitionings; split
    fractions land near the requested weights; different seeds give
    different assignments."""
    from level_mapreduce_spark.operators.text import split_dataset

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in split_dataset(docs, w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs.repartition(7), w).collect()
    }
    assert a == b  # partitioning-independent
    n = len(a)
    from collections import Counter

    frac = {k: v / n for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.8) < 0.08 and abs(frac["val"] - 0.1) < 0.06
    c = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs, w, seed=1).collect()
    }
    assert c != a  # seed moves the assignment
    assert set(a.values()) <= set(w)


def test_split_dataset_md5_portable(spark, docs):
    """The md5 hash variant is engine-portable: recomputing
    md5(key || ':' || seed) with hashlib and cutting at the shared
    hex boundaries reproduces Spark's assignment exactly — the
    property that makes the split oracle-checkable and reproducible
    outside Spark. Fractions still land near the weights."""
    import hashlib
    from collections import Counter

    from level_mapreduce_spark.operators.text import (
        md5_split_cuts,
        split_dataset,
    )

    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in split_dataset(docs, w, seed=7, hash_fn="md5").collect()
    }
    cuts = md5_split_cuts(w)

    def expect(doc_id):
        h = hashlib.md5(f"{doc_id}:7".encode()).hexdigest()
        for name, bound in cuts:
            if h < bound:
                return name
        return list(w)[-1]

    assert got == {d: expect(d) for d in got}
    n = len(got)
    frac = {k: v / n for k, v in Counter(got.values()).items()}
    assert abs(frac["train"] - 0.8) < 0.08


def test_sample_by_key_stratified(spark, docs):
    """Stratified deterministic sampling: per-stratum keep fractions
    track the requested rates, unlisted strata keep everything at the
    default rate, the keep set is stable under repartitioning, and the
    md5 variant is reproducible outside Spark via hashlib."""
    import hashlib

    from level_mapreduce_spark.operators.text import (
        md5_fraction_bound,
        sample_by_key,
    )

    rates = {"en": 0.3}
    out = sample_by_key(docs, rates, hash_fn="md5").select(
        "doc_id", "lang", "sampled"
    )
    rows = out.collect()
    en = [r for r in rows if r["lang"] == "en"]
    other = [r for r in rows if r["lang"] != "en"]
    kept_en = sum(r["sampled"] for r in en) / len(en)
    assert abs(kept_en - 0.3) < 0.12
    assert all(r["sampled"] for r in other)  # default_rate=1.0 keeps all
    # portability: hashlib reproduces the exact keep set
    bound = md5_fraction_bound(0.3)
    for r in en:
        assert r["sampled"] == (
            hashlib.md5(f"{r['doc_id']}:0".encode()).hexdigest() < bound
        )
    # stable under repartitioning
    again = {
        r["doc_id"]: r["sampled"]
        for r in sample_by_key(
            docs.repartition(7), rates, hash_fn="md5"
        ).select("doc_id", "sampled").collect()
    }
    assert again == {r["doc_id"]: r["sampled"] for r in rows}


def test_session_aggregates_agrees_with_sessionize(spark, sf_dir):
    """The native session_window aggregate and the window-function
    sessionizer are twins: same per-user session counts, and summed
    per-session event counts cover every event."""
    from level_mapreduce_spark.operators.events import (
        session_aggregates,
        sessionize,
    )
    from level_mapreduce_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    agg = session_aggregates(events).persist()
    a = {
        r["user_id"]: r["n_sessions"]
        for r in agg.groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
        .collect()
    }
    b = {
        r["user_id"]: r["n_sessions"]
        for r in sessionize(events)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
        .collect()
    }
    assert a == b and a
    # every event lands in exactly one session
    assert agg.agg(F.sum("n")).first()[0] == events.count()
    # session bounds are consistent: start <= end - and the end is
    # start-of-last-event + gap, so strictly greater
    assert agg.where(F.col("session_end") <= F.col("session_start")).count() == 0
    agg.unpersist()


def test_hashed_features_vectorizer(spark, docs):
    """Feature hashing: identical texts vectorize identically (cosine
    1), vectors are unit-norm, the output schema plugs into the
    embedding similarity stack, and the plan stays JVM-side."""
    from level_mapreduce_spark.operators.similarity import brute_topk
    from level_mapreduce_spark.operators.text import hashed_features

    base = docs.limit(40)
    clone = base.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    vecs = hashed_features(base.unionByName(clone), dim=64).persist()
    rows = {r["vec_id"]: list(r["embedding"]) for r in vecs.collect()}
    # clones vectorize identically to their source
    matched = 0
    for vid, v in rows.items():
        if vid >= 100000 and any(x != 0 for x in v):
            assert v == rows[vid - 100000]
            matched += 1
    assert matched >= 4
    # unit norm (non-empty docs)
    for v in rows.values():
        n = sum(x * x for x in v) ** 0.5
        if n:
            assert abs(n - 1.0) < 1e-5
    # plugs into the ANN stack: the clone's nearest neighbor by cosine
    # is its source (or itself-distance ties), found by brute_topk
    probe_id = next(v for v in rows if v >= 100000)
    probe = rows[probe_id]
    top = [r["vec_id"] for r in brute_topk(vecs, probe, k=2).collect()]
    assert set(top) == {probe_id, probe_id - 100000}
    # JVM-only plan
    plan = (
        hashed_features(base)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    vecs.unpersist()


def test_edit_distance_pairs(spark):
    """q-gram blocked + levenshtein-verified fuzzy pairs: typo'd
    twins found with their exact distances, unrelated titles absent,
    length-incompatible strings never verified, plan stays JVM-side
    with no cartesian product."""
    from level_mapreduce_spark.operators.dedup import edit_distance_pairs

    titles = spark.createDataFrame(
        [
            (1, "the matrix"),
            (2, "the martix"),        # transposition: dist 2
            (3, "the matrix!"),       # insertion: dist 1
            (4, "completely different film"),
            (5, "an unrelated documentary"),
            (6, "xx"),                # short + length-incompatible
        ],
        "doc_id long, text string",
    )
    out = edit_distance_pairs(titles, max_dist=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    # 2-3 is dist 3 (transposition counts 2 + the '!' insertion) —
    # correctly OVER max_dist and absent
    assert got == {(1, 2): 2, (1, 3): 1}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan

    # hot-segment cap: equal-value duplicates are IMMUNE to the cap
    # (the value self-join needs no blocking), and PassJoin keys carry
    # the value length, so the residual loss needs > cap SAME-LENGTH
    # distinct values sharing an exact segment — near-clone template
    # strings differing only in a tail char. The diagnostic frame SAYS
    # what was dropped instead of leaving the miss silent. Strings are
    # >= (max_dist+1)*q long so the short stratum does not rescue
    # them.
    template = spark.createDataFrame(
        [(i, "a" * 20 + ch) for i, ch in enumerate("bcdefghijk")],
        "doc_id long, text string",
    )
    pairs, hot = edit_distance_pairs(
        template, max_gram_freq=5, return_hot_grams=True
    )
    # every pair differs only in the last char (dist 1) yet the two
    # shared leading segments are capped and the distinct tail
    # segments never collide -> all lost, and the diagnostic says why
    assert pairs.count() == 0
    dropped = {(r["_j"], r["_pl"], r["_g"]): r["count"] for r in hot.collect()}
    assert set(dropped) == {(0, 21, "a" * 7), (1, 21, "a" * 7)}
    assert all(v == 10 for v in dropped.values())
    # all-repetition strings of DIFFERENT lengths are no longer a cap
    # casualty: PassJoin keys are length-scoped, so "a"*8 vs "a"*9
    # collide on their own key without crossing the cap
    monotone = spark.createDataFrame(
        [(i, "a" * (8 + i)) for i in range(10)],
        "doc_id long, text string",
    )
    mono_pairs = edit_distance_pairs(monotone, max_gram_freq=5)
    got_mono = {
        (r["id_a"], r["id_b"]): r["dist"] for r in mono_pairs.collect()
    }
    assert got_mono == {
        (i, j): j - i
        for i in range(10)
        for j in range(i + 1, 10)
        if j - i <= 2
    }
    # ...and EXACT duplicates of one degenerate string are found
    # regardless of any cap
    dupes = spark.createDataFrame(
        [(i, "aaaaaaaa") for i in range(4)], "doc_id long, text string"
    )
    dup_pairs, dup_hot = edit_distance_pairs(
        dupes, max_gram_freq=0, return_hot_grams=True
    )
    assert dup_pairs.count() == 6  # C(4,2), all dist 0
    assert {r["_g"] for r in dup_hot.collect()} == {"aa", "aaa"}
    # clean corpus: no grams dropped, diagnostic is empty
    _, hot_clean = edit_distance_pairs(
        titles, max_dist=2, return_hot_grams=True
    )
    assert hot_clean.count() == 0

    # sub-(max_dist+1)*q stratum: a distance-2 pair of 2-char strings
    # shares no bigram — the gram index can never block it, so the
    # exact distinct-value pass must find it (and the empty string,
    # which emits no gram rows at all)
    shorts = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, ""), (4, "xy"), (5, "ab")],
        "doc_id long, text string",
    )
    got_short = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(shorts, max_dist=2).collect()
    }
    assert got_short == {
        (1, 2): 2,   # ab~cd: two substitutions, zero shared grams
        (1, 3): 2,   # ab~'': two deletions (empty string emits no gram)
        (1, 4): 2, (1, 5): 0,  # ...(1,5) = exact duplicate short string
        (2, 3): 2, (2, 4): 2, (2, 5): 2,
        (3, 4): 2, (3, 5): 2, (4, 5): 2,
    }

    # q=1 would leave mixed short/long pairs (e.g. 'a' vs 'abc' at
    # max_dist=2) covered by NEITHER stratum — refused loudly instead
    # of returning silently incomplete recall (r9 advice)
    with pytest.raises(ValueError, match="q must be >= 2"):
        edit_distance_pairs(titles, max_dist=2, q=1)

    # duplicated input rows per id must not duplicate output pairs:
    # the value->id joins emit per id occurrence, so uniqueness is
    # enforced on the ids frame (r9 advice — the PassJoin rewrite had
    # dropped the old pair-level dedup)
    doubled = titles.unionByName(titles)
    got_doubled = [
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(doubled, max_dist=2).collect()
    ]
    assert sorted(got_doubled) == [(1, 2, 2), (1, 3, 1)]


def test_rolling_user_value_range_frame(spark):
    """Trailing-hour RANGE frame: events within the window sum, an
    event exactly at the boundary is included, older ones fall out,
    and users don't mix."""
    from level_mapreduce_spark.operators.events import rolling_user_value

    rows = [
        (1, "2024-01-01 10:00:00", 1, 1.00),
        (2, "2024-01-01 10:30:00", 1, 2.00),
        (3, "2024-01-01 11:00:00", 1, 4.00),   # 10:00 still in range
        (4, "2024-01-01 11:30:01", 1, 8.00),   # 10:30 just expired
        (5, "2024-01-01 10:15:00", 2, 16.00),  # other user, isolated
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: r["trailing_cents"]
        for r in rolling_user_value(events).collect()
    }
    assert got == {1: 100, 2: 300, 3: 700, 4: 1200, 5: 1600}


def test_bm25_topk_matches_reference_formula(spark):
    """BM25 scores agree with a direct python evaluation of the
    Okapi formula (idf = ln(1+(N-df+.5)/(df+.5)), k1=1.2, b=0.75) on
    a hand-built corpus; ranking is score-desc with doc_id tiebreak;
    docs without any query term are absent; plan stays JVM-side."""
    import math

    from level_mapreduce_spark.operators.text import bm25_topk

    corpus = {
        1: "spark shuffles data across the cluster",
        2: "spark spark spark everywhere spark",
        3: "ducks prefer columnar storage",
        4: "the cluster runs spark jobs nightly",
        5: "completely unrelated text here",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    out = bm25_topk(docs, "spark cluster", k=10)
    got = [(r["doc_id"], r["score"]) for r in out.collect()]

    toks = {d: t.lower().split() for d, t in corpus.items()}
    n, avgdl = len(toks), sum(len(t) for t in toks.values()) / len(toks)
    k1, b = 1.2, 0.75
    q = ["cluster", "spark"]
    df = {w: sum(w in t for t in toks.values()) for w in q}
    want = {}
    for d, t in toks.items():
        s = 0.0
        for w in q:
            tf = t.count(w)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if s > 0:
            want[d] = round(s, 6)
    want_ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want_ranked
    assert 5 not in dict(got) and 3 not in dict(got)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_profile_table_one_pass(spark):
    """profile_table: exact null counts/rates, HLL-bounded distinct
    estimates, string min/max per column — and exactly one aggregate
    job (every measure fused into a single pass)."""
    from level_mapreduce_spark.operators.text import profile_table

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, None, 30.0),
            (4, "b", 40.0),
        ],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["null_rate"] == 0.25
    assert prof["v"]["n_nulls"] == 1
    assert prof["id"]["n_nulls"] == 0 and prof["id"]["null_rate"] == 0.0
    # distinct estimates exact at this cardinality (nulls not counted)
    assert prof["id"]["approx_distinct"] == 4
    assert prof["s"]["approx_distinct"] == 2
    assert (prof["id"]["min"], prof["id"]["max"]) == ("1", "4")
    assert (prof["s"]["min"], prof["s"]["max"]) == ("a", "b")


def _brute_lev_pairs(strings, max_dist):
    """Reference implementation: all-pairs python levenshtein."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = {}
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            d = lev(strings[i].lower(), strings[j].lower())
            if d <= max_dist:
                out[(i, j)] = d
    return out


def test_edit_distance_pairs_blocking_complete_property(spark):
    """Property (hypothesis): over random word-like strings and their
    random single/double mutations, the q-gram-blocked operator finds
    EXACTLY the brute-force levenshtein<=2 pair set with exact
    distances — blocking never loses a pair. Strings span BOTH length
    regimes: long enough for the shared-gram bound AND the
    sub-(max_dist+1)*q stratum (down to single characters, whose
    deletions produce empty strings) that the exact distinct-value
    pass must cover."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from level_mapreduce_spark.operators.dedup import edit_distance_pairs

    alphabet = "abcdefgh"

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        base = data.draw(
            st.lists(
                st.text(alphabet, min_size=1, max_size=14),
                min_size=4,
                max_size=8,
                unique=True,
            )
        )
        strings = list(base)
        # mutate a few: substitution, insertion, or deletion
        for s in base[:3]:
            kind = data.draw(st.sampled_from(["sub", "ins", "del"]))
            pos = data.draw(st.integers(0, len(s) - 1))
            ch = data.draw(st.sampled_from(alphabet))
            if kind == "sub":
                t = s[:pos] + ch + s[pos + 1 :]
            elif kind == "ins":
                t = s[:pos] + ch + s[pos:]
            else:
                t = s[:pos] + s[pos + 1 :]
            strings.append(t)
        df = spark.createDataFrame(
            list(enumerate(strings)), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(df, max_dist=2).collect()
        }
        want = _brute_lev_pairs(strings, 2)
        assert got == want

    run()


@pytest.mark.parametrize("shape", ["all_equal", "bimodal", "geometric"])
def test_edit_distance_pairs_shift_prune_length_shapes(spark, shape):
    """Adversarial length-distribution sweep for the PassJoin
    length-aware shift prune (commit 95ce49e: probes with
    |shift| + |shift - delta| > max_dist are skipped, where delta is
    the partner-length difference — VERDICT r10 #7 asks this boundary
    arithmetic pinned). Three regimes stress different prune windows:

    - all_equal: delta = 0 everywhere, the symmetric-shift fast case;
    - bimodal: lengths L and L ± max_dist exactly — delta AT the
      prune boundary, where an off-by-one skips the only admissible
      shift and silently loses every cross-mode pair;
    - geometric: lengths spanning both strata (short exact stratum
      through segment-indexed), every delta in [0, max_dist] present.

    For each, planted mutations at distances 1..max_dist (including
    pure insertions/deletions that CHANGE length by max_dist) must
    make blocked == brute force with exact distances."""
    import random

    from level_mapreduce_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(20260815 + len(shape))
    alphabet = "abcdefgh"
    d = 2

    def rand_s(n):
        return "".join(rng.choice(alphabet) for _ in range(n))

    if shape == "all_equal":
        lens = [12] * 10
    elif shape == "bimodal":
        # L and exactly L ± max_dist: delta hits the prune boundary
        lens = [10, 10, 10, 10, 12, 12, 12, 12, 8, 8]
    else:
        lens = [max(1, int(1.6**k)) for k in range(10)]  # 1..~69

    base = []
    seen = set()
    for n in lens:
        s = rand_s(n)
        while s in seen:
            s = rand_s(n)
        seen.add(s)
        base.append(s)
    strings = list(base)
    for s in base:
        if len(s) < 2:
            continue
        # one same-length mutation (substitution) ...
        pos = rng.randrange(len(s))
        strings.append(
            s[:pos] + rng.choice(alphabet.replace(s[pos], "a")) + s[pos + 1:]
        )
        # ... and one length-changing one at the FULL distance d:
        # d inserts or d deletes, so |len(a)-len(b)| == max_dist and
        # the only admissible shifts sit on the prune boundary
        if rng.random() < 0.5 or len(s) <= d:
            t = s
            for _ in range(d):
                p = rng.randrange(len(t) + 1)
                t = t[:p] + rng.choice(alphabet) + t[p:]
        else:
            t = s
            for _ in range(d):
                p = rng.randrange(len(t))
                t = t[:p] + t[p + 1:]
        strings.append(t)
    # dedupe exact clones introduced by mutation collisions — one row
    # per id AND per value keeps the brute-force twin trivially aligned
    strings = list(dict.fromkeys(strings))

    df = spark.createDataFrame(
        list(enumerate(strings)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_pairs(df, max_dist=d).collect()
    }
    want = _brute_lev_pairs(strings, d)
    assert got == want, (
        f"{shape}: blocked pair set diverged from brute force "
        f"(missing={set(want) - set(got)}, extra={set(got) - set(want)})"
    )


def test_text_ops_survive_empty_documents(spark):
    """One empty / whitespace-only / sub-bigram document must not fail
    a corpus pass (the session runs ANSI mode, where 0/0 is a JOB
    failure, not a NaN): ratios come back null for the degenerate doc
    and real values for the rest."""
    from level_mapreduce_spark.operators.text import (
        quality_filter,
        text_repetition,
        text_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps the fence again and again"),
            (2, ""),
            (3, "   "),
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert stats[1]["stop_ratio"] is not None
    assert stats[2]["stop_ratio"] is None and stats[2]["alnum_ratio"] is None
    assert stats[3]["stop_ratio"] is None
    qf = {r["doc_id"]: r for r in quality_filter(docs).collect()}
    assert qf[2]["stop_ratio"] is None and qf[2]["keep"] is False
    rep = {r["doc_id"]: r for r in text_repetition(docs).collect()}
    assert rep[2]["dup_token_frac"] is None
    assert rep[4]["dup_token_frac"] is not None  # 1 token: defined
    assert rep[4]["dup_bigram_frac"] is None     # no bigrams: null


def test_similarity_survives_zero_vectors(spark):
    """A zero embedding (padding / failed upstream embed) yields null
    similarity — dropped by thresholds, sorted last in top-k — instead
    of an ANSI DIVIDE_BY_ZERO job failure, consistently across the
    expression and pair operators."""
    from level_mapreduce_spark.operators.similarity import (
        brute_topk,
        cosine_neardup_pairs,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ],
        "vec_id long, embedding array<double>",
    )
    top = brute_topk(emb, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    order = [r["vec_id"] for r in top]
    assert order[:2] == [1, 2] and order[-1] == 3  # null sim sorts last
    assert top[-1]["sim"] is None
    pairs = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in cosine_neardup_pairs(emb, threshold=0.9).collect()
    }
    assert pairs == {(1, 2)}  # zero vector pairs with nothing


def test_shuffled_shards_export_roundtrip(spark, docs, tmp_path):
    """Deterministic shuffled export: same seed reproduces identical
    shard membership AND within-shard order; different seeds permute;
    shards are balanced; the written layout round-trips in canonical
    epoch order with every document exactly once."""
    from level_mapreduce_spark.operators.export import (
        read_shuffled,
        shuffled_shards,
        write_shuffled,
    )

    n_docs = docs.count()
    s1 = shuffled_shards(docs, n_shards=8, seed=1)
    s1b = shuffled_shards(docs, n_shards=8, seed=1)
    s2 = shuffled_shards(docs, n_shards=8, seed=2)
    a = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in s1.collect()}
    assert a == {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in s1b.collect()}
    b = {r["doc_id"]: (r["shard"], r["shuffle_key"]) for r in s2.collect()}
    assert a != b  # a new seed is a new permutation
    sizes = [v for _, v in sorted(
        ((k, sum(1 for s in a.values() if s[0] == k)) for k in range(8))
    )]
    assert sum(sizes) == n_docs
    assert min(sizes) > 0 and max(sizes) < n_docs / 2  # no mega-shard

    out = str(tmp_path / "export")
    write_shuffled(docs, out, n_shards=8, seed=1)
    back = read_shuffled(spark, out)
    rows = back.select("doc_id", "shard", "shuffle_key").collect()
    assert len(rows) == n_docs
    assert {r["doc_id"] for r in rows} == set(a)
    # canonical epoch order: (shard, shuffle_key) nondecreasing
    keys = [(r["shard"], r["shuffle_key"]) for r in rows]
    assert keys == sorted(keys)
    # the WRITTEN layout itself is sorted (read one shard's file raw,
    # no orderBy — read_shuffled's own sort would mask a broken write)
    raw0 = [
        r["shuffle_key"]
        for r in spark.read.parquet(out + "/shard=0").select(
            "shuffle_key"
        ).collect()
    ]
    assert raw0 == sorted(raw0) and raw0
    # shuffled, not source-ordered: doc_ids within a shard are mixed
    shard0 = [r["doc_id"] for r in rows if r["shard"] == 0]
    assert shard0 != sorted(shard0)
    # re-export reproduces byte-identical per-shard order
    out2 = str(tmp_path / "export2")
    write_shuffled(docs, out2, n_shards=8, seed=1)
    again = [
        (r["shard"], r["shuffle_key"], r["doc_id"])
        for r in read_shuffled(spark, out2)
        .select("shard", "shuffle_key", "doc_id")
        .collect()
    ]
    assert again == [(r["shard"], r["shuffle_key"], r["doc_id"]) for r in rows]


def test_bm25_property_matches_python_reference(spark):
    """Property (hypothesis): over random small corpora and random
    queries, bm25_topk's scores and ranking match a direct python
    evaluation of the Okapi formula to 1e-9 — including repeated
    query terms, terms absent from the corpus, and docs with no query
    terms (absent from results)."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from level_mapreduce_spark.operators.text import bm25_topk

    vocab = ["ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen"]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        texts = data.draw(
            st.lists(
                st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
                min_size=3,
                max_size=8,
            )
        )
        q_words = data.draw(
            st.lists(
                st.sampled_from(vocab + ["zebra"]), min_size=1, max_size=4
            )
        )
        docs = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(docs, " ".join(q_words), k=20).collect()
        ]

        k1, b = 1.2, 0.75
        n = len(texts)
        avgdl = sum(len(t) for t in texts) / n
        terms = sorted(set(q_words))
        df = {w: sum(w in t for t in texts) for w in terms}
        want = {}
        for i, t in enumerate(texts):
            s = 0.0
            for w in terms:
                tf = t.count(w)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(t) / avgdl)
                )
            if s > 0:
                want[i] = s
        want_ranked = sorted(
            want.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )
        assert [d for d, _ in got] == [d for d, _ in want_ranked]
        for (gd, gs), (wd, ws) in zip(got, want_ranked):
            assert abs(gs - round(ws, 6)) < 1e-9, (gd, gs, ws)

    run()


def test_shuffled_export_manifest(spark, docs, tmp_path):
    """write_shuffled emits a _MANIFEST.json with per-shard rows and
    order-sensitive content hashes: a same-seed re-export reproduces
    the manifest exactly; a different seed changes every hash."""
    import json as _json

    from level_mapreduce_spark.operators.export import write_shuffled

    out1 = str(tmp_path / "m1")
    m1 = write_shuffled(docs, out1, n_shards=4, seed=3)
    with open(out1 + "/_MANIFEST.json") as f:
        on_disk = _json.load(f)
    assert on_disk["total_rows"] == m1["total_rows"] == docs.count()
    assert {int(k) for k in on_disk["shards"]} == {0, 1, 2, 3}
    m1b = write_shuffled(docs, str(tmp_path / "m1b"), n_shards=4, seed=3)
    assert m1b == m1  # reproducible
    m2 = write_shuffled(docs, str(tmp_path / "m2"), n_shards=4, seed=4)
    assert {s["content_hash"] for s in m2["shards"].values()}.isdisjoint(
        {s["content_hash"] for s in m1["shards"].values()}
    )


import pytest as _pytest


@_pytest.mark.parametrize("hash_fn,nbits", [("xxhash64", 64), ("md5_60", 60)])
def test_simhash_pairs_complete_for_hamming_3(spark, docs, hash_fn, nbits):
    """The Manku pigeonhole guarantee, pinned for BOTH hash
    primitives: over a corpus augmented with near-identical variants,
    chunk-blocked simhash_pairs finds EXACTLY the brute-force
    hamming<=3 pair set (4 chunks of nbits/4: d<=3 flips at most 3
    chunks, so one chunk always matches). 'md5_60' is the
    oracle-reproducible variant the driver gate runs
    (q_dedup_simhash); 'xxhash64' is the production default."""
    from level_mapreduce_spark.operators import simhash, simhash_pairs

    base = docs.limit(40)
    variants = base.limit(10).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    corpus = base.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).unionByName(variants)

    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash(corpus, hash_fn=hash_fn).collect()
    }
    ids = sorted(fps)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((fps[a] ^ fps[b]) & ((1 << nbits) - 1)).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_pairs(
            corpus, max_hamming=3, hash_fn=hash_fn
        ).collect()
    }
    assert got == want
    assert want  # the appended-suffix variants guarantee close pairs


def test_sessionize_property_vs_python_reference(spark):
    """Property (hypothesis): over random per-user event streams with
    timestamp TIES and exact-gap boundaries, sessionize matches a
    direct python fold of the contract (sorted (ts, event_id); new
    session iff idle STRICTLY longer than the gap)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from level_mapreduce_spark.operators.events import sessionize

    GAP_US = 30 * 60 * 1_000_000

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        # gaps drawn around the boundary: 0, exactly gap, gap+1us
        deltas = data.draw(
            st.lists(
                st.sampled_from([0, 1, GAP_US, GAP_US + 1, 2 * GAP_US]),
                min_size=1,
                max_size=10,
            )
        )
        user = data.draw(st.sampled_from([1, 2]))
        base = 1_700_000_000_000_000
        rows, t = [], base
        for i, d in enumerate(deltas):
            t += d
            rows.append((i + 1, user, t))
        events = spark.createDataFrame(
            rows, "event_id long, user_id long, us long"
        ).select(
            "event_id", "user_id", F.timestamp_micros("us").alias("ts")
        )
        got = {
            r["event_id"]: r["session_id"]
            for r in sessionize(events).collect()
        }
        want, sid, last = {}, 0, None
        for eid, _, us in rows:  # already in (ts, event_id) order
            if last is None or us - last > GAP_US:
                sid += 1
            last = us
            want[eid] = sid
        assert got == want, (deltas, got, want)

    run()


def test_verify_shuffled_detects_reordered_shard(spark, tmp_path):
    """The manifest hash is PHYSICALLY order-sensitive (r9 review fix:
    a recomputed canonical rank hashed a reordered file identically):
    verify_shuffled passes on the intact export, and fails on a shard
    whose file was rewritten with the same rows in reverse order —
    the exact 'served out of order' case the manifest exists for."""
    import glob

    import pyarrow.parquet as pq

    from level_mapreduce_spark.operators.export import (
        verify_shuffled,
        write_shuffled,
    )

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    out = str(tmp_path / "vshuf")
    write_shuffled(docs, out, n_shards=4, seed=5)
    assert verify_shuffled(spark, out) == {"ok": True, "mismatches": []}

    import os as _os

    def _drop_crc(fp):
        crc = _os.path.join(
            _os.path.dirname(fp), "." + _os.path.basename(fp) + ".crc"
        )
        if _os.path.exists(crc):
            _os.remove(crc)

    # reverse one shard's file in place: same multiset, wrong order
    shard_dir = sorted(glob.glob(out + "/shard=*"))[0]
    [f] = glob.glob(shard_dir + "/part-*")
    t = pq.read_table(f)
    pq.write_table(t.take(list(range(t.num_rows - 1, -1, -1))), f)
    _drop_crc(f)
    res = verify_shuffled(spark, out)
    assert res["ok"] is False
    assert any("hash" in m["error"] for m in res["mismatches"])

    # a truncated shard (partial copy) is also caught
    write_shuffled(docs, out, n_shards=4, seed=5)  # restore
    [f2] = glob.glob(sorted(glob.glob(out + "/shard=*"))[1] + "/part-*")
    t2 = pq.read_table(f2)
    pq.write_table(t2.slice(0, max(1, t2.num_rows - 1)), f2)
    _drop_crc(f2)
    res2 = verify_shuffled(spark, out)
    assert res2["ok"] is False and any(
        "rows" in m["error"] for m in res2["mismatches"]
    )


def test_multimodal_oracle_matches_on_short_texts(spark, tmp_path):
    """Gate-fidelity regression (r10 review): the multimodal oracle's
    byte-expansion CTEs must agree with the operator for EMPTY and
    sub-8-byte texts — the Spark side zero-pads missing strides
    (payload[i::8] or b'\\x00') and still emits one row per media row
    (and one empty frame per empty video doc), so the SQL side must
    left-join its byte table rather than drop those groups. Latent at
    the shipped testdata scales (min text is 44 bytes); pinned here
    against a synthetic short-doc corpus."""
    import duckdb

    from level_mapreduce_spark import queries as q

    docs = spark.createDataFrame(
        [
            (0, "", "s"),               # empty, image
            (1, "a", "s"),              # 1 byte, audio
            (2, "abc def", "s"),        # 7 bytes, VIDEO (doc_id%3==2)
            (3, "x" * 5, "s"),          # 5 bytes
            (5, "hello world " * 30, "s"),  # multi-frame VIDEO
            (8, "", "s"),               # empty VIDEO -> one empty frame
        ],
        "doc_id long, text string, source string",
    )
    docs.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(
        tuple(r)
        for r in q.QUERIES["multimodal_features"](
            spark, str(tmp_path)
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.sql(q.ORACLES["multimodal_features"]).fetchall()
    )
    assert got == want


def test_semdedup_salt_width_is_capped():
    """The self-join salt spreads pair volume, not cluster width: on a
    wide cluster (defaultParallelism >> cap) the y-side replication
    factor must stay bounded."""
    from level_mapreduce_spark.operators.similarity import (
        _SEMDEDUP_SALT_CAP,
        _semdedup_salt_width,
    )

    assert _semdedup_salt_width(8) == 8
    assert _semdedup_salt_width(2000) == _SEMDEDUP_SALT_CAP
    assert _semdedup_salt_width(0) == 1


def test_remove_repeated_spans_differential_bruteforce(spark):
    """Randomized differential for the CUT operator: the kept-token
    text must equal a pure-Python brute-force removal over 60
    dense-duplicate docs (same corpus shape as the span stats
    differential), seeds pinned."""
    import random as _random
    from collections import Counter

    from level_mapreduce_spark.operators.dedup import remove_repeated_spans

    rng = _random.Random(1409)
    n, vocab = 5, [f"t{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(60)
    ]
    toks = {i: [t for t in s.lower().split(" ") if t] for i, s in docs}
    cnt = Counter(
        tuple(tk[p : p + n])
        for tk in toks.values()
        for p in range(len(tk) - n + 1)
    )
    expect = {}
    for i, tk in toks.items():
        covered = set()
        for p in range(len(tk) - n + 1):
            if cnt[tuple(tk[p : p + n])] > 1:
                covered.update(range(p, p + n))
        kept = [t for p, t in enumerate(tk) if p not in covered]
        expect[i] = (
            " ".join(kept),
            len(kept),
            len(covered),
            round(len(covered) / len(tk), 6) if tk else 0.0,
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["text"],
            r["n_kept"],
            r["removed_tokens"],
            r["removed_frac"],
        )
        for r in remove_repeated_spans(df, ngram=n).collect()
    }
    assert got == expect
