"""BPE trainer/encoder — differential + property tests.

The trainer's incremental pair-count bookkeeping (touch only affected
words per merge) is checked against a naive reference that recounts
EVERY pair from scratch each iteration; the encoder is checked against
the concat-identity and monotonicity properties plus a driver-side
replay of the same greedy loop. Extension operator — no reference
counterpart (index.js has no tokenizer surface); public-paper cites in
operators/bpe.py.
"""

import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark.operators.bpe import (
    bpe_encode,
    encode_word,
    merges_df,
    train_bpe,
    train_bpe_from_counts,
    word_counts,
)
from level_mapreduce_spark.operators.text import BPE_PRETOKEN_RE

SF_DIR = "/root/testdata/sf0.001"


def naive_train(counts, num_merges, min_pair_freq=2):
    """Recount-everything reference: same tie-break contract
    (max count, then lexicographically smallest pair), no incremental
    state to get wrong."""
    words = [(tuple(w), int(c)) for w, c in counts if len(w) > 0]
    merges = []
    for _ in range(num_merges):
        pair_counts = {}
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
        # pairs already merged can never reappear (a merge consumes
        # its adjacencies and never recreates them) so no filtering
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_pair_freq:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        a, b = best
        ab = a + b
        out = []
        for syms, c in words:
            res, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    res.append(ab)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append((tuple(res), c))
        words = out
    return merges


HANDCRAFTED = [
    # ties everywhere: 'ab' vs 'ba' adjacencies at equal counts force
    # the lexicographic tie-break; repeated chars exercise the
    # non-overlapping left-to-right merge ('aaaa' has TWO 'aa', not 3)
    ("abab", 10),
    ("baba", 10),
    ("aaaa", 7),
    ("aab", 7),
    (" the", 25),
    ("the", 5),
    ("thee", 3),
    ("x", 4),  # single char: no pairs
    ("", 2),  # dropped by the trainer
]


def test_trainer_matches_naive_on_handcrafted():
    for n in (0, 1, 3, 8, 50):
        got = train_bpe_from_counts(HANDCRAFTED, num_merges=n)
        want = naive_train(HANDCRAFTED, n)
        assert got == want, f"num_merges={n}: {got} != {want}"


def test_trainer_matches_naive_on_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counts = [
        (r["word"], r["count"])
        for r in word_counts(docs)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(2000)
        .collect()
    ]
    # the synthetic corpus draws from a small shared vocabulary — the
    # distinct pre-token table is tiny (61 at sf0.001); that is the
    # clone-heavy regime, fine for a differential check
    assert len(counts) > 50
    got = train_bpe_from_counts(counts, num_merges=120)
    want = naive_train(counts, 120)
    assert got == want
    assert len(got) == 120  # corpus is big enough to not early-stop


def test_min_pair_freq_stops_early():
    counts = [("ab", 1), ("cd", 1)]  # every pair is a hapax
    assert train_bpe_from_counts(counts, num_merges=10, min_pair_freq=2) == []
    # and with the cutoff disabled the hapaxes do merge
    assert len(
        train_bpe_from_counts(counts, num_merges=10, min_pair_freq=1)
    ) == 2


def test_train_is_deterministic(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m1 = train_bpe(docs, num_merges=60, max_words=1000)
    m2 = train_bpe(docs, num_merges=60, max_words=1000)
    assert m1 == m2 and len(m1) == 60


def test_encode_word_properties():
    merges = train_bpe_from_counts(HANDCRAFTED, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in HANDCRAFTED:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w  # lossless
    assert encode_word("abab", {}) == list("abab")  # 0 merges = chars


def test_bpe_encode_end_to_end(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    merges = train_bpe(docs, num_merges=150, max_words=5000)
    enc = bpe_encode(docs, merges).collect()
    assert len(enc) == 200

    # concat-identity per doc: joining tokens reproduces the
    # pre-token concatenation (which reproduces the matched spans of
    # the lowered text)
    pre = {
        r["doc_id"]: r["pre"]
        for r in docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.regexp_extract_all(
                F.lower("text"), F.lit(BPE_PRETOKEN_RE), F.lit(0)
            ).alias("pre"),
        ).collect()
    }
    ranks = {p: i for i, p in enumerate(merges)}
    for r in enc:
        words = pre[r["doc_id"]]
        assert "".join(r["tokens"]) == "".join(words)
        assert r["n_tokens"] == len(r["tokens"])
        # the Arrow path replays the driver-side greedy loop exactly
        want = [t for w in words for t in encode_word(w, ranks)]
        assert r["tokens"] == want

    # more merges never increase the total token count
    n0 = bpe_encode(docs, []).agg(F.sum("n_tokens")).first()[0]
    n150 = sum(r["n_tokens"] for r in enc)
    n50 = (
        bpe_encode(docs, merges[:50]).agg(F.sum("n_tokens")).first()[0]
    )
    assert n0 >= n50 >= n150
    assert n150 < n0  # and 150 merges actually compress this corpus


def test_merges_df_roundtrip(spark):
    merges = train_bpe_from_counts(HANDCRAFTED, num_merges=6)
    df = merges_df(spark, merges)
    back = [
        (r["left"], r["right"])
        for r in df.orderBy("rank").collect()
    ]
    assert back == merges


def test_bpe_sidecar_lifecycle(spark, tmp_path):
    """Stored-artifact lifecycle (the pq.py codebook contract): train
    once, store the merges as a sidecar beside a real index, reload
    from a FRESH handle with no retraining, encode identically — and
    the sidecar must survive churn (update) and compact()'s directory
    swap. A handle without the sidecar must refuse loudly."""
    from level_mapreduce_spark.engine.index import MapIndex
    from level_mapreduce_spark.operators.bpe import (
        load_bpe_merges,
        store_bpe_merges,
    )
    from level_mapreduce_spark.operators.text import inverted_index_mapper

    store = str(tmp_path)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    idx = MapIndex(
        spark, "bpe_vocab_host", inverted_index_mapper(), store,
        doc_key="doc_id",
    )
    idx.build(docs, assume_unique=True)
    merges = train_bpe(docs, num_merges=40, max_words=5_000)
    assert merges
    store_bpe_merges(idx, merges, lowercase=True)

    fresh = MapIndex(
        spark, "bpe_vocab_host", inverted_index_mapper(), store,
        doc_key="doc_id",
    )
    got, lower = load_bpe_merges(fresh)
    assert got == merges and lower is True
    a = bpe_encode(docs, merges).orderBy("doc_id").collect()
    b = bpe_encode(docs, got, lowercase=lower).orderBy("doc_id").collect()
    assert a == b

    # churn + compact: sidecars sit beside segments/ and must survive
    churn = docs.limit(5).withColumn(
        "text", F.concat(F.lit("changed "), F.col("text"))
    )
    idx.update(churn, assume_unique=True)
    idx.compact()
    got2, _ = load_bpe_merges(fresh)
    assert got2 == merges

    bare = MapIndex(
        spark, "bpe_no_sidecar", inverted_index_mapper(), store,
        doc_key="doc_id",
    )
    with pytest.raises(ValueError, match="no BPE sidecar"):
        load_bpe_merges(bare)


def test_bpe_plans(spark):
    """Scale-shape pins: word_counts partial-aggregates map-side and
    stays JVM-only; bpe_encode's Python hop is Arrow-batched (never
    row-at-a-time BatchEvalPython) and shuffle-free."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wc_plan = (
        word_counts(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in wc_plan
    assert "EvalPython" not in wc_plan
    enc_plan = (
        bpe_encode(docs, [("t", "h"), ("th", "e")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in enc_plan
    assert "BatchEvalPython" not in enc_plan
    assert "Exchange" not in enc_plan


# ---- hypothesis properties: the incremental trainer's bookkeeping ----
# (pure-Python, no Spark session — these run in milliseconds)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = st.lists(
    st.tuples(
        st.text(alphabet="ab c", min_size=0, max_size=8),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=300, deadline=None)
@given(_WORDS, st.integers(min_value=0, max_value=25),
       st.integers(min_value=1, max_value=3))
def test_trainer_equals_naive_prop(counts, num_merges, min_pair_freq):
    """The incremental pair-count maintenance (touch only affected
    words, stale where-set indices re-verified, merged pair retired)
    is observationally identical to recounting every pair from
    scratch each round — over random tiny corpora including repeated
    words, single chars, spaces-in-words, empty strings, and hapax
    cutoffs."""
    got = train_bpe_from_counts(
        counts, num_merges=num_merges, min_pair_freq=min_pair_freq
    )
    want = naive_train(counts, num_merges, min_pair_freq)
    assert got == want


@settings(max_examples=200, deadline=None)
@given(_WORDS, st.integers(min_value=0, max_value=25))
def test_encode_lossless_prop(counts, num_merges):
    """encode_word is lossless (token concat == word) under ANY merge
    table the trainer can produce, for every word in the corpus that
    trained it."""
    merges = train_bpe_from_counts(counts, num_merges=num_merges,
                                   min_pair_freq=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in counts:
        assert "".join(encode_word(w, ranks)) == w


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
