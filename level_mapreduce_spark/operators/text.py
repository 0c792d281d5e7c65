"""Text analysis operators for training-data pipelines.

All hot-path computation is Column expressions (JVM-side, whole-stage
codegen — no Python in the loop), so every operator here scales to the
100 TB corpus case: tokenization/stats are embarrassingly parallel
narrow transforms; the inverted index and TF-IDF shuffle once on the
term key, which is the minimum possible.

Tokenization contract: documents are split on single spaces (the
synthetic corpus' only whitespace) so the DuckDB oracles can reproduce
results exactly with ``string_split``. Regex-based token classes use
explicit ASCII classes (``[A-Za-z0-9]``) — identical semantics in Java
regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark.engine.index import MapIndex
from level_mapreduce_spark.engine.mapper import DOC_KEY, ExprMapper

# Stopword heads used for the language-ID heuristic and the quality
# score's stopword ratio. Deliberately tiny and explicit so the DuckDB
# oracle can restate them verbatim.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "un"],
    "es": ["el", "los", "y", "una", "en"],
    "zh": ["de", "le", "he", "shi", "zai"],
}
LANG_ORDER = ["en", "de", "fr", "es", "zh"]


def tokens_expr(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties dropped.

    Oracle equivalent: ``list_filter(string_split(lower(text), ' '),
    t -> t <> '')``.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), " "), lambda t: t != "")


def tokens_or_empty(text: Column | str) -> Column:
    """:func:`tokens_expr` with NULL text treated as the empty
    document (``[]``). Used by every path that must agree on
    null-text docs between the stored-index builds and the batch
    rescans: ``tokens_expr`` propagates NULL, which (a) made the
    packed-length guard's bounds check NULL -> raise_error, failing
    ``build_postings_index``/``build_span_index`` on a null-text doc
    the batch operators tolerate (ADVICE r14), and (b) would leave a
    null ``dl`` that ``avg`` skips while ``count(*)`` counts — so a
    null-text doc contributes (dl=0, no terms) identically in the
    stored and rescan stats instead."""
    col = F.col(text) if isinstance(text, str) else text
    return F.coalesce(
        tokens_expr(col), F.array().cast("array<string>")
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-shingles from an ALREADY-MATERIALIZED tokens
    column. ``['a','b','c','d'] -> ['a_b_c','b_c_d']`` via
    ``sequence``/``slice``/``array_join`` (all codegen'd).

    ``toks`` must be a column attribute, not an inline expression:
    Spark re-evaluates free sub-expressions inside higher-order-function
    lambdas on every invocation, so an inline ``split()`` here would
    re-tokenize the document once per shingle index — O(tokens²) per
    doc. An attribute reference is a row-buffer read, O(1).
    """
    n = F.size(toks)
    grams = F.when(n >= k, F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), "_"),
    )).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles straight from a text column.

    Convenience form for one-shot use. Hot paths that reference the
    shingles more than once (or inside further lambdas) should stage
    ``tokens_expr`` as a real column and call
    :func:`shingles_from_tokens` — see its docstring for why.
    """
    return shingles_from_tokens(tokens_expr(text), k)


def _count_in(tokens: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


# GPT-2-style BPE pre-tokenizer classes, restated in explicit ASCII so
# Java regex (Spark) and RE2 (DuckDB) match identically: common English
# contraction suffixes, space-prefixed letter runs, space-prefixed
# digit runs, space-prefixed punctuation runs. Counting these matches
# estimates the BPE token count of a document (each pre-token splits
# into >=1 BPE tokens; for common English text the pre-token count is
# the standard cheap proxy) without shipping a merges table.
BPE_PRETOKEN_RE = "'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish token-count estimate (GPT-2 pre-tokenizer class count)
    as a pure Column expression — the LLM-pipeline "how many tokens is
    this corpus" primitive, codegen'd JVM-side."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    ).cast("long")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality/statistics features:

    - ``n_chars``   — character length
    - ``n_words``   — runs of ``[A-Za-z0-9]+``
    - ``n_nonalnum``— non-alphanumeric, non-space characters
    - ``n_tokens``  — whitespace tokens
    - ``n_bpe_tokens`` — GPT-2-style pre-token count (BPE estimate,
      :func:`bpe_token_count`)
    - ``stop_cnt``  — English stopword occurrences
    - ``stop_ratio``/``alnum_ratio`` — quality ratios, rounded to 6dp
      so double formatting is oracle-stable.

    Two projections, not one: the ratios must reference the count
    COLUMNS, never the count expressions. Inlining a count expression
    into its ratio evaluates the regex / tokenize-filter a second time
    per row — HOF lambdas and regexp_extract_all are codegen-ineligible
    so no subexpression elimination rescues the duplicate (measured
    0.53s -> 0.38s at sf0.1 for the split). CollapseProject's
    non-cheap-expression guard keeps the barrier because every count
    is referenced twice downstream.
    """
    # tokens staged once as a column: several output columns reference
    # them, and an inline split() would re-tokenize per reference
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    counted = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(
            F.regexp_extract_all("text", F.lit("[A-Za-z0-9]+"), F.lit(0))
        ).cast("long").alias("n_words"),
        F.size(
            F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), F.lit(0))
        ).cast("long").alias("n_nonalnum"),
        F.size(toks).cast("long").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        _count_in(toks, STOPWORDS["en"]).cast("long").alias("stop_cnt"),
    )
    n_tokens, n_chars = F.col("n_tokens"), F.col("n_chars")
    return counted.select(
        "*",
        # zero-token / zero-char docs: null ratio, not a DIVIDE_BY_ZERO
        # crash under the session's default ANSI mode
        F.when(n_tokens > 0, F.round(F.col("stop_cnt") / n_tokens, 6)).alias(
            "stop_ratio"
        ),
        F.when(
            n_chars > 0,
            F.round((n_chars - F.col("n_nonalnum")) / n_chars, 6),
        ).alias("alnum_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language-ID heuristic: score each language by
    stopword hits; highest score wins, ties broken by LANG_ORDER, zero
    hits -> 'und'. The oracle restates the same CASE chain."""
    docs = docs.withColumn("_toks", tokens_expr("text"))
    # per-language scores staged as columns too: `best` references all
    # five and the CASE chain references each score twice more
    score_cols = {
        lang: f"_s_{lang}" for lang in LANG_ORDER
    }
    for lang in LANG_ORDER:
        docs = docs.withColumn(
            score_cols[lang], _count_in(F.col("_toks"), STOPWORDS[lang])
        )
    scores = {lang: F.col(score_cols[lang]) for lang in LANG_ORDER}
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.lit("und")
    # build the CASE back-to-front so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        pred = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        pred.alias("pred_lang"),
        best.cast("long").alias("score"),
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int = 25,
    min_stop_ratio: float = 0.02,
    max_word_len: int = 50,
    min_alpha_ratio: float = 0.6,
) -> DataFrame:
    """The quality-scoring DECISION operator: per-doc keep/drop from
    the Gopher-style heuristic gates (Rae et al. 2021 §A.1.1, the
    signals this corpus supports): token count, stopword density, the
    longest-word cap (a giant "word" is markup/binary junk), and the
    alphabetic-word fraction (Gopher requires 80% of words to carry an
    alphabetic character; default relaxed to 0.6). Returns
    (doc_id, n_tokens, stop_ratio, max_word, alpha_ratio, keep) —
    narrow transform, no shuffle, trivially 100 TB-parallel."""
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    n_tokens = F.size(toks).cast("long")
    # empty docs: null ratios (they fail every keep-gate), never an
    # ANSI DIVIDE_BY_ZERO crash on one bad document in a 100 TB pass
    stop_ratio = F.when(
        F.size(toks) > 0,
        F.round(_count_in(toks, STOPWORDS["en"]) / F.size(toks), 6),
    )
    max_word = F.coalesce(
        F.array_max(F.transform(toks, lambda t: F.length(t))), F.lit(0)
    ).cast("long")
    alpha_ratio = F.when(
        F.size(toks) > 0,
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.size(toks),
            6,
        ),
    )
    # signals first, decision second: `keep` must reference the signal
    # COLUMNS — inlining the HOF/ratio expressions into the predicate
    # would evaluate each one a second time per row (same duplication
    # text_stats carried; HOF lambdas are codegen-ineligible so nothing
    # downstream dedupes them)
    signals = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        max_word.alias("max_word"),
        alpha_ratio.alias("alpha_ratio"),
    )
    return signals.select(
        "*",
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("stop_ratio") >= min_stop_ratio)
            & (F.col("max_word") <= max_word_len)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
        ).alias("keep"),
    )


def pack_documents(
    docs: DataFrame, budget: int = 2048, n_shards: int | None = None
) -> DataFrame:
    """Token-budget sequence packing — assign each document to a pack
    of ~``budget`` tokens (the standard LLM-training batching pre-step:
    concatenate docs until the context budget fills).

    Scalable shape: documents hash into ``n_shards`` independent
    shards (no global order), and within a shard a running token total
    quantizes into packs — one window per shard, so the only shuffle
    partitions by shard and parallelism is ``n_shards`` regardless of
    corpus size. ``n_shards`` defaults to the cluster's
    ``defaultParallelism`` so the window's parallelism tracks the
    cluster instead of a fixed constant. Packs are budget-quantized (a
    doc may straddle two quantum boundaries and starts the next pack);
    exact bin-packing is deliberately NOT attempted — greedy
    quantization is deterministic, single-pass, and what production
    packers do.

    Returns (doc_id, shard, n_tokens, pack_id).
    """
    from pyspark.sql import Window

    if n_shards is None:
        n_shards = docs.sparkSession.sparkContext.defaultParallelism

    d = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_expr("text")).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget).cast("long").alias("pack_id"),
    )


def inverted_index_mapper() -> ExprMapper:
    """Map fn for the term -> document inverted index — the most
    level-mapreduce-shaped text operator: one emit per token
    occurrence, ``index_key=token``, ``value=doc_id``. Feeding it
    through MapIndex gives partitioned, sorted, incrementally
    maintainable postings (reference write path, index.js:173-249)."""
    return ExprMapper(
        F.transform(
            tokens_expr("text"),
            lambda t: F.struct(
                t.alias("index_key"), F.col("doc_id").cast("long").alias("value")
            ),
        ),
        value_type=T.LongType(),
    )


def ngram_counts(docs: DataFrame, n: int = 2, min_count: int = 2) -> DataFrame:
    """Corpus-wide word n-gram counts (term, n_docs, total) — the
    n-gram extraction primitive (phrase mining / contamination checks).
    One explode + one aggregation, shuffled on the n-gram key."""
    staged = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_expr("text").alias("_toks"),
    )
    toks = F.col("_toks")
    # every occurrence (no per-doc distinct — unlike the dedup shingles)
    all_grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), "_"),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = staged.select(
        "doc_id", F.explode_outer(all_grams).alias("gram")
    ).where(F.col("gram").isNotNull())
    return (
        grams.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("total"),
        )
        .where(F.col("total") >= min_count)
    )


def term_frequencies(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf) — one shuffle on the (term, doc) key."""
    return (
        docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(tokens_expr("text")).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def tfidf(docs: DataFrame, n_docs: int | None = None) -> DataFrame:
    """(doc_id, term, tf, df, score) with score = round(tf * ln(N/df), 6).

    Classic two-aggregation plan: tf per (term, doc), df per term —
    df is reused via a self-aggregation of tf (no second scan of the
    corpus). The df side joins back on ``term``; at 100 TB both sides
    are already hash-partitioned by term from their aggregations, so
    the join adds no extra shuffle of the large side.
    """
    n = n_docs if n_docs is not None else docs.count()
    tf = term_frequencies(docs)
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    return tf.join(df, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6).alias(
            "score"
        ),
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for a whitespace query —
    ``(doc_id, score)``, score descending, doc_id tiebreak.

    idf uses the +1-smoothed Robertson/Sparck Jones form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's choice),
    non-negative for every df.

    100 TB shape: the explode is filtered to the QUERY terms before
    any aggregation (a literal In over a handful of strings — the
    candidate set shrinks to docs containing at least one query term
    at the scan), tf and df come from one aggregation chain already
    partitioned by term, corpus stats (N, avgdl) are a single
    aggregate broadcast-crossed, and the per-doc dl join is the only
    join touching a corpus-sized side. One shuffle on (doc, term).
    The corpus is scanned by the tf branch and the dl/stats branches
    independently (narrow 2-column projections); a rollup("doc_id")
    fusion of dl+stats was measured equal at sf0.1 (no
    ReusedExchange fires), so the simpler plan stays — for repeated
    multi-query serving, checkpoint ``dl`` once and reuse it.
    """
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("bm25_topk: query has no tokens")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_or_empty("text").alias("_toks"),
    )
    dl = base.select("doc_id", F.size("_toks").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    # explode_outer: a plain explode gets an inferred size()>0 filter
    # whose pushdown clones the token chain (see module staging notes);
    # the isin drops the null rows for free
    terms = base.select(
        "doc_id", F.explode_outer("_toks").alias("term")
    ).where(F.col("term").isin(q_terms))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    return _bm25_score(tf.join(dl, "doc_id"), dfreq, stats, k, k1, b)


def _bm25_score(
    tfdl: DataFrame,
    dfreq: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 scoring tail over (doc_id, term, tf, dl) /
    (term, df) / 1-row (n_docs, avgdl) frames — one expression for
    both the corpus-rescan path (:func:`bm25_topk`, which joins its
    dl branch in) and the stored-postings path
    (:func:`bm25_topk_from_index`, where dl rides each posting), so
    the two are value-identical by construction, not by parallel
    maintenance."""
    return (
        tfdl.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
    )


def postings_mapper() -> ExprMapper:
    """Map fn for the stored postings index (v2 layout) — ranked
    retrieval (TF-IDF / BM25) on the engine's incremental spine
    (reference write path, index.js:173-249). Rows per document,
    value = ``struct<tf:int, dl:int>`` (the emitting doc's id rides
    the engine's own ``doc_key`` column — never duplicated into the
    value, unlike the v1 bit-packed long):

    - ``L#<doc_id>`` -> (tf=0, dl=n_tokens): existence + length, one
      per doc (also carries the bounds guard below);
    - ``T#<term>`` -> (tf, dl), one per DISTINCT term: the posting.
      Carrying ``dl`` on every posting is the v2 point — a BM25 serve
      reads ONLY the query terms' T# slices plus the O(1) stats rows
      (:class:`PostingsIndex`), never the corpus-sized L# slice;
    - ``M#<doc_id>#<term>`` -> (tf, dl): the doc's term set under a
      doc-prefixed key — the reference's per-doc meta reverse index
      (index.js:182-205) re-expressed, so maintenance can read a
      changed doc's OLD terms as a key-pruned prefix slice and keep
      the stored per-term df exact in O(changed docs' tokens).
      Storage cost: M# doubles the per-doc-term row count (narrow
      rows: a string key + two ints) — the explicit price of
      O(changed) stats maintenance, same trade as a database
      secondary index.

    Per-doc tf is the RUN LENGTHS of the sorted token array — one
    ``array_sort`` + staged projections, O(t log t) per doc, pure
    Column exprs (the text_repetition longest-run trick, generalized
    to all runs). Stages are attribute references so no tokenize/sort
    re-evaluates inside a HOF lambda (staging module docstring).

    The v1 packing guard survives as the postings CONTRACT guard on
    the L# row every doc emits exactly once: doc ids in [0, 2^42),
    docs under 2^21 tokens — out-of-range documents FAIL the
    build/update loudly instead of corrupting downstream packers
    (span index) that share the id space. NULL text is the empty
    document (``tokens_or_empty``), not a build failure (ADVICE r14).
    """
    from level_mapreduce_spark.functions.packing import guard_packed

    toks = F.col("_toks")
    st = F.col("_st")
    starts = F.col("_starts")
    doc_id_l = F.col("doc_id").cast("long")
    doc_id_s = doc_id_l.cast("string")
    n_runs = F.size(starts)
    dl_i = F.size(toks)

    def run_term(j: Column) -> Column:
        return F.element_at(st, F.element_at(starts, j))

    def run_tf(j: Column) -> Column:
        # next run start; the last run ends at size(st) + 1. The when
        # guards the ANSI out-of-bounds element_at (CaseWhen branches
        # evaluate lazily).
        nxt = F.when(
            j < n_runs, F.element_at(starts, (j + 1).cast("int"))
        ).otherwise(F.size(st) + 1)
        return (nxt - F.element_at(starts, j)).cast("int")

    def t_struct(j: Column) -> Column:
        return F.struct(
            F.concat(F.lit("T#"), run_term(j)).alias("index_key"),
            F.struct(
                run_tf(j).alias("tf"), dl_i.alias("dl")
            ).alias("value"),
        )

    def m_struct(j: Column) -> Column:
        return F.struct(
            F.concat(
                F.lit("M#"), doc_id_s, F.lit("#"), run_term(j)
            ).alias("index_key"),
            F.struct(
                run_tf(j).alias("tf"), dl_i.alias("dl")
            ).alias("value"),
        )

    empty = F.array().cast(
        "array<struct<index_key: string,"
        " value: struct<tf: int, dl: int>>>"
    )
    term_structs = F.when(
        F.size(toks) >= 1,
        F.transform(F.sequence(F.lit(1), n_runs), t_struct),
    ).otherwise(empty)
    meta_structs = F.when(
        F.size(toks) >= 1,
        F.transform(F.sequence(F.lit(1), n_runs), m_struct),
    ).otherwise(empty)
    len_struct = F.struct(
        F.concat(F.lit("L#"), doc_id_s).alias("index_key"),
        F.struct(
            F.lit(0).cast("int").alias("tf"),
            guard_packed(
                dl_i,
                doc_id_l,
                dl_i.cast("long"),
                "n_tokens",
                "postings index",
            )
            .cast("int")
            .alias("dl"),
        ).alias("value"),
    )
    # run starts: positions i where st[i] opens a new equal run. The
    # greatest(i-1, 1) keeps element_at off index 0 (always an ANSI
    # error; boolean OR does not short-circuit) — at i=1 the compare
    # is st[1] != st[1] = false and the i == 1 arm decides.
    starts_expr = F.when(
        F.size(st) >= 1,
        F.filter(
            F.sequence(F.lit(1), F.size(st)),
            lambda i: (i == 1)
            | (
                F.element_at(st, F.greatest(i - 1, F.lit(1)))
                != F.element_at(st, i)
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return ExprMapper(
        F.concat(F.array(len_struct), term_structs, meta_structs),
        value_type=_POSTINGS_VALUE_T,
        stages={
            "_toks": tokens_or_empty("text"),
            "_st": F.array_sort(F.col("_toks")),
            "_starts": starts_expr,
        },
    )


#: stored value for every postings row (see :func:`postings_mapper`)
_POSTINGS_VALUE_T = T.StructType(
    [
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
    ]
)

#: stat-row keys in the sibling stats index (see :class:`PostingsIndex`)
_SK_NDOCS = "N#"
_SK_SUMDL = "DL#"
_SK_DF = "DF#"

#: changed-doc / touched-key count at or below which maintenance and
#: batch-serve reads push literal In filters to the parquet scan;
#: above it the literal list bloats the plan and the driver (the r14
#: batch-BM25 finding), so reads degrade to a broadcast semi-join —
#: a full (columnar, narrow) slice scan, but no driver-side key list
#: and no O(keys) plan nodes.
_POSTINGS_IN_MAX = 1024


def _postings_stats_mapper() -> ExprMapper:
    """Identity mapper for the stats index: docs are the stat rows
    themselves, ``doc_key = skey``, so the engine's delete-then-insert
    replaces a stat's value per fold (the stored-sketch pattern,
    operators/sketches.py)."""
    return ExprMapper.of(
        (F.col("skey"), F.col("value").cast("long")),
        value_type=T.LongType(),
    )


class PostingsIndex(MapIndex):
    """The stored postings index plus its sibling STATS index,
    maintained in lockstep so ranked-retrieval serves are
    O(query-terms' postings) AT ANY CORPUS SIZE — no per-query corpus
    aggregate (the r14 gap: every served BM25 paid a full L#-slice
    scan for N/avgdl, and tfidf a full-T# groupBy for df; at 10B docs
    that is 10B narrow rows per query).

    Stats index (``<name>__stats``, value long, folded
    replace-on-update exactly like the stored sketches):

    - ``N#``  -> live document count
    - ``DL#`` -> sum of live document lengths
    - ``DF#<term>`` -> live document frequency of ``term``

    These are exact maintained values, not approximations — the
    served gates stay hash-identical to the batch rescan operators.

    **Maintenance = O(changed docs' tokens).** ``update()`` reads the
    changed docs' OLD state before the write — their ``L#`` rows by
    literal In and their ``M#`` meta rows as a doc-prefixed slice
    (both pushed to the parquet scan; above ``_POSTINGS_IN_MAX``
    changed docs the literals degrade to a broadcast semi-join) —
    then folds signed deltas into the stats rows: new-minus-old doc
    count, length sum, and per-term presence. A term whose df reaches
    0 is tombstoned out of the stats index.

    **Write order & crash window.** Postings move first, stats
    second, with a shared monotonically-increasing ``seq`` stamped in
    both sidecars (postings side BEFORE the data write, stats side
    after the fold). A crash between the two leaves the seqs
    mismatched; :func:`load_postings_index` refuses the handle and
    points at :func:`refresh_postings_stats` (an O(index-rows), no
    re-tokenize rebuild of the stats alone). Within one process the
    writer lease serializes the whole update+fold, so a reader in
    ANOTHER session may observe new postings with stats one fold
    behind for the duration of the fold — the documented
    single-writer staleness window.

    Reference parity: the stats rows are the reference's
    materialize-once promise (index.js:173-249 vs :124-172) applied
    to the corpus statistics themselves; the M# rows are its per-doc
    meta reverse index (index.js:182-205).

    **Time travel (r16):** the two indexes' epoch counters are
    independent, so a bare ``read(as_of_epoch=...)`` cannot pick a
    consistent stats state — instead every mutation records its
    ``seq -> (postings_epoch, stats_epoch)`` pair in the sidecar
    (:meth:`snapshots`), and the serve functions accept
    ``as_of_seq=`` to read BOTH sides filtered to that consistent
    pair: historical serves equal the batch operators over the
    historical corpus. Snapshots live until a compaction folds their
    epochs (the engine's documented time-travel horizon); folded
    seqs are garbage-collected from the map and refused with the
    list of still-servable seqs.
    """

    def __init__(self, spark, name: str, store_path: str):
        super().__init__(
            spark, name, postings_mapper(), store_path, doc_key="doc_id"
        )
        self.stats = MapIndex(
            spark,
            name + "__stats",
            _postings_stats_mapper(),
            store_path,
            doc_key="skey",
        )

    # ------------------------------------------------------ seq plumbing

    def _read_seq(self) -> int:
        meta = self.get_sidecar(name="postings.json") or {}
        return int(meta.get("seq", 0))

    def _stamp(self, seq: int) -> None:
        meta = self.get_sidecar(name="postings.json") or {}
        self.put_sidecar(
            {
                "type": "postings",
                "version": 2,
                "seq": seq,
                "snapshots": meta.get("snapshots", {}),
            },
            name="postings.json",
        )

    def _stamp_stats(self, seq: int) -> None:
        self.stats.put_sidecar(
            {"type": "postings_stats", "seq": seq}, name="stats.json"
        )
        self._record_snapshot(seq)

    def _record_snapshot(self, seq: int) -> None:
        """Append ``seq -> [postings_epoch, stats_epoch]`` to the
        postings sidecar — the joint-consistency map that completes
        the time-travel story (VERDICT r15 #6): the two indexes'
        epoch counters are independent, but the stats stamp is the
        LAST step of every mutation, so the pair of max live epochs
        observed here IS the consistent joint snapshot for this seq.
        Serves accept ``as_of_seq=`` and read both sides epoch-
        filtered to the recorded pair. Entries whose epochs a later
        fold absorbed are garbage-collected (an epoch-filtered read
        of a folded-away epoch would silently return an empty frame);
        the surviving-epoch rule matches the engine's documented
        time-travel horizon (MapIndex.read / compact_tombstones)."""
        from level_mapreduce_spark.engine.index import _list_epochs

        # a delete_range writes ONLY a tombstone epoch (numbered above
        # the segments from the shared counter), so the snapshot point
        # is the max across BOTH lists — read(as_of_epoch=N) filters
        # segments and tombstones to <= N symmetrically
        p_live = _list_epochs(self.spark, self.segments_path) + _list_epochs(
            self.spark, self.tombstones_path
        )
        s_live = _list_epochs(
            self.spark, self.stats.segments_path
        ) + _list_epochs(self.spark, self.stats.tombstones_path)
        if not p_live or not s_live:
            return
        meta = self.get_sidecar(name="postings.json") or {}
        snaps = {
            k: v
            for k, v in (meta.get("snapshots") or {}).items()
            if int(k) < seq and v[0] in p_live and v[1] in s_live
        }
        snaps[str(seq)] = [max(p_live), max(s_live)]
        meta["snapshots"] = snaps
        self.put_sidecar(meta, name="postings.json")

    def snapshots(self) -> dict[int, tuple[int, int]]:
        """The servable historical seqs: ``{seq: (postings_epoch,
        stats_epoch)}``, most-recent last. A seq disappears from this
        map when a compaction folds its epochs (the engine's
        time-travel horizon)."""
        meta = self.get_sidecar(name="postings.json") or {}
        return {
            int(k): (v[0], v[1])
            for k, v in sorted(
                (meta.get("snapshots") or {}).items(),
                key=lambda kv: int(kv[0]),
            )
        }

    # -------------------------------------------------------- mutations

    def build(self, docs: DataFrame, assume_unique: bool = False):
        self._acquire_lease()
        try:
            seq = self._read_seq() + 1
            self._stamp(seq)
            super().build(docs, assume_unique=assume_unique)
            self._rebuild_stats()
            self._stamp_stats(seq)
        finally:
            self._release_lease()
        return self

    def update(
        self, changes: DataFrame, assume_unique: bool = False
    ) -> DataFrame:
        self._acquire_lease()
        try:
            norm = self._normalize_changes(
                changes, assume_unique=assume_unique
            ).localCheckpoint(eager=True)
            # the signed stats deltas are computed and PINNED before
            # the write: the old-state read inside them scans this
            # index's current epochs, which super().update() appends
            # to (and may auto-compact). One materialization covers
            # both the old-state read and the batch re-tokenize.
            old = self._old_doc_state(norm.select(DOC_KEY).distinct())
            live = norm.where(~F.col("deleted")).select(
                DOC_KEY, tokens_or_empty("text").alias("_toks")
            )
            new_doc = live.select(
                DOC_KEY, F.size("_toks").cast("long").alias("dl")
            )
            new_terms = live.select(
                DOC_KEY,
                F.explode_outer(F.array_distinct("_toks")).alias("term"),
            ).where(F.col("term").isNotNull())
            deltas = self._stat_deltas(new_doc, new_terms, old)
            seq = self._read_seq() + 1
            self._stamp(seq)
            # the postings write and the stats fold are independent
            # once the deltas are pinned (the fold reads ONLY the
            # stats index + the pinned deltas; the write touches only
            # the postings segments), so they overlap in two driver
            # threads instead of running as sequential job waves —
            # A/B at sf0.1 1% churn: 2.65 s sequential vs 1.96 s
            # overlapped, min-of-3 (VERDICT r15 #7). Crash semantics
            # are unchanged: both sides complete before the stats
            # stamp, and ANY crash in between leaves the seq stamps
            # mismatched -> loader refuses -> refresh_postings_stats
            # rebuilds (direction-agnostic recovery).
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=1) as ex:
                fold = ex.submit(self._fold_stats, deltas)
                feed = super().update(norm, assume_unique=True)
                fold.result()
            self._stamp_stats(seq)
            return feed
        finally:
            self._release_lease()

    def delete_range(
        self,
        start: str | None = None,
        end: str | None = None,
        key: str | None = None,
    ) -> int:
        self._acquire_lease()
        try:
            doomed = (
                self.scan(start=start, end=end, key=key)
                .select(DOC_KEY)
                .distinct()
            )
            old = self._old_doc_state(doomed)
            spark = self.spark
            deltas = self._stat_deltas(
                spark.createDataFrame([], f"{DOC_KEY} string, dl long"),
                spark.createDataFrame([], f"{DOC_KEY} string, term string"),
                old,
            )
            seq = self._read_seq() + 1
            self._stamp(seq)
            n = super().delete_range(start=start, end=end, key=key)
            if n:
                self._fold_stats(deltas)
            self._stamp_stats(seq)
            return n
        finally:
            self._release_lease()

    def drop(self) -> None:
        super().drop()
        self.stats.drop()

    # ------------------------------------------------- stats maintenance

    def _old_doc_state(self, keys: DataFrame) -> DataFrame:
        """Changed docs' stored (L# existence/length, M# term set)
        rows, PINNED via eager localCheckpoint — O(changed docs'
        tokens) read: L# by literal In, M# as a doc-prefixed slice
        (clustered in key order, so the doc_key In prunes row groups
        inside the M# range); above the literal threshold, one
        broadcast semi-join over the L#/M# slices instead."""
        # one limited collect decides the regime AND supplies the ids
        # (a separate count() + collect() pair was two driver jobs)
        head = keys.limit(_POSTINGS_IN_MAX + 1).collect()
        base = self.read().where(
            F.col("index_key").startswith("L#")
            | F.col("index_key").startswith("M#")
        )
        if not head:
            base = base.where(F.lit(False))
        elif len(head) <= _POSTINGS_IN_MAX:
            ids = sorted(r[0] for r in head)
            base = base.where(
                F.col("index_key").isin([f"L#{i}" for i in ids])
                | (
                    F.col("index_key").startswith("M#")
                    & F.col(DOC_KEY).isin(ids)
                )
            )
        else:
            # no broadcast hint: above the literal threshold the key
            # set is unbounded (a full-corpus re-ingest is legal), so
            # AQE picks broadcast vs shuffle from the RUNTIME size
            base = base.join(keys, DOC_KEY, "left_semi")
        return base.select(
            DOC_KEY,
            "index_key",
            F.col("value.dl").cast("long").alias("dl"),
        )

    def _stat_deltas(
        self, new_doc: DataFrame, new_terms: DataFrame, old: DataFrame
    ) -> DataFrame:
        """Signed stat deltas ``(skey, delta)`` for a change batch:
        +1/-1 presence rows summed per term, +dl/-dl per doc for the
        scalars. Eagerly PINNED (localCheckpoint): the old-state side
        reads this index's pre-write epochs, so the caller computes
        this before mutating the postings."""
        old_doc = old.where(F.col("index_key").startswith("L#")).select(
            DOC_KEY, "dl"
        )
        old_terms = old.where(F.col("index_key").startswith("M#")).select(
            DOC_KEY,
            F.expr(
                f"substring(index_key, length({DOC_KEY}) + 4)"
            ).alias("term"),
        )
        scal = (
            new_doc.select(F.lit(1).alias("_sgn"), F.col("dl"))
            .unionByName(old_doc.select(F.lit(-1).alias("_sgn"), "dl"))
            .agg(
                F.coalesce(F.sum("_sgn"), F.lit(0))
                .cast("long")
                .alias("d_n"),
                F.coalesce(
                    F.sum(F.col("_sgn") * F.col("dl")),
                    F.lit(0).cast("long"),
                ).alias("d_dl"),
            )
        )
        scal_rows = scal.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(_SK_NDOCS).alias("skey"),
                        F.col("d_n").alias("delta"),
                    ),
                    F.struct(
                        F.lit(_SK_SUMDL).alias("skey"),
                        F.col("d_dl").alias("delta"),
                    ),
                )
            ).alias("_r")
        ).select("_r.skey", "_r.delta").where(F.col("delta") != 0)
        term_rows = (
            new_terms.select("term", F.lit(1).alias("_d"))
            .unionByName(old_terms.select("term", F.lit(-1).alias("_d")))
            .groupBy("term")
            .agg(F.sum("_d").cast("long").alias("delta"))
            .where(F.col("delta") != 0)
            .select(
                F.concat(F.lit(_SK_DF), F.col("term")).alias("skey"),
                "delta",
            )
        )
        return scal_rows.unionByName(term_rows).localCheckpoint(eager=True)

    def _fold_stats(self, deltas: DataFrame) -> None:
        """Fold pinned signed deltas into the stats rows
        (read-modify-write, the stored-sketch pattern). The stored
        side is key-pruned by literal In below the threshold; the
        fold plan reads the stats index's own storage, which is safe
        under the engine's write-invariant-key-set contract
        (MapIndex.update docstring) — same shape as
        update_sketch_index."""
        # one limited collect decides the regime AND supplies the keys
        head = deltas.select("skey").limit(_POSTINGS_IN_MAX + 1).collect()
        if not head:
            # a batch that changes neither doc count, total length,
            # nor any term's presence (e.g. pure overwrites with
            # identical token sets) folds nothing — skip the stats
            # epoch entirely instead of rewriting the scalar rows
            return
        stored = self.stats.read().select(
            F.col("index_key").alias("skey"),
            F.col("value").cast("long").alias("_old"),
        )
        if len(head) <= _POSTINGS_IN_MAX:
            stored = stored.where(
                F.col("skey").isin([r["skey"] for r in head])
            )
        folded = (
            deltas.join(stored, "skey", "left")
            .select(
                "skey",
                (
                    F.coalesce(F.col("_old"), F.lit(0).cast("long"))
                    + F.col("delta")
                ).alias("value"),
            )
            .withColumn(
                "deleted",
                F.col("skey").startswith(_SK_DF) & (F.col("value") == 0),
            )
        )
        self.stats.update(folded, assume_unique=True)

    def _rebuild_stats(self) -> None:
        """Recompute every stat from the live postings rows — one
        O(index-rows) pass, NO re-tokenize (narrow L#/T# column
        reads). Build-time path and the crash-recovery path."""
        rows = self.read()
        lens = rows.where(F.col("index_key").startswith("L#")).select(
            F.col("value.dl").cast("long").alias("dl")
        )
        scalars = (
            lens.agg(
                F.count("*").alias("_n"),
                F.coalesce(F.sum("dl"), F.lit(0).cast("long")).alias("_s"),
            )
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.lit(_SK_NDOCS).alias("skey"),
                            F.col("_n").alias("value"),
                        ),
                        F.struct(
                            F.lit(_SK_SUMDL).alias("skey"),
                            F.col("_s").alias("value"),
                        ),
                    )
                ).alias("_r")
            )
            .select("_r.skey", "_r.value")
        )
        dfreq = (
            rows.where(F.col("index_key").startswith("T#"))
            .groupBy(F.expr("substring(index_key, 3)").alias("term"))
            .agg(F.count("*").cast("long").alias("value"))
            .select(
                F.concat(F.lit(_SK_DF), F.col("term")).alias("skey"),
                "value",
            )
        )
        self.stats.build(scalars.unionByName(dfreq), assume_unique=True)


def refresh_postings_stats(idx: PostingsIndex) -> None:
    """Rebuild the stats index from the live postings rows and
    re-align the seq stamps — the recovery path after a crash between
    the postings write and the stats fold (detected by
    :func:`load_postings_index`). O(index rows), no re-tokenize."""
    idx._acquire_lease()
    try:
        seq = idx._read_seq() + 1
        idx._stamp(seq)
        idx._rebuild_stats()
        idx._stamp_stats(seq)
    finally:
        idx._release_lease()


def build_postings_index(
    spark,
    docs: DataFrame,
    store: str,
    name: str = "postings_index",
) -> PostingsIndex:
    """Build the stored postings index + its stats sibling (see
    :class:`PostingsIndex` / :func:`postings_mapper`). Persists the
    index kind AND layout version in a sidecar so a fresh session's
    loader can refuse a non-postings or pre-v2 handle."""
    idx = PostingsIndex(spark, name, store)
    # explicit partition count: the mapper is compute-bound on small
    # bytes (the AQE small-byte coalescing trap)
    n_part = spark.sparkContext.defaultParallelism
    idx.build(docs.repartition(n_part, "doc_id"), assume_unique=True)
    return idx


def _postings_family():
    from level_mapreduce_spark.engine.family import StoredIndexFamily

    def check(idx, meta):
        if int(meta.get("version", 1)) < 2:
            raise ValueError(
                f"postings index {idx.name} predates the v2 stats "
                "layout — rebuild with build_postings_index"
            )
        smeta = idx.stats.get_sidecar(name="stats.json") or {}
        if smeta.get("seq") != meta.get("seq"):
            raise ValueError(
                "postings stats are stale (postings seq "
                f"{meta.get('seq')} != stats seq {smeta.get('seq')}) — "
                "a writer crashed between the postings and stats "
                "writes; run refresh_postings_stats()"
            )

    return StoredIndexFamily(
        kind="postings",
        sidecar="postings.json",
        doc_key="doc_id",
        mapper_for=lambda meta: postings_mapper(),
        builder_name="build_postings_index",
        handle_factory=lambda spark, name, store, meta: PostingsIndex(
            spark, name, store
        ),
        validate=check,
    )


def load_postings_index(
    spark, store: str, name: str = "postings_index"
) -> PostingsIndex:
    """Reopen a stored postings index in a fresh session; refuses
    handles without a postings sidecar (serving term stats from an
    arbitrary index would silently misparse its keys), pre-v2
    layouts (no stats sibling / packed-long values), and
    postings/stats seq mismatches (a writer crashed between the
    postings write and the stats fold — run
    :func:`refresh_postings_stats`)."""
    return _postings_family().load(spark, store, name)


def _resolve_seq(idx, as_of_seq: int) -> tuple[int, int]:
    """Look up the joint (postings_epoch, stats_epoch) snapshot for
    ``as_of_seq`` and refuse seqs that were never recorded or whose
    epochs a compaction has folded away since the sidecar map was
    last garbage-collected — an epoch-filtered read of a folded-away
    epoch would silently return an empty frame, so liveness is
    re-checked at serve time (see :meth:`PostingsIndex.snapshots`)."""
    snaps = idx.snapshots()
    if as_of_seq in snaps:
        from level_mapreduce_spark.engine.index import _list_epochs

        p_e, s_e = snaps[as_of_seq]
        p_live = _list_epochs(idx.spark, idx.segments_path) + _list_epochs(
            idx.spark, idx.tombstones_path
        )
        s_live = _list_epochs(
            idx.spark, idx.stats.segments_path
        ) + _list_epochs(idx.spark, idx.stats.tombstones_path)
        if p_e in p_live and s_e in s_live:
            return p_e, s_e
        raise ValueError(
            f"as_of_seq={as_of_seq} is not servable: its epochs "
            f"(postings {p_e}, stats {s_e}) were folded away by a "
            "compaction — the time-travel horizon is the last compact"
        )
    avail = sorted(snaps)
    raise ValueError(
        f"as_of_seq={as_of_seq} is not servable: "
        + (
            f"available seqs are {avail}"
            if avail
            else "no snapshots recorded (pre-r16 index, or all "
            "folded away by compaction)"
        )
    )


def _postings_frame(
    idx, terms: list[str] | None = None, as_of_epoch: int | None = None
) -> DataFrame:
    """(term, doc_id, tf, dl) from the stored ``T#`` rows. The slice
    predicate is on the RAW ``index_key`` (prefix / literal In) over
    the range-partitioned layout, so it pushes to the parquet scan
    (min/max row-group skipping): a caller that touches a few terms
    reads only those postings. ``dl`` rides every posting (v2), so
    serving never touches the L# slice."""
    rows = idx.read(as_of_epoch=as_of_epoch)
    if terms is None:
        rows = rows.where(F.col("index_key").startswith("T#"))
    else:
        rows = rows.where(
            F.col("index_key").isin([f"T#{t}" for t in terms])
        )
    return rows.select(
        F.expr("substring(index_key, 3)").alias("term"),
        F.col(DOC_KEY).cast("long").alias("doc_id"),
        F.col("value.tf").cast("long").alias("tf"),
        F.col("value.dl").cast("long").alias("dl"),
    )


def _stats_frame(idx, as_of_epoch: int | None = None) -> DataFrame:
    """1-row (n_docs, avgdl) served from the two scalar stats rows —
    a literal In over the stats index (point lookups), NEVER a
    corpus-slice aggregate. avgdl = sum_dl / n_docs in double, which
    equals the batch path's ``avg(dl)`` exactly while sum_dl fits the
    53-bit double mantissa (integer doc lengths; sums are exact far
    past 100 TB-scale corpora)."""
    rows = idx.stats.read(as_of_epoch=as_of_epoch).where(
        F.col("index_key").isin([_SK_NDOCS, _SK_SUMDL])
    )
    return rows.agg(
        F.max(
            F.when(
                F.col("index_key") == _SK_NDOCS,
                F.col("value").cast("long"),
            )
        ).alias("n_docs"),
        F.max(
            F.when(
                F.col("index_key") == _SK_SUMDL,
                F.col("value").cast("long"),
            )
        ).alias("_sdl"),
    ).select(
        "n_docs",
        (F.col("_sdl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )


def _df_frame(
    idx, terms: list[str] | None = None, as_of_epoch: int | None = None
) -> DataFrame:
    """(term, df) from the stored ``DF#`` stats rows — maintained
    exact values, so no groupBy over the postings slice at serve
    time."""
    rows = idx.stats.read(as_of_epoch=as_of_epoch)
    if terms is None:
        rows = rows.where(F.col("index_key").startswith(_SK_DF))
    else:
        rows = rows.where(
            F.col("index_key").isin([f"{_SK_DF}{t}" for t in terms])
        )
    return rows.select(
        F.expr(f"substring(index_key, {len(_SK_DF) + 1})").alias("term"),
        F.col("value").cast("long").alias("df"),
    )


def tfidf_from_index(idx, as_of_seq: int | None = None) -> DataFrame:
    """Serve :func:`tfidf` from a stored postings index — no corpus
    re-tokenize AND no per-serve corpus aggregate (v2): tf rides the
    stored ``T#`` rows, df joins the maintained ``DF#`` stats rows
    (no groupBy over the postings), N is one stored-row point lookup
    (driver-side scalar, same contract as ``tfidf``'s
    ``docs.count()``). Value-identical to the batch operator (same
    formula, integer inputs).

    ``as_of_seq`` serves a recorded historical snapshot — postings
    AND stats epoch-filtered to the consistent pair stamped at that
    seq (see :meth:`PostingsIndex.snapshots`); equals the batch
    operator on the historical corpus."""
    p_e = s_e = None
    if as_of_seq is not None:
        p_e, s_e = _resolve_seq(idx, as_of_seq)
    post = _postings_frame(idx, as_of_epoch=p_e)
    dfreq = _df_frame(idx, as_of_epoch=s_e)
    n, _, _ = _stats_lookup(idx, [], as_of_epoch=s_e)
    return post.join(dfreq, "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 6).alias(
            "score"
        ),
    )


def _stats_lookup(
    idx, terms: list[str], as_of_epoch: int | None = None
) -> tuple[int, int, dict[str, int]]:
    """One bounded driver collect of the stats rows a single-query
    serve needs: (n_docs, sum_dl, {term: df}) via a literal In over
    2 + len(terms) keys (point lookups on the stats index). Driver-
    side BY DESIGN — the slice is O(query terms) at any corpus size,
    and folding it to literals keeps the serve plan to ONE scan
    subtree (the r15 profile: every extra ``read()`` subtree costs a
    fixed tombstone-broadcast + listing overhead that dwarfed the
    data at bench scale)."""
    keys = [_SK_NDOCS, _SK_SUMDL] + [f"{_SK_DF}{t}" for t in terms]
    rows = (
        idx.stats.read(as_of_epoch=as_of_epoch)
        .where(F.col("index_key").isin(keys))
        .collect()
    )
    vals = {r["index_key"]: int(r["value"]) for r in rows}
    df = {
        t: vals[f"{_SK_DF}{t}"]
        for t in terms
        if f"{_SK_DF}{t}" in vals
    }
    return vals.get(_SK_NDOCS, 0), vals.get(_SK_SUMDL, 0), df


def bm25_topk_from_index(
    idx,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    as_of_seq: int | None = None,
) -> DataFrame:
    """Serve :func:`bm25_topk` from a stored postings index,
    O(query-terms' postings) END TO END (v2): the query's ``T#`` and
    ``DF#`` keys are literal Ins over the range-partitioned layouts
    (pushed to the scans), per-doc dl rides each posting, and
    N/avgdl are two stored stats rows — NO L#-slice scan, NO corpus
    aggregate anywhere in the plan (plan-asserted,
    tests/test_plans.py). Scoring is the SHARED :func:`_bm25_score`
    tail, so batch and served results are identical by construction.

    ``as_of_seq`` serves a recorded historical snapshot (postings +
    stats epoch-filtered to the consistent pair stamped at that seq,
    :meth:`PostingsIndex.snapshots`) — historical BM25 equals the
    batch operator over the historical corpus."""
    q_terms = sorted({t for t in query.lower().split() if t})
    if not q_terms:
        raise ValueError("bm25_topk_from_index: query has no tokens")
    p_e = s_e = None
    if as_of_seq is not None:
        p_e, s_e = _resolve_seq(idx, as_of_seq)
    # all three reads ride ONE job as parallel pruned subtrees — the
    # r15 A/B measured this 1.4x faster than folding the stats slice
    # to literals first (a bounded collect is a SEQUENTIAL extra job;
    # the subtree scans are point lookups either way)
    tfdl = _postings_frame(idx, terms=q_terms, as_of_epoch=p_e)
    dfreq = _df_frame(idx, terms=q_terms, as_of_epoch=s_e)
    stats = _stats_frame(idx, as_of_epoch=s_e)
    return _bm25_score(tfdl, dfreq, stats, k, k1, b)


# The batch serve's regime threshold is the MEASURED crossover, not
# the generic literal cap (_POSTINGS_IN_MAX):
# scripts/bm25_batch_regime_probe.py (sf0.1-sized synthetic
# corpus, 50k vocab) times the semi-join at parity by ~256 distinct
# probe terms and strictly faster above (512: 1.6 vs 2.5 s; 2048:
# 1.5 vs 5.2; 4096: 2.6 vs 17.2 — the literal-In plan cost grows
# superlinearly in terms), while results are identical either side.
_BM25_BATCH_TERMS_MAX = 256


def bm25_batch_from_index(
    idx,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    terms_in_max: int = _BM25_BATCH_TERMS_MAX,
    as_of_seq: int | None = None,
) -> DataFrame:
    """Batch BM25 over a stored postings index: top-``k`` documents
    for EVERY query in ``queries`` (``query_id``, ``text``) in one
    plan — the bulk retrieval shape (RAG context fetch, hard-negative
    mining) next to :func:`bm25_topk_from_index`'s single query, the
    same pairing :func:`knn_join` is to ``brute_topk``.

    Per query the result is IDENTICAL to ``bm25_topk_from_index``
    (same idf/length normalization, 6dp rounding, doc_id tiebreak) —
    differential-tested; df comes from the SAME maintained ``DF#``
    rows either way, and scoring never mixes queries.

    Scale shape (v2): up to ``terms_in_max`` distinct probe terms,
    the union of all queries' terms becomes ONE pushed literal In
    over the T#/DF# keys (driver-side distinct of the probe texts —
    bounded by the probe set). ABOVE the threshold the literal list
    would bloat the plan and the driver (the r14 finding), so the
    probe terms stay distributed: the T#/DF# slices are broadcast
    semi-joined against the distinct probe terms — a full-slice
    columnar scan, but no driver-side term list and no O(terms) plan
    nodes; results are identical either side of the threshold. In
    both regimes candidates ∝ Σ per-query docs, never
    queries × corpus, per-doc dl rides the postings, and N/avgdl are
    two stored stats rows.

    ``as_of_seq`` serves a recorded historical snapshot in either
    regime (see :meth:`PostingsIndex.snapshots`).

    Returns ``(query_id, doc_id, score)``, top-k rows per query,
    (score DESC, doc_id) within each query.
    """
    from pyspark.sql.window import Window

    q_terms = (
        queries.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.explode(tokens_expr("text")).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one LIMITED collect over the pinned q_terms decides the regime
    # AND supplies the literal term list (the _old_doc_state pattern)
    # — r16: was a second eager checkpoint + count() + collect(),
    # three sequential driver jobs where one bounded job suffices
    head = (
        q_terms.select("term").distinct().limit(terms_in_max + 1).collect()
    )
    if not head:
        raise ValueError("bm25_batch_from_index: queries have no tokens")
    p_e = s_e = None
    if as_of_seq is not None:
        p_e, s_e = _resolve_seq(idx, as_of_seq)
    if len(head) <= terms_in_max:
        # bounded collect: distinct terms across the PROBE query set
        terms = sorted(r["term"] for r in head)
        post = _postings_frame(idx, terms=terms, as_of_epoch=p_e)
        dfreq = _df_frame(idx, terms=terms, as_of_epoch=s_e)
    else:
        # above the threshold the term set stays distributed; the
        # distinct re-derives from the PINNED q_terms (cheap, probe-
        # bounded) for each semi-join side
        terms_df = q_terms.select("term").distinct()
        post = _postings_frame(idx, as_of_epoch=p_e).join(
            F.broadcast(terms_df), "term", "left_semi"
        )
        dfreq = _df_frame(idx, as_of_epoch=s_e).join(
            F.broadcast(terms_df), "term", "left_semi"
        )
    stats = _stats_frame(idx, as_of_epoch=s_e)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "doc_id"
    )
    return (
        post.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_w"), 6).alias("score"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "doc_id", "score")
    )


def doc_fingerprints(
    docs: DataFrame, k: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    hash every character k-gram, slide a window of ``window`` hashes,
    keep each window's minimum, distinct per doc.

    The k-gram hash is the hex md5 (min taken lexicographically) so
    the DuckDB oracle reproduces fingerprints bit-for-bit — a rolling
    xxhash64 would be faster but is not oracle-checkable.

    Returns (doc_id, fp) exploded — the winnowed fingerprint set.
    """
    n_grams = F.length("text") - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(F.substring(F.col("text"), i, k)),
    )
    # materialize the gram-hash array as a column first so each window
    # min slices a computed array instead of re-evaluating the md5
    # transform per window (O(n) vs O(n*w) hashing per doc)
    staged = (
        docs.where(F.length("text") >= k + window - 1)
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"), grams.alias("_grams")
        )
    )
    n_windows = F.size("_grams") - (window - 1)
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda j: F.array_min(F.slice(F.col("_grams"), j, window)),
    )
    # explode_outer: a plain explode's inferred size()>0 filter is
    # pushed below the staging Project with the md5 gram chain inlined,
    # re-hashing every document single-task at the scan
    return staged.select(
        "doc_id", F.explode_outer(F.array_distinct(mins)).alias("fp")
    ).where(F.col("fp").isNotNull())


def text_repetition(docs: DataFrame, mode: str = "expr") -> DataFrame:
    """Per-document repetition signals — the Gopher/MassiveText-style
    repetitiousness rules used to drop low-quality web text (Rae et
    al. 2021 §A1.1), restated over whitespace tokens:

    - ``dup_token_frac``  — 1 - distinct/total tokens
    - ``dup_bigram_frac`` — 1 - distinct/total token bigrams
    - ``top_bigram_frac`` — occurrences of the most frequent bigram
      over total bigrams

    Bigram metrics are null for docs with fewer than 2 tokens. All
    ratios rounded to 6dp for oracle-stable double formatting.

    Two physically different plans, identical results:

    - ``mode='expr'`` (default): pure narrow Column transforms — no
      shuffle, embarrassingly parallel. The top-bigram count is the
      LONGEST EQUAL RUN of the sorted bigram array — one
      ``array_sort`` + one ``aggregate`` fold, O(t log t) per doc —
      over the STAGED ``_bg`` attribute (row buffer reads; an inline
      bigram expression would re-derive the array per lambda
      invocation — see staging module docstring). The r13 rewrite:
      the previous nested-HOF count-per-distinct form was
      O(distinct·total) per doc and measured 2.2× slower at sf0.1
      (1.88 → 0.86 s), value-identical.
    - ``mode='grouped'``: explode bigrams -> partial-aggregable
      groupBy((doc_id, bigram)) -> max per doc -> join back. One
      shuffle on (doc_id, bigram) but no per-doc array
      materialization — the book-length-document path.
    """
    if mode == "grouped":
        return _text_repetition_grouped(docs)
    if mode != "expr":
        raise ValueError(f"unknown mode {mode!r}")
    docs = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                "_", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    )
    docs = docs.withColumn("_bg", bigrams)
    bg = F.col("_bg")
    n_bg = F.size(bg)
    # longest equal run of the sorted array == count of the most
    # frequent bigram; the "" initial prev can never equal a bigram
    # (tokens are non-empty and joined with "_")
    def _run_step(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc.best, run).alias("best"),
        )

    top_cnt = F.aggregate(
        F.array_sort(bg),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _run_step,
        lambda acc: acc.best,
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        # guards: empty docs (n=0) and sub-bigram docs (n_bg=0) yield
        # null fractions, not an ANSI DIVIDE_BY_ZERO job failure
        F.when(
            n > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6),
        ).alias("dup_token_frac"),
        F.when(
            n_bg > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(bg)) / n_bg, 6),
        ).alias("dup_bigram_frac"),
        F.when(n_bg > 0, F.round(top_cnt / n_bg, 6)).alias(
            "top_bigram_frac"
        ),
    )


def _text_repetition_grouped(docs: DataFrame) -> DataFrame:
    """Shuffle-based twin of :func:`text_repetition` for book-length
    documents: bigram stats via explode + partial-aggregable groupBy
    (map-side combine absorbs within-doc repetition before the
    shuffle), so per-doc work is O(total tokens), never
    O(distinct·total). Token stats stay narrow expressions."""
    staged = docs.withColumn("_toks", tokens_expr("text"))
    toks = F.col("_toks")
    n = F.size(toks)
    base = staged.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        F.when(
            n > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(toks)) / n, 6),
        ).alias("dup_token_frac"),
        "_toks",
    )
    bg_rows = base.where(F.col("n_tokens") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - 1),
                lambda i: F.concat_ws(
                    "_",
                    F.element_at(F.col("_toks"), i),
                    F.element_at(F.col("_toks"), i + 1),
                ),
            )
        ).alias("bigram"),
    )
    per_bigram = bg_rows.groupBy("doc_id", "bigram").agg(
        F.count("*").alias("cnt")
    )
    per_doc = per_bigram.groupBy("doc_id").agg(
        F.sum("cnt").alias("_total_bg"),
        F.count("*").alias("_distinct_bg"),
        F.max("cnt").alias("_top_cnt"),
    )
    return (
        base.drop("_toks")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            F.round(
                F.lit(1.0) - F.col("_distinct_bg") / F.col("_total_bg"), 6
            ).alias("dup_bigram_frac"),
            F.round(F.col("_top_cnt") / F.col("_total_bg"), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


# PII patterns in explicit ASCII classes (Java regex / RE2 identical):
# emails, international-ish phone numbers, IPv4s. Deliberately simple,
# high-precision forms — production scrubbing swaps in stricter
# patterns; the operator shape (single narrow regexp_replace pass,
# zero shuffles) is the part that matters at corpus scale.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": "([0-9]{1,3}\\.){3}[0-9]{1,3}",
}


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: list[str] | None = None,
) -> DataFrame:
    """Redact PII spans in-place: each matched span is replaced by its
    ``<KIND>`` tag. Adds per-kind match counts (``n_<kind>``) so the
    pipeline can quarantine high-PII documents instead of silently
    shipping scrubbed text.

    One chained ``regexp_replace`` per kind over a staged column —
    narrow, codegen'd, embarrassingly parallel; counts come from
    ``regexp_extract_all`` on the ORIGINAL text (pre-scrub), so a
    span consumed by an earlier kind's replacement is still counted
    by later kinds.
    """
    kinds = list(PII_PATTERNS) if kinds is None else kinds
    unknown = set(kinds) - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}")
    out = docs
    scrubbed = F.col(text_col)
    for kind in kinds:
        pat = PII_PATTERNS[kind]
        out = out.withColumn(
            f"n_{kind}",
            F.size(
                F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))
            ).cast("long"),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return out.withColumn("scrubbed_text", scrubbed)


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
    bad_markers: list[str] | None = None,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep
    only lines that end in terminal punctuation AND have at least
    ``min_line_words`` words AND mention none of the boilerplate
    markers; flag documents containing code braces for removal.

    Returns (doc_id, n_lines, n_kept_lines, clean_text, keep) where
    ``clean_text`` is the kept lines rejoined and ``keep`` is the
    document-level decision (any line survived, no brace). All nested
    HOFs run over the STAGED ``_lines`` attribute (see staging module
    docstring) — narrow transform, no shuffle, 100 TB-parallel.
    """
    markers = (
        ["javascript", "cookie", "terms of use", "privacy policy"]
        if bad_markers is None
        else bad_markers
    )
    marker_arr = F.array(*[F.lit(m) for m in markers])
    # split on \r?\n (CRLF documents): a trailing \r otherwise changes
    # what "$" matches BETWEEN regex dialects (Java's $ matches before
    # a final line terminator, the oracle's RE2 does not) and would
    # leak \r into clean_text
    staged = docs.withColumn(
        "_lines", F.split(F.col(text_col), "\r?\n")
    )
    lines = F.col("_lines")

    def line_ok(line):
        lw = F.lower(line)
        words = F.size(F.filter(F.split(line, " "), lambda t: t != ""))
        ends = lw.rlike("[.!?\"']$")
        clean = ~F.exists(marker_arr, lambda m: lw.contains(m))
        return ends & (words >= min_line_words) & clean

    staged = staged.withColumn("_kept", F.filter(lines, line_ok))
    kept = F.col("_kept")
    has_brace = F.col(text_col).contains("{") | F.col(text_col).contains("}")
    return staged.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        ((F.size(kept) > 0) & ~has_brace).alias("keep"),
    )


def mixture_rates(
    docs: DataFrame,
    target: dict[str, float],
    stratum_col: str = "lang",
) -> dict[str, float]:
    """Solve the per-stratum keep-rates that move the corpus to a
    target mixture by DOWNSAMPLING ONLY (rates capped at 1.0 — no
    stratum is upsampled; the achievable mixture keeps the most data
    subject to the target proportions).

    Standard water-filling: the binding stratum is the one whose
    relative abundance vs its target share is lowest; it keeps rate
    1.0 and every other stratum keeps
    ``(target_s / count_s) * (count_b / target_b)``. One tiny
    aggregation (O(strata) rows to the driver — bounded); feed the
    result straight into :func:`sample_by_key`. Strata absent from
    ``target`` get rate 0.0 (excluded from the mixture).
    """
    total_target = sum(target.values())
    shares = {s: w / total_target for s, w in target.items()}
    counts = {
        r["s"]: r["n"]
        for r in docs.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    present = {s: counts[s] for s in shares if counts.get(s)}
    if not present:
        return {s: 0.0 for s in counts}
    # binding stratum: least abundant relative to its target share
    b = min(present, key=lambda s: present[s] / shares[s])
    scale = present[b] / shares[b]
    rates = {}
    for s in counts:
        if s not in shares:
            rates[s] = 0.0
        else:
            rates[s] = min((shares[s] * scale) / counts[s], 1.0)
    return rates


def dedup_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Collapse repeated lines within each document, keeping the first
    occurrence in order — the cheap intra-document boilerplate pass
    (navigation, headers, cookie banners repeated through a page) that
    runs before any corpus-level dedup.

    Plan: staged line array + an index-aware filter keeping position
    ``i`` iff the line's FIRST occurrence is ``i`` (explicit
    first-position semantics on both engines; array_distinct's
    ordering is an implementation detail we don't rely on).
    ``array_position`` is O(lines) per element — O(lines²) per doc,
    fine at page-scale line counts; a posexplode + min(pos)-window
    twin is the shuffle-based alternative for pathological documents.
    Narrow transform, zero shuffle.

    Returns (doc_id, n_lines, n_unique_lines, deduped_text).
    """
    # \r?\n: CRLF documents dedup on line CONTENT, not content+\r
    staged = docs.withColumn(
        "_lines", F.split(F.col(text_col), "\r?\n")
    )
    lines = F.col("_lines")
    staged = staged.withColumn(
        "_kept",
        F.filter(lines, lambda l, i: F.array_position(lines, l) == i + 1),
    )
    return staged.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_unique_lines"),
        F.array_join("_kept", "\n").alias("deduped_text"),
    )


def split_dataset(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment: hash the document key
    (with a seed) into [0, 1) and cut by cumulative weights. Unlike
    ``randomSplit`` this is stable across runs, partitionings, and
    cluster sizes — the same doc always lands in the same split, so
    reshuffled or incrementally-grown corpora never leak val/test docs
    into train. Narrow transform, no shuffle.

    ``hash_fn``: ``"xxhash64"`` (default — the fast JVM hash) or
    ``"md5"`` — same uniformity, engine-portable: every SQL engine's
    md5 yields the same lowercase hex, so the assignment is
    reproducible outside Spark (and oracle-checkable) by comparing
    ``md5(key || ':' || seed)`` against cumulative-weight boundaries
    rendered as 32-digit hex strings. md5 costs more cycles per key
    than xxhash64, but the split runs once per corpus revision —
    negligible next to any real text transform.

    Returns the input plus a ``split`` column.
    """
    weights = {"train": 0.98, "val": 0.01, "test": 0.01} if weights is None else weights
    total = sum(weights.values())
    names = list(weights)
    if hash_fn == "xxhash64":
        # 2^63-scale bucket: xxhash64 is signed; shift to [0, 1)
        u = (F.xxhash64(F.col(key_col), F.lit(seed)) / F.lit(2.0**64)) + F.lit(0.5)
        expr = F.lit(None).cast("string")
        acc = 0.0
        for name, w in weights.items():
            acc += w / total
            expr = F.coalesce(expr, F.when(u < acc, F.lit(name)))
        # float edge: u == 1.0 - eps rounding past the last boundary
        expr = F.coalesce(expr, F.lit(names[-1]))
    elif hash_fn == "md5":
        h = F.md5(
            F.concat(
                F.col(key_col).cast("string"), F.lit(":"), F.lit(str(seed))
            )
        )
        expr = F.lit(None).cast("string")
        for name, bound in md5_split_cuts(weights):
            expr = F.coalesce(expr, F.when(h < F.lit(bound), F.lit(name)))
        expr = F.coalesce(expr, F.lit(names[-1]))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return docs.withColumn("split", expr)


def md5_fraction_bound(fraction: float) -> str:
    """The 32-digit lowercase-hex string below which ``fraction`` of
    uniformly-distributed md5 digests sort (hex-string comparison ==
    numeric comparison at fixed width)."""
    return format(min(int(fraction * 16**32), 16**32 - 1), "032x")


def md5_split_cuts(weights: dict[str, float]) -> list[tuple[str, str]]:
    """(split name, upper-bound hex digest) cut points for the md5
    split: cumulative-weight fractions rendered via
    :func:`md5_fraction_bound`. The single source of truth for both
    the Spark path and any external SQL restatement — same
    accumulation order, same floats, so boundaries can never drift by
    an ulp between engines."""
    total = sum(weights.values())
    acc, cuts = 0.0, []
    for name, w in weights.items():
        acc += w / total
        cuts.append((name, md5_fraction_bound(acc)))
    return cuts


def sample_by_key(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic stratified downsampling — the mixture-rebalancing
    primitive: keep a document iff its key hash lands below its
    stratum's keep-rate (e.g. downsample an overrepresented language
    or source toward a target mixture). Unlike ``DataFrame.sampleBy``
    this is stable across runs, partitionings, AND corpus growth — a
    kept doc stays kept when new docs arrive, so incrementally-grown
    corpora never resample history. Narrow transform, zero shuffle,
    100 TB-parallel.

    ``hash_fn="md5"`` is the engine-portable variant (same contract
    as :func:`split_dataset`): any SQL engine reproduces the exact
    keep set by comparing ``md5(key || ':' || seed)`` against
    :func:`md5_fraction_bound` hex cut points.

    Adds a boolean ``sampled`` column (filter on it to materialize
    the sample; keeping the flag supports audit queries).
    """
    if hash_fn == "xxhash64":
        u = (
            F.xxhash64(F.col(key_col), F.lit(seed)) / F.lit(2.0**64)
        ) + F.lit(0.5)
        keep = F.lit(None).cast("boolean")
        for name, rate in rates.items():
            keep = F.when(
                F.col(stratum_col) == name, u < F.lit(rate)
            ).otherwise(keep)
        keep = F.coalesce(keep, u < F.lit(default_rate))
    elif hash_fn == "md5":
        h = F.md5(
            F.concat(
                F.col(key_col).cast("string"), F.lit(":"), F.lit(str(seed))
            )
        )

        # rate >= 1 keeps ALL docs (a strict '< ffff…f' compare would
        # drop the one-in-16^32 all-f digest)
        def below(rate):
            if rate >= 1.0:
                return F.lit(True)
            return h < F.lit(md5_fraction_bound(rate))

        keep = F.lit(None).cast("boolean")
        for name, rate in rates.items():
            keep = F.when(
                F.col(stratum_col) == name, below(rate)
            ).otherwise(keep)
        keep = F.coalesce(keep, below(default_rate))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return docs.withColumn("sampled", keep)


def hashed_features(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Feature-hashing (hashing-trick) vectorizer: token counts hashed
    into a fixed ``dim``-dimensional dense ``array<float>`` — document
    embeddings with NO model, NO vocabulary, NO Python. Identical
    texts vectorize identically, near-duplicate texts land nearby in
    cosine space, so the output plugs straight into the embedding
    stack (``similarity.brute_topk`` / ``cosine_neardup_pairs_lsh`` /
    the ANN indexes) as ``(vec_id, embedding)``.

    Plan: explode tokens -> count per (doc, xxhash64(token) mod dim)
    (map-side partial agg shrinks the shuffle to <= dim rows per doc)
    -> assemble the dense vector per doc with map_from_entries + a
    sequence transform (HOF over a dim-length array, not per-token) ->
    optional L2 normalization. Two small shuffles, all JVM.

    At 100 TB: output is O(docs x dim) floats regardless of text
    volume; ``dim`` trades hash-collision noise against width (64-256
    is the usual corpus-dedup range).

    Documents with zero tokens (empty/whitespace text) produce NO
    output row — there is nothing to embed; left-join the result back
    to the corpus if presence matters downstream.
    """
    toks = tokens_expr(F.col(text_col))
    exploded = docs.select(
        F.col(id_col).alias("vec_id"), F.explode(toks).alias("_tok")
    )
    counted = exploded.groupBy(
        "vec_id",
        F.pmod(F.xxhash64("_tok"), F.lit(dim)).cast("int").alias("_b"),
    ).agg(F.count("*").alias("_n"))
    assembled = (
        counted.groupBy("vec_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_b", "_n"))
            ).alias("_m")
        )
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(F.col("_m")[i], F.lit(0)).cast("double"),
            ).alias("_v"),
        )
    )
    if not normalize:
        return assembled.select(
            "vec_id", F.col("_v").cast("array<float>").alias("embedding")
        )
    # stage the norm as a column: inlined into the transform lambda it
    # would re-evaluate the O(dim) aggregate PER ELEMENT (staging trap
    # #1); the > 0 guard both handles all-zero vectors and gives the
    # second textual reference that pins the producer Project against
    # CollapseProject (staging.py module docstring)
    staged = assembled.withColumn(
        "_norm",
        F.sqrt(
            F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    vec = F.when(
        F.col("_norm") > 0,
        F.transform(F.col("_v"), lambda x: x / F.col("_norm")),
    ).otherwise(F.col("_v"))
    return staged.select(
        "vec_id", vec.cast("array<float>").alias("embedding")
    )


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """One-pass data-quality profile: per column — null count, null
    rate, approximate distinct count (HLL++, ``approx_rsd`` relative
    error), and min/max rendered as strings (type-uniform output).

    The whole profile is a SINGLE aggregation job (every per-column
    measure is one aggregate expression; Catalyst fuses them into one
    partial+final pass — no per-column scans, no collect loops), then
    a driver-side pivot of the one result row into per-column rows:
    O(columns) driver work on O(1) data. The audit you run before and
    after every corpus transform at 100 TB, priced at one scan.
    """
    n = F.count(F.lit(1))
    aggs = [n.alias("_n")]
    for c in df.columns:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(
            F.approx_count_distinct(col, approx_rsd).alias(f"_dist_{c}")
        )
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    out = [
        (
            c,
            int(row["_n"]),
            int(row[f"_nulls_{c}"]),
            (row[f"_nulls_{c}"] / row["_n"]) if row["_n"] else 0.0,
            int(row[f"_dist_{c}"]),
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in df.columns
    ]
    return spark.createDataFrame(
        out,
        "column string, n_rows long, n_nulls long, null_rate double, "
        "approx_distinct long, min string, max string",
    )
