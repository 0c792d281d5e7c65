"""BPE tokenizer training + encoding — the "learn a subword vocab on
YOUR corpus" primitive of an LLM data pipeline (Sennrich/Haddow/Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016; the pre-tokenized variant follows GPT-2, Radford et al. 2019).
Complements :func:`..text.bpe_token_count`, which only ESTIMATES token
counts from the pre-tokenizer classes — this module learns the actual
merge table and tokenizes with it.

Scale shape (mirrors ``pq.py``'s bounded-train / broadcast-apply
design, the repo's standard for iterative algorithms Spark can't
express declaratively):

- word statistics are ONE distributed pass: pre-tokenize with the
  same GPT-2-style regex ``bpe_token_count`` counts with
  (``text.BPE_PRETOKEN_RE``), explode, count — a single shuffle keyed
  on the pre-token, partial-aggregated map-side, output cardinality =
  DISTINCT pre-tokens (vocabulary-bounded, not corpus-bounded);
- training folds that unbounded-corpus statistic into a BOUNDED
  driver table: the top ``max_words`` pre-tokens by count (documented
  O(max_words) collect — same contract as ``train_pq``'s
  ``max_train``). At web scale the frequency head carries the
  overwhelming share of token mass, which is why production tokenizer
  trainers sample or head-truncate exactly like this;
- the merge loop is driver-side over that bounded table with
  incremental pair-count maintenance — each merge touches only the
  words that contain the merged pair (the classic subword-nmt
  bookkeeping), so cost is O(affected words) per merge, not
  O(table) — and fully deterministic (ties broken lexicographically);
- encoding broadcasts the ranked merges and applies them in ONE
  Arrow-batched pass (`pandas_udf` over the pre-token array). The
  per-word merge recursion is unbounded iteration — genuinely not
  expressible with built-in Column functions — which is this repo's
  criterion for dropping to the Arrow path. Pre-tokenization itself
  stays JVM-side (``regexp_extract_all``) so train and encode share
  ONE regex engine; Python only ever sees already-split pre-tokens.

Reference scope note: the reference engine (index.js) has no
tokenizer surface; this is an extension operator in the
training-data-pipeline family (dedup / similarity / text analysis),
cited to the public papers above.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import BPE_PRETOKEN_RE

Pair = tuple[str, str]


def word_counts(
    docs: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """Distinct pre-tokens with corpus frequencies: ``(word, count)``.

    One explode + one count shuffle; map-side partial aggregation
    collapses repeats before the exchange, so shuffle volume tracks
    per-partition DISTINCT pre-tokens. GPT-2-style pre-tokens keep
    their leading space (" the" and "the" are different words — that
    is what lets the learned vocab encode word boundaries without an
    end-of-word sentinel)."""
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .count()
    )


def _merge_word(syms: tuple, a: str, b: str, ab: str) -> tuple:
    """Replace every non-overlapping (a, b) adjacency left-to-right."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _pairs_of(syms: tuple):
    return zip(syms, syms[1:])


def train_bpe_from_counts(
    counts: list[tuple[str, int]],
    num_merges: int = 200,
    min_pair_freq: int = 2,
) -> list[Pair]:
    """Driver-side merge loop over an already-bounded word-count
    table. Exposed separately so tests can differential-check it
    against a naive recount-every-iteration reference.

    Determinism contract: the winning pair each round is the highest
    corpus frequency, ties broken by lexicographically smallest
    ``(left, right)`` — so a fixed corpus always yields the identical
    merge list regardless of dict iteration order. Stops early when
    the best remaining pair falls under ``min_pair_freq`` (merging
    hapax adjacencies memorizes noise, the standard cutoff)."""
    words: list[tuple[tuple, int]] = [
        (tuple(w), int(c)) for w, c in counts if len(w) > 0
    ]
    pair_counts: dict[Pair, int] = {}
    where: dict[Pair, set] = {}
    for i, (syms, c) in enumerate(words):
        for p in _pairs_of(syms):
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(i)

    merges: list[Pair] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_pair_freq:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        a, b = best
        ab = a + b
        # touch ONLY words that (may) contain the pair; the where-sets
        # are not eagerly pruned on decrement, so re-verify membership
        # pop first: rewrites add to OTHER pairs' where-sets only (a
        # merge can never recreate its own pair), so iteration is safe
        for i in where.pop(best, ()):
            syms, c = words[i]
            if best not in _pairs_of(syms):
                continue  # stale index from an earlier rewrite
            for p in _pairs_of(syms):
                left = pair_counts.get(p, 0) - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    pair_counts.pop(p, None)
            syms = _merge_word(syms, a, b, ab)
            words[i] = (syms, c)
            for p in _pairs_of(syms):
                pair_counts[p] = pair_counts.get(p, 0) + c
                where.setdefault(p, set()).add(i)
        # the merged pair itself must not resurface as a candidate
        pair_counts.pop(best, None)
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
    min_pair_freq: int = 2,
    lowercase: bool = True,
) -> list[Pair]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ranked merge list (rank = list position).

    The collect is O(``max_words``) rows of (short string, long) —
    bounded and documented, never corpus-sized; ordering inside the
    head is (count desc, word asc) so the truncation is deterministic
    at equal frequencies."""
    head = (
        word_counts(docs, text_col, lowercase=lowercase)
        .orderBy(F.desc("count"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return train_bpe_from_counts(
        [(r["word"], r["count"]) for r in head],
        num_merges=num_merges,
        min_pair_freq=min_pair_freq,
    )


BPE_SIDECAR = "bpe.json"


def store_bpe_merges(
    idx, merges: list[Pair], lowercase: bool = True, name: str = BPE_SIDECAR
) -> None:
    """Persist a learned merge table as a JSON sidecar beside a stored
    index (same lifecycle as the IVFPQ codebooks: train once, serve
    from any fresh session, survive compact()'s directory swap). The
    ``lowercase`` flag travels with the merges — encoding with the
    wrong case-folding silently produces out-of-vocab symbol streams,
    the BPE analogue of probing an IVFPQ index with the wrong residual
    flag. ``idx`` is any MapIndex handle (duck-typed put_sidecar)."""
    idx.put_sidecar(
        {
            "type": "bpe",
            "lowercase": bool(lowercase),
            "merges": [[a, b] for a, b in merges],
        },
        name=name,
    )


def load_bpe_merges(idx, name: str = BPE_SIDECAR) -> tuple[list[Pair], bool]:
    """Reload ``(merges, lowercase)`` from the sidecar written by
    :func:`store_bpe_merges`; refuses handles without one (an encode
    against silently-empty merges would emit character streams)."""
    meta = idx.get_sidecar(name=name)
    if meta is None or meta.get("type") != "bpe":
        raise ValueError(
            f"no BPE sidecar '{name}' under {idx.root}; was it stored "
            "with store_bpe_merges?"
        )
    return [(a, b) for a, b in meta["merges"]], bool(meta["lowercase"])


def merges_df(spark, merges: list[Pair]) -> DataFrame:
    """The learned merge table as ``(rank, left, right)`` — the
    storable/joinable artifact (write it next to the corpus the way
    ``pq`` stores codebooks)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank INT, left STRING, right STRING",
    )


def encode_word(word: str, ranks: dict[Pair, int]) -> list[str]:
    """Greedy rank-order BPE encode of one pre-token: repeatedly merge
    ALL occurrences of the lowest-rank pair present (the standard
    GPT-2 ``bpe()`` loop)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        syms = list(_merge_word(tuple(syms), a, b, a + b))
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[Pair],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize every document with a learned merge table:
    ``(doc_id, tokens array<string>, n_tokens)``.

    Pre-tokenization runs JVM-side (same regex as training — one
    regex engine for both phases); the Arrow-batched ``pandas_udf``
    receives pre-token ARRAYS and only runs the merge recursion,
    memoized per distinct pre-token within each batch (web text is
    Zipfian, so the memo hit rate is high). The ranks dict rides the
    closure — broadcast once per executor, O(num_merges) bytes. Zero
    shuffle; embarrassingly parallel at any corpus size."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def _encode(pretok: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(words):
            out: list[str] = []
            for w in words:
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return pretok.apply(enc)

    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    pre = F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), F.lit(0))
    return docs.select(
        F.col(id_col).cast("long").alias(id_col),
        _encode(pre).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
