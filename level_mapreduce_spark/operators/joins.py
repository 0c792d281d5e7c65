"""Join-family extensions the reference lacks entirely (SURVEY §2.2:
"Joins: absent") and Spark lacks natively: as-of join.

As-of join (time-series "most recent prior fact"): Spark has no ASOF
JOIN operator, and the naive formulations are scale-traps — a range
theta-join explodes to O(n*m) comparisons per key, and a
groupBy+max+rejoin runs two shuffles of the big side plus a join. The
implementation here is the sort-based union trick:

1. tag left (probe) and right (reference) rows and union them;
2. one window over ``partitionBy(key).orderBy(ts, side)`` carries the
   last-seen right payload forward (``F.last(ignorenulls=True)``);
3. keep the left rows, now annotated with their as-of match.

Cost: ONE shuffle of each input (the union shuffles together on the
key), then a per-partition sort — the same plan shape as a sort-merge
join, which is what a native as-of would compile to. Skewed keys get
AQE's skew handling like any other window; there is no per-pair work,
so a hot key costs O(rows log rows), never O(rows²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval range join as a bucketed equi-join.

    The naive formulation ``points JOIN intervals ON p BETWEEN lo AND
    hi`` is a theta-join — Spark plans it as a broadcast nested loop,
    O(|points| × |intervals|) comparisons. At scale the standard
    rewrite maps both sides onto integer buckets of ``bucket_width``
    (each interval explodes to the buckets it overlaps) and equi-joins
    on the bucket key, shuffling/broadcasting on a hashable key; the
    exact BETWEEN predicate then filters within matched buckets only.
    Comparisons drop to O(matches + bucket collisions).

    Intervals are inclusive on both ends. Pick ``bucket_width`` near
    the typical interval length: each interval then lands in ~2
    buckets and each point probes exactly one.
    """
    p_b = points.withColumn(
        "_bkt", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    i_b = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p_b.join(i_b, "_bkt")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bkt")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_prefix: str = "r_",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row
    with ``right.ts <= left.ts`` (strict ``<`` when
    ``allow_exact_matches=False``) for the same ``on`` key; unmatched
    left rows keep nulls (LEFT ASOF semantics).

    Output: every left column, plus each right column (except the key)
    renamed ``{right_prefix}{col}``.

    ``tie_break``: optional right-side column ordering ties among
    equal-``ts`` right rows (the later value wins); required for a
    deterministic result when (key, ts) is not unique on the right.
    """
    rcols = [c for c in right.columns if c != on]
    # side flag orders right rows before (exact-match) or after
    # (strict) the left rows at the same timestamp
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    # a null key matches NOTHING (SQL ASOF / pandas merge_asof
    # semantics, and this file's interval_join equality predicate):
    # dropping null-key RIGHT rows before the union means null-key
    # left rows share a window partition with no right rows and come
    # out unmatched, instead of Window.partitionBy quietly grouping
    # the nulls together and "matching" them
    r_tag = right.where(F.col(on).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0 if allow_exact_matches else 2).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*rcols).alias("_r"),
    )
    order = [F.col("_t"), F.col("_side")]
    if tie_break is not None:
        # among right rows with equal ts, the highest tie_break wins
        # (it sorts last, and last() picks it up)
        order.append(F.col("_r")[tie_break].asc_nulls_first())
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    out_cols = [F.col("_l")[c].alias(c) for c in left.columns]
    out_cols += [
        F.col("_match")[c].alias(f"{right_prefix}{c}") for c in rcols
    ]
    return carried.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join for keys hot on BOTH sides.

    AQE's skew-join split handles a key that is hot on ONE side (it
    splits that side's oversized partition and replicates the other).
    When a key is hot on both sides, every one of its rows still meets
    every other in a single reducer — no split helps. The standard
    rewrite: scatter the left side across ``n_salts`` sub-keys by a
    hash of its OTHER columns (deterministic, no rand() — repeatable
    plans and retries), and replicate the right side once per salt, so
    the hot key's work spreads over ``n_salts`` reducers at the cost
    of ``n_salts``x duplication of the right side.

    Use when: right is too big to broadcast AND key skew is extreme on
    both sides (else plain join + AQE wins). ``how`` supports 'inner'
    and 'left' (the salt spread preserves left rows exactly once).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    non_key = [c for c in left.columns if c not in keys]
    # salt from the non-key columns so a hot key's rows scatter; a
    # key-only left side has nothing to scatter by (all rows of a key
    # are identical) — any constant salt is then correct
    salt_src = non_key or keys
    l_s = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    r_s = right.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")
        ),
    )
    return l_s.join(r_s, [*keys, "_salt"], how).drop("_salt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    within: str = "30 minutes",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Keyed interval join: every right row with the same ``on`` key
    and ``left.ts <= right.ts <= left.ts + within`` (e.g. every
    purchase within 30 minutes after a click — attribution with ALL
    matches, where :func:`asof_join` keeps exactly one). ``how``:
    ``inner`` or ``left`` (unmatched left rows keep null right
    columns).

    With the equi-key present this plans as a sort-merge join (one
    shuffle per side on ``on``) carrying the interval bound inside
    the join — never a nested-loop theta join. The batch twin of
    :func:`..streaming.joins.interval_join_stream`; both converge to
    the same rows on a closed input.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    rcols = [c for c in right.columns if c != on]
    r = right.select(
        F.col(on).alias(f"{right_prefix}{on}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rcols],
    )
    cond = (
        (F.col(f"{right_prefix}{on}") == F.col(on))
        & (F.col(f"{right_prefix}{ts}") >= F.col(ts))
        & (F.col(f"{right_prefix}{ts}") <= F.col(ts) + F.expr(f"INTERVAL {within}"))
    )
    return left.join(r, cond, how).drop(f"{right_prefix}{on}")


def topk_per_key(
    df: DataFrame,
    keys: str | list[str],
    order_by: Column | list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Top-k rows per key as a rank filter Spark plans with
    WindowGroupLimit: each map task pre-truncates its partition to k
    rows per key BEFORE the shuffle, so the shuffle carries
    O(partitions * keys * k) rows — never a global sort, never a full
    per-key sort spill. The building block under ``knn_join`` and
    ``scan(limit=)``-style queries, exposed for direct use.

    ``order_by`` columns should break ties deterministically (append a
    unique id); ``rank_col`` optionally keeps the 1-based rank.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    order_list = order_by if isinstance(order_by, list) else [order_by]
    w = Window.partitionBy(*key_list).orderBy(*order_list)
    ranked = df.withColumn("_rank", F.row_number().over(w)).where(
        F.col("_rank") <= k
    )
    if rank_col is not None:
        return ranked.withColumnRenamed("_rank", rank_col)
    return ranked.drop("_rank")
