"""Staging pins — keep expensive staged columns materialized.

Catalyst's ``CollapseProject`` inlines a projected column back into its
consumer when the consumer references it at most once *textually*. A
reference inside a higher-order-function lambda is textually one
reference but evaluates once per lambda invocation — so inlining an
expensive array expression into, say, a 16-hash minhash ``transform``
re-runs the whole upstream chain 16× per row (and nested HOFs multiply:
bands × hashes × shingles re-tokenizes the document hundreds of times).

``pin_array_arg(col, expr)`` adds a second, semantically-inert textual
reference (``size(col) >= 0`` — always true for a non-null array, and a
null array maps to a null result exactly as the unguarded expression
would). Two references make CollapseProject keep the producer Project,
so the column is computed once per row into the row buffer and every
lambda invocation reads the buffer.

Use it inside any Column-returning function whose result iterates its
array argument more than once (directly or via lambdas), so call sites
stay oblivious.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def unpushable(pred: Column) -> Column:
    """``pred`` wrapped so PushDownPredicates cannot move it below its
    Project (or split it): the whole predicate is made non-deterministic
    via a trivially-true ``monotonically_increasing_id() >= 0`` branch,
    with semantics identical to ``pred``.

    Use on a filter over an expensive computed column that sits above a
    nested-loop join: pushed into the join condition, the column's full
    definition would be re-evaluated per candidate pair on the join's
    INTERPRETED path (joins don't codegen their conditions), instead of
    once per row in the codegen'd Project. Note a plain conjunction with
    a non-deterministic term does NOT work — the optimizer splits
    conjuncts and pushes the deterministic half.
    """
    return F.when(
        F.monotonically_increasing_id() >= 0, pred
    ).otherwise(F.lit(True))


def pin_array_arg(col: Column, expr: Column) -> Column:
    """``expr`` guarded by a trivially-true predicate on ``col``.

    Semantics: identical to ``expr`` for non-null ``col``; null when
    ``col`` is null (matching any array HOF over a null input).
    Purpose: the extra ``size(col)`` reference pins ``col``'s producer
    Project against CollapseProject inlining (see module docstring).
    """
    return F.when(F.size(col) >= 0, expr)
