"""Z-order (Morton-curve) data layout — multi-column file skipping.

A sorted layout prunes scans on ONE column: parquet row-group min/max
stats are narrow for the sort key and useless for everything else. The
reference has exactly that world view — one LevelDB keyspace, one sort
order (index.js:113, 124-138). At 100 TB you routinely filter the same
table by several columns (time AND user, lang AND length), and
re-sorting per predicate is off the table.

Z-ordering interleaves the bits of several normalized columns into one
integer and sorts by THAT: points close in z-value are close in every
participating dimension, so each written file covers a narrow range of
EACH column and parquet min/max stats prune scans on ANY of them. The
trade: per-column spans are ~(1/n_files)^(1/k) of the domain for k
columns rather than 1/n_files for the single sorted column — k-way
skipping is bought by diluting each dimension's locality.

All JVM-side Column arithmetic (shift/mask/or — whole-stage codegen),
one range repartition on the z-value, one in-partition sort: the same
plan shape as any sorted write. Min/max normalization stats are two
driver scalars per column from one aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(
    scaled: list[Column],
    bits: int = 12,
) -> Column:
    """Interleave ``bits`` low bits of each already-scaled integer
    column into a Morton code (column i contributes bit b to output
    position ``b * len(scaled) + i``). Pure bitwise Column expression.
    """
    k = len(scaled)
    parts = []
    for i, c in enumerate(scaled):
        for b in range(bits):
            parts.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def z_scale(
    col: Column, lo: float | None, hi: float | None, bits: int = 12
) -> Column:
    """Min-max scale a numeric column to a ``bits``-bit integer rank
    (the z_value input). Constant columns — including entirely-null
    ones, whose min/max bounds are ``None`` — scale to 0, contributing
    nothing to the interleave while the other dimensions still
    cluster."""
    if lo is None or hi is None:
        return F.lit(0).cast("long")
    span = hi - lo
    if span <= 0:
        return F.lit(0).cast("long")
    # null VALUES rank 0 (not null): one null dimension would
    # otherwise null the whole interleaved z-value for that row
    return F.coalesce(
        F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                ((col.cast("double") - F.lit(float(lo))) / F.lit(float(span)))
                * ((1 << bits) - 1),
            ),
        ).cast("long"),
        F.lit(0).cast("long"),
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet z-ordered on ``cols``: scale each
    column to ``bits``-bit ranks (one stats pass for min/max),
    range-repartition on the interleaved z-value into ``n_files``
    output partitions, sort within partitions, write. Every output
    file then spans a narrow range of EVERY participating column, so
    later scans filtering on any of them skip most files via parquet
    min/max stats (PushedFilters + row-group skipping)."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    if all(stats[f"_lo_{c}"] is None for c in cols):
        # empty input, or every layout column entirely null: nothing
        # to cluster on — write as-is rather than crash on None bounds
        # (a PARTIALLY-null column set still clusters below: all-null
        # columns scale to the constant 0 rank)
        df.write.mode("overwrite").parquet(path)
        return
    scaled = [
        z_scale(F.col(c), stats[f"_lo_{c}"], stats[f"_hi_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("_z", z_value(scaled, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
