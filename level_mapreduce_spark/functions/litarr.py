"""Fast literal double-array Columns.

``F.array(*[F.lit(v) for v in vals])`` costs one py4j round trip PER
ELEMENT — ~3 s of pure driver overhead for a 4096-value nested
codebook literal (measured), paid on EVERY query construction. The
same literal rendered as one SQL string and parsed with a single
``F.expr`` call costs ~15 ms, and ``repr(float)`` round-trips IEEE
doubles exactly, so the resulting plans are bit-identical (asserted by
the encoder-equality tests that ride these literals).

Non-finite values (inf/nan) have no portable SQL literal syntax, so
those fall back to the py4j element path — trained
centroids/codebooks are always finite, probes from real data too.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _finite(vals) -> bool:
    return all(math.isfinite(float(v)) for v in vals)


def _render_1d(vals) -> str:
    return "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"


def lit_doubles(vals) -> Column:
    """``array<double>`` literal Column from a Python sequence."""
    vals = list(vals)
    if not vals:
        return F.array().cast("array<double>")
    if not _finite(vals):
        return F.array(*[F.lit(float(v)) for v in vals])
    return F.expr(_render_1d(vals))


def lit_doubles_2d(mat) -> Column:
    """``array<array<double>>`` literal Column (e.g. centroids)."""
    mat = [list(row) for row in mat]
    if not mat:
        return F.array().cast("array<array<double>>")
    if not all(_finite(row) for row in mat):
        return F.array(
            *[F.array(*[F.lit(float(v)) for v in row]) for row in mat]
        )
    return F.expr(
        "array(" + ",".join(_render_1d(row) for row in mat) + ")"
    )


def lit_doubles_3d(cube) -> Column:
    """``array<array<array<double>>>`` literal Column (e.g. PQ
    codebooks: m x k x dsub)."""
    cube = [[list(row) for row in mat] for mat in cube]
    if not cube:
        return F.array().cast("array<array<array<double>>>")
    if not all(_finite(row) for mat in cube for row in mat):
        return F.array(
            *[
                F.array(
                    *[
                        F.array(*[F.lit(float(v)) for v in row])
                        for row in mat
                    ]
                )
                for mat in cube
            ]
        )
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_render_1d(row) for row in mat) + ")"
            for mat in cube
        )
        + ")"
    )
