"""Order-preserving key encodings for non-string index keys.

The reference stores keys through ``byteslice``'s typed, order-
preserving tuple encoding (index.js:118, 131), so numeric keys sort
numerically in the LSM. This engine's ``index_key`` column is a plain
string (documented narrowing, SURVEY §1.2) — a raw numeric cast sorts
lexicographically ("10" < "2"). These helpers close that gap: encode a
numeric key to a fixed-width string whose LEXICOGRAPHIC order equals
the numeric order, use it in ``emit()``, and build scan bounds with
the Python twins.

Encoding: the 64-bit two's-complement value with the sign bit flipped
(``x ^ (1 << 63)``) renders as 16-digit zero-padded uppercase hex —
unsigned byte order of that form is exactly signed numeric order, for
the full long range including negatives. Fractional keys go through a
documented fixed-point scale first.

Spark side and Python side are two implementations of one format;
``tests/test_query.py`` asserts they agree and that index scan order
follows numeric order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SIGN_BIT = -(1 << 63)  # long MIN_VALUE: the sign-bit-only pattern

__all__ = [
    "sortable_int",
    "sortable_num",
    "sortable_int_key",
    "sortable_num_key",
    "typed_num",
    "typed_str",
    "typed_num_key",
    "typed_str_key",
]


def sortable_int(col: Column) -> Column:
    """Column form: integral key -> 16-hex order-preserving string.

    ``F.hex`` of a negative long is already the full 16-digit two's
    complement; positives are zero-padded to the same width.
    """
    flipped = col.cast("long").bitwiseXOR(F.lit(_SIGN_BIT))
    return F.lpad(F.hex(flipped), 16, "0")


def sortable_num(col: Column, scale: int = 6) -> Column:
    """Fractional key -> fixed-point order-preserving string.

    Scales by ``10**scale`` and truncates toward negative infinity
    (floor — truncation toward zero would collate ``-0.4`` and ``0.4``
    both as ``0``, breaking order across the sign boundary). Range
    bound: ``|key| < 2**63 / 10**scale`` (~9.2e12 at the default
    scale) — raise/lower ``scale`` to trade range for resolution.
    """
    return sortable_int(F.floor(col.cast("double") * F.lit(10**scale)))


def sortable_int_key(n: int) -> str:
    """Python twin of :func:`sortable_int` for scan/get bounds."""
    return format((int(n) ^ (1 << 63)) & (1 << 64) - 1, "016X")


def sortable_num_key(x: float, scale: int = 6) -> str:
    """Python twin of :func:`sortable_num`."""
    import math

    return sortable_int_key(math.floor(float(x) * 10**scale))


# ---------------------------------------------------------------- mixed-type
# byteslice collates VALUES OF DIFFERENT TYPES in one keyspace, numbers
# before strings (reference index.js:118 — e.g. a map fn emitting both
# numeric and string keys). A 1-byte class prefix ('n:' < 's:' in byte
# order) + the order-preserving numeric encoding reproduces that class
# ordering for map fns that emit mixed types: wrap each emit's key in
# the matching tag, and scan bounds with the Python twins.


def typed_num(col: Column, scale: int = 6) -> Column:
    """Numeric key in a mixed-type keyspace: 'n:' + fixed-point
    order-preserving encoding — all numbers collate before all
    :func:`typed_str` keys, internally in numeric order."""
    return F.concat(F.lit("n:"), sortable_num(col, scale))


def typed_str(col: Column) -> Column:
    """String key in a mixed-type keyspace: 's:' + the raw string —
    collates after every :func:`typed_num` key, internally in
    lexicographic order."""
    return F.concat(F.lit("s:"), col.cast("string"))


def typed_num_key(x: float, scale: int = 6) -> str:
    """Python twin of :func:`typed_num` for scan/get bounds."""
    return "n:" + sortable_num_key(x, scale)


def typed_str_key(s: str) -> str:
    """Python twin of :func:`typed_str`."""
    return "s:" + str(s)
