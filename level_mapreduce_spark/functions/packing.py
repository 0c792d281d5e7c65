"""(doc_id, small-count) long packing for stored indexes.

Several stored-index families encode a document id plus a small
per-document counter (window position, term frequency) into ONE
bigint index value: ``value = doc_id * 2^21 + n``. One long instead
of a struct keeps the stored rows narrow and the unpack a pair of
integer bit ops. 21 bits of counter caps per-document positions /
frequencies at ~2M and doc ids at 2^42 (63 usable bits in a signed
long minus 21) — enforced by :func:`guard_packed`, a per-doc
``raise_error`` wrapper, so an out-of-range document FAILS the
build/update instead of silently unpacking as some other document's
rows (a negative doc_id would additionally desync the div/pmod
unpack).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PACK_BITS = 21
PACK_MOD = 1 << PACK_BITS
PACK_DOC_ID_LIMIT = 1 << (63 - PACK_BITS)


def pack(doc_id_l: Column, n: Column) -> Column:
    """``doc_id * 2^21 + n`` as a long. Injective only inside the
    :func:`guard_packed` bounds — every mapper that packs must also
    emit one guarded column per doc so the bounds are checked."""
    return doc_id_l * F.lit(PACK_MOD) + n.cast("long")


def unpack_doc_id(value: Column) -> Column:
    """High 42 bits. Integer shift, not ``/``-then-cast: ``/`` is
    DOUBLE division, exact only while the packed value fits the
    53-bit mantissa."""
    return F.shiftright(value, PACK_BITS)


def unpack_n(value: Column) -> Column:
    """Low 21 bits."""
    return value.bitwiseAND(F.lit(PACK_MOD - 1))


def guard_packed(
    out: Column, doc_id_l: Column, n: Column, n_label: str, op_label: str
) -> Column:
    """Return ``out`` when ``(doc_id_l, n)`` are inside the packing
    bounds, else raise per offending row. ``raise_error`` is NullType;
    ``when``/``otherwise`` coerces it under ``out``'s type and it
    throws at evaluation time — ride it on a column every document
    emits exactly once (the length row), so a bad doc fails the
    build/update job."""
    bounds_ok = (
        doc_id_l.isNotNull()
        & (doc_id_l >= 0)
        & (doc_id_l < F.lit(PACK_DOC_ID_LIMIT))
        & (n < F.lit(PACK_MOD))
    )
    return F.when(bounds_ok, out).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"{op_label} packing overflow: doc_id="),
                F.coalesce(doc_id_l.cast("string"), F.lit("null")),
                F.lit(
                    " (must be in [0, 2^%d)) %s="
                    % (63 - PACK_BITS, n_label)
                ),
                n.cast("string"),
                F.lit(" (must be < 2^%d)" % PACK_BITS),
            )
        )
    )
