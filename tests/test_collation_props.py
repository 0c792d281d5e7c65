"""Property tests for the order-preserving key encodings.

The byteslice parity layer (functions/collation.py; reference
index.js:118, 131) rests on one algebraic claim: the encoded strings'
LEXICOGRAPHIC order equals the keys' numeric order, over the full
signed-64 range (ints) / the documented fixed-point range (floats),
with numbers collating before strings in the mixed-type keyspace.
The point tests in test_query.py pin representative values; these
hypothesis properties pin the claim itself, and one Spark job checks
the Column forms character-for-character against the Python twins
over the same adversarial examples.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from level_mapreduce_spark.functions.collation import (
    sortable_int,
    sortable_int_key,
    sortable_num,
    sortable_num_key,
    typed_num_key,
    typed_str_key,
)

I64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)
# |x| < 2**63 / 10**6 with margin; finite only (range bound documented
# in sortable_num's docstring)
FNUM = st.floats(
    min_value=-9.0e12, max_value=9.0e12, allow_nan=False, allow_infinity=False
)


@settings(max_examples=2000, deadline=None)
@given(I64, I64)
def test_sortable_int_key_is_order_preserving(a, b):
    ka, kb = sortable_int_key(a), sortable_int_key(b)
    assert len(ka) == len(kb) == 16
    assert (ka < kb) == (a < b) and (ka == kb) == (a == b)


@settings(max_examples=2000, deadline=None)
@given(FNUM, FNUM)
def test_sortable_num_key_is_order_preserving(a, b):
    # resolution is the fixed-point grid: values colliding at
    # floor(x * 10**scale) legitimately encode equal
    fa, fb = math.floor(a * 10**6), math.floor(b * 10**6)
    ka, kb = sortable_num_key(a), sortable_num_key(b)
    assert (ka < kb) == (fa < fb) and (ka == kb) == (fa == fb)


@settings(max_examples=500, deadline=None)
@given(FNUM, st.text(max_size=8))
def test_mixed_keyspace_numbers_before_strings(x, s):
    assert typed_num_key(x) < typed_str_key(s)


def test_struct_order_cmp_matches_python_sort(spark):
    """The field comparator behind group ordering and as_documents
    (engine/mapper.py struct_order_cmp) must sort an array of structs
    exactly like Python's tuple sort on the named fields — including
    beside an unorderable MapType payload, the case it exists for."""
    import random

    from pyspark.sql import types as T

    from level_mapreduce_spark.engine.mapper import struct_order_cmp

    rng = random.Random(2718)
    rows = []
    for _ in range(40):
        arr = [
            (rng.randrange(5), f"k{rng.randrange(5)}", {"m": rng.randrange(9)})
            for _ in range(rng.randrange(1, 9))
        ]
        rows.append((arr,))
    schema = T.StructType(
        [
            T.StructField(
                "arr",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("pos", T.IntegerType()),
                            T.StructField("key", T.StringType()),
                            T.StructField(
                                "payload",
                                T.MapType(T.StringType(), T.IntegerType()),
                            ),
                        ]
                    )
                ),
            )
        ]
    )
    df = spark.createDataFrame(rows, schema).select(
        "arr",
        F.array_sort("arr", struct_order_cmp("pos", "key")).alias("sorted"),
    )
    for r, (arr,) in zip(df.collect(), rows):
        want = sorted(arr, key=lambda t: (t[0], t[1]))
        got = [(s["pos"], s["key"], dict(s["payload"])) for s in r["sorted"]]
        # ties on (pos, key) keep arbitrary payload order — compare the
        # order fields exactly, the full tuples as multisets
        assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
        assert sorted(map(repr, got)) == sorted(map(repr, want))


def test_column_forms_agree_with_python_twins(spark):
    """The Spark Column encodings and the Python scan-bound twins are
    two implementations of ONE format — byte-identical outputs, swept
    over boundary and random values in a single job."""
    import random

    rng = random.Random(8128)
    ints = (
        [0, 1, -1, (1 << 63) - 1, -(1 << 63), 10, -10, 255, -256]
        + [rng.randrange(-(1 << 63), 1 << 63) for _ in range(120)]
    )
    nums = (
        [0.0, -0.4, 0.4, 1.5, -1.5, 9.0e12, -9.0e12, 1e-7, -1e-7]
        + [rng.uniform(-9.0e12, 9.0e12) for _ in range(120)]
        + [rng.uniform(-1.0, 1.0) for _ in range(60)]
    )
    idf = spark.createDataFrame([(i,) for i in ints], "i long").select(
        "i", sortable_int(F.col("i")).alias("k")
    )
    for r in idf.collect():
        assert r["k"] == sortable_int_key(r["i"]), r["i"]
    ndf = spark.createDataFrame([(x,) for x in nums], "x double").select(
        "x", sortable_num(F.col("x")).alias("k")
    )
    for r in ndf.collect():
        assert r["k"] == sortable_num_key(r["x"]), r["x"]
