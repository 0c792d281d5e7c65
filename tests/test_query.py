"""Query pipeline tests — reference index.js:13-94 (map/asyncMap/filter/
group/end) plus the round-2 regression surface: map_fn/async_map/
filter_fn must work on BOTH scalar and struct value columns
(pandas_udf type-hint inference, ADVICE r2 item 1).
"""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import ExprMapper, MapIndex, emit


def scalar_index(spark, store):
    """orders-like index: key=k, value=double."""
    df = spark.createDataFrame(
        [("d1", "a", 1.0), ("d2", "a", 2.0), ("d3", "b", 3.0), ("d4", "c", 4.0)],
        "doc_key string, k string, v double",
    )
    mapper = ExprMapper.of((F.col("k"), F.col("v")), value_type=T.DoubleType())
    return MapIndex(spark, "qscalar", mapper, store).build(df)


def struct_index(spark, store):
    """index whose value is a struct<name string, n long>."""
    df = spark.createDataFrame(
        [("d1", "a", "x", 1), ("d2", "b", "y", 2)],
        "doc_key string, k string, name string, n long",
    )
    vt = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    mapper = ExprMapper.of(
        (F.col("k"), F.struct("name", "n")), value_type=vt
    )
    return MapIndex(spark, "qstruct", mapper, store).build(df)


# --------------------------------------------------------- Column fast path


def test_map_column(spark, store):
    """index.js:47-52 — scalar projection, Column expression path."""
    q = scalar_index(spark, store).query().map(value=F.col("value") * 2)
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("a", 2.0), ("a", 4.0), ("b", 6.0), ("c", 8.0)]


def test_filter_column(spark, store):
    """index.js:57-63 — drop-on-predicate."""
    q = scalar_index(spark, store).query().filter(F.col("value") > 2.5)
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("b", 3.0), ("c", 4.0)]


def test_map_fn_skip_on_error(spark, store):
    """Reference pipeline drop-on-error (index.js:34): a record whose
    mutation throws is dropped, the rest flow through."""

    def boom_on_b(k, v):
        if k == "b":
            raise ValueError("skip me")
        return v * 10

    q = (
        scalar_index(spark, store)
        .query()
        .map_fn(boom_on_b, value_type=T.DoubleType(), skip_on_error=True)
    )
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("a", 10.0), ("a", 20.0), ("c", 40.0)]


def test_filter_fn_skip_on_error(spark, store):
    """A throwing predicate drops the record (an erroring mutation
    skips, index.js:34) instead of failing the query."""

    def pred(k, v):
        if k == "b":
            raise ValueError("skip me")
        return v < 3.5

    q = (
        scalar_index(spark, store)
        .query()
        .filter_fn(pred, skip_on_error=True)
    )
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("a", 1.0), ("a", 2.0)]


def test_async_map_skip_on_error(spark, store):
    """A coroutine that raises drops its record (index.js:34); the
    rest of the Arrow batch still completes."""

    async def boom_on_b(k, v):
        if k == "b":
            raise ValueError("skip me")
        return v * 10

    q = (
        scalar_index(spark, store)
        .query()
        .async_map(boom_on_b, value_type=T.DoubleType(), skip_on_error=True)
    )
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("a", 10.0), ("a", 20.0), ("c", 40.0)]


def test_scan_reverse(spark, store):
    """levelup reverse passthrough: last N rows in key order, planned
    as top-k."""
    idx = scalar_index(spark, store)
    rows = idx.scan(sort=True, reverse=True, limit=2).collect()
    assert [r["index_key"] for r in rows] == ["c", "b"]
    plan = (
        idx.scan(limit=2, reverse=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------ Python record path


def test_map_fn_scalar(spark, store):
    """index.js:47-52 closure parity — Arrow-batched pandas UDF on a
    scalar value column (broken in round 2, regression lock)."""
    q = scalar_index(spark, store).query(key="a").map_fn(
        lambda k, v: v + 0.5, value_type=T.DoubleType()
    )
    assert sorted(r["value"] for r in q.end()) == [1.5, 2.5]


def test_map_fn_struct(spark, store):
    """map_fn over a StructType value column — arrives as per-row dicts."""
    q = struct_index(spark, store).query().map_fn(
        lambda k, v: f'{v["name"]}:{v["n"]}', value_type=T.StringType()
    )
    assert sorted(r["value"] for r in q.end()) == ["x:1", "y:2"]


def test_map_fn_jsonify_default(spark, store):
    """No value_type -> JSON-encoded string (schema-less reference
    values, index.js:113)."""
    q = scalar_index(spark, store).query(key="b").map_fn(lambda k, v: {"was": v})
    assert [json.loads(r["value"]) for r in q.end()] == [{"was": 3.0}]


def test_async_map(spark, store):
    """index.js:53-56, 268-276 — async projection, batch-awaited."""

    async def double(k, v):
        return v * 2

    q = scalar_index(spark, store).query().async_map(
        double, value_type=T.DoubleType()
    )
    assert sorted(r["value"] for r in q.end()) == [2.0, 4.0, 6.0, 8.0]


def test_async_map_struct(spark, store):
    async def name_of(k, v):
        return v["name"]

    q = struct_index(spark, store).query().async_map(
        name_of, value_type=T.StringType()
    )
    assert sorted(r["value"] for r in q.end()) == ["x", "y"]


def test_filter_fn(spark, store):
    q = scalar_index(spark, store).query().filter_fn(lambda k, v: v >= 3.0)
    got = sorted((r["key"], r["value"]) for r in q.end())
    assert got == [("b", 3.0), ("c", 4.0)]


def test_filter_fn_struct(spark, store):
    q = struct_index(spark, store).query().filter_fn(lambda k, v: v["n"] == 2)
    assert [r["key"] for r in q.end()] == ["b"]


# ---------------------------------------------------------------- group


def test_group(spark, store):
    """index.js:64-89 intent — key -> [values], no boundary loss,
    uniform output shape (reference bugs fixed per SURVEY §7.4)."""
    rows = scalar_index(spark, store).query().group().end()
    got = {r["key"]: list(r["results"]) for r in rows}
    assert got == {"a": [1.0, 2.0], "b": [3.0], "c": [4.0]}


def test_group_finish(spark, store):
    """The declared-but-unused finish finalizer (index.js:64), applied."""
    rows = (
        scalar_index(spark, store)
        .query()
        .group(finish=lambda r: F.size(r))
        .end()
    )
    assert {r["key"]: r["result"] for r in rows} == {"a": 2, "b": 1, "c": 1}


def test_group_finish_fn_python(spark, store):
    """The arbitrary-Python finish closure (the reference's actual
    finish contract is a JS closure): typed result, JSON default, and
    mutual exclusion with the Column form."""
    import json as _json

    import pytest as _pytest
    from pyspark.sql import types as T

    idx = scalar_index(spark, store)
    typed = (
        idx.query()
        .group(finish_fn=lambda vs: sum(vs), finish_type=T.DoubleType())
        .end()
    )
    assert {r["key"]: r["result"] for r in typed} == {
        "a": 3.0,
        "b": 3.0,
        "c": 4.0,
    }
    untyped = idx.query().group(finish_fn=lambda vs: {"n": len(vs)}).end()
    assert {r["key"]: _json.loads(r["result"]) for r in untyped} == {
        "a": {"n": 2},
        "b": {"n": 1},
        "c": {"n": 1},
    }
    with _pytest.raises(ValueError):
        idx.query().group(
            finish=lambda r: F.size(r), finish_fn=lambda vs: len(vs)
        )


def test_group_agg_finisher_plans_direct(spark, store):
    """An order-insensitive aggregate finisher (array_min/array_max/
    size) plans as a direct map-side-combinable agg — the per-key
    value array is never materialized (VERDICT r3 item 8)."""
    idx = scalar_index(spark, store)
    for fin, expected in [
        (lambda r: F.array_min(r), {"a": 1.0, "b": 3.0, "c": 4.0}),
        (lambda r: F.array_max(r), {"a": 2.0, "b": 3.0, "c": 4.0}),
        (lambda r: F.size(r), {"a": 2, "b": 1, "c": 1}),
    ]:
        q = idx.query().group(finish=fin)
        plan = q.df._jdf.queryExecution().executedPlan().toString()
        assert "collect_list" not in plan, plan
        assert "partial_" in plan  # map-side combine
        assert {r["key"]: r["result"] for r in q.end()} == expected
    # a non-aggregate finisher still takes the collect path
    q2 = idx.query().group(finish=lambda r: F.slice(r, 1, 1))
    plan2 = q2.df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan2


def test_chain_past_group(spark, store):
    """Mutations run in order past a group (index.js:32-44): map and
    filter keep working on the grouped value column."""
    q = (
        scalar_index(spark, store)
        .query()
        .group(finish=lambda r: F.size(r))
        .filter(F.col("result") > 1)
        .map(value=F.col("result") * 10)
    )
    rows = q.end()
    assert [(r["key"], r["result"]) for r in rows] == [("a", 20)]


def test_map_fn_after_group(spark, store):
    """Python record path over grouped array values."""
    q = (
        scalar_index(spark, store)
        .query()
        .group()
        .map_fn(lambda k, v: sum(v), value_type=T.DoubleType())
    )
    rows = q.end()
    assert {r["key"]: r["results"] for r in rows} == {"a": 3.0, "b": 3.0, "c": 4.0}


# ------------------------------------------------------------- collation


def test_numeric_key_collation(spark, store):
    """byteslice-style order-preserving numeric keys (index.js:118):
    raw numeric casts collate lexicographically ('10' < '2');
    sortable_int keys scan in true numeric order, negatives included,
    and the Python bound encoder agrees with the Column encoder."""
    from level_mapreduce_spark.functions import (
        sortable_int,
        sortable_int_key,
        sortable_num,
        sortable_num_key,
    )

    df = spark.createDataFrame(
        [("d%d" % i, n, float(n) / 4) for i, n in enumerate([-3, 2, 10, -20, 0])],
        "doc_key string, n long, x double",
    )
    mapper = ExprMapper.of(
        (sortable_int(F.col("n")), F.col("n")), value_type=T.LongType()
    )
    idx = MapIndex(spark, "qcoll", mapper, store).build(df)
    got = [r["value"] for r in idx.scan(sort=True).collect()]
    assert got == [-20, -3, 0, 2, 10]
    # range scan with Python-encoded bounds: [-3, 10) numerically
    lo, hi = sortable_int_key(-3), sortable_int_key(10)
    inr = [r["value"] for r in idx.scan(start=lo, end=hi, sort=True).collect()]
    assert inr == [-3, 0, 2]
    # Column and Python encoders produce the identical format
    enc = df.select(sortable_int(F.col("n")).alias("e"), "n").collect()
    assert all(r["e"] == sortable_int_key(r["n"]) for r in enc)
    encf = df.select(sortable_num(F.col("x")).alias("e"), "x").collect()
    assert all(r["e"] == sortable_num_key(r["x"]) for r in encf)
    # fractional keys order across the sign boundary (floor, not trunc)
    fm = ExprMapper.of(
        (sortable_num(F.col("x")), F.col("x")), value_type=T.DoubleType()
    )
    fidx = MapIndex(spark, "qcollf", fm, store).build(df)
    gotf = [r["value"] for r in fidx.scan(sort=True).collect()]
    assert gotf == [-5.0, -0.75, 0.0, 0.5, 2.5]


# --------------------------------------------------------------- actions


def test_count_and_end_order(spark, store):
    q = scalar_index(spark, store).query()
    assert q.count() == 4
    assert [r["key"] for r in q.end(sort=True)] == ["a", "a", "b", "c"]


def test_mixed_type_key_collation(spark, store):
    """byteslice collates numbers BEFORE strings in one keyspace
    (reference index.js:118): a map fn emitting both a numeric and a
    string key per doc, wrapped in the typed_* class tags, scans with
    every numeric key first (in numeric order), then every string key
    (lexicographic) — and Python bound encoders agree with the Column
    encoders."""
    from level_mapreduce_spark.functions import (
        typed_num,
        typed_num_key,
        typed_str,
        typed_str_key,
    )

    df = spark.createDataFrame(
        [("d1", 10.0, "b"), ("d2", -3.0, "a"), ("d3", 2.0, "c")],
        "doc_key string, n double, s string",
    )
    mapper = ExprMapper.of(
        (typed_num(F.col("n")), F.col("n").cast("string")),
        (typed_str(F.col("s")), F.col("s")),
    )
    idx = MapIndex(spark, "qmixed", mapper, store).build(df)
    got = [r["value"] for r in idx.scan(sort=True).collect()]
    assert got == ["-3.0", "2.0", "10.0", "a", "b", "c"]
    # range scan spanning the class boundary: numbers >= 2 plus
    # strings < 'c' — bounds built with the Python twins
    inr = [
        r["value"]
        for r in idx.scan(
            start=typed_num_key(2.0), end=typed_str_key("c"), sort=True
        ).collect()
    ]
    assert inr == ["2.0", "10.0", "a", "b"]
    enc = df.select(typed_num(F.col("n")).alias("e"), "n").collect()
    assert all(r["e"] == typed_num_key(r["n"]) for r in enc)
    encs = df.select(typed_str(F.col("s")).alias("e"), "s").collect()
    assert all(r["e"] == typed_str_key(r["s"]) for r in encs)


def test_group_limit_per_key(spark, store):
    """group(limit_per_key=N) keeps the FIRST N values per key in
    (doc_key, emit_pos) order, pre-truncated before the collect (the
    hot-key guard), and plans the rank filter as a window group limit."""
    rows = [(f"d{i:02d}", "a" if i % 2 == 0 else "b", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_key string, k string, v double")
    idx = MapIndex(
        spark,
        "qglimit",
        ExprMapper.of((F.col("k"), F.col("v")), value_type=T.DoubleType()),
        store,
    ).build(df)
    q = idx.query().group(limit_per_key=3)
    got = {r["key"]: r["results"] for r in q.df.collect()}
    assert got == {"a": [0.0, 2.0, 4.0], "b": [1.0, 3.0, 5.0]}
    plan = q.df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    # unbounded form unchanged
    full = {r["key"]: r["results"] for r in idx.query().group().df.collect()}
    assert len(full["a"]) == 5 and len(full["b"]) == 5


def test_group_map_typed_value_without_order_cols(spark, store):
    """group() over a map-bearing value WITHOUT (doc_key, emit_pos)
    order columns must not fail analysis (the default array_sort
    comparator rejects MapType — INVALID_ORDERING_TYPE); it collects
    unordered, since no deterministic value order exists there
    (ADVICE r8). With order columns present the comparator never
    inspects the value, so that path is unaffected."""
    from level_mapreduce_spark.engine.query import Query

    df = spark.createDataFrame(
        [("a", {"x": 1}), ("a", {"x": 2}), ("b", {"y": 3})],
        T.StructType(
            [
                T.StructField("key", T.StringType()),
                T.StructField(
                    "value", T.MapType(T.StringType(), T.LongType())
                ),
            ]
        ),
    )
    rows = Query(df).group().end()
    got = {
        r["key"]: sorted(sorted(m.items()) for m in r["results"])
        for r in rows
    }
    assert got == {"a": [[("x", 1)], [("x", 2)]], "b": [[("y", 3)]]}
