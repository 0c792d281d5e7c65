"""Mapper realizations — the UDTF surface (reference index.js:208-215,
233-240, 268-276). Restores the round-1 ``test_mapper`` coverage and
adds the async build + struct-valued index paths that shipped untested.
"""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import (
    AsyncPythonMapper,
    ExprMapper,
    MapIndex,
    PythonMapper,
    emit,
)


def test_mapper(spark):
    """PythonMapper compiles docs -> (doc_key, pairs) with normalized
    {'index_key','value'} structs (reference map contract,
    tests/test-basic.js:14)."""
    df = spark.createDataFrame(
        [("d1", 5), ("d2", 7)], "doc_key string, x int"
    )
    m = PythonMapper(lambda doc: [("k" + str(doc["x"]), doc["x"])])
    rows = m.pairs(df).orderBy("doc_key").collect()
    assert [r["doc_key"] for r in rows] == ["d1", "d2"]
    assert rows[0]["pairs"][0]["index_key"] == "k5"
    assert json.loads(rows[0]["pairs"][0]["value"]) == 5


def test_mapper_zero_emits(spark):
    """0-pair docs produce an empty pairs array (un-index semantics,
    index.js:218-230)."""
    df = spark.createDataFrame([("d1", 0), ("d2", 1)], "doc_key string, x int")
    m = PythonMapper(lambda doc: [("k", doc["x"])] if doc["x"] else [])
    rows = {r["doc_key"]: r["pairs"] for r in m.pairs(df).collect()}
    assert list(rows["d1"]) == []
    assert len(rows["d2"]) == 1


def test_expr_mapper_conditional(spark, store):
    """ExprMapper with conditional emits (F.filter over the pairs array)
    stays JVM-side: no BatchEvalPython / ArrowEvalPython in the plan."""
    df = spark.createDataFrame(
        [("d1", 10.0), ("d2", -1.0)], "doc_key string, v double"
    )
    mapper = ExprMapper(
        F.filter(
            F.array(emit(F.lit("pos"), F.col("v"))),
            lambda p: p["value"] > 0,
        ),
        value_type=T.DoubleType(),
    )
    idx = MapIndex(spark, "cond", mapper, store).build(df)
    assert idx.get("pos") == [10.0]
    plan = idx.read()._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_async_python_mapper_build(spark, store):
    """AsyncPythonMapper end-to-end build (reference AsyncIndex,
    index.js:268-276) — no committed test existed before round 3."""

    async def amap(doc):
        return [("a" + doc["doc_key"], doc["x"])]

    df = spark.createDataFrame([("1", 11), ("2", 22)], "doc_key string, x int")
    idx = MapIndex(spark, "async", AsyncPythonMapper(amap), store).build(df)
    assert [json.loads(v) for v in idx.get("a1")] == [11]
    assert idx.count() == 2


def test_struct_valued_index(spark, store):
    """Typed struct values survive build/get (SURVEY §1.2: typed
    StructType columns are the idiomatic mapping of JSON values)."""
    vt = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = spark.createDataFrame(
        [("d1", 1, "one")], "doc_key string, a long, b string"
    )
    mapper = ExprMapper.of((F.lit("k"), F.struct("a", "b")), value_type=vt)
    idx = MapIndex(spark, "structv", mapper, store).build(df)
    [v] = idx.get("k")
    assert (v["a"], v["b"]) == (1, "one")


def test_map_typed_doc_column(spark, store):
    """Docs containing a MapType column build/update fine — xxhash64
    cannot hash maps directly (ADVICE r2 item 3), so the dedup
    tie-break hashes a JSON serialization."""
    df = spark.createDataFrame(
        [("d1", {"x": 1}), ("d1", {"x": 2})],
        T.StructType(
            [
                T.StructField("doc_key", T.StringType()),
                T.StructField("m", T.MapType(T.StringType(), T.LongType())),
            ]
        ),
    )
    mapper = ExprMapper.of(
        (F.lit("k"), F.col("m")["x"]), value_type=T.LongType()
    )
    idx = MapIndex(spark, "mapty", mapper, store).build(df)
    # duplicate doc_key deduped to exactly one row, deterministically
    assert idx.count() == 1
    idx.update(df)
    assert idx.count() == 1


def test_deferred_compaction_stays_correct(spark, store):
    """auto_compact=False: update() flags compaction_due instead of
    stalling the batch with an O(index) rewrite (100 TB scale rule);
    reads stay correct with compaction deferred, and a later compact()
    preserves the live view."""
    from level_mapreduce_spark.engine import index as index_mod

    df0 = spark.createDataFrame(
        [(f"d{i}", float(i)) for i in range(8)], "doc_key string, v double"
    )
    mapper = ExprMapper.of((F.lit("k"), F.col("v")), value_type=T.DoubleType())
    idx = MapIndex(spark, "defc", mapper, store, auto_compact=False)
    idx.build(df0)
    n_epochs = index_mod.AUTO_COMPACT_EPOCHS + 2
    for e in range(n_epochs):
        upd = spark.createDataFrame(
            [(f"d{e % 8}", float(100 * e))], "doc_key string, v double"
        )
        idx.update(upd)
    assert idx.compaction_due  # crossed the threshold, not compacted
    expected = {}
    for i in range(8):
        expected[f"d{i}"] = float(i)
    for e in range(n_epochs):
        expected[f"d{e % 8}"] = float(100 * e)
    live = sorted(
        (r["doc_key"], r["value"]) for r in idx.read().collect()
    )
    assert live == sorted(expected.items())
    idx.compact()
    assert not idx.compaction_due
    after = sorted((r["doc_key"], r["value"]) for r in idx.read().collect())
    assert after == live
