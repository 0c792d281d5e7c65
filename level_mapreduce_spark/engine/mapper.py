"""Map functions — the engine's UDTF surface.

The reference's whole programming model is a user map function
``doc -> [[key, value], ...]`` (0..N emitted pairs per document;
CouchDB ``emit()`` semantics — reference index.js:208-215, 233-240).
Three realizations, fastest first:

- :class:`ExprMapper` — the map function expressed as Column
  expressions. Stays entirely JVM-side inside whole-stage codegen;
  this is the idiomatic-Spark path and the default.
- :class:`PythonMapper` — an arbitrary Python ``doc -> [(k, v), ...]``
  closure, vectorized through an Arrow pandas UDF (parity with the
  sync map fn, reference index.js:214).
- :class:`AsyncPythonMapper` — an ``async def`` map function, awaited
  in batches inside the pandas UDF (parity with the callback-style
  async map, reference index.js:208-211, 268-276).

Every mapper compiles a documents DataFrame to
``(doc_key, pairs: array<struct<index_key, value>>)``; the engine
explodes ``pairs`` with :func:`pyspark.sql.functions.posexplode` to get
``emit_pos`` (the deterministic replacement for the reference's
``uuid()`` emit-id, index.js:236).
"""

from __future__ import annotations

import json
from collections.abc import Awaitable, Callable, Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_KEY = "doc_key"


def pairs_type(value_type: T.DataType) -> T.ArrayType:
    """array<struct<index_key string, value VT>> — one mapper output row."""
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("index_key", T.StringType(), True),
                T.StructField("value", value_type, True),
            ]
        )
    )


def emit(key: Column | str, value: Column) -> Column:
    """One emitted pair as a struct column (CouchDB emit())."""
    key_col = key if isinstance(key, Column) else F.lit(key)
    return F.struct(
        key_col.cast("string").alias("index_key"), value.alias("value")
    )


class Mapper:
    """Compiles docs -> (doc_key, pairs)."""

    value_type: T.DataType = T.StringType()

    def pairs(self, docs: DataFrame, doc_key: str = DOC_KEY) -> DataFrame:
        raise NotImplementedError


class ExprMapper(Mapper):
    """Map function as Column expressions — the JVM fast path.

    ``pairs_expr`` is a Column of ``array<struct<index_key, value>>``
    over the document columns; build it with :func:`emit`::

        ExprMapper(F.array(emit(F.col("o_orderpriority"),
                                F.col("o_totalprice"))),
                   value_type=T.DoubleType())

    Conditional / variable-arity emits: wrap in ``F.filter`` or
    ``F.flatten`` — it is just a Column.

    ``stages`` — optional ordered ``{name: Column}`` of intermediate
    columns projected (in order) before ``pairs_expr``; each may
    reference the previous ones. Use this whenever ``pairs_expr``
    references an expensive sub-expression more than once or inside a
    higher-order-function lambda: Spark re-evaluates free
    sub-expressions inside HOF lambdas per invocation, while a staged
    column is a row-buffer read (and CollapseProject keeps multi-use
    non-trivial stage columns materialized).
    """

    def __init__(
        self,
        pairs_expr: Column,
        value_type: T.DataType | None = None,
        stages: dict[str, Column] | None = None,
    ):
        self.pairs_expr = pairs_expr
        self.value_type = value_type or T.StringType()
        self.stages = stages or {}

    @classmethod
    def of(
        cls,
        *pairs: tuple[Column | str, Column],
        value_type: T.DataType | None = None,
    ) -> "ExprMapper":
        return cls(
            F.array(*[emit(k, v) for k, v in pairs]), value_type=value_type
        )

    def pairs(self, docs: DataFrame, doc_key: str = DOC_KEY) -> DataFrame:
        for name, col in self.stages.items():
            docs = docs.withColumn(name, col)
        return docs.select(
            F.col(doc_key).cast("string").alias(DOC_KEY),
            self.pairs_expr.cast(pairs_type(self.value_type)).alias("pairs"),
        )


def _doc_records(pdf: pd.DataFrame) -> Iterable[dict]:
    return pdf.to_dict("records")


def _normalize(mapped: Sequence | None) -> list:
    """User fn output -> [{'index_key': str, 'value': v}, ...]."""
    out = []
    for pair in mapped or []:
        k, v = pair[0], pair[1]
        out.append({"index_key": str(k), "value": v})
    return out


class PythonMapper(Mapper):
    """Arbitrary Python map fn, Arrow-vectorized.

    ``fn(doc: dict) -> list[(key, value)]`` exactly like the reference's
    sync map contract (index.js:214; tests/test-basic.js:14). Values are
    JSON-encoded to ``value_type`` StringType by default (the
    reference's schema-less JSON values, index.js:113) unless
    ``value_type`` is given, in which case the raw Python values must
    fit that Spark type.
    """

    def __init__(
        self,
        fn: Callable[[dict], Sequence],
        value_type: T.DataType | None = None,
        json_values: bool | None = None,
    ):
        self.fn = fn
        self.value_type = value_type or T.StringType()
        self.json_values = (
            json_values if json_values is not None else value_type is None
        )

    def _map_batch(self, pdf: pd.DataFrame) -> pd.Series:
        fn, jsonify = self.fn, self.json_values
        out = []
        for doc in _doc_records(pdf):
            pairs = _normalize(fn(doc))
            if jsonify:
                for p in pairs:
                    p["value"] = json.dumps(p["value"], sort_keys=True)
            out.append(pairs)
        return pd.Series(out, dtype=object)

    def pairs(self, docs: DataFrame, doc_key: str = DOC_KEY) -> DataFrame:
        out_type = pairs_type(self.value_type)
        map_batch = self._map_batch

        def run(it: Iterable[pd.DataFrame]):
            for pdf in it:
                yield pd.DataFrame(
                    {
                        DOC_KEY: pdf[doc_key].astype(str),
                        "pairs": map_batch(pdf),
                    }
                )

        schema = T.StructType(
            [
                T.StructField(DOC_KEY, T.StringType(), False),
                T.StructField("pairs", out_type, True),
            ]
        )
        return docs.mapInPandas(run, schema=schema)


class AsyncPythonMapper(PythonMapper):
    """Async map fn (reference AsyncIndex, index.js:268-276).

    ``fn(doc) -> Awaitable[list[(key, value)]]``; one event loop per
    Arrow batch, all docs in the batch awaited concurrently — the
    Spark-shaped replacement for callback-per-record I/O maps.
    """

    def __init__(
        self,
        fn: Callable[[dict], Awaitable[Sequence]],
        value_type: T.DataType | None = None,
        json_values: bool | None = None,
    ):
        super().__init__(fn, value_type=value_type, json_values=json_values)

    def _map_batch(self, pdf: pd.DataFrame) -> pd.Series:
        import asyncio

        fn, jsonify = self.fn, self.json_values

        async def run_all(docs):
            return await asyncio.gather(*[fn(d) for d in docs])

        mapped = asyncio.run(run_all(list(_doc_records(pdf))))
        out = []
        for pairs in mapped:
            pairs = _normalize(pairs)
            if jsonify:
                for p in pairs:
                    p["value"] = json.dumps(p["value"], sort_keys=True)
            out.append(pairs)
        return pd.Series(out, dtype=object)


def struct_order_cmp(*fields: str):
    """Comparator for ``F.array_sort`` over an array of structs whose
    OTHER fields may be unorderable (struct ordering rejects MapType
    anywhere inside, INVALID_ORDERING_TYPE): compares only the named
    fields, in order. The named fields must be non-null (engine order
    columns — emit_pos / index_key / doc_key — always are)."""

    def cmp(left, right):
        out = F.lit(0)
        for f in reversed(fields):
            out = (
                F.when(left[f] < right[f], F.lit(-1))
                .when(left[f] > right[f], F.lit(1))
                .otherwise(out)
            )
        return out

    return cmp
