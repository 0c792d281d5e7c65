"""KV bulk-export ingestion bridge (sources/kv_export.py) — the
reference's input contract as a dump file: JSONL {key, value, deleted,
seq} (index.js:173-180) -> change feed -> build()/update()."""

import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import ExprMapper, MapIndex
from level_mapreduce_spark.sources.kv_export import (
    read_kv_export,
    write_kv_export,
)
from level_mapreduce_spark.sources.tables import load_table


@pytest.fixture()
def dump_dir(tmp_path):
    return str(tmp_path / "dump")


def _prio_mapper():
    return ExprMapper.of(
        (F.col("o_orderpriority"), F.col("o_totalprice")),
        value_type=T.DoubleType(),
    )


def test_round_trip_build_matches_direct(spark, sf_dir, store, dump_dir):
    """export orders -> read back -> build == building straight from
    the table (the bridge is lossless for the indexed columns)."""
    orders = load_table(spark, sf_dir, "orders")
    write_kv_export(
        orders, dump_dir, key_col="o_orderkey", seq_col="o_orderkey"
    )
    feed = read_kv_export(spark, dump_dir)
    assert {"o_orderpriority", "o_totalprice", "doc_key", "deleted", "seq"} <= set(
        feed.columns
    )

    via_dump = MapIndex(spark, "via_dump", _prio_mapper(), store)
    via_dump.build(feed, assume_unique=True)
    direct = MapIndex(
        spark, "direct", _prio_mapper(), store, doc_key="o_orderkey"
    )
    direct.build(orders, assume_unique=True)

    a = sorted(
        tuple(r)
        for r in via_dump.read().select("index_key", "value", "doc_key").collect()
    )
    b = sorted(
        tuple(r)
        for r in direct.read().select("index_key", "value", "doc_key").collect()
    )
    assert a == b and len(a) > 0


def test_explicit_value_schema_skips_inference(spark, sf_dir, dump_dir):
    orders = load_table(spark, sf_dir, "orders")
    write_kv_export(
        orders, dump_dir, key_col="o_orderkey", seq_col="o_orderkey"
    )
    schema = T.StructType(
        [f for f in orders.schema.fields if f.name != "o_orderkey"]
    )
    feed = read_kv_export(spark, dump_dir, value_schema=schema)
    row = feed.where(~F.col("deleted")).select("o_totalprice").head()
    assert isinstance(row[0], float)


def test_seq_last_wins_and_tombstone(spark, store, tmp_path):
    """A dump carrying several versions of one key: highest seq wins;
    a deleted record (null value) un-indexes the doc."""
    lines = [
        '{"key": "a", "value": {"k": "x", "v": 1.0}, "deleted": false, "seq": 1}',
        '{"key": "a", "value": {"k": "x", "v": 2.0}, "deleted": false, "seq": 2}',
        '{"key": "b", "value": {"k": "y", "v": 5.0}, "deleted": false, "seq": 1}',
        '{"key": "b", "value": null, "deleted": true, "seq": 7}',
        '{"key": "c", "value": {"k": "z", "v": 9.0}, "deleted": false, "seq": 1}',
    ]
    p = tmp_path / "mini"
    p.mkdir()
    (p / "part-0.json").write_text("\n".join(lines) + "\n")
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    feed = read_kv_export(spark, str(p), value_schema=schema)
    idx = MapIndex(
        spark,
        "mini",
        ExprMapper.of((F.col("k"), F.col("v")), value_type=T.DoubleType()),
        store,
    )
    idx.build(feed)  # NOT assume_unique: the seq window must dedup
    got = {
        (r["index_key"], r["value"], r["doc_key"])
        for r in idx.read().collect()
    }
    assert got == {("x", 2.0, "a"), ("z", 9.0, "c")}


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """JSONL ingestion: parseable lines come back typed and intact,
    malformed lines land in the quarantine channel verbatim, and a
    documents round-trip through write_jsonl/read_jsonl is lossless."""
    import json
    import os

    from level_mapreduce_spark.sources.jsonl import read_jsonl, write_jsonl
    from level_mapreduce_spark.sources.tables import load_table

    src = tmp_path / "docs_jsonl"
    os.makedirs(src)
    good_lines = [
        {"doc_id": 1, "text": "hello world", "lang": "en",
         "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr",
         "source": "web", "n_chars": 7},
    ]
    with open(src / "part-000.jsonl", "w") as f:
        for d in good_lines:
            f.write(json.dumps(d) + "\n")
        f.write('{"doc_id": 3, "text": "truncated...\n')      # malformed
        f.write("not json at all\n")                           # malformed
    good, bad = read_jsonl(spark, str(src))
    assert {r["doc_id"]: r["text"] for r in good.collect()} == {
        1: "hello world", 2: "bonjour"
    }
    raws = [r["raw"] for r in bad.collect()]
    assert len(raws) == 2 and "not json at all" in raws

    # round-trip the real documents table
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_out")
    write_jsonl(docs, out, n_files=2)
    back, bad2 = read_jsonl(spark, out)
    assert bad2.count() == 0
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in back.collect()}
    b = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert a == b
