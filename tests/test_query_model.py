"""Model-based differential test of the Query pipeline executor.

Random compositions of the pipeline surface (map / map_fn / async_map /
filter / filter_fn(skip_on_error) / group in its five realizations /
post-group map+filter — reference index.js:24-94, intended semantics
per SURVEY §7.4) are evaluated both through the engine and through a
pure-Python record interpreter, and the collected results compared
exactly. What this pins beyond the fixed oracle-gated pipelines is the
COMPOSITION laws: column naming across a group boundary
(value -> results -> result), the documented (doc_key, emit_pos)
group ordering surviving earlier maps/filters, drop-on-error filters
interleaved with typed maps, and the agg-fastpath vs collect-fallback
group plans agreeing under every prefix.
"""

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import ExprMapper, MapIndex

KEYS = list("abcdef")


def _build_index(spark, store):
    rng = random.Random(99)
    rows = []
    for i in range(26):
        kv = [
            (rng.choice(KEYS), rng.randrange(1000))
            for _ in range(rng.randrange(1, 5))
        ]
        rows.append((f"d{i:02d}", kv))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "kv",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("k", T.StringType()),
                            T.StructField("v", T.LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    mapper = ExprMapper(
        F.transform(
            F.col("kv"),
            lambda p: F.struct(
                p["k"].alias("index_key"), p["v"].alias("value")
            ),
        ),
        value_type=T.LongType(),
    )
    idx = MapIndex(spark, "qmodel", mapper, store, doc_key="doc_id")
    idx.build(spark.createDataFrame(rows, schema), assume_unique=True)
    # the model's record view: one dict per live emit
    model = [
        {
            "key": k,
            "value": v,
            "doc_key": d,
            "emit_pos": pos,
        }
        for d, kv in rows
        for pos, (k, v) in enumerate(kv)
    ]
    return idx, model


# --- the op pool: (name, engine step, model step) ---------------------
# model steps take/return a list of record dicts; engine steps a Query.

def _py_add7(k, v):
    return v + 7


async def _aio_triple(k, v):
    return v * 3


def _py_keep_mod3_is1(k, v):
    # raises ZeroDivisionError whenever v % 3 == 0 — the drop-on-error
    # path (reference index.js:34); keeps exactly v % 3 == 1
    return 1 % (v % 3) == 0


PRE_OPS = [
    (
        "map_2x_plus1",
        lambda q: q.map(value=F.col("value") * 2 + 1),
        lambda rs: [dict(r, value=r["value"] * 2 + 1) for r in rs],
    ),
    (
        "map_key_bang",
        lambda q: q.map(key=F.concat(F.col("key"), F.lit("!"))),
        lambda rs: [dict(r, key=r["key"] + "!") for r in rs],
    ),
    (
        "filter_even",
        lambda q: q.filter(F.col("value") % 2 == 0),
        lambda rs: [r for r in rs if r["value"] % 2 == 0],
    ),
    (
        "filter_key_ge_c",
        lambda q: q.filter(F.col("key") >= "c"),
        lambda rs: [r for r in rs if r["key"] >= "c"],
    ),
    (
        "pymap_add7",
        lambda q: q.map_fn(_py_add7, value_type=T.LongType()),
        lambda rs: [dict(r, value=r["value"] + 7) for r in rs],
    ),
    (
        "asyncmap_triple",
        lambda q: q.async_map(_aio_triple, value_type=T.LongType()),
        lambda rs: [dict(r, value=r["value"] * 3) for r in rs],
    ),
    (
        "pyfilter_skip_on_error",
        lambda q: q.filter_fn(_py_keep_mod3_is1, skip_on_error=True),
        lambda rs: [r for r in rs if r["value"] % 3 == 1],
    ),
]


def _model_group(rs):
    by_key = {}
    for r in sorted(rs, key=lambda r: (r["doc_key"], r["emit_pos"])):
        by_key.setdefault(r["key"], []).append(r["value"])
    return by_key


GROUP_OPS = [
    (
        "group_plain",
        lambda q: q.group(),
        lambda rs: [
            {"key": k, "results": vs} for k, vs in _model_group(rs).items()
        ],
    ),
    (
        "group_limit2",
        lambda q: q.group(limit_per_key=2),
        lambda rs: [
            {"key": k, "results": vs[:2]}
            for k, vs in _model_group(rs).items()
        ],
    ),
    (
        "group_min_aggpath",  # array_min is rewritten to a direct agg
        lambda q: q.group(finish=lambda r: F.array_min(r)),
        lambda rs: [
            {"key": k, "result": min(vs)}
            for k, vs in _model_group(rs).items()
        ],
    ),
    (
        "group_first_collectpath",  # element_at is NOT an agg rewrite
        lambda q: q.group(finish=lambda r: F.element_at(r, 1)),
        lambda rs: [
            {"key": k, "result": vs[0]}
            for k, vs in _model_group(rs).items()
        ],
    ),
    (
        "group_finish_fn_sum",
        lambda q: q.group(finish_fn=sum, finish_type=T.LongType()),
        lambda rs: [
            {"key": k, "result": sum(vs)}
            for k, vs in _model_group(rs).items()
        ],
    ),
]

POST_OPS = [  # legal only after group_plain (vcol == "results")
    (
        "post_map_size",
        lambda q: q.map(value=F.size(F.col("results"))),
        lambda rs: [dict(r, results=len(r["results"])) for r in rs],
    ),
    (
        "post_filter_ge2",
        lambda q: q.filter(F.size(F.col("results")) >= 2),
        lambda rs: [r for r in rs if len(r["results"]) >= 2],
    ),
]


def _canon(rows):
    out = []
    for r in rows:
        d = r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
        out.append(tuple(sorted((k, repr(v)) for k, v in d.items())))
    return sorted(out)


def test_random_scan_opts_match_model(spark, store):
    """Randomized sweep of the levelup read-stream opts passthroughs
    (reference index.js:124-137): every combination of bounds/key,
    limit, reverse, keys/values projection, and raw against the model,
    including the documented deterministic (index_key, doc_key,
    emit_pos) top-k order whenever limit/sort is in play."""
    idx, base = _build_index(spark, store)
    rng = random.Random(1337)
    order = lambda r: (r["key"], r["doc_key"], r["emit_pos"])  # noqa: E731
    for trial in range(20):
        opts = {}
        which = rng.random()
        if which < 0.3:
            opts["key"] = rng.choice(KEYS)
        else:
            if rng.random() < 0.8:
                opts["start"] = rng.choice(KEYS)
            if rng.random() < 0.8:
                opts["end"] = rng.choice(KEYS)
        if rng.random() < 0.5:
            opts["limit"] = rng.randrange(1, 8)
            opts["reverse"] = rng.random() < 0.5
        raw = rng.random() < 0.25
        if raw:
            opts["raw"] = True
        else:
            opts["keys"] = rng.random() < 0.8
            opts["values"] = rng.random() < 0.8
            if not (opts["keys"] or opts["values"]):
                opts["values"] = True

        rs = list(base)
        if "key" in opts:
            rs = [r for r in rs if r["key"] == opts["key"]]
        else:
            if "start" in opts:
                rs = [r for r in rs if r["key"] >= opts["start"]]
            if "end" in opts:
                rs = [r for r in rs if r["key"] < opts["end"]]
        if "limit" in opts:
            rs = sorted(rs, key=order, reverse=opts["reverse"])
            rs = rs[: opts["limit"]]
        if raw:
            want = [
                (
                    f"{idx.name}\x00{r['key']}\x00{r['doc_key']}"
                    f"\x00{r['emit_pos']}",
                    r["value"],
                )
                for r in rs
            ]
        elif opts.get("keys", True) and not opts.get("values", True):
            want = [(r["key"],) for r in rs]
        elif opts.get("values", True) and not opts.get("keys", True):
            want = [(r["value"],) for r in rs]
        else:
            want = [
                (
                    ("index_key", r["key"]),
                    ("emit_pos", r["emit_pos"]),
                    ("value", r["value"]),
                    ("doc_key", r["doc_key"]),
                )
                for r in rs
            ]
        rows = idx.scan(**opts).collect()
        if raw or not (opts.get("keys", True) and opts.get("values", True)):
            got = [tuple(r) for r in rows]
        else:
            got = [
                tuple((c, r[c]) for c in ("index_key", "emit_pos", "value", "doc_key"))
                for r in rows
            ]
        if "limit" in opts:
            assert got == want, (trial, opts)
        else:
            assert sorted(map(repr, got)) == sorted(map(repr, want)), (
                trial,
                opts,
            )


def test_random_pipelines_match_record_model(spark, store):
    idx, base = _build_index(spark, store)
    rng = random.Random(4711)
    # 15 trials bound suite runtime; deep hunts set LMR_QMODEL_TRIALS
    for trial in range(int(os.environ.get("LMR_QMODEL_TRIALS", "15"))):
        pre = rng.sample(PRE_OPS, rng.randrange(4))
        steps = list(pre)
        grouped = rng.random() < 0.7
        gname = None
        if grouped:
            g = rng.choice(GROUP_OPS)
            gname = g[0]
            steps.append(g)
            if gname == "group_plain" and rng.random() < 0.6:
                steps.append(rng.choice(POST_OPS))
        label = "|".join(s[0] for s in steps) or "identity"

        q = idx.query()
        rs = [dict(r) for r in base]
        for _, engine_step, model_step in steps:
            q = engine_step(q)
            rs = model_step(rs)
        got = _canon(q.end())
        want = _canon(rs)
        assert got == want, (
            f"trial {trial} pipeline {label}: engine and model diverge\n"
            f"engine-only: {[t for t in got if t not in want][:3]}\n"
            f"model-only: {[t for t in want if t not in got][:3]}"
        )
