"""Structured Streaming sink: foreachBatch-driven incremental index
maintenance (reference change-stream-sink nature, index.js:121, 173)
with chained propagation (index.js:250-253) — batch-synchronous, no
sleeps (SURVEY §7.3 hard part 4).
"""

import json
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from level_mapreduce_spark import ExprMapper, MapIndex
from level_mapreduce_spark.streaming import stream_into

SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.StringType()),
        T.StructField("k", T.StringType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("seq", T.LongType()),
    ]
)


def write_batch(src_dir, name, rows):
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def drain(spark, idx, src_dir, ckpt):
    stream = spark.readStream.schema(SCHEMA).json(src_dir)
    q = stream_into(idx, stream, ckpt)
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_update_and_tombstone(spark, store, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    mapper = ExprMapper.of((F.col("k"), F.col("v")), value_type=T.DoubleType())
    idx = MapIndex(spark, "stream_idx", mapper, store)
    # seed an empty index (stream epochs append on top)
    idx.build(spark.createDataFrame([], SCHEMA))

    write_batch(
        src,
        "b1.json",
        [
            {"doc_key": "d1", "k": "a", "v": 1.0, "seq": 1},
            {"doc_key": "d2", "k": "b", "v": 2.0, "seq": 2},
        ],
    )
    drain(spark, idx, src, ckpt)
    assert idx.get("a") == [1.0]
    assert idx.count() == 2

    # second micro-batch: overwrite d1, tombstone d2 — a NEW file in the
    # same source dir; restart from the same checkpoint picks up only it
    write_batch(
        src,
        "b2.json",
        [
            {"doc_key": "d1", "k": "a", "v": 10.0, "seq": 3},
            {"doc_key": "d2", "deleted": True, "seq": 4},
        ],
    )
    drain(spark, idx, src, ckpt)
    assert idx.get("a") == [10.0]
    assert idx.get("b") == []
    assert idx.count() == 1


def test_stream_windowed_counts_with_watermark(spark, sf_dir, tmp_path):
    """Streaming event-time windows over the real events parquet must
    converge to the batch operator's result; late rows beyond the
    watermark are dropped (none here — the file source replays in
    order), and complete mode emits every closed window."""
    from level_mapreduce_spark.operators.events import windowed_counts
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.windows import windowed_counts_stream

    events = load_table(spark, sf_dir, "events")
    # file stream sources read directories; stage the table file in one
    src = tmp_path / "events_src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    stream = stream_table(spark, str(src), sf_dir, "events")
    out = windowed_counts_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wc_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM wc_stream").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in windowed_counts(events).collect()
    }
    assert got == want and want
    # hopping form: the streaming slide variant converges to the batch
    # sliding_counts operator the same way
    from level_mapreduce_spark.operators.events import sliding_counts

    out_s = windowed_counts_stream(stream, slide="15 minutes")
    qs = (
        out_s.writeStream.format("memory")
        .queryName("wc_slide_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wm_slide_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    qs.awaitTermination(120)
    assert not qs.isActive
    got_s = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM wc_slide_stream").collect()
    }
    want_s = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in sliding_counts(events).collect()
    }
    assert got_s == want_s and len(want_s) > len(want)


def test_stateful_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization over the replayed events
    table must equal the batch window-function sessionize — per-user
    state (last ts, session counter) carries across micro-batches."""
    from level_mapreduce_spark.operators.events import sessionize
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.stateful import sessionize_stream

    import glob
    import time as _time

    events = load_table(spark, sf_dir, "events")
    # three time-range files with increasing mtimes -> three in-order
    # micro-batches, so per-user state must carry across batches
    src = tmp_path / "ev_state_src"
    os.makedirs(src)
    b1, b2 = (
        events.select(F.unix_micros("ts").alias("us"))
        .approxQuantile("us", [0.33, 0.66], 0.0)
    )
    # split the RAW file (so written splits keep the source ts type and
    # match stream_table's declared schema) — micros expr depends on how
    # this testdata generation stored ts (nanos-long vs timestamp_ntz)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        us = F.expr("ts div 1000")
    else:
        us = F.unix_micros(F.col("ts").cast("timestamp"))
    splits = [
        raw.where(us <= b1),
        raw.where((us > b1) & (us <= b2)),
        raw.where(us > b2),
    ]
    now = _time.time()
    for i, part in enumerate(splits):
        d = str(tmp_path / f"_split{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        (pf,) = glob.glob(f"{d}/part-*.parquet")
        dst = src / f"{i:02d}.parquet"
        shutil.copy(pf, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = stream_table(spark, str(src), sf_dir, "events")
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    got = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    want = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in sessionize(events).collect()
    }
    assert got == want and want


def test_stream_chained_propagation(spark, store, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src)
    a = MapIndex(
        spark,
        "stream_a",
        ExprMapper.of((F.col("k"), F.col("v")), value_type=T.DoubleType()),
        store,
    )
    b = MapIndex(
        spark,
        "stream_b",
        ExprMapper.of((F.lit("n_emits"), F.size("value").cast("string"))),
        store,
    )
    a.pipe(b)
    a.build(spark.createDataFrame([], SCHEMA))

    write_batch(src, "b1.json", [{"doc_key": "d1", "k": "a", "v": 5.0, "seq": 1}])
    drain(spark, a, src, ckpt)
    # downstream converged within the same micro-batch (no sleeps)
    assert b.get("n_emits") == ["1"]


def test_stream_dedup_first_arrival_wins(spark, tmp_path):
    """Streaming exact dedup: one survivor per content hash across
    micro-batches, and for a duplicate spanning batches the FIRST
    arrival is the one emitted (later arrivals drop against state)."""
    import glob
    import time as _time

    from level_mapreduce_spark.streaming import dedup_stream

    src = tmp_path / "docs_src"
    os.makedirs(src)
    b1 = [(1, "alpha"), (2, "beta"), (3, "alpha")]       # in-batch dup
    b2 = [(4, "beta"), (5, "gamma"), (6, "gamma")]       # cross-batch + in-batch
    now = _time.time()
    for i, rows in enumerate([b1, b2]):
        d = str(tmp_path / f"_docs{i}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        (pf,) = glob.glob(f"{d}/part-*.parquet")
        dst = src / f"{i:02d}.parquet"
        shutil.copy(pf, dst)
        os.utime(dst, (now + i * 10, now + i * 10))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    got = {
        r["text"]: r["doc_id"]
        for r in spark.sql("SELECT * FROM dedup_stream").collect()
    }
    # one survivor per distinct text; 'beta' kept from batch 1 (doc 2),
    # not the batch-2 re-arrival (doc 4)
    assert got == {"alpha": 1, "beta": 2, "gamma": 5}


def test_stream_sketches_continuous_aggregate(spark, sf_dir, tmp_path):
    """Replaying the events table through the sketch sink in three
    micro-batches must converge the stored aggregate to exactly the
    batch-built index: same keys, same range estimates."""
    import glob
    import time as _time

    from level_mapreduce_spark.operators.sketches import (
        build_sketch_index,
        sketch_index_estimate,
    )
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.sink import stream_sketches_into

    events = load_table(spark, sf_dir, "events")
    # three time-ordered files -> three micro-batches (same staging as
    # the stateful sessionize test)
    src = tmp_path / "sk_src"
    os.makedirs(src)
    b1, b2 = (
        events.select(F.unix_micros("ts").alias("us"))
        .approxQuantile("us", [0.33, 0.66], 0.0)
    )
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes)["ts"] == "bigint":
        us = F.expr("ts div 1000")
    else:
        us = F.unix_micros(F.col("ts").cast("timestamp"))
    now = _time.time()
    for i, part in enumerate(
        [raw.where(us <= b1), raw.where((us > b1) & (us <= b2)), raw.where(us > b2)]
    ):
        d = str(tmp_path / f"_sk{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        (pf,) = glob.glob(f"{d}/part-*.parquet")
        dst = src / f"{i:02d}.parquet"
        shutil.copy(pf, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    # seed through build_sketch_index with an EMPTY corpus: the blessed
    # path that persists the sketch kind (a hand-built bare MapIndex
    # has no discoverable kind, and update_sketch_index refuses to
    # default rather than fold with the wrong merge fn)
    live = build_sketch_index(
        spark,
        events.limit(0),
        str(tmp_path / "sk_store"),
        name="sk_live",
        kind="hll",
    )
    stream = stream_table(spark, str(src), sf_dir, "events")
    q = stream_sketches_into(live, stream, str(tmp_path / "sk_ckpt"))
    q.awaitTermination(180)
    assert not q.isActive

    full = build_sketch_index(
        spark, events, str(tmp_path / "sk_full_store"), name="sk_full_batch"
    )
    for lo, hi in [("0", "9999"), ("2", "9999")]:
        a = sketch_index_estimate(live, lo, hi).first()["n_users_est"]
        b = sketch_index_estimate(full, lo, hi).first()["n_users_est"]
        assert a == b, (lo, hi, a, b)
    # same stored keys
    lk = {r["index_key"] for r in live.read().select("index_key").collect()}
    fk = {r["index_key"] for r in full.read().select("index_key").collect()}
    assert lk == fk and lk


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Stream-stream watermarked interval join (click -> purchases
    within 30 min) replayed over the closed events table converges to
    the batch interval_join twin exactly."""
    import os
    import shutil

    from level_mapreduce_spark.operators.joins import interval_join
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.joins import interval_join_stream

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "ssj_src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
        )
        return clicks, purchases

    s_clicks, s_purch = split(stream_table(spark, str(src), sf_dir, "events"))
    out = interval_join_stream(
        s_clicks, s_purch, on="user_id", ts="ts", within="30 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    b_clicks, b_purch = split(events)
    want = {
        (r["click_id"], r["r_purchase_id"])
        for r in interval_join(
            b_clicks, b_purch, on="user_id", ts="ts", within="30 minutes"
        ).collect()
    }
    got = {
        (r["click_id"], r["r_purchase_id"])
        for r in spark.sql("SELECT * FROM ssj_stream").collect()
    }
    assert got == want and want
    # schema parity between the twins
    assert (
        spark.sql("SELECT * FROM ssj_stream").columns
        == interval_join(b_clicks, b_purch, on="user_id", ts="ts").columns
    )


def test_stream_session_window_aggregates(spark, sf_dir, tmp_path):
    """Native session_window on a watermarked stream converges to the
    batch session_aggregates twin exactly. Append mode only emits a
    session once the watermark passes its close, so the replay stages
    two far-future sentinel events AFTER the real data (one file per
    micro-batch) to drive the watermark past every real session —
    the standard closed-stream flush pattern."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import timedelta

    from level_mapreduce_spark.operators.events import session_aggregates
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.windows import session_aggregates_stream

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "sess_src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "00.parquet")

    # sentinel rows in the RAW on-disk schema (ts may be nanos-bigint
    # or us-ntz depending on testdata generation)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    mx = raw.agg(F.max("ts")).first()[0]
    now = _time.time()
    for i in (1, 2):
        if dict(raw.dtypes)["ts"] == "bigint":
            ts_lit = F.lit(mx + i * 86400 * 10**9)
        else:
            ts_lit = F.lit(mx + timedelta(days=i)).cast(dict(raw.dtypes)["ts"])
        sent = raw.limit(1).withColumn("ts", ts_lit).withColumn(
            "user_id", F.lit(-1).cast(dict(raw.dtypes)["user_id"])
        )
        d = str(tmp_path / f"_sent{i}")
        sent.coalesce(1).write.mode("overwrite").parquet(d)
        (pf,) = glob.glob(f"{d}/part-*.parquet")
        dst = src / f"{i:02d}.parquet"
        shutil.copy(pf, dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    out = session_aggregates_stream(stream_table(spark, str(src), sf_dir, "events"))
    q = (
        out.writeStream.format("memory")
        .queryName("sessagg_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessagg_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM sessagg_stream WHERE user_id >= 0"
        ).collect()
    }
    want = {tuple(r) for r in session_aggregates(events).collect()}
    assert got == want and want


def test_stream_stream_interval_join_left_outer(spark, sf_dir, tmp_path):
    """leftOuter stream-stream join: matched rows agree with inner,
    and unmatched clicks appear exactly once with null right columns,
    converging to the batch left interval_join."""
    import os
    import shutil

    from level_mapreduce_spark.operators.joins import interval_join
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.joins import interval_join_stream

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "ssjo_src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    def split(df):
        clicks = df.where(F.col("event_type") == "click").select(
            "user_id", "ts", F.col("event_id").alias("click_id")
        )
        purchases = df.where(F.col("event_type") == "purchase").select(
            "user_id", "ts", F.col("event_id").alias("purchase_id")
        )
        return clicks, purchases

    s_clicks, s_purch = split(stream_table(spark, str(src), sf_dir, "events"))
    out = interval_join_stream(
        s_clicks, s_purch, on="user_id", ts="ts",
        within="30 minutes", how="leftOuter",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ssjo_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssjo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert not q.isActive

    b_clicks, b_purch = split(events)
    want = {
        (r["click_id"], r["r_purchase_id"])
        for r in interval_join(
            b_clicks, b_purch, on="user_id", ts="ts",
            within="30 minutes", how="left",
        ).collect()
    }
    got_rows = spark.sql("SELECT * FROM ssjo_stream").collect()
    got = {(r["click_id"], r["r_purchase_id"]) for r in got_rows}
    # the batch left join emits every unmatched click; the streaming
    # outer only emits a null-match once the watermark PROVES no
    # match — clicks in the final watermark horizon stay unproven, so
    # streaming ⊆ batch, matched pairs agree exactly, and every
    # missing row is an unmatched click near the end of the stream
    matched_want = {p for p in want if p[1] is not None}
    matched_got = {p for p in got if p[1] is not None}
    assert matched_got == matched_want
    assert got <= want
    missing = want - got
    assert all(p[1] is None for p in missing)


def test_stream_theta_sketches_live_overlap(spark, sf_dir, tmp_path):
    """The streaming sketch sink folds THETA sketches too (the kind
    rides the index): replaying all events into an empty theta index
    converges its stored set-algebra answers to the batch-built
    index's exactly."""
    import os
    import shutil

    from level_mapreduce_spark.operators.sketches import (
        _sketch_mapper,
        build_sketch_index,
        sketch_index_overlap,
    )
    from level_mapreduce_spark.engine.index import MapIndex
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.sink import stream_sketches_into

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "th_src"
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    live = MapIndex(
        spark, "th_live", _sketch_mapper(), str(tmp_path / "th_store"),
        doc_key="bucket_key",
    )
    live.build(spark.createDataFrame([], "bucket_key string, sketch binary"))
    live.sketch_kind = "theta"  # what build_sketch_index(kind=...) sets
    q = stream_sketches_into(
        live, stream_table(spark, str(src), sf_dir, "events"),
        str(tmp_path / "th_ckpt"),
    )
    q.awaitTermination(180)
    assert not q.isActive

    full = build_sketch_index(
        spark, events, str(tmp_path / "th_full"), name="th_full", kind="theta"
    )
    keys = sorted(
        r["index_key"]
        for r in full.read().select("index_key").distinct().collect()
    )
    cut = keys[len(keys) // 2].split("|")[0]
    a = sketch_index_overlap(live, "0", cut, cut, "~").first()
    b = sketch_index_overlap(full, "0", cut, cut, "~").first()
    assert tuple(a) == tuple(b) and a["a_users"] > 0


def test_stream_ann_ingest_vectors_become_searchable(
    spark, sf_dir, tmp_path
):
    """Live ANN ingest: a stored IVFPQ index built on HALF the corpus
    receives the other half as an availableNow vector stream through
    the generic index sink (one update() epoch per micro-batch,
    re-encoding against the frozen codebooks) — after the drain, a
    probe for a second-half vector finds it, and batched answers over
    the streamed store equal a from-scratch build over the full
    corpus. Streaming + compressed-ANN composition: the pieces are
    the same update()/sidecar machinery every other index uses."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from level_mapreduce_spark.operators.indexed import (
        build_ivfpq_index,
        ivfpq_knn_join,
        ivfpq_topk_from_index,
    )
    from level_mapreduce_spark.sources.tables import load_table, stream_table
    from level_mapreduce_spark.streaming.sink import stream_into

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    first = emb.where(F.col("vec_id") < n // 2)
    second = emb.where(F.col("vec_id") >= n // 2)
    assert first.count() > 0 and second.count() > 0

    store = str(tmp_path / "ann_stream")
    idx, cents, books = build_ivfpq_index(
        spark, first, store, n_centroids=4
    )

    # stage the second half as a two-file stream source
    src = tmp_path / "vec_src"
    os.makedirs(src)
    for i, part in enumerate(
        [second.where(F.col("vec_id") % 2 == 0),
         second.where(F.col("vec_id") % 2 == 1)]
    ):
        d = str(tmp_path / f"_v{i}")
        part.coalesce(1).write.mode("overwrite").parquet(d)
        (pf,) = [
            f for f in os.listdir(d) if f.startswith("part-")
        ]
        shutil.copy(os.path.join(d, pf), src / f"{i:02d}.parquet")

    q = stream_into(
        idx,
        stream_table(spark, str(src), sf_dir, "embeddings"),
        str(tmp_path / "ann_ckpt"),
    )
    q.awaitTermination(180)
    assert not q.isActive

    # a streamed-in vector is now its own nearest stored neighbor
    target = second.orderBy("vec_id").first()
    probe = [float(v) for v in target["embedding"]]
    top = ivfpq_topk_from_index(
        idx, cents, books, probe, k=3, nprobe=4
    ).collect()
    assert target["vec_id"] in {r["vec_id"] for r in top}

    # stream == batch-incremental convergence: an identically-trained
    # twin (same first-half training data, same seed -> same frozen
    # quantizers) batch-update()d with the second half must answer a
    # whole probe batch identically through the arrow scorer
    twin, tc, tb = build_ivfpq_index(
        spark, first, str(tmp_path / "ann_twin"), n_centroids=4
    )
    twin.update(second, assume_unique=True)
    probes = emb.where(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"), "embedding"
    )
    a = ivfpq_knn_join(idx, cents, books, probes, k=5, nprobe=4)
    b = ivfpq_knn_join(twin, tc, tb, probes, k=5, nprobe=4)
    key = lambda rows: sorted(  # noqa: E731
        (r["probe_id"], r["vec_id"], round(r["adc_dist"], 9))
        for r in rows
    )
    assert key(a.collect()) == key(b.collect())


def test_sessionize_stream_survives_arrow_chunking(spark, tmp_path):
    """applyInPandasWithState hands a group's micro-batch rows to the
    state function as MULTIPLE Arrow chunks (maxRecordsPerBatch); the
    sessionizer must sort the whole group, not each chunk — chunk-local
    sorting processes later timestamps before earlier ones across a
    chunk boundary and mis-numbers sessions. Forced here with a tiny
    batch size and rows written in REVERSE time order."""
    from level_mapreduce_spark.operators.events import sessionize
    from level_mapreduce_spark.streaming.stateful import sessionize_stream

    # 30 events, one user, a >30min gap every 10 events -> 3 sessions;
    # written to the source file in REVERSE ts order so every chunk
    # boundary crosses time backwards
    rows = []
    for i in range(30):
        ts = 1_700_000_000_000_000 + (i // 10) * 3_600_000_000 + (i % 10) * 1_000_000
        rows.append((i + 1, 7, ts))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select(
        "event_id", "user_id", F.timestamp_micros(F.col("us")).alias("ts")
    )
    src = str(tmp_path / "chunk_src")
    (
        events.orderBy(F.col("ts").desc())
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(src)
    )

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, ts timestamp"
            ).parquet(src)
        )
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory")
            .queryName("sess_chunked")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chunk_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = {
        r["event_id"]: r["session_id"]
        for r in spark.sql("SELECT * FROM sess_chunked").collect()
    }
    want = {
        r["event_id"]: r["session_id"] for r in sessionize(events).collect()
    }
    assert got == want
    assert sorted(set(want.values())) == [1, 2, 3]


def test_stream_postings_ingest_ranked_retrieval_stays_fresh(
    spark, store, tmp_path
):
    """Continuous-ingest ranked retrieval: documents streamed through
    stream_into -> the postings MapIndex -> served BM25/TF-IDF equal
    a batch recompute over exactly the drained corpus after every
    micro-batch wave — the reference's sink-pipe contract
    (index.js:121, 173) applied to the retrieval index."""
    from level_mapreduce_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_index,
        build_postings_index,
        tfidf,
        tfidf_from_index,
    )

    src = str(tmp_path / "docsrc")
    ckpt = str(tmp_path / "docckpt")
    os.makedirs(src)
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    seed = [
        (0, "spark merge window spark"),
        (1, "merge conflict resolution guide"),
        (2, "window functions in sql"),
    ]
    idx = build_postings_index(
        spark,
        spark.createDataFrame(seed, doc_schema),
        store,
        name="post_stream",
    )

    def drain_docs(rows):
        with open(os.path.join(src, f"b{len(os.listdir(src))}.json"), "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        stream = spark.readStream.schema(doc_schema).json(src)
        q = stream_into(idx, stream, ckpt, assume_unique=True)
        q.awaitTermination(120)
        assert not q.isActive

    # wave 1: new docs + an overwrite of doc 1 (term set changes)
    wave1 = [(3, "spark window pane"), (1, "spark spark spark")]
    drain_docs(wave1)
    corpus = {r[0]: r[1] for r in seed}
    corpus.update(dict(wave1))
    docs_now = spark.createDataFrame(sorted(corpus.items()), doc_schema)
    q_text = "spark window"
    assert [
        tuple(r) for r in bm25_topk_from_index(idx, q_text, k=5).collect()
    ] == [tuple(r) for r in bm25_topk(docs_now, q_text, k=5).collect()]
    assert sorted(
        tuple(r) for r in tfidf_from_index(idx).collect()
    ) == sorted(tuple(r) for r in tfidf(docs_now).collect())

    # wave 2: another overwrite through the SAME checkpoint lineage
    wave2 = [(2, "merge window merge")]
    drain_docs(wave2)
    corpus.update(dict(wave2))
    docs_now = spark.createDataFrame(sorted(corpus.items()), doc_schema)
    assert [
        tuple(r) for r in bm25_topk_from_index(idx, q_text, k=5).collect()
    ] == [tuple(r) for r in bm25_topk(docs_now, q_text, k=5).collect()]


def test_stream_span_index_ingest_stays_fresh(spark, store, tmp_path):
    """Continuous-ingest exact-substring dedup: documents streamed
    through stream_into -> the span MapIndex -> served repeated-spans
    stats equal a batch recompute over exactly the drained corpus
    after every micro-batch wave (the postings twin, r15)."""
    from level_mapreduce_spark.operators.dedup import (
        build_span_index,
        repeated_spans,
        repeated_spans_from_index,
    )

    src = str(tmp_path / "spansrc")
    ckpt = str(tmp_path / "spanckpt")
    os.makedirs(src)
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    boiler = "one two three four five six seven eight nine ten"
    seed = [
        (0, f"intro {boiler} outro"),
        (1, f"other {boiler} tail words here"),
        (2, "no duplicated window in this document at all friends"),
    ]
    idx = build_span_index(
        spark,
        spark.createDataFrame(seed, doc_schema),
        store,
        name="span_stream",
        ngram=10,
    )

    def drain_docs(rows):
        with open(
            os.path.join(src, f"b{len(os.listdir(src))}.json"), "w"
        ) as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        stream = spark.readStream.schema(doc_schema).json(src)
        q = stream_into(idx, stream, ckpt, assume_unique=True)
        q.awaitTermination(120)
        assert not q.isActive

    # wave 1: a third copy of the boilerplate + an overwrite that
    # REMOVES doc 1's copy (its windows must stop colliding)
    wave1 = [(3, f"yet another {boiler} instance"), (1, "doc one rewritten fully clean")]
    corpus = {r[0]: r[1] for r in seed}
    drain_docs(wave1)
    corpus.update(dict(wave1))
    docs_now = spark.createDataFrame(sorted(corpus.items()), doc_schema)
    assert sorted(
        tuple(r) for r in repeated_spans_from_index(idx).collect()
    ) == sorted(tuple(r) for r in repeated_spans(docs_now, ngram=10).collect())

    # wave 2: another overwrite through the SAME checkpoint lineage
    wave2 = [(2, f"late copy {boiler} again")]
    drain_docs(wave2)
    corpus.update(dict(wave2))
    docs_now = spark.createDataFrame(sorted(corpus.items()), doc_schema)
    assert sorted(
        tuple(r) for r in repeated_spans_from_index(idx).collect()
    ) == sorted(tuple(r) for r in repeated_spans(docs_now, ngram=10).collect())


def test_stream_semdedup_ingest_matches_manual_updates(spark, store, tmp_path):
    """Continuous-ingest semantic dedup: embedding waves streamed
    through stream_semdedup_into equal applying the SAME batches via
    semdedup_update on a twin index (frozen-leaders contract ==
    first-arrival-wins streaming), and stored decisions never flip."""
    import numpy as np

    from level_mapreduce_spark.operators.similarity import (
        build_semdedup_index,
        semdedup_from_index,
        semdedup_update,
    )
    from level_mapreduce_spark.streaming import stream_semdedup_into

    rng = np.random.default_rng(31)
    X = rng.normal(size=(20, 6))
    X[15] = X[2]  # planted duplicate inside the seed corpus
    seed_df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cents = [[float(v) for v in c] for c in rng.normal(size=(3, 6))]
    cents = [[v / sum(x * x for x in c) ** 0.5 for v in c] for c in cents]
    idx = build_semdedup_index(
        spark, seed_df, store, name="sd_stream", centroids=cents,
        threshold=0.95,
    )
    twin = build_semdedup_index(
        spark, seed_df, store, name="sd_twin", centroids=cents,
        threshold=0.95,
    )
    frozen = sorted(tuple(r) for r in semdedup_from_index(idx).collect())
    assert frozen == sorted(
        tuple(r) for r in semdedup_from_index(twin).collect()
    )

    src = str(tmp_path / "sdsrc")
    ckpt = str(tmp_path / "sdckpt")
    os.makedirs(src)
    emb_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def drain_vecs(rows):
        with open(
            os.path.join(src, f"b{len(os.listdir(src))}.json"), "w"
        ) as f:
            for vec_id, emb in rows:
                f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
        stream = spark.readStream.schema(emb_schema).json(src)
        q = stream_semdedup_into(idx, stream, ckpt)
        q.awaitTermination(120)
        assert not q.isActive
        twin_batch = spark.createDataFrame(rows, emb_schema)
        semdedup_update(twin, twin_batch)

    novel = (rng.normal(size=6) * 5).tolist()
    wave1 = [
        (100, [float(v) for v in X[2]]),  # copy of a stored keeper
        (101, [float(v) for v in novel]),
    ]
    wave2 = [
        (102, [float(v) for v in novel]),  # dup of wave-1's 101
        (103, [0.0] * 6),  # zero norm: cluster -1, kept
    ]
    drain_vecs(wave1)
    drain_vecs(wave2)

    served = sorted(tuple(r) for r in semdedup_from_index(idx).collect())
    manual = sorted(tuple(r) for r in semdedup_from_index(twin).collect())
    assert served == manual
    by_id = {r[0]: r for r in served}
    assert len(by_id) == 24
    assert not by_id[100][3]  # keep=False: dups a stored member
    assert by_id[101][3]
    assert not by_id[102][3] and by_id[102][4] == 101  # in-stream dup
    assert by_id[103][3] and by_id[103][1] == -1
    # frozen: the original 20 decisions unchanged
    assert [t for t in served if t[0] < 100] == frozen


def test_stream_postings_index_ingest_stays_fresh(spark, store, tmp_path):
    """Continuous-ingest ranked retrieval: documents streamed through
    stream_into -> the PostingsIndex (whose update() override
    maintains the stats sibling per micro-batch) -> served tfidf/bm25
    equal a batch recompute over exactly the drained corpus after
    every wave, and the joint seq snapshots stay servable (r16)."""
    from level_mapreduce_spark.operators.text import (
        bm25_topk,
        bm25_topk_from_index,
        build_postings_index,
        tfidf,
        tfidf_from_index,
    )

    src = str(tmp_path / "postsrc")
    ckpt = str(tmp_path / "postckpt")
    os.makedirs(src)
    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    seed = [
        (0, "spark merge window spark"),
        (1, "merge window merge"),
        (2, "spark only here"),
    ]
    idx = build_postings_index(
        spark,
        spark.createDataFrame(seed, doc_schema),
        store,
        name="post_stream",
    )

    def drain_docs(rows):
        with open(
            os.path.join(src, f"b{len(os.listdir(src))}.json"), "w"
        ) as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        stream = spark.readStream.schema(doc_schema).json(src)
        q = stream_into(idx, stream, ckpt, assume_unique=True)
        q.awaitTermination(120)
        assert not q.isActive

    corpus = {r[0]: r[1] for r in seed}

    def check():
        docs = spark.createDataFrame(
            sorted(corpus.items()), doc_schema
        )
        assert sorted(
            tuple(r) for r in tfidf_from_index(idx).collect()
        ) == sorted(tuple(r) for r in tfidf(docs).collect())
        assert [
            tuple(r)
            for r in bm25_topk_from_index(idx, "spark window", k=3).collect()
        ] == [tuple(r) for r in bm25_topk(docs, "spark window", k=3).collect()]

    # wave 1: insert + overwrite (df of 'merge' shifts for outsiders)
    wave1 = [(3, "window pane glass"), (1, "totally different now")]
    drain_docs(wave1)
    corpus.update(dict(wave1))
    check()

    # wave 2: another insert; the earlier wave's seq snapshot still
    # serves ITS historical corpus
    seq_after_w1 = idx._read_seq()
    hist = spark.createDataFrame(sorted(corpus.items()), doc_schema)
    wave2 = [(4, "fresh spark window doc")]
    drain_docs(wave2)
    corpus.update(dict(wave2))
    check()
    assert sorted(
        tuple(r)
        for r in tfidf_from_index(idx, as_of_seq=seq_after_w1).collect()
    ) == sorted(tuple(r) for r in tfidf(hist).collect())
