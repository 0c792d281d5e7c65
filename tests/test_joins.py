"""asof_join semantics: backward match, exact-match toggle, unmatched
nulls, tie-break determinism — plus a plan check that the operator
stays a single window (no range theta-join / cartesian anywhere).
"""

import datetime as dt

from pyspark.sql import functions as F

from level_mapreduce_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return BASE + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 7, _ts(10)),
            (2, 7, _ts(30)),
            (3, 7, _ts(5)),   # before any right row -> null match
            (4, 8, _ts(60)),  # user with no right rows at all
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 7, _ts(10), 1.0),   # exactly at left #1's ts
            (102, 7, _ts(20), 2.0),
            (103, 9, _ts(1), 9.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_with_exact(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got == {1: 101, 2: 102, 3: None, 4: None}


def test_asof_strict_excludes_exact(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(
            left, right, on="user_id", allow_exact_matches=False
        ).collect()
    }
    # left #1 at ts=10 no longer sees right #101 at ts=10
    assert got == {1: None, 2: 102, 3: None, 4: None}


def test_asof_tie_break(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(201, 7, _ts(5), 1.0), (202, 7, _ts(5), 2.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = asof_join(
        left, right, on="user_id", tie_break="event_id"
    ).collect()[0]
    assert got["r_event_id"] == 202  # highest tie_break wins


def test_range_join_bucket_rewrite(spark):
    """Bucketed range join must equal the BETWEEN theta join, including
    both boundary inclusivities and intervals spanning bucket edges."""
    from level_mapreduce_spark.operators.joins import range_join_buckets

    points = spark.range(1, 101).select(
        F.col("id").cast("double").alias("p")
    )
    ivs = spark.range(4).select(
        F.col("id").alias("iv"),
        (F.col("id") * 25 + 3).cast("double").alias("lo"),
        (F.col("id") * 25 + 37).cast("double").alias("hi"),  # spans buckets
    )
    got = {
        (r["p"], r["iv"])
        for r in range_join_buckets(
            points, ivs, "p", "lo", "hi", bucket_width=10.0
        ).collect()
    }
    want = {
        (r["p"], r["iv"])
        for r in points.join(
            ivs, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
        ).collect()
    }
    assert got == want and want


def test_asof_plan_is_single_window(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1


def test_salted_join_matches_plain(spark):
    """Salted join must equal the plain equi-join on a skewed key
    (one key holding most rows on both sides), for inner and left."""
    from level_mapreduce_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i, f"l{i}") for i in range(200)]
        + [("cold", i, f"l{i}") for i in range(5)]
        + [("only_left", 0, "x")],
        "k string, i long, lv string",
    )
    right = spark.createDataFrame(
        [("hot", j) for j in range(50)] + [("cold", 7)],
        "k string, rv long",
    )
    for how in ("inner", "left"):
        want = sorted(
            map(tuple, left.join(right, "k", how).collect())
        )
        got = sorted(
            map(tuple, salted_join(left, right, "k", n_salts=8, how=how).collect())
        )
        assert got == want, how


def test_topk_per_key_plans_window_group_limit(spark):
    """topk_per_key returns the k best rows per key and plans the rank
    filter as WindowGroupLimit (map-side pre-truncation), with an
    optional rank column."""
    from level_mapreduce_spark.operators.joins import topk_per_key

    df = spark.createDataFrame(
        [(k, i, float((i * 37) % 100)) for k in ("a", "b") for i in range(50)],
        "k string, i long, score double",
    )
    out = topk_per_key(
        df, "k", [F.col("score").desc(), F.col("i")], k=3, rank_col="rnk"
    )
    rows = sorted(
        (r["k"], r["rnk"], r["score"]) for r in out.collect()
    )
    assert len(rows) == 6
    for key in ("a", "b"):
        scores = [s for kk, _, s in rows if kk == key]
        top3 = sorted(
            (float((i * 37) % 100) for i in range(50)), reverse=True
        )[:3]
        assert sorted(scores, reverse=True) == top3
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_interval_join_all_matches_and_plan(spark):
    """interval_join keeps EVERY right row inside the window (where
    asof keeps one), drops rows outside it, and plans as an equi-join
    (sort-merge or hash on the key) — never a nested loop."""
    from level_mapreduce_spark.operators.joins import interval_join

    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:00:00", 1), ("u2", "2024-01-01 10:00:00", 2)],
        "user_id string, ts string, click_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:05:00", 10),  # in window
            ("u1", "2024-01-01 10:25:00", 11),  # in window (2nd match)
            ("u1", "2024-01-01 10:45:00", 12),  # outside 30 min
            ("u1", "2024-01-01 09:55:00", 13),  # before the click
            ("u2", "2024-01-01 10:30:00", 14),  # boundary: inclusive
        ],
        "user_id string, ts string, purchase_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = interval_join(left, right, on="user_id", ts="ts", within="30 minutes")
    got = sorted((r["click_id"], r["r_purchase_id"]) for r in out.collect())
    assert got == [(1, 10), (1, 11), (2, 14)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_null_keys_never_match(spark):
    """SQL ASOF / pandas merge_asof semantics: a null join key matches
    NOTHING — null-key left rows come out unmatched and null-key right
    rows never supply a payload (Window.partitionBy would otherwise
    group the nulls together and 'match' them)."""
    from level_mapreduce_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, None, 100), (2, "a", 100)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [(None, 50, 7.0), ("a", 50, 9.0)],
        "k string, ts long, px double",
    )
    got = {
        r["id"]: r["r_px"]
        for r in asof_join(left, right, on="k", ts="ts").collect()
    }
    assert got == {1: None, 2: 9.0}


def test_asof_join_tie_break_deterministic(spark):
    """Two right rows at the same (key, ts): tie_break picks the
    HIGHEST tie column deterministically (the gate entry passes
    tie_break='event_id' and its oracle ranks (ts DESC, event_id
    DESC) — the two must agree)."""
    from level_mapreduce_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100)], "id long, k string, ts long"
    )
    right = spark.createDataFrame(
        [("u", 50, 10, 1.0), ("u", 50, 20, 2.0), ("u", 40, 30, 3.0)],
        "k string, ts long, event_id long, px double",
    )
    got = asof_join(
        left, right, on="k", ts="ts", tie_break="event_id"
    ).collect()
    assert len(got) == 1
    assert got[0]["r_event_id"] == 20 and got[0]["r_px"] == 2.0


def test_temporal_joins_property_vs_python_reference(spark):
    """Property (hypothesis): over random keyed event sets — with
    timestamp TIES, NULL keys, and both exact-match modes — asof_join
    matches a direct python evaluation of its contract (latest right
    at-or-before / strictly-before, highest tie_break among equal ts,
    null keys never match, unmatched lefts kept with nulls), and
    interval_join matches a plain filter reference for inner and left
    modes."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from level_mapreduce_spark.operators.joins import asof_join, interval_join

    keys = st.sampled_from(["a", "b", None])
    tss = st.integers(0, 8)  # deliberately tiny range -> frequent ties

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        lrows = data.draw(
            st.lists(st.tuples(keys, tss), min_size=1, max_size=6)
        )
        rrows = data.draw(
            st.lists(st.tuples(keys, tss), min_size=1, max_size=6)
        )
        base = 1_700_000_000_000_000
        left = spark.createDataFrame(
            [(i, k, base + t * 1_000_000) for i, (k, t) in enumerate(lrows)],
            "lid long, k string, us long",
        ).select("lid", "k", F.timestamp_micros("us").alias("ts"))
        right = spark.createDataFrame(
            [
                (100 + i, k, base + t * 1_000_000, float(i))
                for i, (k, t) in enumerate(rrows)
            ],
            "rid long, k string, us long, v double",
        ).select("rid", "k", F.timestamp_micros("us").alias("ts"), "v")

        for exact in (True, False):
            arows = asof_join(
                left, right, on="k", ts="ts",
                allow_exact_matches=exact, tie_break="rid",
            ).collect()
            # LEFT ASOF contract: exactly ONE row per left row — a
            # dict would hide duplicated or tied-double emissions
            assert len(arows) == len(lrows), (exact, len(arows))
            got = {r["lid"]: r["r_rid"] for r in arows}
            want = {}
            for i, (lk, lt) in enumerate(lrows):
                cands = [
                    (rt, 100 + j)
                    for j, (rk, rt) in enumerate(rrows)
                    if lk is not None and rk == lk
                    and (rt <= lt if exact else rt < lt)
                ]
                want[i] = max(cands)[1] if cands else None
            assert got == want, (exact, lrows, rrows)

        for how in ("inner", "left"):
            irows = interval_join(
                left, right, on="k", ts="ts",
                within="2 seconds", how=how,
            ).collect()
            got_pairs = {(r["lid"], r["r_rid"]) for r in irows}
            # one row per match — set equality alone would hide dups
            assert len(irows) == len(got_pairs), (how, len(irows))
            want_pairs = set()
            for i, (lk, lt) in enumerate(lrows):
                matched = False
                for j, (rk, rt) in enumerate(rrows):
                    if lk is not None and rk == lk and lt <= rt <= lt + 2:
                        want_pairs.add((i, 100 + j))
                        matched = True
                if how == "left" and not matched:
                    want_pairs.add((i, None))
            assert got_pairs == want_pairs, (how, lrows, rrows)

    run()
