"""Physical-plan audits — the 100 TB design assertions (VERDICT r2
items: no Python UDF in any registry query outside the three
intentionally-Python record-path operators; key predicates pushed to
the Parquet scan; tombstone anti-join broadcasts).
"""

import re

import pytest
from pyspark.sql import functions as F

from level_mapreduce_spark import queries as q

PYTHON_PATH_QUERIES = {
    "query_map_variants",
    "query_filter_variants",
    "group_collect",  # carries the arbitrary-Python finish_fn variant
    "text_profile",  # bpe variant: Arrow-batched merge-loop encode
}
SF_DIR = "/root/testdata/sf0.001"

# How Spark 4.x renders a localCheckpoint read in the physical plan.
# Centralized (ADVICE r16): the pin-polarity tests below assert BOTH
# directions on this literal — if a Spark upgrade renames the node,
# the positive assertion fails loudly and this one constant is the
# whole fix; scattering the string would leave the negative ("not
# in") assertions passing vacuously under the new name.
CHECKPOINT_SCAN_NODE = "ExistingRDD"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name", [n for n in q.QUERIES if n not in PYTHON_PATH_QUERIES]
)
def test_no_python_udf_in_plan(spark, name):
    """Every registry query except the explicit record-path trio stays
    JVM-side end to end (whole-stage codegen eligible)."""
    df = q.QUERIES[name](spark, SF_DIR)
    plan = plan_of(df)
    assert "EvalPython" not in plan, f"{name} fell off the JVM fast path"


def test_python_path_queries_do_use_arrow(spark):
    """The record-path trio runs as Arrow-batched pandas UDFs (never
    row-at-a-time BatchEvalPython)."""
    for name in PYTHON_PATH_QUERIES:
        plan = plan_of(q.QUERIES[name](spark, SF_DIR))
        assert "ArrowEvalPython" in plan, name
        assert "BatchEvalPython" not in plan, name


def test_scan_pushes_key_predicates(spark):
    """get/scan key bounds reach the Parquet reader (PushedFilters) —
    the LevelDB iterator-seek equivalent (reference index.js:127-134)."""
    idx = q._orders_index(spark, SF_DIR)
    plan = plan_of(idx.scan(start="2", end="4"))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(index_key,2" in plan
    assert "LessThan(index_key,4" in plan
    plan_get = plan_of(idx.get_df("1-URGENT"))
    assert "EqualTo(index_key,1-URGENT)" in plan_get


def test_tombstone_antijoin_broadcasts(spark):
    """read() over an updated index anti-joins segments against a
    BROADCAST tombstone map — the index side never shuffles."""
    idx = q._tombstone_index(spark, SF_DIR)
    plan = plan_of(idx.read())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_scan_limit_plans_topk(spark):
    """scan(limit=) plans as distributed top-k, not a global sort."""
    idx = q._orders_index(spark, SF_DIR)
    plan = plan_of(idx.scan(limit=5))
    assert "TakeOrderedAndProject" in plan


def test_repeated_spans_partial_agg_no_cartesian(spark):
    """repeated_spans' duplicate-window detector must keep its
    map-side combine (a boilerplate window repeated 10⁹ times reduces
    to one candidate per input partition before the shuffle) and must
    never plan a cartesian/nested-loop pair generator."""
    from level_mapreduce_spark.operators.dedup import repeated_spans

    docs = q._docs(spark, SF_DIR)
    plan = plan_of(repeated_spans(docs, ngram=10))
    assert "partial_count" in plan, "shingle count lost map-side combine"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    # the live-tokenize path must NOT checkpoint its occurrence frame:
    # recomputing the in-memory window-md5 explode is cheaper than an
    # eager localCheckpoint round-trip (r16 quiet A/B: the pinned form
    # measured 1.54x slower with a matched noise yardstick)
    assert (
        CHECKPOINT_SCAN_NODE not in plan
    ), "live span path gained a checkpoint"


def test_merged_spans_pins_only_when_asked(spark):
    """_merged_spans(pin=True) — the stored-index serve path — must
    read its occurrence input from a materialized checkpoint (the
    persisted W# slice is scanned once, not once per consumer);
    pin=False must leave the lineage in place."""
    from level_mapreduce_spark.operators.dedup import _merged_spans

    # range-based source: createDataFrame(local rows) itself plans as
    # a Scan ExistingRDD and would mask the assertion
    occ = spark.range(6).selectExpr(
        "id % 2 as doc_id", "id as pos", "string(id % 3) as _h"
    )
    assert CHECKPOINT_SCAN_NODE in plan_of(_merged_spans(occ, 3, pin=True))
    assert CHECKPOINT_SCAN_NODE not in plan_of(
        _merged_spans(occ, 3, pin=False)
    )


def test_dim_join_broadcasts(spark):
    """The broadcast variant of the merged join-strategies entry must
    plan the orders x customer dim join as a broadcast hash join (no
    shuffle of the fact side on the join key); the fact-fact variants
    legitimately shuffle, so only the dim-join branch is inspected."""
    full = q.QUERIES["join_strategies"](spark, SF_DIR)
    bcast = full.where(F.col("variant") == "broadcast")
    plan = plan_of(bcast)
    assert "BroadcastHashJoin" in plan


def test_bm25_served_pushes_query_term_keys(spark):
    """The stored-postings BM25 serve must be O(query-terms'
    postings) END TO END (v2): the literal Ins over the query's T#
    keys, the DF# stats keys, and the two scalar stats keys all reach
    the Parquet scans as pushed filters — and NOTHING in the plan
    reads the corpus-sized L# slice or aggregates a full postings
    slice (the r14 gap: every serve paid a full L# scan for
    N/avgdl)."""
    from level_mapreduce_spark.operators.text import (
        bm25_topk_from_index,
        tfidf_from_index,
    )

    from level_mapreduce_spark.operators.text import bm25_batch_from_index

    idx = q._postings_index(spark, SF_DIR)
    plan = plan_of(bm25_topk_from_index(idx, q._BM25_QUERY, k=10))
    assert "In(index_key, [T#merge,T#spark,T#window])" in plan
    assert "In(index_key, [DF#merge,DF#spark,DF#window])" in plan
    assert "In(index_key, [DL#,N#])" in plan
    # no corpus-sized read anywhere in the serve plan: the L# slice
    # is never touched (dl rides each posting; df/N/avgdl are stats
    # point-lookups). Boundary-aware: "DL#" contains "L#".
    assert not re.search(r"[\[,(]L#", plan), "serve plan reads L# slice"
    assert "EvalPython" not in plan

    # batch serve (small regime) keeps the stats reads IN the plan —
    # both the DF# keys and the two scalar stats rows arrive as
    # pushed literal Ins over the stats index, never as aggregates
    queries = idx.spark.createDataFrame(
        [(0, q._BM25_QUERY)], "query_id long, text string"
    )
    bplan = plan_of(bm25_batch_from_index(idx, queries, k=10))
    assert "In(index_key, [T#merge,T#spark,T#window])" in bplan
    assert "In(index_key, [DF#merge,DF#spark,DF#window])" in bplan
    assert "In(index_key, [DL#,N#])" in bplan
    assert not re.search(r"[\[,(]L#", bplan), "batch serve reads L# slice"

    # tfidf serve: the full T# read is the output itself, but df must
    # come from the maintained DF# rows — no groupBy over the
    # postings slice (the other r14 full-slice aggregate)
    tplan = plan_of(tfidf_from_index(idx))
    assert "StringStartsWith(index_key,T#)" in tplan
    assert "StringStartsWith(index_key,DF#)" in tplan
    assert not re.search(r"[\[,(]L#", tplan), "tfidf serve reads L# slice"
    assert "partial_count" not in tplan
