"""Bucketed-table co-location: the write-once-shuffle-never join
path. Asserts the plans, not just the answers — the point of
bucketing IS the missing Exchange.
"""

from pyspark.sql import functions as F

from level_mapreduce_spark.sources.bucketed import drop_bucketed, write_bucketed
from level_mapreduce_spark.sources.tables import load_table


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """orders x lineitem bucketed by order key, same bucket count:
    the equi-join runs bucket-to-bucket with no Exchange on either
    side, and the result matches the plain join."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # at test SF the tables are broadcast-sized, which would hide the
    # property under test; disable broadcast to get the SMJ plan a
    # 100 TB fact x fact join would use
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = write_bucketed(
            orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
            "t_orders_b",
            keys="o_orderkey",
            n_buckets=8,
            sort_by="o_orderkey",
            path=str(tmp_path / "orders_b"),
        )
        bl = write_bucketed(
            lineitem.select("l_orderkey", "l_quantity", "l_extendedprice"),
            "t_lineitem_b",
            keys="l_orderkey",
            n_buckets=8,
            sort_by="l_orderkey",
            path=str(tmp_path / "lineitem_b"),
        )
        joined = bo.join(
            bl, bo["o_orderkey"] == bl["l_orderkey"]
        ).groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum("l_quantity").alias("qty"),
        )
        # AQE hides the final plan until execution; force it first
        rows = {r["o_orderpriority"]: (r["n"], r["qty"]) for r in joined.collect()}
        plan = plan_of(joined)
        join_section = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        # no shuffle below the join: the only Exchange allowed is the
        # one feeding the final aggregation on o_orderpriority
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan

        want = {
            r["o_orderpriority"]: (r["n"], r["qty"])
            for r in orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
            .collect()
        }
        assert rows == want and rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        drop_bucketed(spark, "t_orders_b")
        drop_bucketed(spark, "t_lineitem_b")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir, tmp_path):
    """groupBy on the bucket key reads pre-partitioned data — no
    Exchange anywhere in the aggregation plan."""
    orders = load_table(spark, sf_dir, "orders")
    try:
        bo = write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "t_orders_agg_b",
            keys="o_orderkey",
            n_buckets=8,
            path=str(tmp_path / "orders_agg_b"),
        )
        agg = bo.groupBy("o_orderkey").agg(F.sum("o_totalprice").alias("s"))
        agg.collect()
        assert "Exchange" not in plan_of(agg)
    finally:
        drop_bucketed(spark, "t_orders_agg_b")


def test_bucket_pruning_on_key_equality(spark, sf_dir, tmp_path):
    """An equality predicate on the bucket key scans one bucket (the
    scan reports the selected-bucket count)."""
    orders = load_table(spark, sf_dir, "orders")
    # a bare filter does not exploit the bucket distribution, so the
    # planner's autoBucketedScan turns bucketed reading (and with it
    # bucket pruning) off; disable the auto-off to observe pruning
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        bo = write_bucketed(
            orders.select("o_orderkey", "o_totalprice"),
            "t_orders_prune_b",
            keys="o_orderkey",
            n_buckets=8,
            path=str(tmp_path / "orders_prune_b"),
        )
        some_key = orders.select(F.min("o_orderkey")).first()[0]
        one = bo.where(F.col("o_orderkey") == some_key)
        assert one.count() >= 1
        plan = plan_of(one)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
        drop_bucketed(spark, "t_orders_prune_b")
