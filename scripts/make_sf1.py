"""Materialize a full sf1.0-equivalent corpus — ALL 10 tables — for
the round-12 scale-confirmation pass (VERDICT r11 #1: the 2x perf gate
and the oracle sweep had only ever run at sf0.1).

Replication is the probes' density-preserving model (scale_probe.py /
endurance_probe.py), extended to the whole star schema so bench.py and
scripts/check_correctness.py run UNCHANGED against the output dir:

- region / nation: copied as-is (TPC-H holds them fixed across sf);
- customer / supplier / part: primary keys id-shifted per replica;
- orders: o_orderkey shifted by (max+1), o_custkey shifted in lockstep
  with customer — per-replica referential integrity holds exactly;
- lineitem: l_orderkey / l_partkey / l_suppkey shifted in lockstep
  with their parents;
- events: event_id and user_id shifted by (max+1) — sessions, funnels
  and per-user windows stay within-replica; the time range is shared
  (a 10x-busier deployment over the same wall-clock window);
- documents: rep_docs_distinct alphabet rotation — within-replica
  edit distances / token sets exact, cross-replica similarity ~0, so
  dup density stays the base corpus's (no planted quadratic cliques);
- embeddings: rep_emb per-replica sign pattern — within-replica
  cosines exact, cross-replica ~0.

Usage::

    python scripts/make_sf1.py [sf_dir] [out_dir] [N]

Defaults: /root/testdata/sf0.1 -> /tmp/lmr_sf1.0, N=10. The out dir
name must end in "sf<number>" for bench.py's sf parsing.
"""

from __future__ import annotations

import os
import shutil
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from pyspark.sql import functions as F

from level_mapreduce_spark import get_spark
from level_mapreduce_spark.sources.tables import load_table

from scale_probe import rep_docs_distinct, rep_emb, rep_ids  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lmr_sf1.0"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app_name="lmr-make-sf1")

    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)

    def write(name, df):
        # stage via Spark (dir of part files), then compact to ONE
        # plain file — the driver's DuckDB oracle opens
        # '{dir}/{name}.parquet' as a file path, matching the testdata
        # layout (Spark reads either; row groups keep it splittable)
        import duckdb

        stage = os.path.join(out, "_stage", name)
        df.write.parquet(stage)
        duckdb.sql(
            f"COPY (SELECT * FROM parquet_scan('{stage}/*.parquet')) "
            f"TO '{os.path.join(out, name + '.parquet')}' "
            f"(FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        shutil.rmtree(stage)
        print(f"{name}: {load_table(spark, out, name).count()} rows")

    def shift_base(df, col):
        return int(df.agg(F.max(col)).first()[0]) + 1

    # fixed dims
    for t in ("region", "nation"):
        write(t, load_table(spark, sf_dir, t))

    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    b_cust = shift_base(customer, "c_custkey")
    b_supp = shift_base(supplier, "s_suppkey")
    b_part = shift_base(part, "p_partkey")
    b_ord = shift_base(orders, "o_orderkey")

    write("customer", rep_ids(customer, n, {"c_custkey": b_cust}))
    write("supplier", rep_ids(supplier, n, {"s_suppkey": b_supp}))
    write("part", rep_ids(part, n, {"p_partkey": b_part}))
    write(
        "orders",
        rep_ids(orders, n, {"o_orderkey": b_ord, "o_custkey": b_cust}),
    )
    write(
        "lineitem",
        rep_ids(
            lineitem,
            n,
            {"l_orderkey": b_ord, "l_partkey": b_part, "l_suppkey": b_supp},
        ),
    )
    write(
        "events",
        rep_ids(
            events,
            n,
            {
                "event_id": shift_base(events, "event_id"),
                "user_id": shift_base(events, "user_id"),
            },
        ),
    )
    write("documents", rep_docs_distinct(docs, n, shift_base(docs, "doc_id")))
    write("embeddings", rep_emb(emb, n, shift_base(emb, "vec_id")))
    print(f"done: {out}")


if __name__ == "__main__":
    main()
