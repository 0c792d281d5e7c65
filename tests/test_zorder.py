"""Z-order layout: quantitative file-skipping properties, measured
from the actual parquet footers of the written files — the stats the
reader's row-group pruning consumes.
"""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from level_mapreduce_spark.functions.zorder import zorder_write
from level_mapreduce_spark.sources.tables import load_table


def per_file_spans(path: str, col: str, lo: float, hi: float) -> list[float]:
    """Normalized [0,1] span of ``col`` per parquet file (footer
    min/max over its row groups)."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        mx = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        spans.append((mx - mn) / (hi - lo))
    return spans


def test_zorder_clusters_both_columns(spark, sf_dir, tmp_path):
    """Z-ordered events files each cover a narrow range of BOTH
    user_id and value; a single-column sort covers the full span of
    the other column in every file. File-level selectivity: a point
    predicate on either z-order column rules out most files."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lo_u, hi_u, lo_v, hi_v = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    z_path = str(tmp_path / "z")
    zorder_write(events, ["user_id", "value"], z_path, n_files=16)
    s_path = str(tmp_path / "s")
    (
        events.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(s_path)
    )

    zu = per_file_spans(z_path, "user_id", lo_u, hi_u)
    zv = per_file_spans(z_path, "value", lo_v, hi_v)
    su = per_file_spans(s_path, "user_id", lo_u, hi_u)
    sv = per_file_spans(s_path, "value", lo_v, hi_v)

    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    # the single-column sort: perfect on its key, blind on the other
    # (small files under-sample the value domain, so "blind" shows as
    # a span 2x+ wider than z-order's, not as span 1.0)
    assert mean(su) < 0.2
    # z-order: BOTH columns clustered — each file spans well under
    # the full domain on each dimension (sqrt(1/16) = 0.25 ideal for
    # 2 columns; allow slack for value-distribution irregularity)
    assert mean(zu) < 0.45, zu
    assert mean(zv) < 0.45, zv
    assert mean(sv) > 2 * mean(zv), (mean(sv), mean(zv))
    # file-level selectivity on the NON-primary dimension: a point
    # predicate on value keeps a minority of z-ordered files but
    # every single-column-sorted file
    probe = (lo_v + hi_v) / 2
    z_hit = sum(
        1
        for f in sorted(glob.glob(f"{z_path}/part-*.parquet"))
        for md in [pq.ParquetFile(f).metadata]
        if any(
            md.row_group(g).column(md.schema.names.index("value")).statistics.min
            <= probe
            <= md.row_group(g).column(md.schema.names.index("value")).statistics.max
            for g in range(md.num_row_groups)
        )
    )
    s_hit = sum(
        1
        for f in sorted(glob.glob(f"{s_path}/part-*.parquet"))
        for md in [pq.ParquetFile(f).metadata]
        if any(
            md.row_group(g).column(md.schema.names.index("value")).statistics.min
            <= probe
            <= md.row_group(g).column(md.schema.names.index("value")).statistics.max
            for g in range(md.num_row_groups)
        )
    )
    n_z = len(glob.glob(f"{z_path}/part-*.parquet"))
    n_s = len(glob.glob(f"{s_path}/part-*.parquet"))
    # z-order keeps a minority of files; the user-sort keeps most
    # (not necessarily all — tiny files can miss the probe value)
    assert z_hit / n_z <= 0.6, (z_hit, n_z)
    assert z_hit / n_z < 0.8 * (s_hit / n_s), (z_hit, n_z, s_hit, n_s)

    # round trip: no rows harmed by the relayout
    assert spark.read.parquet(z_path).count() == events.count()


def test_z_value_interleave_is_morton(spark):
    """Bit-level check: z_value(x=0b11, y=0b00, bits=2) == 0b0101 and
    neighbors interleave as the Morton curve demands."""
    from level_mapreduce_spark.functions.zorder import z_value

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (1, 1), (2, 2)], "x long, y long"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(1, 1)] == 0b0011
    assert out[(2, 2)] == 0b1100


def test_zorder_empty_input(spark, tmp_path):
    """Empty input writes an empty (readable) dataset instead of
    crashing on undefined min/max bounds."""
    from level_mapreduce_spark.functions.zorder import zorder_write

    empty = spark.createDataFrame([], "a long, b double")
    out = str(tmp_path / "z_empty")
    zorder_write(empty, ["a", "b"], out)
    assert spark.read.parquet(out).count() == 0


def test_zorder_null_columns_and_values(spark, tmp_path):
    """An entirely-null layout column scales to the constant 0 rank
    (the OTHER dimensions still cluster — no crash, no write-as-is
    fallback), null VALUES in a partially-null column rank 0 instead
    of nulling the row's whole z-value, and an all-columns-null frame
    takes the write-as-is path."""
    rows = [(i, float(i % 7), None, None if i % 5 == 0 else float(i))
            for i in range(400)]
    df = spark.createDataFrame(rows, "a long, b double, c double, d double")

    # second column entirely null: clusters on (a, d) anyway
    out = str(tmp_path / "z_nullcol")
    zorder_write(df, ["a", "c", "d"], out, n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == 400
    spans = per_file_spans(out, "a", 0, 399)
    assert sum(spans) / len(spans) < 0.6, spans

    # every layout column null: falls back to write-as-is
    out2 = str(tmp_path / "z_allnull")
    zorder_write(df, ["c"], out2)
    assert spark.read.parquet(out2).count() == 400
