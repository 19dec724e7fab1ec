"""Z-order layout: key correctness + measurable row-group pruning.

The pruning assertion is engine-independent: it reads parquet footers
with pyarrow and counts row groups whose min/max box intersects a
2-dimensional predicate — exactly the statistic any scan planner
(Spark, DuckDB, Trino) uses to skip IO.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ocr_search_spark.operators.layout import zorder_write, zvalue_col


def _py_morton(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zvalue_matches_python_reference(spark):
    df = spark.range(500).select(
        F.col("id"),
        (F.col("id") % 31).alias("x"),
        ((F.col("id") * 7) % 29).alias("y"),
        ((F.col("id") * 13) % 23).alias("w"),
    )
    got = df.select(
        "x", "y", "w", zvalue_col([F.col("x"), F.col("y"), F.col("w")], bits=5).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton([r["x"], r["y"], r["w"]], 5)


def test_zvalue_rejects_overflow_and_single_col(spark):
    with pytest.raises(ValueError):
        zvalue_col([F.lit(1)], bits=5)
    with pytest.raises(ValueError):
        zvalue_col([F.lit(1), F.lit(2)], bits=32)


def _touched_row_groups(path: str, lo_a, hi_a, col_a, lo_b, hi_b, col_b) -> tuple[int, int]:
    """(row groups whose stats box intersects the predicate, total)."""
    touched = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            stats = {
                rg.column(c).path_in_schema: rg.column(c).statistics
                for c in range(rg.num_columns)
            }
            total += 1
            sa, sb = stats[col_a], stats[col_b]
            if sa.max >= lo_a and sa.min <= hi_a and sb.max >= lo_b and sb.min <= hi_b:
                touched += 1
    return touched, total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """A single-column sort leaves the OTHER column unclustered: a
    selective predicate on it touches ~every row group.  The Z-order
    layout of the same rows must touch strictly fewer for the same
    predicate — that difference IS the data-skipping win."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

    single = str(tmp_path / "single")
    (
        orders.repartitionByRange(8, "o_totalprice")
        .sortWithinPartitions("o_totalprice")
        .write.mode("overwrite")
        .parquet(single)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(orders, ["o_totalprice", "o_custkey"], zpath, n_files=8, bits=10)

    # identical row multisets
    a = spark.read.parquet(single)
    b = spark.read.parquet(zpath)
    assert a.count() == b.count() == orders.count()
    assert a.exceptAll(b).count() == 0

    # box predicate: mid 10% of custkey, full price range → the price
    # sort can't prune it, the z-layout can
    ck = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    lo = ck[0] + (ck[1] - ck[0]) * 45 // 100
    hi = ck[0] + (ck[1] - ck[0]) * 55 // 100
    pr = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()

    t_single, n_single = _touched_row_groups(
        single, pr[0], pr[1], "o_totalprice", lo, hi, "o_custkey"
    )
    t_z, n_z = _touched_row_groups(zpath, pr[0], pr[1], "o_totalprice", lo, hi, "o_custkey")
    assert t_single == n_single  # the single sort is blind to custkey
    assert t_z < t_single  # the z-layout skips row groups
