"""Custom join operators Spark lacks natively: backward as-of join and
range (interval) join — composed from existing DataFrame ops so Catalyst
still owns the physical strategy (SURVEY task list: "as-of join, range
join … implement as a composition of existing DataFrame ops").

Both avoid the naive non-equi-join plan (BroadcastNestedLoopJoin — a
cross product) that Spark would otherwise pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_on: str,
    right_on: str,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``right_on`` <= ``left_on`` within the same ``on`` key;
    unmatched left rows keep NULL right columns (left-join semantics,
    equal to DuckDB's ``ASOF LEFT JOIN … ON l.t >= r.t``).

    Implementation: tag + union both sides, then one running
    ``last(_, ignorenulls)`` window per key ordered by (time, side) with
    the right side first at equal timestamps (inclusive match). Cost is
    ONE shuffle on the key and a linear scan per key — no range
    explosion, no nested-loop join, no per-key driver logic. This is the
    scalable pattern for point-in-time joins (feature lookups, SCD2
    attribution) at web scale; skewed keys are ordinary window skew
    (mitigate upstream by salting the key with a coarse time bucket).

    Right columns must not collide with left columns (keys excepted).
    Rows within one key sharing an exact ``right_on`` timestamp have no
    deterministic winner — deduplicate the right side first.
    """
    rpayload = [c for c in right.columns if c not in set(on) | {right_on}]
    clash = set(rpayload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {clash}")
    reserved = {
        c
        for c in set(left.columns) | set(right.columns)
        if c in ("_t", "_side") or c.startswith("_r_")
    }
    if reserved:
        raise ValueError(
            f"input columns collide with asof_join internals: {sorted(reserved)} "
            "(rename them; '_t', '_side' and '_r_*' are reserved)"
        )

    lt = left.withColumn("_t", F.col(left_on)).withColumn("_side", F.lit(1))
    rt = (
        right.select(
            *on,
            F.col(right_on).alias("_t"),
            *[F.col(c).alias(f"_r_{c}") for c in rpayload],
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        W.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned
    for c in rpayload:
        filled = filled.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (
        filled.where(F.col("_side") == 1)
        .select(
            *left.columns,
            *[F.col(f"_r_{c}").alias(c) for c in rpayload],
        )
    )


def range_join_binned(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join of points against intervals (``lo <= p <= hi``) via
    bin bucketing: each interval is exploded into the integer bins it
    overlaps, each point belongs to exactly one bin, and the join runs
    as an equi-join on the bin followed by the exact predicate. Each
    matching pair appears exactly once (a point has one bin).

    Replaces the BroadcastNestedLoopJoin Spark plans for a raw
    inequality join — shuffle and compare volume scale with
    |points| + Σ interval_width/bin_width instead of |points|·|intervals|.
    Pick ``bin_width`` ≈ the median interval width; AQE handles residual
    hot bins.
    """
    clash = (set(intervals.columns) & set(points.columns)) | (
        {"_bin"} & (set(points.columns) | set(intervals.columns))
    )
    if clash:
        raise ValueError(
            f"column collision: {sorted(clash)} "
            "(inputs must be disjoint and neither may carry '_bin')"
        )
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    ib = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return (
        pb.join(ib, "_bin")
        .where((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_bin")
    )
