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


def bloom_pruned_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 15,
    k: int = 3,
) -> DataFrame:
    """Semi-join reduction: inner-join ``big`` ⋈ ``small`` on ``key``,
    with the big side pre-filtered MAP-SIDE by a Bloom filter of the
    small side's keys — the classic distributed-join optimization for
    "huge fact ⋈ selective dim" when the dim is too big to broadcast
    whole but its KEY SET fits a filter.

    Result is EXACTLY the plain inner join (the real join removes the
    Bloom's false positives); the filter only cuts the rows the big
    side ships into the join shuffle. The filter is folded into ONE
    literal long array (m_bits/32 words — 1 KiB-scale for the default,
    the PQ-codebook trick), so the probe is a pure scan-side expression:
    no explode, no per-row join, no extra shuffle anywhere.

    The driver holds the m_bits/32-word array (bounded by the CHOSEN
    filter size, never by data — the IVF-centroid pattern); the small
    side is aggregated once to build it (filter-sized shuffle).

    Uses the same h60-salted hash family as training/sketches.bloom_*,
    so a filter persisted by bloom_build prunes identically.
    """
    from ..training.sketches import _WORD_BITS, _bit_positions, bloom_build

    n_words = m_bits // _WORD_BITS
    got = {
        int(r["word_idx"]): int(r["bits"])
        for r in bloom_build(small.select(key), key, m_bits, k).collect()
    }
    words = F.array(*[F.lit(got.get(i, 0)).cast("long") for i in range(n_words)])
    # single-bit masks as a literal lookup (shiftleft needs a Python-int
    # shift; a column-valued shift is spelled as element_at of this array)
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(_WORD_BITS)])
    pos = _bit_positions(F.col(key), m_bits, k)
    hit = F.forall(
        pos,
        lambda p: (
            F.element_at(words, (p / F.lit(_WORD_BITS)).cast("int") + 1).bitwiseAND(
                F.element_at(masks, (p % F.lit(_WORD_BITS)).cast("int") + 1)
            )
            != 0
        ),
    )
    return big.where(hit).join(small, key)
