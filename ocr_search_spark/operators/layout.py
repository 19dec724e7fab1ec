"""Z-order (Morton-curve) clustering for data-skipping layouts.

At 100 TB the dominant cost of a selective query is how many files /
row groups its predicate must OPEN, not how fast it scans them.
Parquet keeps per-column min/max statistics on every row group, but
sorting a table by one column only clusters THAT column — a predicate
on any other column still touches every file.  Interleaving the bits
of several columns' normalized values (the Morton / Z-order curve) and
sorting by the interleaved key gives EVERY participating column
locality, so min/max pruning works on all of them at once.  This is
the open-primitives re-expression of Delta/Iceberg ``OPTIMIZE ZORDER
BY``; the reference system stores one MongoDB document per page and
has no layout optimizer to mirror (DbAdapter.class.js — inserts only).

Everything here is columnar JVM arithmetic (shift/and/or unrolled over
bit positions — whole-stage codegen, no UDF), one range repartition,
and one local sort: exactly the shuffle budget of a plain
``repartitionByRange`` write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scaled_col", "scaled_col_from_bounds", "zvalue_col", "zorder_write"]


def zvalue_col(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integral)
    column into one Morton key: bit i of column j lands at position
    ``i * len(cols) + j``.  Pure unrolled shift/and/or — Catalyst sees
    ``2 * bits * len(cols)`` leaf expressions inside one codegen stage.

    ``bits * len(cols)`` must stay ≤ 63 (the key is a signed long).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("z-ordering needs at least 2 columns")
    if bits * n > 63:
        raise ValueError(f"bits={bits} x {n} columns overflows a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        c = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def scaled_col(df: DataFrame, col: str, bits: int) -> Column:
    """Convenience wrapper: compute this one column's global min/max
    (one tiny aggregate job) and delegate to ``scaled_col_from_bounds``.
    Fine for ad-hoc use; ``zorder_write`` itself batches ALL columns'
    bounds into a single aggregate instead of calling this per column."""
    row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
    return scaled_col_from_bounds(col, float(row["lo"]), float(row["hi"]), bits)


def scaled_col_from_bounds(col: str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column linearly onto [0, 2^bits) given its global
    min/max (pure column expression — no job). ``zorder_write`` computes
    the bounds of ALL clustering columns in one combined aggregate and
    feeds them here, so an n-column key costs one scan, not n."""
    span = (hi - lo) or 1.0
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * (top + 1)).cast(
            "long"
        ),
    )


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 64,
    bits: int = 16,
) -> None:
    """Write ``df`` to parquet clustered along the Z-order curve of
    ``cols``: scale each column to [0, 2^bits), interleave, range-
    repartition on the key (equi-depth file boundaries via Spark's
    range-partitioning sample), sort within each file, drop the key.

    One extra shuffle versus a plain write — the same budget as any
    clustered write — and every output file covers a compact Z-range,
    i.e. a small hyper-rectangle of the value space, so parquet
    row-group stats prune on EVERY clustered column.

    All columns' min/max bounds come from ONE combined aggregate (a
    single scan regardless of key width), then the Z-key is a pure
    column expression over those literals.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    z = zvalue_col(
        [
            scaled_col_from_bounds(
                c, float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"]), bits
            )
            for c in cols
        ],
        bits=bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
