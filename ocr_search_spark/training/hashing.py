"""Deterministic 60-bit string hashes, cross-engine reproducible.

``h60`` is md5-based so the DuckDB oracle can replicate it exactly
(``('0x' || substring(md5(s), 1, 15))::BIGINT``): 15 hex digits = 60
bits, always non-negative, well inside int64. For production-scale runs
where cross-engine replay isn't needed, ``h64_fast`` uses the JVM-native
``xxhash64`` (no md5 string materialization — noticeably cheaper in the
shuffle-heavy dedup paths).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

H60_SQL = "('0x' || substring(md5({expr}), 1, 15))::BIGINT"  # DuckDB twin


def h60(col: Column) -> Column:
    """60-bit hash of a string column; equals the DuckDB twin exactly."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_salted(col: Column, salt: int) -> Column:
    """Independent hash family member i: h60(i || ':' || s)."""
    return h60(F.concat(F.lit(str(salt)), F.lit(":"), col))


def h64_fast(col: Column, seed: int = 0) -> Column:
    """JVM-native alternative (NOT DuckDB-replayable): xxhash64."""
    return F.xxhash64(F.lit(seed), col)
