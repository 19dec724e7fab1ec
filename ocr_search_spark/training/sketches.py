"""Probabilistic sketches as pure DataFrame aggregations.

At 10^12 documents the exact answers to "how often does each term
occur", "how many distinct terms are there" and "is this term in the
eval set" each cost a corpus-wide shuffle keyed on the term. The
classic sketches answer them with FIXED-size state that map-side
combines inside a single scan:

* **Count-min sketch** — a ``depth x width`` grid of counters; every
  occurrence increments one bucket per row (independent hash family).
  The estimate for a term is the min over its ``depth`` buckets —
  always >= the true count, with overestimate bounded by ``2N/width``
  at 1 - (1/2)^depth confidence.  Build = one scan + one groupBy on
  (row, bucket): ``depth*width`` cells regardless of corpus size, so
  the partial aggregation collapses every partition to <= depth*width
  rows before the shuffle, and the finished sketch is broadcastable.
* **HyperLogLog** — ``m = 2^b`` registers, each holding the max
  "leading-zero rank" of the hashed values routed to it.  One scan +
  one ``groupBy(register).max(rho)``: m rows of state, mergeable by
  max, estimate ``alpha * m^2 / sum(2^-rho)``.  The gate-facing output
  is the INTEGER register table (and the dyadic numerator
  ``sum(2^(54-rho))``), so the cross-engine compare never touches
  floats; the float estimate is asserted in pytest.
* **Bloom filter** — ``m`` bits, ``k`` hash probes per element, packed
  32 bits per word via ``bit_or`` so the whole filter is ``m/32``
  bigint rows.  Membership = all k probed bits set.  The filter over a
  (small) eval set broadcasts; the corpus-side probe is a single scan
  — exactly the decontamination shape where the exact semi-join would
  shuffle the full corpus vocabulary.

All three use the md5-backed :func:`~ocr_search_spark.training.hashing.h60`
family so a DuckDB oracle replays them bit-for-bit (the sketches are
deterministic data structures, not approximations of the QUERY — the
oracle builds the same sketch and must land on identical cells).

Reference parity note: the reference engine (tom6311tom6311/ocr_search)
keeps exact Mongo collections and has no sketch tier; these are the
scale-path additions a 100 TB corpus needs (task brief: "a novel
sketch" as a first-class custom operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import literal_df

from ocr_search_spark.training.hashing import h60, h60_salted

# ------------------------------------------------------------ count-min


def _row_buckets(col: Column, depth: int, width: int) -> Column:
    """Array of (row, bucket) structs — one scan computes every row's
    bucket, then a single explode feeds the (row, bucket) aggregate."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (h60_salted(col, i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_build(items: DataFrame, col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch of the multiset in ``items[col]``.

    Returns (row, bucket, cnt) — at most ``depth*width`` rows. The
    groupBy's partial (map-side) aggregation bounds every task's output
    at depth*width cells, so the shuffle moves sketch-sized state, not
    corpus-sized state.
    """
    return (
        items.select(F.explode(_row_buckets(F.col(col), depth, width)).alias("rb"))
        .select("rb.row", "rb.bucket")
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Point-query the sketch for every probe value.

    Output: probes' columns + ``cms_est``. The sketch (<= depth*width
    rows) broadcasts; a probed bucket with no sketch row means no
    element ever hashed there → that row's counter is exactly 0.

    Contract: probes' columns must not be named row/bucket/cnt (they
    would collide with the sketch join keys), and probe rows are
    treated as a set (the groupBy collapses duplicates).
    """
    pb = probes.select(
        "*", F.explode(_row_buckets(F.col(col), depth, width)).alias("rb")
    ).select("*", "rb.row", "rb.bucket").drop("rb")
    est = (
        pb.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
    return est


# ----------------------------------------------------------- hyperloglog

# h60 yields 60 uniform bits: the low b bits route to a register, the
# remaining 60-b bits feed the rank.  With b=6 the rank field is 54
# bits; rho = (# leading zeros in the 54-bit field) + 1 = 55 - bitlen.

HLL_B = 6
HLL_M = 1 << HLL_B
_RANK_BITS = 60 - HLL_B  # 54


def hll_registers(items: DataFrame, col: str, group_cols: tuple = ()) -> DataFrame:
    """HyperLogLog register table over the DISTINCT values of ``col``.

    Returns (*group_cols, register, max_rho) — <= 64 rows per group.
    Only occupied registers appear; an absent register is rho=0 by
    convention (callers padding for the estimate use
    :func:`hll_estimate_from_registers`).  With ``group_cols`` this is
    the grouped-sketch shape ("distinct terms per language/source"):
    64-row state per group key regardless of group size, all map-side
    combinable — the shuffle carries groups x 64 rows, never the
    distinct values themselves.
    """
    h = h60(F.col(col))
    reg = (h % HLL_M).alias("register")
    p = F.shiftright(h, HLL_B)
    rho = (
        F.when(p == 0, F.lit(_RANK_BITS + 1))
        .otherwise(F.lit(_RANK_BITS + 1) - F.length(F.bin(p)))
        .cast("int")
        .alias("rho")
    )
    gcols = [F.col(g) for g in group_cols]
    return (
        items.select(*gcols, reg, rho)
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_from_registers(rows: list[tuple[int, int]]) -> float:
    """Driver-side estimate from the (register, max_rho) table — floats
    stay OUT of the gated query; pytest asserts accuracy with this."""
    regs = {r: v for r, v in rows}
    m = HLL_M
    z = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / z
    zero = sum(1 for j in range(m) if regs.get(j, 0) == 0)
    if est <= 2.5 * m and zero:  # small-range (linear counting) correction
        import math

        est = m * math.log(m / zero)
    return est


# ---------------------------------------------------------- bloom filter

_WORD_BITS = 32  # pack 32 bits per bigint word: 1<<31 still positive


def _bit_positions(col: Column, m_bits: int, k: int) -> Column:
    """Array of the k probed bit positions for one element (salts offset
    by 100 so the bloom family is independent from the CMS family)."""
    return F.array(*[h60_salted(col, 100 + i) % m_bits for i in range(k)])


def bloom_build(items: DataFrame, col: str, m_bits: int = 1 << 15, k: int = 3) -> DataFrame:
    """Bloom filter over the values of ``col``: (word_idx, bits) rows,
    <= m_bits/32 of them, bit j of word w set iff some element hashed
    to position w*32+j.  bit_or partial-aggregates map-side, so the
    shuffle carries filter-sized state."""
    pos = (
        items.select(F.explode(_bit_positions(F.col(col), m_bits, k)).alias("pos"))
        .select(
            (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {_WORD_BITS} as int))").alias("bitval"),
        )
    )
    return pos.groupBy("word_idx").agg(F.bit_or("bitval").alias("bits"))


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, col: str, m_bits: int = 1 << 15, k: int = 3
) -> DataFrame:
    """Probe every row of ``probes`` against the filter.

    Output: probes' columns + ``bloom_hit`` (true iff ALL k bits set —
    i.e. "possibly in the set"; false is definite).  The filter
    broadcasts (<= m_bits/32 rows); the probe side is one scan.

    Contract: probe rows are treated as a set (duplicates collapse into
    one group, where count==sum still decides the all-bits-set check)
    and must not carry columns named word_idx/bitval/bits.
    """
    pp = (
        probes.select("*", F.explode(_bit_positions(F.col(col), m_bits, k)).alias("pos"))
        .select(
            "*",
            (F.col("pos") / _WORD_BITS).cast("long").alias("word_idx"),
            F.expr(f"shiftleft(1L, cast(pos % {_WORD_BITS} as int))").alias("bitval"),
        )
        .drop("pos")
    )
    hit = (
        pp.join(F.broadcast(bloom), "word_idx", "left")
        .select(
            *probes.columns,
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bitval")) != 0).alias("_set"),
        )
        .groupBy(*probes.columns)
        .agg((F.count(F.lit(1)) == F.sum(F.col("_set").cast("int"))).alias("bloom_hit"))
    )
    return hit


# ------------------------------------------------------------- mergeability
# The property that makes sketches work at 100 TB: states built on
# disjoint shards (or successive stream batches) merge into exactly the
# state a single pass would have built — CMS by cell-wise sum, HLL by
# register-wise max, Bloom by word-wise OR. Incremental maintenance of
# a stored sketch is therefore the same groupBy, fed by the stored
# state unioned with the new shard's state.


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS states (cell-wise sum): merge(build(A), build(B)) ==
    build(A union-all B), exactly."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches)
    return u.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge HLL register tables (register-wise max)."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, registers)
    return u.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge Bloom filters of the SAME (m_bits, k) geometry (word-wise
    OR). Merging filters of different geometry is meaningless; callers
    own that invariant (the tables carry no geometry metadata)."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, blooms)
    return u.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


# ----------------------------------------------- histogram quantiles


def hist_build(
    items: DataFrame, col: str, shift: int = 18, n_bins: int = 64
) -> DataFrame:
    """Fixed power-of-two-grid histogram sketch of a non-negative
    integer column: bin = clamp(col >> shift, 0, n_bins-1), state =
    (bin, cnt) with at most n_bins rows. The shift (not division) makes
    binning exact on both engines; like the other sketches, partial
    aggregation bounds every task's shuffle output at n_bins cells and
    shards merge by cell-wise sum (:func:`hist_merge`).

    Quantile error is bounded by one bin width (2^shift) — the classic
    equi-width-histogram guarantee; pick shift so 2^shift matches the
    tolerated absolute error of the domain."""
    b = F.greatest(
        F.least(
            F.shiftright(F.col(col).cast("long"), shift), F.lit(n_bins - 1)
        ),
        F.lit(0),
    )
    return (
        items.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Merge histogram states of the SAME (shift, n_bins) geometry
    (cell-wise sum): merge(build(A), build(B)) == build(A ∪ B) exactly."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, hists)
    return u.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    hist: DataFrame, qs_micros: list[int], shift: int = 18
) -> DataFrame:
    """Quantile estimates from a histogram state: for each q (in
    micros), the exclusive upper edge of the first bin whose cumulative
    count reaches q·n — integer-exact everywhere (`cum·10^6 ≥ q·n`
    replaces the ceil), so the estimate replays bit-for-bit in SQL.
    The running-sum window is unpartitioned but runs over ≤ n_bins rows
    (sketch state, never data)."""
    from pyspark.sql import Window as W

    spark = hist.sparkSession
    total = hist.select(F.sum("cnt").alias("_n"))
    cum = hist.withColumn("cum", F.sum("cnt").over(W.orderBy("bin")))
    qs = literal_df(spark, [int(q) for q in qs_micros], "q_micros", "long")
    hit = (
        cum.crossJoin(F.broadcast(total)).crossJoin(F.broadcast(qs))
        .where(F.col("cum") * F.lit(1_000_000) >= F.col("q_micros") * F.col("_n"))
        .groupBy("q_micros")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        "q_micros", ((F.col("bin") + 1) * F.lit(1 << shift)).alias("est")
    )


# ------------------------------------------- relative-error quantiles


def ddsketch_build(
    items: DataFrame, col: str, m_bits: int = 4
) -> DataFrame:
    """Mergeable quantile sketch with bounded RELATIVE error — the
    DDSketch guarantee (Masson/Rim/Lee VLDB'19) in exact integer
    arithmetic: where :func:`hist_build`'s equi-width grid bounds
    ABSOLUTE error (useless when the column spans orders of magnitude —
    doc lengths, file sizes, latencies), log-spaced buckets bound the
    error RELATIVE to the value at every scale.

    Bucket rule for a non-negative long v: keep the top ``m_bits+1``
    significant bits — ``shift = max(bitlen(v) − (m_bits+1), 0)``,
    ``rep = (v >> shift) << shift`` (the bucket's inclusive lower
    edge). Every value in the bucket satisfies

        rep ≤ v ≤ rep + 2^shift − 1  <  rep · (1 + 2^−m_bits)

    since rep preserves the MSB (rep ≥ 2^(m_bits+shift)). bitlen is
    ``length(bin(v))`` — a string-length of the binary rendering, exact
    and identical in any engine (no float log2 anywhere). State size ≤
    2^m_bits buckets per octave × 64 octaves, a few KB regardless of
    data volume; partial aggregation bounds every task's shuffle
    output at that many cells. Negative input fails loudly
    (assert_true), not silently-dropped — the X2 recorded-drop rule.
    """
    if not 1 <= m_bits <= 16:
        raise ValueError(f"m_bits must be in [1, 16], got {m_bits}")
    v = F.col(col).cast("long")
    checked = items.select(v.alias("_v"))
    # the guard lives INSIDE the bucket expression — a separate asserted
    # column would be pruned away by the optimizer as unused
    rep = F.expr(
        f"if(_v < 0, cast(raise_error('{col} must be non-negative') as bigint), "
        f"shiftleft(shiftright(_v, greatest(length(bin(_v)) - {m_bits + 1}, 0)), "
        f"greatest(length(bin(_v)) - {m_bits + 1}, 0)))"
    )
    return (
        checked.select(rep.cast("long").alias("rep"))
        .groupBy("rep")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches of the SAME m_bits (cell-wise sum):
    merge(build(A), build(B)) == build(A ∪ B) exactly — the property
    that makes per-shard build + tiny-state merge the 100 TB plan."""
    from functools import reduce

    u = reduce(DataFrame.unionByName, sketches)
    return u.groupBy("rep").agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantiles(
    sketch: DataFrame, qs_micros: list[int]
) -> DataFrame:
    """(q_micros, est): for each q, the lower edge of the first bucket
    whose cumulative count reaches ceil(q·n) — so est ≤ true_quantile <
    est·(1 + 2^−m_bits). The exact-ceil compare ``cum·10^6 ≥ q·n``
    replays bit-for-bit in SQL; the running-sum window is unpartitioned
    but runs over sketch STATE (≤ a few thousand rows), never data."""
    from pyspark.sql import Window as W

    spark = sketch.sparkSession
    total = sketch.select(F.sum("cnt").alias("_n"))
    cum = sketch.withColumn("cum", F.sum("cnt").over(W.orderBy("rep")))
    qs = literal_df(spark, [int(q) for q in qs_micros], "q_micros", "long")
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(qs))
        .where(F.col("cum") * F.lit(1_000_000) >= F.col("q_micros") * F.col("_n"))
        .groupBy("q_micros")
        .agg(F.min("rep").alias("est"))
    )


# ------------------------------------------------------------ KMV / theta

KMV_H = 1 << 60  # h60 hash range: values are uniform in [0, 2^60)


def kmv_build(
    items: DataFrame, col: str, group_cols: tuple = (), k: int = 64
) -> DataFrame:
    """K-minimum-values (bottom-k / Theta) sketch per group: the k
    smallest DISTINCT h60 hashes of ``col``, plus the threshold
    ``theta`` (the k-th smallest when saturated, else the full hash
    range ``KMV_H``).

    HLL (above) estimates per-set cardinality but cannot intersect two
    sketches; the theta framework can — every estimate is
    ``|samples below theta| * KMV_H / theta``, and union/intersection
    of sketches stay sketches (Beyer et al., SIGMOD'07; the
    DataSketches theta design). State is k hashes per group: map-side
    the per-partition rank-k cut collapses each partition to <= k rows
    per group before the shuffle (WindowGroupLimit pushes the limit
    into the partial sort), so at 10^12 rows the shuffle carries
    O(groups * k), never the corpus.

    Deterministic: md5-backed h60 over the stringified value, so a
    DuckDB oracle replays the sketch bit-for-bit (the same exact-replay
    contract as the CMS/HLL/Bloom gates)."""
    from pyspark.sql import Window as W

    h = h60(F.col(col).cast("string"))
    d = items.select(*group_cols, h.alias("h")).distinct()
    w = (
        W.partitionBy(*group_cols).orderBy("h")
        if group_cols
        else W.partitionBy().orderBy("h")
    )
    ranked = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("h")).alias("sketch")
    ).withColumn(
        "theta",
        F.when(F.size("sketch") < k, F.lit(KMV_H)).otherwise(
            F.element_at("sketch", k)
        ),
    )


def _kmv_est(below_col: str, theta_col: str = "theta") -> Column:
    """Integer-exact estimator |{h < theta}| * KMV_H div theta over
    NAMED columns (both non-negative).

    Unsaturated sketches have theta = KMV_H, so the formula degrades to
    the EXACT distinct count. DECIMAL(38,0) intermediates: below * 2^60
    overflows int64 for k > 8. DECIMAL ``div`` truncates, matching
    DuckDB's HUGEINT ``//`` floor on non-negatives (verified both
    engines agree bit-for-bit)."""
    return F.expr(
        f"CAST((CAST({below_col} AS DECIMAL(38,0))"
        f" * {KMV_H}) div {theta_col} AS BIGINT)"
    )


def kmv_estimate(sketches: DataFrame, group_cols: tuple = ()) -> DataFrame:
    """Per-group distinct-count estimates from kmv_build output."""
    below = F.size(F.filter("sketch", lambda x: x < F.col("theta")))
    return sketches.withColumn("below", below.cast("long")).select(
        *group_cols, _kmv_est("below").alias("est")
    )


def kmv_pair_estimates(sketches: DataFrame, key_col: str) -> DataFrame:
    """Theta set operations for every group pair (key_a < key_b):
    per-side, union and INTERSECTION distinct-count estimates — the
    operation HLL registers cannot express.

    theta = min(theta_a, theta_b); each estimate counts the relevant
    sample hashes strictly below theta and rescales by KMV_H/theta.
    Runs on sketch state only (a groups x k table): the pair join is
    over |groups|^2 rows of k-length arrays, never data."""
    a = sketches.select(
        F.col(key_col).alias("key_a"),
        F.col("sketch").alias("sk_a"),
        F.col("theta").alias("th_a"),
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"),
        F.col("sketch").alias("sk_b"),
        F.col("theta").alias("th_b"),
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b")).withColumn(
        "theta", F.least("th_a", "th_b")
    )
    th = F.col("theta")
    pairs = pairs.withColumns(
        {
            "below_a": F.size(F.filter("sk_a", lambda x: x < th)).cast("long"),
            "below_b": F.size(F.filter("sk_b", lambda x: x < th)).cast("long"),
            "below_u": F.size(
                F.array_distinct(
                    F.filter(F.concat("sk_a", "sk_b"), lambda x: x < th)
                )
            ).cast("long"),
            "below_i": F.size(
                F.filter(F.array_intersect("sk_a", "sk_b"), lambda x: x < th)
            ).cast("long"),
        }
    )
    return pairs.select(
        "key_a",
        "key_b",
        _kmv_est("below_a").alias("est_a"),
        _kmv_est("below_b").alias("est_b"),
        _kmv_est("below_u").alias("est_union"),
        _kmv_est("below_i").alias("est_inter"),
    )


def kmv_merge(*sketches: DataFrame, k: int = 64) -> DataFrame:
    """Union-merge sketch states built with the SAME ``k``
    (shard-parallel builds): merge(build(A), build(B)) == build(A ∪ B)
    exactly — k smallest of the concatenated distinct hashes, theta
    recomputed. ``k`` is a property of the BUILD, not inferable from
    the states (an unsaturated sketch of exactly k elements is
    indistinguishable from a saturated one), so it must be passed. The
    first column of each state is the group key."""
    from functools import reduce
    from pyspark.sql import Window as W

    u = reduce(
        DataFrame.unionByName,
        [s.select(s.columns[0], "sketch") for s in sketches],
    )
    key = u.columns[0]
    rows = u.select(key, F.explode("sketch").alias("h")).distinct()
    w = W.partitionBy(key).orderBy("h")
    ranked = rows.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return ranked.groupBy(key).agg(
        F.sort_array(F.collect_list("h")).alias("sketch")
    ).withColumn(
        "theta",
        F.when(F.size("sketch") < k, F.lit(KMV_H)).otherwise(
            F.element_at("sketch", k)
        ),
    )
