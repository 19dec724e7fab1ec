"""Dataset profiling — the per-column health summary every ingest run
records next to its lineage (row counts, null rates, cardinality,
value range). One row out per profiled column.

Shape: a single wide aggregation computes every column's metrics in one
pass over the data (Catalyst plans the multi-distinct via Expand — cost
∝ cells, the unavoidable price of exact cardinality; swap
``approx=True`` for HyperLogLog counts at 10^12 rows where exact
distinct is not worth a shuffle of every value). The wide 1-row result
is then reshaped to one row per column — driver-free, a constant-size
projection.

Min/max are surfaced as strings so the profile has one schema for any
table; numeric columns keep numeric ordering (the cast happens AFTER
the typed min/max). Profile floating-point columns through an explicit
decimal quantum (``decimals=``) — raw float→string rendering is
engine-specific and would break cross-engine replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
    decimals: dict[str, str] | None = None,
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df``: one output row per
    column with (column, n_rows, n_nonnull, n_distinct, min_str,
    max_str). NULLs are excluded from n_distinct, min and max (SQL
    aggregate semantics). ``decimals`` maps a column name to a decimal
    type (e.g. ``{"price": "decimal(18,2)"}``) applied before
    min/max/distinct so float columns profile deterministically."""
    cols = list(cols or df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    decimals = decimals or {}

    def val(c):
        return F.col(c).cast(decimals[c]) if c in decimals else F.col(c)

    ndistinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(val(c)).alias(f"__nn{i}"),
            ndistinct(val(c)).alias(f"__nd{i}"),
            F.min(val(c)).cast("string").alias(f"__mn{i}"),
            F.max(val(c)).cast("string").alias(f"__mx{i}"),
        ]
    wide = df.agg(*aggs)
    # Reshape the 1-row wide result with one inline() projection — a
    # unionAll of per-column selects would re-run the aggregation once
    # per column.
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__nn{i}").cast("long").alias("n_nonnull"),
            F.col(f"__nd{i}").cast("long").alias("n_distinct"),
            F.col(f"__mn{i}").alias("min_str"),
            F.col(f"__mx{i}").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    return wide.select(F.inline(F.array(*structs)))


# ------------------------------------------------------ data contracts


def validate_table(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[tuple[str, ...]] = (),
    in_range: list[tuple[str, float, float]] = (),
    foreign_key: list[tuple[str, DataFrame, str]] = (),
) -> DataFrame:
    """Contract validation — the expectations gate a 100 TB ingest runs
    before publishing a partition: one output row per rule,
    (rule, n_violations), all counts exact.

    * ``not_null``: columns that must never be NULL.
    * ``unique``: column tuples that must be key-unique (violations =
      rows beyond the first per duplicate key — the number of rows a
      dedup would remove).
    * ``in_range``: (col, lo, hi) inclusive bounds; NULLs don't count
      (cover them with not_null).
    * ``foreign_key``: (col, dim_df, dim_col) referential checks —
      violations = rows whose non-null value misses the dimension (one
      broadcast anti-join each; dims are small by definition).

    Shape: every not_null/in_range rule folds into ONE conditional
    aggregate over a single scan; unique adds one aggregate per key
    tuple; FK adds one anti-join per reference. Results union into a
    constant-size frame (rows = number of rules).
    """
    parts: list[DataFrame] = []
    scan_aggs = []
    for c in not_null:
        scan_aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"not_null:{c}")
        )
    for c, lo, hi in in_range:
        scan_aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull()
                    & ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"in_range:{c}:{lo:g}:{hi:g}")
        )
    if scan_aggs:
        wide = df.agg(*scan_aggs)
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(f"`{name}`").alias("n_violations"),
                    )
                    for name in wide.columns
                ]
            )
        ).alias("kv")
        parts.append(wide.select(stack).select("kv.rule", "kv.n_violations"))
    for key in unique:
        key = tuple(key)
        dup = (
            df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .agg(
                F.sum(F.col("_n") - F.lit(1)).cast("long").alias("n_violations")
            )
            .select(
                F.lit("unique:" + ",".join(key)).alias("rule"),
                F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
            )
        )
        parts.append(dup)
    for col, dim, dim_col in foreign_key:
        miss = (
            df.select(F.col(col).alias("_v"))
            .where(F.col("_v").isNotNull())
            .join(
                F.broadcast(dim.select(F.col(dim_col).alias("_v")).distinct()),
                "_v",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(
                F.lit(f"foreign_key:{col}").alias("rule"), "n_violations"
            )
        )
        parts.append(miss)
    if not parts:
        raise ValueError("validate_table: no rules given")
    from functools import reduce

    return reduce(DataFrame.unionByName, parts)


def grouped_regression(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary least squares in exact fixed-point:
    (group, n, slope_e6, intercept_e6) with

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n

    x and y must be integral columns, so every Σ is an exact BIGINT
    (partial-aggregable, order-immune); each result does exactly ONE
    double division of identical exact operands, floored at micros —
    the same pinned-quantization contract as the other _e6 operators.
    The intercept reuses the QUANTIZED slope — intercept_e6 =
    floor((Σy·10⁶ − slope_e6·Σx) / n), numerator an exact BIGINT — so
    both outputs are bit-replayable cross-engine.
    Degenerate groups (all x equal, or n == 0) emit NULL slope and
    intercept rather than a division blow-up.

    Training-pipeline use: per-source calibration curves — e.g. token
    yield per byte by crawl source for mix budgeting. Scale shape: one
    hash aggregate (5 sums per group), group-count-sized output; no
    second pass, no window, no joins.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    g = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope_e6 = F.when(
        den != 0,
        F.floor(F.lit(1000000.0) * (num.cast("double") / den.cast("double"))),
    ).cast("long")
    out = g.withColumn("slope_e6", slope_e6)
    intercept_e6 = F.when(
        F.col("slope_e6").isNotNull() & (F.col("n") > 0),
        F.floor(
            (
                F.col("sy") * F.lit(1000000)
                - F.col("slope_e6") * F.col("sx")
            ).cast("double")
            / F.col("n").cast("double")
        ),
    ).cast("long")
    return out.select(
        group_col,
        "n",
        "slope_e6",
        intercept_e6.alias("intercept_e6"),
    )


def skew_profile(
    df: DataFrame,
    key_col: str,
    n_top: int = 15,
    salt_target: int = 100_000,
) -> DataFrame:
    """Shuffle-skew diagnostics for a prospective groupBy/join key: the
    ``n_top`` heaviest keys with their exact corpus share and the salt
    fan-out that would bring each under ``salt_target`` rows/partition.

    This is the measurement half of the engine's salting story (the
    repartition_salted / skew-threshold machinery in extract.py and the
    df-guards in correlate.py/dedup.py pick thresholds — this operator
    is how you find them on a new corpus before the first full run).

    Exact arithmetic: share_e6 = cnt·1e6 DIV total (integer micros),
    salt = ceil(cnt / salt_target) = (cnt + t − 1) DIV t. Output is
    top-N by (cnt DESC, key ASC) — a pinned total order.

    Plan: one hash aggregate on the key (full map-side combine), a
    1-row broadcast total, then TakeOrderedAndProject for the top-N cut
    — no global window, no second shuffle; cost ∝ distinct keys.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 div tot").cast("long").alias("share_e6"),
            F.expr(f"(cnt + {int(salt_target)} - 1) div {int(salt_target)}")
            .cast("long")
            .alias("salt"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(n_top)
    )


# ------------------------------------------ chi-square independence


def chi_square_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """One row: (n, n_rows_levels, n_col_levels, dof, chi2_e6) — the
    chi-square test of INDEPENDENCE over a two-way contingency table
    (Pearson 1900): are two corpus dimensions (source × language,
    host × quality-band) associated, or does the mixture factorize?
    The categorical companion to :func:`psi_drift`'s marginal drift.

    Exact integer construction: each cell's term

        (O − E)²/E = (O·N − R·C)² / (N·R·C)

    is computed as ``(O·N − R·C)²·1e6 div (N·R·C)`` — floored PER CELL
    then long-summed (the PSI discipline); dof = (r−1)(c−1). Compare
    chi2_e6 against the critical value for dof (3.84e6 at dof 1, 5%).
    Plan: one contingency aggregate + two broadcast marginal joins —
    cells = r·c, never data-sized.

    Magnitudes: the products and the squared difference are computed in
    ``decimal(38,0)`` (|O·N − R·C| ≤ n² needs ~38 digits squared, far
    past int64 — a 2×2 table over a mere 200k strongly-associated rows
    already overflows 64-bit), and the per-cell e6 floor is taken as
    the EXACT two-step split ``(q² div D)·1e6 + ((q² mod D)·1e6) div
    D`` so every intermediate stays in range without losing the
    integer-floor discipline. Envelope: n ≤ ~3e9 keeps q² inside 38
    digits, and the summed ``chi2_e6`` output fits int64 whenever the
    statistic itself satisfies χ² ≤ 9.2e12 (always true for a usable
    test — χ² ≤ n·min(r−1, c−1))."""
    cells = df.groupBy(
        F.col(row_col).alias("_r"), F.col(col_col).alias("_c")
    ).agg(F.count("*").cast("long").alias("_o"))
    rm = cells.groupBy("_r").agg(F.sum("_o").cast("long").alias("_rn"))
    cm = cells.groupBy("_c").agg(F.sum("_o").cast("long").alias("_cn"))
    tot = cells.agg(F.sum("_o").cast("long").alias("_n"))
    # the FULL r x c grid: absent combinations are real cells with
    # O = 0 and term R*C/N — dropping them would understate chi-square
    j = (
        rm.crossJoin(cm)
        .join(cells, ["_r", "_c"], "left")
        .select(
            "_r", "_c", "_rn", "_cn",
            F.coalesce("_o", F.lit(0)).cast("long").alias("_o"),
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "_q",
            F.col("_o").cast("decimal(38,0)") * F.col("_n").cast("decimal(38,0)")
            - F.col("_rn").cast("decimal(38,0)") * F.col("_cn").cast("decimal(38,0)"),
        )
        .withColumn("_q2", F.col("_q") * F.col("_q"))
        .withColumn(
            "_d",
            F.col("_n").cast("decimal(38,0)")
            * F.col("_rn").cast("decimal(38,0)")
            * F.col("_cn").cast("decimal(38,0)"),
        )
    )
    # decimal(38,0) intermediates: q = O·N − R·C can reach ~n² and its
    # square ~n⁴ — int64 overflows (ANSI error / silent wrap) on tables
    # as small as 200k rows with strong association.  The e6 floor is
    # split exactly: floor(q²·1e6/D) = (q² div D)·1e6 + ((q² mod
    # D)·1e6) div D, where q² div D ≤ the cell's χ² contribution (small
    # by the output envelope) and (q² mod D)·1e6 < D·1e6 stays inside
    # decimal(38,0).
    term = F.expr(
        "(_q2 div _d) * 1000000 + ((_q2 % _d) * 1000000) div _d"
    )
    return (
        j.select(term.alias("_t"), "_n")
        .groupBy()
        .agg(
            F.first("_n").alias("n"),
            F.sum("_t").cast("long").alias("chi2_e6"),
        )
        .crossJoin(
            F.broadcast(
                rm.agg(F.count("*").cast("long").alias("n_row_levels"))
            )
        )
        .crossJoin(
            F.broadcast(
                cm.agg(F.count("*").cast("long").alias("n_col_levels"))
            )
        )
        .select(
            "n",
            "n_row_levels",
            "n_col_levels",
            (
                (F.col("n_row_levels") - 1) * (F.col("n_col_levels") - 1)
            ).cast("long").alias("dof"),
            "chi2_e6",
        )
    )


# ------------------------------------------------ Theil-Sen slope


def theil_sen_slope(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    x_col: str,
) -> DataFrame:
    """(key…, n_points, n_pairs, slope_e6) — the THEIL-SEN robust
    trend estimator (Theil 1950 / Sen 1968): the median of all
    pairwise slopes, with ~29% breakdown point where
    ``grouped_regression``'s OLS slope is wrecked by a single outlier
    (crawl series have outages and burst artifacts; the robust slope
    is the one to alert on).

    Pinned exactness: slope_e6 = (x_j−x_i)·1e6 div (t_j−t_i) per pair
    (`div` TRUNCATES toward zero on negative slopes — oracles mirror
    with trunc, the Holt rule), median = the value at rank
    ``(n_pairs+1) div 2`` under (slope, t_i, t_j) ordering — the LOWER
    median, an element of the multiset, no averaging, total order.

    Scale shape: the per-key pair join is C(n,2) — bounded by the
    analysis WINDOW like the other per-key folds (rule 15), never by
    history; keys parallelize. Groups with < 2 points are dropped
    (no pair, no slope)."""
    ti = [F.col(k) for k in key_cols]
    a = series.select(*ti, F.col(t_col).alias("_t1"), F.col(x_col).alias("_x1"))
    b = series.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(key_cols)],
        F.col(t_col).alias("_t2"),
        F.col(x_col).alias("_x2"),
    )
    cond = F.lit(True)
    for i, k in enumerate(key_cols):
        cond = cond & (F.col(k) == F.col(f"_k{i}"))
    pairs = a.join(b, cond & (F.col("_t1") < F.col("_t2"))).select(
        *ti,
        "_t1",
        "_t2",
        F.expr("(_x2 - _x1) * 1000000 div (_t2 - _t1)").alias("_s"),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(*key_cols).orderBy("_s", "_t1", "_t2")
    ranked = pairs.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_m", F.count("*").over(W.partitionBy(*key_cols))
    )
    npts = series.groupBy(*ti).agg(F.count("*").cast("long").alias("n_points"))
    med = ranked.where(F.expr("_rn = (_m + 1) div 2")).select(
        *ti,
        F.col("_m").cast("long").alias("n_pairs"),
        F.col("_s").cast("long").alias("slope_e6"),
    )
    return med.join(npts, key_cols).select(
        *ti, "n_points", "n_pairs", "slope_e6"
    )


# ------------------------------------------------ Benford audit

# floor(1e6 · log10(1 + 1/d)) for d = 1..9 — the Benford first-digit
# law as exact integer constants (no runtime transcendentals)
BENFORD_E6 = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


def benford_audit(
    df: DataFrame, col: str
) -> DataFrame:
    """(digit, n, p_e6, expected_e6, dev_e6) for digits 1-9 — the
    BENFORD first-significant-digit audit (Newcomb 1881 / Benford
    1938; the standard forensic screen for fabricated or truncated
    numeric data — grown metrics like crawl byte counts, durations
    and prices follow the log-uniform law; uniform or hand-made
    numbers do not). Contract: ``col`` is a POSITIVE INTEGER measure
    (the decimal rendering's first character IS the first significant
    digit — exact in any engine; floats would drag rendering/sci-
    notation differences in); zero/negative/null rows are excluded.
    Shares are exact e6 floors against the precomputed ``BENFORD_E6``
    constants; dev_e6 = |p − expected|. One projection + one 9-row
    aggregate; digits with no rows still appear (n = 0)."""
    fsd = F.expr(f"cast(substring(cast({col} as string), 1, 1) as int)")
    vals = df.where(F.expr(f"{col} is not null and {col} > 0")).select(
        fsd.alias("_d")
    )
    counts = vals.groupBy("_d").agg(F.count("*").cast("long").alias("n"))
    spark = df.sparkSession
    base = spark.createDataFrame(
        [(d, BENFORD_E6[d - 1]) for d in range(1, 10)],
        "digit int, expected_e6 long",
    )
    tot = counts.agg(F.sum("n").cast("long").alias("_t"))
    return (
        base.join(counts.withColumnRenamed("_d", "digit"), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.expr("coalesce(n, 0) * 1000000 div _t").alias("p_e6"),
            "expected_e6",
        )
        .select(
            "digit",
            "n",
            "p_e6",
            "expected_e6",
            F.abs(F.col("p_e6") - F.col("expected_e6"))
            .cast("long")
            .alias("dev_e6"),
        )
    )


# ------------------------------------------------ k-anonymity audit


def k_anonymity(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """One row: (n_rows, n_classes, k_anonymity, n_below_k, below_k_e6)
    — the k-ANONYMITY audit (Sweeney, IJUFKS 2002): rows sharing a
    quasi-identifier combination form an equivalence class; the
    dataset's k-anonymity is the SMALLEST class size, and every row in
    a class below ``k`` is a re-identification risk. The release-gate
    metric for shipping a curated corpus with metadata columns
    (source, language, date bucket, host…) — ``redact_pii`` scrubs
    values, this measures the JOINABILITY of what remains.

    below_k_e6 = n_below_k·1e6 div n_rows (exact). One hash aggregate
    over the QI key + one scalar aggregate over classes — the class
    relation is the only shuffle and is bounded by distinct QI combos.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.count("*").cast("long").alias("_n")
    )
    return classes.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("k_anonymity"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_below_k"),
    ).select(
        "n_rows",
        "n_classes",
        "k_anonymity",
        "n_below_k",
        F.expr("n_below_k * 1000000 div n_rows").alias("below_k_e6"),
    )


def l_diversity(
    df: DataFrame, qi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """One row: (n_classes, l_diversity, n_classes_below_l) — distinct
    l-DIVERSITY (Machanavajjhala et al., TKDD 2007), the attack
    k-anonymity misses: a class of 50 rows that all share one
    sensitive value re-identifies the ATTRIBUTE even though k = 50.
    l_diversity = the minimum count of DISTINCT sensitive values per
    quasi-identifier class; classes below ``l`` are homogeneity-attack
    exposures. Same plan shape as :func:`k_anonymity` with a
    countDistinct riding the class aggregate."""
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    classes = df.groupBy(*[F.col(c) for c in qi_cols]).agg(
        F.countDistinct(sensitive_col).cast("long").alias("_d")
    )
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.min("_d").cast("long").alias("l_diversity"),
        F.sum(F.when(F.col("_d") < l, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_l"),
    )


# ------------------------------------------------ CUSUM changepoints


def cusum_series(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    x_col: str,
    mu: int,
    slack: int,
    threshold: int,
) -> DataFrame:
    """(key…, t, x, s_up, s_down, alarm_up, alarm_down) — Page's CUSUM
    changepoint statistic (Page, Biometrika 1954) over per-key ordered
    series: the standard sequential monitor for level shifts in hourly
    crawl volumes, error counts, ingest rates.

        s_up(t)   = max(0, s_up(t−1)   + (x_t − mu − slack))
        s_down(t) = max(0, s_down(t−1) + (mu − x_t − slack))
        alarm when the statistic reaches ``threshold``

    The reset-at-zero recursion looks inherently sequential, but has an
    exact WINDOW closed form: with C_t the running sum of the drift
    increments, ``s(t) = C_t − min(0, min_{j≤t} C_j)`` — distance above
    the running minimum (the origin included for the empty prefix). So
    the whole monitor is two cumulative sums + two running minima per
    key: one shuffle on the key, no recursion, no UDF — the same
    closed-form trick that makes reduce-like analytics plan-friendly.
    All integer arithmetic (``mu``/``slack``/``threshold`` in the
    series' own count units).

    ``t_col`` must be unique per key (aggregate first); a non-total
    order would make every downstream cumulative nondeterministic.
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be > 0, got {threshold}")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy(*key_cols)
        .orderBy(t_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    up_inc = (F.col(x_col) - F.lit(mu) - F.lit(slack)).cast("long")
    dn_inc = (F.lit(mu) - F.col(x_col) - F.lit(slack)).cast("long")
    out = (
        series.withColumn("_cu", F.sum(up_inc).over(w))
        .withColumn("_cd", F.sum(dn_inc).over(w))
        .withColumn("_mu", F.least(F.lit(0).cast("long"), F.min("_cu").over(w)))
        .withColumn("_md", F.least(F.lit(0).cast("long"), F.min("_cd").over(w)))
    )
    s_up = (F.col("_cu") - F.col("_mu")).cast("long")
    s_down = (F.col("_cd") - F.col("_md")).cast("long")
    return out.select(
        *key_cols,
        F.col(t_col),
        F.col(x_col),
        s_up.alias("s_up"),
        s_down.alias("s_down"),
        (s_up >= threshold).alias("alarm_up"),
        (s_down >= threshold).alias("alarm_down"),
    )


# ------------------------------------------------ Holt forecasting


def zipf_fit(postings: DataFrame) -> DataFrame:
    """One row (n_terms, slope, intercept) — ZIPF rank-frequency fit
    over the term vocabulary: OLS of ln(count) on ln(rank). A healthy
    natural-language corpus sits near slope ≈ −1 (Zipf 1949); template
    spam flattens the head, boilerplate dedup failures fatten it, OCR
    noise fattens the tail — one scalar pair that profiles the whole
    index (the corpus-health diagnostic the reference's term_freqs
    table could support but never computes,
    /root/reference/src/DbInterface/DbInterface.class.js:366-381).

    Pinned exactness: x = floor(1e6·ln rank) and y = floor(1e6·ln c)
    as BIGINTs; the five OLS sums (n, Σx, Σy, Σxy, Σx²) in exact
    decimal(38,0) (HUGEINT oracle-side); slope = cast-to-double of the
    exact numerator/denominator, round 6 — deterministic at any
    parallelism because every sum is integer-exact.

    Scale shape: ranking avoids a vocabulary-sized single-partition
    sort — ranks come from the COUNT-DISTRIBUTION: rank(t) =
    (# terms with larger count) + intra-count row_number. The
    intra-count window partitions by count (parallel), and the
    count-level cumulative runs over the DISTINCT-count table, which
    is distribution-sized (thousands of rows for any corpus), not
    vocabulary-sized. The OLS reduction is one scalar aggregate."""
    from pyspark.sql import Window as W

    counts = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("c")
    )
    hist = counts.groupBy("c").agg(F.count("*").cast("long").alias("_m"))
    cum = hist.withColumn(
        "_before",
        F.coalesce(
            F.sum("_m").over(
                W.orderBy(F.desc("c")).rowsBetween(
                    W.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).cast("long"),
    )
    ranked = (
        counts.withColumn(
            "_i",
            F.row_number().over(W.partitionBy("c").orderBy("term")),
        )
        .join(cum.select("c", "_before"), "c")
        .select(
            "c", (F.col("_before") + F.col("_i")).cast("long").alias("rank")
        )
    )
    xy = ranked.select(
        F.floor(F.lit(1_000_000.0) * F.log(F.col("rank").cast("double")))
        .cast("long")
        .alias("x"),
        F.floor(F.lit(1_000_000.0) * F.log(F.col("c").cast("double")))
        .cast("long")
        .alias("y"),
    )
    d38 = "decimal(38,0)"
    sums = xy.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(d38) * F.col("y")).cast(d38).alias("sxy"),
        F.sum(F.col("x").cast(d38) * F.col("x")).cast(d38).alias("sxx"),
    )
    num = F.col("n").cast(d38) * F.col("sxy") - F.col("sx").cast(
        d38
    ) * F.col("sy")
    den = F.col("n").cast(d38) * F.col("sxx") - F.col("sx").cast(
        d38
    ) * F.col("sx")
    slope_raw = num.cast("double") / den.cast("double")
    # den = 0 ⟺ every term shares one rank-x (≤1 term): no fit, nulls
    return sums.select(
        F.col("n").alias("n_terms"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(F.round(slope_raw, 6))
        .alias("slope"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (
                    F.col("sy").cast("double") / F.col("n")
                    - slope_raw * (F.col("sx").cast("double") / F.col("n"))
                )
                / 1_000_000.0,
                6,
            )
        )
        .alias("intercept"),
    )


def holt_forecast(
    series: DataFrame,
    key_cols: list[str],
    t_col: str,
    x_col: str,
    alpha_e6: int = 300_000,
    beta_e6: int = 100_000,
    horizon: int = 1,
) -> DataFrame:
    """(key…, n_obs, level, trend_e6, forecast) — Holt's linear
    exponential smoothing (Holt 1957 / Winters 1960; the capacity-
    planning workhorse for crawl volume and ingest-rate forecasting),
    in E6-SCALED integer state (level and trend both carried ×1e6 —
    a raw-unit state would truncate every sub-unit trend increment to
    zero and never learn a slope):

        L_t = (α·(x_t·1e6) + (1e6−α)·(L_{t−1} + B_{t−1})) div 1e6
        B_t = (β·(L_t − L_{t−1}) + (1e6−β)·B_{t−1}) div 1e6
        level = L_n div 1e6,  forecast(h) = (L_n + h·B_n) div 1e6

    initialized L_1 = x_1·1e6, B_1 = 0; every step an integer `div`
    (TRUNCATING toward zero on negative trend intermediates — the
    pinned rule an oracle must mirror with trunc(), not floor). Like
    AIMD (and unlike CUSUM) the floored recursion has no algebraic
    closed form, so it ships as the bounded per-key fold of SCALE.md
    rule 15: one ordered collect per key per forecasting window —
    state is two integers, keys embarrassingly parallel. ``t_col``
    must be unique per key."""
    if not 0 < alpha_e6 <= 1_000_000 or not 0 <= beta_e6 <= 1_000_000:
        raise ValueError(
            f"alpha_e6 in (0,1e6], beta_e6 in [0,1e6]; got {alpha_e6}, {beta_e6}"
        )
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    a, b = alpha_e6, beta_e6
    per = series.groupBy(*[F.col(k) for k in key_cols]).agg(
        F.expr(
            f"transform(array_sort(collect_list(struct({t_col} AS t, "
            f"{x_col} AS x))), p -> bigint(p.x))"
        ).alias("_xs")
    )
    lp = f"(({a} * e * 1000000 + (1000000 - {a}) * (acc.l + acc.b)) div 1000000)"
    step = (
        f"(acc, e) -> named_struct("
        f"'l', {lp}, "
        f"'b', (({b} * ({lp} - acc.l) + (1000000 - {b}) * acc.b) div 1000000))"
    )
    fold = (
        f"aggregate(slice(_xs, 2, size(_xs) - 1), "
        f"named_struct('l', element_at(_xs, 1) * cast(1000000 as bigint), "
        f"'b', cast(0 as bigint)), "
        f"{step})"
    )
    out = per.where(F.size("_xs") >= 1).withColumn("_st", F.expr(fold))
    return out.select(
        *key_cols,
        F.size("_xs").cast("long").alias("n_obs"),
        F.expr("_st.l div 1000000").cast("long").alias("level"),
        F.col("_st.b").alias("trend_e6"),
        F.expr(f"(_st.l + {horizon} * _st.b) div 1000000").cast("long").alias(
            "forecast"
        ),
    )
