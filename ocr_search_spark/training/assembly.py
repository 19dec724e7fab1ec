"""Dataset assembly: deterministic split assignment + epoch ordering.

The last mile of a training-data pipeline: after curation (dedup,
quality, decontamination) the corpus must be (a) partitioned into
train/valid/test ONCE, stably, and (b) ordered for each training epoch.
Both must be pure functions of the row key so that any re-run, any
parallelism, and any later corpus growth reproduce the same answer —
the property that makes eval sets trustworthy (a doc that ever lands in
``test`` must stay there when 10^9 new docs arrive; a hash-threshold
rule gives exactly that, a percentile/quota rule does not).

The reference has no dataset notion at all (its corpus is whatever the
synced folder holds — `/root/reference/src/DropboxSynchronizer/
DropboxSynchronizer.class.js:171-190`); these operators extend the
engine the same way training/dedup.py does. Hashes are the repo-wide
cross-engine h60 (training/hashing.py) so a SQL oracle replays every
assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_search_spark.training.hashing import h60

DEFAULT_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("train", 98),
    ("valid", 1),
    ("test", 1),
)


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[tuple[str, int], ...] = DEFAULT_WEIGHTS,
    salt: str = "split",
) -> DataFrame:
    """Deterministic hash split: adds ``bucket`` (0..total-1) and
    ``split`` columns; a key's assignment depends on NOTHING but
    (salt, key).

    ``weights`` are integer proportions in declaration order; a key
    lands in the first name whose cumulative weight exceeds
    ``h60(salt:key) mod total``. Properties, each load-bearing:

    * **disjoint + exhaustive** by construction (one bucket, one CASE);
    * **stable under growth**: adding/removing OTHER rows never moves a
      key between splits (unlike quota/percentile splits, which
      reshuffle the boundary on every corpus change — eval
      contamination by rerun);
    * **order/partitioning-immune**: no window, no row_number — the
      bucket is a projection, so the plan is one whole-stage-codegen
      map over the scan, shuffle-free at any scale.

    In expectation each split receives ``weight/total`` of any stratum
    (hash uniformity); exact per-stratum quotas are a different
    operator (textstats.stratified_sample) with a different stability
    trade-off.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w <= 0 for _, w in weights):
        raise ValueError(f"weights must be positive, got {weights}")
    names = [n for n, _ in weights]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names in {weights}")
    total = sum(w for _, w in weights)
    bucket = h60(
        F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))
    ) % F.lit(total)
    # chained whens evaluate in order, so ascending cumulative
    # thresholds partition [0, total) left to right
    expr = None
    cum = 0
    for name, w in weights:
        cum += w
        cond = bucket < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = expr.otherwise(F.lit(names[-1]))  # unreachable: bucket < total
    return df.select(
        "*", bucket.cast("int").alias("bucket"), expr.alias("split")
    )


def epoch_order(
    df: DataFrame,
    key_col: str = "doc_id",
    epoch: int = 0,
    n_shards: int = 64,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic shard-local shuffle for one training epoch: adds
    ``shard`` (stable across epochs — a key always feeds the same
    reader) and ``pos`` (the key's 0-based position within its shard
    for THIS epoch; re-drawn per epoch from an independent hash).

    This is the distributed form of how large training runs actually
    shuffle: a GLOBAL permutation per epoch is a full sort of the
    corpus per epoch — 10^12 rows through one total order, the
    single most expensive shuffle there is — while shard-local
    shuffling (shard by stable hash, permute within shard by an
    epoch-salted hash) is one hash partition + per-shard sort, gives
    each reader a stationary data subset (cache-friendly), and is the
    standard quality/cost trade (tf.data / webdataset practice).

    Plan shape: ONE hash shuffle on ``shard`` + per-shard sort
    (row_number ordered by the epoch hash, key ASC tiebreak for
    bit-determinism on the astronomically-unlikely collision). Shards
    bound the sort; pick ``n_shards`` >> executor count so AQE keeps
    partitions balanced.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if epoch < 0:
        raise ValueError(f"epoch must be >= 0, got {epoch}")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    shard = (h60(F.concat(F.lit("shard:"), key)) % F.lit(n_shards)).cast(
        "int"
    )
    draw = h60(
        F.concat(F.lit(salt), F.lit(str(int(epoch))), F.lit(":"), key)
    )
    staged = df.select(
        "*", shard.alias("shard"), draw.alias("_draw")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_draw").asc(), F.col(key_col).asc()
    )
    return staged.select(
        "*", (F.row_number().over(w) - 1).cast("long").alias("pos")
    ).drop("_draw")


# ---------------------------------------------------- dataset card


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, n_chars, mean_chars, n_exact_dups,
    dup_rate_e6, n_english, pct_en_e6) — the per-source DATASHEET row
    (Gebru et al., "Datasheets for Datasets"): the composition
    summary every released corpus ships — volume, token mass, exact-
    duplicate rate, language share — as ONE aggregation pass over the
    corpus, every figure an exact integer (e6 rates via integral
    division) so the card is reproducible to the digit across engines
    and re-runs.

    Pinned rules: tokens = lower/whitespace words; language = the
    pinned lang_id_col lexicon heuristic ('en' share reported — the
    one split every mixture recipe needs first); exact duplicates
    count WITHIN source against md5(text) (cross-source overlap is
    source_overlap's job); mean_chars = sum div n (floor).

    Scale shape: one projection + one source-keyed aggregate; the
    dup count is countDistinct on the digest inside the same
    aggregate (two-phase, map-side partial). No joins.
    """
    from .textstats import _words, lang_id_col

    t = F.col(text_col)
    per = docs.select(
        F.col(source_col).alias("source"),
        F.length(t).cast("long").alias("_chars"),
        F.size(_words(t)).cast("long").alias("_toks"),
        (lang_id_col(t) == "en").cast("long").alias("_en"),
        F.md5(t).alias("_digest"),
    )
    g = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_toks").cast("long").alias("n_tokens"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.countDistinct("_digest").cast("long").alias("_uniq"),
        F.sum("_en").cast("long").alias("n_english"),
    )
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.expr("n_chars div n_docs").alias("mean_chars"),
        (F.col("n_docs") - F.col("_uniq")).alias("n_exact_dups"),
        F.expr("(n_docs - _uniq) * 1000000 div n_docs").alias("dup_rate_e6"),
        "n_english",
        F.expr("n_english * 1000000 div n_docs").alias("pct_en_e6"),
    )


def shard_manifest(
    df: DataFrame,
    key_col: str = "doc_id",
    weight_col: str = "n_chars",
    target_weight: int = 16_000,
    n_buckets: int = 16,
    salt: str = "pack",
) -> DataFrame:
    """Size-balanced export-shard planning (the webdataset / parquet-
    file-size problem): assign every doc to an output shard of roughly
    ``target_weight`` total weight, deterministically, and emit the
    per-shard manifest a writer job consumes. The reference's export is
    one file per page (ProcessDirector.class.js flat rename) — at
    10^12 docs that's 10^12 files; training-data export needs bounded,
    near-uniform shards.

    Two-level layout, each level load-bearing at scale:

    * ``bucket`` = h60(salt:key) mod n_buckets — a stable hash
      partition, so packing is embarrassingly parallel and NO global
      order exists anywhere (a single running sum over 10^12 rows
      would be one partition; this is n_buckets independent ones).
    * within a bucket, docs order by key and next-fit pack: ``file`` =
      exclusive-running-weight DIV target_weight. Next-fit overshoots
      a shard by at most one doc — the standard bounded-staleness
      trade for a one-pass, window-only plan (no driver state, no
      iteration).

    Output manifest: (bucket, file, n_docs, total_weight, first_key,
    last_key) — enough for a writer to claim its shard and for an
    auditor to verify coverage. Plan shape: ONE hash shuffle on bucket
    (the window), then a groupBy(bucket, file) that reuses the same
    partitioning (bucket is a prefix → no second shuffle).
    """
    if target_weight < 1:
        raise ValueError(f"target_weight must be >= 1, got {target_weight}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql import Window

    bucket = (
        h60(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
        % F.lit(n_buckets)
    ).cast("int")
    staged = df.select(
        F.col(key_col).alias("_key"),
        F.col(weight_col).cast("long").alias("_w"),
        bucket.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_key").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("_w").over(w), F.lit(0)).cast("long")
    assigned = staged.withColumn("_cum", cum_excl).select(
        "_key",
        "_w",
        "bucket",
        F.expr(f"_cum div {int(target_weight)}").cast("long").alias("file"),
    )
    return assigned.groupBy("bucket", "file").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_w").cast("long").alias("total_weight"),
        F.min("_key").alias("first_key"),
        F.max("_key").alias("last_key"),
    )
