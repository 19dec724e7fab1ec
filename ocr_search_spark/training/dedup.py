"""Deduplication operators for web-scale corpus preparation.

Four families, all pure DataFrame plans (no driver-side loops, no RDDs):

* exact        — hash-groupBy on a content digest; one shuffle.
* n-gram Jaccard — shingle self-join; exact similarity on candidate pairs.
* MinHash+LSH  — signature → band buckets → bucket self-join; the scale
                 path for near-dup detection (shuffle ∝ corpus, not pairs²).
* SimHash      — 60-bit fingerprint; banded Hamming candidate pairs.

Scale notes (100 TB):
- every self-join goes through bucket keys whose cardinality we control
  (band hashes / shingle hashes), so AQE's skew-join splitting applies;
- ``max_df`` drops stop-shingles before any join (a shingle appearing in
  10^9 docs would otherwise create a quadratic bucket) — the standard
  web-dedup mitigation, applied set-orientedly;
- ``h60`` hashes are md5-based for cross-engine verification; swap
  ``hashing.h64_fast`` in production for cheaper shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import h60, h60_salted

# ------------------------------------------------------------------ exact


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: (id, canonical_id, is_dup) where
    canonical = min id of the digest group. One hash-aggregate + one
    broadcast-able join back; never materializes pairs."""
    d = docs.select(F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("digest"))
    canon = d.groupBy("digest").agg(F.min("id").alias("canonical_id"))
    return (
        d.join(canon, "digest")
        .select("id", "canonical_id", (F.col("id") != F.col("canonical_id")).alias("is_dup"))
    )


# ------------------------------------------------------------- shingling


def words_col(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def shingles_col(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles of a text column (array<string>)."""
    w = words_col(text)
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(w, i, k), " "),
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(id, shingle_hash) — exploded distinct shingles, 60-bit hashed.
    ``max_df`` removes stop-shingles (df > max_df) set-orientedly."""
    rows = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.col(text_col), k)).alias("shingle"),
    ).select("id", h60(F.col("shingle")).alias("sh"))
    if max_df is not None:
        dfreq = rows.groupBy("sh").agg(F.count("*").alias("df"))
        rows = rows.join(dfreq.where(F.col("df") <= max_df).select("sh"), "sh")
    return rows


# ------------------------------------------------------ n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over word-k-gram shingle sets for every candidate
    pair sharing ≥1 shingle: (id_a, id_b, jaccard), id_a < id_b.

    The reference has no dedup at all; this is the exact-similarity
    baseline the MinHash path approximates. Candidate generation is the
    shingle self-join — bounded by ``max_df`` at scale."""
    rows = shingle_rows(docs, text_col, id_col, k, max_df)
    sizes = rows.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = rows.select(F.col("id").alias("id_a"), "sh")
    b = rows.select(F.col("id").alias("id_b"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "nb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------- MinHash+LSH


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    max_df: int | None = None,
) -> DataFrame:
    """(id, sig: array<long>) — num_hashes column-wise minima in ONE
    aggregation pass (no row explosion by hash index: each shingle row
    carries all hash family members as columns, the groupBy computes all
    minima map-side)."""
    rows = docs.select(
        F.col(id_col).alias("id"),
        F.explode(shingles_col(F.col(text_col), k)).alias("shingle"),
    )
    if max_df is not None:
        sh = rows.select("id", h60(F.col("shingle")).alias("shh"), "shingle")
        dfreq = sh.groupBy("shh").agg(F.count("*").alias("df"))
        rows = sh.join(dfreq.where(F.col("df") <= max_df).select("shh"), "shh").select(
            "id", "shingle"
        )
    hashed = rows.select(
        "id",
        *[h60_salted(F.col("shingle"), i).alias(f"h{i}") for i in range(num_hashes)],
    )
    agg = hashed.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Banding: docs agreeing on ALL rows of ≥1 band become candidate
    pairs (id_a, id_b, n_bands). Bucket key = md5 of the band's slice, so
    the self-join key space is uniform; bucket skew (a band value shared
    by millions of near-identical docs) is handled by AQE skew-join."""
    n = bands * rows_per_band
    band_arr = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(b),
                    *[
                        F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        "id", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    a = banded.withColumnsRenamed({"id": "id_a"})
    b = banded.withColumnsRenamed({"id": "id_b"})
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """Signature-agreement fraction per candidate pair — the MinHash
    estimator of Jaccard: (id_a, id_b, est_jaccard)."""
    s = signatures
    return (
        pairs.join(s.withColumnsRenamed({"id": "id_a", "sig": "sig_a"}), "id_a")
        .join(s.withColumnsRenamed({"id": "id_b", "sig": "sig_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                ).cast("double")
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
    )


def minhash_upsert(
    base_sigs: DataFrame,
    changed_docs: DataFrame,
    deleted_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental view maintenance for the MinHash signature table:
    recompute signatures ONLY for the changed-docs batch, drop deleted
    ids, keep everything else — the result equals a full recompute over
    the updated corpus (the oracle), but the expensive shingle->hash
    pass runs over the batch alone.

    A delete that also appears in the batch wins (the doc is gone).
    Docs that fall below the shingle minimum (< k words) simply have no
    signature row, matching :func:`minhash_signatures`.

    Scale: base is touched by one anti-join on id (partition-prunable
    when base lives in a BucketedTable — only buckets containing doomed
    ids rewrite); batch cost is proportional to the diff, not the
    corpus. This is the index-maintenance twin of
    ``correlate.incremental_correlations``, applied to the dedup index.
    """
    fresh = minhash_signatures(
        changed_docs, text_col, id_col, k=k, num_hashes=num_hashes, max_df=max_df
    )
    doomed = (
        changed_docs.select(F.col(id_col).alias("id"))
        .unionByName(deleted_ids.select(F.col("id")))
        .distinct()
    )
    kept = base_sigs.join(doomed, "id", "left_anti")
    return kept.unionByName(fresh.join(deleted_ids, "id", "left_anti"))


def tfidf_doc_similarity(
    postings: DataFrame,
    max_df: int | None = None,
    threshold: float = 0.5,
    round_digits: int = 6,
) -> DataFrame:
    """Sparse TF-IDF cosine similarity between DOCUMENT pairs from the
    inverted index alone — the lexical near-dup detector that needs no
    embeddings: docs sharing no term never meet (the term-keyed
    self-join IS the sparsity), weights are integer-micros idf so dot
    products and norms are EXACT (DECIMAL sums, one final double
    division, pinned rounding).

    ``max_df`` is the same plan-side hot-key guard as the correlation
    and shingle paths: a term in df docs contributes df² join rows, so
    an unguarded ubiquitous term is quadratic — drop terms with
    df > max_df BEFORE the join (they carry ~zero idf anyway).

    Returns (id_a, id_b, cos) for pairs with rounded cos >= threshold.
    Scale: shuffle keyed by term (bounded by the guard), then one
    (id_a, id_b) aggregate; norms broadcast back onto the pair rows.
    """
    dfreq = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("_df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("_df") <= max_df)
    ndocs = postings.select(F.countDistinct("doc_id").alias("_n"))
    weights = dfreq.crossJoin(F.broadcast(ndocs)).select(
        "term",
        F.floor(
            F.lit(1_000_000.0) * F.log(F.col("_n").cast("double") / F.col("_df"))
        )
        .cast("long")
        .alias("idf_micros"),
    )
    # w feeds the norms aggregate AND both self-join sides; Catalyst does
    # not dedupe common subplans, so pin it once.
    w = (
        postings.join(weights, "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf").cast("decimal(19,0)")
                * F.col("idf_micros").cast("decimal(19,0)")
            )
            .cast("decimal(19,0)")
            .alias("w"),
        )
        .cache()
    )
    norms = w.groupBy("doc_id").agg(
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,0)")).alias("sq")
    )
    a = w.select(
        F.col("doc_id").alias("id_a"), "term", F.col("w").alias("wa")
    )
    b = w.select(
        F.col("doc_id").alias("id_b"), "term", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum((F.col("wa") * F.col("wb")).cast("decimal(38,0)")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("sq").alias("sqa"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("sq").alias("sqb"))
    cos = F.round(
        F.col("dot").cast("double")
        / (F.sqrt(F.col("sqa").cast("double")) * F.sqrt(F.col("sqb").cast("double"))),
        round_digits,
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .where(F.col("cos") >= F.lit(threshold))
    )


# ---------------------------------------------------- decontamination


def contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Train/eval decontamination: flag training docs sharing ≥
    ``min_hits`` word-k-gram shingles with the eval/benchmark set —
    (id, n_hits, contaminated) for EVERY training doc (0/false when
    clean). The GPT-3/PaLM-style leakage check, set-oriented: eval
    shingles are deduplicated once and joined against training shingle
    rows; cost ∝ corpus shingles, never pairs. At scale the eval side is
    tiny (benchmarks ≪ corpus) — broadcast it; ``max_df`` drops
    stop-shingles that would flag everything."""
    tr = shingle_rows(train, text_col, id_col, k, max_df)
    ev = shingle_rows(eval_docs, text_col, id_col, k).select("sh").distinct()
    hits = tr.join(F.broadcast(ev), "sh").groupBy("id").agg(
        F.count("*").alias("_hits")
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def shingle_novelty(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-eval-doc NOVELTY against the training corpus: (id,
    n_shingles, n_novel, novelty_e6) for every eval doc, where
    novelty_e6 = 1e6·(shingles NOT present anywhere in train) / own
    shingles (exact integer div; 0 for shingle-less docs).

    :func:`contamination` answers "which TRAINING docs leak the eval
    set" (a boolean per training doc); this is the complementary
    memorization-risk audit — "how much of each EVAL doc is already in
    the training data". An eval doc at novelty ≈ 0 measures recall of
    training text, not capability; held-out splits are routinely
    audited this way before a benchmark number is trusted.

    Shingles are the 60-bit-hashed word-k-grams of :func:`shingle_rows`
    (per-doc distinct pre-hash; the oracle replays the same hash, so
    collision behavior is bit-identical). Scale shape: the train
    shingle set is deduplicated then equi-joined — shuffle keyed by
    shingle hash with partial aggregation, cost ∝ corpus shingles,
    never pairs; unlike contamination's broadcast-eval shape, BOTH
    sides here stay distributed (the train side is the big one)."""
    tr = shingle_rows(train, text_col, id_col, k).select("sh").distinct()
    ev = shingle_rows(eval_docs, text_col, id_col, k)
    per = (
        ev.join(tr.withColumn("_seen", F.lit(1)), "sh", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("_novel"),
        )
    )
    return (
        eval_docs.select(F.col(id_col).alias("id"))
        .join(per, "id", "left")
        .select(
            "id",
            F.coalesce("_n", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("_n", F.lit(0)) > 0,
                F.expr("_novel * 1000000 div _n"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("novelty_e6"),
        )
    )


# ------------------------------------------------- connected components


def connected_components(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Transitive near-duplicate CLUSTERS from candidate pairs:
    (id, cluster_id) with cluster_id = min id reachable in the pair
    graph; isolated docs are their own cluster. This is what a dedup
    pipeline actually keeps — "retain one doc per cluster" needs the
    transitive closure, not raw pairs (A~B, B~C ⇒ {A,B,C} even when A~C
    never became a candidate).

    Algorithm: min-label propagation — comp'(v) = min(comp(v),
    min_{u∈N(v)} comp(u)) until fixpoint. Deterministic (unique
    fixpoint regardless of execution order), converges in O(diameter)
    iterations ≤ O(log n) for the short chains dedup graphs exhibit;
    each iteration is one join + one aggregate, labels are cached and
    materialized by the convergence-check action so lineage stays flat
    (the kmeans plan-growth lesson). Driver sees one change-count scalar
    per iteration, never data."""
    # Cache the edge list: every iteration joins against it, and without
    # the cache each iteration would RE-DERIVE the candidate-pair lineage
    # (an LSH/shingle self-join — the expensive part) from scratch.
    # Measured at sf0.1: 29s → ~8s for the dedup_clusters query.
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .cache()
    )
    # localCheckpoint (not cache): caching keeps the LOGICAL plan, which
    # deepens every iteration and makes Catalyst analysis cost grow
    # superlinearly on long chains (a 16-node chain blew past minutes);
    # the eager checkpoint truncates lineage so each iteration stays O(1)
    labels = nodes.select(F.col("id"), F.col("id").alias("comp")).localCheckpoint()
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnsRenamed({"id": "dst", "comp": "ncomp"}), "dst")
            .groupBy("src")
            .agg(F.min("ncomp").alias("nmin"))
            .withColumnsRenamed({"src": "id"})
        )
        new_labels = (
            labels.join(neigh, "id", "left")
            .select("id", F.least("comp", F.coalesce("nmin", "comp")).alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnsRenamed({"comp": "ncomp"})
            .join(labels, "id")
            .where(F.col("ncomp") != F.col("comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()  # the cached LSH/shingle self-join — don't leak it
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds max_iter); raise max_iter — a "
            "silent non-fixpoint would return WRONG cluster labels"
        )
    return labels.select("id", F.col("comp").alias("cluster_id"))


def connected_components_jump(
    nodes: DataFrame, pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Pointer-jumping variant of :func:`connected_components`: each
    iteration does the neighbor-min propagation AND a pointer jump
    (comp(v) ← min(comp(v), comp(comp(v)))), so labels race down
    chains exponentially — O(log diameter) iterations instead of
    O(diameter). Same unique fixpoint (min reachable id), same
    convergence-or-raise contract; the jump join keys on the label
    itself, so its cost is one extra hash join per iteration —
    worthwhile exactly when components are long chains (pathological
    near-dup corpora: shingled paginated archives, OCR page runs),
    where the propagation variant would need max_iter ≈ diameter."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .cache()
    )
    labels = nodes.select(F.col("id"), F.col("id").alias("comp")).localCheckpoint()
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels.withColumnsRenamed({"id": "dst", "comp": "ncomp"}), "dst")
            .groupBy("src")
            .agg(F.min("ncomp").alias("nmin"))
            .withColumnsRenamed({"src": "id"})
        )
        half = labels.join(neigh, "id", "left").select(
            "id", F.least("comp", F.coalesce("nmin", "comp")).alias("comp")
        )
        # jump through the CURRENT labels: comp(comp(v))
        hop = labels.select(
            F.col("id").alias("comp"), F.col("comp").alias("jcomp")
        )
        new_labels = (
            half.join(hop, "comp", "left")
            .select(
                "id",
                F.least("comp", F.coalesce("jcomp", "comp")).alias("comp"),
            )
            .localCheckpoint()  # truncate lineage — see propagation variant
        )
        changed = (
            new_labels.withColumnsRenamed({"comp": "ncomp"})
            .join(labels, "id")
            .where(F.col("ncomp") != F.col("comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components_jump did not converge in {max_iter} "
            "iterations; raise max_iter — a silent non-fixpoint would "
            "return WRONG cluster labels"
        )
    return labels.select("id", F.col("comp").alias("cluster_id"))


# -------------------------------------------------------------- SimHash

SIMHASH_BITS = 60  # stay positive in int64 on both engines


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(id, simhash) — 60-bit SimHash over tf-weighted word hashes.

    One explode to (id, word-hash, tf), then a single groupBy computing
    all ``bits`` signed sums as aggregate columns (map-side combinable),
    then the fingerprint is folded columnar — no per-bit row blowup."""
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(words_col(F.col(text_col))).alias("w")
    )
    tf = toks.groupBy("id", "w").agg(F.count("*").alias("tf"))
    hashed = tf.select("id", h60(F.col("w")).alias("h"), "tf")
    sums = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    fp = None
    for j in range(bits):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << j).cast("long")
        fp = bit if fp is None else fp + bit
    return sums.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by banded Hamming search: split the fingerprint
    into ``chunks`` bit-ranges; any pair within ``max_hamming`` (< chunks)
    must agree exactly on ≥1 chunk (pigeonhole), so the self-join runs on
    chunk values, never all-pairs. Output (id_a, id_b, hamming).

    The pigeonhole recall guarantee REQUIRES ``max_hamming < chunks`` and
    ``chunks`` dividing ``bits`` (otherwise trailing bits would escape
    every band); both are enforced, never silently degraded."""
    if max_hamming >= chunks:
        raise ValueError(
            f"pigeonhole bound violated: max_hamming={max_hamming} requires "
            f"chunks > max_hamming (got chunks={chunks}); pairs differing in "
            f"{chunks}..{max_hamming} bits could share no chunk and be missed"
        )
    if bits % chunks != 0:
        raise ValueError(
            f"chunks={chunks} must divide bits={bits}: the top {bits % chunks} "
            "bits would otherwise belong to no band"
        )
    per = bits // chunks
    mask = (1 << per) - 1
    chunk_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), c * per).bitwiseAND(F.lit(mask)).cast("long")
            for c in range(chunks)
        ]
    )
    banded = fingerprints.select(
        F.col("id"), F.col("simhash"), F.posexplode(chunk_arr).alias("c", "chunk")
    )
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("f_a"), "c", "chunk"
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("f_b"), "c", "chunk"
    )
    cands = (
        a.join(b, ["c", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "f_a", "f_b")
        .distinct()
    )
    ham = F.bit_count(F.col("f_a").bitwiseXOR(F.col("f_b"))).cast("long")
    return cands.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment c(a ⊂ b) = |Sa ∩ Sb| / |Sa|
    — the quote/excerpt/boilerplate-wrapper detector Jaccard misses (a
    short doc fully quoted inside a long one has high containment but low
    Jaccard, because the union is dominated by the long doc). Returns
    (id_small, id_big, containment) for ordered pairs with
    containment ≥ threshold and id_small ≠ id_big; both directions are
    evaluated (a may be contained in b while b is not in a).

    Same candidate machinery as :func:`ngram_jaccard_pairs` — shingle
    self-join bounded by ``max_df`` — so the 100 TB guardrails carry
    over unchanged."""
    rows = shingle_rows(docs, text_col, id_col, k, max_df)
    sizes = rows.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = rows.select(F.col("id").alias("id_small"), "sh")
    b = rows.select(F.col("id").alias("id_big"), "sh")
    common = (
        a.join(b, "sh")
        .where(F.col("id_small") != F.col("id_big"))
        .groupBy("id_small", "id_big")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(
            sizes.withColumnsRenamed({"id": "id_small", "n_sh": "ns"}), "id_small"
        )
        .select(
            "id_small",
            "id_big",
            (F.col("common").cast("double") / F.col("ns")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ------------------------------------------------- passage-level dedup


def passage_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """(id, s, h) — EVERY positional k-word window of every document
    (0-based start ``s``, 60-bit hash ``h`` of the space-joined gram).
    Unlike :func:`shingle_rows` these are NOT distinct-per-doc: position
    identity is the point — it is what lets the caller map duplicated
    grams back onto character-stream coverage. One narrow projection +
    explode; no joins, no shuffle."""
    w = words_col(F.col(text_col))
    n = F.size(w)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.cast("int").alias("s"),
                h60(F.array_join(F.slice(w, i + 1, k), " ")).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s:int,h:bigint>>"))
    return docs.select(
        F.col(id_col).alias("id"), F.explode(grams).alias("w")
    ).select("id", F.col("w.s").alias("s"), F.col("w.h").alias("h"))


def duplicated_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Corpus inventory of duplicated passages: (h, n_docs, n_occ) for
    every k-gram appearing in ≥ ``min_docs`` DISTINCT documents (the
    cross-document notion of Lee et al.'s ExactSubstr dedup, word-grain;
    within-doc repetition alone does not qualify — that signal lives in
    :func:`~ocr_search_spark.training.textstats.repetition_signals`).

    Scale shape: one hash-aggregate over the exploded windows — shuffle
    ∝ corpus token count, never pairs². The aggregate is partial
    (map-side combine) and the group key is a 60-bit hash, so AQE skew
    splitting applies to boilerplate mega-grams."""
    win = passage_windows(docs, text_col, id_col, k)
    return (
        win.groupBy("h")
        .agg(
            F.countDistinct("id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _dup_islands(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    min_docs: int,
) -> DataFrame:
    """Merged per-document coverage islands (id, s, e) of the
    cross-document duplicated k-gram windows: windows [s, s+k-1] that
    survive the semi-join against :func:`duplicated_passages` are
    union-merged with one gaps-and-islands window pass (an island starts
    where s exceeds the running max end of every earlier interval).
    Shared by the coverage *signal* (:func:`passage_dup_stats`) and the
    removal *transform* (:func:`remove_duplicated_passages`)."""
    from pyspark.sql import Window as W

    win = passage_windows(docs, text_col, id_col, k)
    dup = duplicated_passages(docs, text_col, id_col, k, min_docs).select("h")
    iv = win.join(dup, "h").select(
        "id", "s", (F.col("s") + F.lit(k - 1)).alias("e")
    )
    byid = W.partitionBy("id").orderBy("s", "e")
    run_prev = (
        F.max("e").over(byid.rowsBetween(W.unboundedPreceding, -1))
    )
    marked = iv.withColumn(
        "_new", F.when(F.col("s") > F.coalesce(run_prev, F.lit(-1)), 1).otherwise(0)
    ).withColumn("_isl", F.sum("_new").over(byid))
    return marked.groupBy("id", "_isl").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    ).drop("_isl")


def passage_dup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-passage coverage: (id, n_tokens,
    dup_tokens, dup_frac_e6) where ``dup_tokens`` counts token positions
    covered by ≥1 cross-document duplicated k-gram window and
    ``dup_frac_e6`` = floor(dup_tokens · 10⁶ / n_tokens) (exact integer
    — no float rounding to diverge between engines). This is the
    standard passage-dedup *filter* signal: drop or trim documents whose
    coverage exceeds a policy threshold.

    Coverage is exact interval-union arithmetic, NOT a k× position
    explosion: duplicated windows [s, s+k-1] are merged per document
    with one gaps-and-islands window pass (island starts where s exceeds
    the running max end of all earlier intervals), then summed as
    max(e)−min(s)+1 per island. Cost: one per-doc sort of the
    *duplicated* windows only — already filtered by the semi-join
    against the corpus-level duplicate inventory."""
    covered = (
        _dup_islands(docs, text_col, id_col, k, min_docs)
        .groupBy("id")
        .agg(F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"))
    )
    totals = docs.select(
        F.col(id_col).alias("id"),
        F.size(words_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    return (
        totals.join(covered, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(F.col("n_tokens") > 0,
                   F.floor(
                       F.coalesce(F.col("dup_tokens"), F.lit(0)) * F.lit(1_000_000)
                       / F.col("n_tokens")
                   ))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_frac_e6"),
        )
    )


def remove_duplicated_passages(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style REMOVAL stage (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", word grain): emit each
    document with every token position covered by a cross-document
    duplicated k-gram window cut out. Returns (id, n_tokens, dup_tokens,
    kept_text) — kept_text is the space-join of the surviving lowercased
    tokens in original order (the same token stream the window inventory
    hashed, so coverage and removal can never disagree).

    Scale shape: the corpus-level inventory and the per-doc island merge
    are :func:`_dup_islands` (shuffle ∝ duplicated-window count, never
    pairs²); the islands then collapse to ONE bounded array row per
    document (islands are disjoint, ≤ n_tokens/k per doc), and the
    actual removal is a zero-shuffle array transform on the joined row:
    ``filter(tokens, (w, i) -> NOT exists(islands, v -> v.s ≤ i ≤ v.e))``
    — no k× position explosion, no per-token join. Reference scope:
    the reference engine has no dedup at all (SURVEY §2 gap list); this
    is task-list "Deduplication" as a *transform*, complementing the
    filter signal in :func:`passage_dup_stats`."""
    islands = (
        _dup_islands(docs, text_col, id_col, k, min_docs)
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("s", "e"))).alias("_iv"))
    )
    base = docs.select(
        F.col(id_col).alias("id"), words_col(F.col(text_col)).alias("_w")
    )
    joined = base.join(islands, "id", "left").withColumn(
        "_iv",
        F.coalesce(F.col("_iv"), F.array().cast("array<struct<s:int,e:int>>")),
    )
    kept = F.filter(
        "_w",
        lambda w, i: ~F.exists(
            "_iv", lambda v: (v["s"] <= i) & (i <= v["e"])
        ),
    )
    dup_tokens = F.aggregate(
        "_iv",
        F.lit(0).cast("long"),
        lambda acc, v: acc + (v["e"] - v["s"] + 1).cast("long"),
    )
    return joined.select(
        "id",
        F.size("_w").cast("long").alias("n_tokens"),
        dup_tokens.alias("dup_tokens"),
        F.array_join(kept, " ").alias("kept_text"),
    )


def keep_best_per_cluster(
    clusters: DataFrame,
    scores: DataFrame,
    score_col: str = "score",
) -> DataFrame:
    """The dedup *policy* step: given transitive clusters (id,
    cluster_id) from :func:`connected_components` and any per-doc score
    (id, score), elect one representative per cluster — highest score,
    ties on lowest id — and flag every member.

    Output: (id, cluster_id, kept_id, keep). A pipeline keeps
    ``keep = true`` rows; the kept_id witness makes the drop auditable
    (which doc shadowed this one?), mirroring semantic_dedup's kept_by.

    Scale: one id-keyed join + one cluster-keyed rn=1 window
    (WindowGroupLimit — per-task top-1 state, no cluster
    materialization) + one cluster-keyed broadcast-able join back.
    Cluster count ≤ doc count, so nothing here exceeds the corpus's own
    key cardinality."""
    from pyspark.sql import Window as W

    j = clusters.join(scores, "id")
    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(F.desc(score_col), F.asc("id"))
    )
    kept = (
        j.withColumn("_rn", rn)
        .where(F.col("_rn") == 1)
        .select("cluster_id", F.col("id").alias("kept_id"))
    )
    return clusters.join(kept, "cluster_id").select(
        "id",
        "cluster_id",
        "kept_id",
        (F.col("id") == F.col("kept_id")).alias("keep"),
    )


def lsh_params(
    threshold: float, n_perm: int, max_bands: int = None
) -> tuple[int, int]:
    """Choose (bands, rows_per_band) for minhash LSH at a target Jaccard
    ``threshold`` — the MMDS S-curve calibration (Leskovec/Rajaraman/
    Ullman ch.3, public): candidate-pair probability for similarity s is
    ``1 − (1 − s^r)^b``; pick the factorization of ``n_perm`` whose
    curve best separates below/above the threshold, by minimizing

        fp + fn = ∫₀ᵗ P(s) ds + ∫ₜ¹ (1 − P(s)) ds

    evaluated on a fixed 1000-point grid (deterministic — no RNG, no
    optimizer). Returns (bands, rows_per_band) with bands·rows ≤ n_perm
    using the largest usable prefix of the signature.

    This is driver-side arithmetic over a handful of factorizations —
    use it once when configuring minhash_signatures/lsh_candidate_pairs
    for a corpus's dedup threshold instead of hand-picking 4×4.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if n_perm < 2:
        raise ValueError(f"n_perm must be >= 2, got {n_perm}")
    best = None
    for r in range(1, n_perm + 1):
        b = n_perm // r
        if b < 1 or (max_bands is not None and b > max_bands):
            continue
        # fp+fn on the grid, exact same arithmetic for every candidate
        cost = 0.0
        for i in range(1000):
            s = (i + 0.5) / 1000.0
            p = 1.0 - (1.0 - s**r) ** b
            cost += (p if s < threshold else 1.0 - p) / 1000.0
        key = (cost, -b * r, r)  # prefer lower cost, fuller signature use
        if best is None or key < best[0]:
            best = (key, (b, r))
    return best[1]


def dedup_corpus(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 16,
    k: int = 3,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The end-to-end near-dup dedup PIPELINE as one call — the
    composition every stage of this module exists for, wired the way a
    production run would chain them:

      minhash signatures (max_df stop-shingle guard)
        → LSH candidate pairs at (bands, rows) CALIBRATED for
          ``threshold`` by :func:`lsh_params`
        → signature-agreement filter (est_jaccard ≥ threshold)
        → transitive clusters (pointer-jumping connected components)
        → one representative per cluster (longest text, ties lowest id
          — :func:`keep_best_per_cluster`)

    Returns (decisions, mapping): ``decisions`` = every doc with
    (id, cluster_id, kept_id, keep); ``mapping`` = the docs frame
    filtered to keep=true rows (the deduplicated corpus). Both lazy.

    Every stage is individually oracle-gated; this wrapper adds no new
    algebra — it pins the composition order and the calibrated banding
    so the CLI and tests exercise the same pipeline users run.
    """
    bands, rows_per_band = lsh_params(threshold, num_hashes)
    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col, k=k,
        num_hashes=num_hashes, max_df=max_df,
    ).cache()
    cand = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    est = minhash_jaccard_estimate(sigs, cand.select("id_a", "id_b"), num_hashes)
    pairs = est.where(F.col("est_jaccard") >= float(threshold)).select(
        "id_a", "id_b"
    )
    nodes = docs.select(F.col(id_col).alias("id"))
    clusters = connected_components_jump(nodes, pairs)
    scores = docs.select(
        F.col(id_col).alias("id"), F.length(text_col).cast("long").alias("score")
    )
    decisions = keep_best_per_cluster(clusters, scores)
    kept = docs.join(
        decisions.where("keep").select(F.col("id").alias(id_col)), id_col
    )
    return decisions, kept


# ------------------------------------------------------ sentence dedup (C4)
def dedup_sentences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
) -> DataFrame:
    """C4-style cross-document repeated-sentence removal (Raffel et al.
    2020 used three-sentence spans; the unit here is the pinned
    sentence of textstats.sentence_split_col): every duplicate
    occurrence of a sentence is dropped EXCEPT the canonical first —
    min (doc_id, sent_idx) over the whole corpus — and surviving
    sentences are reassembled in original order (E6 discipline).
    Sentences shorter than ``min_words`` words are exempt ("Yes." in a
    thousand docs is not boilerplate worth deleting).

    Returns (id, text, n_dropped).

    Scale shape: ONE corpus-wide shuffle keyed by the normalized
    sentence (window rank — partition cardinality = occurrences of one
    sentence, the quantity being deduped), then one doc-keyed
    reassembly agg. The hot-key risk is a sentence in 10^9 docs — but
    rank only needs each occurrence once, there is no pair join, so the
    cost is linear in occurrences; WindowGroupLimit prunes rank > 1
    early. Contrast dup_passages (k-gram evidence, reporting) — this
    operator REWRITES the corpus.
    """
    from pyspark.sql import Window as W

    from .textstats import sentences as _sentences

    s = _sentences(docs, text_col=text_col, id_col=id_col)
    norm = F.lower(F.trim(F.col("sentence")))
    nw = F.size(F.filter(F.split(norm, r"\s+"), lambda w: w != ""))
    s = s.withColumn("_norm", norm).withColumn("_exempt", nw < min_words)
    w = W.partitionBy("_norm").orderBy("id", "sent_idx")
    ranked = s.withColumn("_rn", F.row_number().over(w))
    keep = F.col("_exempt") | (F.col("_rn") == 1)
    kept = F.when(keep, F.struct("sent_idx", "sentence"))
    agg = (
        ranked.groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda x: x["sentence"]
                ),
                " ",
            ).alias(text_col),
            F.sum((~keep).cast("int")).cast("long").alias("n_dropped"),
        )
    )
    # a corpus REWRITE must keep every doc: empty/whitespace-only docs
    # yield zero sentence rows and would vanish from the groupBy —
    # left-join the result back onto the full id set instead
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return ids.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias("n_dropped"),
    )


# ------------------------------------------------- sorted neighborhood


def global_sort_rank(
    df: DataFrame, order_cols: list[str], n_parts: int | None = None
) -> DataFrame:
    """Scalable global 1-based rank over a TOTAL order (``order_cols``
    must include a unique tiebreaker): range-partition on the order
    columns, rank within each partition, add broadcast partition
    offsets. Two narrow passes; the driver sees only per-partition
    COUNTS (one row per partition), never data — the
    single-partition-window global sort this replaces is the classic
    100 TB bottleneck. The rank is independent of where the range
    boundaries land, so the sampling inside repartitionByRange cannot
    perturb the result."""
    from pyspark.sql import Window as W

    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    part = df.repartitionByRange(n_parts, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=False)  # pin: counts + ranks must
    # see the SAME partitioning (a re-run re-samples range bounds)
    w = W.partitionBy("_pid").orderBy(*order_cols)
    counts = [
        (r["_pid"], r["c"])
        for r in part.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    ]
    offsets, acc = {}, 0
    for pid, c in sorted(counts):
        offsets[pid] = acc
        acc += c
    off_df = part.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()], "_pid int, _off long"
    )
    return (
        part.withColumn("_lrank", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn("rank", (F.col("_lrank") + F.col("_off")).cast("long"))
        .drop("_pid", "_lrank", "_off")
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    key_len: int = 24,
    window: int = 5,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95):
    sort the corpus by a blocking key (here the first ``key_len`` chars
    of the lowercased text, id-tiebroken), take as candidates only the
    pairs within ``window`` positions of each other, then score those
    candidates with EXACT word-k-gram Jaccard and keep >= threshold.
    Output (id_a, id_b, jaccard) with id_a preceding id_b in sort
    order.

    Complements the LSH family: candidate volume is corpus_size *
    window BY CONSTRUCTION — no shingle df skew can blow it up (the
    hot-shingle failure mode ngram_jaccard_pairs needs ``max_df`` for),
    at the cost of missing near-dups whose blocking keys diverge (a
    different-prefix edit). The global sort is the scalable two-pass
    rank above; the window join is ``window`` equi-joins on rank, never
    a range cross-join."""
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.substring(F.lower(F.col(text_col)), 1, key_len).alias("bkey"),
    )
    ranked = global_sort_rank(base, ["bkey", "id"]).select("id", "rank")
    cand = (
        ranked.select(F.col("id").alias("id_a"), F.col("rank").alias("ra"))
        .withColumn("d", F.explode(F.sequence(F.lit(1), F.lit(window))))
        .select("id_a", (F.col("ra") + F.col("d")).alias("rb"))
    )
    pairs = cand.join(
        ranked.select(F.col("id").alias("id_b"), F.col("rank").alias("rb")),
        "rb",
    ).select("id_a", "id_b")
    rows = shingle_rows(docs, text_col, id_col, k)
    sizes = rows.groupBy("id").agg(F.count("*").alias("n_sh"))
    # two-key equi-joins: (id_a) then (id_b, sh) — the shingle match is
    # a hash-join key, never a post-join filter over the set product
    common = (
        pairs.join(rows.withColumnsRenamed({"id": "id_a"}), "id_a")
        .join(rows.withColumnsRenamed({"id": "id_b"}), ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "nb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------- per-domain templates


def domain_template_sentences(
    docs: DataFrame,
    min_share_e6: int = 500_000,
    min_docs: int = 3,
    min_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """(domain, sentence, df_docs, domain_docs, share_e6) — per-domain
    boilerplate TEMPLATE detection: the normalized sentences that
    appear in at least ``min_share_e6``/1e6 of a domain's documents
    (domains with fewer than ``min_docs`` docs never report — one page
    repeated twice is not a template signal).

    This is the site-template primitive behind CC-Net-style curation:
    nav bars, cookie banners and footer legalese repeat across one
    SITE, not across the whole web, so global sentence dedup
    (dedup_sentences — which keeps the canonical FIRST occurrence and
    therefore keeps one copy of the boilerplate) cannot express "this
    sentence is furniture on this domain, remove every copy". Pinned
    rules, shared with dedup_sentences so the two compose:

    * normalized sentence = lower(trim(s)) over the pinned
      sentence_split_col units;
    * sentences under ``min_words`` words are exempt ("Yes." half a
      domain is not furniture);
    * df_docs counts DISTINCT documents containing the sentence (a doc
      repeating its own footer 10x counts once);
    * ``share_e6 = df_docs * 1e6 div domain_docs`` (exact BIGINT).

    Scale shape: explode is shuffle-free; the distinct and the
    (domain, sentence) count are hash aggregates keyed by the sentence
    (linear in occurrences — no pair join, so a footer on 10^9 pages
    costs 10^9 agg rows, never 10^18 pairs); domain doc-counts is one
    tiny agg; the final join is domain-keyed on rows already reduced
    to candidate sentences. An AQE skew split handles the
    mega-domain/mega-sentence key.

    Reference parity: none (the reference OCRs curated folders, not
    crawled sites); this extends the curation tier next to
    dedup_sentences (training/dedup.py) the way the north rule's
    "DOM/boilerplate heuristic stripping" demands at corpus grain.
    """
    if not (0 < min_share_e6 <= 1_000_000):
        raise ValueError(f"min_share_e6 must be in (0, 1e6], got {min_share_e6}")
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    from .textstats import sentence_split_col

    norm = F.lower(F.trim(F.col("_sent")))
    nw = F.size(
        F.filter(F.split(F.col("sentence"), r"\s+"), lambda w: w != "")
    )
    occ = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.col(id_col).alias("id"),
            F.explode(sentence_split_col(F.col(text_col))).alias("_sent"),
        )
        .select("domain", "id", norm.alias("sentence"))
        .where(nw >= F.lit(int(min_words)))
        .distinct()
    )
    df_counts = occ.groupBy("domain", "sentence").agg(
        F.count("*").cast("long").alias("df_docs")
    )
    dom_counts = (
        docs.select(F.col(domain_col).alias("domain"), F.col(id_col).alias("id"))
        .distinct()
        .groupBy("domain")
        .agg(F.count("*").cast("long").alias("domain_docs"))
        .where(F.col("domain_docs") >= F.lit(int(min_docs)))
    )
    joined = df_counts.join(dom_counts, "domain")
    return joined.select(
        "domain",
        "sentence",
        "df_docs",
        "domain_docs",
        F.expr("(df_docs * 1000000) div domain_docs")
        .cast("long")
        .alias("share_e6"),
    ).where(F.col("share_e6") >= F.lit(int(min_share_e6)))


def strip_domain_templates(
    docs: DataFrame,
    templates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """(id, text, n_dropped) — rewrite the corpus with every
    occurrence of a (domain, sentence) template removed; non-template
    sentences reassemble in original order (the dedup_sentences
    reassembly contract, including keep-empty-docs). ``templates`` is
    domain_template_sentences' output (only (domain, sentence) is
    read). One sentence-keyed left_anti join against the template
    table + one doc-keyed reassembly agg."""
    from pyspark.sql import Window as W  # noqa: F401 — parity with sibling

    from .textstats import sentences as _sentences

    s = _sentences(docs, text_col=text_col, id_col=id_col).join(
        docs.select(
            F.col(id_col).alias("id"), F.col(domain_col).alias("domain")
        ),
        "id",
    )
    s = s.withColumn("_norm", F.lower(F.trim(F.col("sentence"))))
    tpl = templates.select(
        "domain", F.col("sentence").alias("_norm")
    ).distinct()
    kept = s.join(tpl, ["domain", "_norm"], "left_anti")
    dropped = s.join(tpl, ["domain", "_norm"], "left_semi")
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sent_idx", "sentence"))),
                lambda x: x["sentence"],
            ),
            " ",
        ).alias(text_col)
    )
    drops = dropped.groupBy("id").agg(
        F.count("*").cast("long").alias("n_dropped")
    )
    ids = docs.select(F.col(id_col).alias("id")).distinct()
    return (
        ids.join(agg, "id", "left")
        .join(drops, "id", "left")
        .select(
            "id",
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias(
                "n_dropped"
            ),
        )
    )


# ------------------------------------------------- LSH parameter tuning


def lsh_pow_e6(base: str, n: int, divop: str = "div") -> str:
    """SQL text for an EXACT e6 fixed-point power: ``(base/1e6)^n``
    scaled by 1e6, as ``n-1`` chained ``x*base divop 1e6`` integer
    steps (every intermediate ≤ 1e12 — no overflow, no float). The
    same generator serves both engines: ``divop='div'`` for Spark SQL,
    ``divop='//'`` for DuckDB, so the replay is textually parallel."""
    if n < 1:
        raise ValueError(f"exponent must be >= 1, got {n}")
    acc = base
    for _ in range(n - 1):
        acc = f"(({acc} * {base}) {divop} 1000000)"
    return acc


def lsh_collision_e6(sim: str, bands: int, rpb: int, divop: str = "div") -> str:
    """SQL text for the banded-MinHash collision probability
    ``1 − (1 − s^r)^b`` in exact e6 fixed point (floor at every
    step — the pinned integer semantics both engines replay)."""
    sr = lsh_pow_e6(sim, rpb, divop)
    qb = lsh_pow_e6(f"(1000000 - {sr})", bands, divop)
    return f"(1000000 - {qb})"


def lsh_tuning(
    pairs: DataFrame,
    n_hashes: int,
    threshold_e6: int,
    sim_col: str = "sim_e6",
) -> DataFrame:
    """(bands, rpb, n_pairs, n_pos, exp_cand_e6, fp_e6, fn_e6,
    recall_e6) — the LSH parameter-planning table: for every (bands b,
    rows-per-band r) factorization of ``n_hashes``, evaluate the
    banded-MinHash S-curve ``p(s) = 1 − (1 − s^r)^b`` against a
    MEASURED pair-similarity sample and report the expected outcome of
    running :func:`lsh_candidate_pairs` at that setting:

    * ``exp_cand_e6``  = Σ p(sᵢ)            (expected candidate pairs, e6)
    * ``fp_e6``        = Σ_{s<t}  p(sᵢ)     (expected wasted verifications)
    * ``fn_e6``        = Σ_{s≥t}  1e6−p(sᵢ) (expected missed near-dups)
    * ``recall_e6``    = Σ_{s≥t} p(sᵢ) div n_pos   (NULL when no pair
      clears the threshold — the sample cannot estimate recall)

    This is the standard band/row trade (Mining of Massive Datasets
    §3.4) turned from a rule of thumb into an exact table over the
    corpus's OWN similarity distribution (a sample of
    ngram_jaccard_pairs / minhash_jaccard_estimate output — any frame
    with an e6 similarity column). All arithmetic is e6 fixed point
    with floor at every step (:func:`lsh_pow_e6`), so a SQL twin
    replays bit-for-bit; similarities are clamped into [0, 1e6] as the
    pinned domain rule.

    Scale shape: ONE pass over the pairs sample — per-config collision
    probabilities are pure projections (unrolled integer chains, whole
    stage codegen), all configs aggregate in a single scalar hash agg,
    and the result unpivots from that one row via ``stack``. The
    sample is dedup-diagnostic-sized, not corpus-sized; nothing here
    touches the corpus itself.
    """
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")
    if not 0 <= threshold_e6 <= 1_000_000:
        raise ValueError(
            f"threshold_e6 must be in [0, 1e6], got {threshold_e6}"
        )
    configs = [
        (b, n_hashes // b) for b in range(1, n_hashes + 1) if n_hashes % b == 0
    ]
    s = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(1_000_000).cast("long"), F.col(sim_col).cast("long")),
    )
    # two-step select: _p_i reference _s by NAME, so _s must exist as a
    # real column before the collision projections resolve
    proj = pairs.select(s.alias("_s")).select(
        "_s",
        *[
            F.expr(lsh_collision_e6("_s", b, r)).alias(f"_p_{i}")
            for i, (b, r) in enumerate(configs)
        ],
    )
    t = F.lit(int(threshold_e6)).cast("long")
    aggs = [
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("_s") >= t).cast("long")).alias("n_pos"),
    ]
    for i in range(len(configs)):
        p = F.col(f"_p_{i}")
        aggs += [
            F.sum(p).cast("long").alias(f"_cand_{i}"),
            F.sum(F.when(F.col("_s") < t, p).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"_fp_{i}"),
            F.sum(
                F.when(F.col("_s") >= t, F.lit(1_000_000) - p).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias(f"_fn_{i}"),
            F.sum(F.when(F.col("_s") >= t, p).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"_pos_{i}"),
        ]
    one = proj.agg(*aggs)
    stack_args = []
    for i, (b, r) in enumerate(configs):
        stack_args += [
            str(b),
            str(r),
            f"_cand_{i}",
            f"_fp_{i}",
            f"_fn_{i}",
            f"_pos_{i}",
        ]
    stacked = one.select(
        "n_pairs",
        "n_pos",
        F.expr(
            f"stack({len(configs)}, "
            + ", ".join(stack_args)
            + ") AS (bands, rpb, exp_cand_e6, fp_e6, fn_e6, _pos_p)"
        ),
    )
    return stacked.select(
        F.col("bands").cast("long").alias("bands"),
        F.col("rpb").cast("long").alias("rpb"),
        "n_pairs",
        "n_pos",
        "exp_cand_e6",
        "fp_e6",
        "fn_e6",
        F.when(
            F.col("n_pos") > 0, F.expr("_pos_p div n_pos")
        ).alias("recall_e6"),
    )


# ------------------------------------------------- cross-source overlap


def source_overlap(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = 3,
) -> DataFrame:
    """(src_a, src_b, n_a, n_b, n_common, jaccard_e6) — the pairwise
    content-overlap matrix between corpus SOURCES, measured on distinct
    word-k-gram shingle sets (the Pile/Dolma-style diagnostic: how much
    of source B is already inside source A — double-counted tokens in
    the mixture, and a leak channel if one source seeds eval sets).

    Pinned semantics: a source's shingle set is the UNION over its
    docs' distinct shingles (document frequency within the source is
    deliberately ignored — overlap is about coverage, not mass);
    ``jaccard_e6 = n_common * 1e6 div (n_a + n_b − n_common)`` exact;
    only ordered pairs ``src_a < src_b`` emit, and pairs with zero
    common shingles are reported too (the matrix is complete — absence
    of overlap is the interesting answer for decontamination planning).

    Scale shape: one explode + (source, shingle)-keyed distinct — the
    same cost as one shingling pass of the corpus; the shingle
    self-join fans out at most |sources|² rows PER SHINGLE (the source
    dimension is small by construction — this is the one self-join in
    the dedup family whose blowup is bounded by a dimension table, not
    by document frequency, so no max_df guard is needed); final
    aggregate is |sources|²-sized.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = (
        docs.select(
            F.col(source_col).alias("src"),
            F.explode(shingles_col(F.col(text_col), k)).alias("shingle"),
        )
        .select("src", h60(F.col("shingle")).alias("sh"))
        .distinct()
    )
    sizes = rows.groupBy("src").agg(F.count("*").cast("long").alias("n"))
    common = (
        rows.select(F.col("src").alias("src_a"), "sh")
        .join(rows.select(F.col("src").alias("src_b"), "sh"), "sh")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    grid = (
        sizes.select(F.col("src").alias("src_a"), F.col("n").alias("n_a"))
        .join(
            sizes.select(F.col("src").alias("src_b"), F.col("n").alias("n_b")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    return (
        grid.join(common, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias(
                "n_common"
            ),
        )
        .select(
            "*",
            F.expr(
                "n_common * 1000000 div (n_a + n_b - n_common)"
            ).alias("jaccard_e6"),
        )
    )


# ---------------------------------------------------- b-bit MinHash


def minhash_bbit_estimate(
    signatures: DataFrame,
    pairs: DataFrame,
    num_hashes: int,
    b: int = 4,
) -> DataFrame:
    """(id_a, id_b, matches, est_jaccard_e6) — b-bit MinHash (Li &
    König, WWW'10/CACM'11): store only the lowest ``b`` bits of each
    minhash and correct the resulting accidental collisions out of the
    estimate:

        match_e6 = matches · 1e6 div k
        c_e6     = 1e6 div 2^b              (collision floor)
        ĵ_e6     = max(0, (match_e6 − c_e6) · 1e6 div (1e6 − c_e6))

    At b=4 a 16-hash signature drops from 128 to 8 bytes — the
    shuffle-width lever for pair estimation over 10¹² docs, at the
    cost of variance the correction makes unbiased. All integer
    arithmetic (floor at each step, pinned), so the estimate is
    hash-exact cross-engine — unlike the raw minhash_jaccard_estimate
    whose /k float is merely round-stable.

    Scale shape: identical to minhash_jaccard_estimate — two
    signature joins onto the candidate pairs; the b-bit compare is an
    in-row zip fold.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if not 1 <= b <= 60:
        raise ValueError(f"b must be in [1, 60], got {b}")
    mod = 1 << b
    c_e6 = 1_000_000 // mod
    s = signatures
    j = pairs.select("id_a", "id_b").join(
        s.withColumnsRenamed({"id": "id_a", "sig": "sig_a"}), "id_a"
    ).join(s.withColumnsRenamed({"id": "id_b", "sig": "sig_b"}), "id_b")
    matches = F.size(
        F.filter(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: (x % mod) == (y % mod),
            ),
            lambda v: v,
        )
    ).cast("long")
    return j.select(
        "id_a",
        "id_b",
        matches.alias("matches"),
    ).select(
        "id_a",
        "id_b",
        "matches",
        F.greatest(
            F.lit(0).cast("long"),
            F.expr(
                f"((matches * 1000000 div {num_hashes}) - {c_e6}) "
                f"* 1000000 div {1_000_000 - c_e6}"
            ),
        ).alias("est_jaccard_e6"),
    )
