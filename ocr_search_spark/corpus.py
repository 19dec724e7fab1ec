"""Deterministic synthetic interleaved-document corpus, generated Spark-native.

BASELINE.json's input_hint table shape:
    doc_id: string,
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Everything is built from ``spark.range`` + columnar expressions seeded by
``xxhash64`` of stable values — no driver-side data, no ``rand()`` (which is
partition-dependent), so the corpus is bit-identical at any parallelism and
any scale. This is the property that lets the local[8] vs local[32] scaling
run use *identical input* (BASELINE.md scaling evidence) and lets tests
regenerate fixtures on the fly.

Doc identity mirrors the reference (PdfUtil.class.js:49-70): files of
``pages_per_file`` pages; ``doc_id = sha256(ori_file_path ∥ '-' ∥
lpad(page_idx))``.

Skew is pinned in (FIXTURES.md §1): ~1% of docs get ~40× the median span
count with media-heavy payloads — exercising the salting / size-bucketing
path (SURVEY §4.2.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textproc import CJK_DICT

# Pinned generator vocabulary: stopwords, inflected forms (lemmatizer food),
# punctuation-bearing tokens (punct→space food), plain terms.
GEN_VOCAB = [
    "the", "a", "and", "of", "to", "in", "is", "that", "for", "with",
    "table", "tables", "query", "queries", "index", "indexes", "scan",
    "scans", "merge", "merges", "merged", "merging", "join", "joins",
    "joined", "joining", "sort", "sorted", "sorting", "filter", "filters",
    "filtered", "partition", "partitions", "shuffle", "shuffles", "batch",
    "batches", "stream", "streams", "streaming", "vector", "vectors",
    "column", "columns", "row", "rows", "page", "pages", "term", "terms",
    "search", "searches", "searched", "searching", "engine", "engines",
    "spark", "data", "kernel", "kernels", "classes", "glasses", "children",
    "men", "women", "feet", "mice", "people", "running", "stopped",
    "data,", "scan.", "query!", "(index)", "merge;", "sort:",
]
CJK_PHRASES = ["機器學習模型", "分散式資料處理", "搜尋引擎索引", "自然語言分析"]


def _h(*cols: Column | str | int) -> Column:
    """Stable 64-bit hash of the given columns/literals."""
    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _pm(c: Column, m: int) -> Column:
    return F.pmod(c, F.lit(m))


def synthesize(
    spark: SparkSession,
    n_docs: int,
    pages_per_file: int = 4,
    skew: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the interleaved `documents` table: one row per page-doc."""
    df = spark.range(0, n_docs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    file_idx = (F.col("id") / pages_per_file).cast("long")
    page_idx = (F.col("id") % pages_per_file + 1).cast("int")
    ext = F.element_at(
        F.array(F.lit("pptx"), F.lit("docx"), F.lit("pdf")), (file_idx % 3 + 1).cast("int")
    )
    path = F.concat(
        F.lit("folder"), (file_idx % 23).cast("string"), F.lit("/doc_"),
        file_idx.cast("string"), F.lit("."), ext,
    )
    pad_w = len(str(pages_per_file))
    doc_id = F.sha2(
        F.concat(path, F.lit("-"), F.lpad(page_idx.cast("string"), pad_w, "0")), 256
    )

    df = df.select(
        F.col("id").alias("seq"),
        path.alias("ori_file_path"),
        page_idx.alias("page_idx"),
        doc_id.alias("doc_id"),
    )

    # span count: 2..7 normally; pinned ~1% tail gets ~40× (mega-docs).
    base_n = (_pm(_h(F.col("doc_id"), 11), 6) + 2).cast("int")
    if skew:
        n_spans = F.when(_pm(_h(F.col("seq"), 13), 100) == 0, base_n * 40).otherwise(base_n)
    else:
        n_spans = base_n
    df = df.withColumn("n_spans", n_spans)

    vocab = F.array(*[F.lit(w) for w in GEN_VOCAB])
    cjk = F.array(*[F.lit(w) for w in CJK_PHRASES + CJK_DICT[:8]])

    def span_struct(o: Column) -> Column:
        d = F.col("doc_id")
        is_media = _pm(_h(d, o, 1), 3) == 0
        nw = (_pm(_h(d, o, 2), 8) + 5).cast("int")
        words = F.transform(
            F.sequence(F.lit(0), nw - 1),
            lambda w: F.element_at(vocab, (_pm(_h(d, o, w, 3), len(GEN_VOCAB)) + 1).cast("int")),
        )
        base_text = F.array_join(words, " ")
        noise = _pm(_h(d, o, 4), 5)
        text = (
            F.when(noise == 0, F.concat(F.lit('<div class="nav">'), base_text, F.lit("</div>")))
            .when(noise == 1, F.concat(base_text, F.lit("\ncopyright 2020 acme corp\n"), base_text))
            .when(noise == 2, F.concat(F.lit("• "), base_text, F.lit(" 、"),
                                       F.element_at(cjk, (_pm(_h(d, o, 5), 12) + 1).cast("int"))))
            .when(noise == 3, F.concat(base_text, F.lit(" "),
                                       F.element_at(cjk, (_pm(_h(d, o, 6), 12) + 1).cast("int"))))
            .otherwise(base_text)
        )
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media, F.lit("")).otherwise(text).alias("text"),
            F.when(is_media, F.concat(d, F.lit("/img-"), o.cast("string"), F.lit(".png")))
            .otherwise(F.lit(""))
            .alias("media_ref"),
            o.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), F.col("n_spans") - 1), span_struct)
    return df.select("doc_id", spans.alias("spans"), "ori_file_path", "page_idx")


def documents_table(spark: SparkSession, n_docs: int, **kw) -> DataFrame:
    """Just (doc_id, spans) — the BASELINE.json input shape."""
    return synthesize(spark, n_docs, **kw).select("doc_id", "spans")
