"""Fixed, explicit schemas for every engine table (SURVEY.md §1.2).

The reference keeps all shapes implicit (MongoDB + JSDoc, e.g.
``/root/reference/src/PdfUtil/PdfUtil.class.js:27-38`` and
``/root/reference/src/DbInterface/DbInterface.class.js:69-77``); here every
table has a pinned StructType so Parquet/Iceberg layouts, Arrow batches and
the DuckDB oracle all agree.
"""

from __future__ import annotations

from pyspark.sql import types as T

# One span of an interleaved document.  kind ∈ {'text','media'}.
# For kind='text': text = raw segment text, media_ref = ''.
# For kind='media': text = '', media_ref names the image blob
# (mirrors the per-page PNG of PdfUtil.class.js:73).
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# Primary input (BASELINE.json input_hint).
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# Output 1: normalized spans after extraction; same shape as the input.
EXTRACTED_SPANS = DOCUMENTS

# Page/document catalog (Mongo `docs`, DbInterface.class.js:236-251).
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("file_id", T.StringType(), False),
        T.StructField("ori_file_path", T.StringType(), False),
        T.StructField("page_idx", T.IntegerType(), False),
        T.StructField("img_path", T.StringType(), False),
    ]
)

# Output 2: inverted index (Mongo `term_freqs`, DbInterface.class.js:366-381).
TERM_POSTINGS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
)

# Symmetric pairwise term-correlation table (DbInterface.class.js:189-218).
TERM_CORRELATIONS = T.StructType(
    [
        T.StructField("term1", T.StringType(), False),
        T.StructField("term2", T.StringType(), False),
        T.StructField("tcr", T.DoubleType(), False),
    ]
)

# Search log (DbInterface.class.js:477-496).
SEARCH_HISTORY = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),
        T.StructField("search_terms", T.MapType(T.StringType(), T.IntegerType()), False),
        T.StructField("search_query", T.StringType(), False),
    ]
)

# Per-partition lineage + metrics; required by BASELINE.json north_rule.
CHECKPOINT = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("config_hash", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("doc_id_min", T.StringType(), True),
        T.StructField("doc_id_max", T.StringType(), True),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_spans", T.LongType(), False),
        T.StructField("n_media", T.LongType(), False),
        T.StructField("n_errors", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Extraction output row carrying per-doc error info (X2: recorded, not
# silent, degradation — PromiseUtil.const.js:20-38 swallowed errors).
EXTRACTED_WITH_ERRORS = T.StructType(
    list(EXTRACTED_SPANS.fields) + [T.StructField("error", T.StringType(), True)]
)
