from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ocr_search_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ocr_search_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_df(spark):
    """Shared 150-doc deterministic corpus with the skew tail enabled."""
    from ocr_search_spark import corpus

    return corpus.synthesize(spark, 150, skew=True).cache()


@pytest.fixture(scope="session")
def corpus_rows(corpus_df):
    return {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in corpus_df.select("doc_id", "spans").collect()
    }


@pytest.fixture(scope="session")
def golden_extracted(corpus_rows):
    from ocr_search_spark import golden

    return {d: golden.extract_doc(d, spans) for d, spans in corpus_rows.items()}


@pytest.fixture(scope="session")
def golden_postings(golden_extracted):
    from ocr_search_spark import golden

    return golden.term_postings(golden_extracted)
