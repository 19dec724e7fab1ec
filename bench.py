"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the flagship
extraction-throughput job on the deterministic synthetic interleaved
corpus (corpus.py — bit-identical at any parallelism, which is what makes
the two-parallelism scaling evidence in tools/scaling.py valid).

Each query is executed to completion with the ``noop`` sink: full plan
runs (scan → UDF → shuffle → agg), nothing is collected to the driver.

Output: {"metric": ..., "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "extract_docs_per_sec": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_DOCS_EXTRACT = int(os.environ.get("BENCH_EXTRACT_DOCS", "40000"))


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ocr_search_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=2 * cpus)

    import __spark_entry__ as entry
    from ocr_search_spark import corpus
    from ocr_search_spark.operators import extract, tokenize

    qs = entry.queries()
    bench_queries = [
        "extract_columnar",
        "extract_pandas",
        "postings",
        "search_topk",
        "term_correlations",
        "delete_cascade",
        "tpch_q1",
        "tpch_q3",
        "tpch_q5",
        "window_top_orders",
        "events_hourly",
        "events_sessionize",
    ]

    times: dict[str, float] = {}
    total = 0.0
    for name in bench_queries:
        best = None
        for _ in range(2):  # best-of-2: host noise is 2-3x (see BENCH.md)
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            d = time.time() - t0
            best = d if best is None or d < best else best
        times[name] = round(best, 3)
        total += best

    # Flagship: extraction throughput on the interleaved synthetic corpus
    # (skew tail enabled — exercises the salted/size-bucketed path).
    # Input is materialized to parquet untimed (the north_star reads
    # tables; generation cost is not extraction cost), and the pipeline is
    # warmed once so JVM/codegen JIT doesn't pollute the throughput
    # number. Timed region = the production job shape (§3.1): read →
    # salted repartition → Arrow extraction (+ span-split for mega-docs)
    # → write extracted_spans → read → tokenize → postings.
    docs_path = "/tmp/spark_graft_bench_docs"
    ext_path = "/tmp/spark_graft_bench_extracted"
    corpus.documents_table(spark, N_DOCS_EXTRACT, skew=True).write.mode(
        "overwrite"
    ).parquet(docs_path)
    src = spark.read.parquet(docs_path)

    def pipeline(inp):
        ext = extract.extract_spans(
            inp, impl="arrow", skew_threshold=64, num_partitions=2 * cpus
        )
        ext.drop("error").write.mode("overwrite").parquet(ext_path)
        _noop(tokenize.term_postings(spark.read.parquet(ext_path)))

    pipeline(src.limit(2000))  # warmup (JIT, codegen, python workers)
    # best-of-2: this sandbox's host steals CPU with 2-3x wall-clock
    # noise; the minimum is the least-interference estimate
    dt = None
    for _ in range(2):
        t0 = time.time()
        pipeline(src)
        d = time.time() - t0
        dt = d if dt is None or d < dt else dt
    times["extract_pipeline_synthetic"] = round(dt, 3)
    total += dt
    docs_per_sec = N_DOCS_EXTRACT / dt

    print(
        json.dumps(
            {
                "metric": "headline query latency + extraction throughput "
                f"(pipeline on {N_DOCS_EXTRACT} interleaved docs)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "extract_docs_per_sec": round(docs_per_sec, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
