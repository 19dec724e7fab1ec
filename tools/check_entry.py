"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same sf directory, then compares row count, sorted column
names, and an order-insensitive value multiset (floats via repr of the
exact double — the queries themselves are responsible for determinism).

Usage: python tools/check_entry.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


_DUCK_TYPES = {
    "BIGINT": "long",
    "INTEGER": "int",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "DATE": "date",
    "HUGEINT": "hugeint",
    "NUMBER": "number",
}


def canon_duck_type(t: str) -> str:
    return _DUCK_TYPES.get(t.upper(), t.lower())


def canon_spark_type(t: str) -> str:
    return {"bigint": "long", "timestamp_ntz": "timestamp"}.get(t, t)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(round(v, 9))
            elif isinstance(v, int):
                v = repr(v)
            else:
                v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from ocr_search_spark.session import get_spark

    spark = get_spark("check_entry", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {c: canon_spark_type(t) for c, t in sdf.dtypes}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?   {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            otypes = {
                r[0]: canon_duck_type(str(r[1]))
                for r in con.execute(f"DESCRIBE {sql}").fetchall()
            }
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(ocols)}")
            failures.append(name)
            continue
        tdiff = {
            c: (stypes[c], otypes.get(c))
            for c in scols
            if stypes[c] != otypes.get(c)
        }
        if tdiff:
            print(f"FAIL  {name}: dtype mismatch {tdiff}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(orows)}")
            failures.append(name)
            continue
        cs, co = canon(srows, scols), canon(orows, ocols)
        if cs != co:
            bad = [(a, b) for a, b in zip(cs, co) if a != b][:3]
            print(f"FAIL  {name}: value mismatch; first diffs: {bad}")
            failures.append(name)
            continue
        print(f"PASS  {name}: rows={len(srows)} ({dt:.1f}s)")

    if not only:
        df = entry.entry(spark)
        n = df.count()
        print(f"entry(): rows={n} schema={df.schema.simpleString()}")

    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
