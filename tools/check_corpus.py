"""Local mirror of the driver's correctness gate: run every corpus query
on Spark AND its DuckDB oracle, compare row count, column names, and
order-insensitive canonicalized values.

Usage: python tools/check_corpus.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.schemas import TESTDATA_TABLES
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def canon(value):
    if value is None:
        return "NULL"
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return f"{value:.6g}" if value == int(value) else repr(round(value, 9))
    return repr(value)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(CORPUS)

    spark = get_spark("corpus-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name in names:
        spec = CORPUS[name]
        t0 = time.time()
        sdf = spec.fn(spark, sf_dir)
        scols = sdf.columns
        srows = sdf.collect()
        spark_s = time.time() - t0
        if spec.oracle is None:
            print(f"  {name:28s} rows-only: {len(srows):7d} rows  [{spark_s:5.2f}s]")
            continue
        t0 = time.time()
        ores = con.execute(spec.oracle).fetchall()
        ocols = [d[0] for d in con.description]
        duck_s = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(ores)
        ok_vals = ok_cols and ok_count and canon_rows(scols, srows) == canon_rows(ocols, ores)
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"  {name:28s} {status} rows={len(srows)}/{len(ores)} "
            f"cols={'=' if ok_cols else f'{sorted(scols)} vs {sorted(ocols)}'} "
            f"vals={'=' if ok_vals else 'DIFF'} [spark {spark_s:.2f}s duck {duck_s:.2f}s]"
        )
        if not (ok_cols and ok_count and ok_vals):
            failures.append(name)
            if ok_cols and ok_count:
                a, b = canon_rows(scols, srows), canon_rows(ocols, ores)
                for i, (x, y) in enumerate(zip(a, b)):
                    if x != y:
                        print(f"    first diff row {i}:\n      spark {x}\n      duck  {y}")
                        break
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
