"""Typed-parity audit: Spark vs DuckDB Arrow dtypes per oracled query.

The driver's correctness gate hashes TYPED values; the local mirror
(`check_corpus.py`) compares repr-canonicalized values, which hides
engine type drift (int32 vs int64, DuckDB HUGEINT sums, decimal vs
double).  Round 1 lost three queries to exactly that.  This audit
materializes every oracled corpus query on BOTH engines at sf0.001 and
reports any column whose Arrow types disagree after the canonical
int64/float64 widening the driver applies.

    python tools/audit_types.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pyarrow as pa

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.schemas import TESTDATA_TABLES
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def canon(t: pa.DataType) -> str:
    """Widen to the equivalence classes a typed value-hash would use."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return "timestamp"  # tz-naive wall clock agreed via session tz
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        # the inner FIELD NAME is renderer trivia ("element" from
        # Spark, "l" from a DuckDB parquet read) — compare value types
        return f"list<{canon(t.value_type)}>"
    return str(t)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or [n for n, s in CORPUS.items() if s.oracle]

    spark = get_spark("audit-types", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    for name in names:
        spec = CORPUS[name]
        try:
            s_tbl = spec.fn(spark, sf_dir).limit(50).toArrow()
            d_tbl = con.execute(spec.oracle).fetch_arrow_table()
        except Exception as exc:
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        finally:
            import gc

            gc.collect()  # release per-query persisted blocks
        s_types = {f.name: canon(f.type) for f in s_tbl.schema}
        d_types = {f.name: canon(f.type) for f in d_tbl.schema}
        diffs = {
            c: (s_types.get(c), d_types.get(c))
            for c in set(s_types) | set(d_types)
            if s_types.get(c) != d_types.get(c)
        }
        if diffs:
            bad += 1
            print(f"{name:28s} TYPE-DRIFT {diffs}")
    print(f"{'-'*50}\n{bad} queries with type drift / errors")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
