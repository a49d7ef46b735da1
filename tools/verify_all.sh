#!/usr/bin/env bash
# One-shot verification of every surface the grading driver checks.
# Usage: bash tools/verify_all.sh [--with-sf01]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 driver contract =="
python3 - << 'EOF'
import importlib.util
spec = importlib.util.spec_from_file_location('__spark_entry__', '__spark_entry__.py')
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = SparkSession.builder.master('local[4]').config('spark.ui.enabled','false').getOrCreate()
rows = mod.entry(spark).collect()
q, o = mod.queries(), mod.oracle_sql()
assert len(rows) >= 1 and set(o) <= set(q)
print(f"entry rows={len(rows)} queries={len(q)} oracles={len(o)} OK")
EOF

echo "== 2/5 pytest =="
python -m pytest tests/ -q

echo "== 3/5 oracle gate sf0.01 =="
python tools/check_corpus.py /root/testdata/sf0.01 | tail -1

if [[ "${1:-}" == "--with-sf01" ]]; then
  echo "== 3b oracle gate sf0.1 (scale determinism) =="
  python tools/check_corpus.py /root/testdata/sf0.1 | tail -1
fi

echo "== 4/5 typed-parity audit (driver hashes TYPED values) =="
python tools/audit_types.py | tail -1

echo "== 5/5 bench =="
python bench.py
