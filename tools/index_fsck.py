"""CLI for the index integrity checker.

Usage:
    python tools/index_fsck.py PRIMARY_PATH [--deep] \
        [--ivfpq DERIVED_PATH] [--text DERIVED_PATH]

Prints one JSON report per tree; exit code 1 if any tree has errors.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.operators.index_fsck import (
    fsck_derived,
    fsck_primary,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_maintenance import (
    VectorIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.operators.index_sync import (
    SyncedIvfpqIndex,
    SyncedTextIndex,
)
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    deep = "--deep" in args
    if deep:
        args.remove("--deep")
    derived = []
    for flag, cls in (("--ivfpq", SyncedIvfpqIndex), ("--text", SyncedTextIndex)):
        while flag in args:
            i = args.index(flag)
            derived.append((cls, args[i + 1]))
            del args[i : i + 2]
    if not args:
        print(__doc__)
        return 2
    spark = get_spark("index-fsck")
    vi = VectorIndex(spark, args[0])
    reports = [fsck_primary(vi, deep=deep)]
    for cls, path in derived:
        reports.append(fsck_derived(cls(vi, path), deep=deep))
    bad = 0
    for r in reports:
        print(json.dumps(r, indent=1))
        bad += len(r["errors"])
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
