"""Dump full `.explain("formatted")` output for every corpus query to
plans/<tag>/<query>_<suffix>.txt — the before/after evidence trail for
optimization rounds (judge checks plan claims against these files).

Usage: python tools/dump_plans_full.py <tag> <suffix> [query ...]
e.g.   python tools/dump_plans_full.py r09 before
       python tools/dump_plans_full.py r09 after curation_summary
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.runtime import release_caches
from assignment3_qachatapplication_vectorembeddings_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(CORPUS)
    out_dir = Path(_REPO, "plans", tag)
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = CORPUS[name]
        try:
            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # pragma: no cover
            plan = f"plan error: {type(e).__name__}: {e}\n"
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        release_caches()
    print(f"wrote {len(names)} plans to {out_dir}")


if __name__ == "__main__":
    main()
