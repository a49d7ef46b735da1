"""CLI entry points mirroring the reference's three lifecycles.

- ``pipeline1`` — documents → chunks+embeddings parquet (DAG trigger
  params mirror ``pipeline1.py:921-925``: links array + processor)
- ``pipeline2`` — index maintenance 4-way dispatch
  (``pipeline2.py:371-379``: operationType + operationPayload)
- ``ask`` — the online Q&A query (``/askQuestion`` semantics)

Usage::

    python -m assignment3_qachatapplication_vectorembeddings_spark.cli \
        pipeline2 --index /tmp/idx upsert /tmp/chunks
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Sequence

from .session import get_spark


def _cmd_pipeline1(args) -> int:
    from .plans.pipeline1 import DocumentPipeline, Pipeline1Config

    import os

    spark = get_spark("pipeline1")

    def _local_head_check(url: str) -> tuple[bool, str]:
        # CLI mode works on local/file:// paths; S1's all-or-nothing gate
        # becomes an existence check (the HTTP variant is injectable)
        path = url.removeprefix("file://")
        return (os.path.exists(path), "missing file")

    pipe = DocumentPipeline(
        spark,
        Pipeline1Config(
            token_limit=args.token_limit, processor=args.processor
        ),
        fetcher=lambda url: open(url.removeprefix("file://"), "rb").read(),
        head_check=_local_head_check,
    )
    run_id = pipe.run_and_write(args.links, args.out)
    print(json.dumps({"run_id": run_id, "out": args.out}))
    return 0


def _cmd_pipeline2(args) -> int:
    from .plans.pipeline2 import run_pipeline2

    spark = get_spark("pipeline2")
    payload = args.payload
    if args.operation in ("deleteByFormNames", "deleteByVectorIds"):
        payload = payload.split(",") if payload else []
    stats = run_pipeline2(spark, args.index, args.operation, payload)
    print(json.dumps(stats, default=str))
    return 0


def _cmd_ask(args) -> int:
    from .operators.index_maintenance import VectorIndex
    from .plans.qa import QAPipeline

    spark = get_spark("ask")
    qa = QAPipeline(VectorIndex(spark, args.index), top_k=args.top_k)
    out = qa.ask(args.question, args.forms.split(",") if args.forms else None)
    print(json.dumps(out))
    return 0


def _cmd_fsck(args) -> int:
    from .operators.index_fsck import fsck_derived, fsck_primary
    from .operators.index_maintenance import VectorIndex
    from .operators.index_sync import SyncedIvfpqIndex, SyncedTextIndex

    spark = get_spark("fsck")
    vi = VectorIndex(spark, args.index)
    reports = [fsck_primary(vi, deep=args.deep)]
    for path in args.ivfpq or []:
        reports.append(fsck_derived(SyncedIvfpqIndex(vi, path), deep=args.deep))
    for path in args.text or []:
        reports.append(fsck_derived(SyncedTextIndex(vi, path), deep=args.deep))
    for r in reports:
        print(json.dumps(r))
    return 1 if any(r["errors"] for r in reports) else 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="assignment3-spark-engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("pipeline1", help="documents → chunks+embeddings")
    p1.add_argument("--links", nargs="+", required=True)
    p1.add_argument("--out", required=True)
    p1.add_argument("--processor", default="plaintext")
    p1.add_argument("--token-limit", type=int, default=1000)
    p1.set_defaults(fn=_cmd_pipeline1)

    p2 = sub.add_parser("pipeline2", help="vector index maintenance")
    p2.add_argument("--index", required=True)
    p2.add_argument(
        "operation",
        choices=["upsert", "deleteByFormNames", "deleteByVectorIds", "deleteAll"],
    )
    p2.add_argument("payload", nargs="?", default=None)
    p2.set_defaults(fn=_cmd_pipeline2)

    pa = sub.add_parser("ask", help="top-k Q&A query")
    pa.add_argument("--index", required=True)
    pa.add_argument("--question", required=True)
    pa.add_argument("--forms", default=None)
    pa.add_argument("--top-k", type=int, default=2)
    pa.set_defaults(fn=_cmd_ask)

    pf = sub.add_parser("fsck", help="index tree integrity check")
    pf.add_argument("--index", required=True, help="primary VectorIndex path")
    pf.add_argument("--ivfpq", action="append", help="SyncedIvfpqIndex path")
    pf.add_argument("--text", action="append", help="SyncedTextIndex path")
    pf.add_argument("--deep", action="store_true", help="row-level parity")
    pf.set_defaults(fn=_cmd_fsck)
    return p


def main(argv: Sequence[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
