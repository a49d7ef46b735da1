"""Golden-parquet oracle freshness guard (round 7).

The driver's hash gate compares live Spark results against the
committed goldens under ``tests/fixtures/golden/`` — this test gives
the EARLIER signal: regenerate the cheapest goldens in-process at
sf0.001 and compare value-for-value with the committed files, so a
semantic drift in chunking/BPE/embedding lands as a pytest diff before
it lands as a driver gate failure. (Full-scale regeneration is
``tools/make_goldens.py``; run it deliberately when semantics change
on purpose, and say so in the commit.)
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS

GOLDEN_DIR = Path(__file__).parent / "fixtures" / "golden"
SF_DIR = "/root/testdata/sf0.001"

# the cheap-at-sf0.001 subset; pypdf/nougat/multimodal/pca/curation and
# the remaining ANN entries cost more and are covered by the same
# mechanism in the driver gate
CHEAP = [
    "bpe_token_counts",
    "embed_documents",
    "bpe_train_merges",
    "approx_distinct",
    "semdedup_summary",
    "ann_ivfpq_topk",
]


@pytest.mark.parametrize("name", CHEAP)
def test_golden_matches_live_result(spark, name):
    committed = pq.read_table(GOLDEN_DIR / f"{name}_0_001.parquet")
    live = CORPUS[name].fn(spark, SF_DIR).toArrow()
    assert live.schema.equals(committed.schema), (
        f"{name}: schema drift vs committed golden — if intentional, "
        "regenerate with tools/make_goldens.py"
    )
    a = sorted(tuple(sorted(r.items())) for r in live.to_pylist())
    b = sorted(tuple(sorted(r.items())) for r in committed.to_pylist())
    assert a == b, (
        f"{name}: value drift vs committed golden — if intentional, "
        "regenerate with tools/make_goldens.py"
    )
