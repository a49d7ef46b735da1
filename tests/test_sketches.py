"""Misra-Gries heavy hitters: exactness under adversarial layouts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.sketches import (
    heavy_hitters,
)


def _naive(df, phi):
    k = int(round(1 / phi))
    words = df.select(F.explode("ws").alias("word"))
    total = words.count()
    return {
        (r["word"], r["n"])
        for r in words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") * k > F.lit(total))
        .collect()
    }


@pytest.mark.parametrize("gate", [None, 10**9])  # sketch path / exact path
@pytest.mark.parametrize("parts", [1, 7, 32])
def test_exact_vs_naive_across_partitionings(spark, parts, gate):
    # zipf-ish: 'hot' 40%, 'warm' 12%, long cold tail just under phi
    rows = (
        [(["hot"],)] * 400
        + [(["warm"],)] * 120
        + [([f"cold{i}"],) for i in range(480)]
    )
    df = spark.createDataFrame(rows, "ws array<string>").repartition(parts)
    got = {
        (r["word"], r["n"])
        for r in heavy_hitters(df, phi=1 / 10, sketch_min_rows=gate).collect()
    }
    assert got == _naive(df, 1 / 10) == {("hot", 400), ("warm", 120)}


def test_hitter_split_across_partitions_survives(spark):
    # the heavy item is spread thin over every partition — the
    # pigeonhole argument (some partition keeps it) must still hold;
    # gate off so the SKETCH path is what's exercised
    rows = [(["hh"],)] * 100 + [([f"c{i}"],) for i in range(150)]
    df = spark.createDataFrame(rows, "ws array<string>").repartition(32)
    got = {
        (r["word"], r["n"])
        for r in heavy_hitters(df, phi=1 / 5, sketch_min_rows=None).collect()
    }
    assert got == {("hh", 100)}  # 40% > 1/5; every c_i is 1/250


def test_phi_must_be_reciprocal_integer(spark):
    df = spark.createDataFrame([(["x"],)], "ws array<string>")
    with pytest.raises(ValueError):
        heavy_hitters(df, phi=0.03)


def test_null_tokens_dropped_in_both_paths(spark):
    # NULL array elements must never surface as heavy hitters, and the
    # exact and sketch dispatch paths must agree on a NULL-heavy input
    from assignment3_qachatapplication_vectorembeddings_spark.operators.sketches import (
        heavy_hitters,
    )

    rows = [(["a", None, None, "a"],)] * 20 + [(["b"],)] * 3 + [([None],)] * 9
    df = spark.createDataFrame(rows, "ws array<string>")
    exact = heavy_hitters(df, phi=0.25, sketch_min_rows=10**9).collect()
    sketch = heavy_hitters(df, phi=0.25, sketch_min_rows=0).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in sketch]
    assert all(r["word"] is not None for r in exact)
    # n = 43 non-null tokens; only 'a' (40) exceeds 43/4
    assert [r["word"] for r in exact] == ["a"]
