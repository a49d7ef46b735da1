"""Corpus queries vs their DuckDB oracles at sf0.001 (t1 mirror).

The driver runs the same compare at sf0.01; this keeps it green from
inside pytest.
"""

from __future__ import annotations

import duckdb
import pytest

from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import CORPUS
from assignment3_qachatapplication_vectorembeddings_spark.schemas import TESTDATA_TABLES

from tools.check_corpus import canon_rows


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = CORPUS[name]
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if spec.oracle is None:
        assert srows is not None  # rows-only contract: it runs
        return
    ores = duck.execute(spec.oracle).fetchall()
    ocols = [d[0] for d in duck.description]
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(ores)
    assert canon_rows(scols, srows) == canon_rows(ocols, ores)


def test_approx_distinct_error_bound(spark, sf_dir):
    """HLL++ estimates must land within a loose rsd-derived bound of the
    exact counts (rows-only corpus entry; this is its accuracy gate)."""
    from pyspark.sql import functions as F

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        q_approx_distinct,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
        load_table,
    )

    row = q_approx_distinct(spark, sf_dir).head()
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("o"),
        F.countDistinct("l_partkey").alias("p"),
    ).head()
    assert abs(row["approx_orders"] - exact["o"]) / exact["o"] < 0.1
    assert abs(row["approx_parts"] - exact["p"]) / exact["p"] < 0.1


def test_stratified_sample_fractions(spark, sf_dir):
    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        q_stratified_sample,
    )
    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
        load_table,
    )

    got = {r["event_type"]: r["n"] for r in q_stratified_sample(spark, sf_dir).collect()}
    totals = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert "error" not in got  # fraction 0.0 -> stratum fully dropped
    assert got["purchase"] == totals["purchase"]  # fraction 1.0 -> all kept
    # 0 < sampled < total for the partial strata
    for k, frac in (("click", 0.5), ("view", 0.25), ("signup", 0.1)):
        assert 0 < got[k] < totals[k]
        assert abs(got[k] / totals[k] - frac) < 0.15


def test_domain_mix_cap_and_integer_weights(spark, tmp_path):
    """A vanishingly small source hits the 5x upsampling cap; weights
    are micro-unit integers so sampled_tokens is exact."""
    import pyspark.sql.functions as F

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        q_domain_mix,
    )

    rows = (
        [(i, "srcA", "w " * 1000) for i in range(50)]        # huge source
        + [(1000, "srcB", "x y z")]                          # tiny source
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "mini")
    (tmp_path / "mini").mkdir()
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in q_domain_mix(spark, sf).collect()}
    # srcB holds 3 of 50003 tokens; uniform target is 1/2 — uncapped
    # weight would be ~8334x, so the 5x cap binds
    assert out["srcB"]["weight"] == 5.0
    assert out["srcB"]["sampled_tokens"] == 15  # 3 * 50000 div 10000
    # srcA is above target share -> downsampled below 1
    assert out["srcA"]["weight"] < 1.0
    assert (
        out["srcA"]["sampled_tokens"]
        == 50000 * int(out["srcA"]["weight"] * 10000) // 10000
    )


def test_domain_mix_zero_token_source(spark, tmp_path):
    """A source whose docs are all empty text gets the capped weight
    (matching the oracle) instead of a DIVIDE_BY_ZERO crash."""
    import pyspark.sql.functions as F

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        q_domain_mix,
    )

    rows = [(1, "srcA", "a b c d"), (2, "srcB", "")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("n_chars", F.length("text"))
    sf = str(tmp_path / "zt")
    (tmp_path / "zt").mkdir()
    df.coalesce(1).write.parquet(f"{sf}/documents.parquet")

    out = {r["source"]: r for r in q_domain_mix(spark, sf).collect()}
    assert out["srcB"]["toks"] == 0
    assert out["srcB"]["weight"] == 5.0
    assert out["srcB"]["sampled_tokens"] == 0


def test_nb_quality_separates_seed_class(spark, sf_dir):
    """The in-plan Naive-Bayes classifier must actually separate the
    classes it trained on: src0 (the seed class) docs average a higher
    mean token log-odds than the rest, and positive on its own
    training class."""
    from pyspark.sql import functions as F

    from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table

    scored = CORPUS["nb_quality_score"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    by_class = (
        scored.join(docs, "doc_id")
        .groupBy((F.col("source") == "src0").alias("is_seed"))
        .agg(F.avg("mean_logodds").alias("m"))
        .collect()
    )
    means = {r["is_seed"]: r["m"] for r in by_class}
    assert means[True] > 0 > means[False]


def test_pagerank_distributed_path_matches_driver(spark, sf_dir, monkeypatch):
    """The distributed iteration fallback must produce bit-identical
    ranks to the size-gated driver path (both are pure integer
    arithmetic, so equality is exact, not approximate)."""
    from assignment3_qachatapplication_vectorembeddings_spark.plans import corpus

    fast = [tuple(r) for r in corpus.q_pagerank_trade(spark, sf_dir).collect()]
    monkeypatch.setattr(corpus, "_PR_DRIVER_EDGE_GATE", 0)
    slow = [tuple(r) for r in corpus.q_pagerank_trade(spark, sf_dir).collect()]
    assert fast == slow
    # rank mass is conserved up to truncation leak: total <= SCALE
    total = sum(r for _, r in fast)
    assert 0 < total <= corpus._PR_SCALE
