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
