"""Property-based fuzzing of the sequential text operators (SURVEY §5.2-5).

Pure-python (no Spark session): the fold implementations are the same
objects the Spark mapInPandas operators call per document, so the
invariants proven here hold inside the distributed operators too.
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from assignment3_qachatapplication_vectorembeddings_spark.operators.chunking import (
    TOKENIZERS,
    nougat_semantics_py,
    pack_lines,
    pack_words_second_pass,
)

_ws = TOKENIZERS["ws"]

lines_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from(list("abcdef xyz#*\t")),
        max_size=60,
    ),
    max_size=30,
)
limit_strategy = st.integers(min_value=1, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lines=lines_strategy, limit=limit_strategy)
def test_pack_lines_invariants(lines, limit):
    chunks, oversized = pack_lines(lines, "\n", limit, _ws)

    # 1. oversized routing is strict '>': every oversized line exceeds
    #    the limit; no emitted NON-EMPTY chunk exceeds it
    for line in oversized:
        assert _ws(line) > limit
    for c in chunks:
        assert _ws(c) <= limit or c == ""

    # 2. token conservation: every non-blank input line's tokens appear
    #    in the concatenated output (chunks + oversized)
    in_tokens = [t for ln in lines if ln.strip() for t in ln.strip().split()]
    out_tokens = [t for c in chunks for t in c.split()] + [
        t for ln in oversized for t in ln.split()
    ]
    assert sorted(in_tokens) == sorted(out_tokens)


@settings(max_examples=200, deadline=None)
@given(lines=lines_strategy, limit=limit_strategy)
def test_pack_determinism(lines, limit):
    assert pack_lines(lines, "\n", limit, _ws) == pack_lines(
        lines, "\n", limit, _ws
    )


@settings(max_examples=100, deadline=None)
@given(lines=lines_strategy, limit=limit_strategy)
def test_second_pass_bounds_every_chunk(lines, limit):
    _chunks, oversized = pack_lines(lines, "\n", limit, _ws)
    repacked = pack_words_second_pass(oversized, limit, _ws)
    # word-level repack can always fit (single words > limit are dropped
    # by the reference; with ws counting a single word is 1 token ≤ limit)
    for c in repacked:
        assert _ws(c) <= limit


text_strategy = st.text(
    alphabet=st.sampled_from(list("ab c\n#*")),
    max_size=300,
)


@settings(max_examples=200, deadline=None)
@given(text=text_strategy)
def test_semantics_sections_monotonic(text):
    sem = nougat_semantics_py("doc", text, _ws)
    if len(sem) == 0:
        return
    sections = sem["Section"].tolist()
    # sections start at 1, never decrease, step by at most 1
    assert sections[0] == 1
    for prev, cur in zip(sections, sections[1:]):
        assert cur in (prev, prev + 1)
    # cumulative token count is the running sum of TokenCount
    assert sem["CummulativeTokenCount"].tolist() == sem["TokenCount"].cumsum().tolist()
    # ParaNumber strictly increasing (original split index)
    pn = sem["ParaNumber"].tolist()
    assert all(b > a for a, b in zip(pn, pn[1:]))


# ---------------------------------------------------------------------------
# _cents_sum must be bit-identical to a decimal(18,s) sum cast to double
# for any mix of money values within the documented envelope.
# ---------------------------------------------------------------------------

money_strategy = st.lists(
    st.integers(min_value=-10**7, max_value=10**7).map(lambda c: c / 100.0),
    min_size=1,
    max_size=50,
)


@settings(max_examples=30, deadline=None)
@given(values=money_strategy)
@pytest.mark.slow
def test_cents_sum_equals_decimal_sum(spark, values):
    import pyspark.sql.functions as F

    from assignment3_qachatapplication_vectorembeddings_spark.plans.corpus import (
        _cents_sum,
        _dec2,
    )

    df = spark.createDataFrame([(v,) for v in values], "v double")
    row = df.agg(
        _cents_sum(F.col("v")).alias("cents"),
        F.sum(_dec2(F.col("v"))).cast("double").alias("dec"),
    ).head()
    assert row["cents"] == row["dec"], (values, row)


@given(
    prices=st.lists(
        st.floats(min_value=0.01, max_value=9999.99).map(lambda x: round(x, 2)),
        min_size=1,
        max_size=40,
    ),
    n_cust=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=20, deadline=None)
@pytest.mark.slow
def test_rolling_median_matches_python_reference(spark, prices, n_cust):
    """The collect_list+sort_array median composition equals a direct
    Python computation of the trailing-5 median (as 2x cents) for any
    price sequence and any customer interleaving."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    rows = [
        (i % n_cust, f"2024-01-{(i % 28) + 1:02d}", i, p)
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_orderkey long, o_totalprice double"
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    arr = F.sort_array(F.collect_list(cents).over(w))
    k = F.size(arr)
    mid = ((k + 1) / 2).cast("int")
    half = (k / 2).cast("int")
    med2 = F.when(k % 2 == 1, F.element_at(arr, mid) * 2).otherwise(
        F.element_at(arr, half) + F.element_at(arr, half + 1)
    )
    got = {
        r["o_orderkey"]: r["m"]
        for r in df.select("o_orderkey", med2.alias("m")).collect()
    }

    # python reference
    hist: dict = {}
    expect = {}
    for cust, date, key, p in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        h = hist.setdefault(cust, [])
        h.append(round(p * 100))
        frame = sorted(h[-5:])
        n = len(frame)
        expect[key] = (
            frame[n // 2] * 2 if n % 2 == 1 else frame[n // 2 - 1] + frame[n // 2]
        )
    assert got == expect
