"""Salted aggregation / joins must be EXACTLY equal to the unsalted
plans — salting only changes shuffle topology, never results."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import load_table


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_agg_equals_plain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    got = salted_agg(
        events,
        ["user_id"],
        {
            "n": ("count", "*"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        num_salts=8,
    )
    want = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    cols = ["user_id", "n", "vmin", "vmax"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_agg_sum_decimal_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "p", F.col("o_totalprice").cast("decimal(18,2)")
    )
    got = salted_agg(orders, ["o_custkey"], {"total": ("sum", "p")}, num_salts=4)
    want = orders.groupBy("o_custkey").agg(F.sum("p").alias("total"))
    cols = ["o_custkey", "total"]
    assert _rows(got, cols) == _rows(want, cols)


def test_salted_join_inner_and_left(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    # make the probe side artificially skewed onto one key
    skewed = orders.withColumn(
        "o_custkey", F.when(F.col("o_orderkey") % 3 == 0, 1).otherwise(F.col("o_custkey"))
    )
    for how in ("inner", "left"):
        got = salted_join(skewed, cust, ["o_custkey"], how=how, num_salts=8)
        want = skewed.join(cust, "o_custkey", how)
        cols = ["o_orderkey", "o_custkey", "c_name"]
        assert _rows(got.select(cols), cols) == _rows(want.select(cols), cols)
