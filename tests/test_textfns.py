"""Text-analysis function tests (lang-id accuracy vs ground truth,
fingerprint normalization, quality features)."""

from __future__ import annotations

from pyspark.sql import functions as F

from assignment3_qachatapplication_vectorembeddings_spark.functions.textfns import (
    classify_paragraph,
    exact_fingerprint,
    lang_id,
    token_count_col,
)
from assignment3_qachatapplication_vectorembeddings_spark.sources.tables import (
    load_table,
)


def test_lang_id_on_real_samples(spark):
    # NB the testdata documents' lang column is a random label (the text
    # is English-ish word soup for every lang), so accuracy is measured
    # on real-language samples instead.
    samples = [
        ("en", "the cat sat on the mat and it was happy with the sun"),
        ("es", "el perro corre en la casa y los gatos duermen en las camas"),
        ("fr", "le chien court dans la maison et les chats dorment sur un lit"),
        ("de", "der hund läuft und die katze schläft mit den kindern im haus"),
        ("zh", "我在这里他说的是不一样的东西我们有很多"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    got = {
        r["lang"]: r["pred"]
        for r in df.select("lang", lang_id(F.col("text")).alias("pred")).collect()
    }
    assert got == {lang: lang for lang, _ in samples}


def test_lang_id_runs_on_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = docs.select(lang_id(F.col("text")).alias("pred"))
    assert out.filter(F.col("pred").isNull()).count() == 0


def test_fingerprint_is_whitespace_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world"), ("c", "different text")],
        "id string, text string",
    )
    fps = {
        r["id"]: r["fp"]
        for r in df.select("id", exact_fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps["a"] == fps["b"] != fps["c"]


def test_classify_and_token_count(spark):
    df = spark.createDataFrame(
        [("### h3",), ("## h2",), ("# h1",), ("** bold",), ("* bullet",), ("plain",)],
        "p string",
    )
    got = [r["c"] for r in df.select(classify_paragraph(F.col("p")).alias("c")).collect()]
    assert got == ["Heading3", "Heading2", "Heading1", "Bold", "Bullet", "Paragraph"]
    n = spark.createDataFrame([("one two  three",)], "t string").select(
        token_count_col(F.col("t")).alias("n")
    ).head()["n"]
    assert n == 3
