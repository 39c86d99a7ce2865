"""pg_trgm padded-trigram parity (contrib/pg_trgm semantics)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from readur_spark.queries.search import trigram_set, trigram_similarity


def _tg(spark, s, padded=True):
    df = spark.createDataFrame([Row(s=s)])
    return set(
        df.select(trigram_set(F.col("s"), padded=padded).alias("t"))
        .first()["t"]
    )


def _sim(spark, a, b):
    df = spark.createDataFrame([Row(a=a, b=b)])
    return df.select(
        trigram_similarity(
            trigram_set(F.col("a")), trigram_set(F.col("b"))
        ).alias("s")
    ).first()["s"]


def test_padded_single_word_set(spark):
    # pg_trgm: show_trgm('word') = {'  w',' wo','wor','ord','rd '}
    assert _tg(spark, "word") == {"  w", " wo", "wor", "ord", "rd "}


def test_padded_multi_word_splits_and_pads_each(spark):
    # pg_trgm: show_trgm('two words') has trigrams of both padded words
    assert _tg(spark, "two words") == {
        "  t", " tw", "two", "wo ",
        "  w", " wo", "wor", "ord", "rds", "ds ",
    }


def test_padded_lowercases_and_strips_punct(spark):
    assert _tg(spark, "Word!") == _tg(spark, "word")


def test_single_char_word(spark):
    # '  a ' → {'  a', ' a '}
    assert _tg(spark, "a") == {"  a", " a "}


def test_pg_trgm_documented_similarity_value(spark):
    # the canonical pg_trgm docs example: similarity('word','two words')
    got = _sim(spark, "word", "two words")
    assert abs(got - 4.0 / 11.0) < 1e-9  # 0.363636…


def test_identical_strings_similarity_one(spark):
    assert _sim(spark, "src1", "src1") == 1.0


def test_sibling_sources_grade(spark):
    # '  src1 ' vs '  src2 ': share {'  s',' sr','src'} of 5+5 → 3/7
    got = _sim(spark, "src1", "src2")
    assert abs(got - 3.0 / 7.0) < 1e-9


def test_unpadded_option_keeps_raw_window(spark):
    assert _tg(spark, "word", padded=False) == {"wor", "ord"}
