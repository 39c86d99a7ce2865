"""Unit test for the corpus datasheet card."""

from readur_spark.ml.datasheet import corpus_datasheet


def test_hand_computed_card(spark):
    rows = [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s1"),   # exact dup of doc 1
        (3, "d e", "fr", "s2"),
        (4, "f", "en", "s3"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    [r] = corpus_datasheet(df).collect()
    assert r["n_docs"] == 4 and r["n_tokens"] == 9
    assert r["n_langs"] == 2 and r["n_sources"] == 3
    assert r["mean_tokens_milli"] == 2250
    assert r["dup_permille"] == 250        # 1 of 4 is a dup
    assert r["top_lang_permille"] == 750   # en 3/4
    assert r["top_source_permille"] == 500  # s1 2/4
