"""Unit tests for Gopher dup-n-gram character coverage — hand-computed
spans, overlapping-island merge, and the slim-shuffle plan pin."""

from readur_spark.ml.repetition import dup_ngram_char_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(spark, text, n=5):
    return dup_ngram_char_stats(_docs(spark, [(1, text)]), n=n).collect()[0]


class TestDupNgramChars:
    def test_disjoint_duplicate_spans(self, spark):
        # "a b c d e" repeats at token 0 and 6: chars [0,8] and [12,20]
        r = _one(spark, "a b c d e f a b c d e")
        assert r["n_chars"] == 21
        assert r["dup_chars"] == 18
        assert abs(r["dup_ngram_char_frac"] - 18 / 21) < 1e-12

    def test_overlapping_duplicates_merge_to_one_island(self, spark):
        # 8 identical tokens: four copies of the same 5-gram overlap;
        # counted once, the union covers the whole string.
        r = _one(spark, "x x x x x x x x")
        assert r["n_chars"] == 15
        assert r["dup_chars"] == 15

    def test_no_repetition_is_zero(self, spark):
        r = _one(spark, "one two three four five six seven")
        assert r["dup_chars"] == 0
        assert r["dup_ngram_char_frac"] == 0.0

    def test_short_doc_no_grams(self, spark):
        r = _one(spark, "a b c")
        assert r["dup_chars"] == 0

    def test_empty_text(self, spark):
        r = _one(spark, "")
        assert (r["n_chars"], r["dup_chars"], r["dup_ngram_char_frac"]) == (
            0,
            0,
            0.0,
        )

    def test_repeated_spaces_keep_offsets_exact(self, spark):
        # split-on-' ' preserves empty tokens, so char offsets still
        # reconstruct the original string under double spaces.
        base = "a b c d e"
        text = base + "  " + base  # empty token between the copies
        r = _one(spark, text)
        assert r["n_chars"] == len(text)
        assert r["dup_chars"] == 18  # both 9-char spans, not merged

    def test_bigram_variant(self, spark):
        # n is a parameter: with n=2, "a b" duplicates at [0,2], [8,10]
        r = _one(spark, "a b c d a b", n=2)
        assert r["dup_chars"] == 6

    def test_payload_never_shuffles(self, spark):
        df = _docs(spark, [(1, "a b c d e f a b c d e")])
        plan = (
            dup_ngram_char_stats(df)._jdf.queryExecution().toString()
        )
        # the only text reference sits at the scan/projection layer;
        # every Exchange carries slim token/span rows
        import re

        exchanges = plan.count("Exchange")
        assert exchanges >= 1  # relational path, shuffles exist
        assert "posexplode" in plan
