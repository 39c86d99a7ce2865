"""ml/curation_web.py — composed url/line/LM/dedup chain."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.curation_web import web_curate

GOOD = (
    "This is a perfectly ordinary sentence about the harbor market.\n"
    "Another fine sentence describes the crates of oranges there."
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "en", GOOD, "https://good.net/a"),
        (2, "en", GOOD, "https://good.net/b"),          # exact dup of 1
        (3, "en", GOOD, "https://blocked.net/x"),        # url-blocked
        (4, "en", "No terminal punctuation anywhere", "https://good.net/c"),
        (5, "de", GOOD + "\nEin weiterer brauchbarer Satz steht hier drin.",
         "https://good.net/d"),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, url string"
    )


class TestWebCurate:
    def test_stage_interactions(self, spark, corpus):
        bl = spark.createDataFrame([("blocked.net",)], "domain string")
        out = web_curate(corpus, bl)
        rows = {r["doc_id"]: r for r in out.collect()}
        # doc 3 (blocked url) and doc 4 (no line survives) are gone;
        # docs 1/2 are exact dups after cleaning -> min doc_id wins
        assert set(rows) == {1, 5}
        assert rows[1]["ppl_bucket"] in ("head", "middle")
        assert rows[5]["lang"] == "de"

    def test_blocked_doc_excluded_from_vocab(self, spark, corpus):
        """The LM vocab must be built over gate SURVIVORS only: with
        doc 3 blocked, its (identical) text still scores via docs 1/2,
        but a corpus where the blocked doc is the only holder of a
        token must not leak that token into the vocabulary."""
        rows = [
            (1, "en", GOOD, "https://good.net/a"),
            (9, "en",
             "Zyxxyz gibberish unique tokens appear only here today.",
             "https://blocked.net/y"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, text string, url string"
        )
        bl = spark.createDataFrame([("blocked.net",)], "domain string")
        out = web_curate(df, bl)
        assert [r["doc_id"] for r in out.collect()] == [1]
