"""ml/normalize.py — NFC + whitespace normalization."""

from __future__ import annotations

import unicodedata

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.normalize import (
    clean_whitespace,
    nfc_normalize_col,
    normalize_text,
)


class TestNfc:
    def test_decomposed_recomposes(self, spark):
        decomposed = "caf" + "e" + "́"  # e + combining acute
        df = spark.createDataFrame([(decomposed,)], "t string")
        got = df.select(nfc_normalize_col(F.col("t")).alias("n")).first()["n"]
        assert got == "café"
        assert got == unicodedata.normalize("NFC", decomposed)

    def test_ascii_fast_path_identity(self, spark):
        df = spark.createDataFrame(
            [("plain ascii text 123",), (None,)], "t string"
        )
        rows = df.select(nfc_normalize_col(F.col("t")).alias("n")).collect()
        assert rows[0]["n"] == "plain ascii text 123"
        assert rows[1]["n"] is None


class TestCleanWhitespace:
    def test_controls_and_runs(self, spark):
        raw = "a\x00b\tc  d\x0b \ne\t\t f \n"
        df = spark.createDataFrame([(raw,)], "t string")
        got = df.select(clean_whitespace(F.col("t")).alias("c")).first()["c"]
        # \x00 and \x0b stripped, tab/space runs -> one space,
        # trailing space before newline removed, newlines preserved
        assert got == "ab c d\ne f\n"


class TestNormalizeText:
    def test_changed_flag(self, spark):
        df = spark.createDataFrame(
            [(1, "already clean"), (2, "two  spaces")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in normalize_text(df).collect()}
        assert rows[1]["changed"] is False
        assert rows[2]["changed"] is True
        assert rows[2]["norm_text"] == "two spaces"

    def test_dedup_motivation(self, spark):
        """The reason the op exists: NFC makes the two encodings of é
        hash-equal."""
        df = spark.createDataFrame(
            [(1, "caf\u00e9"), (2, "cafe\u0301")],  # composed vs decomposed
            "doc_id long, text string",
        )
        out = normalize_text(df).select(
            F.md5(F.encode(F.col("norm_text"), "UTF-8")).alias("h")
        )
        hashes = {r["h"] for r in out.collect()}
        assert len(hashes) == 1
