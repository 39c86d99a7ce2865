"""Unit tests for the detect-secrets-style entropy scanner —
hand-computed entropies, threshold behavior, keyword bit, and the
no-Python plan pin."""

import math
from collections import Counter

from pyspark.sql import functions as F

from readur_spark.ml.secrets import (
    B64_LIMIT,
    HEX_LIMIT,
    char_entropy_bits,
    secret_candidates,
    secrets_report,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _entropy(s: str) -> float:
    n = len(s)
    return round(
        -sum(c / n * math.log2(c / n) for c in Counter(s).values()), 3
    )


class TestCharEntropy:
    def test_matches_definition(self, spark):
        cases = [
            "aaaaaaaaaaaaaaaaaaaa",            # 0 bits
            "deadbeefdeadbeefdeadbeefdeadbeef",  # 2.156 (hand-checked)
            "AbCdEfGh1234+/=_-xyzQ",           # near-max diversity
        ]
        df = spark.createDataFrame([(c,) for c in cases], "cand string")
        got = {
            r["cand"]: r["h"]
            for r in df.select(
                "cand", F.round(char_entropy_bits("cand"), 3).alias("h")
            ).collect()
        }
        for c in cases:
            assert abs(got[c] - _entropy(c)) < 1e-9, c
        assert got["aaaaaaaaaaaaaaaaaaaa"] == 0.0
        assert got["deadbeefdeadbeefdeadbeefdeadbeef"] == 2.156

    def test_candidates_kinds_and_flags(self, spark):
        hex32 = "0123456789abcdef0123456789abcdef"
        low = "az" * 20  # 1-bit b64 candidate (z breaks the hex run)
        df = _docs(
            spark,
            [(1, f"x {hex32} y"), (2, f"run {low} end"), (3, "no runs here")],
        )
        rows = secret_candidates(df).collect()
        got = {(r["doc_id"], r["kind"]): r for r in rows}
        # hex digest matches BOTH scanners (hex charset ⊂ b64 charset)
        assert set(got) == {(1, "b64"), (1, "hex"), (2, "b64")}
        h = got[(1, "hex")]
        assert h["entropy_bits"] >= HEX_LIMIT and h["flagged"]
        b = got[(1, "b64")]
        assert b["entropy_bits"] < B64_LIMIT and not b["flagged"]
        assert got[(2, "b64")]["entropy_bits"] == 1.0
        assert not got[(2, "b64")]["flagged"]

    def test_report_rollup_and_keyword(self, spark):
        hex32 = "0123456789abcdef0123456789abcdef"
        df = _docs(
            spark,
            [(1, f"api_key present {hex32}"), (2, f"plain {hex32} text")],
        )
        rep = {r["doc_id"]: r for r in secrets_report(df).collect()}
        assert rep[1]["has_keyword"] is True
        assert rep[2]["has_keyword"] is False
        for d in (1, 2):
            assert rep[d]["n_hex"] == 1 and rep[d]["n_b64"] == 1
            assert rep[d]["n_flagged"] == 1  # hex yes, b64 no

    def test_pure_catalyst(self, spark):
        df = _docs(spark, [(1, "x")])
        plan = (
            secrets_report(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
