"""Unicode confusable skeletons (ml/confusables.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the fold
table's integrity, skeleton edges, stats counting, evasion-vs-plain
separation, and the zero-Python plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from readur_spark.ml.confusables import (
    CONFUSABLE_FROM,
    CONFUSABLE_TO,
    INVISIBLE_CHARS,
    confusable_stats,
    skeleton,
    skeleton_blocklist_evasion,
)


def _sk(spark, s: str) -> str:
    return spark.range(1).select(
        skeleton(F.lit(s)).alias("k")
    ).first()["k"]


class TestFoldTable:
    def test_one_to_one_and_ascii_targets(self):
        assert len(CONFUSABLE_FROM) == len(CONFUSABLE_TO)
        assert len(set(CONFUSABLE_FROM)) == len(CONFUSABLE_FROM)
        assert all(ord(c) > 127 for c in CONFUSABLE_FROM)
        assert all("a" <= c <= "z" for c in CONFUSABLE_TO)
        assert all(ord(c) > 127 for c in INVISIBLE_CHARS)

    def test_ascii_fixed_point(self, spark):
        s = "plain ascii text 123."
        assert _sk(spark, s) == s

    def test_idempotent(self, spark):
        s = "cаsіnо and lot​tery"
        once = _sk(spark, s)
        assert _sk(spark, once) == once


class TestSkeleton:
    def test_cyrillic_fold(self, spark):
        assert _sk(spark, "cаsіnо") == "casino"

    def test_fullwidth_fold(self, spark):
        assert _sk(spark, "ｖｉａｇｒａ") == "viagra"

    def test_invisible_removed(self, spark):
        assert _sk(spark, "lot​t‌er‍y﻿") == "lottery"

    def test_uppercase_lookalikes_via_lower(self, spark):
        # uppercase Cyrillic А lowers to а first, then folds
        assert _sk(spark, "АЕ") == "ae"


class TestStatsAndEvasion:
    def test_counts(self, spark):
        df = spark.createDataFrame(
            [(1, "cаsіnо lot​tery"), (2, "clean")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in confusable_stats(df).collect()}
        assert rows[1]["n_confusable"] == 3
        assert rows[1]["n_invisible"] == 1
        assert rows[1]["is_obfuscated"] is True
        assert rows[2]["n_confusable"] == 0
        assert rows[2]["is_obfuscated"] is False

    def test_plain_hit_is_not_evasion(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "visit our cаsіnо now"),
                (2, "visit our casino now"),
            ],
            "doc_id long, text string",
        )
        terms = spark.createDataFrame([("casino",)], "term string")
        hits = skeleton_blocklist_evasion(docs, terms).collect()
        assert [(r["doc_id"], r["term"]) for r in hits] == [(1, "casino")]

    def test_zero_python_plan(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            confusable_stats(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan and "MapInPandas" not in plan
