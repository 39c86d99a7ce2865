"""Unit tests for few-shot exemplar and canary-insertion planning."""

import hashlib

from readur_spark.ml.evalprep import canary_plan, fewshot_plan


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )


class TestFewshot:
    def test_k_per_class_and_determinism(self, spark):
        rows = [(i, f"text {i}", "en" if i % 2 == 0 else "fr")
                for i in range(20)]
        df = _docs(spark, rows)
        out1 = sorted(map(tuple, fewshot_plan(df).collect()))
        out2 = sorted(map(tuple, fewshot_plan(df).collect()))
        assert out1 == out2
        by_class = {}
        for c, rank, _did, _md5 in out1:
            by_class.setdefault(c, []).append(rank)
        assert sorted(by_class) == ["en", "fr"]
        assert all(sorted(v) == [1, 2, 3] for v in by_class.values())

    def test_prompt_md5_matches_format(self, spark):
        df = _docs(spark, [(1, "hello", "en")])
        [r] = fewshot_plan(df, k=1).collect()
        expect = hashlib.md5(b"Q: hello\nA: en\n").hexdigest()
        assert r["prompt_md5"] == expect


class TestCanary:
    def test_splice_md5_and_membership(self, spark):
        rows = [(i, "abcdefghij", "en") for i in range(500)]
        df = _docs(spark, rows)
        out = canary_plan(df).collect()
        # ~2% of 500 = ~10 docs (md5 bucket, deterministic)
        assert 2 <= len(out) <= 30
        for r in out:
            assert r["canary"].startswith("canary-")
            assert 1 <= r["insert_at"] <= 10
            text = "abcdefghij"
            p = r["insert_at"] - 1
            planted = text[:p] + " " + r["canary"] + " " + text[p:]
            assert r["planted_md5"] == hashlib.md5(
                planted.encode()).hexdigest()

    def test_canaries_unique(self, spark):
        rows = [(i, "x" * 50, "en") for i in range(2000)]
        out = canary_plan(_docs(spark, rows)).collect()
        canaries = [r["canary"] for r in out]
        assert len(canaries) == len(set(canaries))
