"""Kneser-Ney bigram surprisal (ml/kneser.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: the
exact-rational formula replayed by hand on a tiny corpus, the
continuation-count property KN exists for, short-doc exclusion, and
the zero-Python plan."""

from __future__ import annotations

from readur_spark.ml.kneser import doc_bigrams, kn_bigram_surprisal

SF = "/root/testdata/sf0.001"


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


class TestFormula:
    def test_hand_computed_corpus(self, spark):
        # corpus: d0 = "a b a b", d1 = "a c"
        # c12: (a,b)=2 (b,a)=1 (a,c)=1; Nbt=3
        # fwd: a -> c1=3, n1p=2; b -> c1=1, n1p=1; rev: a=b=c=1
        # bits(a,b): num=5*3+3*2*1=21 den=36 -> 36 div 21 = 1 -> 0
        # bits(b,a): num=1*3+3*1*1=6  den=12 -> 2 -> 1
        # bits(a,c): num=1*3+3*2*1=9  den=36 -> 4 -> 2
        out = {
            r["doc_id"]: r
            for r in kn_bigram_surprisal(_docs(spark, "a b a b", "a c")).collect()
        }
        assert out[0]["n_bigrams"] == 3
        assert out[0]["kn_sum_bits"] == 1  # 0 + 1 + 0
        assert out[0]["kn_mean_cbits"] == 33  # 100 div 3
        assert out[1]["n_bigrams"] == 1
        assert out[1]["kn_sum_bits"] == 2
        assert out[1]["kn_mean_cbits"] == 200

    def test_continuation_count_property(self, spark):
        # 'm' follows three distinct words; 'q' follows one. For equal
        # c12/c1, the many-context word is CHEAPER after 'z' — the
        # San-Francisco asymmetry raw bigram counts can't express.
        docs = _docs(spark, "z m", "a m", "b m", "z q")
        out = {r["doc_id"]: r["kn_sum_bits"]
               for r in kn_bigram_surprisal(docs).collect()}
        assert out[0] < out[3]

    def test_short_docs_excluded(self, spark):
        out = kn_bigram_surprisal(_docs(spark, "single", "", "two words")).collect()
        assert sorted(r["doc_id"] for r in out) == [2]


class TestBigrams:
    def test_pairing_and_lowercase(self, spark):
        rows = doc_bigrams(_docs(spark, "The cat, the Hat!")).collect()
        assert [(r["w1"], r["w2"]) for r in rows] == [
            ("the", "cat"), ("cat", "the"), ("the", "hat"),
        ]


class TestPercentileChain:
    def test_each_language_keeps_its_own_half(self, spark):
        from readur_spark.queries.registry import queries

        rows = queries()["kn_percentile_by_lang"](spark, SF).collect()
        by_lang: dict[str, list] = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r)
        assert len(by_lang) > 1
        for lang, rs in by_lang.items():
            kept = [r for r in rs if r["keep_top_half"]]
            # ~half per language (integer-percentile boundary slack)
            assert abs(len(kept) - len(rs) / 2) <= 1, lang
            # every kept doc is at least as fluent as every dropped one
            worst_kept = max(r["kn_mean_cbits"] for r in kept)
            dropped = [r for r in rs if not r["keep_top_half"]]
            if dropped:
                best_dropped = min(r["kn_mean_cbits"] for r in dropped)
                assert worst_kept <= best_dropped, lang


class TestPlan:
    def test_no_python_ops(self, spark):
        from readur_spark.queries.registry import queries

        for key in ("qc_kn_bigram_surprisal", "kn_percentile_by_lang"):
            df = queries()[key](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "Python" not in plan and "ArrowEval" not in plan, key
