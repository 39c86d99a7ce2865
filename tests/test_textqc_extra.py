"""ml/textqc.py compression-ratio signal."""

from __future__ import annotations

import zlib

from readur_spark.ml.textqc import compression_ratio_table


DOCS = [
    (1, "the " * 500),                               # boilerplate: tiny ratio
    (2, "The quick brown fox jumps over the lazy dog. " * 20),
    (3, "k9$Qz!vX2@pL7#mW4&nB8*rT5^cJ1(dF6)gH3-sY0_aE" * 12),  # gibberish
    (4, ""),                                         # empty: excluded
]


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


class TestCompressionRatio:
    def test_matches_zlib_exactly(self, spark):
        got = {
            r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_centi"])
            for r in compression_ratio_table(_frame(spark)).collect()
        }
        for doc_id, text in DOCS:
            if not text:
                assert doc_id not in got
                continue
            nb = len(text.encode())
            nc = len(zlib.compress(text.encode(), 6))
            assert got[doc_id] == (nb, nc, (100 * nc) // nb)

    def test_orders_boilerplate_below_prose_below_gibberish(self, spark):
        got = {
            r["doc_id"]: r["ratio_centi"]
            for r in compression_ratio_table(_frame(spark)).collect()
        }
        assert got[1] < got[2] < got[3]


class TestReadability:
    def _table(self, spark, rows):
        from readur_spark.ml.textqc import readability_table

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r.asDict() for r in readability_table(df).collect()}

    def test_hand_computed_counts(self, spark):
        """'The cat sat. It ran!' → 5 words, 2 sentences; syllables:
        the(1) cat(1) sat.(1) it(1) ran!(1) = 5."""
        got = self._table(spark, [(1, "The cat sat. It ran!")])
        r = got[1]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
        # FK milli: (390*5)//2 + (11800*5)//5 - 15590 = 975+11800-15590
        assert r["fk_milligrade"] == 975 + 11800 - 15590
        # FRE milli: 206835 - (1015*5)//2 - (84600*5)//5
        assert r["fre_milli"] == 206835 - 2537 - 84600
        assert r["fre_band"] == "very_easy"

    def test_silent_e_and_vowel_groups(self, spark):
        """'blue' = 1 group ('ue') → no silent-e drop (groups<2) → 1.
        'because' = groups e,au,e = 3, trailing e → 2.
        'rhythm' = groups y → 1."""
        got = self._table(spark, [(1, "blue because rhythm")])
        assert got[1]["n_syllables"] == 1 + 2 + 1

    def test_fragment_counts_one_sentence(self, spark):
        got = self._table(spark, [(1, "no terminal punctuation here")])
        assert got[1]["n_sentences"] == 1

    def test_empty_docs_excluded(self, spark):
        got = self._table(spark, [(1, "word"), (2, "   "), (3, "")])
        assert sorted(got) == [1]

    def test_plan_has_no_explode_or_exchange(self, spark):
        """Readability is a pure projection — the corpus neither
        explodes nor shuffles."""
        from readur_spark.ml.textqc import readability_table

        df = spark.createDataFrame([(1, "a. b c")], "doc_id long, text string")
        plan = readability_table(df)._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan, plan
        assert "Exchange" not in plan, plan


class TestHistogramQuantiles:
    def test_hand_computed_quantiles(self, spark):
        """10 docs of lengths 1..10 in one lang: p50 = 5 (cum 5 >= 5),
        p90 = 9, p99 = 10."""
        from readur_spark.queries.analytics import (
            length_histogram_quantiles,
        )
        import os, tempfile

        docs = spark.createDataFrame(
            [(i, "en", i) for i in range(1, 11)],
            "doc_id long, lang string, n_chars long",
        )
        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r for r in length_histogram_quantiles(spark, d).collect()}
        r = out["en"]
        assert (r["n_docs"], r["p50"], r["p90"], r["p99"]) == (10, 5, 9, 10)

    def test_no_row_sort_in_plan(self, spark):
        """The plan sorts the slim histogram, never the corpus rows:
        every Sort in the physical plan sits above the first hash
        aggregate."""
        from readur_spark.queries.analytics import (
            length_histogram_quantiles,
        )

        out = length_histogram_quantiles(spark, "/root/testdata/sf0.01")
        plan = out._jdf.queryExecution().executedPlan().toString()
        first_agg = plan.find("HashAggregate")
        first_sort = plan.find("Sort ")
        assert first_agg != -1
        assert first_sort == -1 or first_sort < first_agg or "n_chars" in plan[first_sort:first_sort+200]


class TestCmsHeavyHitters:
    def test_overestimate_property_under_collisions(self, spark):
        # vocab (3000) >> width (1024): collisions are guaranteed, so
        # some estimates exceed truth; none may undershoot, and the
        # genuinely heavy token must surface at rank 1 with an exact
        # (collision-free-min) or over-estimate.
        from readur_spark.ml.textqc import cms_heavy_hitters

        def alpha(n):  # digits->letters: the splitter keeps [a-z] only
            return "t" + "".join(chr(97 + int(c)) for c in str(n))

        docs = spark.createDataFrame(
            [(0, "common " * 500)]
            + [(i, " ".join(alpha(i * 1000 + j) for j in range(30)))
               for i in range(1, 101)],
            "doc_id long, text string",
        )
        rows = cms_heavy_hitters(docs).collect()
        assert all(r["est"] >= r["n_exact"] for r in rows)
        top = min(rows, key=lambda r: r["rnk"])
        assert top["token"] == "common" and top["n_exact"] == 500
        assert top["est"] >= 500

    def test_counter_table_is_bounded(self, spark):
        # the sketch's state is w*d counters no matter the corpus; the
        # estimate join touches counters, never the token stream twice
        from readur_spark.ml.textqc import CMS_D, CMS_W, _cms_bucket
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("abc",), ("zzz",)], "token string")
        out = df.select(
            *[_cms_bucket(F.col("token"), i).alias(f"b{i}")
              for i in range(1, CMS_D + 1)]
        ).collect()
        for r in out:
            assert all(0 <= r[f"b{i}"] < CMS_W for i in range(1, CMS_D + 1))
