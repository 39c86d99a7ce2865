"""Unit tests for SoftDedup weights, n-gram novelty, BM25 ranking, and
per-language percentile calibration — hand-computable corpora."""

from pyspark.sql import functions as F

from readur_spark.ml.infostats import ngram_novelty
from readur_spark.ml.softdedup import gram_type_hashes, soft_dedup_weights
from readur_spark.operators.posting import (
    build_postings,
    search_postings_bm25,
)

# eight distinct words -> exactly one 8-gram per line below
_LINE_A = "alpha beta gamma delta epsilon zeta eta theta"
_LINE_B = "one two three four five six seven eight"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSoftDedup:
    def test_gram_count_and_distinctness(self, spark):
        # 9 words -> 2 overlapping 8-grams; repeating the text doubles
        # nothing (types are DISTINCT per doc)
        df = _docs(spark, [(1, _LINE_A + " iota")])
        assert gram_type_hashes(df).count() == 2

    def test_short_doc_has_no_grams(self, spark):
        df = _docs(spark, [(1, "only seven words are present right here")])
        assert gram_type_hashes(df).count() == 0

    def test_exact_k_fold_duplicate_weight(self, spark):
        # three exact copies + one unique doc: copies share their one
        # gram (df = 3) -> commonness 3000 milli, weight 10^9//3000
        df = _docs(
            spark,
            [(1, _LINE_A), (2, _LINE_A), (3, _LINE_A), (4, _LINE_B)],
        )
        out = {r["doc_id"]: r for r in soft_dedup_weights(df).collect()}
        for d in (1, 2, 3):
            assert out[d]["commonness_mfp"] == 3000
            assert out[d]["weight_ufp"] == 1_000_000_000 // 3000
        assert out[4]["commonness_mfp"] == 1000
        assert out[4]["weight_ufp"] == 1_000_000

    def test_gramless_doc_gets_full_weight(self, spark):
        df = _docs(spark, [(1, "short"), (2, _LINE_A)])
        out = {r["doc_id"]: r for r in soft_dedup_weights(df).collect()}
        assert out[1]["n_gram_types"] == 0
        assert out[1]["weight_ufp"] == 1_000_000


class TestNgramNovelty:
    def _with_url(self, df):
        return df.withColumn(
            "url", F.concat(F.lit("u"), F.col("doc_id").cast("string"))
        )

    def test_duplicate_pair_one_novel_one_not(self, spark):
        df = self._with_url(_docs(spark, [(1, _LINE_A), (2, _LINE_A)]))
        out = {r["doc_id"]: r for r in ngram_novelty(df).collect()}
        rates = sorted(r["novelty_ufp"] for r in out.values())
        # exactly one of the two copies is first in training order
        assert rates == [0, 1_000_000]
        assert all(r["n_gram_types"] == 1 for r in out.values())

    def test_unique_docs_fully_novel(self, spark):
        df = self._with_url(_docs(spark, [(1, _LINE_A), (2, _LINE_B)]))
        out = ngram_novelty(df).collect()
        assert all(r["novelty_ufp"] == 1_000_000 for r in out)

    def test_short_docs_excluded(self, spark):
        df = self._with_url(_docs(spark, [(1, "tiny"), (2, _LINE_A)]))
        assert ngram_novelty(df).count() == 1


class TestBM25:
    def test_saturation_and_length_norm(self, spark):
        # doc 1: "q" once among 10 tokens; doc 2: "q" 5 times among 10;
        # doc 3: "q" once among 30 tokens; docs 4-8 lack the term —
        # idf is integer-bit (floor log2), so df/N must be small enough
        # that (N - df + 1/2)/(df + 1/2) >= 2^1 for a nonzero idf.
        rows = [
            (1, "q " + "x " * 9),
            (2, "q q q q q " + "x " * 5),
            (3, "q " + "x " * 29),
        ] + [(i, "y " * 10) for i in range(4, 9)]
        df = _docs(spark, [(i, t.strip()) for i, t in rows])
        postings = build_postings(df, "doc_id", "text")
        out = {
            r["doc_id"]: r["rank_bm25_fp"]
            for r in search_postings_bm25(postings, ["q"], 8).collect()
        }
        assert set(out) == {1, 2, 3}
        # more tf ranks higher, but sublinearly (< 5x)
        assert out[1] < out[2] < 5 * out[1]
        # longer doc with same tf ranks lower
        assert out[3] < out[1]

    def test_and_semantics(self, spark):
        df = _docs(spark, [(1, "a b"), (2, "a"), (3, "b")])
        postings = build_postings(df, "doc_id", "text")
        out = search_postings_bm25(postings, ["a", "b"], 3).collect()
        assert [r["doc_id"] for r in out] == [1]

    def test_ubiquitous_term_scores_near_zero(self, spark):
        # df == N: true BM25 idf is log2(1 + 0.5/(N+0.5)) — tiny but
        # nonzero at small N. With identical tf and dl the ranks are
        # equal, and the idf stays under one bit (16 sixteenths).
        df = _docs(spark, [(1, "a x"), (2, "a y"), (3, "a z")])
        postings = build_postings(df, "doc_id", "text")
        out = [r["rank_bm25_fp"]
               for r in search_postings_bm25(postings, ["a"], 3).collect()]
        assert len(set(out)) == 1
        # tfpart here is exactly 10^6 (tf=1, dl=avgdl) -> rank < 16e6
        assert 0 <= out[0] < 16_000_000


class TestQualityPercentile:
    def test_percentile_bounds_and_keep_rule(self, spark):
        from readur_spark.queries.registry import queries

        out = queries()["quality_percentile_by_lang"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(out) > 0
        for r in out:
            assert 0 <= r["pctile_ufp"] <= 1_000_000
            assert r["keep_top_half"] == int(r["pctile_ufp"] >= 500_000)
        # within each language, about half is kept (± rounding)
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r["keep_top_half"])
        for lang, keeps in by_lang.items():
            if len(keeps) >= 4:
                frac = sum(keeps) / len(keeps)
                assert 0.3 <= frac <= 0.7, (lang, frac)


class TestCollocations:
    def test_injected_phrase_tops_pmi(self, spark):
        from readur_spark.ml.collocations import bigram_pmi

        # "aa bb" always together (PMI high); "cc" pairs with varying
        # successors (PMI ~ 0); filler spreads mass
        rows = [(i, "aa bb cc w%d x y z" % (i % 7)) for i in range(20)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = bigram_pmi(df, min_count=5, top_k=10).collect()
        assert out, "no collocations found"
        top = out[0]
        assert (top["x"], top["y"]) == ("aa", "bb")
        assert top["c_xy"] == 20
        assert top["pmi_bits"] >= 2

    def test_min_count_gate(self, spark):
        from readur_spark.ml.collocations import bigram_pmi

        rows = [(1, "rare pair only once here now")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        assert bigram_pmi(df, min_count=5, top_k=10).count() == 0


class TestTextRank:
    def test_hub_token_ranks_first(self, spark):
        from readur_spark.ml.collocations import textrank_keywords

        # "hub" neighbors every other token; spokes touch only the hub
        # (alphabetic spokes — digits are token separators)
        rows = [(i, "hub %s" % (chr(ord("b") + i) * 2)) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = textrank_keywords(df, num_iters=4, top_k=20).collect()
        assert out[0]["token"] == "hub"
        assert all(out[0]["rank"] > r["rank"] for r in out[1:])

    def test_rank_mass_conserved_order(self, spark):
        from readur_spark.ml.collocations import textrank_keywords

        # symmetric pair graph: both tokens get identical ranks
        df = spark.createDataFrame(
            [(1, "aa bb"), (2, "aa bb")], "doc_id long, text string"
        )
        out = textrank_keywords(df, num_iters=3, top_k=5).collect()
        assert len(out) == 2
        assert out[0]["rank"] == out[1]["rank"]


class TestSaltedTopK:
    def test_identical_to_single_window(self, spark):
        from pyspark.sql import Window
        from readur_spark.operators.partitioning import topk_per_group_salted

        # skewed: group "big" has 200 rows, "small" has 3
        rows = [(i, "big", i * 7 % 101) for i in range(200)] + [
            (1000 + i, "small", i) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "id long, g string, score long")
        order = [F.col("score").desc(), F.col("id")]
        got = {
            (r["g"], r["rank"]): r["id"]
            for r in topk_per_group_salted(
                df, ["g"], order, 5, salt_expr=F.col("id") % 7
            ).collect()
        }
        w = Window.partitionBy("g").orderBy(*order)
        want = {
            (r["g"], r["rank"]): r["id"]
            for r in df.withColumn(
                "rank", F.row_number().over(w).cast("long")
            ).filter(F.col("rank") <= 5).collect()
        }
        assert got == want
        assert len(want) == 5 + 3  # small group yields all 3 rows

    def test_salted_plan_has_two_windows(self, spark):
        from readur_spark.operators.partitioning import topk_per_group_salted

        df = spark.createDataFrame(
            [(i, "g", i) for i in range(10)], "id long, g string, score long"
        )
        out = topk_per_group_salted(
            df, ["g"], [F.col("score").desc(), F.col("id")], 2,
            salt_expr=F.col("id") % 4,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window") >= 2  # phase 1 (salted) + phase 2


class TestSession2Plans:
    """Plan pins for the session-2 operators: every one is pure
    Catalyst (zero Python evals — the md5/conv/translate/bin kernels
    are all JVM expressions) and keeps its shuffle count at the
    designed number."""

    KEYS_MAX_SHUFFLES = {
        "dedup_soft_weights": 6,
        "dedup_soft_sample": 8,
        "ngram_novelty_rate": 6,
        "split_leakage_report": 8,
        "search_rank_bm25": 8,
        "collocations_pmi": 8,
        "dataset_split_assign": 0,
        "gopher_line_flags": 0,
        "gopher_symbol_alpha_flags": 0,
        "idn_homograph_pairs": 6,
        "host_commonness_rollup": 8,
        "quality_threshold_by_lang": 10,
    }

    def test_no_python_and_bounded_shuffles(self, spark):
        from readur_spark.plans.audit import shuffle_count
        from readur_spark.queries.registry import queries

        qs = queries()
        bad = []
        for key, max_sh in self.KEYS_MAX_SHUFFLES.items():
            df = qs[key](spark, "/root/testdata/sf0.001")
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "Python" in plan or "ArrowEval" in plan:
                bad.append((key, "python-op in plan"))
            n = shuffle_count(df)
            if n > max_sh:
                bad.append((key, f"{n} shuffles > {max_sh}"))
        assert bad == [], bad
