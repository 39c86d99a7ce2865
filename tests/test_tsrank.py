"""ts_rank kernel goldens — hand-computed from the tsrank.c formulas
(word_distance, calc_rank_or's quadratic decay, calc_rank_and's
1-prod(1-curw) combination), independent arithmetic from the kernel."""

from __future__ import annotations

import math

from readur_spark.kernels.tsrank import (
    MAXNUMPOS,
    calc_rank_and,
    calc_rank_or,
    simple_tsvector,
    ts_rank_simple,
    word_distance,
)


def wd(d):
    return 1e-30 if d > 100 else 1.0 / (1.005 + 0.05 * math.exp(d * d / 1500.0))


class TestTsvector:
    def test_positions_one_based_and_tokenized(self):
        assert simple_tsvector("a spark b spark") == {
            "a": [1], "spark": [2, 4], "b": [3]
        }

    def test_lowercase_and_nonalnum_split(self):
        assert simple_tsvector("Spark-JOIN x2") == {
            "spark": [1], "join": [2], "x2": [3]
        }

    def test_position_cap_256(self):
        tsv = simple_tsvector(" ".join(["t"] * 300))
        assert len(tsv["t"]) == MAXNUMPOS
        assert tsv["t"][-1] == 256

    def test_position_clamp_16383_collapses(self):
        text = " ".join(f"w{i}" for i in range(16380)) + " z z z z z z"
        tsv = simple_tsvector(text)
        # z occupies positions 16381..16386 pre-clamp; 16383 collapses
        assert tsv["z"] == [16381, 16382, 16383]


class TestRankFormulas:
    def test_single_occurrence_or(self):
        # one occurrence: (0.1 + 0.1 - 0.1)/C / size=1
        want = 0.1 / 1.64493406685
        assert abs(ts_rank_simple("x spark y", ["spark"]) - want) < 1e-12

    def test_multi_occurrence_or_quadratic_decay(self):
        want = 0.1 * (1 + 1 / 4 + 1 / 9) / 1.64493406685
        got = ts_rank_simple("spark a spark b spark", ["spark"])
        assert abs(got - want) < 1e-12

    def test_or_divides_by_query_size(self):
        # two single-occurrence terms in OR mode: (r1 + r2)/2
        one = 0.1 / 1.64493406685
        got = ts_rank_simple("spark join", ["spark", "join"], mode="or")
        assert abs(got - one) < 1e-12  # (one + one)/2 == one

    def test_and_single_pair_proximity(self):
        # spark@2, join@4 → dist 2 → rank = 0.1*sqrt(wd(2))
        want = 0.1 * math.sqrt(wd(2))
        got = ts_rank_simple("a spark b join", ["spark", "join"])
        assert abs(got - want) < 1e-12

    def test_and_combination_is_one_minus_product(self):
        # spark@1, join@3 and join@5 → dists 2, 4
        c1, c2 = 0.1 * math.sqrt(wd(2)), 0.1 * math.sqrt(wd(4))
        want = 1.0 - (1.0 - c1) * (1.0 - c2)
        got = ts_rank_simple("spark a join b join", ["spark", "join"])
        assert abs(got - want) < 1e-12

    def test_and_distance_over_100_near_floor(self):
        text = "spark " + " ".join(f"f{i}" for i in range(150)) + " join"
        got = ts_rank_simple(text, ["spark", "join"])
        want = 0.1 * math.sqrt(1e-30)
        assert abs(got - want) < 1e-18

    def test_and_missing_term_floors(self):
        assert ts_rank_simple("spark only here", ["spark", "join"]) == 1e-20

    def test_proximity_orders_above_distance(self):
        near = ts_rank_simple("spark join tail tail", ["spark", "join"])
        far = ts_rank_simple(
            "spark a b c d e f g h i j join", ["spark", "join"]
        )
        assert near > far

    def test_word_distance_shape(self):
        assert word_distance(101) == 1e-30
        assert word_distance(1) > word_distance(10) > word_distance(100)

    def test_raw_calc_helpers(self):
        assert calc_rank_and([[1], None]) == -1.0  # no pair → floor later
        assert calc_rank_or([None]) == 0.0
