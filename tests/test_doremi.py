"""DoReMi-style domain reweighting (ml/doremi.py).

The registered query is value-hash-checked against its DuckDB twin by
test_entry_contract.py — but the sf0.01 corpus is domain-homogeneous
(every excess rounds to ~0 centi-bits, every tilt to 2^0), so these
tests construct a skewed corpus that genuinely exercises the
exponentiated-gradient arm: a hard domain must gain weight, quotas
must still sum exactly to the budget, and the cap must bound the
tilt.
"""

import pytest

from pyspark.sql import functions as F

from readur_spark.ml.doremi import (
    DOREMI_BUDGET,
    DOREMI_CAP,
    DOREMI_TAU,
    domain_excess_losses,
    doremi_plan,
    eg_domain_weights,
)
from readur_spark.ml.kneser import kn_bigram_surprisal


@pytest.fixture(scope="module")
def skewed(spark):
    """'clean' = one repeated predictable bigram stream (low KN
    surprisal); 'hard' = all-distinct token pairs (every bigram seen
    once, high discount mass). Clean dominates the pooled reference,
    so hard's excess is large and positive."""
    import itertools
    import string

    rows = []
    for i in range(40):
        rows.append((i, "the cat sat on the mat " * 30, "en", "clean", 0))
    # alphabetic-only unique tokens: tokenize_alpha splits on
    # non-letters, so digit-bearing tokens would collapse
    toks = [
        "".join(t)
        for t in itertools.islice(
            itertools.product(string.ascii_lowercase, repeat=3), 160
        )
    ]
    for i in range(8):
        body = " ".join(toks[i * 20:(i + 1) * 20])
        rows.append((1000 + i, body, "en", "hard", 0))
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING,"
        " n_chars INT"
    )


class TestExcess:
    def test_hard_domain_has_positive_excess(self, skewed):
        per_doc = kn_bigram_surprisal(skewed)
        ex = {
            r["domain"]: r["excess_cbits"]
            for r in domain_excess_losses(per_doc, skewed).collect()
        }
        assert ex["clean"] == 0  # at or below the pooled reference
        assert ex["hard"] >= DOREMI_TAU  # at least one doubling

    def test_reference_is_pooled_not_macro_averaged(self, skewed):
        """The clamp baseline weights domains by bigram count (the
        model's own token stream), so the dominant clean domain pins
        the reference near its own loss."""
        per_doc = kn_bigram_surprisal(skewed)
        losses = {
            r["domain"]: r["loss_cbits"]
            for r in domain_excess_losses(per_doc, skewed).collect()
        }
        assert losses["hard"] > losses["clean"]


class TestTilt:
    def test_doubling_per_tau(self, spark):
        excess = spark.createDataFrame(
            [("a", 0, 0), ("b", 0, DOREMI_TAU - 1), ("c", 0, DOREMI_TAU),
             ("d", 0, 3 * DOREMI_TAU)],
            "domain STRING, loss_cbits LONG, excess_cbits LONG",
        )
        w = {r["domain"]: r["score"] for r in eg_domain_weights(excess).collect()}
        assert w["a"] == 1000 and w["b"] == 1000
        assert w["c"] == 2000
        assert w["d"] == 8000

    def test_cap_bounds_the_tilt(self, spark):
        excess = spark.createDataFrame(
            [("x", 0, DOREMI_TAU * DOREMI_CAP),
             ("y", 0, DOREMI_TAU * DOREMI_CAP * 50)],
            "domain STRING, loss_cbits LONG, excess_cbits LONG",
        )
        w = {r["domain"]: r["score"] for r in eg_domain_weights(excess).collect()}
        assert w["x"] == 1000 << DOREMI_CAP
        assert w["y"] == 1000 << DOREMI_CAP  # capped, no overflow


class TestPlan:
    def test_quotas_sum_exactly_and_favor_hard(self, skewed):
        out = doremi_plan(skewed).collect()
        assert sum(r["quota"] for r in out) == DOREMI_BUDGET
        by = {r["domain"]: r for r in out}
        # hard's tilt is >= 2x, so its quota must exceed clean's
        assert by["hard"]["score"] >= 2 * by["clean"]["score"]
        assert by["hard"]["quota"] > by["clean"]["quota"]

    def test_quota_monotone_in_score(self, skewed):
        out = sorted(doremi_plan(skewed).collect(), key=lambda r: r["score"])
        quotas = [r["quota"] for r in out]
        assert quotas == sorted(quotas)
