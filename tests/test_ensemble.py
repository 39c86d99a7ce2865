"""Quality-gate agreement matrix (ml/ensemble.py).

Full DuckDB value-hash runs in test_entry_contract.py; here: Cohen's
kappa hand-computed from a constructed contingency table, the
perfect/chance fixed points, and non-degenerate margins at fixture
scale."""

from __future__ import annotations

from readur_spark.ml.ensemble import agreement_matrix

SF = "/root/testdata/sf0.001"


def _flags(spark, rows):
    return spark.createDataFrame(rows, ["g_c4", "g_read", "g_ttr"])


def _pair(out, a, b):
    return next(
        r for r in out if r["signal_a"] == a and r["signal_b"] == b
    )


class TestKappa:
    def test_hand_computed(self, spark):
        # c4 vs read: bk=2 bd=1 disagree=1; k1=3 k2=2, n=4
        # pe_num = 3*2 + 1*2 = 8 ; po_num = 3
        # kappa = 1000*(4*3 - 8) div (16 - 8) = 500
        rows = [(1, 1, 0), (1, 1, 0), (1, 0, 0), (0, 0, 0)]
        r = _pair(agreement_matrix(_flags(spark, rows)).collect(),
                  "c4", "read")
        assert (r["n_both_keep"], r["n_both_drop"], r["n_disagree"]) == (
            2, 1, 1)
        assert r["agree_milli"] == 750
        assert r["kappa_milli"] == 500

    def test_perfect_agreement(self, spark):
        rows = [(1, 1, 1), (0, 0, 0), (1, 1, 1), (0, 0, 0)]
        out = agreement_matrix(_flags(spark, rows)).collect()
        assert all(r["kappa_milli"] == 1000 for r in out)
        assert all(r["agree_milli"] == 1000 for r in out)

    def test_independent_gates_score_near_zero(self, spark):
        # g_read alternates independently of g_c4 in a balanced way:
        # observed agreement equals chance -> kappa exactly 0
        rows = [(1, 1, 0), (1, 0, 0), (0, 1, 0), (0, 0, 0)]
        r = _pair(agreement_matrix(_flags(spark, rows)).collect(),
                  "c4", "read")
        assert r["kappa_milli"] == 0

    def test_fixture_margins_populated(self, spark):
        from readur_spark.queries.registry import queries

        out = queries()["qc_gate_agreement"](spark, SF).collect()
        assert len(out) == 3
        for r in out:
            # every gate keeps some and drops some: no vacuous kappa
            assert 0 < r["n_both_keep"] + r["n_disagree"] < r["n"]
            assert r["n_disagree"] > 0
