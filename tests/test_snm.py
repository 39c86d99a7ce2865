"""Unit tests for blocked sorted-neighborhood candidate generation —
multi-pass recall semantics and the no-Python / no-join plan shape."""

from readur_spark.ml.snm import snm_candidate_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSNM:
    def test_tail_edit_caught_by_fwd_pass(self, spark):
        # identical 40-char prefix, edits only after the key → lev 0
        base = "the quick brown fox jumps over the lazy dog " * 2
        df = _docs(
            spark,
            [(1, base + "alpha ending"), (2, base + "beta ending"),
             (3, "zzz completely unrelated content here zzz")],
        )
        pairs = snm_candidate_pairs(df).collect()
        fwd = {(r["a_id"], r["b_id"]): r for r in pairs if r["pass"] == "fwd"}
        assert (1, 2) in fwd
        assert fwd[(1, 2)]["lev"] == 0 and fwd[(1, 2)]["verified"]

    def test_head_edit_caught_by_rev_pass(self, spark):
        # same long tail, different first word → fwd keys diverge at
        # char 1 (different blocks), but reversed keys are identical
        tail = " shared tail of this record stays word for word the same"
        df = _docs(
            spark,
            [(1, "alpha" + tail), (2, "omega" + tail),
             (3, "unrelated filler text goes here instead")],
        )
        pairs = snm_candidate_pairs(df).collect()
        rev = {(r["a_id"], r["b_id"]) for r in pairs if r["pass"] == "rev"
               and r["verified"]}
        fwd = {(r["a_id"], r["b_id"]) for r in pairs if r["pass"] == "fwd"
               and r["verified"]}
        assert (1, 2) in rev or (2, 1) in rev
        assert (1, 2) not in fwd and (2, 1) not in fwd

    def test_window_bound(self, spark):
        # 4 docs in one block: window w=3 pairs each with next 2 only
        rows = [(i, f"aaaa record number {i:02d}") for i in range(4)]
        df = _docs(spark, rows)
        fwd = [(r["a_id"], r["b_id"]) for r in snm_candidate_pairs(df).collect()
               if r["pass"] == "fwd"]
        assert (0, 3) not in fwd  # 3 hops apart — outside the window
        assert (0, 1) in fwd and (0, 2) in fwd and (1, 2) in fwd

    def test_plan_no_python_no_join(self, spark):
        df = _docs(spark, [(1, "a"), (2, "b")])
        plan = (
            snm_candidate_pairs(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "EvalPython" not in plan
        assert "Join" not in plan  # pure window sweep, no pairwise join
