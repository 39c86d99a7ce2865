"""Plan pins for the session-3 operators.

The relational ones (langid, containment, keep-longest) are pure
Catalyst — zero Python evals — with bounded shuffle counts; the two
markdown extraction surfaces are pinned to exactly ONE Arrow/Python
stage each (the payload crosses the Python boundary once, and nothing
else does)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


class TestSession3Plans:
    KEYS_MAX_SHUFFLES = {
        "langid_chartrigram_nb": 12,
        "langid_margin_gate": 12,
        "dedup_containment_pairs": 8,
    }

    def test_no_python_and_bounded_shuffles(self, spark):
        from readur_spark.plans.audit import shuffle_count
        from readur_spark.queries.registry import queries

        qs = queries()
        bad = []
        for key, max_sh in self.KEYS_MAX_SHUFFLES.items():
            df = qs[key](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "Python" in plan or "ArrowEval" in plan:
                bad.append((key, "python-op in plan"))
            n = shuffle_count(df)
            if n > max_sh:
                bad.append((key, f"{n} shuffles > {max_sh}"))
        assert bad == [], bad

    def test_keep_longest_payload_free_window(self, spark):
        """The representative window runs over the slim
        (id, comp, n_chars) frame: no Python ops and the text column
        never appears past the length projection."""
        from readur_spark.queries.registry import queries

        df = queries()["neardup_keep_longest"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "ArrowEval" not in plan
        assert plan.count("Window") == 1

    def test_markdown_surfaces_single_python_stage(self, spark):
        from readur_spark.queries.registry import queries

        qs = queries()
        for key in ("extract_tables_markdown", "extract_markdown"):
            df = qs[key](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_py = plan.count("MapInPandas")
            assert n_py == 1, (key, n_py, plan)


class TestCascadePlan:
    def test_stage1_is_take_ordered(self, spark):
        import __spark_entry__ as e

        plan = (
            e.queries()["search_cascade_rerank"](
                spark, "/root/testdata/sf0.001"
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the corpus-sized frame reaches a TakeOrdered, not a global
        # single-partition window; no Python anywhere
        assert "TakeOrdered" in plan
        assert "EvalPython" not in plan
