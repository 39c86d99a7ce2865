"""Plan-shape audit for every session-11 query: no Python stages
except where an Arrow kernel is the design (tables / keyframes), and
no unexpected plan shapes. Mirrors the per-session plan-pin suites."""

import pytest

import __spark_entry__ as e

SF = "/root/testdata/sf0.001"

# queries whose design INCLUDES one mapInPandas Arrow stage
ARROW_OK = {
    "table_relational_constructed",   # real HTML parser kernel
    "table_column_types",             # composes the parser
    "video_keyframe_select",          # real PNG encode/decode + dHash
    "ann_lsh_recall",                 # bucket assignment Arrow pass
    "anchor_query_pairs",             # real anchor-text parser kernel
}

PURE_CATALYST = [
    "qc_lexical_richness",
    "secrets_entropy_constructed",
    "snm_candidate_pairs",
    "contrastive_hard_negatives",
    "span_corruption_plan",
    "fim_split_plan",
    "rendezvous_shard_assign",
    "quality_threshold_otsu",
    "mixture_unimax_plan",
    "padding_efficiency_report",
    "nb_reliability_table",
    "nb_isotonic_calibration",
    "fewshot_prompt_plan",
    "canary_insertion_plan",
    "negative_sampling_table",
    "host_mirror_constructed",
    "shard_balance_gini",
    "conformal_quality_threshold",
    "search_cascade_rerank",
    "corpus_datasheet",
]


def _plan(spark, key):
    df = e.queries()[key](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("key", PURE_CATALYST)
def test_no_python_in_catalyst_queries(spark, key):
    plan = _plan(spark, key)
    assert "EvalPython" not in plan, key
    assert "MapInPandas" not in plan, key


@pytest.mark.parametrize("key", sorted(ARROW_OK))
def test_arrow_queries_have_exactly_one_python_boundary_kind(spark, key):
    plan = _plan(spark, key)
    # Arrow-batched mapInPandas only — never row-at-a-time Python UDFs
    assert "BatchEvalPython" not in plan, key
