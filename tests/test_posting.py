"""Posting-list index: build correctness and scan-vs-index equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from readur_spark.operators.posting import (
    build_postings,
    document_frequencies,
    search_postings_and,
)


def _docs(spark):
    rows = [
        (1, "spark join plan spark"),
        (2, "join only here"),
        (3, "spark alone"),
        (4, "spark join spark join"),
        (5, ""),
        (6, "double  space spark join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_build_postings_tf(spark):
    p = {(r.token, r.doc_id): r.tf for r in build_postings(_docs(spark), "doc_id", "text").collect()}
    assert p[("spark", 1)] == 2
    assert p[("join", 4)] == 2
    assert p[("spark", 3)] == 1
    assert ("", 5) not in p and ("", 6) not in p  # empty tokens dropped


def test_document_frequencies(spark):
    postings = build_postings(_docs(spark), "doc_id", "text")
    df = {r.token: r.df for r in document_frequencies(postings).collect()}
    assert df["spark"] == 4 and df["join"] == 4 and df["alone"] == 1


def test_index_equals_scan(spark):
    docs = _docs(spark)
    postings = build_postings(docs, "doc_id", "text")
    via_index = {
        r.doc_id: r.rank_tf
        for r in search_postings_and(postings, ["spark", "join"]).collect()
    }
    toks = F.split("text", " ")
    scan = docs.filter(
        F.array_contains(toks, "spark") & F.array_contains(toks, "join")
    )
    expected_ids = {r.doc_id for r in scan.collect()}
    assert set(via_index) == expected_ids == {1, 4, 6}
    assert via_index[4] == 4  # 2×spark + 2×join
    assert via_index[1] == 3


def test_build_postings_english(spark):
    from readur_spark.operators.posting import build_postings_english

    rows = [
        (1, "the queries join quickly"),
        (2, "a query joins the table"),
        (3, "querying joined tables"),
        (4, "nothing relevant here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = {(r.token, r.doc_id): r.tf
         for r in build_postings_english(docs, "doc_id", "text").collect()}
    # inflections collapse to the Porter2 lexeme
    assert p[("queri", 1)] == 1 and p[("queri", 2)] == 1 and p[("queri", 3)] == 1
    assert p[("join", 1)] == 1 and p[("join", 2)] == 1 and p[("join", 3)] == 1
    assert p[("tabl", 2)] == 1 and p[("tabl", 3)] == 1
    # stopwords never enter the index ('the', 'a', 'here'); 'nothing'
    # is NOT a Snowball stopword and stems to 'noth'
    toks = {t for (t, _) in p}
    assert not {"the", "a", "here"} & toks
    assert "noth" in toks


def test_english_postings_python_only_on_vocab(spark):
    """The stemmer must run over the DISTINCT vocabulary, not the token
    stream: the Python stage's input subtree aggregates (distinct)
    before ArrowEvalPython."""
    from readur_spark.operators.posting import build_postings_english

    rows = [(i, "the queries join table query joins") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plan = build_postings_english(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    # exactly one Python stage in the whole job
    assert plan.count("ArrowEvalPython") == 1
    # the Python stage consumes the deduplicated vocab: an aggregate
    # sits BELOW ArrowEvalPython in the plan text (plan prints top-down)
    idx_py = plan.index("ArrowEvalPython")
    below = plan[idx_py:]
    assert "HashAggregate" in below or "ObjectHashAggregate" in below
