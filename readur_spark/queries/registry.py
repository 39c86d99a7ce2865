"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here twice:
a Spark callable (spark, sf_dir) → DataFrame and (when SQL-expressible)
a DuckDB oracle string over the same parquet views. Column aliases MUST
match — the driver hash-compares values after sorting columns by name.

ORDER MATTERS: the round driver's CORRECTNESS artifact hash-checks a
window of the FIRST 50 registered queries, and the registry has grown
past that (79 in round 2 — the byte-identity extraction backbone and
the whole curation tier landed outside the window). `_PRIORITY` pins
the 50 most load-bearing oracle-checked queries to the front of
`queries()`/`oracle_sql()`; variants, demos, and rows-only algorithmic
surfaces (pytest-pinned instead) trail behind. Everything still
registers and still runs — the ordering only decides which queries get
the standing hard-signal artifact each round.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

# The driver's hard-check window (insertion order of queries() dict).
# Selection: extraction backbone first (the north-rule byte-identity
# contract), then dedup, the curation/decontamination tier, text QC,
# search, ANN, facets/analytics, ops, streaming twins, crawl sync.
_PRIORITY: list[str] = [
    # extraction backbone — byte-identical text per url
    "extract_text_passthrough",
    "extract_wordcount_by_lang",
    "ignored_files_gate",
    # dedup family (duplicate_groups — B17's thin variant of the same
    # hash-group machinery as dedup_exact_groups — rotated out r4 after
    # three green driver rows; stays oracle-checked in pytest + judge)
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "dedup_near_components",
    "embedding_neardup_pairs",
    # curation / decontamination tier (whole chains value-hashed)
    "curation_pipeline",
    "training_yield_report",
    "pii_redaction",
    "repeated_ngram_spans",
    "dedup_substring_clean",
    "decontaminate_overlap",
    "site_boilerplate",
    "qc_web_filters",
    "sample_weighted_priority",  # r4 session 2: PPS bottom-k — the
    # stronger sampling family; sample_stratified (same md5-order
    # machinery) and split_hash_sample cede, stay pytest/judge-checked
    "pack_sequences",
    # round-3 curation tier (mixture planning, LM quality, URL and
    # line-level gates — each a distinct operator family — plus the
    # composed chain; chunk_for_embedding ceded its slot, its packing
    # family stays window-covered by pack_sequences)
    "web_curation_report",
    "mixture_sample_by_lang",
    "qc_lm_surprisal_buckets",
    "qc_lm_bigram_surprisal",  # windowed r4 post-typing-fix (the r3
    # red's latent twin — a driver row proves the fix end-to-end)
    "url_filter_gates",
    "c4_line_filter_clean",
    "bpe_learn_merges",  # r4 session 2: distributed BPE training —
    # line_dedup_clean ceded (same line-filter machinery as
    # c4_line_filter_clean, which stays)
    # round-4 window rotation: never-driver-checked oracle families
    # (VERDICT r3 item 10) — domain capping, as-of join, NFC normalize
    "domain_cap_sample",
    "asof_join_attribution",
    "normalize_text_nfc",
    # r4 session 2 families: clustering, web graph, crawl gating
    # (qc_token_count / qc_fingerprint / qc_length_percentiles ceded —
    # thin single-agg QC variants, still pytest/judge-checked)
    "kmeans_centroids_int",  # full-corpus integer Lloyd
    "host_pagerank",  # integer fixed-point PageRank
    "robots_longest_match_gate",  # RFC 9309 gate
    # text QC (qc_quality_score / qc_langid_english ceded r4 session 3
    # — thin single-projection variants, pytest/judge-checked — to
    # admit the two new oracle families below)
    "qc_nb_classifier",  # r4 session 3: gate-distilled NB classifier
    # — whole train+score round trip value-hashed
    "qc_readability",  # r4 session 3: Flesch/FK milli-unit scoring
    "head_metadata_parse",  # r4 session 3: canonical/robots-meta/lang
    # head parsing, oracle via the constructed-corpus rule
    # (qc_repetition ceded — single-agg Gopher variant whose machinery
    # qc_web_filters keeps windowed; stays pytest/judge-checked)
    # search (phrase/boolean/filename are thin variants of the same
    # FTS predicate machinery as search_simple_and — they, plus
    # qc_token_count_bpe and status_conditional_counts, moved out of
    # the window in round 3 to admit the new tier; all remain
    # oracle-checked in pytest's entry-contract parametrization)
    "search_simple_and",
    "search_rank_tsrank",
    # search_rank_tf (cheap variant), search_snippets_first (subsumed
    # by the full-struct search_snippets oracle), facet_source_counts,
    # ann_multi_query_topk (variant of ann_cosine_topk) rotated out r4
    "search_rank_tsrank_english",  # r4: 'english' config — Porter2
    # stemmer + stopwords through the same ts_rank kernel
    "search_fuzzy_trigram",
    "search_snippets",  # r4: full multi-snippet surface now oracled
    "search_tfidf_postings",
    # ANN (oracle-bearing paths; ann_ivf_probe queries the materialized
    # cluster-partitioned index — new oracle in round 3)
    "ann_cosine_topk",
    "ann_lsh_bucketed",
    "ann_ivf_probe",
    # facets / analytics
    "facet_token_explode",
    "daily_analytics_rollup",
    "label_join_counts",
    # ops / consistency
    "requeue_antijoin",
    "consistency_orphan_events",
    # streaming batch-twins
    "windowed_event_counts",
    "sessionize_events",
    # crawl sync (composed: canonicalize + etag normalize + triage)
    "sync_change_plan",
]


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _ordered(d: dict) -> dict:
    out = {name: d[name] for name in _PRIORITY if name in d}
    out.update((name, v) for name, v in d.items() if name not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)


def priority_window() -> list[str]:
    """The names pinned to the front of the registry, in order."""
    return list(_PRIORITY)


_LOADED = False


def _load_all() -> None:
    global _LOADED
    if _LOADED:
        return
    # import for registration side effects
    from readur_spark.queries import analytics, facets, ops, search  # noqa: F401
    from readur_spark.ml import components as ml_components  # noqa: F401
    from readur_spark.ml import curation as ml_curation  # noqa: F401
    from readur_spark.ml import dedup as ml_dedup  # noqa: F401
    from readur_spark.ml import multimodal, similarity, textqc  # noqa: F401
    from readur_spark.ml import decontam as ml_decontam  # noqa: F401
    from readur_spark.ml import mixing as ml_mixing  # noqa: F401
    from readur_spark.ml import normalize as ml_normalize  # noqa: F401
    from readur_spark.ml import bpe as ml_bpe  # noqa: F401
    from readur_spark.ml import kmeans as ml_kmeans  # noqa: F401
    from readur_spark.ml import robots as ml_robots  # noqa: F401
    from readur_spark.ml import linkgraph as ml_linkgraph  # noqa: F401
    from readur_spark.ml import dsir as ml_dsir  # noqa: F401
    from readur_spark.ml import quality_lm as ml_quality_lm  # noqa: F401
    from readur_spark.ml import quality_classifier as ml_quality_classifier  # noqa: F401
    from readur_spark.ml import headmeta as ml_headmeta  # noqa: F401
    from readur_spark.ml import curation_web as ml_curation_web  # noqa: F401
    from readur_spark.ml import linefilters as ml_linefilters  # noqa: F401
    from readur_spark.operators import asof as op_asof  # noqa: F401
    from readur_spark.operators import bloom as op_bloom  # noqa: F401
    from readur_spark.ml import semdedup as ml_semdedup  # noqa: F401
    from readur_spark.ml import urlfilters as ml_urlfilters  # noqa: F401
    from readur_spark.ml import packing as ml_packing  # noqa: F401
    from readur_spark.ml import webfilters as ml_webfilters  # noqa: F401
    from readur_spark.queries import crawl, extraction, labels  # noqa: F401

    _LOADED = True
