"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here twice:
a Spark callable (spark, sf_dir) → DataFrame and (when SQL-expressible)
a DuckDB oracle string over the same parquet views. Column aliases MUST
match — the driver hash-compares values after sorting columns by name.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


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
    from readur_spark.ml import packing as ml_packing  # noqa: F401
    from readur_spark.ml import webfilters as ml_webfilters  # noqa: F401
    from readur_spark.queries import crawl, extraction, labels  # noqa: F401

    _LOADED = True
