"""B11 query-validation bounds (src/routes/search.rs:45-72)."""

from __future__ import annotations

import pytest

from readur_spark.queries.validation import (
    DEFAULT_LIMIT,
    QueryValidationError,
    guard_result_count,
    validate_search_request,
)


def test_query_length_bounds_are_bytes():
    with pytest.raises(QueryValidationError, match="too short"):
        validate_search_request("a")
    validate_search_request("ab")
    # 'é' is 2 UTF-8 bytes: passes the 2-byte minimum as in Rust .len()
    validate_search_request("é")
    with pytest.raises(QueryValidationError, match="too long"):
        validate_search_request("x" * 1001)
    validate_search_request("x" * 1000)
    # 501 two-byte chars = 1002 bytes > 1000
    with pytest.raises(QueryValidationError, match="too long"):
        validate_search_request("é" * 501)


def test_pagination_bounds():
    q, limit, offset = validate_search_request("spark")
    assert (limit, offset) == (DEFAULT_LIMIT, 0)
    validate_search_request("spark", limit=1000, offset=0)
    for bad in [dict(limit=1001), dict(limit=0), dict(limit=-5), dict(offset=-1)]:
        with pytest.raises(QueryValidationError, match="pagination"):
            validate_search_request("spark", **bad)


def test_result_guard(spark):
    small = spark.range(100)
    assert guard_result_count(small, max_results=100) is small
    big = spark.range(200)
    with pytest.raises(QueryValidationError, match="too many"):
        guard_result_count(big, max_results=100)
