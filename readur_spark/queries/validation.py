"""B11 — query validation and result guards.

Reference semantics (src/routes/search.rs:45-72): query length 2..1000
(Rust `str.len()` = UTF-8 *bytes*), limit defaults to 25 with
0 < limit ≤ 1000, offset ≥ 0, and a post-query guard rejecting
> 10000 results. Driver-side pure functions — they run before a plan
is submitted and after a bounded count, never inside executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MIN_QUERY_BYTES = 2
MAX_QUERY_BYTES = 1000
DEFAULT_LIMIT = 25
MAX_LIMIT = 1000
MAX_RESULTS = 10000


class QueryValidationError(ValueError):
    pass


def validate_search_request(
    query: str, limit: int | None = None, offset: int | None = None
) -> tuple[str, int, int]:
    """Returns (query, limit, offset) or raises — the reference's
    pre-execution checks with its exact bounds."""
    qlen = len(query.encode("utf-8"))
    if qlen < MIN_QUERY_BYTES:
        raise QueryValidationError(
            "query too short: %d bytes (min %d)" % (qlen, MIN_QUERY_BYTES)
        )
    if qlen > MAX_QUERY_BYTES:
        raise QueryValidationError(
            "query too long: %d bytes (max %d)" % (qlen, MAX_QUERY_BYTES)
        )
    limit = DEFAULT_LIMIT if limit is None else limit
    offset = 0 if offset is None else offset
    if limit > MAX_LIMIT or limit <= 0 or offset < 0:
        raise QueryValidationError(
            "invalid pagination: offset=%d limit=%d" % (offset, limit)
        )
    return query, limit, offset


def guard_result_count(df: DataFrame, max_results: int = MAX_RESULTS) -> DataFrame:
    """Too-many-results guard. Counts at most max_results+1 rows
    (bounded limit, not a full count — at 10^12 rows a full count of
    an over-broad query is exactly the work the guard exists to
    avoid), raising when the cap is exceeded."""
    n = df.limit(max_results + 1).count()
    if n > max_results:
        raise QueryValidationError(
            "too many results: > %d (narrow the query)" % max_results
        )
    return df
