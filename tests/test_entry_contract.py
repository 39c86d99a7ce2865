"""Mirrors the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB — row count, column
names, and order-insensitive value comparison."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, t + ".parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return str(v)


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)


class TestPriorityWindow:
    """The driver hash-checks the FIRST 50 registered queries; pin what
    occupies that window (VERDICT r2 top item)."""

    def test_priority_names_all_registered(self):
        from readur_spark.queries.registry import priority_window

        missing = [n for n in priority_window() if n not in QUERIES]
        assert missing == [], f"stale priority entries: {missing}"

    def test_window_is_fully_oracle_checked(self):
        first50 = list(QUERIES)[:50]
        rows_only = [n for n in first50 if n not in ORACLES]
        assert rows_only == [], f"rows-only queries in the window: {rows_only}"

    def test_backbone_inside_window(self):
        first50 = set(list(QUERIES)[:50])
        # r5 rotations: session 2 ceded pii_redaction /
        # repeated_ngram_spans / dedup_substring_clean; session 3 ceded
        # curation_pipeline / training_yield_report (green r4 driver
        # rows, code untouched); session 4 added its seven new families
        # — the pinned backbone is the byte-identity key plus one
        # representative per round-5 session (session 7: the CDX index
        # tier took wordcount's slot — it holds a green r4 driver row).
        backbone = {
            "extract_text_passthrough",
            "cdx_urlkey_surt",
            # session 11: secrets_entropy_constructed took
            # cdx_fetch_spans' slot (the CDX family keeps the urlkey
            # backbone row; the scrub gate is run_curation-wired)
            "secrets_entropy_constructed",
            "dedup_soft_weights",
            # session 11: span_corruption_plan took ngram_novelty_rate's
            # slot (curriculum_interleave keeps the training-order pin)
            "span_corruption_plan",
            # session 10: search_rrf_fusion replaces search_rank_bm25
            # — its oracle embeds the full bm25 oracle verbatim as a
            # CTE, so the ranking-family pin rides the fusion row
            "search_rrf_fusion",
            "langid_chartrigram_nb",
            # session 11: rendezvous_shard_assign took extract_markdown's
            # slot (the extraction family keeps three other window rows)
            "rendezvous_shard_assign",
            "sentence_dedup_clean",
            # session 11: snm_candidate_pairs took pagination_stitch's
            # slot (canonical_collapse_plan keeps chain resolution
            # windowed; SNM is the third dedup-blocking family)
            "snm_candidate_pairs",
        }
        assert backbone <= first50, backbone - first50

    def test_priority_prefix_matches_registry_order(self):
        from readur_spark.queries.registry import priority_window

        want = [n for n in priority_window() if n in QUERIES]
        assert list(QUERIES)[: len(want)] == want


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    s_set = _rowset(spark_cols, spark_rows)
    d_set = _rowset(duck_cols, duck_rows)
    assert len(s_set) == len(d_set), f"{name}: rowcount {len(s_set)} vs {len(d_set)}"
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")


@pytest.mark.parametrize(
    "name", ["training_yield_report", "web_curation_report", "curation_pipeline"]
)
def test_composed_chains_yield_rows(name, spark):
    """VERDICT r3 item 2: an empty chain result matches any number of
    composition bugs — the value-hash over the composed reports is only
    evidence if the fixture actually flows rows through every stage."""
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() > 0, f"{name} is vacuous at sf0.01"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_dtypes_match_spark_schema(name, spark, duck):
    """Type-level twin of the driver's value hash (VERDICT r3 item 1).

    The driver compares via pandas frames, where DuckDB's HUGEINT
    (sum(BIGINT)) and DECIMAL render as float64 — hash-visible against
    Spark's long even when every value is identical (`str()`-based
    _norm above is strictly weaker and passed round 3's only red). The
    Arrow schema preserves the exact result types, so asserting family
    equality (int vs int, float vs float, str vs str, bool vs bool)
    makes the whole class unrepresentable: an uncast sum() in any
    oracle fails here, not in CORRECTNESS_r{{N}}.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    def spark_family(dt):
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return "float"
        if isinstance(dt, T.StringType):
            return "str"
        if isinstance(dt, T.BooleanType):
            return "bool"
        return None  # timestamps/arrays/structs: value compare owns them

    def arrow_family(t):
        if pa.types.is_integer(t):
            return "int"
        if pa.types.is_floating(t):
            return "float"
        if pa.types.is_decimal(t):
            return "decimal"  # never acceptable where Spark says int/float
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str"
        if pa.types.is_boolean(t):
            return "bool"
        return None

    sdf = QUERIES[name](spark, SF_DIR)
    spark_fields = {f.name.lower(): spark_family(f.dataType) for f in sdf.schema}
    # LIMIT 0 wrap: the result schema without materializing the rows
    tbl = duck.execute(
        f"SELECT * FROM ({ORACLES[name]}) _dtype_probe LIMIT 0"
    ).arrow()
    bad = []
    for f in tbl.schema:
        want = spark_fields.get(f.name.lower())
        got = arrow_family(f.type)
        if want is not None and got != want:
            bad.append((f.name, f"oracle={f.type}", f"spark wants {want}"))
    assert bad == [], f"{name}: oracle/Spark dtype family mismatch: {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"status", "mime_type", "n_docs"} <= set(df.columns)
