"""HTTP response-header curation signals: X-Robots-Tag, TDM opt-outs.

The crawl tier sees every page's HTTP response headers before its
body, and three of them are standing curation signals a training-data
pipeline must honor: `X-Robots-Tag` (the header form of the robots
meta — `noindex` is a publisher opt-out, and the de-facto `noai` /
`noimageai` directives are machine-learning-specific opt-outs),
`TDM-Reservation` (the W3C Text-and-Data-Mining Reservation Protocol:
`1` reserves TDM rights, `TDM-Policy` points at the license terms),
and `Content-Type` (the authoritative mime + charset, upstream of the
WHATWG sniff in ml/charset.py). The reference engine trusts
client-declared MIME per upload (src/mime_detection.rs, the
trusted-server predicate A4); this module is that trust boundary for
crawled content, beside `ml/headmeta.py` (meta robots) and
`ml/license.py` (page-level grants).

Components (all pure Catalyst — zero Python in any plan):
  - `header_value` — first value of a named header, case-insensitive,
    CRLF or LF framing (one anchored regexp per header over the
    bounded header block, never the payload);
  - `parse_http_headers` — staged projections for content-type mime /
    charset, x-robots-tag, tdm-reservation, tdm-policy;
  - `xrobots_has` — token-list membership (comma-separated, trimmed,
    case-folded) so `noai` never matches inside another token;
  - `with_optout` / `fetchable` — the gate: opt_out reason ladder
    noindex > noai > tdm (first applicable reason wins, one column);
  - `host_optout_rollup` — per-host opt-out posture (slim map-side
    combinable aggregate; the long-tail classifier signal, like
    ml/license.host_license_mode).

Scale: headers are a bounded block (the constructed corpus mirrors
the real ~0.5-2 KiB), every signal is a codegen projection at scan
time, and the gate is a pushed-down filter. Correctness: constructed
headers from the driver's `documents` table (mixed-case header names,
CR-LF and bare-LF framing, directive lists, reservation 0/1) with the
expected values restated from the rule in the DuckDB oracles; hostile
shapes pinned in tests/test_httpmeta.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load


def header_value(headers: Column, name: str) -> Column:
    """First value of header `name` (case-insensitive, start-of-line
    anchored, CR tolerated before the newline); NULL when absent."""
    pat = r"(?im)^" + name + r"[ \t]*:[ \t]*([^\r\n]*)"
    v = F.regexp_extract(headers, pat, 1)
    return F.nullif(F.rtrim(v), F.lit(""))


def xrobots_has(tag_value: Column, directive: str) -> Column:
    """True when the comma-separated X-Robots-Tag value contains the
    directive as a whole token (case-insensitive). NULL value ->
    false."""
    toks = F.transform(
        F.split(F.coalesce(tag_value, F.lit("")), ","),
        lambda t: F.trim(F.lower(t)),
    )
    return F.array_contains(toks, directive)


def parse_http_headers(
    df: DataFrame, headers_col: str = "headers"
) -> DataFrame:
    """Attach (mime, charset, x_robots, tdm_reservation, tdm_policy).
    Staged projections, one per derived column (the license module's
    expression-fan-out lesson): each header regexp runs once."""
    h = F.col(headers_col)
    ct = header_value(h, "content-type")
    return (
        df.withColumn("_ct", ct)
        .withColumn(
            "mime",
            F.nullif(
                F.lower(F.trim(F.regexp_extract(F.col("_ct"), r"^([^;]*)", 1))),
                F.lit(""),
            ),
        )
        .withColumn(
            "charset",
            F.nullif(
                F.lower(
                    F.regexp_extract(
                        F.col("_ct"),
                        r"(?i)charset=\"?([A-Za-z0-9_\-]+)",
                        1,
                    )
                ),
                F.lit(""),
            ),
        )
        .withColumn("x_robots", header_value(h, "x-robots-tag"))
        .withColumn(
            "tdm_reservation",
            F.nullif(
                F.regexp_extract(
                    F.coalesce(
                        header_value(h, "tdm-reservation"), F.lit("")
                    ),
                    r"^([01])",
                    1,
                ),
                F.lit(""),
            ).cast("int"),
        )
        .withColumn("tdm_policy", header_value(h, "tdm-policy"))
        .drop("_ct")
    )


def with_optout(parsed: DataFrame) -> DataFrame:
    """Attach `opt_out_reason` (noindex > noai > tdm, NULL when
    fetchable) over a parse_http_headers frame."""
    return (
        parsed.withColumn("_noindex", xrobots_has(F.col("x_robots"), "noindex"))
        .withColumn("_noai", xrobots_has(F.col("x_robots"), "noai"))
        .withColumn(
            "opt_out_reason",
            F.when(F.col("_noindex"), F.lit("noindex"))
            .when(F.col("_noai"), F.lit("noai"))
            .when(F.col("tdm_reservation") == 1, F.lit("tdm")),
        )
        .drop("_noindex", "_noai")
    )


def fetchable(parsed: DataFrame) -> DataFrame:
    """The gate: rows with no opt-out (a pushed-down NULL filter)."""
    return with_optout(parsed).filter(F.col("opt_out_reason").isNull())


def host_optout_rollup(opted: DataFrame) -> DataFrame:
    """Per-host opt-out posture over a with_optout frame."""
    r = F.col("opt_out_reason")
    return opted.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((r == "noindex").cast("long")).alias("n_noindex"),
        F.sum((r == "noai").cast("long")).alias("n_noai"),
        F.sum((r == "tdm").cast("long")).alias("n_tdm"),
        F.sum(r.isNull().cast("long")).alias("n_fetchable"),
    )


# ---------------------------------------------------------------------------
# Constructed corpus
# ---------------------------------------------------------------------------


def _constructed_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header blocks from doc_id: content-type by %3 (html+UTF-8 /
    html+iso-8859-1 in single-quotes-free quoted form / pdf without
    charset), X-Robots-Tag by %4 (noindex,nofollow / noai / absent /
    all) with the header NAME lower-cased on odd doc_ids and bare-LF
    framing on %7==0 rows, TDM by %5 (1 / 0 + policy URL / absent)."""
    d = F.col("doc_id")
    nl = F.when(d % 7 == 0, F.lit("\n")).otherwise(F.lit("\r\n"))
    ct = (
        F.when(d % 3 == 0, F.lit("Content-Type: text/html; charset=UTF-8"))
        .when(
            d % 3 == 1,
            F.lit('Content-Type: text/HTML; charset="iso-8859-1"'),
        )
        .otherwise(F.lit("Content-Type: application/pdf"))
    )
    xr_name = F.when(d % 2 == 1, F.lit("x-robots-tag: ")).otherwise(
        F.lit("X-Robots-Tag: ")
    )
    xr = (
        F.when(d % 4 == 0, F.concat(xr_name, F.lit("noindex, nofollow"), nl))
        .when(d % 4 == 1, F.concat(xr_name, F.lit("noai"), nl))
        .when(d % 4 == 3, F.concat(xr_name, F.lit("all"), nl))
        .otherwise(F.lit(""))
    )
    tdm = (
        F.when(d % 5 == 0, F.concat(F.lit("TDM-Reservation: 1"), nl))
        .when(
            d % 5 == 1,
            F.concat(
                F.lit("TDM-Reservation: 0"), nl,
                F.lit("TDM-Policy: https://example.org/policy.json"), nl,
            ),
        )
        .otherwise(F.lit(""))
    )
    headers = F.concat(
        F.lit("HTTP/1.1 200 OK"), nl,
        F.lit("Server: nginx"), nl,
        ct, nl, xr, tdm,
        F.lit("Content-Length: 1024"), nl,
    )
    host = F.concat(
        F.lit("h"), (d % 19).cast("string"), F.lit(".site.net")
    )
    return load(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host"), headers.alias("headers")
    )


_SQL_MIME = """
    CASE WHEN doc_id % 3 = 2 THEN 'application/pdf' ELSE 'text/html' END
"""
_SQL_CHARSET = """
    CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
    ELSE NULL END
"""
_SQL_XROBOTS = """
    CASE doc_id % 4 WHEN 0 THEN 'noindex, nofollow'
    WHEN 1 THEN 'noai' WHEN 3 THEN 'all' ELSE NULL END
"""
_SQL_TDM = """
    CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE NULL END
"""
_SQL_REASON = """
    CASE WHEN doc_id % 4 = 0 THEN 'noindex'
         WHEN doc_id % 4 = 1 THEN 'noai'
         WHEN doc_id % 5 = 0 THEN 'tdm'
         ELSE NULL END
"""


@register(
    "http_headers_parse",
    oracle=f"""
    SELECT doc_id, {_SQL_MIME} AS mime,
           {_SQL_CHARSET} AS mime_charset,
           {_SQL_XROBOTS} AS x_robots,
           CAST({_SQL_TDM} AS INT) AS tdm_reservation,
           CASE WHEN doc_id % 5 = 1
                THEN 'https://example.org/policy.json'
                ELSE NULL END AS tdm_policy
    FROM documents
    """,
)
def http_headers_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-block parse over mixed-case names, quoted charset
    params, and bare-LF framing; every field restated from the rule."""
    out = parse_http_headers(_constructed_headers(spark, sf_dir))
    # mime_charset (not "charset"): the driver compare sorts rows by
    # the alphabetically-first column, which must be the unique
    # non-null doc_id, not a nullable string
    return out.select(
        "doc_id", "mime", F.col("charset").alias("mime_charset"),
        "x_robots", "tdm_reservation", "tdm_policy",
    )


@register(
    "http_optout_gate",
    oracle=f"""
    SELECT doc_id, {_SQL_MIME} AS mime
    FROM documents
    WHERE {_SQL_REASON} IS NULL
    """,
)
def http_optout_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivors of the noindex/noai/TDM ladder (note 'all' and
    'nofollow' do NOT opt a page out, and TDM-Reservation: 0 is an
    explicit grant)."""
    parsed = parse_http_headers(_constructed_headers(spark, sf_dir))
    return fetchable(parsed).select("doc_id", "mime")


@register(
    "host_optout_rollup",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             'h' || CAST(doc_id % 19 AS VARCHAR) || '.site.net' AS host,
             {_SQL_REASON} AS reason
      FROM documents
    )
    SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN reason = 'noindex' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noindex,
           CAST(sum(CASE WHEN reason = 'noai' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_noai,
           CAST(sum(CASE WHEN reason = 'tdm' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_tdm,
           CAST(sum(CASE WHEN reason IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fetchable
    FROM r GROUP BY host
    """,
)
def host_optout_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host opt-out posture (19 hosts x the reason ladder)."""
    parsed = parse_http_headers(_constructed_headers(spark, sf_dir))
    return host_optout_rollup(with_optout(parsed))


# ---------------------------------------------------------------------------
# Composed rights gate (license x HTTP opt-out)
# ---------------------------------------------------------------------------


@register(
    "rights_composed_gate",
    oracle=f"""
    SELECT doc_id,
           CASE doc_id % 5
             WHEN 1 THEN 'cc-by-sa-3.0'
             WHEN 2 THEN 'cc0-1.0' END AS license_id,
           {_SQL_MIME} AS mime
    FROM documents
    WHERE doc_id % 5 IN (1, 2)       -- permissive grant (license rule;
                                     -- %5=0 carries CC BY but ALSO a
                                     -- TDM reservation — see below)
      AND doc_id % 4 NOT IN (0, 1)   -- no noindex / noai header
      AND doc_id % 5 <> 0            -- no TDM-Reservation: 1 header
    """,
)
def rights_composed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full "may I train on this page" decision: page-level grant
    (ml/license.py, permissive CC) AND protocol-level opt-out
    (X-Robots noindex/noai + TDM reservation) — the two signal planes
    a real rights-clearance pass must AND together, here joined on the
    shared doc_id of their constructed corpora. The deliberate overlap:
    %5 = 0 pages carry a permissive CC BY grant in the html AND a
    TDM-Reservation: 1 header — the header wins (protocol opt-out
    overrides the page-level grant), and the oracle pins exactly that
    precedence."""
    from readur_spark.ml.license import _constructed_pages, with_license

    lic = with_license(_constructed_pages(spark, sf_dir)).select(
        "doc_id", "license_id", "permissive"
    )
    hdr = fetchable(
        parse_http_headers(_constructed_headers(spark, sf_dir))
    ).select("doc_id", "mime")
    return (
        lic.filter(F.col("permissive"))
        .join(hdr, "doc_id")
        .select("doc_id", "license_id", "mime")
    )
