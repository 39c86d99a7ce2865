"""Crawler-trap host detection — infinite-URL-space signals.

Calendar pages, session-id query strings, and faceted listings give a
host an effectively unbounded URL space over a bounded content set;
a frontier that treats every new URL as new work drowns in one such
host. The published defenses are budget enforcement keyed on
URL-to-content blowup (IRLbot's BEAST budgeting, Lee et al. WWW'08;
Heritrix's trap guards; Baeza-Yates & Castillo, "Crawling the
infinite Web": page value decays with depth in the infinite region).
This module computes the per-host census those policies key on:

  n_urls                distinct fetched URLs
  n_content             distinct content digests (md5 of extracted text)
  upc_permille          URLs per distinct content, permille
                        (1000 = every URL is new content; 5000 = five
                        URLs per page of actual content)
  query_frac_permille   fraction of URLs carrying a query string
  mean_depth_centi      mean path-segment depth, centi-units
  is_trap               upc_permille >= threshold

Everything is integer-exact (permille/centi fixed point, `div`), so
the DuckDB oracle replays it bit-for-bit.

Scale design (10^12 pages):
  - the digest is computed AT THE SCAN (md5 projection); the only
    shuffled frame is slim (host, url-ish strings, digest) — the page
    payload never moves;
  - the rollup is one partial-agg-combinable groupBy(host): distinct
    counts are per-host hash sets at combiner level, the rest are
    sums; no window, no self-join;
  - host skew IS the signal here — a trap host with 10^9 URLs still
    reduces to one output row, and approx twins (HLL distinct) can be
    swapped in per count without changing the contract (the exact
    form is the oracle-checkable one).

Reference tie-in: the reference dedups whole files by SHA-256 before
OCR (src/services/file_service.rs) — per-upload, content-addressed.
This is the host-level crawl-policy analogue its ingest tier lacks:
the same digest, aggregated into a fetch-budget signal.

Construction rule for the driver query (SQL-replayable): host comes
from the document's source; src0 is a SESSION-ID trap (5 URL aliases
per document differing only in ?session=k), src1 is a PATH-EXPLOSION
trap (3 aliases differing in a trailing path segment, no query), every
other source emits one URL per document. The flag must catch BOTH trap
flavors via the content ratio alone — src1 has zero query strings, so
a query-string heuristic cannot explain its verdict.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from readur_spark.queries.registry import register
from readur_spark.queries.tables import load

TRAP_UPC_PERMILLE = 2500  # >= 2.5 URLs per distinct content => trap

_PATH_RE = "^https://[^/]+([^?]*)"


def url_path_depth(url: Column) -> Column:
    """Number of non-empty path segments (query string excluded)."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    return F.size(F.filter(F.split(path, "/"), lambda x: x != F.lit("")))


def trap_host_census(
    pages: DataFrame,
    *,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
    threshold_permille: int = TRAP_UPC_PERMILLE,
) -> DataFrame:
    """Per-host URL-space census over slim (host, url, digest) rows.

    One combinable aggregate; integer fixed point throughout. The
    caller supplies the content digest (md5 of extracted text) so the
    census never touches the payload.
    """
    has_query = F.when(F.col(url_col).contains("?"), 1).otherwise(0)
    rolled = pages.groupBy(host_col).agg(
        F.countDistinct(url_col).alias("n_urls"),
        F.countDistinct(digest_col).alias("n_content"),
        F.sum(has_query).alias("_n_query"),
        F.sum(url_path_depth(F.col(url_col))).alias("_depth_sum"),
    )
    return rolled.select(
        host_col,
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_content").cast("long").alias("n_content"),
        F.expr("n_urls * 1000 div n_content").alias("upc_permille"),
        F.expr("_n_query * 1000 div n_urls").alias("query_frac_permille"),
        F.expr("_depth_sum * 100 div n_urls").alias("mean_depth_centi"),
        (F.expr("n_urls * 1000 div n_content") >= threshold_permille).alias(
            "is_trap"
        ),
    )


# ---- constructed-corpus driver query --------------------------------------


def constructed_trap_pages(df: DataFrame) -> DataFrame:
    """(host, url, digest) rows under the module docstring's rule."""
    n_alias = (
        F.when(F.col("source") == "src0", F.lit(5))
        .when(F.col("source") == "src1", F.lit(3))
        .otherwise(F.lit(1))
    )
    rows = df.select(
        "doc_id",
        "source",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("digest"),
        F.explode(F.sequence(F.lit(0), n_alias - 1)).alias("k"),
    )
    host = F.concat(F.col("source"), F.lit(".example"))
    base = F.concat(F.lit("https://"), host, F.lit("/a/"), F.col("doc_id"))
    url = (
        F.when(
            (F.col("source") == "src0") & (F.col("k") > 0),
            F.concat(base, F.lit("?session="), F.col("k")),
        )
        .when(
            (F.col("source") == "src1") & (F.col("k") > 0),
            F.concat(base, F.lit("/"), F.col("k")),
        )
        .otherwise(base)
    )
    return rows.select(
        host.alias("host"), url.alias("url"), F.col("digest")
    )


_CONSTRUCT_SQL = """
  SELECT source || '.example' AS host,
         CASE
           WHEN source = 'src0' AND k > 0 THEN
             'https://' || source || '.example/a/' || doc_id
               || '?session=' || k
           WHEN source = 'src1' AND k > 0 THEN
             'https://' || source || '.example/a/' || doc_id || '/' || k
           ELSE 'https://' || source || '.example/a/' || doc_id
         END AS url,
         md5(text) AS digest
  FROM documents,
       UNNEST(range(0, CASE WHEN source = 'src0' THEN 5
                            WHEN source = 'src1' THEN 3
                            ELSE 1 END)) AS g(k)
"""


@register(
    "crawl_trap_hosts",
    oracle=f"""
    WITH c AS ({_CONSTRUCT_SQL}),
    census AS (
      SELECT host,
             count(DISTINCT url) AS n_urls,
             count(DISTINCT digest) AS n_content,
             sum(CASE WHEN contains(url, '?') THEN 1 ELSE 0 END)
               AS n_query,
             sum(len(list_filter(string_split(
                   regexp_extract(url, '{_PATH_RE}', 1), '/'),
                 x -> x <> ''))) AS depth_sum
      FROM c GROUP BY host
    )
    SELECT host,
           CAST(n_urls AS BIGINT) AS n_urls,
           CAST(n_content AS BIGINT) AS n_content,
           n_urls * 1000 // n_content AS upc_permille,
           CAST(n_query * 1000 // n_urls AS BIGINT) AS query_frac_permille,
           CAST(depth_sum * 100 // n_urls AS BIGINT) AS mean_depth_centi,
           n_urls * 1000 // n_content >= {TRAP_UPC_PERMILLE} AS is_trap
    FROM census
    """,
)
def crawl_trap_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawler-trap census over the constructed two-trap
    corpus: the session-id trap (src0) and the path-explosion trap
    (src1) must BOTH flag via the URL-to-content ratio, every other
    host must not; all five census signals value-hashed."""
    pages = constructed_trap_pages(load(spark, sf_dir, "documents"))
    return trap_host_census(pages)
